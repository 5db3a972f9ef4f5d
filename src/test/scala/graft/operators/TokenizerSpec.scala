package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class TokenizerSpec extends AnyFunSuite with SparkSpec {

  private def freq(rows: (String, Long)*) = {
    import spark.implicits._
    rows.toSeq.toDF("word", "cnt")
  }

  private def merges(df: org.apache.spark.sql.DataFrame): Seq[(Int, String, String, Long)] =
    df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      .sortBy(_._1)

  test("wordFrequencies lowercases, splits on whitespace, keeps alphabetic words only") {
    import spark.implicits._
    val docs = Seq("Spark  spark\tSPARK x1 y!", "spark beats").toDF("text")
    val out = Tokenizer.wordFrequencies(docs).as[(String, Long)].collect().toMap
    assert(out == Map("spark" -> 4L, "beats" -> 1L))
  }

  test("trainBpe learns frequency-ordered merges and stops when no pair remains") {
    val out = merges(Tokenizer.trainBpe(spark, freq(("abc", 3L), ("abd", 2L)), numMerges = 10))
    // pairs: "a b"→5, "b c"→3, "b d"→2; then "ab c"→3, "ab d"→2; then "ab d"→2
    assert(out == Seq(
      (1, "a b", "ab", 5L),
      (2, "ab c", "abc", 3L),
      (3, "ab d", "abd", 2L)))
  }

  test("ties break on the lexicographically smallest pair") {
    val out = merges(Tokenizer.trainBpe(spark, freq(("ab", 2L), ("ba", 2L)), numMerges = 1))
    assert(out == Seq((1, "a b", "ab", 2L)))
  }

  test("merge application is non-overlapping left-to-right") {
    val out = merges(Tokenizer.trainBpe(spark, freq(("aaa", 1L)), numMerges = 10))
    // "a a a": pair "a a" counts both adjacencies (2) but merges to "aa a"
    assert(out == Seq(
      (1, "a a", "aa", 2L),
      (2, "aa a", "aaa", 1L)))
  }
}
