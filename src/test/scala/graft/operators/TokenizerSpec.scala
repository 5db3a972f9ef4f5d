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

  test("encodeBpe applies merges in rank order with training semantics") {
    import spark.implicits._
    val docs = Seq((1L, "abc abd xyz!"), (2L, "aaa AAA")).toDF("doc_id", "text")
    val out = Tokenizer.encodeBpe(docs, Seq("a b", "ab c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sortBy(_._1)
    // doc 1: "abc"->"abc"(1), "abd"->"ab d"(2); "xyz!" dropped (non-alpha)
    // doc 2: "aaa"+"aaa": "a b" doesn't apply -> "a a a" (3 each)
    assert(out == Seq((1L, 2L, 3L), (2L, 2L, 6L)))
  }

  test("encodeBpe merges left-to-right non-overlapping, like training") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    // "a a a a" -> merge "a a": the padded-space replace consumes the
    // shared delimiter, so a homogeneous run merges every other pair —
    // "aa a a" (3 symbols). Identical to the trainer's own application
    // (see the "non-overlapping left-to-right" training test) and to the
    // SQL `replace` the oracle replays, which is the contract.
    val out = Tokenizer.encodeBpe(docs, Seq("a a"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    assert(out == ((1L, 3L)))
  }

  test("round trip: encoding with trained merges compresses the training corpus") {
    import spark.implicits._
    val docs = Seq((1L, "spark spark spark"), (2L, "spar sparse")).toDF("doc_id", "text")
    val trained = Tokenizer.trainBpeOnCorpus(spark, docs, numMerges = 3)
      .orderBy("merge_rank").collect().map(_.getString(1)).toSeq
    val enc = Tokenizer.encodeBpe(docs, trained).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // "spark" is 5 chars; 3 merges must cut each word's symbol count
    assert(enc(1L)._1 == 3L && enc(1L)._2 < 15L)
    assert(enc(2L)._1 == 2L && enc(2L)._2 < 11L)
  }
}
