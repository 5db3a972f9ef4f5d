package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class ChunkingSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  private def run(df: org.apache.spark.sql.DataFrame, maxLen: Int, stride: Int) =
    Chunking.slidingWindows(df, "doc_id", "text", maxLen, stride)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSeq.sortBy(t => (t._1, t._2))

  test("overlapping windows cover every token; final window reaches the end") {
    // 10 tokens, maxLen 4, stride 3 -> starts 0, 3, 6 (6 + 4 >= 10 stops)
    val out = run(docs(1L -> "a b c d e f g h i j"), maxLen = 4, stride = 3)
    assert(out == Seq(
      (1L, 0L, 0L, 4L, "a b c d"),
      (1L, 1L, 3L, 4L, "d e f g"),
      (1L, 2L, 6L, 4L, "g h i j")))
    // 11 tokens -> a fourth, short window picks up the tail
    val out11 = run(docs(1L -> "a b c d e f g h i j k"), maxLen = 4, stride = 3)
    assert(out11.map(t => (t._3, t._4)) == Seq((0L, 4L), (3L, 4L), (6L, 4L), (9L, 2L)))
    assert(out11.last._5 == "j k")
  }

  test("a document at or under maxLen is one whole chunk") {
    val out = run(docs(1L -> "a b c", 2L -> "a b c d"), maxLen = 4, stride = 2)
    assert(out == Seq(
      (1L, 0L, 0L, 3L, "a b c"),
      (2L, 0L, 0L, 4L, "a b c d")))
  }

  test("stride == maxLen partitions without overlap") {
    val out = run(docs(1L -> "a b c d e f g"), maxLen = 3, stride = 3)
    assert(out.map(_._5) == Seq("a b c", "d e f", "g"))
  }

  test("invalid parameters are rejected") {
    intercept[IllegalArgumentException](run(docs(1L -> "a"), maxLen = 0, stride = 1))
    intercept[IllegalArgumentException](run(docs(1L -> "a"), maxLen = 3, stride = 4))
    intercept[IllegalArgumentException](run(docs(1L -> "a"), maxLen = 3, stride = 0))
  }
}
