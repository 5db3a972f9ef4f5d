package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class TfidfSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("ranks per-doc terms by tf/df with deterministic term tie-break") {
    // df: common=3, rare=1, mid=2
    val out = TextAnalysis.tfidfKeywords(docs(
      (1L, "common rare common"),
      (2L, "common mid"),
      (3L, "common mid")), "doc_id", "text", topK = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(5)))
      .toSet
    assert(out == Set(
      // doc1: rare 1/1 = 1_000_000 beats common 2/3 = 666_666
      (1L, 1, "rare", 1000000L),
      (1L, 2, "common", 666666L),
      // docs 2/3: mid 1/2 = 500_000 beats common 1/3 = 333_333
      (2L, 1, "mid", 500000L),
      (2L, 2, "common", 333333L),
      (3L, 1, "mid", 500000L),
      (3L, 2, "common", 333333L)))
  }

  test("equal scores break on ascending term") {
    val out = TextAnalysis.tfidfKeywords(docs((1L, "b a")), "doc_id", "text", topK = 2)
      .collect().map(r => (r.getInt(1), r.getString(2))).toSet
    assert(out == Set((1, "a"), (2, "b")))
  }
}
