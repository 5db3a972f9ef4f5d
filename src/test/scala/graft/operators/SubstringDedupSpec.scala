package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class SubstringDedupSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def run(df: org.apache.spark.sql.DataFrame, n: Int) =
    Dedup.exactSubstringDedup(df, "doc_id", "text", n = n).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

  test("cross-doc n-gram spans are excised from every carrier; unique docs untouched") {
    val out = run(docs(
      (1L, "a b c x y z"),
      (2L, "q a b c r"),
      (3L, "u v w")), n = 3)
    assert(out(1L) == ((6L, 3L, md5hex("x y z"))))
    assert(out(2L) == ((5L, 3L, md5hex("q r"))))
    assert(out(3L) == ((3L, 0L, md5hex("u v w"))))
  }

  test("within-document repetition does not trigger excision") {
    val out = run(docs((1L, "m n o m n o"), (2L, "p q r")), n = 3)
    assert(out(1L) == ((6L, 0L, md5hex("m n o m n o"))))
  }

  test("overlapping duplicate grams merge into one covered span; full excision yields md5 of empty") {
    val out = run(docs(
      (1L, "a b c d"),
      (2L, "a b c d")), n = 3)
    // both 3-grams ("a b c", "b c d") are duplicated -> all 4 positions covered
    assert(out(1L) == ((4L, 4L, md5hex(""))))
    assert(out(2L) == ((4L, 4L, md5hex(""))))
  }

  test("minDocs raises the duplication bar") {
    val shared = Seq((1L, "a b c x"), (2L, "a b c y"), (3L, "z z2 z3"))
    val loose = run(docs(shared: _*), n = 3)
    assert(loose(1L)._2 == 3L)
    val strict = Dedup.exactSubstringDedup(docs(shared: _*), "doc_id", "text", n = 3, minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(strict.values.forall(_ == 0L)) // only 2 carriers < 3
  }
}
