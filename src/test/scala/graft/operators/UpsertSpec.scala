package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class UpsertSpec extends AnyFunSuite with SparkSpec {

  private def snap(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("k", "v")
  }
  private def changes(rows: (Long, String, Boolean)*) = {
    import spark.implicits._
    rows.toDF("k", "v", "del")
  }

  private def result(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("upserts replace, deletes remove, inserts append, the rest passes through") {
    val target = snap((1L, "old"), (2L, "keep"), (3L, "doomed"))
    val cs = changes((1L, "new", false), (3L, "ignored", true), (9L, "fresh", false))
    assert(result(Upsert.merge(target, cs, Seq("k"), Some("del"))) ==
      Set((1L, "new"), (2L, "keep"), (9L, "fresh")))
  }

  test("without a delete flag the changeset is all upserts") {
    val target = snap((1L, "old"))
    val cs = snap((1L, "new"), (2L, "fresh"))
    assert(result(Upsert.merge(target, cs, Seq("k"))) == Set((1L, "new"), (2L, "fresh")))
  }

  test("merging an empty changeset is the identity") {
    val target = snap((1L, "a"), (2L, "b"))
    assert(result(Upsert.merge(target, snap(), Seq("k"))) == Set((1L, "a"), (2L, "b")))
  }

  test("a changeset column mismatch fails loudly") {
    val e = intercept[IllegalArgumentException] {
      Upsert.merge(snap((1L, "a")), snap((1L, "b")).withColumnRenamed("v", "w"), Seq("k"))
    }
    assert(e.getMessage.contains("must match"))
  }

  test("mergeChecked rejects a changeset with two verdicts for one key") {
    val target = snap((1L, "a"))
    val cs = changes((2L, "x", false), (2L, "y", true))
    val e = intercept[IllegalArgumentException] {
      Upsert.mergeChecked(target, cs, Seq("k"), Some("del"))
    }
    assert(e.getMessage.contains("multiple rows"))
    // and accepts a clean one
    assert(result(Upsert.mergeChecked(target, changes((2L, "x", false)), Seq("k"), Some("del"))) ==
      Set((1L, "a"), (2L, "x")))
  }

  test("a delete for an absent key and an upsert re-inserting a deleted key both work") {
    val target = snap((1L, "a"))
    val cs = changes((7L, "ghost", true), (1L, "back", false))
    assert(result(Upsert.merge(target, cs, Seq("k"), Some("del"))) == Set((1L, "back")))
  }
}
