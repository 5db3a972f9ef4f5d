package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PackingSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "nt")
  }

  test("chunks split exactly at the token budget") {
    // exclusive prefix: 0, 3, 7, 8 with budget 7 -> chunks 0, 0, 1, 1
    val out = Packing.packByTokenBudget(
        docs(1L -> 3L, 2L -> 4L, 3L -> 1L, 4L -> 6L), "doc_id", col("nt"), budget = 7)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
  }

  test("an oversized document pushes followers past its chunks") {
    // prefix: 0, 2, 22 with budget 5 -> chunks 0, 0, 4
    val out = Packing.packByTokenBudget(
        docs(1L -> 2L, 2L -> 20L, 3L -> 1L), "doc_id", col("nt"), budget = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 4L))
  }

  test("distributed two-phase scan equals the single-task window at any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (0L until 500L).map(i => (i, 1L + rnd.nextInt(40).toLong)).toDF("doc_id", "nt")
    val reference = df
      .withColumn("excl", coalesce(
        sum("nt").over(Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("doc_id"), expr("excl div 100").as("chunk"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    for (parts <- Seq(1, 3, 8)) {
      val got = Packing.packByTokenBudget(df, "doc_id", col("nt"), budget = 100, partitions = parts)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      assert(got == reference, s"mismatch at partitions=$parts")
    }
  }

  test("empty input packs to an empty frame") {
    assert(Packing.packByTokenBudget(docs(), "doc_id", col("nt"), budget = 10).count() == 0)
  }

  test("a downstream coalesce(1) cannot skew the partition offsets") {
    // regression: pid is captured from the runtime task id — without the
    // internal checkpoint, coalescing the output (the Verify main's
    // .coalesce(1).write) fused the scan stage into one task, rewrote
    // every pid to 0, and under-offset every partition but the first
    import spark.implicits._
    val df = (0L until 300L).map(i => (i, 10L)).toDF("doc_id", "nt")
    val packed = Packing.packByTokenBudget(df, "doc_id", col("nt"), budget = 100, partitions = 6)
    val viaCoalesce = packed.coalesce(1).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    // exclusive prefix of doc i = 10·i -> chunk = i/10
    assert(viaCoalesce == (0L until 300L).map(i => i -> i / 10).toMap)
  }
}
