package graft.sinks

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class PartitionedStoreSpec extends AnyFunSuite with SparkSpec {

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_part").toString

  private def corpus() = {
    import spark.implicits._
    Seq(
      (1L, "en", "alpha"), (2L, "en", "beta"), (3L, "zh", "gamma"),
      (4L, "zh", "delta"), (5L, "fr", "epsilon")).toDF("doc_id", "lang", "text")
  }

  test("a partition-column filter prunes to the matching directories only") {
    PartitionedStore.write(corpus(), "graft_ps_docs", s"${tmp()}/docs", Seq("lang"))
    val q = PartitionedStore.read(spark, "graft_ps_docs")
      .filter(org.apache.spark.sql.functions.col("lang") === "zh")

    assert(q.select("doc_id").collect().map(_.getLong(0)).toSet == Set(3L, 4L))

    // plan-level pin: the scan must carry a partition filter on lang and
    // list only the lang=zh directory
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"),
      s"expected a partition filter on lang:\n$scan")
    val files = q.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head.selectedPartitions.toPartitionArray.map(_.urlEncodedPath)
    assert(files.nonEmpty && files.forall(_.contains("lang=zh")),
      s"scan must touch only lang=zh files, got:\n${files.mkString("\n")}")
  }

  test("an unfiltered read still sees every partition and every row") {
    PartitionedStore.write(corpus(), "graft_ps_all", s"${tmp()}/docs", Seq("lang"))
    val back = PartitionedStore.read(spark, "graft_ps_all")
    assert(back.count() == 5L)
    assert(back.select("lang").distinct().collect().map(_.getString(0)).toSet ==
      Set("en", "zh", "fr"))
  }

  test("re-write replaces the table content") {
    val p = tmp()
    PartitionedStore.write(corpus(), "graft_ps_rw", s"$p/v1", Seq("lang"))
    PartitionedStore.write(corpus().limit(2), "graft_ps_rw", s"$p/v2", Seq("lang"))
    assert(PartitionedStore.read(spark, "graft_ps_rw").count() == 2L)
  }
}
