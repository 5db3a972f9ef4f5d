package graft

import org.apache.spark.sql.SparkSession

/** Scratch microbenchmark runner for optimization work — not a query
  * surface. Times isolated phases of the loader flatten so optimization
  * targets the measured cost, not a guess.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    import graft.sources.{RelationalLoader, Testdata}
    import org.apache.spark.sql.functions._
    // warm-up: one full flatten so codegen/JIT costs land outside the
    // timed phases below
    t("warmup flatten count") {
      RelationalLoader.loadNodes(spark, sfDir, Testdata.ordersDb).count()
    }
    t("flatten count (warm)") {
      RelationalLoader.loadNodes(spark, sfDir, Testdata.ordersDb).count()
    }
    val nodes = RelationalLoader.loadNodes(spark, sfDir, Testdata.ordersDb)
    val prunedPlan = nodes
      .filter(col("nodeType") === "ENT" ||
        (col("nodeType") === "GROUP" && col("name") === "orders"))
      .select(col("treeId"), col("nodeId"), col("parentId"), col("pos"),
        col("nodeType"), col("name"), col("value"), col("oid"))
    val asPersist = prunedPlan.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("pruned persist count") { asPersist.count() }
    t("pruned persist re-scan") { asPersist.count() }
    asPersist.unpersist(true)
    val asCkpt = t("pruned localCkpt") { prunedPlan.localCheckpoint(true) }
    t("pruned ckpt re-scan") { asCkpt.count() }
    t("extractDataset(orders)") {
      graft.model.Schema.extractDataset(nodes, "orders").count()
    }
    spark.stop()
  }
}
