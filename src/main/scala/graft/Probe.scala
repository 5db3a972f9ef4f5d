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
    // warm-up: one full flatten so codegen/JIT costs land outside the
    // timed phases below
    t("warmup flatten count") {
      RelationalLoader.loadNodes(spark, sfDir, Testdata.ordersDb).count()
    }
    t("flatten count (warm)") {
      RelationalLoader.loadNodes(spark, sfDir, Testdata.ordersDb).count()
    }
    t("flatten noop (warm)") {
      RelationalLoader.loadNodes(spark, sfDir, Testdata.ordersDb)
        .write.format("noop").mode("overwrite").save()
    }
    val nodes = RelationalLoader.loadNodes(spark, sfDir, Testdata.ordersDb)
    t("extractDataset(orders)") {
      graft.model.Schema.extractDataset(nodes, "orders").count()
    }
    spark.stop()
  }
}
