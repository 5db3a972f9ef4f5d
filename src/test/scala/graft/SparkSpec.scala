package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for all Spark-backed suites (one JVM-wide session,
  * kept alive across suites to avoid per-suite startup cost).
  */
object SparkSpec {
  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

trait SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSpec.spark
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
