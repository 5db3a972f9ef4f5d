package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions-injected graft_cosine is callable from plain SQL") {
    // spark.sql.extensions is a STATIC conf: it only applies when the
    // SparkContext itself is created. Suites share one JVM, so when
    // another suite's context is already running this test cannot
    // exercise the injection — cancel rather than fake it (it runs for
    // real via `testOnly graft.functions.GraftExtensionsSpec`).
    assume(
      SparkSession.getDefaultSession.isEmpty && SparkSession.getActiveSession.isEmpty,
      "requires a fresh JVM (spark.sql.extensions is static)")
    // same base config as SparkSpec: if this suite runs first, later
    // suites inherit this context (never stop() it — shared JVM)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-extensions-test")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val r = spark
      .sql("SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS s")
      .head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
    val err = intercept[Exception] {
      spark.sql("SELECT graft_cosine(array(1.0d))").collect()
    }
    assert(err.getMessage.contains("graft_cosine requires exactly 2 arguments"))
  }
}
