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
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    // same base config as SparkSpec: if this suite runs first, later
    // suites inherit this context
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-extensions-test")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      val r = spark
        .sql("SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS s")
        .head.getDouble(0)
      assert(math.abs(r - 1.0) < 1e-12)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prev.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
