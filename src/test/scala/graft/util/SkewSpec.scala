package graft.util

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Guardrail that ADAPTIVE skew handling stays operative under this
  * library's session configuration: the engine's own skew defenses are
  * algorithmic (prefix-filtered shingle joins, structural collapse,
  * bounded LSH buckets), but user joins through the same session rely
  * on AQE splitting runaway partitions at runtime — a config regression
  * that disabled it would surface only as 100TB-scale stragglers, never
  * as a test failure, unless pinned here.
  */
class SkewSpec extends AnyFunSuite with SparkSpec {

  test("AQE splits a skewed sort-merge join at runtime") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ).map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // shrink the size thresholds so test-scale data trips the same
      // machinery a 100TB hot key would
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      // forbid broadcast so the join stays sort-merge (the skewed shape)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      import org.apache.spark.sql.functions.{col, concat_ws, lit, md5, when}
      // one hot key carrying ~all rows on the big side; the pad is
      // per-row md5 material so shuffle compression cannot flatten the
      // hot partition back under the skew threshold
      val pad = concat_ws("", Seq.tabulate(8)(i =>
        md5(concat_ws(":", col("id"), lit(i)).cast("binary"))): _*)
      val left = spark.range(0, 20000).select(
        when(col("id") % 32 < 31, 0L).otherwise(1L).as("k"), pad.as("pad"))
      val right = spark.range(0, 40).select(
        when(col("id") < 30, 0L).otherwise(1L).as("k"), lit(1).as("v"))
      val joined = left.join(right, "k")
      // AQE finalizes per QueryExecution — count() would plan its own, so
      // drive THIS dataframe's executed plan and inspect it afterwards
      val qe = joined.queryExecution
      qe.executedPlan.execute().count()
      val p = qe.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE did not mark the skewed join (config regression?):\n${p.take(4000)}")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
