package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-threshold outlier detection — the monitoring primitive a
  * pipeline runs over event/metric streams: "flag every observation
  * above its group's p99". Two stages, both scale-shaped:
  *
  *   1. per-key thresholds via the exact nearest-rank percentile
  *      ([[Stats.nearestRankQuantiles]] — one exchange on the key,
  *      integer-only rank arithmetic, bit-reproducible);
  *   2. a BROADCAST join of the threshold table (bounded by key
  *      cardinality, not corpus size) back onto the facts + a codegen'd
  *      filter — the fact side never shuffles.
  *
  * Values are integer cents, so "above p99" is the same predicate on
  * every engine.
  */
object Anomaly {

  /** Rows of `df` whose `valueCol` (as cents) strictly exceeds their
    * key's nearest-rank `percent`-percentile. Output: the `keep`
    * columns + (value_cents, threshold_cents).
    */
  def outliersAbovePercentile(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      percent: Int,
      keep: Seq[String],
  ): DataFrame = {
    require(percent >= 1 && percent <= 100, s"percent in [1,100]: $percent")
    val withCents = df.withColumn("value_cents", round(col(valueCol) * 100).cast("long"))
    val thresholds = Stats
      .nearestRankQuantiles(withCents, keyCol, "value_cents", Seq(percent))
      .select(col(keyCol), col(s"p$percent").as("threshold_cents"))
    withCents
      .join(broadcast(thresholds), keyCol)
      .filter(col("value_cents") > col("threshold_cents"))
      .select((keep :+ keyCol).distinct.map(col) ++
        Seq(col("value_cents"), col("threshold_cents")): _*)
  }
}
