package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-stream aggregations. The transform is a plain DataFrame →
  * DataFrame function so the exact same code runs in a batch query (with
  * an oracle) and under Structured Streaming (graft.streaming).
  *
  * Value sums are taken over `round(value*100)` as int64 cents: integer
  * addition is associative, so the result is bit-identical regardless of
  * partitioning/aggregation order — double sums are not.
  */
object Events {

  /** Tumbling-window counts and exact stats per event type. */
  def hourlyStats(events: DataFrame, tsCol: String = "ts", typeCol: String = "event_type"): DataFrame =
    events
      .groupBy(
        window(col(tsCol), "1 hour").as("w"),
        col(typeCol))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_cents"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        approx_count_distinct(col("user_id")).as("approx_users"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col(typeCol),
        col("n_events"),
        col("sum_value_cents"),
        col("min_value"),
        col("max_value"),
        col("approx_users"))
}
