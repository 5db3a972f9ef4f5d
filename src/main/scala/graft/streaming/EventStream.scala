package graft.streaming

import graft.operators.Events
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import org.apache.spark.sql.Row

/** Structured Streaming surface for the event aggregations: the SAME
  * transform as the batch query (graft.operators.Events), applied to a
  * streaming DataFrame with a watermark so state is bounded and late
  * events beyond the horizon are dropped.
  */
object EventStream {

  /** Windowed stats over a streaming events frame. `withWatermark` bounds
    * the state store; output mode Append emits finalized windows only.
    */
  def hourlyStats(stream: DataFrame, watermark: String = "2 hours"): DataFrame =
    Events.hourlyStats(stream.withWatermark("ts", watermark))

  /** Convenience writer: parquet sink + checkpoint dir (the production
    * shape; tests use the memory sink instead).
    */
  def writer(stats: DataFrame, checkpointDir: String): DataStreamWriter[Row] =
    stats.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)

  /** Read a directory of parquet event files as a stream (file source —
    * each newly arriving file becomes a micro-batch).
    */
  def readEvents(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"))
      .parquet(dir)
}
