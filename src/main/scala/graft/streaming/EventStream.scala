package graft.streaming

import graft.operators.Events
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupStateTimeout, OutputMode}

/** Update-stream row of [[EventStream.userTypeProfile]]: the number of
  * distinct event types this user has produced so far.
  */
final case class UserTypeCount(user_id: Long, n_types: Int)

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

  /** Per-user distinct-event-type profile via explicit keyed state
    * (`KeyValueGroupedDataset.mapGroupsWithState`) — the custom-state
    * lane that windowed aggregations can't express. The state per user
    * is the SET of event types seen, bounded by the event-type
    * vocabulary rather than the stream length. The emitted count is
    * monotone non-decreasing, and set union is commutative, so
    * max-per-user over the update stream yields the same result under
    * ANY micro-batch partitioning or arrival order of the input — which
    * is what lets a deterministic batch oracle check it.
    */
  def userTypeProfile(stream: DataFrame): Dataset[UserTypeCount] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col("user_id").cast("long"), col("event_type").cast("string"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[Set[String], UserTypeCount](GroupStateTimeout.NoTimeout) {
        (user, rows, state) =>
          val types = state.getOption.getOrElse(Set.empty[String]) ++ rows.map(_._2)
          state.update(types)
          UserTypeCount(user, types.size)
      }
  }

  /** Read a directory of parquet event files as a stream (file source —
    * each newly arriving file becomes a micro-batch).
    */
  def readEvents(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"))
      .parquet(dir)
}
