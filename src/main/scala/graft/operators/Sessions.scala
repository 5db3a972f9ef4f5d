package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event log — the classic
  * feature-engineering step a training-data pipeline runs before
  * per-session aggregation (session length, activity mix, value totals).
  *
  * A session is a maximal run of one user's events in which consecutive
  * events are at most `gapSeconds` apart. Computed with window functions
  * (lag → boundary flag → running sum), so the whole operator is two
  * codegen'd window passes plus one aggregation — no UDFs, no
  * driver-side state.
  *
  * Scale: the only exchange is the hash partition on `userCol`; the
  * boundary flag, the running session counter, and the final per-session
  * aggregation all reuse that partitioning (Spark recognizes that
  * hash(user) satisfies the (user, session) clustering, so the groupBy
  * adds no second shuffle). Per-partition cost is a sort by (time, id),
  * bounded by events-per-user — the partition key a 1000-executor run
  * would also use, since session semantics are inherently per-user.
  *
  * Timestamps are compared as integer epoch micros (`unix_micros`), so
  * boundaries are exact and reproducible by any SQL engine; value sums
  * use the same integer-cents trick as [[Events.hourlyStats]].
  */
object Sessions {

  /** Canonical default session gap. The streaming lane
    * ([[graft.streaming.EventStream.userSessions]]) and BOTH DuckDB
    * oracles (batch and streaming, graft.queries.GraftQueries) derive
    * from this one value, so changing it moves every sessionization
    * surface together instead of silently desynchronizing them.
    */
  val DefaultGapSeconds: Long = 8 * 3600

  /** Per-session rows: (user, session_seq, n_events, start_us, end_us,
    * sum_value_cents, duration_us). `session_seq` is the user's 0-based
    * session ordinal in (time, id) order — deterministic because the
    * (tsCol, idCol) pair is unique per user.
    */
  def sessionize(
      events: DataFrame,
      gapSeconds: Long = DefaultGapSeconds,
      userCol: String = "user_id",
      tsCol: String = "ts",
      idCol: String = "event_id",
  ): DataFrame = {
    val gapUs = gapSeconds * 1000000L
    val order = Window.partitionBy(col(userCol)).orderBy(col("us"), col(idCol))
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    events
      .withColumn("us", unix_micros(col(tsCol)))
      // first event per user: lag is null → comparison null → flag 0,
      // so the first session is ordinal 0 (same CASE semantics in SQL)
      .withColumn("new_session",
        when(col("us") - lag(col("us"), 1).over(order) > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(running))
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"),
        max(col("us")).as("end_us"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_cents"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }

  /** Per-session ordered event-type sequences — the behavioral-sequence
    * dataset export step (each row is one training example: what a user
    * did, in order, within one session). Same window machinery and the
    * same exchange profile as [[sessionize]]; the sequence itself is
    * built by sorting the collected (us, id, type) structs INSIDE the
    * aggregation (`array_sort` on the unique (us, id) prefix), so the
    * emitted path is deterministic regardless of shuffle order. State
    * per group is one session's events — bounded by the session gap,
    * the same bound a 1000-executor run relies on.
    */
  def sessionSequences(
      events: DataFrame,
      gapSeconds: Long = DefaultGapSeconds,
      userCol: String = "user_id",
      tsCol: String = "ts",
      idCol: String = "event_id",
      typeCol: String = "event_type",
  ): DataFrame = {
    val gapUs = gapSeconds * 1000000L
    val order = Window.partitionBy(col(userCol)).orderBy(col("us"), col(idCol))
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    events
      .withColumn("us", unix_micros(col(tsCol)))
      .withColumn("new_session",
        when(col("us") - lag(col("us"), 1).over(order) > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(running))
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("us"), col(idCol), col(typeCol).as("t")))),
            x => x.getField("t")),
          ">").as("type_path"))
  }
}
