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

  /** Ordered funnel completion per user — the product-analytics
    * staple: how far does each user get through `steps`, taking each
    * step's EARLIEST occurrence strictly after the previous step's
    * time (the greedy matching that makes completion well-defined).
    *
    * Computed as one conditional aggregation per step — filter to the
    * step's type, `min(ts)` per user with the strictly-after bound,
    * join back on the user key. Each pass is a map-side-combined
    * aggregation + a user-cardinality join, so cost is
    * O(steps × events) with no per-user array materialization and no
    * cross-row UDF; at cluster scale every pass shuffles on the same
    * user key (AQE coalesces the tiny per-step aggregates).
    *
    * Output: one row per user appearing in step 1's type, with
    * `step<i>_us` (epoch micros, null once the chain breaks) and
    * `steps_completed`. Integer-exact, so any SQL engine reproduces it.
    */
  def funnelSteps(
      events: DataFrame,
      steps: Seq[String],
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
  ): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val us = events
      .select(col(userCol), col(typeCol), unix_micros(col(tsCol)).as("graft_us"))
    val first = us.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(col("graft_us")).as("step1_us"))
    val chained = steps.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (step, i)) =>
        val prev = s"step${i}_us"
        val cur = s"step${i + 1}_us"
        // strictly-after bound: join the step's events to the chain so
        // far on the user key, keep those after the previous step, take
        // the min — aggregation state is one timestamp per user, never
        // a per-user event list
        val stepTimes = us.filter(col(typeCol) === step)
          .join(acc.select(col(userCol), col(prev)), Seq(userCol))
          .filter(col("graft_us") > col(prev))
          .groupBy(col(userCol))
          .agg(min(col("graft_us")).as(cur))
        acc.join(stepTimes, Seq(userCol), "left")
    }
    chained.withColumn("steps_completed",
      steps.indices.map(i => when(col(s"step${i + 1}_us").isNotNull, 1).otherwise(0))
        .reduce(_ + _).cast("int"))
  }

  /** Event-type transition counts — the Markov edge list behind "what
    * do users do next" analyses and next-event models. One window pass
    * per user in (time, id) order (lag → pair), then a
    * map-side-combined count per (from, to); the window reuses the
    * same user-key exchange sessionization pays, and the unique
    * (tsCol, idCol) order makes every transition deterministic.
    */
  def transitions(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
      idCol: String = "event_id",
  ): DataFrame = {
    val order = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol))
      .orderBy(unix_micros(col(tsCol)), col(idCol))
    events
      .withColumn("graft_prev", lag(col(typeCol), 1).over(order))
      .filter(col("graft_prev").isNotNull)
      .groupBy(col("graft_prev").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** Cohort retention — the funnel's aggregate companion: bucket users
    * by the day of their FIRST event (the cohort), then count how many
    * of each cohort are active again N days later. Two aggregations and
    * one user-keyed join: first-seen per user (map-side-combined min),
    * join back to the event log, distinct-count per (cohort_day,
    * day_offset). Day arithmetic is integer floor-division on epoch
    * micros, so buckets are exact and engine-portable.
    *
    * Output: (cohort_day, day_offset, n_users) with day_offset 0 =
    * the cohort's own first day; n_users at offset 0 is the cohort
    * size.
    */
  def retentionCohorts(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
  ): DataFrame = {
    val dayUs = 86400L * 1000000L
    def dayOf(c: org.apache.spark.sql.Column) =
      (c - pmod(c, lit(dayUs))) / lit(dayUs)
    val us = events.select(col(userCol), unix_micros(col(tsCol)).as("graft_us"))
    val cohorts = us.groupBy(col(userCol))
      .agg(min(col("graft_us")).as("first_us"))
      .withColumn("cohort_day", dayOf(col("first_us")).cast("long"))
    us.join(cohorts, Seq(userCol))
      .withColumn("day_offset",
        (dayOf(col("graft_us")) - col("cohort_day")).cast("long"))
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Per-event trailing-window user features — "activity in the last N
    * days at the moment of each event", the classic point-in-time
    * feature for behavioral models (computing it with a join instead of
    * a window is the textbook 100×-scale mistake: a range self-join on
    * the event table).
    *
    * One RANGE-frame window pass over integer epoch micros: frames are
    * defined by VALUE, not row position, so same-microsecond ties get
    * identical (and engine-independent) frames. One hash exchange on
    * the user key + a per-user sort — the same per-user bound the
    * session lanes rely on; counts and cent-sums are integer-exact.
    */
  def rollingUserStats(
      events: DataFrame,
      windowSeconds: Long = 7L * 86400,
      userCol: String = "user_id",
      tsCol: String = "ts",
      idCol: String = "event_id",
      valueCol: String = "value",
  ): DataFrame = {
    require(windowSeconds >= 1, s"windowSeconds must be >= 1: $windowSeconds")
    val windowUs = windowSeconds * 1000000L
    val trailing = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol))
      .orderBy(col("graft_us"))
      .rangeBetween(-windowUs, 0)
    events
      .select(col(idCol), col(userCol), unix_micros(col(tsCol)).as("graft_us"),
        round(col(valueCol) * 100).cast("long").as("graft_cents"))
      .select(
        col(idCol), col(userCol), col("graft_us").as("us"),
        count(lit(1)).over(trailing).as("n_window"),
        sum(col("graft_cents")).over(trailing).as("sum_value_cents_window"))
  }

  /** SLIDING-window counts per event type — overlapping windows (each
    * event lands in duration/slide of them), the moving-average shape
    * dashboards and anomaly alerts use. Identical code serves batch and
    * Structured Streaming (where watermark + window start eviction keep
    * state bounded by duration/slide × type-vocabulary, not stream
    * length). Windows are epoch-aligned, so the window set an event
    * joins is closed-form integer arithmetic — oracle-checkable.
    */
  def slidingStats(
      events: DataFrame,
      windowDuration: String = "2 hours",
      slideDuration: String = "30 minutes",
      tsCol: String = "ts",
      typeCol: String = "event_type",
  ): DataFrame =
    events
      .groupBy(
        window(col(tsCol), windowDuration, slideDuration).as("w"),
        col(typeCol))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_cents"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col(typeCol),
        col("n_events"),
        col("sum_value_cents"))

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
