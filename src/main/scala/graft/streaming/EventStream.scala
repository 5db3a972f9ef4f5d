package graft.streaming

import graft.operators.Events
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupStateTimeout, OutputMode}

/** Update-stream row of [[EventStream.userTypeProfile]]: the number of
  * distinct event types this user has produced so far.
  */
final case class UserTypeCount(user_id: Long, n_types: Int)

/** One CLOSED session emitted by [[EventStream.userSessions]]. */
final case class SessionOut(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

/** Keyed state of [[EventStream.userSessions]]: the user's one open
  * session — constant size per user regardless of stream length.
  */
final case class OpenSession(startUs: Long, endUs: Long, n: Long)

/** Typed input row for [[EventStream.userSessions]] (named field keeps
  * the watermark tag on `ts` through the Dataset conversion).
  */
final case class SessEvent(user_id: Long, ts: java.sql.Timestamp)

/** Structured Streaming surface for the event aggregations: the SAME
  * transform as the batch query (graft.operators.Events), applied to a
  * streaming DataFrame with a watermark so state is bounded and late
  * events beyond the horizon are dropped.
  */
object EventStream {

  /** Default session gap for [[userSessions]] — the batch operator's
    * canonical constant ([[graft.operators.Sessions.DefaultGapSeconds]]),
    * also interpolated into both DuckDB oracles, so batch, streaming,
    * and oracle gaps move together.
    */
  val DefaultSessionGapSeconds: Long = graft.operators.Sessions.DefaultGapSeconds

  /** Default watermark delay for [[userSessions]], milliseconds. The
    * string form passed to `withWatermark` is derived from this one
    * value.
    */
  val DefaultSessionWatermarkMs: Long = 3600 * 1000L

  /** `withWatermark`-syntax rendering of [[DefaultSessionWatermarkMs]]. */
  val DefaultSessionWatermark: String = s"$DefaultSessionWatermarkMs milliseconds"

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

  /** Stream-static enrichment join: attach a (small) static dimension —
    * a user profile, a source registry, a quality-score lookup — to
    * every streaming row. The static side is explicitly `broadcast()`:
    * each micro-batch then plans a BroadcastHashJoin, so the stream
    * never shuffles and the state store holds NOTHING (unlike a
    * stream-stream join, there is no buffering — the dimension is
    * re-resolvable every batch). Inner join: rows without a dimension
    * match drop, the usual enrichment contract; pass a pre-completed
    * dimension (e.g. with a default row) for left-ish semantics.
    */
  def enrichWithDim(stream: DataFrame, dim: DataFrame, keyCols: Seq[String]): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), keyCols)

  /** Stream-stream interval join: pair two event streams on a key when
    * the right event lands inside a bounded window before the left one
    * ("the view within N minutes before each purchase") — attribution
    * as a streaming operator. BOTH sides carry watermarks and the join
    * condition bounds right-ts to [left-ts − window, left-ts], so
    * Spark's state store can evict each side as the watermark passes —
    * state is bounded by (rate × window), never the stream length. An
    * UNBOUNDED condition would force both sides to buffer forever;
    * this operator makes the bound part of the signature.
    *
    * Inner join: every matched pair emits exactly once, so the result
    * set equals the batch inequality join for any micro-batching —
    * which is what the oracle lane checks.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      windowSeconds: Long,
      watermark: String = "1 hour",
  ): DataFrame = {
    import org.apache.spark.sql.functions.expr
    val l = left.withWatermark("ts", watermark).as("l")
    val r = right.withWatermark("ts", watermark).as("r")
    l.join(r,
      expr(s"""l.$keyCol = r.$keyCol AND
              |r.ts BETWEEN l.ts - INTERVAL $windowSeconds SECONDS AND l.ts
              |""".stripMargin))
  }

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

  /** Streaming gap sessionization — the incremental counterpart of
    * [[graft.operators.Sessions.sessionize]] via
    * `flatMapGroupsWithState` with an event-time timeout. Per user the
    * state is the single open session (constant size); a session closes
    * — and emits exactly once (Append) — either when a new event
    * arrives more than `gapSeconds` after it, or when the watermark
    * passes its end by the gap (the timeout), so idle users hold no
    * state hostage and emission needs no future event. Out-of-order
    * rows within the watermark fold into the open session (start/end
    * are min/max); rows later than that are dropped by the watermark
    * upstream.
    */
  def userSessions(
      stream: DataFrame,
      gapSeconds: Long = DefaultSessionGapSeconds,
      watermark: String = DefaultSessionWatermark,
  ): Dataset[SessionOut] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L
    stream
      .select(col("user_id").cast("long").as("user_id"), col("ts"))
      .withWatermark("ts", watermark)
      .as[SessEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) { (user, rows, state) =>
        if (state.hasTimedOut) {
          val s = state.get
          state.remove()
          Iterator.single(SessionOut(user, s.startUs, s.endUs, s.n))
        } else {
          // iterator order is not guaranteed, and with a watermark delay
          // longer than the gap a batch may even carry events older than
          // the open session's start. An interval merge over (state
          // interval + batch events) sorted by start reproduces the
          // batch sessionize semantics in every arrival order — a
          // too-early straggler becomes its own closed session instead
          // of being folded into a session it doesn't belong to.
          val intervals =
            (rows.map { r => val t = tsMicros(r.ts); OpenSession(t, t, 1) } ++
              state.getOption.iterator).toArray.sortBy(s => (s.startUs, s.endUs))
          val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          var cur = intervals.head
          for (s <- intervals.iterator.drop(1)) {
            if (s.startUs - cur.endUs <= gapUs)
              cur = OpenSession(cur.startUs, math.max(cur.endUs, s.endUs), cur.n + s.n)
            else {
              closed += SessionOut(user, cur.startUs, cur.endUs, cur.n)
              cur = s
            }
          }
          val open = cur
          state.update(open)
          // fire when the watermark passes end + gap; Spark requires the
          // timeout to sit strictly beyond the current watermark
          state.setTimeoutTimestamp(
            math.max((open.endUs + gapUs) / 1000 + 1, state.getCurrentWatermarkMs + 1))
          closed.iterator
        }
      }
  }

  /** Exact epoch micros of a Timestamp (getTime truncates to millis;
    * getNanos carries the full fractional second).
    */
  private def tsMicros(ts: java.sql.Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  /** Read a directory of parquet event files as a stream (file source —
    * each newly arriving file becomes a micro-batch). `ts` is normalized
    * to TIMESTAMP whatever unit the files encode (see
    * [[graft.sources.EventTime]]); test fixtures write plain TIMESTAMP.
    */
  def readEvents(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graft.sources.EventTime.normalize(spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"))
      .parquet(dir))
}
