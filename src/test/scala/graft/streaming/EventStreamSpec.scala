package graft.streaming

import graft.SparkSpec
import graft.operators.Events
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class EventStreamSpec extends AnyFunSuite with SparkSpec {

  test("streaming hourly stats (file source) equal the batch transform") {
    import spark.implicits._

    val rows = Seq(
      (1L, "2024-01-01 10:15:00", 1L, "click", 1.25, "{}"),
      (2L, "2024-01-01 10:45:00", 2L, "click", 2.50, "{}"),
      (3L, "2024-01-01 11:05:00", 3L, "view", 4.00, "{}"))
      .map { case (id, ts, u, t, v, p) => (id, Timestamp.valueOf(ts), u, t, v, p) }
    val batchDf = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val dir = java.nio.file.Files.createTempDirectory("events-stream")
    val srcDir = dir.resolve("src").toString
    batchDf.write.parquet(srcDir)

    val stats = EventStream.hourlyStats(EventStream.readEvents(spark, srcDir), watermark = "1 hour")
    val query = stats.writeStream
      .format("memory")
      .queryName("hourly_stream_test")
      .outputMode("complete")
      .start()
    try {
      query.processAllAvailable()
      val got = spark.sql("SELECT * FROM hourly_stream_test").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      val want = Events.hourlyStats(batchDf).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == want)
      assert(got.contains(("2024-01-01 10:00:00", "click", 2L, 375L)))
    } finally query.stop()
  }

  test("streaming sliding windows equal the batch transform, one row per overlap") {
    import spark.implicits._

    val rows = Seq(
      (1L, "2024-01-01 10:15:00", 1L, "click", 1.25, "{}"),
      (2L, "2024-01-01 10:45:00", 2L, "click", 2.50, "{}"))
      .map { case (id, ts, u, t, v, p) => (id, Timestamp.valueOf(ts), u, t, v, p) }
    val batchDf = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val dir = java.nio.file.Files.createTempDirectory("events-sliding")
    val srcDir = dir.resolve("src").toString
    batchDf.write.parquet(srcDir)

    val stats = Events.slidingStats(
      EventStream.readEvents(spark, srcDir).withWatermark("ts", "2 hours"))
    val query = stats.writeStream
      .format("memory")
      .queryName("sliding_stream_test")
      .outputMode("complete")
      .start()
    try {
      query.processAllAvailable()
      val got = spark.sql("SELECT * FROM sliding_stream_test").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      val want = Events.slidingStats(batchDf).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == want)
      // 10:15 lands in starts 08:30..10:00; 10:45 in 09:00..10:30 — the
      // three shared windows carry both clicks
      assert(got.contains(("2024-01-01 09:00:00", "click", 2L, 375L)))
      assert(got.contains(("2024-01-01 08:30:00", "click", 1L, 125L)))
      assert(got.contains(("2024-01-01 10:30:00", "click", 1L, 250L)))
      assert(got.size == 5) // starts 08:30..10:30 at 30 min steps
    } finally query.stop()
  }

  test("stream-static enrichment equals the batch join and broadcasts the dimension") {
    import spark.implicits._
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "purchase", 1.0, "{}"),
      (2L, "2024-01-01 10:05:00", 2L, "purchase", 2.0, "{}"),
      (3L, "2024-01-01 10:10:00", 9L, "purchase", 3.0, "{}")) // no profile row → drops
      .map { case (id, ts, u, t, v, p) => (id, Timestamp.valueOf(ts), u, t, v, p) }
    val dir = java.nio.file.Files.createTempDirectory("events-enrich")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(dir.resolve("src").toString)

    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val stream = EventStream.readEvents(spark, dir.resolve("src").toString)
      .select("event_id", "user_id")
    val enriched = EventStream.enrichWithDim(stream, dim, Seq("user_id"))
    val query = enriched.writeStream
      .format("memory").queryName("enrich_stream_test")
      .outputMode("append")
      .start()
    try {
      query.processAllAvailable()
      val got = spark.sql("SELECT event_id, user_id, tier FROM enrich_stream_test")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(got == Set((1L, 1L, "gold"), (2L, 2L, "basic")))
      // unlike a stream-stream join, the enrichment must buffer nothing
      assert(query.lastProgress.stateOperators.isEmpty,
        "stream-static join must keep no state")
    } finally query.stop()
  }

  test("stream-stream interval join pairs within the window, inclusive edges, keyed") {
    import spark.implicits._
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0, "{}"),
      (2L, "2024-01-01 10:04:00", 1L, "purchase", 0.0, "{}"), // view 1 within 5 min
      (3L, "2024-01-01 10:04:00", 1L, "view", 0.0, "{}"), // same instant as purchase 2 → matches
      (4L, "2024-01-01 11:00:00", 1L, "purchase", 0.0, "{}"), // nothing within 5 min
      (5L, "2024-01-01 10:03:00", 2L, "view", 0.0, "{}")) // other user
      .map { case (id, ts, u, t, v, p) => (id, Timestamp.valueOf(ts), u, t, v, p) }
    val dir = java.nio.file.Files.createTempDirectory("events-ssjoin")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(dir.resolve("src").toString)

    def side(t: String) = EventStream.readEvents(spark, dir.resolve("src").toString)
      .filter(org.apache.spark.sql.functions.col("event_type") === t)
      .select("event_id", "ts", "user_id")
    val joined = EventStream
      .intervalJoin(side("purchase"), side("view"), "user_id", windowSeconds = 300L)
      .selectExpr("l.event_id AS purchase_id", "r.event_id AS view_id")
    val query = joined.writeStream
      .format("memory").queryName("ssjoin_stream_test")
      .outputMode("append")
      .start()
    try {
      query.processAllAvailable()
      val got = spark.sql("SELECT purchase_id, view_id FROM ssjoin_stream_test")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((2L, 1L), (2L, 3L)))
    } finally query.stop()
  }

  test("streaming exact dedup keeps first occurrence per content hash") {
    import spark.implicits._
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", "same text"),
      (2L, "2024-01-01 10:05:00", "same text"),
      (3L, "2024-01-01 10:10:00", "other text"))
      .map { case (id, ts, t) => (id, Timestamp.valueOf(ts), t) }
    val dir = java.nio.file.Files.createTempDirectory("docs-stream")
    val srcDir = dir.resolve("src").toString
    rows.toDF("doc_id", "ts", "text").write.parquet(srcDir)

    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, ts TIMESTAMP, text STRING"))
      .parquet(srcDir)
    val deduped = DocStream.dedupDocuments(stream, "text", "ts", watermark = "1 hour")
    val query = deduped.writeStream
      .format("memory").queryName("doc_dedup_test").outputMode("append").start()
    try {
      query.processAllAvailable()
      val got = spark.sql("SELECT text FROM doc_dedup_test").collect()
        .map(_.getString(0)).sorted.toSeq
      assert(got == Seq("other text", "same text"))
    } finally query.stop()
  }

  test("user type profile: keyed state accumulates across micro-batches") {
    import spark.implicits._
    // Spark 4 moved MemoryStream under execution.streaming.runtime
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val src = MemoryStream[(Long, Long, String)]
    val df = src.toDF().toDF("event_id", "user_id", "event_type")
    val query = EventStream.userTypeProfile(df)
      .writeStream.format("memory").queryName("user_types_test")
      .outputMode("update").start()
    try {
      // batch 1: user 1 sees two types, user 2 one
      src.addData((1L, 1L, "click"), (2L, 1L, "view"), (3L, 2L, "click"))
      query.processAllAvailable()
      // batch 2: user 1 repeats a type (no growth), user 2 adds one
      src.addData((4L, 1L, "click"), (5L, 2L, "purchase"))
      query.processAllAvailable()
      val finalCounts = spark.sql(
        "SELECT user_id, max(n_types) FROM user_types_test GROUP BY user_id").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      // state carried the batch-1 sets into batch 2
      assert(finalCounts == Map(1L -> 2, 2L -> 2))
      // the update stream emitted a row per touched user per batch
      val updates = spark.sql("SELECT count(*) FROM user_types_test").head.getLong(0)
      assert(updates == 4L)
    } finally query.stop()
  }

  test("streaming sessions close on a later event and on watermark timeout") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val src = MemoryStream[(Long, Timestamp)]
    val df = src.toDF().toDF("user_id", "ts")
    // 10-minute gap, 10-minute watermark delay
    val query = EventStream.userSessions(df, gapSeconds = 600, watermark = "10 minutes")
      .writeStream.format("memory").queryName("user_sessions_test")
      .outputMode("append").start()
    def t(s: String) = Timestamp.valueOf(s)
    def sessions() = spark.sql("SELECT * FROM user_sessions_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val us10 = t("2024-01-01 10:00:00").getTime * 1000L
    try {
      // batch 1: two close events -> one OPEN session, nothing emitted
      src.addData((1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-01 10:05:00")))
      query.processAllAvailable()
      assert(sessions().isEmpty)
      // batch 2: 55 min later -> closes session 1 via the gap rule
      src.addData((1L, t("2024-01-01 11:00:00")))
      query.processAllAvailable()
      assert(sessions() == Set((1L, us10, us10 + 300000000L, 2L)))
      // batches 3-4: another user far in the future advances the
      // watermark past 11:00 + gap -> user 1's open session times out
      src.addData((2L, t("2024-01-01 13:00:00")))
      query.processAllAvailable()
      src.addData((2L, t("2024-01-01 13:05:00")))
      query.processAllAvailable()
      val closed = sessions()
      val us11 = t("2024-01-01 11:00:00").getTime * 1000L
      assert(closed.contains((1L, us11, us11, 1L)), s"got $closed")
    } finally query.stop()
  }

  test("a too-early in-watermark straggler becomes its own closed session") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val src = MemoryStream[(Long, Timestamp)]
    val df = src.toDF().toDF("user_id", "ts")
    // watermark delay (2 h) deliberately LONGER than the gap (10 min):
    // late events older than open.start - gap are in-watermark here
    val query = EventStream.userSessions(df, gapSeconds = 600, watermark = "2 hours")
      .writeStream.format("memory").queryName("straggler_sessions_test")
      .outputMode("append").start()
    def t(s: String) = Timestamp.valueOf(s)
    def sessions() = spark.sql("SELECT * FROM straggler_sessions_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    try {
      // batch 1 opens a session at 12:00
      src.addData((1L, t("2024-01-01 12:00:00")))
      query.processAllAvailable()
      // batch 2: straggler at 10:30 — 90 min before the open start
      // (beyond the gap), safely inside the 2 h watermark. Batch
      // sessionize puts it in its own session; the old fold would have
      // absorbed it into the 12:00 session.
      src.addData((1L, t("2024-01-01 10:30:00")))
      query.processAllAvailable()
      val us1030 = t("2024-01-01 10:30:00").getTime * 1000L
      assert(sessions() == Set((1L, us1030, us1030, 1L)), s"got ${sessions()}")
    } finally query.stop()
  }
}
