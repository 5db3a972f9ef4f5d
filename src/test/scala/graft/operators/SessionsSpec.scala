package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class SessionsSpec extends AnyFunSuite with SparkSpec {

  private def events(rows: (Long, String, Long, Double)*) = {
    import spark.implicits._
    rows.toSeq
      .map { case (id, ts, u, v) => (id, Timestamp.valueOf(ts), u, v) }
      .toDF("event_id", "ts", "user_id", "value")
  }

  test("sessionize splits on gap, keeps runs together, numbers sessions per user") {
    val df = events(
      (1L, "2024-01-01 10:00:00", 1L, 1.00),
      (2L, "2024-01-01 10:20:00", 1L, 2.00), // 20 min after -> same session
      (3L, "2024-01-01 12:00:00", 1L, 4.00), // 100 min after -> new session
      (4L, "2024-01-01 10:10:00", 2L, 8.00)) // other user, own session 0
    val out = Sessions.sessionize(df, gapSeconds = 3600).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5))).toSet
    assert(out == Set(
      (1L, 0L, 2L, 300L), // user 1 session 0: events 1+2, 100+200 cents
      (1L, 1L, 1L, 400L),
      (2L, 0L, 1L, 800L)))
  }

  test("sessionSequences orders the type path by (us, event_id) and splits on gap") {
    import spark.implicits._
    val df = Seq(
      // same-microsecond pair: event_id breaks the tie -> "a" before "b"
      (2L, "2024-01-01 10:00:00", 1L, "b"),
      (1L, "2024-01-01 10:00:00", 1L, "a"),
      (3L, "2024-01-01 10:30:00", 1L, "c"),
      (4L, "2024-01-01 13:00:00", 1L, "d"), // 150 min gap -> new session
      (5L, "2024-01-01 09:00:00", 2L, "e"))
      .map { case (id, ts, u, t) => (id, java.sql.Timestamp.valueOf(ts), u, t) }
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Sessions.sessionSequences(df, gapSeconds = 3600)
      .select("user_id", "session_seq", "n_events", "type_path")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(out == Set(
      (1L, 0L, 3L, "a>b>c"),
      (1L, 1L, 1L, "d"),
      (2L, 0L, 1L, "e")))
  }

  test("session bounds and duration are exact epoch micros") {
    val df = events(
      (1L, "2024-01-01 10:00:00.000001", 1L, 1.0),
      (2L, "2024-01-01 10:00:00.000005", 1L, 1.0))
    val r = Sessions.sessionize(df, gapSeconds = 3600).collect().head
    val start = r.getLong(3)
    val end = r.getLong(4)
    assert(end - start == 4L)
    assert(r.getLong(6) == 4L) // duration_us
  }

  test("an exact-gap pair stays in one session; one microsecond more splits") {
    val base = "2024-01-01 10:00:00"
    val atGap = events((1L, base, 1L, 1.0), (2L, "2024-01-01 11:00:00", 1L, 1.0))
    assert(Sessions.sessionize(atGap, gapSeconds = 3600).count() == 1)
    val overGap = events((1L, base, 1L, 1.0), (2L, "2024-01-01 11:00:00.000001", 1L, 1.0))
    assert(Sessions.sessionize(overGap, gapSeconds = 3600).count() == 2)
  }

  test("funnel: greedy earliest-after chain, strict ordering, break stops the count") {
    import spark.implicits._
    val df = Seq(
      // user 1 completes A→B→C, with a decoy early B that must be
      // skipped (it precedes A) and the EARLIEST valid B taken
      (1L, "2024-01-01 09:00:00", 1L, "B", 0.0),
      (2L, "2024-01-01 10:00:00", 1L, "A", 0.0),
      (3L, "2024-01-01 11:00:00", 1L, "B", 0.0),
      (4L, "2024-01-01 12:00:00", 1L, "B", 0.0),
      (5L, "2024-01-01 13:00:00", 1L, "C", 0.0),
      // user 2: A then C but no B after A → stuck at 1
      (6L, "2024-01-01 10:00:00", 2L, "A", 0.0),
      (7L, "2024-01-01 11:00:00", 2L, "C", 0.0),
      // user 3: B at exactly A's timestamp — strictly-after excludes it
      (8L, "2024-01-01 10:00:00", 3L, "A", 0.0),
      (9L, "2024-01-01 10:00:00", 3L, "B", 0.0),
      // user 4: never does A → no funnel row at all
      (10L, "2024-01-01 10:00:00", 4L, "B", 0.0))
      .map { case (id, ts, u, t, v) => (id, Timestamp.valueOf(ts), u, t, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.operators.Events.funnelSteps(df, Seq("A", "B", "C"))
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("steps_completed")).toMap
    assert(out == Map(1L -> 3, 2L -> 1, 3L -> 1))
    val u1 = graft.operators.Events.funnelSteps(df, Seq("A", "B", "C"))
      .filter(org.apache.spark.sql.functions.col("user_id") === 1L).collect().head
    assert(u1.getAs[Long]("step2_us") == Timestamp.valueOf("2024-01-01 11:00:00").getTime * 1000)
  }

  test("retention: cohort by first-seen day, offsets per activity day, distinct users") {
    import spark.implicits._
    val df = Seq(
      (1L, "2024-01-01 09:00:00", 1L, "x", 0.0), // user 1: cohort day D
      (2L, "2024-01-01 23:00:00", 1L, "x", 0.0), // same day — no extra row
      (3L, "2024-01-03 01:00:00", 1L, "x", 0.0), // D+2
      (4L, "2024-01-03 05:00:00", 2L, "x", 0.0)) // user 2: cohort D+2
      .map { case (id, ts, u, t, v) => (id, Timestamp.valueOf(ts), u, t, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000 / 86400000000L
    val out = graft.operators.Events.retentionCohorts(df).collect()
      .map(r => (r.getLong(0) - base, r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((0L, 0L, 1L), (0L, 2L, 1L), (2L, 0L, 1L)))
  }

  test("transitions: per-user ordered pairs, cross-user boundaries excluded") {
    import spark.implicits._
    val df = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "A", 0.0),
      (2L, "2024-01-01 11:00:00", 1L, "B", 0.0),
      (3L, "2024-01-01 12:00:00", 1L, "B", 0.0),
      (4L, "2024-01-01 10:30:00", 2L, "C", 0.0)) // other user's lone event: no pair
      .map { case (id, ts, u, t, v) => (id, Timestamp.valueOf(ts), u, t, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.operators.Events.transitions(df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set(("A", "B", 1L), ("B", "B", 1L)))
  }

  test("stratified sampling is deterministic, honors per-stratum rates, prunes columns") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val docs = (0L until 2000L).map(i => (i, if (i % 2 == 0) "en" else "de", s"text $i"))
      .toDF("doc_id", "lang", "text")
    val sample = Sampling.stratified(docs, "lang", "doc_id",
      Map("en" -> 0.1), defaultFraction = 0.8)
    val rows = sample.select("doc_id", "lang").collect().map(r => (r.getLong(0), r.getString(1)))
    val byLang = rows.groupBy(_._2).view.mapValues(_.length).toMap
    // 1000 docs per stratum; hash-bucket rates land within a few percent
    assert(byLang("en") > 50 && byLang("en") < 150, s"en=${byLang("en")}")
    assert(byLang("de") > 700 && byLang("de") < 900, s"de=${byLang("de")}")
    // deterministic: the same call yields the identical sample
    val again = Sampling.stratified(docs, "lang", "doc_id",
      Map("en" -> 0.1), defaultFraction = 0.8)
      .select("doc_id", "lang").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSet == again.toSet)
  }

  test("fixed-size sampling keeps exactly min(k, stratum size), nested across k") {
    import spark.implicits._
    val docs = (0L until 100L).map(i => (i, if (i < 98) "en" else "de", s"text $i"))
      .toDF("doc_id", "lang", "text")
    def kept(k: Int): Map[String, Set[Long]] = Sampling
      .fixedSizePerStratum(docs, "lang", "doc_id", k)
      .select("doc_id", "lang").collect()
      .map(r => (r.getString(1), r.getLong(0))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val k10 = kept(10)
    assert(k10("en").size == 10)
    assert(k10("de").size == 2) // stratum smaller than k -> whole stratum
    // nested: smaller k is always a prefix of the same hash ordering
    val k5 = kept(5)
    assert(k5("en").subsetOf(k10("en")))
    // ranks are contiguous from 1
    val ranks = Sampling.fixedSizePerStratum(docs, "lang", "doc_id", 10)
      .where($"lang" === "en").select("sample_rank").as[Int].collect().sorted
    assert(ranks.toSeq == (1 to 10))
  }

  test("fraction bounds: 0 keeps nothing, 1 keeps everything") {
    import spark.implicits._
    val docs = (0L until 100L).map(i => (i, "en")).toDF("doc_id", "lang")
    assert(Sampling.stratified(docs, "lang", "doc_id", Map("en" -> 0.0)).count() == 0)
    assert(Sampling.stratified(docs, "lang", "doc_id", Map("en" -> 1.0)).count() == 100)
  }

  test("named splits draw independent samples") {
    import spark.implicits._
    val docs = (0L until 1000L).map(i => (i, "x")).toDF("doc_id", "lang")
    val a = Sampling.deterministic(docs, "doc_id", 0.5, "train").collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministic(docs, "doc_id", 0.5, "valid").collect().map(_.getLong(0)).toSet
    assert(a != b)
    // ~25% expected overlap for independent halves
    val overlap = (a & b).size
    assert(overlap > 150 && overlap < 350, s"overlap=$overlap")
  }
}
