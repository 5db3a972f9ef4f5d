package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class RollingStatsSpec extends AnyFunSuite with SparkSpec {

  private def events(rows: (Long, String, Long, Double)*) = {
    import spark.implicits._
    rows.toSeq
      .map { case (id, ts, u, v) => (id, Timestamp.valueOf(ts), u, v) }
      .toDF("event_id", "ts", "user_id", "value")
  }

  private def rolled(df: org.apache.spark.sql.DataFrame, windowSeconds: Long) =
    Events.rollingUserStats(df, windowSeconds).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap

  test("trailing frame includes only events within the window, per user") {
    val out = rolled(events(
      (1L, "2024-01-01 10:00:00", 1L, 1.00),
      (2L, "2024-01-01 10:30:00", 1L, 2.00), // within 1h of e1
      (3L, "2024-01-01 12:00:00", 1L, 4.00), // e2 is 90 min back -> out
      (4L, "2024-01-01 10:15:00", 2L, 8.00)), // other user, own frame
      windowSeconds = 3600)
    assert(out == Map(
      1L -> ((1L, 100L)),
      2L -> ((2L, 300L)),
      3L -> ((1L, 400L)),
      4L -> ((1L, 800L))))
  }

  test("frame bound is inclusive and ties share the full same-time frame") {
    val out = rolled(events(
      (1L, "2024-01-01 10:00:00", 1L, 1.00),
      (2L, "2024-01-01 11:00:00", 1L, 2.00), // exactly windowSeconds after e1
      (3L, "2024-01-01 11:00:00", 1L, 4.00)), // same microsecond as e2
      windowSeconds = 3600)
    // RANGE frames are value-defined: both 11:00 events see e1 (inclusive
    // bound) AND each other, regardless of row order
    assert(out == Map(
      1L -> ((1L, 100L)),
      2L -> ((3L, 700L)),
      3L -> ((3L, 700L))))
  }
}
