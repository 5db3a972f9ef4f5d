package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class AsofJoinSpec extends AnyFunSuite with SparkSpec {

  private def df(cols: String*)(rows: Product*) = {
    import spark.implicits._
    rows.map { p =>
      val v = p.productIterator.toSeq
      (v(0).asInstanceOf[Long], Timestamp.valueOf(v(1).asInstanceOf[String]),
        v(2).asInstanceOf[Long], v(3).asInstanceOf[Double])
    }.toDF(cols: _*)
  }

  private def leftEvents(rows: (Long, String, Long, Double)*) =
    df("event_id", "ts", "user_id", "value")(rows: _*)
  private def rightEvents(rows: (Long, String, Long, Double)*) =
    df("event_id", "ts", "user_id", "value")(rows: _*)

  private def run(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame,
      tolerance: Option[Long] = None) =
    AsofJoin.backward(l, r, "user_id", "ts", "event_id", Seq("event_id", "value"), tolerance)
      .selectExpr("event_id", "right_event_id", "right_value")
      .collect()
      .map(x => (x.getLong(0), Option(x.get(1)).map(_.asInstanceOf[Long]),
        Option(x.get(2)).map(_.asInstanceOf[Double])))
      .toSet

  test("backward as-of picks the latest right row at or before each left row, per key") {
    val l = leftEvents(
      (10L, "2024-01-01 12:00:00", 1L, 0.0),
      (11L, "2024-01-01 15:00:00", 1L, 0.0),
      (12L, "2024-01-01 12:00:00", 2L, 0.0))
    val r = rightEvents(
      (1L, "2024-01-01 11:00:00", 1L, 1.5),
      (2L, "2024-01-01 13:00:00", 1L, 2.5),
      (3L, "2024-01-01 13:00:00", 2L, 3.5)) // after user-2's left row
    assert(run(l, r) == Set(
      (10L, Some(1L), Some(1.5)), // 11:00 is the latest <= 12:00
      (11L, Some(2L), Some(2.5)), // 13:00 overtakes
      (12L, None, None))) // no right row at or before → left-outer null
  }

  test("a right row at exactly the left timestamp matches (backward inclusive)") {
    val l = leftEvents((10L, "2024-01-01 12:00:00", 1L, 0.0))
    val r = rightEvents((1L, "2024-01-01 12:00:00", 1L, 9.0))
    assert(run(l, r) == Set((10L, Some(1L), Some(9.0))))
  }

  test("ties among right rows at one (key, time) resolve to the greatest right id") {
    val l = leftEvents((10L, "2024-01-01 12:00:00", 1L, 0.0))
    val r = rightEvents(
      (1L, "2024-01-01 11:00:00", 1L, 1.0),
      (7L, "2024-01-01 11:00:00", 1L, 7.0),
      (3L, "2024-01-01 11:00:00", 1L, 3.0))
    assert(run(l, r) == Set((10L, Some(7L), Some(7.0))))
  }

  test("tolerance nulls out matches older than the window") {
    val l = leftEvents((10L, "2024-01-01 12:00:00", 1L, 0.0))
    val r = rightEvents((1L, "2024-01-01 11:00:00", 1L, 1.0))
    val hourUs = 3600L * 1000000L
    assert(run(l, r, tolerance = Some(hourUs)) == Set((10L, Some(1L), Some(1.0))))
    assert(run(l, r, tolerance = Some(hourUs - 1)) == Set((10L, None, None)))
  }

  test("forward as-of picks the earliest right row at or after, with tolerance") {
    val l = leftEvents(
      (10L, "2024-01-01 12:00:00", 1L, 0.0),
      (11L, "2024-01-01 16:00:00", 1L, 0.0))
    val r = rightEvents(
      (1L, "2024-01-01 11:00:00", 1L, 1.0), // before both → never matches forward
      (2L, "2024-01-01 13:00:00", 1L, 2.0),
      (3L, "2024-01-01 14:00:00", 1L, 3.0))
    def runF(tol: Option[Long]) =
      AsofJoin.forward(l, r, "user_id", "ts", "event_id", Seq("event_id"), tol)
        .selectExpr("event_id", "right_event_id").collect()
        .map(x => (x.getLong(0), Option(x.get(1)).map(_.asInstanceOf[Long]))).toSet
    assert(runF(None) == Set((10L, Some(2L)), (11L, None)))
    // 13:00 is 1h after 12:00: in at exactly 1h, out one microsecond under
    val hourUs = 3600L * 1000000L
    assert(runF(Some(hourUs)) == Set((10L, Some(2L)), (11L, None)))
    assert(runF(Some(hourUs - 1)) == Set((10L, None), (11L, None)))
  }

  test("forward: a right row at exactly the left timestamp matches; ties take greatest id") {
    val l = leftEvents((10L, "2024-01-01 12:00:00", 1L, 0.0))
    val r = rightEvents(
      (4L, "2024-01-01 12:00:00", 1L, 4.0),
      (9L, "2024-01-01 12:00:00", 1L, 9.0))
    val out = AsofJoin.forward(l, r, "user_id", "ts", "event_id", Seq("event_id"))
      .selectExpr("right_event_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(9L))
  }

  test("the plan is a single-exchange window sweep — no join operator at all") {
    val l = leftEvents((10L, "2024-01-01 12:00:00", 1L, 0.0))
    val r = rightEvents((1L, "2024-01-01 11:00:00", 1L, 1.0))
    val plan = AsofJoin.backward(l, r, "user_id", "ts", "event_id", Seq("value"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of join must not plan a join:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected at most one exchange, got $exchanges:\n$plan")
  }
}
