package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite with SparkSpec {

  private def intervals(rows: (Long, Long, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("iv_id", "key", "start_us", "end_us")
  }
  private def points(rows: (Long, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("pt_id", "key", "pt_us")
  }

  private def matchPairs(iv: org.apache.spark.sql.DataFrame, pt: org.apache.spark.sql.DataFrame,
      bucketUs: Long) =
    RangeJoin.pointsInIntervals(iv, pt, "key", "start_us", "end_us", "pt_us", bucketUs)
      .select("iv_id", "pt_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("containment is inclusive at both ends and keyed") {
    val iv = intervals((1L, 1L, 100L, 200L), (2L, 2L, 100L, 200L))
    val pt = points(
      (10L, 1L, 100L), // at start
      (11L, 1L, 200L), // at end
      (12L, 1L, 99L), // just before
      (13L, 1L, 201L), // just after
      (14L, 2L, 150L)) // other key, inside its own interval
    assert(matchPairs(iv, pt, bucketUs = 50L) ==
      Set((1L, 10L), (1L, 11L), (2L, 14L)))
  }

  test("an interval spanning many buckets matches each point exactly once") {
    val iv = intervals((1L, 1L, 0L, 1000L))
    val pt = points((10L, 1L, 500L), (11L, 1L, 999L))
    val rows = RangeJoin.pointsInIntervals(
      intervals(( 1L, 1L, 0L, 1000L)), points((10L, 1L, 500L), (11L, 1L, 999L)),
      "key", "start_us", "end_us", "pt_us", bucketUs = 10L)
    assert(rows.count() == 2L)
    assert(matchPairs(iv, pt, bucketUs = 10L) == Set((1L, 10L), (1L, 11L)))
  }

  test("pre-epoch (negative) timestamps bucket by true floor division") {
    val iv = intervals((1L, 1L, -150L, -50L))
    val pt = points((10L, 1L, -100L), (11L, 1L, -151L), (12L, 1L, -49L))
    assert(matchPairs(iv, pt, bucketUs = 100L) == Set((1L, 10L)))
  }

  test("count lane keeps empty intervals with zero") {
    val iv = intervals((1L, 1L, 0L, 10L), (2L, 1L, 100L, 110L))
    val pt = points((10L, 1L, 5L), (11L, 1L, 7L))
    val out = RangeJoin.countPointsInIntervals(
        iv, pt, "key", "iv_id", "start_us", "end_us", "pt_us", "pt_id", bucketUs = 10L)
      .select("iv_id", "n_points").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L), (2L, 0L)))
  }

  test("the plan is a hash equi-join — never a nested-loop or cartesian product") {
    val iv = intervals((1L, 1L, 0L, 1000L))
    val pt = points((10L, 1L, 500L))
    val plan = RangeJoin.pointsInIntervals(
        iv, pt, "key", "start_us", "end_us", "pt_us", bucketUs = 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"range join must stay an equi-join:\n$plan")
  }

  test("shared non-key columns are rejected loudly") {
    val iv = intervals((1L, 1L, 0L, 10L)).withColumnRenamed("iv_id", "pt_id")
    val pt = points((10L, 1L, 5L))
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointsInIntervals(iv, pt, "key", "start_us", "end_us", "pt_us", 10L)
    }
    assert(e.getMessage.contains("pt_id"))
  }
}
