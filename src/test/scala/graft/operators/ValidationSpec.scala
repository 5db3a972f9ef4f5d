package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class ValidationSpec extends AnyFunSuite with SparkSpec {
  import Validation.Check._

  private def df() = {
    import spark.implicits._
    Seq(
      (1L, Some("a"), 10.0),
      (2L, Some("b"), -5.0),
      (3L, None, 0.0),
      (4L, Some("a"), 7.5),
    ).toDF("id", "tag", "score")
  }

  private def verdicts(checks: Seq[Validation.Check]): Map[String, (Long, Boolean)] =
    Validation.validate(df(), checks).collect()
      .map(r => r.getAs[String]("check") ->
        (r.getAs[Long]("metric_ppm"), r.getAs[Boolean]("passed")))
      .toMap

  test("completeness counts non-null rows in truncating ppm") {
    val v = verdicts(Seq(Completeness("tag", 800000L), Completeness("id", 1000000L)))
    assert(v("completeness(tag)") == ((750000L, false))) // 3/4
    assert(v("completeness(id)") == ((1000000L, true)))
  }

  test("distinctness flags a primary key and a repeated column") {
    val v = verdicts(Seq(Distinctness("id", 1000000L), Distinctness("tag", 1000000L)))
    assert(v("distinctness(id)") == ((1000000L, true)))
    // 2 distinct non-null tags over 4 rows
    assert(v("distinctness(tag)") == ((500000L, false)))
  }

  test("satisfies evaluates a predicate; null fails it") {
    val v = verdicts(Seq(
      Satisfies("nonneg", "score", "score >= 0", 750000L),
      Satisfies("tag_domain", "tag", "tag IN ('a','b')", 1000000L)))
    assert(v("nonneg") == ((750000L, true))) // 3/4 rows
    assert(v("tag_domain") == ((750000L, false))) // null row fails IN
  }

  test("approx distinctness passes a loose key gate without an exact shuffle") {
    val v = verdicts(Seq(ApproxDistinctness("id", 900000L)))
    val (ppm, passed) = v("approx_distinctness(id)")
    assert(passed && ppm >= 900000L)
  }

  test("empty input passes nothing; duplicate names rejected") {
    val empty = df().filter("id < 0")
    val out = Validation.validate(empty, Seq(Completeness("tag", 1000000L))).collect()
    assert(out.length == 1 && !out(0).getAs[Boolean]("passed")
      && out(0).getAs[Long]("metric_ppm") == 0L)
    intercept[IllegalArgumentException] {
      Validation.validate(df(), Seq(Completeness("tag", 1L), Completeness("tag", 2L)))
    }
  }

  test("the non-distinct suite plans a single aggregation pass") {
    val q = Validation.validate(df(), Seq(
      Completeness("tag", 1L),
      Satisfies("nonneg", "score", "score >= 0", 1L),
      Satisfies("dom", "tag", "tag IN ('a','b')", 1L)))
    val plan = q.queryExecution.executedPlan.toString
    // one final HashAggregate pair (partial+final), no Expand (no distinct)
    assert(!plan.contains("Expand"))
    assert("HashAggregate".r.findAllIn(plan).size == 2, plan)
  }
}
