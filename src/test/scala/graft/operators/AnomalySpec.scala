package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class AnomalySpec extends AnyFunSuite with SparkSpec {

  private def data() = {
    import spark.implicits._
    // key "a": values 1..100 cents-scale; p99 (nearest-rank) = 99.0 -> only 100 flagged
    // key "b": all equal -> nothing can strictly exceed the p99
    val rows = (1 to 100).map(i => (i.toLong, "a", i.toDouble / 100.0)) ++
      (101 to 110).map(i => (i.toLong, "b", 5.0))
    rows.toDF("id", "key", "v")
  }

  test("flags strictly-above-p99 rows only; uniform groups flag nothing") {
    val out = Anomaly.outliersAbovePercentile(data(), "key", "v", 99, keep = Seq("id"))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("key"),
        r.getAs[Long]("value_cents"), r.getAs[Long]("threshold_cents")))
    assert(out.toSeq == Seq((100L, "a", 100L, 99L)))
  }

  test("the flagging join is a broadcast, not a fact-side shuffle") {
    val q = Anomaly.outliersAbovePercentile(data(), "key", "v", 99, keep = Seq("id"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("percent bounds are validated") {
    intercept[IllegalArgumentException](
      Anomaly.outliersAbovePercentile(data(), "key", "v", 0, keep = Seq("id")))
  }
}
