package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite with SparkSpec {

  private def docs() = {
    import spark.implicits._
    Seq(
      "alpha alpha alpha beta beta gamma",
      "alpha beta  gamma delta",
      "alpha epsilon",
    ).toDF("text")
  }

  test("gate holds on a corpus where the sketch is effectively exact") {
    val out = Sketches.cmsTokenGate(docs(), "text", topK = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
    // top-3 by (count desc, token asc): alpha=5, beta=3, gamma=2
    assert(out.map(t => (t._1, t._2)).toSeq == Seq(("alpha", 5L), ("beta", 3L), ("gamma", 2L)))
    assert(out.forall(t => t._3 && t._4))
  }

  test("double-space split artifacts are filtered, ties break on token asc") {
    val out = Sketches.cmsTokenGate(docs(), "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(!out.map(_._1).contains(""))
    // delta and epsilon both count 1: delta sorts first
    val ones = out.filter(_._2 == 1L).map(_._1).toSeq
    assert(ones == ones.sorted)
  }

  test("estimates never undercount even under heavy collision pressure") {
    import spark.implicits._
    // tiny sketch (wide eps) over many distinct tokens forces collisions;
    // the overestimate invariant must still hold on every gated row
    val many = (1 to 2000).map(i => s"tok$i w${i % 7}").toDF("text")
    val out = Sketches.cmsTokenGate(many, "text", topK = 7, eps = 0.05)
      .collect()
    assert(out.length == 7 && out.forall(_.getBoolean(2)))
  }
}
