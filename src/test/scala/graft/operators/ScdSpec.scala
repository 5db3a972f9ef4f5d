package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class ScdSpec extends AnyFunSuite with SparkSpec {

  private def log() = {
    import spark.implicits._
    Seq(
      // user 1: a -> a (run-compressed) -> b -> a
      (1L, 10L, Some("a")),
      (2L, 20L, Some("a")),
      (3L, 30L, Some("b")),
      (4L, 40L, Some("a")),
      // user 2: single observation
      (5L, 15L, Some("x")),
      // user 3: null -> value -> null transitions all open versions
      (6L, 10L, None),
      (7L, 20L, Some("y")),
      (8L, 30L, None),
    ).map { case (id, ts, v) => (id, if (id <= 4L) 1L else if (id == 5L) 2L else 3L, ts, v) }
      .toDF("obs_id", "key", "ts", "segment")
  }

  private def rows() =
    Scd.history(log(), "key", "ts", "obs_id", Seq("segment"))
      .collect()
      .map(r => (r.getAs[Long]("key"), Option(r.getAs[String]("segment")),
        r.getAs[Long]("valid_from"), Option(r.getAs[Any]("valid_to")).map(_.asInstanceOf[Long]),
        r.getAs[Boolean]("is_current")))
      .sortBy(t => (t._1, t._3))

  test("runs compress, intervals chain, last version is open") {
    assert(rows().toSeq == Seq(
      (1L, Some("a"), 10L, Some(30L), false),
      (1L, Some("b"), 30L, Some(40L), false),
      (1L, Some("a"), 40L, None, true),
      (2L, Some("x"), 15L, None, true),
      (3L, None, 10L, Some(20L), false),
      (3L, Some("y"), 20L, Some(30L), false),
      (3L, None, 30L, None, true),
    ))
  }

  test("interval bounds tile each key's timeline without gaps") {
    val byKey = rows().groupBy(_._1)
    for ((_, vs) <- byKey if vs.length > 1; pair <- vs.sortBy(_._3).sliding(2))
      assert(pair(0)._4.contains(pair(1)._3))
  }

  test("one exchange: the lag and lead windows share the shuffle") {
    val q = Scd.history(log(), "key", "ts", "obs_id", Seq("segment"))
    val plan = q.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("tracked columns must be disjoint and non-empty") {
    intercept[IllegalArgumentException](Scd.history(log(), "key", "ts", "obs_id", Seq.empty))
    intercept[IllegalArgumentException](Scd.history(log(), "key", "ts", "obs_id", Seq("key")))
  }
}
