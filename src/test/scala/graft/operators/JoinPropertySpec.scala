package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence of the scale-shaped join formulations against
  * brute-force reference semantics computed driver-side: the as-of
  * union-and-sweep vs "argmax over all earlier right rows", and the
  * bucketized range join vs "filter the cross product". Both must agree
  * on EVERY generated instance, including adversarial tie/edge cases
  * (duplicate timestamps, empty sides, window edges on bucket
  * boundaries).
  */
class JoinPropertySpec extends AnyFunSuite with SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(4242L))

  // small domains on purpose: collisions in key and time are the cases
  // that find tie-break and boundary bugs
  private case class Row(id: Long, key: Long, us: Long)
  private val rowGen: Gen[Row] = for {
    id <- Gen.choose(1L, 1000000L)
    key <- Gen.choose(1L, 3L)
    us <- Gen.choose(0L, 40L)
  } yield Row(id, key, us)

  private def rowsGen(max: Int): Gen[List[Row]] = for {
    n <- Gen.choose(0, max)
    rows <- Gen.listOfN(n, rowGen)
  } yield {
    // unique ids per side (operator contract for the right tie-break)
    rows.zipWithIndex.map { case (r, i) => r.copy(id = r.id + i * 1000000L) }
  }

  test("as-of join equals brute-force latest-at-or-before semantics on random inputs") {
    import spark.implicits._
    val cases = samples(Gen.zip(rowsGen(12), rowsGen(12)), 30)
    cases.zipWithIndex.foreach { case ((ls, rs), ci) =>
      val left = ls.map(r => (r.id, new java.sql.Timestamp(r.us), r.key))
        .toDF("event_id", "ts", "user_id")
      val right = rs.map(r => (r.id, new java.sql.Timestamp(r.us), r.key))
        .toDF("event_id", "ts", "user_id")
      if (ls.nonEmpty) {
        val got = AsofJoin
          .backward(left, right, "user_id", "ts", "event_id", Seq("event_id"))
          .select("event_id", "right_event_id").collect()
          .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
        val want = ls.map { l =>
          val candidates = rs.filter(r => r.key == l.key && r.us <= l.us)
          // latest time wins; among equal times the greatest right id
          l.id -> candidates
            .sortBy(r => (r.us, r.id))(Ordering.Tuple2(Ordering.Long, Ordering.Long))
            .lastOption.map(_.id)
        }.toMap
        assert(got == want, s"case $ci: left=$ls right=$rs")
      }
    }
  }

  test("forward as-of equals brute-force earliest-at-or-after semantics on random inputs") {
    import spark.implicits._
    val cases = samples(Gen.zip(rowsGen(12), rowsGen(12)), 30)
    cases.zipWithIndex.foreach { case ((ls, rs), ci) =>
      if (ls.nonEmpty) {
        val left = ls.map(r => (r.id, new java.sql.Timestamp(r.us), r.key))
          .toDF("event_id", "ts", "user_id")
        val right = rs.map(r => (r.id, new java.sql.Timestamp(r.us), r.key))
          .toDF("event_id", "ts", "user_id")
        val got = AsofJoin
          .forward(left, right, "user_id", "ts", "event_id", Seq("event_id"))
          .select("event_id", "right_event_id").collect()
          .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
        val want = ls.map { l =>
          val candidates = rs.filter(r => r.key == l.key && r.us >= l.us)
          // earliest time wins; among equal times the greatest right id
          l.id -> candidates
            .sortBy(r => (r.us, -r.id))(Ordering.Tuple2(Ordering.Long, Ordering.Long))
            .headOption.map(_.id)
        }.toMap
        assert(got == want, s"case $ci: left=$ls right=$rs")
      }
    }
  }

  test("bucketized range join equals the filtered cross product on random inputs") {
    import spark.implicits._
    val ivGen = for {
      n <- Gen.choose(0, 8)
      ivs <- Gen.listOfN(n, for {
        id <- Gen.choose(1L, 1000000L)
        key <- Gen.choose(1L, 3L)
        s <- Gen.choose(-20L, 30L)
        len <- Gen.choose(0L, 25L)
      } yield (id, key, s, s + len))
    } yield ivs.zipWithIndex.map { case ((id, k, s, e), i) => (id + i * 1000000L, k, s, e) }
    val cases = samples(Gen.zip(ivGen, rowsGen(12)), 30)
    Seq(1L, 7L, 16L).foreach { bucket =>
      cases.zipWithIndex.foreach { case ((ivs, pts), ci) =>
        val intervals = ivs.toDF("iv_id", "key", "start_us", "end_us")
        val points = pts.map(r => (r.id, r.key, r.us - 15L)).toDF("pt_id", "key", "pt_us")
        val got = RangeJoin
          .pointsInIntervals(intervals, points, "key", "start_us", "end_us", "pt_us", bucket)
          .select("iv_id", "pt_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val want = (for {
          (ivId, k, s, e) <- ivs
          p <- pts
          if p.key == k && (p.us - 15L) >= s && (p.us - 15L) <= e
        } yield (ivId, p.id)).toSet
        assert(got == want, s"bucket=$bucket case $ci: ivs=$ivs pts=$pts")
      }
    }
  }
}
