package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** The order-independent integer-nano centroid means must survive sums
  * past Long.MaxValue: the accumulator is an exact 128-bit decimal, so
  * a cluster bigger than the old ~1e9-members-at-unit-scale long bound
  * still yields the exact mean (a raw long sum would wrap negative
  * here). Values below the bound stay bit-identical to the long-sum
  * era — both are exact integers converted to double by correct
  * rounding — so every persisted model and SQL replay is unchanged.
  */
class NanoSumSpec extends AnyFunSuite with SparkSpec {

  test("nanoMeans is exact past the long-sum overflow boundary") {
    import spark.implicits._
    // 11 members × 9e8 → nano sum 9.9e18 > Long.MaxValue (9.22e18):
    // a long accumulator wraps negative, the decimal one is exact
    val assigned = (1 to 11).map(i => (i.toLong, Seq(9e8), 0))
      .toDF("id", "v", "cid")
    val means = Ann.nanoMeans(assigned, dim = 1)
    assert(means.length == 1)
    val (cid, cv) = means.head
    assert(cid == 0 && cv == Seq(9e8), s"want exact mean 9e8, got $cv")
  }

  test("nanoMeans below the boundary matches the fixed sum/count/1e9 expression") {
    import spark.implicits._
    val vals = Seq(0.1, 0.25, 0.4)
    val assigned = vals.zipWithIndex.map { case (v, i) => (i.toLong, Seq(v), 7) }
      .toDF("id", "v", "cid")
    val means = Ann.nanoMeans(assigned, dim = 1)
    val expected = vals.map(v => math.round(v * 1e9)).sum.toDouble / vals.size / 1e9
    assert(means.toSeq == Seq((7, Seq(expected))))
  }
}
