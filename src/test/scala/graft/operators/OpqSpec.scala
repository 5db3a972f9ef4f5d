package graft.operators

import graft.SparkSpec
import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** OPQ (Ge et al., CVPR 2013): the learned rotation must be exactly
  * orthogonal and deterministic, zero rotation iterations must be
  * BIT-EQUAL to plain PQ (identity matvec is IEEE-lossless), the
  * rotation must lower the quantization objective on real data, and
  * the rotated serving path must hold the recall gate. Plus the
  * graft_matvec kernel's own contract.
  */
class OpqSpec extends AnyFunSuite with SparkSpec {

  private lazy val emb: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("graft_matvec: correct product, identity bit-lossless, mismatch/null → null") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val m = Seq(Seq(1.0, 2.0), Seq(0.5, -1.0), Seq(0.0, 3.0))
    val df = Seq((1L, Seq(2.0, 4.0))).toDF("id", "v")
    val got = df.select(GraftFunctions.matVec(
      typedLit(m).cast("array<array<double>>"), col("v"))).head.getSeq[Double](0)
    assert(got == Seq(10.0, -3.0, 12.0))

    // identity reproduces the input bit-for-bit (incl. negative zero
    // staying a plain sum: 0.0 + -0.0 = 0.0 is fine — the anchor case
    // uses realistic vectors below)
    val id2 = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val v = Seq(0.1 + 0.2, -7.25) // 0.30000000000000004 must survive
    val back = Seq((1L, v)).toDF("id", "v")
      .select(GraftFunctions.matVec(typedLit(id2).cast("array<array<double>>"), col("v")))
      .head.getSeq[Double](0)
    assert(back.zip(v).forall { case (a, b) =>
      java.lang.Double.doubleToRawLongBits(a) == java.lang.Double.doubleToRawLongBits(b)
    })

    // ragged matrix row vs vector length → null, not a wrong answer
    val bad = Seq(Seq(1.0, 2.0, 3.0))
    assert(df.select(GraftFunctions.matVec(
      typedLit(bad).cast("array<array<double>>"), col("v"))).head.isNullAt(0))
    assert(df.select(GraftFunctions.matVec(
      lit(null).cast("array<array<double>>"), col("v"))).head.isNullAt(0))
  }

  test("graft_matvec property: bit-equal to the sequential driver product on random inputs") {
    import org.scalacheck.Gen
    GraftFunctions.register(spark)
    import spark.implicits._
    val valGen = Gen.oneOf(
      Gen.choose(-10.0, 10.0),
      Gen.choose(-1e-6, 1e-6),
      Gen.const(0.0), Gen.const(-0.0), Gen.const(3.0))
    val caseGen = for {
      rows <- Gen.choose(1, 6)
      n <- Gen.choose(1, 6)
      mat <- Gen.listOfN(rows, Gen.listOfN(n, valGen))
      v <- Gen.listOfN(n, valGen)
    } yield (mat.map(_.toSeq).toSeq, v.toSeq)
    val cases = Gen.listOfN(60, caseGen)
      .pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(1313L))
    cases.foreach { case (mat, v) =>
      val got = Seq(Tuple1(v)).toDF("v")
        .select(GraftFunctions.matVec(
          typedLit(mat).cast("array<array<double>>"), col("v")))
        .head.getSeq[Double](0)
      // the kernel's contract: sequential left-to-right accumulation
      val want = mat.map { row =>
        var s = 0.0
        var j = 0
        while (j < v.size) { s += row(j) * v(j); j += 1 }
        s
      }
      assert(got.size == want.size && got.zip(want).forall { case (a, b) =>
        java.lang.Double.doubleToRawLongBits(a) == java.lang.Double.doubleToRawLongBits(b)
      }, s"matvec($mat, $v) = $got, want $want")
    }
  }

  test("opqFit returns an exactly orthogonal, deterministic rotation") {
    val r1 = Ann.opqFit(emb, "vec_id", "embedding", opqIters = 3)
    val r2 = Ann.opqFit(emb, "vec_id", "embedding", opqIters = 3)
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq,
      "identical inputs must fit the identical rotation")
    val dim = r1.length
    var maxDev = 0.0
    for (i <- 0 until dim; j <- 0 until dim) {
      var s = 0.0
      var k = 0
      while (k < dim) { s += r1(k)(i) * r1(k)(j); k += 1 }
      maxDev = math.max(maxDev, math.abs(s - (if (i == j) 1.0 else 0.0)))
    }
    assert(maxDev < 1e-9, s"RᵀR deviates from I by $maxDev")
  }

  test("opqIters = 0 is bit-equal to plain pqTopK, incl. rerank") {
    val pq = pairs(Ann.pqTopK(emb, "vec_id", "embedding", 0L to 9L, k = 5))
    val opq0 = pairs(Ann.opqTopK(emb, "vec_id", "embedding", 0L to 9L,
      k = 5, opqIters = 0))
    assert(opq0 == pq)
    val pqR = pairs(Ann.pqTopK(emb, "vec_id", "embedding", 0L to 9L,
      k = 5, rerank = 40))
    val opq0R = pairs(Ann.opqTopK(emb, "vec_id", "embedding", 0L to 9L,
      k = 5, opqIters = 0, rerank = 40))
    assert(opq0R == pqR)
  }

  test("the rotation lowers the quantization objective on real data") {
    val errPq = Ann.pqQuantizationError(emb, "vec_id", "embedding")
    val rot = Ann.opqFit(emb, "vec_id", "embedding", opqIters = 3)
    val errOpq = Ann.pqQuantizationError(emb, "vec_id", "embedding",
      rotation = Some(rot))
    assert(errOpq < errPq,
      f"OPQ must not raise the objective: opq=$errOpq%.3f pq=$errPq%.3f")
    // measured ~0.88 on this corpus — leave slack for future data
    // regeneration but insist on a real improvement, not noise
    assert(errOpq / errPq < 0.97, f"ratio ${errOpq / errPq}%.4f not a real gain")
  }

  test("rotated serving with exact re-rank holds the recall gate; results deterministic") {
    val got = pairs(Ann.opqTopK(emb, "vec_id", "embedding", 0L to 9L,
      k = 5, opqIters = 3, rerank = 100))
    val again = pairs(Ann.opqTopK(emb, "vec_id", "embedding", 0L to 9L,
      k = 5, opqIters = 3, rerank = 100))
    assert(got == again, "opqTopK must be deterministic run to run")
    val brute = pairs(Ann.bruteForceTopK(emb, "vec_id", "embedding", 0L to 9L, 5))
    assert(got.size == 50)
    val recall = got.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.8, s"opq rerank recall $recall < 0.8")
  }
}
