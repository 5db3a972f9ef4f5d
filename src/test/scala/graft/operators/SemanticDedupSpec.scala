package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class SemanticDedupSpec extends AnyFunSuite with SparkSpec {

  private def emb(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def verdicts(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap

  test("near-dups drop within their cluster, distinct vectors and clusters survive") {
    // init centroids (first 2 ids): v1 along x, v2 along y
    val out = verdicts(Dedup.semanticDedup(emb(
      1L -> Seq(1f, 0f, 0f),
      2L -> Seq(0f, 1f, 0f),
      3L -> Seq(1f, 0.1f, 0f), // same cluster as 1, cos ≈ 0.995 < 0.999 → kept
      4L -> Seq(0f, 3f, 0f), // scaled copy of 2 → dropped
      5L -> Seq(2f, 0f, 0f)), // scaled copy of 1 → dropped
      "vec_id", "embedding", k = 2, iters = 2, threshold = 0.999))
    val xCluster = out(1L)._1
    val yCluster = out(2L)._1
    assert(xCluster != yCluster)
    assert(out(3L)._1 == xCluster && out(5L)._1 == xCluster && out(4L)._1 == yCluster)
    assert(out.view.mapValues(_._2).toMap ==
      Map(1L -> true, 2L -> true, 3L -> true, 4L -> false, 5L -> false))
  }

  test("greedy min-id pruning: a chain keeps only its smallest id") {
    // angles 0°, 15°, 30°: adjacent pairs are within cos 0.95, the ends
    // are not — v3 still drops because v2 (a smaller id, itself dropped)
    // is within threshold: the verdict is id-based, not survival-based
    def at(deg: Double) = Seq(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val out = verdicts(Dedup.semanticDedup(
      emb(1L -> at(0), 2L -> at(15), 3L -> at(30)),
      "vec_id", "embedding", k = 1, iters = 1, threshold = 0.95))
    assert(out.view.mapValues(_._2).toMap == Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("a zero-norm vector never pairs (NaN cosine) and survives") {
    val out = verdicts(Dedup.semanticDedup(
      emb(1L -> Seq(1f, 0f), 2L -> Seq(0f, 0f), 3L -> Seq(0f, 0f)),
      "vec_id", "embedding", k = 1, iters = 1, threshold = 0.5))
    assert(out.view.mapValues(_._2).toMap == Map(1L -> true, 2L -> true, 3L -> true))
  }

  test("every input row gets a verdict and clusters partition the corpus") {
    val rows = (1L to 40L).map(i => i -> Seq((i % 7).toFloat + 1f, (i % 5).toFloat, 1f))
    val out = Dedup.semanticDedup(emb(rows: _*), "vec_id", "embedding",
      k = 4, iters = 2, threshold = 0.9999)
    assert(out.count() == 40L)
    assert(out.select("vec_id").distinct().count() == 40L)
    val cids = out.select("cid").distinct().collect().map(_.getInt(0)).toSet
    assert(cids.nonEmpty && cids.size <= 4)
  }
}
