package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The large-batch ANN serving path (executor-side distance tables /
  * probe sets, forced via `spark.graft.ann.localDtMaxQueries = -1`)
  * must be BIT-EQUAL to the driver-side path across every serving
  * lane: pqTopK, ivfAdcTopK, and AnnIndex.topK in both layouts,
  * with and without exact re-rank. The two paths share the same
  * codegen kernels (graft_l2sq / graft_cosine accumulate in the same
  * order as the driver loops), the same integer-nano rounding, and the
  * same (adc asc, neighbor_id asc) tie-breaks — so results agree
  * exactly, not just in recall.
  */
class AnnDistributedDtSpec extends AnyFunSuite with SparkSpec {

  private val Conf = "spark.graft.ann.localDtMaxQueries"

  private lazy val emb: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def distributed[A](body: => A): A = {
    spark.conf.set(Conf, "-1")
    try body finally spark.conf.unset(Conf)
  }

  private def tmpIdx(): String =
    java.nio.file.Files.createTempDirectory("graft_anndist").toString + "/idx"

  private def queriesOf(ids: Seq[Long]): DataFrame =
    emb.filter(col("vec_id").isInCollection(ids))

  test("pqTopK: distributed dt path is bit-equal to the driver path, incl. rerank") {
    val local = pairs(Ann.pqTopK(emb, "vec_id", "embedding", 0L to 9L, k = 5))
    val dist = distributed(
      pairs(Ann.pqTopK(emb, "vec_id", "embedding", 0L to 9L, k = 5)))
    assert(dist == local)
    val localR = pairs(Ann.pqTopK(emb, "vec_id", "embedding", 0L to 9L,
      k = 5, rerank = 40))
    val distR = distributed(pairs(Ann.pqTopK(emb, "vec_id", "embedding", 0L to 9L,
      k = 5, rerank = 40)))
    assert(distR == localR)
  }

  test("ivfAdcTopK: distributed dt path is bit-equal to the driver path, incl. rerank") {
    val local = pairs(Ann.ivfAdcTopK(emb, "vec_id", "embedding", 0L to 9L,
      k = 5, nLists = 16, nProbe = 4))
    val dist = distributed(pairs(Ann.ivfAdcTopK(emb, "vec_id", "embedding", 0L to 9L,
      k = 5, nLists = 16, nProbe = 4)))
    assert(dist == local)
    val localR = pairs(Ann.ivfAdcTopK(emb, "vec_id", "embedding", 0L to 9L,
      k = 5, nLists = 16, nProbe = 4, rerank = 40))
    val distR = distributed(pairs(Ann.ivfAdcTopK(emb, "vec_id", "embedding", 0L to 9L,
      k = 5, nLists = 16, nProbe = 4, rerank = 40)))
    assert(distR == localR)
  }

  test("AnnIndex.topK plain layout: distributed path bit-equal, incl. rerank") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path)
    val local = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 4))
    val dist = distributed(pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 4)))
    assert(dist == local)
    val localR = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 4, rerank = 50,
      exact = Some(emb), exactIdCol = "vec_id", exactVecCol = "embedding"))
    val distR = distributed(pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 4, rerank = 50,
      exact = Some(emb), exactIdCol = "vec_id", exactVecCol = "embedding")))
    assert(distR == localR)
  }

  test("AnnIndex.topK residual layout: distributed path bit-equal, incl. rerank") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path, residual = true)
    val local = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 4))
    val dist = distributed(pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 4)))
    assert(dist == local)
    val localR = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 8, rerank = 100,
      exact = Some(emb), exactIdCol = "vec_id", exactVecCol = "embedding"))
    val distR = distributed(pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 8, rerank = 100,
      exact = Some(emb), exactIdCol = "vec_id", exactVecCol = "embedding")))
    assert(distR == localR)
  }

  test("distributed path: empty batch is empty, ragged query dim fails loudly") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path)
    distributed {
      assert(AnnIndex.topK(spark, path, queriesOf(Seq(-1L)),
        "vec_id", "embedding", k = 5).count() == 0)
      import spark.implicits._
      val bad = Seq((0L, Seq(1.0, 2.0))).toDF("vec_id", "embedding")
      val ex = intercept[Exception] {
        AnnIndex.topK(spark, path, bad, "vec_id", "embedding", k = 5).collect()
      }
      def messages(t: Throwable): String =
        if (t == null) "" else t.getMessage + " | " + messages(t.getCause)
      assert(messages(ex).contains("index expects 64"),
        s"want the dim-guard message, got: ${messages(ex)}")
    }
  }

  test("threshold semantics: batches at the threshold stay local, above it go distributed") {
    // pin the decision boundary itself: with the threshold set to the
    // batch size the driver path runs (no probed-cid job needed), one
    // above it the distributed path runs — both bit-equal anyway, so
    // assert on results while exercising both sides of the boundary
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path)
    val expected = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 4))
    spark.conf.set(Conf, "10")
    try {
      assert(pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
        "vec_id", "embedding", k = 5, nProbe = 4)) == expected)
    } finally spark.conf.unset(Conf)
    spark.conf.set(Conf, "9")
    try {
      assert(pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
        "vec_id", "embedding", k = 5, nProbe = 4)) == expected)
    } finally spark.conf.unset(Conf)
  }
}
