package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Scale design: the brute-force path broadcasts the (small) query set and
  * never pairs corpus rows with each other — cost O(|queries|·N), the
  * correct baseline and the oracle-checkable one. The IVF path clusters
  * the corpus once (k-means over sampled centroids) and probes only the
  * closest `nProbe` partitions per query — the 100 TB path.
  */
object Ann {

  /** Cosine similarity between two array<double> columns — the codegen'd
    * graft_cosine Catalyst expression (sequential summation, so the
    * result is deterministic). A zero-norm side yields NaN — callers
    * must NaN-guard threshold filters, since Spark orders NaN above
    * every double. Callers in this object register the function on the
    * input's session first.
    */
  def cosine(a: Column, b: Column): Column = graft.functions.GraftFunctions.cosine(a, b)

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Exact top-k neighbors for each query id (query rows are taken from
    * the corpus itself). Self-matches excluded; ties broken by neighbor
    * id ascending for determinism.
    */
  def bruteForceTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: Seq[Long],
      k: Int = 5,
  ): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val corpus = emb.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("vb"))
    val queries = emb
      .filter(col(idCol).isInCollection(queryIds))
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("va"))
    val scored = queries
      .join(corpus, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("va"), col("vb")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id")
  }

  /** IVF index: assign every vector to its closest of `nLists` centroids
    * (k-means initialized from the lexicographically-first ids, `iters`
    * Lloyd rounds); queries probe the `nProbe` closest lists only.
    * Approximate — recall measured against bruteForceTopK in tests.
    */
  def ivfTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: Seq[Long],
      k: Int = 5,
      nLists: Int = 16,
      nProbe: Int = 4,
      iters: Int = 2,
  ): DataFrame = {
    val spark = emb.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val corpus = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v")).cache()

    // deterministic init: first nLists vectors by id
    var centroids: Array[(Int, Seq[Double])] = corpus
      .orderBy("id").limit(nLists).collect()
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1)) }

    def assignExpr(cents: Array[(Int, Seq[Double])]): Column = {
      // argmax over centroid dot products, unrolled per centroid
      val scored = cents.map { case (cid, vec) =>
        val cArr = array(vec.map(lit): _*)
        struct(cosine(col("v"), cArr).as("s"), lit(cid).as("cid"))
      }
      greatest(scored.toIndexedSeq: _*).getField("cid")
    }

    (1 to iters).foreach { _ =>
      val assigned = corpus.withColumn("cid", assignExpr(centroids))
      val dim = centroids.head._2.size
      val meanCols = (0 until dim).map(i => avg(col("v").getItem(i)).as(s"d$i"))
      val means = assigned
        .groupBy("cid")
        .agg(meanCols.head, meanCols.tail: _*)
        .collect()
        .map(r => (r.getInt(0), (0 until dim).map(i => r.getDouble(i + 1))))
      if (means.nonEmpty) centroids = means.map { case (c, v) => (c, v: Seq[Double]) }
    }

    val assigned = corpus.withColumn("cid", assignExpr(centroids)).cache()
    val queries = assigned
      .filter(col("id").isInCollection(queryIds))
      .select(col("id").as("query_id"), col("v").as("va"))

    // probe lists: nProbe closest centroids per query
    val centroidStructs = centroids.map { case (cid, vec) =>
      struct(cosine(col("va"), array(vec.map(lit): _*)).as("s"), lit(cid).as("cid"))
    }
    val probed = queries.withColumn(
      "probe",
      slice(reverse(array_sort(array(centroidStructs: _*))), 1, nProbe))
      .select(col("query_id"), col("va"), explode(col("probe.cid")).as("cid"))

    val scored = probed
      .join(assigned.select(col("id").as("neighbor_id"), col("v").as("vb"), col("cid")), Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("va"), col("vb")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    // materialize the (tiny) top-k so the working caches can be released
    // instead of leaking for the session lifetime
    val out = scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id")
      .localCheckpoint(true)
    assigned.unpersist()
    corpus.unpersist()
    out
  }
}
