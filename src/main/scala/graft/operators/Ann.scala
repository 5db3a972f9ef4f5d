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

  /** How many centroids the IVF assignment/probe may express as ONE
    * unrolled Catalyst expression before switching to the broadcast-join
    * formulation. The unrolled argmax is codegen'd and shuffle-free, but
    * its plan grows linearly with `nLists`: past a few hundred it blows
    * codegen's 64KB method limit (falling back to interpreted) and
    * eventually planning itself. Session conf
    * `spark.graft.ann.maxUnrolledLists` overrides.
    */
  private val MaxUnrolledListsConf = "spark.graft.ann.maxUnrolledLists"
  private val MaxUnrolledListsDefault = 64

  private def centroidsDf(
      spark: org.apache.spark.sql.SparkSession,
      cents: Array[(Int, Seq[Double])]): DataFrame =
    spark.createDataFrame(cents.toSeq).toDF("cid", "cv")

  /** (id, v, cid): closest centroid per corpus vector (columns `id`,
    * `v`). Unrolled: one codegen'd greatest() argmax, zero shuffle, plan
    * size O(nLists). Join path: the crossJoin is bounded — every corpus
    * row meets only the broadcast centroid set (the k-means K), never
    * another corpus row — and the argmax aggregate combines map-side
    * (the exchange carries one row per input row), mirroring
    * greatest()'s larger-cid tie-break via struct ordering on (s, cid).
    * The aggregate groups on a per-ROW key (not `id`), so a corpus with
    * duplicate ids keeps every row — same multiplicity as the unrolled
    * path and bruteForceTopK. Package-private so PlanGuardrailSpec can
    * pin the join path's physical shape directly (the public API
    * checkpoints its result, hiding the plan).
    */
  private[operators] def assignToCentroids(
      corpus: DataFrame,
      cents: Array[(Int, Seq[Double])],
      unrolled: Boolean): DataFrame =
    if (unrolled) {
      // argmax over centroid dot products, unrolled per centroid
      val scored = cents.map { case (cid, vec) =>
        val cArr = array(vec.map(lit): _*)
        struct(cosine(col("v"), cArr).as("s"), lit(cid).as("cid"))
      }
      corpus.withColumn("cid", greatest(scored.toIndexedSeq: _*).getField("cid"))
    } else
      corpus
        // per-row identity: unique within this one plan execution, which
        // is all the grouping needs; dropped before returning
        .withColumn("_rid", monotonically_increasing_id())
        .crossJoin(broadcast(centroidsDf(corpus.sparkSession, cents)))
        .withColumn("s", cosine(col("v"), col("cv")))
        .groupBy(col("_rid"), col("id"))
        .agg(max(struct(col("s"), col("cid"), col("v"))).as("m"))
        .select(col("id"), col("m.v").as("v"), col("m.cid").as("cid"))

  /** IVF index: assign every vector to its closest of `nLists` centroids
    * (k-means initialized from the lexicographically-first ids, `iters`
    * Lloyd rounds); queries probe the `nProbe` closest lists only.
    * Approximate — recall measured against bruteForceTopK in tests.
    *
    * Scale: at the `nLists` a 100 TB corpus needs (10³–10⁵) the argmax
    * is computed against a BROADCAST centroids DataFrame — plan size
    * O(1) in `nLists`, one map-side-combined aggregate (the shuffle
    * carries one row per vector, not one per vector×centroid). Small
    * `nLists` keeps the unrolled whole-stage-codegen expression with
    * zero assignment shuffle. Both paths are exact argmax with the same
    * (sim, cid) tie-break, so the output is bit-identical either way.
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
    val unrolled = nLists <= spark.conf
      .get(MaxUnrolledListsConf, MaxUnrolledListsDefault.toString).toInt
    val corpus = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v")).cache()

    // deterministic init: first nLists vectors by id (driver collect
    // bounded by nLists·dim — the k-means model, not the data)
    var centroids: Array[(Int, Seq[Double])] = corpus
      .orderBy("id").limit(nLists).collect()
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1)) }

    def assignCids(cents: Array[(Int, Seq[Double])]): DataFrame =
      assignToCentroids(corpus, cents, unrolled)

    (1 to iters).foreach { _ =>
      val assigned = assignCids(centroids)
      val dim = centroids.head._2.size
      val meanCols = (0 until dim).map(i => avg(col("v").getItem(i)).as(s"d$i"))
      val means = assigned
        .groupBy("cid")
        .agg(meanCols.head, meanCols.tail: _*)
        .collect()
        .map(r => (r.getInt(0), (0 until dim).map(i => r.getDouble(i + 1))))
      if (means.nonEmpty) centroids = means.map { case (c, v) => (c, v: Seq[Double]) }
    }

    val assigned = assignCids(centroids).cache()
    val queries = assigned
      .filter(col("id").isInCollection(queryIds))
      .select(col("id").as("query_id"), col("v").as("va"))

    // probe lists: nProbe closest centroids per query, descending by
    // (similarity, cid) in both formulations
    val probed =
      if (unrolled) {
        val centroidStructs = centroids.map { case (cid, vec) =>
          struct(cosine(col("va"), array(vec.map(lit): _*)).as("s"), lit(cid).as("cid"))
        }
        queries.withColumn(
          "probe",
          slice(reverse(array_sort(array(centroidStructs.toIndexedSeq: _*))), 1, nProbe))
          .select(col("query_id"), col("va"), explode(col("probe.cid")).as("cid"))
      } else {
        val pw = Window.partitionBy("query_id").orderBy(col("s").desc, col("cid").desc)
        queries
          .crossJoin(broadcast(centroidsDf(spark, centroids)))
          .withColumn("s", cosine(col("va"), col("cv")))
          .withColumn("prank", row_number().over(pw))
          .filter(col("prank") <= nProbe)
          .select(col("query_id"), col("va"), col("cid"))
      }

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
