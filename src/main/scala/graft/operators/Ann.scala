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
    * unrolled Catalyst expression before switching to the
    * single-literal `array_max(transform(…))` formulation. The unrolled
    * argmax is codegen'd, but its plan grows linearly with `nLists`:
    * past a few hundred it blows codegen's 64KB method limit (falling
    * back to interpreted) and eventually planning itself. Session conf
    * `spark.graft.ann.maxUnrolledLists` overrides.
    */
  private val MaxUnrolledListsConf = "spark.graft.ann.maxUnrolledLists"
  private val MaxUnrolledListsDefault = 64

  /** The centroid set as ONE literal column: array<struct<cid,cv>> in a
    * single `typedLit` — a constant-size plan node carrying the data,
    * not an O(nLists) expression tree.
    */
  private def centroidsLit(cents: Array[(Int, Seq[Double])]): Column =
    typedLit(cents.toSeq).cast("array<struct<cid:int,cv:array<double>>>")

  /** (id, v, cid): closest centroid per corpus vector (columns `id`,
    * `v`). Unrolled: one codegen'd greatest() argmax, plan size
    * O(nLists). Large path: the same argmax as
    * `array_max(transform(centroidsLit, …))` — struct ordering on
    * (s, cid) IS greatest()'s larger-cid tie-break — with the centroid
    * set embedded as a single literal, so plan size is O(1) in nLists.
    * Both paths are per-row map-side expressions: zero shuffle, no join,
    * no row-identity key, deterministic under task retry, and a corpus
    * with duplicate ids keeps every row with identical multiplicity.
    * Package-private so PlanGuardrailSpec can pin the large path's
    * physical shape directly (the public API checkpoints its result,
    * hiding the plan).
    */
  private[operators] def assignToCentroids(
      corpus: DataFrame,
      cents: Array[(Int, Seq[Double])],
      unrolled: Boolean): DataFrame =
    if (cents.length == 1)
      // degenerate but legal (k=1 = "one global cluster"): greatest()
      // needs two arguments, and no argmax is needed anyway
      corpus.withColumn("cid", lit(cents.head._1))
    else if (unrolled) {
      // argmax over centroid dot products, unrolled per centroid
      val scored = cents.map { case (cid, vec) =>
        val cArr = array(vec.map(lit): _*)
        struct(cosine(col("v"), cArr).as("s"), lit(cid).as("cid"))
      }
      corpus.withColumn("cid", greatest(scored.toIndexedSeq: _*).getField("cid"))
    } else
      corpus.withColumn(
        "cid",
        array_max(transform(
          centroidsLit(cents),
          c => struct(cosine(col("v"), c.getField("cv")).as("s"), c.getField("cid").as("cid"))))
          .getField("cid"))

  /** Deterministic Lloyd iteration over an (`id`, `v`) corpus: init =
    * the first `k` vectors by id (driver collect bounded by k·dim — the
    * k-means model, not the data), then `iters` assign/recompute-mean
    * rounds. A cluster that loses all members drops out (its cid simply
    * stops appearing), matching the per-cid mean recomputation. Shared
    * by the IVF index and semantic dedup so both train the identical
    * model for identical inputs.
    */
  private[operators] def lloydCentroids(
      corpus: DataFrame,
      k: Int,
      iters: Int,
      unrolled: Boolean): Array[(Int, Seq[Double])] = {
    var centroids: Array[(Int, Seq[Double])] = corpus
      .orderBy("id").limit(k).collect()
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1)) }
    (1 to iters).foreach { _ =>
      val assigned = assignToCentroids(corpus, centroids, unrolled)
      val dim = centroids.head._2.size
      val meanCols = (0 until dim).map(i => avg(col("v").getItem(i)).as(s"d$i"))
      val means = assigned
        .groupBy("cid")
        .agg(meanCols.head, meanCols.tail: _*)
        .collect()
        .map(r => (r.getInt(0), (0 until dim).map(i => r.getDouble(i + 1))))
      if (means.nonEmpty) centroids = means.map { case (c, v) => (c, v: Seq[Double]) }
    }
    centroids
  }

  private[operators] def maxUnrolled(spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.get(MaxUnrolledListsConf, MaxUnrolledListsDefault.toString).toInt

  /** IVF index: assign every vector to its closest of `nLists` centroids
    * (k-means initialized from the lexicographically-first ids, `iters`
    * Lloyd rounds); queries probe the `nProbe` closest lists only.
    * Approximate — recall measured against bruteForceTopK in tests.
    *
    * Scale: at the `nLists` a 100 TB corpus needs (10³–10⁵) the argmax
    * runs as `array_max(transform(…))` over the centroid set embedded in
    * ONE literal — plan size O(1) in `nLists`, still a pure per-row
    * map-side expression: no join, no shuffle, nothing non-deterministic
    * under task retry. Small `nLists` keeps the unrolled
    * whole-stage-codegen expression. Both paths are exact argmax with
    * the same (sim, cid) tie-break, so the output is bit-identical
    * either way.
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
    val centroids = lloydCentroids(corpus, nLists, iters, unrolled)
    val assigned = assignToCentroids(corpus, centroids, unrolled).cache()
    val queries = assigned
      .filter(col("id").isInCollection(queryIds))
      .select(col("id").as("query_id"), col("v").as("va"))

    // probe lists: nProbe closest centroids per query, descending by
    // (similarity, cid). Same sort/slice in both formulations; only the
    // scored-centroid array's construction differs (unrolled structs vs
    // transform over the single centroid literal).
    val scoredCentroids =
      if (unrolled)
        array(centroids.toIndexedSeq.map { case (cid, vec) =>
          struct(cosine(col("va"), array(vec.map(lit): _*)).as("s"), lit(cid).as("cid"))
        }: _*)
      else
        transform(
          centroidsLit(centroids),
          c => struct(cosine(col("va"), c.getField("cv")).as("s"), c.getField("cid").as("cid")))
    val probed = queries
      .withColumn("probe", slice(reverse(array_sort(scoredCentroids)), 1, nProbe))
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
