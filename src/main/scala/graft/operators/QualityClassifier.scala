package graft.operators

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Linear text-quality classifier — the model-scored keep/drop lane of a
  * training-data pipeline (fastText-style), complementing
  * [[TextAnalysis.qualityScore]]'s hand-written heuristics.
  *
  * Architecture: token → hashed feature bucket (the repo's portable
  * md5-prefix hash mod [[Dim]]) → per-bucket weight → document score =
  * sum of token weights; a document passes when its mean token weight
  * exceeds a threshold. This is exactly a hashed-bag-of-words linear
  * model's inference pass with the sigmoid dropped — sigmoid is
  * monotone, so thresholding the linear score is equivalent, and it
  * keeps every intermediate an exact BIGINT.
  *
  * The weight vector is the SEAM: [[milliWeight]] derives a
  * deterministic pseudo-weight from the bucket id (no trained model
  * ships in this offline environment). A real model replaces that one
  * expression with `element_at(typedLit(weights), bucket + 1)` — the
  * same single-literal O(1)-plan trick the IVF centroid path uses —
  * and nothing else changes: the hashing, aggregation, thresholding,
  * and oracle structure are weight-agnostic.
  *
  * Scale: one codegen'd projection over the corpus scan — no shuffle,
  * no join, no UDF (pinned by PlanGuardrailSpec). Weights are integer
  * milli-units and the threshold comparison is cross-multiplied, so any
  * SQL engine reproduces scores and labels bit-exactly (the DuckDB
  * oracle does).
  */
object QualityClassifier {

  /** Feature-hash dimension (fastText's default order of magnitude). */
  val Dim = 4096

  /** Knuth multiplicative constant mixing bucket ids into pseudo-weights. */
  val Mix = 2654435761L

  /** Default mean-milli-weight threshold for `is_quality` — shared with
    * the DuckDB oracle (interpolated there) so model and oracle move
    * together.
    */
  val DefaultThresholdMilli = 0L

  /** Deterministic per-bucket milli-weight in [-1000, 1000] — the stand-in
    * weight vector (see class doc for the trained-model swap).
    * `bucket` is non-negative, so `%` is a true mod on both engines.
    */
  private def milliWeight(token: Column): Column = {
    val bucket = TextAnalysis.portableHash(token) % Dim
    (bucket * lit(Mix)) % 2001L - 1000L
  }

  /** Per-document quality scores: (id, n_tokens, sum_milliweight,
    * is_quality). `is_quality` ⟺ mean token milli-weight >
    * `thresholdMilli`, evaluated as `sum > threshold · n` so it stays in
    * integer arithmetic; token-free documents are not quality.
    */
  def score(
      df: DataFrame,
      idCol: String,
      textCol: String,
      thresholdMilli: Long = DefaultThresholdMilli,
  ): DataFrame =
    scoreImpl(df, idCol, textCol, milliWeight, thresholdMilli)

  /** [[score]] with a REAL weight vector (size [[Dim]], integer
    * milli-units, e.g. from [[train]]): the documented trained-model
    * swap-in, executed — the weight lookup is one
    * `element_at(array-literal, bucket + 1)` over the same single
    * codegen'd corpus-scan projection, so the plan shape (no shuffle, no
    * join, no UDF) is identical to the pseudo-weight path and an
    * external engine replays scoring bit-exactly given the same array.
    */
  def scoreWith(
      df: DataFrame,
      idCol: String,
      textCol: String,
      weightsMilli: Array[Long],
      thresholdMilli: Long = DefaultThresholdMilli,
  ): DataFrame = {
    require(weightsMilli.length == Dim,
      s"weight vector must have length $Dim, got ${weightsMilli.length}")
    val weights = typedLit(weightsMilli.toIndexedSeq)
    def trained(token: Column): Column =
      element_at(weights,
        (TextAnalysis.portableHash(token) % Dim).cast("int") + 1)
    scoreImpl(df, idCol, textCol, trained, thresholdMilli)
  }

  private def scoreImpl(
      df: DataFrame,
      idCol: String,
      textCol: String,
      weightOf: Column => Column,
      thresholdMilli: Long,
  ): DataFrame = {
    // NULL text scores like empty text ((0, 0, false)) instead of
    // propagating NULL through every column — the same coalesce the
    // oracle applies, so the two cannot diverge on null documents
    val toks = filter(split(coalesce(col(textCol), lit("")), " "), t => t =!= "")
    df.select(
        col(idCol).as("doc_id"),
        toks.as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        aggregate(transform(col("toks"), weightOf(_)), lit(0L), (acc, x) => acc + x)
          .as("sum_milliweight"))
      .withColumn("is_quality",
        col("sum_milliweight") > lit(thresholdMilli) * col("n_tokens"))
  }

  /** Train the weight vector for real: hashed-BoW logistic regression
    * (MLlib LBFGS — deterministic on fixed data: no sampling, no random
    * init) over labeled documents, coefficients quantized to the integer
    * milli-unit layout [[scoreWith]] consumes. Features are per-document
    * token counts bucketed by the SAME portable hash the scoring
    * projection uses, so a trained weight and its serving-time lookup
    * can never disagree on the bucket. No intercept and no
    * standardization: the served decision is `sign(w·x)` thresholded in
    * pure integer arithmetic, so the model must carry the whole decision
    * in `w`.
    *
    * Scale: the feature build is explode → two map-side-combined
    * aggregations (corpus-sized but shuffle-bounded by docs × distinct
    * buckets-per-doc); LBFGS state is O([[Dim]]) on the driver. Label
    * column: any numeric 0/1. Token-free documents contribute nothing
    * to training (they have no features) and score `false` at serve
    * time.
    */
  def train(
      df: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      regParam: Double = 1e-3,
      maxIter: Int = 100,
  ): Array[Long] = {
    val spark = df.sparkSession
    import spark.implicits._
    val toks = filter(split(coalesce(col(textCol), lit("")), " "), t => t =!= "")
    val bucketed = df
      .select(col(idCol).as("_id"), col(labelCol).cast("double").as("_label"),
        explode(toks).as("_tok"))
      .select(col("_id"), col("_label"),
        (TextAnalysis.portableHash(col("_tok")) % Dim).cast("int").as("_bucket"))
      .groupBy("_id", "_label", "_bucket")
      .agg(count(lit(1)).cast("double").as("_cnt"))
    val vecs = bucketed
      .groupBy("_id", "_label")
      .agg(collect_list(struct(col("_bucket"), col("_cnt"))).as("_feats"))
      .map { r =>
        val pairs = r.getSeq[Row](2)
          .map(p => (p.getInt(0), p.getDouble(1))).sortBy(_._1)
        (r.getDouble(1),
          Vectors.sparse(Dim, pairs.map(_._1).toArray, pairs.map(_._2).toArray))
      }
      .toDF("label", "features")
    val model = new LogisticRegression()
      .setMaxIter(maxIter)
      .setRegParam(regParam)
      .setStandardization(false)
      .setFitIntercept(false)
      .fit(vecs)
    model.coefficients.toArray.map(c => math.round(c * 1000.0))
  }
}
