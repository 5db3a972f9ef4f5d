package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
        aggregate(transform(col("toks"), milliWeight(_)), lit(0L), (acc, x) => acc + x)
          .as("sum_milliweight"))
      .withColumn("is_quality",
        col("sum_milliweight") > lit(thresholdMilli) * col("n_tokens"))
  }
}
