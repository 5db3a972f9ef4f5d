package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus mixture accounting: per-stratum (language, source, domain)
  * token totals and the downsampling fractions that rebalance the corpus
  * toward a target mixture — the "data mixing" stage of a pretraining
  * pipeline, feeding [[Sampling.stratified]] for the actual cut.
  *
  * Scale design: one map-side-combined groupBy over the corpus produces
  * the per-stratum totals (bounded by strata vocabulary, not corpus
  * size); everything after runs on that bounded frame. Fractions are
  * integer basis points from pure integer arithmetic
  * (`10000 · min_tokens ÷ tokens`), so the result is bit-exact across
  * engines and feeds the deterministic sampler without float drift.
  */
object Mixture {

  /** Per-stratum document and whitespace-token totals. */
  def tokenShares(df: DataFrame, strataCol: String, textCol: String): DataFrame =
    df.groupBy(col(strataCol).as("stratum"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCountExpr(col(textCol))).cast("long").as("n_tokens"))

  /** Keep-fractions (basis points) that downsample every stratum to the
    * token budget of the smallest one — the uniform-mixture rebalance.
    * Downsampling-only: the smallest stratum keeps 10000 bp, stratum s
    * keeps `10000 · min_tokens ÷ tokens_s` (integer division).
    */
  def uniformRebalance(df: DataFrame, strataCol: String, textCol: String): DataFrame = {
    val shares = tokenShares(df, strataCol, textCol)
    // strata are vocabulary-bounded, so the unpartitioned window min is
    // a single-task reduction over a handful of rows, not a scale risk
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    // `div`, not `/`: long division through doubles can land 1 ulp
    // under an integer and truncate to floor−1, breaking bit-exactness
    shares.withColumn("_min_tokens", min(col("n_tokens")).over(w))
      .withColumn("keep_bp", expr("(10000 * _min_tokens) div n_tokens"))
      .select("stratum", "n_docs", "n_tokens", "keep_bp")
  }
}
