package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Exact integer square root — floor(√n) for n ≥ 0 as a column
    * expression. The double-precision `sqrt` seed can round across an
    * integer boundary, so two integer corrections pin the result: both
    * Spark and any external SQL engine applying the same corrections
    * produce the identical BIGINT whatever their libm does.
    */
  private[operators] def isqrt(n: Column): Column = {
    val x0 = floor(sqrt(n.cast("double"))).cast("long")
    val x1 = x0 - when(x0 * x0 > n, 1L).otherwise(0L)
    x1 + when((x1 + lit(1L)) * (x1 + lit(1L)) <= n, 1L).otherwise(0L)
  }

  /** Temperature-based mixture rebalance (the T5 / XLM-R / LLaMA
    * multi-source sampling rule): stratum s is sampled proportionally to
    * `n_tokens(s)^α` instead of `n_tokens(s)`, flattening the mixture
    * toward small strata without capping everything to the smallest one
    * the way [[uniformRebalance]] does.
    *
    * α is restricted to 1/2^k (`sqrtApplications` = k, default 1 → α =
    * 0.5, the common temperature range's midpoint) because then the
    * stratum weight is k nested EXACT integer square roots —
    * `⌊⌊√n⌋^(1/2)…⌋ = ⌊n^(1/2^k)⌋` holds under nested floors — so every
    * intermediate stays a BIGINT and an external SQL engine reproduces
    * the whole table bit-for-bit. A free-α variant would ride
    * engine-specific `pow` rounding, which this repo's oracle contract
    * forbids.
    *
    * Downsampling-only semantics: with weight `w_s = ⌊n_s^α⌋`, the
    * common per-weight token quota is `Q = min_s (n_s div w_s)` and
    * stratum s targets `w_s · Q ≤ n_s` tokens, i.e. the binding stratum
    * keeps ≈10000 bp and everything else keeps
    * `10000 · w_s · Q div n_s`. Token-free strata have nothing to
    * rebalance and keep 10000 bp. All divisions are integer `div`; the
    * resulting fractions feed [[Sampling.stratified]] exactly like the
    * uniform lane's.
    *
    * Scale: identical shape to [[uniformRebalance]] — one map-side
    * combined groupBy bounded by the strata vocabulary; the window min
    * runs over that bounded frame, never the corpus.
    */
  def temperatureRebalance(
      df: DataFrame,
      strataCol: String,
      textCol: String,
      sqrtApplications: Int = 1,
  ): DataFrame = {
    require(sqrtApplications >= 1, s"sqrtApplications must be ≥ 1, got $sqrtApplications")
    val shares = tokenShares(df, strataCol, textCol)
    val weight = (1 to sqrtApplications)
      .foldLeft(col("n_tokens")) { (c, _) => isqrt(c) }
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    shares
      .withColumn("_w", weight)
      // min ignores NULLs, so zero-token strata (whose `when` yields
      // NULL) never constrain the quota
      .withColumn("_quota",
        min(when(col("n_tokens") > 0, expr("n_tokens div _w"))).over(w))
      .withColumn("target_tokens",
        when(col("n_tokens") > 0, col("_w") * col("_quota")).otherwise(0L).cast("long"))
      .withColumn("keep_bp",
        when(col("n_tokens") > 0, expr("(10000 * target_tokens) div n_tokens"))
          .otherwise(10000L).cast("long"))
      .select("stratum", "n_docs", "n_tokens", "target_tokens", "keep_bp")
  }
}
