package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable-sketch frequency surface — the constant-memory stand-in for
  * a full token count when the vocabulary won't fit anywhere ("how often
  * does this phrase occur in 100 TB?" without a 10-billion-row groupBy).
  *
  * Spark's `stat.countMinSketch` builds the classic Cormode-Muthukrishnan
  * CM sketch as a partial aggregate: each partition fills a fixed
  * `width x depth` counter grid, grids merge by cell-wise addition
  * (tree-aggregated), and the driver holds ONE grid of
  * `ceil(e/eps) x ceil(ln(1/(1-confidence)))` longs — a few hundred KB
  * regardless of corpus size. Estimates only ever OVER-count (every
  * update touches each row's cell), and exceed the true count by more
  * than eps·N with probability below 1-confidence.
  */
object Sketches {

  /** Accuracy-gate lane (same contract shape as the HLL and IVF-recall
    * gates): sketch the token stream, then check the CMS invariants
    * against the exact counts of the `topK` most frequent tokens —
    * `estimate >= exact` (structural, must ALWAYS hold) and
    * `estimate <= exact + ceil(eps·N)` (probabilistic, deterministic
    * for a fixed seed). Output: one row per top token,
    * (token, exact_count, overestimates, within_eps).
    *
    * The exact top-K groupBy exists only to FEED the gate — a real
    * 100 TB deployment keeps the sketch and skips the exact pass.
    */
  def cmsTokenGate(
      df: DataFrame,
      textCol: String,
      topK: Int,
      eps: Double = 0.001,
      confidence: Double = 0.99,
      seed: Int = 42,
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val tokens = df
      .select(explode(split(trim(col(textCol)), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val cms = tokens.stat.countMinSketch("token", eps, confidence, seed)
    val slack = math.ceil(eps * cms.totalCount()).toLong
    val exactTop = tokens
      .groupBy("token").agg(count(lit(1)).as("exact_count"))
      .orderBy(col("exact_count").desc, col("token").asc)
      .limit(topK)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    exactTop.toSeq.map { case (token, exact) =>
      val est = cms.estimateCount(token)
      (token, exact, est >= exact, est <= exact + slack)
    }.toDF("token", "exact_count", "overestimates", "within_eps")
  }
}
