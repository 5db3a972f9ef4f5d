package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling — the reproducible alternative to
  * `DataFrame.sample` for training-data pipelines (corpus rebalancing,
  * held-out splits, ablation shards). A row's fate depends only on its
  * content key, never on partitioning, task retries, or run count: the
  * same corpus always yields the same sample, and a re-run over 100 TB
  * resumes identically after a failure.
  *
  * Mechanics: `portableHash(stratum ':' id) mod Buckets` maps each row
  * to one of 10000 stable buckets; a row survives iff its bucket falls
  * below `round(fraction · Buckets)`. The hash is the same md5-prefix
  * used by the dedup lanes, so any SQL engine reproduces the exact
  * sample. Everything is a codegen'd scan-level filter — no shuffle, no
  * UDF, and Parquet column pruning still applies.
  */
object Sampling {

  /** Bucket granularity: fractions are honored in steps of 1/10000. */
  val Buckets = 10000

  /** Stable bucket in [0, Buckets) for a (stratum, id) pair. The id is
    * prefixed by its stratum so re-stratifying reshuffles bucket
    * membership (samples across different strata columns are
    * independent). A null stratum hashes as the empty string — the same
    * key any `COALESCE(stratum, '') || ':' || id` SQL reproduction
    * yields — so null-strata rows are sampled at the default rate
    * rather than silently diverging between engines.
    */
  def bucket(strataCol: Column, idCol: Column): Column =
    TextAnalysis.portableHash(
      concat_ws(":", coalesce(strataCol.cast("string"), lit("")), idCol.cast("string"))) % Buckets

  /** Per-stratum deterministic downsampling: keep `fractions(stratum)`
    * of each stratum's rows (`defaultFraction` for strata not listed).
    * The fraction map is compiled into a literal CASE chain — strata
    * counts are vocabulary-bounded (languages, sources), so the
    * predicate stays a broadcast-free scan filter at any data size.
    */
  def stratified(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0,
  ): DataFrame = {
    require((defaultFraction +: fractions.values.toSeq).forall(f => f >= 0 && f <= 1),
      "fractions must be within [0, 1]")
    val threshold = fractions.toSeq.sortBy(_._1).foldLeft(
      lit(math.round(defaultFraction * Buckets))) { case (acc, (stratum, f)) =>
      when(col(strataCol) === stratum, lit(math.round(f * Buckets))).otherwise(acc)
    }
    df.filter(bucket(col(strataCol), col(idCol)) < threshold)
  }

  /** Fixed-SIZE deterministic sample: the `k` rows with the smallest
    * content hashes per stratum (ties broken by id — deterministic
    * because ids are unique within a stratum). Unlike [[stratified]],
    * which keeps a fixed FRACTION, this yields exactly `min(k, |stratum|)`
    * rows — the "give me 10k eval docs per language, reproducibly"
    * operation. Because the hash is uniform, the kept set is a uniform
    * sample, and it is STABLE under corpus growth except where new rows
    * hash under the stratum's current k-th hash — the property that
    * keeps eval sets comparable across corpus versions.
    *
    * One hash exchange on the stratum + a per-stratum sort; with k ≪
    * stratum size a cluster run would add a per-partition pre-filter
    * (top-k per partition) — Spark's window already stops at the sort,
    * which AQE splits on skew.
    */
  def fixedSizePerStratum(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      k: Int,
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val byStratum = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(col("graft_h").asc, col(idCol).asc)
    df.withColumn("graft_h",
        TextAnalysis.portableHash(
          concat_ws(":", coalesce(col(strataCol).cast("string"), lit("")), col(idCol).cast("string"))))
      .withColumn("sample_rank", row_number().over(byStratum))
      .filter(col("sample_rank") <= k)
      .drop("graft_h")
  }

  /** Single-rate deterministic sample (stratum = the constant split
    * name, so distinct `splitName`s draw independent samples — the
    * train/validation split pattern).
    */
  def deterministic(df: DataFrame, idCol: String, fraction: Double, splitName: String = ""): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be within [0, 1]")
    df.filter(bucket(lit(splitName), col(idCol)) < lit(math.round(fraction * Buckets)))
  }
}
