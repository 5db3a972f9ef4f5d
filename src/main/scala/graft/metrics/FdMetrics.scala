package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Functional-dependency analytics (reference architxt/metrics.py:25-150)
  * as pure DataFrame aggregations — each confidence is exactly two
  * `groupBy().agg()` passes, fully codegen'd, no UDFs.
  */
object FdMetrics {

  /** FD confidence of (all other columns → column):
    * Σ_x max_y count(X=x, Y=y) / N (metrics.py:25-62). Nulls group as
    * values (pandas dropna=False ≡ Spark groupBy null handling).
    */
  def confidence(df: DataFrame, column: String): Double = {
    val cols = df.columns.toSeq
    if (cols.size == 1 || !cols.contains(column)) return 0.0
    val n = df.count()
    if (n == 0) return 0.0
    val antecedents = cols.filterNot(_ == column)
    val counts = df.groupBy(cols.map(col): _*).count()
    val maxed = counts.groupBy(antecedents.map(col): _*).agg(max("count").as("m"))
    val total = maxed.agg(sum("m")).head.getLong(0)
    total.toDouble / n
  }

  /** Max confidence over the attribute subset, each attribute as the
    * consequent; short-circuits at 1.0 (metrics.py:65-95).
    */
  def dependencyScore(df: DataFrame, attributes: Seq[String]): Double = {
    val projected = df.select(attributes.map(col): _*)
    var best = 0.0
    val it = attributes.iterator
    while (it.hasNext && best < 1.0) {
      val c = confidence(projected, it.next())
      if (c > best) best = c
    }
    best
  }

  /** Fraction of rows duplicated on at least one attribute subset whose
    * dependency score ≥ tau (metrics.py:105-150). Columns with more than
    * `nullThreshold` null proportion are dropped first. The powerset is
    * bounded by `maxAttributes` (reference is unbounded — group widths
    * are small in practice); when truncated, the widest columns are
    * dropped and a warning is logged.
    */
  def redundancyScore(
      df: DataFrame,
      tau: Double = 1.0,
      nullThreshold: Double = 0.8,
      maxAttributes: Int = 12,
  ): Double = {
    val n = df.count()
    if (n == 0) return 0.0

    val nullProps = df
      .select(df.columns.map(c => avg(col(c).isNull.cast("double")).as(c)).toIndexedSeq: _*)
      .head
    var attributes = df.columns.toSeq.filter(c => nullProps.getAs[Double](c) <= nullThreshold)
    if (attributes.size > maxAttributes) {
      System.err.println(
        s"[graft] redundancyScore: ${attributes.size} attributes exceed cap $maxAttributes; truncating")
      attributes = attributes.take(maxAttributes)
    }
    if (attributes.size < 2) return 0.0

    val withId = df.withColumn("__rid", monotonically_increasing_id()).cache()
    try {
      val subsets = (2 to attributes.size).flatMap(k => attributes.combinations(k))
      val qualifying = subsets.filter(s => dependencyScore(withId, s) >= tau)
      if (qualifying.isEmpty) return 0.0

      val marked = qualifying
        .map { s =>
          // pandas .dropna().duplicated(keep=False): rows with no null in
          // the subset whose subset-tuple occurs more than once.
          val w = Window.partitionBy(s.map(col): _*)
          withId
            .filter(s.map(col(_).isNotNull).reduce(_ && _))
            .withColumn("__cnt", count(lit(1)).over(w))
            .filter(col("__cnt") > 1)
            .select("__rid")
        }
        .reduce(_ union _)
        .distinct()
        .count()
      marked.toDouble / n
    } finally withId.unpersist()
  }

  /** Per-consequent confidence table — the query-surface form:
    * one row (consequent, confidence) per column. The input is cached for
    * the duration: each consequent triggers two aggregations, and without
    * the cache an expensive upstream (e.g. a dataset pivot) re-runs per
    * column.
    */
  def confidenceTable(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cached = df.persist()
    try df.columns.toSeq
      .map(c => c -> confidence(cached, c))
      .toDF("consequent", "confidence")
    finally cached.unpersist(blocking = false)
  }
}
