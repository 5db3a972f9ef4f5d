package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the gate a training-data
  * pipeline runs before (and after) every expensive stage: "is the key
  * unique, are the domains closed, did a null column sneak in?" The
  * shape follows the published constraint-suite design of AWS Deequ
  * (Schelter et al., "Automating Large-Scale Data Quality Verification",
  * VLDB 2018): a suite of named checks is compiled into ONE aggregation
  * pass over the table, and the verdict is a small table of
  * (check, metric, threshold, passed) rows.
  *
  * Metrics are integer parts-per-million (`metric_ppm = n·10⁶ div
  * total`, truncating division) so every verdict is bit-reproducible by
  * any SQL engine — no floating-point fractions anywhere.
  *
  * Scale: all [[Check.Completeness]] / [[Check.Satisfies]] checks fuse
  * into a single codegen'd aggregation scan (map-side partials, one
  * 1-row exchange). Each [[Check.Distinctness]] adds one
  * distinct-aggregate expansion (its own hash exchange on the checked
  * column) — the irreducible cost of an EXACT distinct count; at
  * 100 TB use [[Check.ApproxDistinctness]] (HyperLogLog partials,
  * mergeable, no extra exchange) for non-gating profiling and reserve
  * the exact form for key checks that must be precise.
  */
object Validation {

  /** One named constraint. `thresholdPpm` is the minimum `metric_ppm`
    * for the check to pass (1000000 = "must hold for every row").
    */
  sealed trait Check {
    def name: String
    def column: String
    def thresholdPpm: Long
  }
  object Check {
    /** Fraction of rows where `column` is non-null. */
    final case class Completeness(column: String, thresholdPpm: Long) extends Check {
      val name = s"completeness($column)"
    }

    /** Fraction of rows where the SQL predicate holds (null → fails the
      * predicate). Domain, range, and shape checks are all spellings of
      * this: `o_totalprice >= 0`, `o_orderstatus IN ('O','F','P')`,
      * `o_orderpriority RLIKE '^[1-5]-'`.
      */
    final case class Satisfies(name: String, column: String, predicateSql: String,
        thresholdPpm: Long) extends Check

    /** Exact distinct values of `column` as a fraction of all rows —
      * 1000000 on a non-null column means "this is a primary key".
      */
    final case class Distinctness(column: String, thresholdPpm: Long) extends Check {
      val name = s"distinctness($column)"
    }

    /** HyperLogLog-estimated distinctness (mergeable sketch partials —
      * no per-column exchange). For profiling dashboards, not exact
      * key gates; `rsd` is Spark's documented relative standard error.
      */
    final case class ApproxDistinctness(column: String, thresholdPpm: Long,
        rsd: Double = 0.05) extends Check {
      val name = s"approx_distinctness($column)"
    }
  }

  /** Run the suite: one row per check —
    * (check, column, metric_ppm, threshold_ppm, passed).
    *
    * The whole suite is one `agg(...)` over the input (plus one expand
    * per exact-distinct check); the verdict explosion happens on the
    * single aggregated row, so the output stage is O(#checks).
    */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "validate() needs at least one check")
    require(checks.map(_.name).distinct.size == checks.size,
      s"check names must be unique: ${checks.map(_.name)}")
    val metricAggs: Seq[Column] = checks.zipWithIndex.map { case (c, i) =>
      val agg = c match {
        case Check.Completeness(column, _) => count(col(column))
        case Check.Satisfies(_, _, pred, _) =>
          count(when(expr(pred), lit(1)))
        case Check.Distinctness(column, _) => count_distinct(col(column))
        case Check.ApproxDistinctness(column, _, rsd) =>
          approx_count_distinct(col(column), rsd)
      }
      agg.cast("long").as(s"graft_m$i")
    }
    val one = df.agg(count(lit(1)).cast("long").as("graft_total"), metricAggs: _*)
    val verdicts: Seq[Column] = checks.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c.name).as("check"),
        lit(c.column).as("column"),
        // truncating integer division (`div`, never fractional `/`);
        // an empty table passes nothing
        when(col("graft_total") > 0,
          expr(s"(graft_m$i * 1000000L) div graft_total"))
          .otherwise(lit(0L)).cast("long").as("metric_ppm"),
        lit(c.thresholdPpm).as("threshold_ppm"),
      )
    }
    one
      .select(explode(array(verdicts: _*)).as("v"))
      .select(col("v.*"))
      .withColumn("passed", col("metric_ppm") >= col("threshold_ppm"))
  }
}
