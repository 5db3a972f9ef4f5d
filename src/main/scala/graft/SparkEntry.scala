package graft
import graft.queries.GraftQueries
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * loader → metamodel forest → schema pivot → deduplicated dataset.
    */
  def entry(spark: SparkSession): DataFrame =
    GraftQueries.queries("extract_customer")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = GraftQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = GraftQueries.oracleSql

  /** SPARK_GRAFT_QUERIES subset (one contract shared by Bench and
    * Verify): comma-separated query names, validated against the
    * registry. An unknown or empty name fails LOUDLY — a typo'd subset
    * that silently selects zero queries would make a verify run that
    * ran nothing read as fully green.
    */
  def querySubset(): Option[Set[String]] =
    sys.env.get("SPARK_GRAFT_QUERIES").map { raw =>
      val names = raw.split(",").map(_.trim).filter(_.nonEmpty).toSet
      require(names.nonEmpty, "SPARK_GRAFT_QUERIES is set but names no queries")
      val unknown = names.diff(queries.keySet)
      require(unknown.isEmpty,
        s"SPARK_GRAFT_QUERIES names unknown queries: ${unknown.toSeq.sorted.mkString(", ")}")
      names
    }

  /** Drop every registry-level memo (forest loads, extracted datasets,
    * trained models, …). Bench calls this at pass boundaries so
    * min-of-N passes re-measure the real work instead of a memo read.
    */
  def resetMemos(spark: SparkSession): Unit = GraftQueries.resetMemos(spark)
}
