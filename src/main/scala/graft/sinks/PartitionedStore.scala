package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-style partitioned-parquet sink for datasets that are
  * re-filtered repeatedly on a low-cardinality column — a corpus laid
  * out by language/source/date, an event log by day. The complement of
  * [[BucketedStore]]: bucketing pre-pays a JOIN's shuffle, partitioning
  * pre-pays a FILTER's scan.
  *
  * Directory-partitioning on the filter column turns every later
  * `filter(col === v)` into partition PRUNING — the scan lists only the
  * matching directories and reads NOTHING else. At 100 TB a
  * per-language read of a by-language corpus touches one language's
  * files instead of scanning everything and discarding 95 % of it;
  * `PartitionedStoreSpec` pins the plan (`PartitionFilters`, scanned
  * file subset) so a regression to full scans fails tests, not
  * production.
  *
  * Partition columns must be low-cardinality (languages, sources,
  * dates — not ids): each value is a directory, and millions of tiny
  * directories destroy listing performance. High-cardinality layout
  * wants [[BucketedStore]] instead.
  */
object PartitionedStore {

  /** Write `df` partitioned by `partitionCols` at `path`, registered as
    * `table` (replacing any prior version). Within each partition
    * directory, rows additionally sort by `sortCols` so downstream
    * per-partition scans read runs, not random order.
    */
  def write(
      df: DataFrame,
      table: String,
      path: String,
      partitionCols: Seq[String],
      sortCols: Seq[String] = Nil,
  ): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val sorted =
      if (sortCols.isEmpty) df
      else df.sortWithinPartitions(sortCols.map(org.apache.spark.sql.functions.col): _*)
    sorted.write
      .format("parquet")
      .option("path", path)
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .saveAsTable(table)
  }

  /** The registered partitioned table; filters on the partition columns
    * prune directories at planning time.
    */
  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
