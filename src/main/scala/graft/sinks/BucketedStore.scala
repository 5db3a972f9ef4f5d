package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-parquet sink for datasets that are re-joined repeatedly on
  * one key — the extracted group/relation tables most of all (an
  * `extract_datasets` consumer joins facts to dims on the oid far more
  * often than it re-extracts; reference consumers do the same against
  * their exported SQL tables, architxt/database/export.py).
  *
  * Writing both sides of a recurring join bucketed (and sorted) by the
  * join key pre-pays the shuffle ONCE at write time: every later join
  * between tables with compatible bucketing plans as a zero-Exchange
  * sort-merge over matching bucket files. At 100 TB that turns the
  * hottest repeated join from a full-corpus shuffle per query into a
  * local merge per bucket — the same co-location contract a
  * pre-partitioned warehouse gives, expressed through Spark's own
  * bucketed-table support (no Hive needed; the in-memory catalog
  * records the bucket spec).
  *
  * Buckets size the PARALLELISM of every downstream bucketed scan, so
  * pick `numBuckets` for the target cluster (≥ executor cores at the
  * deployment scale), not the laptop.
  */
object BucketedStore {

  /** Write `df` as a bucketed+sorted parquet table at `path`, registered
    * as `table` in the session catalog (replacing any prior version).
    * Rows land hash-distributed on `bucketCol` into `numBuckets` files
    * per partition-write, each sorted by the key for merge-ready scans.
    */
  def write(
      df: DataFrame,
      table: String,
      path: String,
      bucketCol: String,
      numBuckets: Int,
  ): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    df.write
      .format("parquet")
      .option("path", path)
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
  }

  /** The registered bucketed table as a DataFrame; scans carry the
    * bucket spec, so joins/aggregations on the bucket key skip their
    * Exchange when the other side is bucketed compatibly.
    */
  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
