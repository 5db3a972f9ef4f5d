package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-file compaction — the maintenance pass every long-lived
  * parquet dataset needs. Streaming sinks, per-epoch snapshots, and
  * fine-grained CDC merges each land many small files; at 100 TB the
  * file COUNT, not the byte volume, becomes the bottleneck (listing
  * latency, driver memory for the file index, one scan task per tiny
  * file). Compaction rewrites a directory into ~`targetBytes` files.
  *
  * The file count is sized from the dataset's actual on-disk bytes
  * (`ceil(totalBytes / targetBytes)`), then laid out with
  * `repartitionByRange` on the given column so each output file covers
  * a contiguous key range — min/max footer stats then let later
  * range-filtered scans skip whole files (poor-man's clustering), and
  * the write is a full shuffle rather than `coalesce` (which would
  * fuse upstream stages down to the output parallelism).
  */
object Compaction {

  /** On-disk bytes of the parquet files under `path`. */
  def dataBytes(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) total += f.getLen
    }
    total
  }

  /** Rewrite `srcPath` to `dstPath` as ~`targetBytes`-sized files,
    * range-clustered on `clusterCol`. Returns the output file count.
    */
  def compact(
      spark: SparkSession,
      srcPath: String,
      dstPath: String,
      clusterCol: String,
      targetBytes: Long = 128L * 1024 * 1024,
  ): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val bytes = dataBytes(spark, srcPath)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(srcPath)
      .repartitionByRange(nFiles, col(clusterCol))
      .write.mode("overwrite").parquet(dstPath)
    val dst = new org.apache.hadoop.fs.Path(dstPath)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(dst).count(_.getPath.getName.endsWith(".parquet"))
  }

  /** Read back a compacted dataset. */
  def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)
}
