package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types._

/** Event-log readers that normalize the `ts` column to session-zoned
  * TIMESTAMP no matter how the parquet writer encoded it. The driver
  * corpus has shipped `ts` as TIMESTAMP(NANOS) (which Spark's reader
  * only accepts as raw int64 via `nanosAsLong`) and, after a testdata
  * regeneration, as TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as
  * TIMESTAMP_NTZ) — so the unit/logical type is probed from the file,
  * never assumed. All queries pin the session time zone to UTC, which
  * makes the NTZ→TZ cast a pure reinterpretation.
  */
object EventTime {

  /** Cast/convert an already-read `ts` column to TIMESTAMP by its actual
    * type: raw int64 = nanos (the only way nanos parquet reads), NTZ =
    * wall-clock micros reinterpreted in the (UTC) session zone, TZ =
    * already right.
    */
  def normalize(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema(tsCol).dataType match {
      case LongType =>
        df.withColumn(tsCol, expr(s"timestamp_micros($tsCol div 1000)"))
      case TimestampNTZType =>
        df.withColumn(tsCol, col(tsCol).cast(TimestampType))
      case TimestampType => df
      case other =>
        throw new IllegalArgumentException(
          s"events column '$tsCol' has unsupported type $other")
    }

  private val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  /** True iff the `ts` column of (the first parquet file under) `path`
    * is annotated TIMESTAMP(NANOS) — probed from the parquet footer
    * itself, so the decision never depends on exception-message text.
    * Any probe failure (missing path, non-parquet, group-typed `ts`)
    * answers false and leaves the error to the real read.
    */
  private def tsIsNanos(spark: SparkSession, path: String): Boolean =
    scala.util.Try {
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      import org.apache.parquet.schema.LogicalTypeAnnotation.{TimestampLogicalTypeAnnotation, TimeUnit}
      val hconf = spark.sparkContext.hadoopConfiguration
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(hconf)
      val file =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).map(_.getPath.toString).filter(_.endsWith(".parquet")).min
        else path
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(file), hconf))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        schema.containsField("ts") && (schema.getType(Seq("ts"): _*).getLogicalTypeAnnotation match {
          case t: TimestampLogicalTypeAnnotation => t.getUnit == TimeUnit.NANOS
          case _ => false
        })
      } finally reader.close()
    }.getOrElse(false)

  /** Read parquet without touching session state unless the file is
    * genuinely TIMESTAMP(NANOS)-encoded (probed from the footer), in
    * which case `nanosAsLong` must be enabled BEFORE schema inference —
    * and must outlive this call, because the footer is re-converted when
    * the lazy scan actually executes. So in that one case it stays set
    * for the session instead of being a blanket side effect on every
    * events read. The message-text catch remains only as a second-chance
    * net if a future encoding defeats the footer probe.
    */
  private def parquetWithNanosFallback(spark: SparkSession, path: String): DataFrame = {
    if (tsIsNanos(spark, path)) spark.conf.set(NanosConf, "true")
    try spark.read.parquet(path)
    catch {
      case e: Exception if Option(e.getMessage).exists(_.contains("NANOS")) =>
        spark.conf.set(NanosConf, "true")
        spark.read.parquet(path)
    }
  }

  /** Batch read of `dir`/events.parquet with `ts` normalized. */
  def readBatch(spark: SparkSession, dir: String): DataFrame =
    normalize(parquetWithNanosFallback(spark, s"$dir/events.parquet"))

  /** Streaming read of the same files. File-stream sources need an
    * explicit schema, so probe the batch reader's resolved type for `ts`
    * and derive the stream DDL from it instead of hard-coding a unit.
    */
  def readStreamEvents(spark: SparkSession, dir: String): DataFrame = {
    val tsDdl = parquetWithNanosFallback(spark, s"$dir/events.parquet").schema("ts").dataType match {
      case LongType        => "BIGINT"
      case TimestampNTZType => "TIMESTAMP_NTZ"
      case _               => "TIMESTAMP"
    }
    val schema = StructType.fromDDL(
      s"event_id BIGINT, ts $tsDdl, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
    // file stream sources need a directory or glob, not a bare file
    normalize(spark.readStream.schema(schema).parquet(s"$dir/events*.parquet"))
  }
}
