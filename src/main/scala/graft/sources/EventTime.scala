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

  /** Read parquet without touching session state; only when the file is
    * genuinely TIMESTAMP(NANOS)-encoded (schema inference fails on the
    * footer) enable `nanosAsLong` and retry. The conf must then outlive
    * this call — the footer is re-converted when the lazy scan actually
    * executes — so in that one case it stays set for the session instead
    * of being a blanket side effect on every events read.
    */
  private def parquetWithNanosFallback(spark: SparkSession, path: String): DataFrame =
    try spark.read.parquet(path)
    catch {
      case e: Exception if Option(e.getMessage).exists(_.contains("NANOS")) =>
        spark.conf.set(NanosConf, "true")
        spark.read.parquet(path)
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
