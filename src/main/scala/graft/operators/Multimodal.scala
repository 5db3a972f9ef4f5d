package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media
  * (image/audio/video) travels as an opaque `binary` column plus a typed
  * metadata struct; decode / feature-extraction / resize / frame-sample
  * run per partition in bounded batches.
  *
  * Version pin: the batch stages consume `df.queryExecution.toRdd` —
  * `InternalRow` without a deserialization pass, the JVM analogue of
  * what `mapInPandas` gets via Arrow. `queryExecution`/`toRdd` are
  * developer-API surface, not public-stable: written against Spark
  * 4.1.x (field layout also asserted by MultimodalSpec), re-check on
  * any Spark major upgrade.
  *
  * The actual codecs are NOT available in this environment, so the
  * decode step is a clearly-marked deterministic STUB (`StubCodec`): it
  * fabricates dimensions/durations as pure functions of the bytes. The
  * Spark-side contract — schema, batch shape, partition processing,
  * null/empty handling — is real and tested; swapping `StubCodec` for a
  * JNI/FFmpeg-backed codec changes no plumbing.
  */
object Multimodal {

  /** Typed metadata carried next to the opaque payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** STUB decoder — deterministic fake in place of a real image/audio
    * codec (??? in spirit: the real implementation needs libs absent
    * from this container). Dimensions are pure functions of the payload
    * so tests and oracles can reproduce them.
    */
  object StubCodec {
    def width(bytes: Array[Byte]): Int = (bytes.length % 640) + 1
    def height(bytes: Array[Byte]): Int = ((bytes.length * 7) % 480) + 1
    def frames(bytes: Array[Byte]): Int = (bytes.length % 24) + 1

    /** "Decode" to a fake row-major grayscale plane: byte i of the plane
      * is payload(i mod n). Deterministic, size-bounded.
      */
    def decode(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = new Array[Byte](math.min(w * h, 1 << 16))
      var i = 0
      while (i < out.length) { out(i) = bytes(i % math.max(bytes.length, 1)); i += 1 }
      out
    }
  }

  /** Attach the typed metadata struct to an opaque binary column —
    * column-function only (codegen-friendly): n_bytes is exact; the
    * dimensions use the stub's arithmetic.
    */
  def withMediaMeta(df: DataFrame, binCol: String, mime: String): DataFrame =
    df.withColumn("media_meta", struct(
      lit(mime).as("mime"),
      length(col(binCol)).cast("long").as("n_bytes"),
      (length(col(binCol)) % 640 + 1).cast("int").as("width"),
      ((length(col(binCol)) * 7) % 480 + 1).cast("int").as("height"),
      (length(col(binCol)) % 24 + 1).cast("int").as("n_frames")))

  /** Feature extraction over bounded per-partition batches — the Scala
    * shape of a pandas-UDF/mapInPandas media stage: rows stream through
    * in groups of `batchSize` so a real codec could amortize model or
    * decoder initialization per batch.
    */
  def extractFeatures(
      df: DataFrame,
      idCol: String,
      binCol: String,
      batchSize: Int = 64,
  ): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("n_bytes", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_byte", DoubleType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)

    val rows = df.queryExecution.toRdd.mapPartitions { it =>
      // extract fields BEFORE buffering: Spark reuses the InternalRow
      // instance, so grouping raw rows would replicate the last row
      val fields = it.map(r => (r.getLong(idIdx), r.getBinary(binIdx)))
      fields.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a real decoder would initialize once
        batch.iterator.map { case (id, bytes) =>
          if (bytes == null || bytes.isEmpty)
            Row(id, 0L, 0, 0, 0.0)
          else {
            val w = StubCodec.width(bytes)
            val h = StubCodec.height(bytes)
            val plane = StubCodec.decode(bytes, w, h)
            var sum = 0L
            plane.foreach(b => sum += (b & 0xff))
            Row(id, bytes.length.toLong, w, h, sum.toDouble / plane.length)
          }
        }
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Deterministic frame sampling: every k-th frame index up to the
    * stub's frame count — `explode` keeps it relational.
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String, everyK: Int = 4): DataFrame =
    df.select(
      col(idCol).as("id"),
      explode(sequence(lit(0), (length(col(binCol)) % 24) , lit(everyK))).as("frame_idx"))

  /** Deterministic "resize": truncate/refill the fake plane to the target
    * box — per-row, codegen-unfriendly by nature (binary transform), so
    * it lives behind the same partition-batch shape.
    */
  def resize(df: DataFrame, idCol: String, binCol: String, w: Int, h: Int): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("resized", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val rows = df.queryExecution.toRdd.mapPartitions { it =>
      it.map { internal =>
        val bytes = internal.getBinary(binIdx)
        val safe = if (bytes == null || bytes.isEmpty) Array[Byte](0) else bytes
        Row(internal.getLong(idIdx), StubCodec.decode(safe, w, h).take(w * h))
      }
    }
    spark.createDataFrame(rows, outSchema)
  }
}
