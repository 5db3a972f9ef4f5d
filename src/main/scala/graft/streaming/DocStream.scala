package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming half of the training-data document pipeline: exact
  * deduplication at ingestion time. The batch operators
  * (graft.operators.Dedup) are the compaction path; this keeps a
  * near-real-time ingest from re-admitting content already seen within
  * the watermark horizon, with bounded state.
  */
object DocStream {

  /** Keep the first occurrence of each content hash.
    * `dropDuplicatesWithinWatermark` expires dedup state once the
    * watermark passes, so state is bounded by (arrival rate × horizon) —
    * the required shape for an unbounded 100 TB/day ingest. Duplicates
    * arriving later than the horizon are admitted here and removed by
    * the batch exact-dedup compaction.
    */
  def dedupDocuments(
      stream: DataFrame,
      textCol: String,
      tsCol: String,
      watermark: String = "1 hour",
  ): DataFrame =
    stream
      .withColumn("content_hash", md5(col(textCol).cast("binary")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")
}
