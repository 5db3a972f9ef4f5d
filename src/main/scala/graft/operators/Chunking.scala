package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window chunking: split each document's token sequence into
  * overlapping fixed-length windows — the long-document counterpart of
  * [[Packing]]'s short-document budget packing. A pretraining pipeline
  * runs one or the other (or both) to shape filtered text into
  * max-sequence-length training rows; the overlap (`maxLen - stride`)
  * preserves cross-boundary context the hard cut would destroy.
  *
  * Window layout per document of `n` tokens: starts at `0, stride,
  * 2·stride, …`; every chunk spans `min(maxLen, n - start)` tokens; the
  * sequence stops with the first window that reaches the end of the
  * document (`start + maxLen >= n`), so no fully-redundant suffix
  * windows are emitted and every token appears in at least one chunk.
  * Chunk count = `ceil(max(n - maxLen, 0) / stride) + 1` — closed-form,
  * which is what the SQL oracle recomputes.
  *
  * Scale: pure Catalyst expressions — `split` → `sequence` over the
  * chunk indices → `transform`/`slice`/`array_join` → one `explode` —
  * a codegen'd scan-level projection with no shuffle, no UDF, and no
  * driver participation; Parquet pruning reaches the text column scan.
  * Output size is bounded by `n/stride` rows per document (the same
  * expansion any chunker pays), produced streaming inside the scan
  * rather than materialized per document.
  */
object Chunking {

  /** One row per (document, window): `doc_id, chunk_idx, start_token,
    * n_tokens, chunk_text`.
    */
  def slidingWindows(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxLen: Int,
      stride: Int,
  ): DataFrame = {
    require(maxLen > 0, "maxLen must be positive")
    require(stride > 0 && stride <= maxLen, "stride must be in (0, maxLen]")
    val toks: Column = split(col(textCol), " ")
    val n: Column = size(toks)
    // ceil(max(n - maxLen, 0) / stride) + 1, in integer arithmetic
    val nChunks: Column =
      (greatest(n - maxLen, lit(0)) + lit(stride - 1)) / lit(stride) + lit(1)
    df.select(
        col(idCol).as("doc_id"),
        toks.as("toks"),
        explode(sequence(lit(0), nChunks.cast("int") - lit(1))).as("chunk_idx"))
      .select(
        col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        (col("chunk_idx") * stride).cast("long").as("start_token"),
        least(lit(maxLen), size(col("toks")) - col("chunk_idx") * stride)
          .cast("long").as("n_tokens"),
        array_join(
          slice(col("toks"), col("chunk_idx") * stride + 1, lit(maxLen)),
          " ").as("chunk_text"))
  }
}
