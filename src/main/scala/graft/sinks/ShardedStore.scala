package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Packing

/** Token-balanced training-shard layout: split a filtered/deduped corpus
  * into `nShards` contiguous shards of ≈ equal TOKEN mass (not row
  * count — documents vary 100× in length, so row-balanced shards give
  * token-skewed training files), written as one Hive partition directory
  * per shard. This is the final "materialize the training set" step of a
  * data pipeline: downstream loaders stream shard directories
  * independently, so equal token mass = equal work per reader.
  *
  * Assignment is a pure function of corpus content: with `T` total
  * tokens and exclusive prefix `excl(d)` in `idCol` order (the two-phase
  * parallel scan of [[graft.operators.Packing.globalExclusivePrefix]] —
  * no single-task window), a document's LAST token position decides its
  * shard: `shard = min(((excl + max(n,1) − 1) · nShards) div T,
  * nShards − 1)`. Contiguity in id order makes the split reproducible
  * and keeps each shard's id range disjoint; the boundary error per
  * shard is bounded by the longest single document, which is the best
  * any document-atomic split can do. Token-free documents ride their
  * prefix position. All arithmetic is integer (`div`), so any SQL engine
  * replays the assignment bit-exactly past 2^53 tokens.
  *
  * Scale: one range shuffle + one scan for the prefix, one hash join to
  * re-attach payload columns (id-keyed, spills fine), one partitioned
  * write. Driver state is O(partitions).
  */
object ShardedStore {

  /** (id, n_tokens, shard) for every row — the assignment alone. */
  def assignShards(
      df: DataFrame,
      idCol: String,
      tokenExpr: Column,
      nShards: Int,
      partitions: Int = 0,
  ): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val prefix = Packing.globalExclusivePrefix(df, idCol, tokenExpr, partitions)
    // grand total = the last document's inclusive prefix; a bounded
    // single-row aggregation, not a second corpus pass (prefix is
    // checkpointed by globalExclusivePrefix's contract)
    val totalRow = prefix.agg(max(col("excl_tokens") + col("n_tokens"))).head
    val total = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
    if (total <= 0)
      // token-free corpus: everything lands in shard 0
      prefix.select(col("id"), col("n_tokens"), lit(0).cast("int").as("shard"))
    else
      prefix.select(
        col("id"),
        col("n_tokens"),
        least(
          expr(s"((excl_tokens + greatest(n_tokens, 1L) - 1L) * ${nShards}L) div ${total}L"),
          lit(nShards - 1L)).cast("int").as("shard"))
  }

  /** Assign shards and write the FULL rows Hive-partitioned by shard;
    * returns the per-shard (shard, n_docs, n_tokens) summary read back
    * from the written layout (so the summary proves the files, not the
    * plan).
    */
  def write(
      df: DataFrame,
      idCol: String,
      tokenExpr: Column,
      nShards: Int,
      path: String,
  ): DataFrame = {
    // the join below would otherwise produce two ambiguous 'shard'
    // columns and fail at partitionBy time with an opaque error
    require(!df.columns.contains("shard"),
      "input already has a 'shard' column — rename it before ShardedStore.write " +
        "(the sink owns that name for the partition layout)")
    val assigned = assignShards(df, idCol, tokenExpr, nShards)
      .withColumnRenamed("id", idCol)
      .drop("n_tokens")
    df.join(assigned, Seq(idCol))
      .write.partitionBy("shard").mode("overwrite").parquet(path)
    read(df.sparkSession, path, tokenExpr)
  }

  /** Per-shard summary of a written layout. */
  def read(spark: SparkSession, path: String, tokenExpr: Column): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("shard").cast("int").as("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokenExpr.cast("long")).as("n_tokens"))
}
