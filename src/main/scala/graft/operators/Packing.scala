package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing: assign each document to a fixed token-budget
  * training chunk — the "concatenate the corpus, split every N tokens"
  * step an LLM pretraining pipeline runs after filtering/dedup. A
  * document's chunk is `floor(exclusive_prefix_tokens / budget)` in
  * global `idCol` order, so the assignment is a pure function of the
  * corpus content — independent of partitioning, cluster size, or run.
  *
  * Scale design: a global prefix sum via one `Window.orderBy` would
  * funnel the corpus through a SINGLE task (Spark warns WindowExec "No
  * Partition Defined"). Instead the classic two-phase parallel scan:
  *
  *   1. range-partition by id (contiguous id ranges per partition) and
  *      sort within partitions — one shuffle, all partitions parallel;
  *   2. per-partition exclusive running sum in one `mapPartitions`
  *      pass (one of the rare per-partition-imperative cases — a
  *      window by partition id would force a second exchange);
  *   3. per-partition token totals — a count-of-partitions-sized
  *      driver collect — exclusive-scanned into offsets and broadcast-
  *      joined back by partition id (one row per partition; stage 2 is
  *      checkpointed so the totals job and the final job read one
  *      materialized layout — see the localScanned comment);
  *   4. chunk = (local prefix + partition offset) div budget — integer
  *      `div`, exact at any corpus size (double division would lose
  *      precision past 2^53 total tokens).
  *
  * The output is identical to the single-task window for any
  * partitioning, which is exactly what the spec asserts.
  */
object Packing {

  /** (id, n_tokens, chunk) for every row. `tokenExpr` must be a
    * deterministic per-row expression (e.g. the whitespace token count
    * of [[TextAnalysis.stats]], which external SQL engines reproduce
    * bit-exact).
    */
  def packByTokenBudget(
      df: DataFrame,
      idCol: String,
      tokenExpr: org.apache.spark.sql.Column,
      budget: Long,
      partitions: Int = 0,
  ): DataFrame = {
    require(budget > 0, "budget must be positive")
    globalExclusivePrefix(df, idCol, tokenExpr, partitions)
      .select(
        col("id"),
        col("n_tokens"),
        expr(s"excl_tokens div ${budget}L").as("chunk"))
  }

  /** The two-phase parallel scan itself: (id, n_tokens, excl_tokens)
    * where `excl_tokens` is the exclusive global running token sum in
    * `idCol` order — identical to a single-task `Window.orderBy` prefix
    * sum for ANY partitioning, without funneling the corpus through one
    * task. Shared by the packing and shard-balancing sinks.
    */
  def globalExclusivePrefix(
      df: DataFrame,
      idCol: String,
      tokenExpr: org.apache.spark.sql.Column,
      partitions: Int = 0,
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val parts =
      if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = df
      .select(col(idCol).cast("long").as("id"), tokenExpr.cast("long").as("n_tokens"))
      .repartitionByRange(parts, col("id"))
      .sortWithinPartitions("id")
      .as[(Long, Long)]

    // checkpointed IMMEDIATELY: pid comes from the runtime task id, which
    // is only the range-shuffle partition index while this exact stage
    // shape executes. A downstream coalesce (e.g. a caller's
    // .coalesce(1).write) would fuse the stage into fewer tasks and
    // rewrite every pid — the checkpoint freezes (pid, local_excl) as
    // data so both reads below see the one materialized layout.
    val localScanned = graft.util.Spark.checkpoint(
      ranged.mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var run = 0L
        it.map { case (id, n) =>
          val excl = run
          run += n
          (pid, id, n, excl)
        }
      }).toDF("pid", "id", "n_tokens", "local_excl")

    // partitions emitting no rows simply have no groupBy row — they
    // contribute zero tokens, so the exclusive scan skips nothing
    val totals = localScanned.groupBy("pid").agg(sum("n_tokens").as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offs = totals.map(_._2).scanLeft(0L)(_ + _).init
    val offsets = totals.map(_._1).zip(offs).toSeq.toDF("pid", "offset")

    localScanned
      .join(broadcast(offsets), "pid")
      .select(
        col("id"),
        col("n_tokens"),
        (col("local_excl") + col("offset")).as("excl_tokens"))
  }
}
