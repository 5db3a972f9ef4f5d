package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval × point range join ("which events fall inside this window")
  * — the temporal-containment primitive behind incident attribution,
  * ad/conversion windows, and interval features.
  *
  * Spark plans an inequality-only join as BroadcastNestedLoopJoin —
  * all-pairs per key, quadratic and memory-unbounded. This is the
  * bucketized formulation instead: time is cut into fixed `bucketUs`
  * buckets, each interval is exploded onto the buckets it covers, each
  * point lands in exactly ONE bucket, and the join becomes a plain hash
  * equi-join on (key, bucket) + an exact containment filter. Because a
  * point has one bucket, a (interval, point) pair can only meet once —
  * no post-join dedup. Cost: the equi-join's shuffle, an expansion
  * factor of `len/bucketUs + 1` rows per interval, and a codegen'd
  * filter; at any scale the planner sees ordinary equi-join cardinality,
  * never an all-pairs blob. Pick `bucketUs` near the typical interval
  * length (expansion then ≈ 2×).
  *
  * Bucket ids use exact integer floor-division (`a - pmod(a,b)` is
  * divisible by `b`), so pre-epoch timestamps bucket correctly and the
  * same arithmetic is reproducible in any SQL engine.
  */
object RangeJoin {

  private def floorDiv(a: Column, b: Long): Column =
    (a - pmod(a, lit(b))) / lit(b)

  /** Inner containment matches: one output row per (interval row, point
    * row) with `startCol <= tsCol <= endCol` and equal `keyCol`. Output
    * carries all interval columns plus all point columns (minus the
    * point's copy of the key); the two inputs must not share other
    * column names. `startCol`/`endCol`/`tsCol` are epoch-micros longs.
    */
  def pointsInIntervals(
      intervals: DataFrame,
      points: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String,
      tsCol: String,
      bucketUs: Long,
  ): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    val overlap = intervals.columns.toSet.intersect(points.columns.toSet) - keyCol
    require(overlap.isEmpty, s"inputs share non-key columns: ${overlap.mkString(", ")}")

    val ivB = intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn("graft_bucket",
        explode(sequence(
          floorDiv(col(startCol), bucketUs).cast("long"),
          floorDiv(col(endCol), bucketUs).cast("long"))))
    val ptB = points
      .withColumn("graft_bucket", floorDiv(col(tsCol), bucketUs).cast("long"))

    ivB
      .join(ptB, Seq(keyCol, "graft_bucket"))
      .filter(col(tsCol).between(col(startCol), col(endCol)))
      .drop("graft_bucket")
  }

  /** Left-outer match counts: every interval row with the number of
    * contained points (0 when none). `pointIdCol` is only counted, so
    * any non-null point column works.
    */
  def countPointsInIntervals(
      intervals: DataFrame,
      points: DataFrame,
      keyCol: String,
      intervalIdCol: String,
      startCol: String,
      endCol: String,
      tsCol: String,
      pointIdCol: String,
      bucketUs: Long,
  ): DataFrame = {
    val counts = pointsInIntervals(intervals, points, keyCol, startCol, endCol, tsCol, bucketUs)
      .groupBy(intervalIdCol)
      .agg(count(col(pointIdCol)).as("graft_n_points"))
    intervals
      .join(counts, Seq(intervalIdCol), "left")
      .withColumn("n_points", coalesce(col("graft_n_points"), lit(0L)))
      .drop("graft_n_points")
  }
}
