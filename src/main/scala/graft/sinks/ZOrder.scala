package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — multi-column data skipping for
  * the lake layout. Partitioning prunes ONE column's predicates;
  * sorting the files by a single column prunes that column only. At
  * 100 TB a table is queried on several columns at once ("this user
  * range, that time window"), and the fix is to sort the files along a
  * space-filling curve: interleave the bits of the filter columns so
  * rows close in ANY dimension land in few files, and every file's
  * per-column parquet min/max footer stays narrow in ALL interleaved
  * dimensions at once (the Delta/Iceberg OPTIMIZE ZORDER design).
  *
  * Everything is integer bit arithmetic on pre-bucketed values —
  * deterministic, codegen'd, reproducible by any SQL engine.
  */
object ZOrder {

  /** Interleave the low `bits` bits of each (non-negative, already
    * bucketed) column: bit b of column i lands at position b·n + i.
    * A pure expression tree of 2·bits·n shifts and masks — wholly
    * inside codegen for the bucket counts that matter (≤ 16 bits).
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, "z-ordering needs at least two columns")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits*cols must fit a long: $bits x ${cols.size}")
    val n = cols.size
    val terms = for {
      (c, i) <- cols.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Min-max bucketing to `bits` bits: `(v - min) * 2^bits div
    * (max - min + 1)` — integer-exact for integer inputs, monotone, and
    * reproducible from the same (min, max) by any engine.
    *
    * Wide ranges (epoch-micros, snowflake ids) would overflow the
    * `(v - min) * 2^bits` long product — and `maxV - minV` itself can
    * wrap when the bounds straddle zero at full width. Both are handled
    * by pre-shifting value and bounds right by the smallest `s` that
    * makes the shifted range fit `Long.MaxValue >> bits`: arithmetic
    * shift is monotone, so bucket order (the only thing z-ordering
    * needs) is preserved, and the arithmetic stays in exact longs.
    */
  def minMaxBucket(colName: String, minV: Long, maxV: Long, bits: Int): Column = {
    require(maxV >= minV, s"empty range [$minV, $maxV]")
    val range = BigInt(maxV) - BigInt(minV) // exact even across the full long width
    val safe  = BigInt(Long.MaxValue >> bits)
    var shift = 0
    while ((range >> shift) > safe) shift += 1
    val lo = minV >> shift
    val hi = maxV >> shift
    val v  = if (shift == 0) colName else s"shiftright($colName, $shift)"
    // `div` (integer division) — never fractional `/`, whose double
    // rounding would break bit-exact reproducibility on wide ranges
    expr(s"(($v - ${lo}L) * ${1L << bits}L) div ${hi - lo + 1}L")
  }

  /** Cluster `df` by the z-value of the named integer columns: bucket
    * each by its global min/max (ONE 1-row aggregate collect — bounded
    * by definition), range-partition by z into `numFiles` output splits
    * and sort each split by z. Returns the clustered frame (original
    * schema — the z column is internal); write it with any sink and the
    * parquet footers do the rest.
    */
  def cluster(df: DataFrame, colNames: Seq[String], bits: Int, numFiles: Int): DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1: $numFiles")
    // cast to long driver-side so any integral column width works
    val aggs = colNames.flatMap(c =>
      Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val ranges = df.agg(aggs.head, aggs.tail: _*).head()
    require(!ranges.isNullAt(0),
      "ZOrder.cluster needs a non-empty input (no min/max to bucket by)")
    val buckets = colNames.zipWithIndex.map { case (c, i) =>
      val (lo, hi) = (ranges.getLong(2 * i), ranges.getLong(2 * i + 1))
      minMaxBucket(c, lo, hi, bits)
    }
    df.withColumn("graft_z", zValue(buckets, bits))
      .repartitionByRange(numFiles, col("graft_z"))
      .sortWithinPartitions("graft_z")
      .drop("graft_z")
  }

  /** [[cluster]] + parquet write. */
  def write(df: DataFrame, colNames: Seq[String], bits: Int, numFiles: Int,
      path: String): Unit =
    cluster(df, colNames, bits, numFiles).write.mode("overwrite").parquet(path)
}
