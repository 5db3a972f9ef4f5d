package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite with SparkSpec {

  test("zValue interleaves bits: x at even positions, y at odd") {
    import spark.implicits._
    // x=0b11, y=0b01 -> z = x0 + 2*y0 + 4*x1 + 8*y1 = 1+2+4+0 = 7
    val df = Seq((3L, 1L), (0L, 0L), (3L, 3L), (2L, 1L)).toDF("x", "y")
    val z = df.select(ZOrder.zValue(Seq(col("x"), col("y")), 2).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(z == Seq(7L, 0L, 15L, 6L))
  }

  test("minMaxBucket maps the range onto [0, 2^bits) monotonically") {
    import spark.implicits._
    val df = Seq(10L, 11L, 50L, 109L, 110L).toDF("v")
    val b = df.select(ZOrder.minMaxBucket("v", 10L, 110L, 4).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(b.head == 0L && b.last == 15L)
    assert(b == b.sorted && b.forall(x => x >= 0 && x < 16))
  }

  test("minMaxBucket survives full-width ranges (snowflake ids / epoch micros) without overflow") {
    import spark.implicits._
    // range straddles zero at nearly full long width: (v-min)*2^bits
    // would overflow, and max-min itself wraps — the pre-shift path
    val lo = Long.MinValue + 7L
    val hi = Long.MaxValue - 3L
    val vs = Seq(lo, lo / 2, -1L, 0L, 1L, hi / 2, hi)
    val b = vs.toDF("v").select(ZOrder.minMaxBucket("v", lo, hi, 16).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(b.forall(x => x >= 0 && x < (1L << 16)), s"buckets out of range: $b")
    assert(b == b.sorted, s"not monotone: $b")
    assert(b.head == 0L && b.last == (1L << 16) - 1)
    // and a realistic epoch-micros year at 16 bits stays exact long math
    val us0 = 1704067200000000L
    val us = Seq(us0, us0 + 86400000000L * 120, us0 + 86400000000L * 365)
    val bu = us.toDF("v")
      .select(ZOrder.minMaxBucket("v", us.head, us.last, 16).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(bu == bu.sorted && bu.head == 0L && bu.last == (1L << 16) - 1)
  }

  test("cluster rejects an empty input loudly instead of NPEing on null ranges") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    intercept[IllegalArgumentException](ZOrder.cluster(empty, Seq("x", "y"), 4, 2))
  }

  test("cluster is lossless and narrows per-file ranges in BOTH dimensions") {
    import spark.implicits._
    // a 64x64 grid: ranges are uniform in both dims
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    ZOrder.write(grid, Seq("x", "y"), bits = 6, numFiles = 16, path = dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 64L * 64L)
    assert(back.select(sum(col("x") * lit(64L) + col("y"))).head().getLong(0)
      == grid.select(sum(col("x") * lit(64L) + col("y"))).head().getLong(0))
    // per-file spans: a z-clustered 64x64 grid into 16 files gives each
    // file a region ~1/4 of the range in EACH dimension; an x-sorted
    // layout would leave the y span at the full 64 in every file
    val spans = back.groupBy(input_file_name().as("f"))
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .collect()
    assert(spans.length == 16)
    val avgSx = spans.map(_.getAs[Long]("sx")).sum.toDouble / spans.length
    val avgSy = spans.map(_.getAs[Long]("sy")).sum.toDouble / spans.length
    assert(avgSx < 32 && avgSy < 32, s"avg spans: $avgSx x $avgSy")
  }
}
