package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** EventTime must normalize every ts encoding the driver corpus has
  * shipped (int64 nanos, TIMESTAMP_NTZ micros, plain TIMESTAMP) to the
  * same session-zoned TIMESTAMP values.
  */
class EventTimeSpec extends AnyFunSuite with SparkSpec {

  // 2026-01-02 03:04:05.123456 UTC
  private val us = 1767323045123456L

  test("int64-nanos, NTZ-micros, and TZ columns normalize to identical instants") {
    import spark.implicits._
    val fromNanos = EventTime.normalize(
      Seq(us * 1000L).toDF("ts")) // LongType = nanos-as-long read
    val fromNtz = EventTime.normalize(
      Seq(us).toDF("u").select(expr("timestamp_micros(u)").cast(TimestampNTZType).as("ts")))
    val fromTz = EventTime.normalize(
      Seq(us).toDF("u").select(expr("timestamp_micros(u)").as("ts")))

    for (df <- Seq(fromNanos, fromNtz, fromTz)) {
      assert(df.schema("ts").dataType == TimestampType)
      assert(df.select(expr("unix_micros(ts)")).as[Long].head() == us)
    }
  }

  test("sub-microsecond nanos truncate like the oracle (floor division)") {
    import spark.implicits._
    val df = EventTime.normalize(Seq(us * 1000L + 999L).toDF("ts"))
    assert(df.select(expr("unix_micros(ts)")).as[Long].head() == us)
  }

  test("an unsupported ts type is rejected, not silently passed through") {
    import spark.implicits._
    intercept[IllegalArgumentException](EventTime.normalize(Seq("oops").toDF("ts")))
  }

  test("the streaming reader derives its DDL from the probed batch schema") {
    // the live corpus: whatever encoding it currently has must stream
    val stream = EventTime.readStreamEvents(spark, "/root/testdata/sf0.001")
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType == TimestampType)
    // and agree with the batch read on the same data
    val batch = EventTime.readBatch(spark, "/root/testdata/sf0.001")
    assert(batch.schema("ts").dataType == TimestampType)
  }
}
