package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed sink's contract is the PLAN it buys downstream: a join
  * of two tables bucketed compatibly on the join key must not plan any
  * Exchange (the shuffle was pre-paid at write time), and the results
  * must equal the plain join exactly.
  */
class BucketedStoreSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("compatibly bucketed tables join with zero exchanges, same result") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")

    BucketedStore.write(orders, "bs_orders", tmp("bs_orders"), "o_orderkey", 4)
    BucketedStore.write(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "bs_lineitem", tmp("bs_lineitem"), "o_orderkey", 4)

    val joined = BucketedStore.read(spark, "bs_orders")
      .join(BucketedStore.read(spark, "bs_lineitem"), "o_orderkey")
    val p = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).length
    assert(exchanges == 0, s"bucketed join plans $exchanges exchanges:\n$p")

    val plain = orders
      .join(lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
    assert(joined.count() == plain.count())
    val a = joined.groupBy("o_orderkey").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = plain.groupBy("o_orderkey").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "bucketed join result diverges from the plain join")
  }

  test("aggregation on the bucket key also skips its exchange") {
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    BucketedStore.write(lineitem, "bs_li_agg", tmp("bs_li_agg"), "l_orderkey", 4)
    val agg = BucketedStore.read(spark, "bs_li_agg")
      .groupBy("l_orderkey").sum("l_quantity")
    val p = agg.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).length
    assert(exchanges == 0, s"bucketed aggregation plans $exchanges exchanges:\n$p")
    // spot value against the raw parquet
    val want = lineitem.groupBy("l_orderkey").sum("l_quantity").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = agg.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == want)
  }

  test("re-write replaces the table; reads see the new data") {
    val df1 = spark.range(10).toDF("k")
    val df2 = spark.range(5).toDF("k")
    val path = tmp("bs_rewrite")
    BucketedStore.write(df1, "bs_rw", path + "/v1", "k", 2)
    assert(BucketedStore.read(spark, "bs_rw").count() == 10)
    BucketedStore.write(df2, "bs_rw", path + "/v2", "k", 2)
    assert(BucketedStore.read(spark, "bs_rw").count() == 5)
  }
}
