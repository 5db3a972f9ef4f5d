package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite with SparkSpec {

  private def skewed() = {
    import spark.implicits._
    // one hot key (90% of rows) + a cold tail
    val rows = (1L to 900L).map(i => (i, "hot", (i % 37).toDouble - 5.0)) ++
      (901L to 1000L).map(i => (i, s"cold${i % 7}", i.toDouble / 3.0))
    rows.toDF("id", "key", "value")
  }

  test("salted stats equal the plain single-phase aggregation bit-for-bit") {
    val df = skewed()
    for (nSalts <- Seq(1, 4, 16)) {
      val salted = Skew.saltedStats(df, "key", "value", saltFrom = "id", nSalts = nSalts)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .sortBy(_._1)
      val plain = Skew.plainStats(df, "key", "value")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .sortBy(_._1)
      assert(salted.toSeq == plain.toSeq, s"nSalts=$nSalts")
    }
  }

  test("the salted plan is two exchanges: hash(key, salt) then hash(key)") {
    val q = Skew.saltedStats(skewed(), "key", "value", saltFrom = "id", nSalts = 8)
    val plan = q.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).toSeq
    assert(exchanges.size == 2, plan)
    assert(plan.contains("graft_salt"), plan)
  }

  test("salted join equals the plain join and spreads the hot key") {
    import org.apache.spark.sql.functions.col
    val fact = skewed()
    val dim = Skew.plainStats(fact, "key", "value").select(col("key"), col("n_rows"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val salted = Skew.saltedJoin(fact, dim, "key", saltFrom = "id", nSalts = 8)
      val plain = fact.join(dim, "key")
      assert(salted.columns.toSet == plain.columns.toSet)
      val s = salted.select("id", "key", "n_rows").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
      val p = plain.select("id", "key", "n_rows").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
      assert(s.toSeq == p.toSeq)
      // the join key really is (key, salt): both appear in the join plan
      val plan = salted.queryExecution.executedPlan.toString
      assert(plan.contains("graft_salt"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("phase-1 output is bounded by keys x salts, not by row skew") {
    val df = skewed()
    val nSalts = 8
    val partials = df
      .withColumn("graft_salt",
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.hash(org.apache.spark.sql.functions.col("id")),
          org.apache.spark.sql.functions.lit(nSalts)))
      .groupBy("key", "graft_salt").count()
    val nKeys = df.select("key").distinct().count()
    assert(partials.count() <= nKeys * nSalts)
    // the hot key really does spread across salts
    val hotSalts = partials.filter("key = 'hot'").count()
    assert(hotSalts == nSalts)
  }
}
