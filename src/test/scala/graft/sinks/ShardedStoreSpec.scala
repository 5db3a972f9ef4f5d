package graft.sinks

import graft.SparkSpec
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ShardedStoreSpec extends AnyFunSuite with SparkSpec {

  // 60 docs with irregular token counts (7i mod 13 + 1, max 13) —
  // deliberately NOT aligned with any shard boundary
  private def corpus = {
    import spark.implicits._
    (0 until 60).map { i =>
      val n = (i * 7) % 13 + 1
      (i.toLong, Seq.fill(n)("tok").mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("shards are contiguous in id order and token-balanced to within one document per boundary") {
    val df = corpus
    val a = ShardedStore.assignShards(df, "doc_id", TextAnalysis.tokenCountExpr(col("text")), 4)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(a.length == 60)
    // contiguity: shard ids never decrease along the id order
    assert(a.sliding(2).forall { case Array(x, y) => x._3 <= y._3 }, "non-contiguous shards")
    assert(a.map(_._3).distinct.sorted.sameElements(Array(0, 1, 2, 3)), "all shards populated")
    // balance: a document-atomic split can miss the target by at most
    // one document per boundary — assert within 2 · longest doc
    val byShard = a.groupBy(_._3).view.mapValues(_.map(_._2).sum)
    val total = a.map(_._2).sum
    val maxDoc = a.map(_._2).max
    val target = total / 4
    byShard.foreach { case (s, t) =>
      assert(math.abs(t - target) <= 2 * maxDoc,
        s"shard $s carries $t tokens vs target $target (maxDoc $maxDoc)")
    }
  }

  test("assignment is independent of input partitioning") {
    val df = corpus
    def run(parts: Int) =
      ShardedStore.assignShards(
        df.repartition(parts), "doc_id", TextAnalysis.tokenCountExpr(col("text")), 4)
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(run(1) == run(7))
  }

  test("token-free documents ride their prefix position; token-free corpus lands in shard 0") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, ""),                    // excl = 10 of 20 → shard 1 of 2
      (3L, "k l m n o p q r s t"),
    ).toDF("doc_id", "text")
    val a = ShardedStore.assignShards(df, "doc_id", TextAnalysis.tokenCountExpr(col("text")), 2)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(a == Map(1L -> 0, 2L -> 1, 3L -> 1))
    val empty = Seq((1L, ""), (2L, "  ")).toDF("doc_id", "text")
    val e = ShardedStore.assignShards(empty, "doc_id", TextAnalysis.tokenCountExpr(col("text")), 4)
      .collect().map(_.getInt(2)).toSet
    assert(e == Set(0))
  }

  test("write: layout is lossless, hive-partitioned by shard, summary matches assignment") {
    val df = corpus
    val base = java.nio.file.Files.createTempDirectory("graft_shard_spec").toString
    val summary = ShardedStore.write(
      df, "doc_id", TextAnalysis.tokenCountExpr(col("text")), 4, s"$base/out")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // summary totals cover the whole corpus
    val totalTokens = df.select(sum(TextAnalysis.tokenCountExpr(col("text")))).head.getLong(0)
    assert(summary.map(_._2).sum == 60L)
    assert(summary.map(_._3).sum == totalTokens)
    // directory layout: one shard=N directory per shard
    val dirs = new java.io.File(s"$base/out").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.sameElements(Array("shard=0", "shard=1", "shard=2", "shard=3")))
    // losslessness: reading the layout back returns the exact corpus
    val back = spark.read.parquet(s"$base/out")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val orig = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == orig)
    // summary ≡ independent recomputation from the assignment
    val a = ShardedStore.assignShards(df, "doc_id", TextAnalysis.tokenCountExpr(col("text")), 4)
      .collect().map(r => (r.getInt(2), r.getLong(1)))
    val expect = a.groupBy(_._1).map { case (s, xs) =>
      (s, xs.length.toLong, xs.map(_._2).sum)
    }.toSeq.sortBy(_._1)
    assert(summary.toSeq == expect)
  }
}
