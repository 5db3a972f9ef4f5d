package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized DIFFERENTIAL test of the whole index lifecycle: two
  * indexes built identically (deterministic training → same frozen
  * model) receive the same MEMBERSHIP ops (append / delete / re-add),
  * but only one of them additionally runs random MAINTENANCE
  * (compact / split / merge / vacuum). Because plain-layout maintenance
  * is content-lossless — codes quantize raw vectors and move unchanged,
  * only list assignment and file layout churn — a full-probe query is a
  * pure function of (frozen model, live membership): after EVERY op the
  * maintained index must serve bit-equal to its maintenance-free twin,
  * and both must hold exactly the naive live count. Random op
  * sequences reach interleavings (split after delete, merge over a
  * re-added row's list, vacuum between) that fixed scenarios miss.
  */
class AnnIndexLifecycleSpec extends AnyFunSuite with SparkSpec {

  private lazy val emb: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def tmpIdx(): String =
    java.nio.file.Files.createTempDirectory("graft_annlife").toString + "/idx"

  test("random maintenance interleavings never change what a full probe serves") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val base = emb.select(col("vec_id").cast("long"),
      col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val vecOf = scala.collection.mutable.Map(base: _*)
    val live = scala.collection.mutable.Set(base.map(_._1): _*)
    val deleted = scala.collection.mutable.Set.empty[Long]
    var nextId = base.map(_._1).max + 1

    val a = tmpIdx() // gets membership ops AND maintenance
    val b = tmpIdx() // membership ops only
    AnnIndex.build(emb, "vec_id", "embedding", a)
    AnnIndex.build(emb, "vec_id", "embedding", b)

    def corpusDf: DataFrame = vecOf.toSeq.toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 5)
    def serve(p: String): Set[(Long, Long)] =
      AnnIndex.topK(spark, p, queries, "vec_id", "embedding",
        k = 5, nProbe = 999)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def total(p: String): Long =
      AnnIndex.stats(spark, p).agg(sum(col("n_vectors"))).head.getLong(0)

    var lastOp = "build"
    (1 to 14).foreach { step =>
      val op = rnd.nextInt(7)
      op match {
        case 0 => // append fresh ids (vectors reused from the corpus)
          val fresh = (1 to 3).map { _ =>
            val id = nextId; nextId += 1
            val v = vecOf(base(rnd.nextInt(base.length))._1)
            vecOf(id) = v; live += id
            (id, v)
          }
          val df = fresh.toDF("vec_id", "embedding")
          AnnIndex.append(df, "vec_id", "embedding", a)
          AnnIndex.append(df, "vec_id", "embedding", b)
          lastOp = s"append ${fresh.map(_._1).mkString(",")}"
        case 1 => // delete random live ids
          val doomed = rnd.shuffle(live.toSeq).take(2)
          if (doomed.nonEmpty) {
            AnnIndex.delete(spark, a, doomed)
            AnnIndex.delete(spark, b, doomed)
            live --= doomed; deleted ++= doomed
            lastOp = s"delete ${doomed.mkString(",")}"
          }
        case 2 => // re-add a deleted id with its original vector
          deleted.headOption.foreach { id =>
            val df = Seq((id, vecOf(id))).toDF("vec_id", "embedding")
            AnnIndex.append(df, "vec_id", "embedding", a)
            AnnIndex.append(df, "vec_id", "embedding", b)
            deleted -= id; live += id
            lastOp = s"readd $id"
          }
        case 3 =>
          AnnIndex.compact(spark, a); lastOp = "compact"
        case 4 =>
          val hot = AnnIndex.hottestList(spark, a)
          AnnIndex.split(spark, a, hot, 2, corpusDf, "vec_id", "embedding")
          lastOp = s"split $hot"
        case 5 =>
          val cold = AnnIndex.coldestLists(spark, a, 2)
          if (cold.size == 2) {
            AnnIndex.merge(spark, a, cold); lastOp = s"merge $cold"
          }
        case 6 =>
          AnnIndex.vacuum(spark, a, graceMs = 0L); lastOp = "vacuum"
      }
      val (ta, tb) = (total(a), total(b))
      assert(ta == live.size && tb == live.size,
        s"step $step ($lastOp): totals a=$ta b=$tb naive=${live.size}")
      val (sa, sb) = (serve(a), serve(b))
      assert(sa == sb,
        s"step $step ($lastOp): maintained index diverged from its twin\n" +
          s"only-a=${(sa -- sb).toSeq.sorted} only-b=${(sb -- sa).toSeq.sorted}")
      assert(sa.forall(p => live.contains(p._2)),
        s"step $step ($lastOp): served a non-live neighbor")
    }
    // end state is healthy on both sides
    Seq(a, b).foreach { p =>
      val bad = AnnIndex.fsck(spark, p).collect().filter(_.getString(1) == "ERROR")
      assert(bad.isEmpty, s"$p unhealthy: ${bad.mkString("; ")}")
    }
  }
}
