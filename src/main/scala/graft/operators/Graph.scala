package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge list — the link-centrality
  * signal a web-scale training-data pipeline uses to weight or filter
  * crawled documents (OPIC/Common-Crawl-style host ranking).
  *
  * All arithmetic is INTEGER, in micro-rank units: every node starts at
  * 1 000 000 µ; one iteration sends each node's `rank div out_degree`
  * along its out-edges and re-ranks every node as
  * `150 000 + (850 · Σ incoming) div 1000` (damping 0.85 with the same
  * truncating division on both engines). Integer sums are associative
  * and order-independent, so the result is bit-reproducible by any SQL
  * engine — no floating-point accumulation-order drift, which is the
  * classic obstacle to verifying iterative graph jobs across engines.
  *
  * Scale: the edge list is hash-partitioned ON THE SOURCE KEY once,
  * joined each iteration against the (much smaller) rank table — the
  * standard Pregel-lite DataFrame pattern. Per iteration: one shuffle of
  * the rank table to the edge partitioning (skipped outright while the
  * measured node count fits the broadcast threshold) + one
  * map-side-combined aggregation by destination; the big edge relation
  * never re-shuffles. Iterations chain lazily into one job; a periodic
  * eager checkpoint bounds lineage for long runs. Iteration count is
  * fixed (not convergence-tested) — the production norm for
  * rank-as-feature pipelines.
  */
object Graph {

  /** `iterations` PageRank rounds over `edges` (`src`, `dst` columns;
    * every node must appear as a source — symmetrize first for
    * undirected graphs, which also removes dangling nodes). Returns
    * (nid, rank_micro).
    */
  def pageRankMicro(
      spark: SparkSession,
      edges: DataFrame,
      iterations: Int,
      dampingBp: Int = 850,
  ): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    require(dampingBp >= 0 && dampingBp <= 1000, s"dampingBp in [0,1000]: $dampingBp")
    val restMicro = (1000 - dampingBp) * 1000L

    // out-degree rides with every edge so an iteration needs no second
    // join; partition the (big, loop-invariant) relation by the join key
    // once and reuse that exchange every round
    @inline def timed[A](label: String)(body: => A): A =
      graft.util.Spark.timed("pagerank-profile", label)(body)
    val outDeg = edges.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
    val edgesWithDeg = edges
      .join(outDeg, "src")
      .repartition(col("src"))
      .persist()
    // one job measures BOTH the size and the local-path preconditions
    // (null ids would be dropped by the cast/getLong collect but form
    // real null-key groups in the distributed rounds — such graphs must
    // never take the local path)
    val prep = timed("edges prep") {
      edgesWithDeg.agg(count(lit(1)), count(col("src")), count(col("dst"))).head
    }
    val edgeCount = prep.getLong(0)
    val noNullIds = prep.getLong(1) == edgeCount && prep.getLong(2) == edgeCount

    // Provably-small graphs iterate DRIVER-SIDE: at low edge counts the
    // distributed loop is pure per-stage scheduling latency (each round
    // is a broadcast build + an aggregation over kilobytes), the
    // localTauGraph pattern. Same integer arithmetic — long sums are
    // order-independent and `div` truncates identically — so results
    // are bit-equal to the distributed rounds; the threshold is a
    // measured count with a conf override, so the 100 TB shape never
    // takes this path. Guarded to graphs the long-keyed driver loop
    // provably reproduces: integral id columns, no null ids (the
    // operator's documented contract is just "src, dst columns", so a
    // string-keyed or nullable graph falls through to the distributed
    // rounds, which handle any equi-joinable type). Default bound 2M
    // edges = 48 MB as three primitive long arrays — a driver-heap
    // budget, not a local-mode constant.
    val localMax = spark.conf
      .getOption("spark.graft.pagerank.localMaxEdges").map(_.toLong)
      .getOrElse(2000000L)
    val srcType = edgesWithDeg.schema("src").dataType
    val integralIds = Seq(srcType, edgesWithDeg.schema("dst").dataType).forall {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    if (edgeCount <= localMax && integralIds && noNullIds) {
      // primitive columns, not boxed tuples: the boxed (Long,Long,Long)
      // array tripled the resident footprint and lived for the whole
      // iteration loop
      val nE = edgeCount.toInt
      val srcA = new Array[Long](nE); val dstA = new Array[Long](nE)
      val degA = new Array[Long](nE)
      timed("local edges collect") {
        val it = edgesWithDeg.select(
          col("src").cast("long"), col("dst").cast("long"), col("out_deg")).collect()
        var i = 0
        while (i < nE) {
          val r = it(i); srcA(i) = r.getLong(0); dstA(i) = r.getLong(1)
          degA(i) = r.getLong(2); i += 1
        }
      }
      val out = timed("local iterations") {
        // rank map mirrors the distributed rounds exactly: the first
        // table is every distinct source at 1_000_000µ, and after each
        // round only nodes that RECEIVED contributions carry a rank
        // (the groupBy(dst) semantics)
        var rank: scala.collection.Map[Long, Long] = {
          val m = scala.collection.mutable.HashMap.empty[Long, Long]
          var i = 0
          while (i < nE) { m.update(srcA(i), 1000000L); i += 1 }
          m
        }
        for (_ <- 1 to iterations) {
          val acc = scala.collection.mutable.HashMap.empty[Long, Long]
          var i = 0
          while (i < nE) {
            rank.get(srcA(i)).foreach { r =>
              acc.update(dstA(i), acc.getOrElse(dstA(i), 0L) + r / degA(i))
            }
            i += 1
          }
          acc.mapValuesInPlace((_, s) => restMicro + dampingBp * s / 1000L)
          rank = acc
        }
        import spark.implicits._
        rank.toSeq.toDF("nid", "rank_micro")
          .select(col("nid").cast(srcType).as("nid"), col("rank_micro"))
      }
      edgesWithDeg.unpersist(blocking = false)
      return out
    }

    // Small rank tables broadcast into the edge join (one shuffle per
    // iteration — the dst aggregation — instead of two); past the
    // threshold the shuffled join takes over. Node count is measured,
    // not assumed, and the default threshold (5M nodes ≈ ~100 MB built)
    // is a broadcast-sized bound, so the 100 TB shape degrades
    // gracefully rather than relying on a local-mode assumption.
    val nodeCount = timed("nodeCount") { edgesWithDeg.select(col("src")).distinct().count() }
    val broadcastMaxNodes = spark.conf
      .getOption("spark.graft.pagerank.broadcastMaxNodes").map(_.toLong)
      .getOrElse(5000000L)
    val bcastRanks = nodeCount <= broadcastMaxNodes
    // Iterations chain LAZILY: each round's only consumer is the next
    // round, so one action at the end runs the whole chain as one job
    // (per-iteration eager persist+count paid a scheduling barrier and
    // a cache write per round for results nothing read twice). Lineage
    // stays bounded for long runs by a periodic eager checkpoint.
    // When rounds broadcast, every un-checkpointed level nests another
    // resident BroadcastExchange (and the outermost build must finish
    // the whole inner chain inside spark.sql.broadcastTimeout) — so the
    // checkpoint cadence TIGHTENS as the measured node count approaches
    // the broadcast bound: ≤3 nested ~100 MB broadcasts near the bound,
    // the full 10 only when each broadcast is provably small.
    val ckptEvery =
      if (!bcastRanks) 10
      else math.max(3, (10L * broadcastMaxNodes / math.max(1L, nodeCount * 3L)).toInt.min(10))
    var ranks = edgesWithDeg
      .select(col("src").as("nid"), lit(1000000L).as("rank_micro"))
      .distinct()
    for (i <- 1 to iterations) {
      val r = if (bcastRanks) broadcast(ranks) else ranks
      ranks = edgesWithDeg
        .join(r, edgesWithDeg("src") === r("nid"))
        .select(col("dst"), expr("rank_micro div out_deg").as("contrib"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("s"))
        .select(col("dst").as("nid"),
          (lit(restMicro) + expr(s"($dampingBp * s) div 1000")).as("rank_micro"))
      if (i % ckptEvery == 0 && i < iterations) ranks = graft.util.Spark.checkpoint(ranks)
    }
    // materialize before releasing the edge cache the chain reads
    val out = timed("iteration chain") { graft.util.Spark.checkpoint(ranks) }
    edgesWithDeg.unpersist(blocking = false)
    out
  }

  /** The part↔supplier co-purchase graph from `lineitem`, symmetrized:
    * node ids are `l_partkey·2` and `l_suppkey·2+1` (disjoint id
    * spaces), one undirected edge per distinct (part, supplier) pair.
    */
  def partSupplierEdges(lineitem: DataFrame): DataFrame = {
    val pairs = lineitem
      .select((col("l_partkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(pairs.select(col("b").as("src"), col("a").as("dst")))
  }
}
