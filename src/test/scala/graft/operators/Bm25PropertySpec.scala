package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence of the distributed BM25 against a naive
  * driver-side reference computing the same formula (same integer
  * corpus statistics, same IEEE arithmetic order, same micro-rounding,
  * same tie-breaks) on random small corpora — collisions in vocabulary,
  * repeated tokens, empty documents, and query docs with no shared
  * tokens are exactly the cases that find candidate-generation and
  * tie-break bugs that fixed fixtures miss.
  */
class Bm25PropertySpec extends AnyFunSuite with SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(1515L))

  // tiny vocabulary on purpose: df collisions and multi-token repeats
  private val vocab = Vector("a", "b", "c", "d", "e", "f")
  private val docGen: Gen[String] = for {
    n <- Gen.choose(0, 8)
    toks <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield toks.mkString(" ")

  private def corpusGen(max: Int): Gen[List[(Long, String)]] = for {
    n <- Gen.choose(2, max)
    docs <- Gen.listOfN(n, docGen)
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  /** The reference: the Bm25.rank formula, naively, driver-side. */
  private def naive(corpus: Seq[(Long, String)], qids: Seq[Long], topN: Int,
      k1Milli: Int = 1200, bMilli: Int = 750): Seq[(Long, Long, Long, Int)] = {
    val toks = corpus.map { case (id, t) =>
      (id, t.split(" ").filter(_.nonEmpty).toSeq)
    }.toMap
    val tf: Map[(Long, String), Long] = toks.toSeq.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (tok, g) => ((id, tok), g.size.toLong) }
    }.toMap
    val dl: Map[Long, Long] = toks.map { case (id, ts) => (id, ts.size.toLong) }
    val n = corpus.size.toLong
    val t = dl.values.sum
    val df: Map[String, Long] = tf.keys.groupBy(_._2).map { case (tok, g) => (tok, g.size.toLong) }
    val out = for {
      qid <- qids
      qtoks = toks.getOrElse(qid, Seq.empty).distinct
      cand <- corpus.map(_._1) if cand != qid
      shared = qtoks.filter(tok => tf.contains((cand, tok))) if shared.nonEmpty
    } yield {
      val score = shared.map { tok =>
        val idf = math.log((n.toDouble - df(tok) + 0.5) / (df(tok) + 0.5) + 1.0)
        val lenNorm = dl(cand).toDouble * n.toDouble / t.toDouble
        val tfd = tf((cand, tok)).toDouble
        val tfpart = (tfd * ((k1Milli + 1000).toDouble / 1000.0)) /
          (tfd + (k1Milli.toDouble / 1000.0) *
            ((1000 - bMilli).toDouble / 1000.0 +
              (bMilli.toDouble / 1000.0) * lenNorm))
        math.round(idf * tfpart * 1000000.0)
      }.sum
      (qid, cand, score)
    }
    out.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      g.sortBy { case (_, id, s) => (-s, id) }.zipWithIndex
        .take(topN).map { case ((q, id, s), i) => (q, id, s, i + 1) }
    }
  }

  test("distributed BM25 equals the naive reference on random corpora") {
    import spark.implicits._
    val cases = samples(corpusGen(10), 25)
    cases.zipWithIndex.foreach { case (corpus, ci) =>
      // corpora where every doc is empty have no token rows: the
      // operator requires a non-empty corpus, mirror that
      val qids = corpus.map(_._1).take(2)
      if (corpus.exists(_._2.nonEmpty)) {
        val got = Bm25.rank(corpus.toDF("doc_id", "text"), qids, topN = 5)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
          .toSet
        val want = naive(corpus, qids, topN = 5).toSet
        assert(got == want,
          s"case $ci: corpus=$corpus\n got=${got.toSeq.sorted}\nwant=${want.toSeq.sorted}")
      }
    }
  }

  test("full hybrid retrieval equals a naive end-to-end reference on random corpora") {
    import spark.implicits._
    // random docs + integer-valued embeddings + random weights: the
    // naive reference recomputes BOTH rankings (cosine in the kernel's
    // exact accumulation order, word-3-gram Jaccard), the per-system
    // truncation, the weighted micro-unit fusion, and the final top-k
    val caseGen = for {
      nDocs <- Gen.choose(3, 9)
      texts <- Gen.listOfN(nDocs, docGen)
      embs <- Gen.listOfN(nDocs, Gen.listOfN(4, Gen.choose(1, 3)))
      dw <- Gen.choose(0, 2500)
      sw <- Gen.choose(0, 2500)
    } yield (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) },
      embs.zipWithIndex.map { case (v, i) => (i.toLong, v.map(_.toDouble)) },
      math.max(dw, if (sw == 0) 1 else dw), sw)

    def cosine(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.size) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def shingles(t: String): Set[String] = {
      val ts = t.split(" ").filter(_.nonEmpty)
      if (ts.length < 3) Set.empty
      else ts.sliding(3).map(_.mkString(" ")).toSet
    }

    samples(caseGen, 20).zipWithIndex.foreach { case ((docs, embs, dw, sw), ci) =>
      val topN = 4
      val k = 3
      val qids = Seq(0L, 1L)
      val got = Hybrid.retrieve(docs.toDF("doc_id", "text"),
        embs.toDF("vec_id", "embedding"), qids, k = k, topN = topN,
        denseWeightMilli = dw, sparseWeightMilli = sw)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

      val embOf = embs.toMap
      val shOf = docs.map { case (id, t) => (id, shingles(t)) }.toMap
      val want = qids.flatMap { q =>
        val dense = embs.map(_._1).filter(_ != q)
          .map(id => (id, cosine(embOf(q), embOf(id))))
          .sortBy { case (id, s) => (-s, id) }.take(topN).zipWithIndex
          .map { case ((id, _), i) => (id, i + 1) }.toMap
        val qsh = shOf(q)
        val sparse = docs.map(_._1).filter(_ != q)
          .flatMap { id =>
            val inter = shOf(id).intersect(qsh).size
            if (inter == 0) None
            else Some((id, inter.toDouble / (shOf(id).size + qsh.size - inter)))
          }
          .sortBy { case (id, j) => (-j, id) }.take(topN).zipWithIndex
          .map { case ((id, _), i) => (id, i + 1) }.toMap
        (dense.keySet ++ sparse.keySet).toSeq.map { id =>
          val s = dense.get(id).map(r => math.round(dw * 1000.0 / (60 + r))).getOrElse(0L) +
            sparse.get(id).map(r => math.round(sw * 1000.0 / (60 + r))).getOrElse(0L)
          (q, id, s)
        }.sortBy { case (_, id, s) => (-s, id) }.take(k)
      }.toSet
      assert(got == want,
        s"case $ci: docs=$docs embs=$embs dw=$dw sw=$sw\n got=${got.toSeq.sorted}\nwant=${want.toSeq.sorted}")
    }
  }
}
