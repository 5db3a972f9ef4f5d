package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 ranking over a document corpus (Robertson/Spärck Jones
  * probabilistic relevance, the Okapi BM25 form — public: Robertson &
  * Zaragoza, "The Probabilistic Relevance Framework: BM25 and Beyond",
  * FnTIR 2009) — the standard SPARSE system of production hybrid
  * retrieval, complementing the 3-gram Jaccard ranking: Jaccard
  * rewards near-duplicate phrasing, BM25 rewards rare-term relevance
  * with term-frequency saturation and document-length normalization.
  *
  * Scale design: candidates come from the inverted (token → doc) join
  * restricted to the query's tokens — only documents sharing a kept
  * query token are ever materialized, never an all-pairs pass. The
  * corpus statistics (N, total token count, per-token document
  * frequency) are one map-side-combined aggregation each. A
  * high-document-frequency query token funnels a corpus-sized
  * candidate set through the scoring join exactly like a hot shingle
  * (BM25's IDF already near-zeroes its WEIGHT but not its COST), so
  * the same `maxTokenDf` cap as [[Hybrid]]'s shingle bound drops such
  * tokens from the query representation before the join — loudly.
  *
  * Determinism & oracle: the whole score is arithmetic over exact
  * integers (tf, dl, df, N, T = total tokens; k1/b as milli-unit
  * integer parameters) with ONE transcendental, the IDF log. Every
  * division/multiplication is IEEE double (bit-identical across
  * engines); the log argument is an exact rational, and the final
  * per-term contribution is rounded to integer MICRO-units before the
  * order-independent long sum — so a last-ulp `ln` difference between
  * engines would have to land within ~1e-10 of a rounding boundary to
  * flip a score (pinned empirically by the bm25_rank_documents oracle
  * replay at the driver's correctness scale).
  *
  *   idf(t)    = ln( (N − df + 0.5) / (df + 0.5) + 1 )
  *   tfpart(t) = tf·(k1+1) / (tf + k1·(1 − b + b·dl·N/T))
  *   score     = Σ round( idf · tfpart · 1e6 )   (long micro-units)
  *
  * Output: `(qid, id, bm25_micro, rank)` — rank 1 = best per query,
  * ties by id ascending; rows limited to `topN` per query. Queries are
  * corpus members named by id (the [[Hybrid]] convention), excluded
  * from their own candidates.
  */
object Bm25 {

  def rank(
      docs: DataFrame,
      queryIds: Seq[Long],
      topN: Int = 20,
      k1Milli: Int = 1200,
      bMilli: Int = 750,
      maxTokenDf: Long = 0L,
      docIdCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(queryIds.nonEmpty, "bm25 needs at least one query id")
    require(topN >= 1, s"topN must be >= 1, got $topN")
    require(k1Milli >= 0 && bMilli >= 0 && bMilli <= 1000,
      s"need k1Milli >= 0 and bMilli in [0,1000], got k1=$k1Milli b=$bMilli")

    // (id, token) with per-document term frequency; dl = document
    // length in tokens. One tokenize pass feeds tf, dl, df, and T.
    // (Measured: caching tf for the call COSTS more than the repeated
    // aggregation it saves — the tf consumers share their exchange, so
    // recompute is mostly scan+explode, while the columnar cache write
    // is a full extra materialization. Keep it lazy.)
    val toks = docs.select(col(docIdCol).cast("long").as("id"),
      explode(split(col(textCol), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val tf = toks.groupBy("id", "token").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("id").agg(sum(col("tf")).as("dl"))
    // corpus statistics: document count over the DOCS frame (documents
    // with no tokens still count toward N), total token count, and
    // per-token document frequency — each one map-side-combined agg
    val n = docs.select(col(docIdCol)).distinct().count()
    val t = dl.agg(sum(col("dl"))).head.getLong(0)
    require(t > 0, "bm25 needs a non-empty corpus")
    val df_ = tf.groupBy("token").agg(count(lit(1)).as("df"))

    // query representation: the query documents' DISTINCT tokens,
    // df-capped exactly like Hybrid's hot-shingle bound
    val qtok0 = tf.filter(col("id").isInCollection(queryIds))
      .select(col("id").as("qid"), col("token"))
    val qtok =
      if (maxTokenDf <= 0L) qtok0
      else {
        val hot = df_
          .join(broadcast(qtok0.select("token").distinct()), "token")
          .filter(col("df") > maxTokenDf)
          .collect()
        if (hot.nonEmpty) {
          System.err.println(
            s"[graft] bm25: dropping ${hot.length} query token(s) with " +
              s"document frequency > $maxTokenDf: " +
              hot.sortBy(-_.getLong(1)).take(5)
                .map(r => s"'${r.getString(0)}'(df=${r.getLong(1)})")
                .mkString(", "))
          val hotSet = hot.map(_.getString(0)).toSeq
          qtok0.filter(!col("token").isInCollection(hotSet))
        } else qtok0
      }

    // candidate scoring: inverted join on token, one row per
    // (query, candidate, shared token); the per-term contribution is
    // rounded to micro-units BEFORE the sum so aggregation order can
    // never move a bit
    val idf = log(
      (lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5))
        + lit(1.0))
    val lenNorm = col("dl").cast("double") * lit(n.toDouble) / lit(t.toDouble)
    val tfpart = (col("tf").cast("double") * lit((k1Milli + 1000).toDouble / 1000.0)) /
      (col("tf").cast("double") +
        lit(k1Milli.toDouble / 1000.0) *
          (lit((1000 - bMilli).toDouble / 1000.0) +
            lit(bMilli.toDouble / 1000.0) * lenNorm))
    tf.join(broadcast(qtok), Seq("token"))
      .filter(col("id") =!= col("qid"))
      .join(df_, "token")
      .join(dl, "id")
      .withColumn("contrib_micro",
        round(idf * tfpart * lit(1000000.0)).cast("long"))
      .groupBy("qid", "id")
      .agg(sum(col("contrib_micro")).as("bm25_micro"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid")
          .orderBy(col("bm25_micro").desc, col("id").asc)))
      .filter(col("rank") <= topN)
      .select("qid", "id", "bm25_micro", "rank")
  }
}
