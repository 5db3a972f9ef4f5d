package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid dense+sparse retrieval with reciprocal-rank fusion — the
  * production retrieval shape for training-data curation: a vector
  * ranking catches paraphrases the keyword ranking misses, the keyword
  * ranking catches exact terms the embedding blurs, and RRF (Cormack
  * et al., SIGIR 2009: score = Σ 1/(k0 + rank), k0 = 60) fuses the two
  * WITHOUT score calibration — only RANKS cross systems, so the fusion
  * is deterministic integer arithmetic and a relational oracle replays
  * it end to end.
  *
  * Scale design: the dense ranking is one broadcast of the query batch
  * against the distributed corpus (swap [[AnnIndex.topK]] in for the
  * brute pass when an index exists — fusion only consumes
  * `(query, id, rank)` rows, so the systems are pluggable); the sparse
  * ranking is the dedup family's inverted 3-gram shingle join (only
  * nonzero-overlap candidates are ever materialized — a zero-overlap
  * document cannot rank), never an all-pairs pass; both rankings
  * truncate at `topN` per query before the (tiny) full-outer fusion
  * join. Driver state is O(1).
  *
  * Determinism: ranks break ties by id; the RRF contribution is
  * `round(1e6 / (k0 + rank))` in integer micro-units summed as longs,
  * so the fused ordering (score desc, id asc) is bit-stable across
  * engines and partitionings.
  */
object Hybrid {

  /** Per-query top-`k` over the fused ranking. `docs` supplies the
    * sparse (text) side keyed by `docIdCol`, `emb` the dense (vector)
    * side keyed by `vecIdCol` — the same id space (the join key of the
    * fusion). Queries are corpus members named by id, as in the ANN
    * lanes. Returns `(query_id, neighbor_id, rrf_micro)`.
    */
  def retrieve(
      docs: DataFrame,
      emb: DataFrame,
      queryIds: Seq[Long],
      k: Int = 5,
      topN: Int = 20,
      k0: Int = 60,
      docIdCol: String = "doc_id",
      textCol: String = "text",
      vecIdCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(queryIds.nonEmpty, "hybrid retrieval needs at least one query id")
    require(topN >= k, s"per-system depth topN=$topN must cover the fused k=$k")
    graft.functions.GraftFunctions.register(docs.sparkSession)

    // dense system: exact cosine ranking of the corpus per query (the
    // brute baseline the ANN lanes gate against)
    val q = emb.filter(col(vecIdCol).isInCollection(queryIds))
      .select(col(vecIdCol).cast("long").as("qid"),
        col(vecCol).cast("array<double>").as("qv"))
    val dense = emb
      .select(col(vecIdCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .crossJoin(broadcast(q))
      .filter(col("id") =!= col("qid"))
      .withColumn("sim", Ann.cosine(col("qv"), col("v")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("sim").desc, col("id").asc)))
      .filter(col("rnk") <= topN)
      .select(col("qid"), col("id"), col("rnk").as("dense_rank"))

    // sparse system: word 3-gram Jaccard via the inverted shingle join
    // (only candidates sharing a shingle with the query ever appear)
    val sh = Dedup.shingles(docs, docIdCol, textCol, 3)
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val qsh = sh.filter(col("id").isInCollection(queryIds))
      .select(col("id").as("qid"), col("shingle"))
    val sparse = sh.join(broadcast(qsh), "shingle")
      .filter(col("id") =!= col("qid"))
      .groupBy("qid", "id").agg(count(lit(1)).as("inter"))
      .join(sizes, "id")
      .join(broadcast(sizes.filter(col("id").isInCollection(queryIds))
        .select(col("id").as("qid"), col("n").as("qn"))), "qid")
      .withColumn("j",
        col("inter").cast("double") / (col("n") + col("qn") - col("inter")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("j").desc, col("id").asc)))
      .filter(col("rnk") <= topN)
      .select(col("qid"), col("id"), col("rnk").as("sparse_rank"))

    // RRF fusion in integer micro-units; a document missing from one
    // system simply contributes 0 from it (full outer join)
    dense.join(sparse, Seq("qid", "id"), "full_outer")
      .withColumn("rrf_micro",
        coalesce(round(lit(1000000.0) / (lit(k0) + col("dense_rank")))
          .cast("long"), lit(0L)) +
          coalesce(round(lit(1000000.0) / (lit(k0) + col("sparse_rank")))
            .cast("long"), lit(0L)))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("rrf_micro").desc, col("id").asc)))
      .filter(col("rk") <= k)
      .select(col("qid").as("query_id"), col("id").as("neighbor_id"),
        col("rrf_micro"))
  }
}
