package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bigram language-model surprisal scoring — the CCNet-style
  * "perplexity filter": train n-gram statistics on the corpus itself,
  * score every document by how surprising its token stream is under
  * that model, and keep documents below a surprisal threshold
  * (gibberish, boilerplate soup, and OCR noise score high).
  *
  * Model: add-one-smoothed bigram surprisal. With corpus unigram counts
  * c(w₁), bigram counts c(w₁w₂), and vocabulary size V, a token
  * transition costs `ln((c(w₁)+V) / (c(w₁w₂)+1))` nats ≥ 0. Each
  * DISTINCT transition's cost is rounded once to integer
  * tenth-milli-nats (×10⁴) before any summation, so per-document totals
  * are integer sums — order-independent, overflow-safe, and
  * reproducible across engines (the only cross-engine float op is one
  * `ln` per distinct bigram, a vocabulary-sized set, rounded at 10⁻⁴
  * granularity where a last-ulp libm difference cannot flip the
  * result).
  *
  * Scale: two corpus passes (unigram + bigram counts, both
  * map-side-combined aggregations), then the corpus bigram stream joins
  * the vocabulary-sized score table on (w₁,w₂) — broadcastable for
  * real-world vocabularies, AQE decides. Tokens are lowercased
  * alphabetic words (same normalization as [[Tokenizer]]).
  */
object LmScore {

  /** One row per document: (doc_id, n_bigrams, surprisal_e4_sum, kept).
    * `kept` ⇔ mean per-transition surprisal ≤ `maxMeanSurprisalE4`
    * tenth-milli-nats, compared in integer cross-multiplied form.
    * Documents with fewer than two tokens score 0 and are kept.
    */
  def bigramSurprisal(
      spark: SparkSession,
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxMeanSurprisalE4: Long = 50000L,
  ): DataFrame = {
    val toks = docs
      .select(col(idCol),
        expr(s"filter(split(lower($textCol), '\\\\s+'), t -> t rlike '^[a-z]+$$')").as("t"))
      .persist()

    val uni = toks
      .select(explode(col("t")).as("w"))
      .groupBy("w")
      .agg(count(lit(1)).as("c1"))
      .persist()
    // V is a scalar — one bounded count(), then used as a literal
    val vocabSize = uni.count()

    // the >= 2 filter precedes the projection, so sequence() never sees
    // a negative upper bound (ANSI-safe)
    val bigrams = toks
      .where(size(col("t")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(0, size(t) - 2), i -> struct(t[i] AS w1, t[i + 1] AS w2))"))
        .as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .persist()

    // per-distinct-transition integer cost (the only float computation)
    val tokScore = bigrams
      .groupBy("w1", "w2")
      .agg(count(lit(1)).as("cb"))
      .join(uni, col("w1") === col("w"))
      .select(col("w1"), col("w2"),
        round(log((col("c1") + lit(vocabSize)).cast("double") /
          (col("cb") + lit(1L)).cast("double")) * 1e4)
          .cast("long").as("s_e4"))

    val perDoc = bigrams
      .join(tokScore, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(sum(col("s_e4")).as("surprisal_e4_sum"), count(lit(1)).as("n_bigrams"))

    docs
      .select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("surprisal_e4_sum"), lit(0L)).as("surprisal_e4_sum"))
      .withColumn("kept",
        col("surprisal_e4_sum") <= lit(maxMeanSurprisalE4) * col("n_bigrams"))
  }
}
