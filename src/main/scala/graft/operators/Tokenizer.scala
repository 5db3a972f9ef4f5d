package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** Distributed byte-pair-encoding (BPE) tokenizer TRAINING — the
  * vocabulary-induction step that precedes token counting in a
  * pretraining pipeline (the counting side is
  * [[TextAnalysis.bpeTokenCount]]; this learns the merges that such a
  * tokenizer would use).
  *
  * Classic word-frequency BPE (Sennrich et al., ACL 2016): tokenize the
  * corpus into words, aggregate to a (word, count) table once, then
  * repeatedly (1) count adjacent symbol pairs weighted by word count,
  * (2) pick the most frequent pair, (3) merge that pair in every word.
  * Both the pair ranking and the merge application are deterministic:
  * ties break on the lexicographically smallest pair, and a merge is
  * applied as a non-overlapping left-to-right replacement (exactly the
  * semantics of SQL `replace` over the space-separated symbol string,
  * which is how the DuckDB oracle replays the loop).
  *
  * Scale: the corpus is touched ONCE (the word-frequency aggregation —
  * one map-side-combined shuffle over the raw text); every BPE iteration
  * after that runs over the distinct-word table, which is vocabulary-
  * sized (10⁶–10⁸ rows for web text), not corpus-sized. Per iteration:
  * one codegen'd pair explosion + map-side-combined count, a
  * TakeOrderedAndProject(1) for the arg-max (a single row to the
  * driver — the only driver traffic), and a literal-broadcast
  * `replace` projection. The vocab table is re-persisted each
  * iteration and the predecessor freed, so lineage stays O(1) deep in
  * compute cost.
  *
  * Words are restricted to lowercase-alphabetic (`^[a-z]+$` after
  * `lower()`), which keeps character splitting identical across engines
  * (no multi-byte/regex divergence) — the same normalization a
  * real tokenizer-training run applies before byte-level fallback.
  */
object Tokenizer {

  /** (word, cnt) frequency table over whitespace-split, lowercased,
    * alphabetic-only words. One shuffle over the corpus; everything
    * downstream of it is vocabulary-sized.
    */
  def wordFrequencies(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .where(col("word").rlike("^[a-z]+$"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Train `numMerges` BPE merges over a (word, cnt) table. Returns one
    * row per learned merge: (merge_rank 1-based, pair "a b", merged
    * "ab", n_occurrences = weighted pair count when it was chosen).
    * Stops early if no pair remains (every word fully merged).
    */
  def trainBpe(spark: SparkSession, wordFreq: DataFrame, numMerges: Int): DataFrame = {
    import spark.implicits._
    require(numMerges >= 1, s"numMerges must be >= 1: $numMerges")

    // word -> space-separated character sequence ("spark" -> "s p a r k")
    var vocab = wordFreq
      .select(col("cnt"), trim(regexp_replace(col("word"), "(.)", "$1 ")).as("seq"))
      .persist()
    vocab.count()

    val merges = ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      // adjacent-pair counts, weighted by word frequency; arg-max with a
      // deterministic (count desc, pair asc) tie-break plans as
      // TakeOrderedAndProject — one row crosses to the driver
      val best = vocab
        .select(col("cnt"), split(col("seq"), " ").as("syms"))
        .where(size(col("syms")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(0, size(syms) - 2), i -> concat(syms[i], ' ', syms[i + 1]))"))
          .as("pair"))
        .groupBy("pair")
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("pair").asc)
        .limit(1)
        .as[(String, Long)]
        .collect()

      best.headOption match {
        case None => done = true
        case Some((pair, n)) =>
          val merged = pair.replace(" ", "")
          // non-overlapping left-to-right merge; pad with spaces so the
          // pattern only matches whole symbols
          val next = vocab
            .select(col("cnt"),
              trim(expr(s"replace(concat(' ', seq, ' '), ' $pair ', ' $merged ')")).as("seq"))
            .persist()
          next.count()
          vocab.unpersist()
          vocab = next
          merges += ((rank, pair, merged, n))
          rank += 1
      }
    }
    vocab.unpersist()
    merges.toSeq.toDF("merge_rank", "pair", "merged", "n_occurrences")
  }

  /** End-to-end convenience: corpus -> word frequencies -> merge table. */
  def trainBpeOnCorpus(
      spark: SparkSession,
      docs: DataFrame,
      numMerges: Int,
      textCol: String = "text",
  ): DataFrame =
    trainBpe(spark, wordFrequencies(docs, textCol), numMerges)

  /** Distributed BPE ENCODING — apply an already-learned merge list to
    * the corpus (the other half of the tokenizer lifecycle: train once,
    * encode every shard). `merges` is the ordered "a b" pair list from
    * [[trainBpe]]'s `pair` column.
    *
    * Each merge compiles to one broadcast-literal, non-overlapping
    * left-to-right `replace` over the word's space-separated symbol
    * string — EXACTLY the semantics the trainer used, so a corpus
    * encodes the way it trained. The whole merge chain is a single
    * nested codegen'd projection (no UDF, no per-row Scala); the only
    * shuffle is the final per-document aggregation.
    *
    * Output: (idCol, n_words, n_bpe_tokens) per document that has at
    * least one alphabetic word (same word normalization as training).
    */
  def encodeBpe(
      docs: DataFrame,
      merges: Seq[String],
      textCol: String = "text",
      idCol: String = "doc_id",
  ): DataFrame = {
    require(merges.nonEmpty, "encodeBpe needs at least one merge")
    require(merges.forall(_.matches("[^ ]+ [^ ]+")),
      s"merges must be 'a b' pairs: $merges")
    val words = docs
      .select(col(idCol), explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .where(col("word").rlike("^[a-z]+$"))
    val seq0 = trim(regexp_replace(col("word"), "(.)", "$1 "))
    val encoded = merges.foldLeft(seq0) { (acc, pair) =>
      val merged = pair.replace(" ", "")
      trim(replace(concat(lit(" "), acc, lit(" ")), lit(s" $pair "), lit(s" $merged ")))
    }
    words
      .select(col(idCol), size(split(encoded, " ")).cast("long").as("graft_n_syms"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("graft_n_syms")).as("n_bpe_tokens"))
  }
}
