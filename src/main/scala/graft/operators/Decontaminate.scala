package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents that share any word
  * n-gram with a held-out benchmark set (the standard 13-gram-overlap
  * test-set-leakage check run before pretraining).
  *
  * Scale design: both sides reduce to DISTINCT hashed shingles before
  * the join, so the join is (corpus shingles) ⋈ (benchmark shingle
  * vocabulary) — an inverted-index semi-join, never doc × doc. The
  * benchmark side is a deduplicated n-gram vocabulary (tiny next to a
  * 100 TB corpus: benchmarks are MBs); Spark broadcasts it when small,
  * and the aggregation after the join is a map-side-combined groupBy on
  * doc id. Hashing shingles with the portable 60-bit md5 prefix keeps
  * the whole lane reproducible in any SQL engine for the oracle.
  */
object Decontaminate {

  /** Per-contaminated-document overlap: (doc_id, n_matched_ngrams) for
    * every corpus document sharing ≥ `minMatches` distinct n-grams with
    * the benchmark. Clean documents are absent from the result — at
    * corpus scale the flagged set is the small output, and callers
    * anti-join it against the corpus to drop or quarantine.
    */
  def overlap(
      corpus: DataFrame,
      corpusId: String,
      corpusText: String,
      benchmark: DataFrame,
      benchmarkText: String,
      n: Int = 13,
      minMatches: Long = 1L,
  ): DataFrame = {
    val corpusShingles = Dedup.shingles(corpus, corpusId, corpusText, n)
      .select(col("id"), TextAnalysis.portableHash(col("shingle")).as("h"))
    val benchShingles = Dedup.shingles(
        benchmark.select(monotonically_increasing_id().as("_bid"), col(benchmarkText)),
        "_bid", benchmarkText, n)
      .select(TextAnalysis.portableHash(col("shingle")).as("h")).distinct()
    corpusShingles.join(benchShingles, "h")
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_matched_ngrams"))
      .filter(col("n_matched_ngrams") >= minMatches)
  }

  /** The corpus minus contaminated documents (left-anti join on the
    * flagged set).
    */
  def clean(
      corpus: DataFrame,
      corpusId: String,
      corpusText: String,
      benchmark: DataFrame,
      benchmarkText: String,
      n: Int = 13,
      minMatches: Long = 1L,
  ): DataFrame = {
    val flagged = overlap(corpus, corpusId, corpusText, benchmark, benchmarkText, n, minMatches)
    corpus.join(flagged, corpus(corpusId) === flagged("doc_id"), "left_anti")
  }
}
