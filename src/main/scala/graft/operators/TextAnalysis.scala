package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-quality operators for training-data pipelines: integer-exact
  * statistics, heuristic language identification, and a winnowing-style
  * document fingerprint. Everything is built-in-function based (codegen
  * friendly), no UDFs in the hot path.
  */
object TextAnalysis {

  /** Portable 60-bit token hash: the first 15 hex digits of md5,
    * interpreted as an integer. Unlike xxhash64 it is reproducible in any
    * SQL engine (`CAST('0x'||substr(md5(x),1,15) AS BIGINT)`), which puts
    * simhash/fingerprint on the DuckDB-oracle lane. md5 is a codegen'd
    * built-in; the extra cost vs xxhash64 is a few ns/token.
    */
  def portableHash(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Whitespace token count as pure string arithmetic
    * (spaces-in-trimmed + 1, 0 for blank) — bit-exact in any SQL
    * engine; shared by stats, qualityScore, and the packing lane.
    */
  def tokenCountExpr(textCol: Column): Column = {
    val trimmed = trim(textCol)
    when(length(trimmed) === 0, 0L)
      .otherwise(length(trimmed) - length(regexp_replace(trimmed, " ", "")) + 1)
  }

  /** Per-document integer statistics. All counts are arithmetic on the
    * raw string, so an external SQL engine can reproduce them bit-exact:
    * n_tokens = spaces-in-trimmed + 1 (0 for blank).
    */
  def stats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val trimmed = trim(t)
    val nTokens = tokenCountExpr(t)
    val toks = split(trimmed, " ")
    df.select(
      col(idCol).as("doc_id"),
      length(t).cast("long").as("n_chars"),
      nTokens.cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct_tokens"),
      (length(t) - length(regexp_replace(t, "[0-9]", ""))).cast("long").as("n_digits"),
      (length(t) - length(regexp_replace(t, "[.,;:!?'\"()\\[\\]{}-]", ""))).cast("long").as("n_punct"),
      (nTokens < 10).cast("boolean").as("is_short"))
  }

  /** Composite pretraining-style quality score (0-100) from the classic
    * corpus-filtering heuristics — length band, punctuation and digit
    * ratios, stopword density, token diversity:
    *
    *   +25 if 10 ≤ n_tokens ≤ 100000
    *   +20 if punct ratio ≤ 0.1 (as `10·n_punct ≤ n_chars`)
    *   +20 if digit ratio ≤ 0.2 (as `5·n_digits ≤ n_chars`)
    *   +20 if ≥ 2 distinct `en` stopwords appear
    *   +15 if type-token ratio ≥ 0.3 (as `100·n_distinct ≥ 30·n_tokens`)
    *
    * Every flag is an integer cross-multiplication, never a float
    * ratio — no rounding boundary can flip a flag between engines, so
    * the score reproduces bit-for-bit in plain SQL for the oracle lane.
    */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val trimmed = trim(t)
    val nChars = length(t).cast("long")
    val nTokens = when(length(trimmed) === 0, 0L)
      .otherwise(length(trimmed) - length(regexp_replace(trimmed, " ", "")) + 1)
      .cast("long")
    val nDistinct = size(array_distinct(split(trimmed, " "))).cast("long")
    val nDigits = (length(t) - length(regexp_replace(t, "[0-9]", ""))).cast("long")
    val nPunct = (length(t) - length(regexp_replace(t, "[.,;:!?'\"()\\[\\]{}-]", ""))).cast("long")
    val stopHits = size(array_intersect(
      array_distinct(split(lower(trimmed), " ")),
      array(stopwords("en").map(lit): _*))).cast("long")
    val score =
      when(nTokens >= 10L && nTokens <= 100000L, 25).otherwise(0) +
        when(nPunct * 10 <= nChars, 20).otherwise(0) +
        when(nDigits * 5 <= nChars, 20).otherwise(0) +
        when(stopHits >= 2L, 20).otherwise(0) +
        when(nDistinct * 100 >= nTokens * 30, 15).otherwise(0)
    df.select(col(idCol).as("doc_id"), score.cast("int").as("quality_score"))
  }

  /** Stopword profiles for the heuristic language id. Kept tiny and
    * literal so the same lists can be embedded in an oracle SQL.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "no", "por"),
    "fr" -> Seq("le", "les", "des", "et", "un", "une", "que", "pour", "dans", "ce"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu", "auf"))

  private val langOrder = Seq("en", "es", "fr", "de")

  /** Heuristic language identification: CJK character ratio → zh;
    * otherwise argmax of stopword hits in a fixed language order
    * ('und' when no stopword matches). Deterministic and reproducible
    * in plain SQL for the oracle lane.
    */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = array_distinct(split(lower(trim(t)), " "))
    val cjk = length(t) - length(regexp_replace(t, "[一-鿿]", ""))
    val hits: Map[String, Column] = stopwords.map { case (lang, words) =>
      lang -> size(array_intersect(toks, array(words.map(lit): _*)))
    }
    // argmax with ties broken by langOrder: first language in order that
    // has positive hits and is >= every other language's hits.
    val lang = langOrder.foldLeft(Option.empty[Column]) { (acc, l) =>
      val isMax = langOrder.filterNot(_ == l).map(o => hits(l) >= hits(o)).reduce(_ && _)
      val cond = hits(l) > 0 && isMax
      Some(acc.fold(when(cond, lit(l)))(_.when(cond, lit(l))))
    }.get.otherwise(lit("und"))

    df.select(
      col(idCol).as("doc_id"),
      when(cjk * 10 > length(t) * 3, lit("zh")).otherwise(lang).as("lang_pred"))
  }

  /** Intra-document repetition statistics — the Gopher/RefinedWeb-style
    * quality signals for boilerplate and degenerate generation: line
    * counts, duplicate-line counts (occurrences beyond each line's
    * first), and a repetition flag. The flag compares integers
    * (`10·dups > 3·lines` ⇔ duplicate-line fraction > 0.3), never a
    * float ratio, so no rounding boundary can flip it between engines.
    * Blank lines count as lines on both sides (splitting "" yields one
    * empty line — same convention in Spark and SQL).
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = split(col(textCol), "\n")
    val nLines = size(lines).cast("long")
    val nDistinct = size(array_distinct(lines)).cast("long")
    val nDup = (nLines - nDistinct).as("n_dup_lines")
    df.select(
      col(idCol).as("doc_id"),
      nLines.as("n_lines"),
      nDistinct.as("n_distinct_lines"),
      nDup,
      ((nLines - nDistinct) * 10 > nLines * 3).as("is_repetitive"))
  }

  /** Corpus vocabulary: the `topK` most frequent whitespace tokens with
    * a deterministic (count desc, token asc) tie-break. The aggregation
    * is map-side-combined on the token key and the final ordering is a
    * takeOrdered over the vocabulary-bounded counts frame — nothing
    * here scales with corpus size except the one token-count shuffle.
    */
  def vocabulary(df: DataFrame, textCol: String, topK: Int): DataFrame =
    df.select(explode(split(trim(col(textCol)), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token")
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token").asc)
      .limit(topK)

  /** Unicode NFC canonicalization — run BEFORE hashing/dedup/tokenizing
    * so `e + U+0301` and precomposed `é` stop being distinct documents.
    * A codegen'd native expression ([[graft.functions.UnicodeNormalize]])
    * whose fast path is a read-only `isNormalized` scan: already-clean
    * rows (the overwhelming majority of a real corpus) allocate nothing.
    * Output: (doc_id, norm_text, changed).
    */
  def normalizeNfc(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(
        col(idCol).as("doc_id"),
        col(textCol).as("graft_raw"),
        graft.functions.UnicodeNormalize.nfcCol(col(textCol)).as("norm_text"))
      .withColumn("changed", col("norm_text") =!= col("graft_raw"))
      .drop("graft_raw")
  }

  /** Corpus heavy hitters: the `topK` most frequent word n-grams —
    * the boilerplate detector behind template/SEO-spam filters and the
    * phrase statistics a dedup threshold is tuned against. Same
    * single-space tokenization as [[vocabulary]]; grams are formed by a
    * codegen'd higher-order array expression (no UDF), counted with a
    * map-side-combined aggregation on the gram key, and the final
    * (count desc, gram asc) top-k plans as TakeOrderedAndProject — no
    * global sort, nothing driver-side beyond the k winners. Documents
    * shorter than n tokens contribute nothing.
    */
  def topNgrams(df: DataFrame, textCol: String, n: Int, topK: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val toks = filter(split(trim(col(textCol)), " "), t => length(t) > 0)
    val grams = when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " "))
    ).otherwise(array())
    df.select(explode(grams).as("ngram"))
      .groupBy("ngram")
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("ngram").asc)
      .limit(topK)
  }

  /** Per-document TF-IDF keyword extraction — the "what is this
    * document about" signal used for topic balancing and per-domain
    * mixture diagnostics. The idf factor is kept RATIONAL: within one
    * document N/df only rescales by a constant, so ranking by
    * `score_ppm = tf·10⁶ div df` (integer division, parts-per-million
    * of the term's corpus document frequency) reproduces the tf·(N/df)
    * order exactly with no logarithm and no floating point — the whole
    * lane is integer arithmetic, bit-reproducible by any SQL engine.
    *
    * Scale: one corpus pass for per-(doc, term) tf, one vocabulary-
    * sized aggregation for df, a broadcastable join back on the term,
    * and a per-document top-k window (ties broken by term — unique per
    * doc, so ranks are deterministic).
    */
  def tfidfKeywords(df: DataFrame, idCol: String, textCol: String, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val toks = filter(split(trim(col(textCol)), " "), t => length(t) > 0)
    val tf = df
      .select(col(idCol).as("doc_id"), explode(toks).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score_ppm").desc, col("term").asc)
    tf.join(dfreq, "term")
      .withColumn("score_ppm", expr("(tf * 1000000) div df"))
      .withColumn("rank", row_number().over(byDoc))
      .filter(col("rank") <= topK)
      .select("doc_id", "rank", "term", "tf", "df", "score_ppm")
  }

  /** BPE-style pre-tokenization pattern (GPT-2 family, minus the
    * RE2-unsupported lookahead): a token is an optionally-space-prefixed
    * letter run, digit run, or punctuation run, or a whitespace run.
    * Restricted to constructs Java regex and RE2 (DuckDB) evaluate
    * identically, so the count is oracle-checkable — whitespace is the
    * EXPLICIT class [ \t\n\f\r], because Java's \s includes vertical
    * tab while RE2's does not.
    */
  val BpeTokenPattern = " ?\\p{L}+| ?\\p{N}+| ?[^ \\t\\n\\f\\r\\p{L}\\p{N}]+|[ \\t\\n\\f\\r]+"

  /** Tokenizer-aware size estimate: the number of BPE-style pre-tokens
    * per document. A real BPE would split rare words further, so this is
    * a lower bound on (and in practice ~proportional to) the true token
    * count — the quantity training-data pipelines budget by.
    */
  def bpeTokenCount(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("doc_id"),
      size(regexp_extract_all(col(textCol), lit(BpeTokenPattern), lit(0)))
        .cast("long").as("n_bpe_tokens"))

  /** Winnowing-style fingerprint: the k smallest distinct hashes over
    * `window`-token rolling windows. Output (doc_id, fingerprint) with
    * fingerprint = portableHash of the sorted k-min sketch — documents
    * with identical sketches are candidate near-duplicates.
    */
  def fingerprint(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 4,
      k: Int = 8,
  ): DataFrame = {
    val windows = Dedup.shingles(df, idCol, textCol, window)
    windows
      .select(col("id"), portableHash(col("shingle")).as("h"))
      .groupBy("id")
      .agg(slice(sort_array(collect_set(col("h"))), 1, k).as("sketch"))
      .select(
        col("id").as("doc_id"),
        portableHash(concat_ws(",", col("sketch"))).as("fingerprint"))
  }
}
