package graft.nlp

import graft.core.{ArchiTree, Child, Plain}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.SparkSession

/** A REAL statistical model driven through the [[SentenceParser]] seam:
  * a Spark MLlib multinomial logistic regression POS tagger feeding a
  * chunk-based shallow constituency parse.
  *
  * The reference plugs CoreNLP / benepar model backends into its Parser
  * ABC (reference nlp/parser/corenlp.py:19-45, nlp/parser/benepar.py:
  * 49-87); those models are env-absent in this container, but Spark
  * MLlib is on the classpath — so this backend proves the seam with a
  * genuinely trained model (LBFGS-fit multinomial logistic regression
  * over lexical features) rather than a rule stand-in.
  *
  * Training is deterministic: the fixture is a fixed generated corpus,
  * LogisticRegression starts from the zero vector (no random init), and
  * the word-identity feature makes the training vocabulary perfectly
  * separable — after convergence every in-vocabulary word scores its
  * dictionary tag with a large margin (pinned by `MlTaggerSpec`), which
  * is what lets the `ml_tag_documents` oracle recompute the predictions
  * relationally as a dictionary join. Out-of-vocabulary words fall back
  * on suffix/prefix evidence (e.g. "-ing" → VERB), the usual behaviour
  * of a feature-based tagger.
  *
  * Scoring is local per token (the coefficient matrix is a few KB,
  * broadcast with the closure) — no per-row model-server round trip, so
  * inference distributes like any other narrow map at 100 TB.
  */
object MlTagger {

  val Tags: Vector[String] = Vector("DET", "ADJ", "VERB", "NOUN")

  /** Lexical dictionary over the synthetic corpus vocabulary (TESTDATA
    * documents table) plus morphology-bearing extras used only for
    * training suffix evidence.
    */
  val Dictionary: Vector[(String, String)] = Vector(
    "a" -> "DET", "the" -> "DET",
    "big" -> "ADJ", "small" -> "ADJ", "fast" -> "ADJ", "slow" -> "ADJ",
    "dup" -> "ADJ",
    "scan" -> "VERB", "sort" -> "VERB", "merge" -> "VERB",
    "join" -> "VERB", "filter" -> "VERB", "agg" -> "VERB",
    "batch" -> "NOUN", "column" -> "NOUN", "customer" -> "NOUN",
    "data" -> "NOUN", "group" -> "NOUN", "hash" -> "NOUN",
    "key" -> "NOUN", "line" -> "NOUN", "order" -> "NOUN",
    "part" -> "NOUN", "query" -> "NOUN", "row" -> "NOUN",
    "stream" -> "NOUN", "table" -> "NOUN", "value" -> "NOUN",
    "vector" -> "NOUN", "window" -> "NOUN", "spark" -> "NOUN")

  /** Morphology extras: give the suffix features something to learn so
    * the tagger generalizes off-vocabulary (a real tagger's backbone).
    */
  private val MorphExtras: Vector[(String, String)] = Vector(
    "scanning" -> "VERB", "merging" -> "VERB", "sorting" -> "VERB",
    "joining" -> "VERB", "filtering" -> "VERB", "hashing" -> "VERB",
    "tables" -> "NOUN", "rows" -> "NOUN", "columns" -> "NOUN",
    "queries" -> "NOUN", "streams" -> "NOUN", "batches" -> "NOUN",
    "quickest" -> "ADJ", "slowest" -> "ADJ", "biggest" -> "ADJ")

  /** Purely lexical features — deliberately NO context features, so a
    * word's predicted tag is a function of the word alone and the
    * DuckDB oracle can replay predictions as a dictionary join.
    */
  def features(w: String): Seq[String] = Seq(
    s"w=$w",
    s"suf1=${w.takeRight(1)}",
    s"suf2=${w.takeRight(2)}",
    s"suf3=${w.takeRight(3)}",
    s"pre1=${w.take(1)}",
    s"len=${math.min(w.length, 8)}")

  /** Deterministic training corpus: every dictionary/extra word appears
    * several times (weighting the word-identity evidence), in varied
    * positions.
    */
  def trainingTokens: Vector[(String, String)] = {
    val base = Dictionary ++ MorphExtras
    // 3 passes in rotated order — deterministic, no RNG
    (0 until 3).flatMap(i => base.drop(i * 7 % base.size) ++ base.take(i * 7 % base.size)).toVector
  }

  /** Fit the MLlib model and extract its weights for local scoring. */
  def train(spark: SparkSession): MlTagModel = {
    import spark.implicits._
    val toks = trainingTokens
    val featIndex: Map[String, Int] =
      toks.flatMap { case (w, _) => features(w) }.distinct.sorted.zipWithIndex.toMap
    val rows = toks.map { case (w, tag) =>
      val idx = features(w).map(featIndex).distinct.sorted.toArray
      (Tags.indexOf(tag).toDouble,
        Vectors.sparse(featIndex.size, idx, Array.fill(idx.length)(1.0)))
    }
    // ~100 tiny rows: left at the session default this local relation
    // parallelizes to defaultParallelism partitions and EVERY LBFGS
    // iteration (up to 200) schedules that many near-empty tasks — the
    // whole fit is scheduler latency. One partition makes each iteration
    // one task; the gradient sum order is deterministic either way.
    val df = rows.toDF("label", "features").coalesce(1)
    val lr = new LogisticRegression()
      .setMaxIter(200)
      .setRegParam(1e-4)
      .setElasticNetParam(0.0)
      .setFamily("multinomial")
      .setStandardization(false)
    val m = lr.fit(df)
    val cm = m.coefficientMatrix
    val coef = Array.tabulate(Tags.size, featIndex.size)((r, c) => cm(r, c))
    MlTagModel(featIndex, Tags.toArray, coef, m.interceptVector.toArray)
  }
}

/** Extracted weights of the MLlib model — a few KB, serialized into the
  * task closure for local argmax scoring on executors.
  */
final case class MlTagModel(
    featIndex: Map[String, Int],
    tags: Array[String],
    coef: Array[Array[Double]],
    intercept: Array[Double],
) extends Serializable {

  def scores(w: String): Array[Double] = {
    val idx = MlTagger.features(w).flatMap(featIndex.get).distinct
    Array.tabulate(tags.length) { t =>
      var s = intercept(t)
      idx.foreach(i => s += coef(t)(i))
      s
    }
  }

  // tag(w) is a pure function of the word and the (frozen) weights, and
  // corpus tokens draw from a small vocabulary — memoize per deserialized
  // model instance so the per-token cost in the parse/tag scans is one
  // hash probe, not six feature-string builds + a dense dot product.
  // Size-capped: an adversarial unbounded vocabulary stops inserting but
  // existing entries keep serving.
  @transient private lazy val tagCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Argmax tag; ties break on tag order (deterministic). */
  def tag(w: String): String = {
    val hit = tagCache.get(w)
    if (hit != null) return hit
    val sc = scores(w)
    var best = 0
    var i = 1
    while (i < sc.length) { if (sc(i) > sc(best)) best = i; i += 1 }
    val t = tags(best)
    if (tagCache.size < 1000000) tagCache.put(w, t)
    t
  }
}

/** Chunking parser over the MLlib tagger: consecutive (DET|ADJ)* NOUN+
  * runs become NP constituents, VERB+ runs become VP, anything left is a
  * bare TOK — the classic shallow-parse shape a chunker model produces
  * (reference nlp/parser/benepar.py:49-87 yields full constituency; this
  * backend yields its flat projection).
  */
final class MlTagParser(model: MlTagModel) extends SentenceParser {

  override def parse(sentence: String, language: String): Option[ArchiTree] = {
    val toks = sentence.split("\\s+").filter(_.nonEmpty).toVector
    if (toks.isEmpty) return None
    val tags = toks.map(model.tag)
    def tok(t: String): Child = Child.Node(ArchiTree(Plain("TOK"), Vector(Child.Leaf(t))))
    val children = Vector.newBuilder[Child]
    var i = 0
    while (i < toks.length) {
      tags(i) match {
        case "DET" | "ADJ" =>
          // candidate NP start: (DET|ADJ)* NOUN+
          var j = i
          while (j < toks.length && (tags(j) == "DET" || tags(j) == "ADJ")) j += 1
          if (j < toks.length && tags(j) == "NOUN") {
            while (j < toks.length && tags(j) == "NOUN") j += 1
            children += Child.Node(ArchiTree(Plain("NP"), (i until j).toVector.map(k => tok(toks(k)))))
            i = j
          } else { children += tok(toks(i)); i += 1 }
        case "NOUN" =>
          var j = i
          while (j < toks.length && tags(j) == "NOUN") j += 1
          children += Child.Node(ArchiTree(Plain("NP"), (i until j).toVector.map(k => tok(toks(k)))))
          i = j
        case "VERB" =>
          var j = i
          while (j < toks.length && tags(j) == "VERB") j += 1
          children += Child.Node(ArchiTree(Plain("VP"), (i until j).toVector.map(k => tok(toks(k)))))
          i = j
        case _ =>
          children += tok(toks(i)); i += 1
      }
    }
    Some(ArchiTree(Plain("SENT"), children.result()))
  }
}
