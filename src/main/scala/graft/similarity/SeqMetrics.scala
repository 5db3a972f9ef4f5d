package graft.similarity

/** Label-collection similarity metrics (reference
  * architxt/similarity.py:44-77). All operate on collections of entity
  * labels: jaccard on the sets, levenshtein/jaro-winkler on the SORTED
  * label sequences (rapidfuzz semantics over lists, not characters).
  */
object SeqMetrics {

  type Metric = (Set[String], Set[String]) => Double

  /** Jaccard similarity; both empty → 1.0 (similarity.py:44-65). */
  def jaccard(x: Set[String], y: Set[String]): Double =
    if (x.isEmpty && y.isEmpty) 1.0
    else (x & y).size.toDouble / (x | y).size.toDouble

  /** Levenshtein.ratio over the sorted label sequences: indel-only
    * normalized similarity = 2·LCS / (|a| + |b|) (rapidfuzz ratio with
    * substitution cost 2; similarity.py:68-70).
    */
  def levenshtein(x: Set[String], y: Set[String]): Double = {
    val a = x.toIndexedSeq.sorted
    val b = y.toIndexedSeq.sorted
    if (a.isEmpty && b.isEmpty) return 1.0
    val lcsLen = lcs(a, b)
    2.0 * lcsLen / (a.size + b.size)
  }

  private def lcs(a: IndexedSeq[String], b: IndexedSeq[String]): Int = {
    val dp = Array.ofDim[Int](b.size + 1)
    var i = 0
    while (i < a.size) {
      var prev = 0
      var j = 0
      while (j < b.size) {
        val tmp = dp(j + 1)
        dp(j + 1) = if (a(i) == b(j)) prev + 1 else math.max(dp(j + 1), dp(j))
        prev = tmp
        j += 1
      }
      i += 1
    }
    dp(b.size)
  }

  /** Jaro-Winkler over the sorted label sequences (similarity.py:73-75):
    * standard Jaro with match window max(|a|,|b|)/2 − 1, Winkler prefix
    * boost (p = 0.1, ℓ ≤ 4) applied when the Jaro similarity exceeds 0.7.
    */
  def jaro(x: Set[String], y: Set[String]): Double = {
    val a = x.toIndexedSeq.sorted
    val b = y.toIndexedSeq.sorted
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0

    val window = math.max(math.max(a.size, b.size) / 2 - 1, 0)
    val aMatched = Array.fill(a.size)(false)
    val bMatched = Array.fill(b.size)(false)
    var matches = 0
    var i = 0
    while (i < a.size) {
      val lo = math.max(0, i - window)
      val hi = math.min(b.size - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatched(j) && a(i) == b(j)) {
          aMatched(i) = true; bMatched(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0

    var transpositions = 0
    var k = 0
    i = 0
    while (i < a.size) {
      if (aMatched(i)) {
        while (!bMatched(k)) k += 1
        if (a(i) != b(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaroSim = (m / a.size + m / b.size + (m - transpositions / 2) / m) / 3.0

    if (jaroSim <= 0.7) jaroSim
    else {
      var prefix = 0
      while (prefix < math.min(4, math.min(a.size, b.size)) && a(prefix) == b(prefix)) prefix += 1
      jaroSim + prefix * 0.1 * (1 - jaroSim)
    }
  }

  val default: Metric = jaro
  def byName(name: String): Metric = name match {
    case "jaccard"     => jaccard
    case "levenshtein" => levenshtein
    case "jaro"        => jaro
    case other         => throw new IllegalArgumentException(s"unknown metric: $other")
  }
}
