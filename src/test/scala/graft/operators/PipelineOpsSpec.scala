package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Pii / Decontaminate / Mixture — the round-8 pipeline lanes. */
class PipelineOpsSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("pii stats: each category counted once, in redaction order") {
    val df = docs(
      1L -> "mail alice@example.com or bob.smith+tag@sub.example.org now",
      2L -> "server 10.0.42.7 called +1 (555) 010-1234 ref 12345678",
      3L -> "plain text with no identifiers at all")
    val out = Pii.stats(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == ((2L, 0L, 0L, 0L)))
    // the IP is counted as ipv4, NOT double-counted as a phone; the
    // 8-digit run is a number, the phone a phone
    assert(out(2L) == ((0L, 1L, 1L, 1L)))
    assert(out(3L) == ((0L, 0L, 0L, 0L)))
  }

  test("pii redact masks every category and leaves clean text alone") {
    val df = docs(
      1L -> "mail alice@example.com from 10.0.42.7 call +1 (555) 010-1234 ref 12345678",
      2L -> "clean text")
    val out = Pii.redact(df, "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "mail [EMAIL] from [IP] call [PHONE] ref [NUMBER]")
    assert(out(2L) == "clean text")
    // redacted text is a fixpoint: nothing left for a second pass
    val again = Pii.redact(Pii.redact(df, "text"), "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == out)
  }

  test("pii: an email's digits are not eaten as a phone number") {
    val df = docs(1L -> "write to a123456789@example.com please")
    val st = Pii.stats(df, "doc_id", "text").head()
    assert((st.getLong(1), st.getLong(3), st.getLong(4)) == ((1L, 0L, 0L)))
    val red = Pii.redact(df, "text").head().getString(1)
    assert(red == "write to [EMAIL] please")
  }

  test("pii: date-shaped digit runs are not redacted as phones") {
    val df = docs(
      1L -> "released 2024-01-01 and revised 01/02/2024 then 24.01.01 done",
      2L -> "call 555-123-4567 or 040-1234-5678 or 01 23 45 67 89 now",
      3L -> "meeting 2024-01-01 12:30 call (040) 123-4567")
    val red = Pii.redact(df, "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // all three date shapes (Y-M-D, D/M/Y, short) survive untouched
    assert(red(1L) == "released 2024-01-01 and revised 01/02/2024 then 24.01.01 done")
    // 3-3-4, x-4-x, and >=4-group phones still mask
    assert(red(2L) == "call [PHONE] or [PHONE] or [PHONE] now")
    // a date next to a parenthesized phone: only the phone masks
    assert(red(3L) == "meeting 2024-01-01 12:30 call [PHONE]")
    val st = Pii.stats(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(st == Map(1L -> 0L, 2L -> 3L, 3L -> 1L))
  }

  test("decontaminate: doc sharing a benchmark n-gram is flagged, others survive") {
    val corpus = docs(
      1L -> "alpha beta gamma delta epsilon zeta",   // contains the benchmark 3-gram
      2L -> "one two three four five six",           // clean
      3L -> "zeta epsilon delta gamma beta alpha")   // reversed: no shared 3-gram
    val benchmark = docs(100L -> "x y beta gamma delta q")
    val flagged = Decontaminate.overlap(corpus, "doc_id", "text", benchmark, "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(flagged == Set((1L, 1L)))
    val survivors = Decontaminate.clean(corpus, "doc_id", "text", benchmark, "text", n = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(2L, 3L))
  }

  test("decontaminate: overlap counts distinct shared n-grams per doc") {
    val corpus = docs(1L -> "a b c d e f", 2L -> "c d e x y z")
    val benchmark = docs(9L -> "a b c d e q w")
    // doc 1 shares "a b c", "b c d", "c d e"; doc 2 shares "c d e"
    val flagged = Decontaminate.overlap(corpus, "doc_id", "text", benchmark, "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(flagged == Map(1L -> 3L, 2L -> 1L))
    // a higher minMatches threshold keeps the weakly-overlapping doc
    val strict = Decontaminate.overlap(corpus, "doc_id", "text", benchmark, "text",
        n = 3, minMatches = 2L)
      .collect().map(_.getLong(0)).toSet
    assert(strict == Set(1L))
  }

  test("mixture: uniform rebalance keeps the smallest stratum whole") {
    import spark.implicits._
    val df = Seq(
      (1L, "en", "a b c d e f g h i j"),      // 10 tokens
      (2L, "en", "a b c d e f g h i j"),      // en total 20
      (3L, "fr", "a b c d e"),                // fr total 5
      (4L, "de", "a b c d e f g"))            // de total 7
      .toDF("doc_id", "lang", "text")
    val out = Mixture.uniformRebalance(df, "lang", "text").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("fr") == ((1L, 5L, 10000L)))
    assert(out("de") == ((1L, 7L, 50000L / 7L)))   // 7142, floored
    assert(out("en") == ((2L, 20L, 2500L)))
    // the fractions feed the deterministic sampler: fraction = bp/10000
    val fracs = out.map { case (k, (_, _, bp)) => k -> bp / 10000.0 }
    val sampled = Sampling.stratified(df, "lang", "doc_id", fracs)
    assert(sampled.count() <= df.count())
  }

  test("mixture: exact isqrt is floor(sqrt) at and around perfect squares") {
    import spark.implicits._
    // boundary values where a double sqrt seed is most likely to round
    // across the integer: k², k²−1, k²+1, plus 0/1/2 and a large value
    val ns = Seq(0L, 1L, 2L, 3L, 4L, 8L, 9L, 10L, 99L, 100L, 101L,
      999999L, 1000000L, 1000001L, 999999999999L, 1000000000000L)
    val got = ns.toDF("n")
      .select(col("n"), Mixture.isqrt(col("n")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ns.foreach { n =>
      val expect = java.math.BigInteger.valueOf(n).sqrt().longValue()
      assert(got(n) == expect, s"isqrt($n): got ${got(n)}, want $expect")
    }
  }

  test("mixture: temperature keeps more of large strata than uniform, binding stratum whole") {
    import spark.implicits._
    val df = Seq(
      (1L, "web", "a b c d e f g h i j"),     // 10 tokens
      (2L, "web", "a b c d e f g h i j"),
      (3L, "web", "a b c d e f g h i j"),
      (4L, "web", "a b c d e f g h i j"),
      (5L, "web", "a b c d e f g h i j"),
      (6L, "web", "a b c d e f g h i j"),
      (7L, "web", "a b c d e f g h i j"),
      (8L, "web", "a b c d e f g h i j"),
      (9L, "web", "a b"),                     // web total 82
      (10L, "books", "a b c d e f g h i"),    // books total 9
      (11L, "code", ""))                      // zero-token stratum
      .toDF("doc_id", "source", "text")
    val t = Mixture.temperatureRebalance(df, "source", "text").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // weights: isqrt(82)=9, isqrt(9)=3 → quotas 82 div 9 = 9, 9 div 3 = 3
    // → Q = 3; targets: web 27, books 9 (whole); keep: 10000·27 div 82,
    // books 10000
    assert(t("books") == ((9L, 9L, 10000L)))
    assert(t("web") == ((82L, 27L, 270000L / 82L)))
    assert(t("code") == ((0L, 0L, 10000L)))
    // direction vs uniform: web keeps 3292 bp here but only
    // 10000·9 div 82 = 1097 bp under the uniform rebalance
    val u = Mixture.uniformRebalance(df.filter(col("source") =!= "code"), "source", "text")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(t("web")._3 > u("web"))
    // α = 1/4 (two isqrt applications) flattens even less toward small
    // strata: the large stratum's keep fraction rises monotonically
    val t2 = Mixture.temperatureRebalance(df, "source", "text", sqrtApplications = 2)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(t2("web") >= t("web")._3)
    assert(t2("books") == 10000L)
  }

  test("line dedup: corpus-frequent lines removed, blanks and order preserved") {
    // "shared" appears 3× corpus-wide (twice inside doc 1 — within-doc
    // repetition counts toward removal); "  " is blank and must survive
    // even though it also repeats; every other line is corpus-unique
    val df = docs(
      1L -> "keep one\nshared\n  \nshared\nkeep two",
      2L -> "shared\nkeep three",
      3L -> "  \nonly line")
    val out = Dedup.lineDedup(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("lines_total"), r.getAs[Long]("lines_removed"),
          r.getAs[String]("clean_text")))).toMap
    assert(out(1L) == ((5L, 2L, "keep one\n  \nkeep two")))
    assert(out(2L) == ((2L, 1L, "keep three")))
    assert(out(3L) == ((2L, 0L, "  \nonly line")))
  }

  test("line dedup: a document of only duplicated lines cleans to empty") {
    val df = docs(1L -> "dup", 2L -> "dup", 3L -> "dup\ndup")
    val out = Dedup.lineDedup(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("lines_removed"), r.getAs[String]("clean_text")))).toMap
    assert(out(1L) == ((1L, "")))
    assert(out(3L) == ((2L, "")))
    // below the default threshold nothing is removed
    val none = Dedup.lineDedup(docs(1L -> "solo a", 2L -> "solo b"), "doc_id", "text")
      .collect()
    assert(none.forall(_.getAs[Long]("lines_removed") == 0L))
  }
}
