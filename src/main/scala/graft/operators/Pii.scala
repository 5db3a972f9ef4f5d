package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines: emails,
  * IPv4 addresses, phone-like numbers, and long digit runs (card/account
  * numbers) are counted and masked with stable placeholder tokens.
  *
  * Everything is `regexp_count`/`regexp_replace` on built-in expressions
  * — codegen'd, scan-level, no UDFs, no shuffle: at 100 TB this lane is
  * a single pass over the text column with Parquet pruning intact.
  *
  * Pattern dialect is the RE2-compatible subset (character classes,
  * bounded repetition, `\b` anchors; no lookaround or backreferences),
  * so an external SQL engine reproduces matches exactly — the DuckDB
  * oracle runs the same patterns through `regexp_extract_all` /
  * `regexp_replace(..., 'g')`.
  *
  * Order matters and is fixed: emails are matched/redacted before
  * phones (an email's digit-bearing local part must not be eaten as a
  * phone), IPv4 before digit runs (dotted quads must not decay into
  * NUMBER fragments), phones before bare digit runs.
  */
object Pii {

  /** The phone regex, assembled from shape branches (doc on the
    * `Patterns` entry below). Separators are enumerated rather than
    * backreferenced to stay inside the RE2-compatible subset.
    */
  val PhonePattern: String = {
    val seps = Seq(" ", "\\.", "/", "-")
    val fourPlusGroups = seps.map(s => s"[0-9]{2,4}($s[0-9]{2,4}){3,}")
    val threeGroups = seps.flatMap(s => Seq(
      s"[0-9]{3}$s[0-9]{2,4}$s[0-9]{2,4}", // first group of exactly 3
      s"[0-9]{2,4}$s[0-9]{3,4}$s[0-9]{2,4}", // middle group of >= 3
      s"[0-9]{2,4}$s[0-9]{2,4}$s[0-9]{3}")) // last group of exactly 3
    "\\+[0-9][0-9 ()./-]{6,}[0-9]" +
      "|\\([0-9]{2,4}\\)[ ./-]?[0-9]{2,4}([ ./-][0-9]{2,4})*" +
      (fourPlusGroups ++ threeGroups).mkString("|\\b(?:", "|", ")\\b")
  }

  /** (category, regex, replacement) in redaction order. */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "[IP]"),
    // a phone needs shape — a leading +, a parenthesized area code, or
    // separator-delimited digit groups — so bare digit runs fall through
    // to the number category. Date shapes are excluded by construction
    // (still RE2-subset, no lookaround or backreferences): the un-parened
    // branches require ONE consistent separator (enumerated per separator,
    // since a backreference is off-dialect), which stops a date from
    // bridging into adjacent numbers (`2024-01-01 12:30` mixes `-` and
    // ` `, so no single branch spans it), and the three-group branches
    // each require a group size no calendar date has (first group of
    // exactly 3 digits, a middle group of ≥3, or a trailing group of
    // exactly 3) — so 4-2-2 / 2-2-4 / 2-2-2 runs like `2024-01-01`,
    // `01/02/2024`, or `24.01.01` never match, while ≥4-group numbers
    // (`01 23 45 67 89`) and 3-3-4 / x-34x-x shapes (`555-123-4567`,
    // `040-1234-5678`) do. Branch order is load-bearing under
    // leftmost-first semantics (Java and RE2 agree): ≥4-group branches
    // precede 3-group ones so a long number is consumed whole, never
    // half-eaten. Residual imprecision: a 3-group number shaped exactly
    // like a date (e.g. 4-2-2) is left unredacted — the precision side
    // of the trade.
    ("phone", PhonePattern, "[PHONE]"),
    ("number", "\\b[0-9]{7,}\\b", "[NUMBER]"))

  /** Per-document counts per category, honoring the redaction order:
    * each category is counted on the text with all earlier categories
    * already masked, so a token is attributed to exactly one category
    * (an email is never double-counted as a phone).
    */
  def stats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (cols, _) = Patterns.foldLeft((Vector.empty[Column], col(textCol))) {
      case ((acc, text), (name, pattern, repl)) =>
        (acc :+ regexp_count(text, lit(pattern)).cast("long").as(s"n_$name"),
          regexp_replace(text, pattern, repl))
    }
    df.select(col(idCol).as("doc_id") +: cols: _*)
  }

  /** The text with every category masked, in redaction order. */
  def redactExpr(textCol: Column): Column =
    Patterns.foldLeft(textCol) { case (text, (_, pattern, repl)) =>
      regexp_replace(text, pattern, repl)
    }

  /** Documents with `textCol` replaced by its redacted form (other
    * columns pass through unchanged).
    */
  def redact(df: DataFrame, textCol: String): DataFrame =
    df.withColumn(textCol, redactExpr(col(textCol)))
}
