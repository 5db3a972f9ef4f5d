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

  /** (category, regex, replacement) in redaction order. */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "[IP]"),
    // a phone needs shape — a leading + or ≥ 2 separator-delimited digit
    // groups — so bare digit runs fall through to the number category.
    // (Heuristic: date-like strings `2024-01-01` also fit the shape and
    // are redacted as phones; acceptable for a masking lane.)
    ("phone", "\\+[0-9][0-9 ()./-]{6,}[0-9]|\\(?[0-9]{2,4}\\)?([ ./-][0-9]{2,4}){2,}", "[PHONE]"),
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
