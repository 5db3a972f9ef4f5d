package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode NFC normalization of a string column — the text
  * canonicalization step a pretraining pipeline runs before hashing,
  * dedup, or tokenization (decomposed `e + U+0301` and precomposed `é`
  * must hash identically or every downstream exact/near-dup operator
  * silently misses pairs).
  *
  * Spark has no normalization function, and a Scala UDF would pay
  * serialization dispatch per row; this is a Catalyst `UnaryExpression`
  * whose codegen calls `java.text.Normalizer` directly inside
  * whole-stage codegen. The fast path costs one `isNormalized` scan —
  * for the overwhelmingly-normalized real corpus the expression is a
  * read-only check, allocating only on rows that actually need fixing.
  *
  * NFC only (not NFKC): canonical composition is behavior-stable across
  * Unicode versions and is what cross-engine oracles (e.g. DuckDB's
  * `nfc_normalize`) implement.
  */
case class UnicodeNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_nfc"

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNormalize.nfc($c)")
}

object UnicodeNormalize {

  /** NFC of a UTF8String, returning the INPUT object unchanged when it
    * is already normalized (no copy, no re-encode).
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  private[functions] val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 1, s"graft_nfc requires exactly 1 argument, got ${args.length}")
    UnicodeNormalize(args.head)
  }

  /** NFC column; the session must have called [[GraftFunctions.register]]. */
  def nfcCol(c: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_nfc", c)
}
