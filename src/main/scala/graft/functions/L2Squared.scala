package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native squared-L2 distance over two `array<double>` columns.
  *
  * The PQ encode/score path (operators/Ann.scala) originally computed
  * this as `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0.0, _+_)`
  * — both higher-order expressions are CodegenFallback, so every corpus
  * row paid interpreted lambda dispatch in the scan that assigns PQ
  * codes (the same hotspot shape CosineSimilarity fixed for the
  * ANN/dedup kernels). This is the `doGenCode` replacement: one tight
  * primitive loop inlined by whole-stage codegen.
  *
  * Semantics are identical to the fold it replaces, bit-for-bit:
  * - sequential left-to-right accumulation of `(x-y)^2` terms, so the
  *   double result is deterministic and a relational oracle summing the
  *   same terms in index order replays it exactly
  * - null if either side is null, if the lengths differ (zip_with pads
  *   the shorter side with null, which nulls the fold), or if any
  *   element is null
  *
  * Input contract: both children must already be `array<double>` —
  * callers cast explicitly (the implicit-cast hooks are private[sql]).
  */
case class L2Squared(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_l2sq"

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): L2Squared =
    copy(left = newLeft, right = newRight)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh local names: several instances of this expression can share
      // one generated method scope (subexpression-eliminated projections),
      // where fixed names would collide
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $s += $d * $d;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $s;
         |  }
         |}
       """.stripMargin
    })
}
