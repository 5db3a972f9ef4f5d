package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dense matrix–vector product: `out[i] = Σ_j mat[i][j] · v[j]`
  * over a row-major `array<array<double>>` matrix column (in practice a
  * literal carrying a trained model — plan size O(1) in the matrix) and
  * an `array<double>` vector column.
  *
  * Exists for the OPQ rotation (operators/Ann.scala, Ge/He/Ke/Sun,
  * "Optimized Product Quantization", CVPR 2013 — public): rotating
  * every corpus vector is a per-row map-side kernel on THE 100 TB scan,
  * so it follows the engine rule that hot kernels are `doGenCode`
  * Catalyst expressions, not higher-order-function chains (Spark's
  * `transform`/`aggregate` are CodegenFallback) and not UDFs.
  *
  * Semantics:
  * - sequential left-to-right accumulation per output coordinate, so
  *   the result is deterministic and an oracle summing the same terms
  *   in index order replays it exactly
  * - null if either side is null, if any matrix row's length differs
  *   from the vector length, or if any element is null
  * - the identity matrix reproduces the input BIT-FOR-BIT (0.0 + x = x
  *   and 1.0 · x = x in IEEE double), which anchors the OPQ = PQ
  *   equivalence at zero rotation iterations
  *
  * Input contract: children must already be `array<array<double>>` and
  * `array<double>` — callers cast explicitly (the implicit-cast hooks
  * are private[sql]).
  */
case class MatVec(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_matvec"

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): MatVec =
    copy(left = newLeft, right = newRight)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val mat = a.asInstanceOf[ArrayData]
    val vec = b.asInstanceOf[ArrayData]
    val rows = mat.numElements()
    val n = vec.numElements()
    val out = new Array[Any](rows)
    var i = 0
    while (i < rows) {
      if (mat.isNullAt(i)) return null
      val row = mat.getArray(i)
      if (row.numElements() != n) return null
      var s = 0.0
      var j = 0
      while (j < n) {
        if (row.isNullAt(j) || vec.isNullAt(j)) return null
        s += row.getDouble(j) * vec.getDouble(j)
        j += 1
      }
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh locals: several instances can share one generated method
      // scope (subexpression elimination), where fixed names collide
      // and silently fall the projection back to interpreted eval
      val rows = ctx.freshName("rows")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val row = ctx.freshName("row")
      val s = ctx.freshName("s")
      s"""
         |int $rows = $a.numElements();
         |int $n = $b.numElements();
         |double[] $out = new double[$rows];
         |for (int $i = 0; $i < $rows && !${ev.isNull}; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  org.apache.spark.sql.catalyst.util.ArrayData $row = $a.getArray($i);
         |  if ($row.numElements() != $n) { ${ev.isNull} = true; break; }
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    if ($row.isNullAt($j) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    $s += $row.getDouble($j) * $b.getDouble($j);
         |  }
         |  $out[$i] = $s;
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         |}
       """.stripMargin
    })
}
