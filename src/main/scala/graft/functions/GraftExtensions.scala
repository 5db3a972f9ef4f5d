package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the graft function
  * library at session build time, so a cluster deployment enables it
  * with `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * (no per-operator runtime registration needed, and the functions are
  * visible to plain SQL too). The operators still self-register via
  * [[GraftFunctions.register]] as a fallback for ad-hoc sessions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction(
      (
        FunctionIdentifier("graft_cosine"),
        new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
        GraftFunctions.cosineBuilder))
    extensions.injectFunction(
      (
        FunctionIdentifier("graft_nfc"),
        new ExpressionInfo(classOf[UnicodeNormalize].getName, "graft_nfc"),
        UnicodeNormalize.builder))
    extensions.injectFunction(
      (
        FunctionIdentifier("graft_l2sq"),
        new ExpressionInfo(classOf[L2Squared].getName, "graft_l2sq"),
        GraftFunctions.l2sqBuilder))
    extensions.injectFunction(
      (
        FunctionIdentifier("graft_pq_assign"),
        new ExpressionInfo(classOf[PqAssignCode].getName, "graft_pq_assign"),
        GraftFunctions.pqAssignBuilder))
    extensions.injectFunction(
      (
        FunctionIdentifier("graft_cosine_argmax"),
        new ExpressionInfo(classOf[ArgmaxCosine].getName, "graft_cosine_argmax"),
        GraftFunctions.cosineArgmaxBuilder))
    extensions.injectFunction(
      (
        FunctionIdentifier("graft_matvec"),
        new ExpressionInfo(classOf[MatVec].getName, "graft_matvec"),
        GraftFunctions.matVecBuilder))
  }
}
