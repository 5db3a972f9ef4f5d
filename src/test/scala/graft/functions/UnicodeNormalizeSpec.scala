package graft.functions

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class UnicodeNormalizeSpec extends AnyFunSuite with SparkSpec {

  private def nfc(raw: String): String = {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq(raw).toDF("s")
      .select(UnicodeNormalize.nfcCol(org.apache.spark.sql.functions.col("s")))
      .collect().head.getString(0)
  }

  test("decomposed sequences compose; already-canonical text is unchanged") {
    assert(nfc("café") == "café")
    assert(nfc("naïve") == "naïve")
    assert(nfc("plain ascii") == "plain ascii")
    assert(nfc("café") == "café")
    assert(nfc("") == "")
  }

  test("nulls pass through and the operator flags only changed rows") {
    import spark.implicits._
    val df = Seq((1L, "café"), (2L, "plain")).toDF("doc_id", "text")
      .unionByName(Seq((3L, Option.empty[String])).toDF("doc_id", "text"))
    val out = graft.operators.TextAnalysis.normalizeNfc(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), Option(r.get(2)).map(_.asInstanceOf[Boolean])))).toMap
    assert(out(1L) == ((Some("caf\u00e9"), Some(true))))
    assert(out(2L) == ((Some("plain"), Some(false))))
    assert(out(3L) == ((None, None)))
  }

  test("the expression stays inside whole-stage codegen") {
    import org.apache.spark.sql.functions._
    GraftFunctions.register(spark)
    // a local Seq collapses to LocalTableScan (driver-side eval); range
    // forces a genuine codegen stage the projection must join
    val df = spark.range(4)
      .select(UnicodeNormalize.nfcCol(concat(lit("café "), col("id"))).as("s"))
    val codegenStages = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenStages.nonEmpty,
      s"expected a codegen stage:\n${df.queryExecution.executedPlan}")
    assert(df.collect().map(_.getString(0)).forall(_.startsWith("caf\u00e9 ")))
  }
}
