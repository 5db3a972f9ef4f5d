package graft.metrics

import graft.SparkSpec
import graft.core._
import graft.model.Forest
import graft.rewrite.Rewrite
import org.scalatest.funsuite.AnyFunSuite

class MetricsSnapshotSpec extends AnyFunSuite with SparkSpec {

  test("snapshot metrics: coverage, counts, and post-rewrite comparison") {
    def tree(a: String, b: String) =
      SExpr.parse(s"(S (X (ENT::a $a) (ENT::b $b)) (ENT::a $a))")
    val forest = Forest.fromTrees(spark, Seq(tree("1", "2"), tree("3", "4")))
    val metrics = new Metrics(forest)

    assert(metrics.coverage == 1.0) // unchanged
    assert(metrics.clusterAmi == 1.0)
    assert(metrics.numNodes == 10) // 2 × (S, X, 2×ENT::a, ENT::b)
    assert(metrics.numType(NodeType.Ent) == 6)
    assert(metrics.numUnlabeledNodes == 4)
    assert(metrics.ratioUnlabeledNodes == 0.4)

    val rewritten = Rewrite.simpleRewrite(forest)
    metrics.update(rewritten)
    // simple_rewrite drops the duplicate ENT::a and the X node
    assert(metrics.numType(NodeType.Group) == 2)
    assert(metrics.numUnlabeledNodes == 2) // the S roots
    assert(metrics.coverage < 1.0) // entity oids changed (copies dropped)
    assert(metrics.numProductionsOrigin > 0)
    assert(metrics.groupBalanceScore == 1.0)
  }
}
