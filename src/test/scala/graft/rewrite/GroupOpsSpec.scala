package graft.rewrite

import graft.core._
import graft.similarity.{ClusterModel, ClusterSummary, LevelFeature, Similarity, StructKey, SubtreeFeature}
import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's FindSubGroups/MergeGroups goldens
  * (tests/simplification/tree_rewriting/operations/test_find_subgroups.py
  * and test_merge_groups.py), driven through a pre-populated
  * ClusterModel — the same fit() bypass as the reference's
  * create_test_clusterer (operations/__init__.py).
  */
class GroupOpsSpec extends AnyFunSuite {

  /** create_test_clusterer: member probability 1.0, support = member
    * count, features = the detached member trees (no ancestor context).
    */
  private def testModel(clusters: Map[String, Seq[String]]): ClusterModel = {
    val summaries = clusters.map { case (name, rendered) =>
      val members = rendered.zipWithIndex.map { case (s, i) =>
        val t = SExpr.parse(s)
        val f = SubtreeFeature(
          Vector(LevelFeature(s"$name/$i", t.label.render, t.label.isTyped, t.entityLabels)),
          t.height, 0)
        (f, 1.0)
      }.toVector
      name -> ClusterSummary(name, members.size,
        members.map(m => StructKey.of(m._1)).toSet, members,
        members.map(_._1.self.entLabels.size.toDouble).sum / members.size, 0.0)
    }
    new ClusterModel(summaries, tau = 0.8, decay = Similarity.Decay, "jaccard")
  }

  /** The reference tests overwrite the nondeterministic UNDEF_<uuid>
    * parent rename with a fixed name before comparing; mirrored here.
    */
  private def relabel(t: ArchiTree, i: Int, name: String): ArchiTree =
    t.copy(children = t.children.updated(i,
      Child.Node(t.childTrees(i).copy(label = Plain(name))): Child))

  test("find_subgroups: no simplify when no cluster shares entity labels") {
    val tree = SExpr.parse("(SENT (1 (ENT::A 1) (ENT::B 2) (ENT::C 3)))")
    val model = testModel(Map("2" -> Seq("(GROUP::2 (ENT::X 1) (ENT::Y 2))")))
    val (out, changed) = GroupOps.findSubGroups(tree, model, 0, "t")
    assert(!changed)
    assert(out.render == "(SENT (1 (ENT::A 1) (ENT::B 2) (ENT::C 3)))")
  }

  test("find_subgroups: simple extraction takes the cluster's name") {
    val tree = SExpr.parse("(SENT (1 (ENT::A 1) (ENT::B 2) (ENT::C 3)))")
    val model = testModel(Map("2" -> Seq("(GROUP::2 (ENT::A 1) (ENT::B 2))")))
    val (out, changed) = GroupOps.findSubGroups(tree, model, 0, "t")
    assert(changed)
    assert(out.render == "(SENT (1 (GROUP::2 (ENT::A 1) (ENT::B 2)) (ENT::C 3)))")
  }

  test("find_subgroups: a typed parent is renamed UNDEF on extraction") {
    val tree = SExpr.parse("(SENT (GROUP::1 (ENT::A 1) (ENT::B 2) (ENT::C 3)))")
    val model = testModel(Map("2" -> Seq(
      "(GROUP::2 (ENT::A 1) (ENT::B 2))",
      "(GROUP::2 (ENT::A 1) (ENT::B 2))")))
    val (out, changed) = GroupOps.findSubGroups(tree, model, 0, "t")
    assert(changed)
    assert(out.childTrees(0).label.render.startsWith("UNDEF_"))
    assert(relabel(out, 0, "XXX").render ==
      "(SENT (XXX (GROUP::2 (ENT::A 1) (ENT::B 2)) (ENT::C 3)))")
  }

  test("find_subgroups: the largest matching combination wins") {
    val tree = SExpr.parse("(SENT (1 (ENT::A 1) (ENT::B 2) (ENT::C 3) (ENT::D 4)))")
    val model = testModel(Map(
      "2" -> Seq("(GROUP::2 (ENT::A 1) (ENT::B 2) (ENT::C 3))"),
      "3" -> Seq("(GROUP::3 (ENT::A 1) (ENT::B 2))")))
    val (out, changed) = GroupOps.findSubGroups(tree, model, 0, "t")
    assert(changed)
    assert(out.render ==
      "(SENT (1 (GROUP::2 (ENT::A 1) (ENT::B 2) (ENT::C 3)) (ENT::D 4)))")
  }

  test("find_subgroups: multiple disjoint groups extract in one pass") {
    val tree = SExpr.parse("(SENT (1 (ENT::A 1) (ENT::B 2) (ENT::C 3) (ENT::D 4) (ENT::E 5)))")
    val model = testModel(Map(
      "2" -> Seq("(GROUP::2 (ENT::A 1) (ENT::B 2))"),
      "3" -> Seq("(GROUP::3 (ENT::D 4) (ENT::E 5))")))
    val (out, changed) = GroupOps.findSubGroups(tree, model, 0, "t")
    assert(changed)
    assert(out.render ==
      "(SENT (1 (GROUP::2 (ENT::A 1) (ENT::B 2)) (ENT::C 3) (GROUP::3 (ENT::D 4) (ENT::E 5))))")
  }

  test("find_subgroups: the root's own children participate") {
    val tree = SExpr.parse("(SENT (ENT::A 1) (ENT::B 2) (ENT::C 3))")
    val model = testModel(Map("2" -> Seq("(GROUP::2 (ENT::A 1) (ENT::B 2))")))
    val (out, changed) = GroupOps.findSubGroups(tree, model, 0, "t")
    assert(changed)
    assert(out.render == "(SENT (GROUP::2 (ENT::A 1) (ENT::B 2)) (ENT::C 3))")
  }

  test("merge_groups: two groups merge into the matching cluster") {
    val tree = SExpr.parse("(SENT (1 (GROUP::2 (ENT::A 1) (ENT::B 2)) (GROUP::3 (ENT::C 3) (ENT::D 4))))")
    val model = testModel(Map(
      "2" -> Seq("(GROUP::2 (ENT::A 1) (ENT::B 2) (ENT::C 3) (ENT::D 4))")))
    val (out, changed) = GroupOps.mergeGroups(tree, model, 0, "t")
    assert(changed)
    assert(out.render ==
      "(SENT (1 (GROUP::2 (ENT::A 1) (ENT::B 2) (ENT::C 3) (ENT::D 4))))")
  }

  test("merge_groups: a group extends with a sibling entity") {
    val tree = SExpr.parse(
      "(SENT (1 (GROUP::2 (ENT::A 1) (ENT::B 2)) (ENT::C 3) (GROUP::3 (ENT::D 4) (ENT::E 5))))")
    val model = testModel(Map(
      "2" -> Seq("(GROUP::2 (ENT::A 1) (ENT::B 2))"),
      "4" -> Seq("(GROUP::4 (ENT::A 1) (ENT::B 2) (ENT::C 3))")))
    val (out, changed) = GroupOps.mergeGroups(tree, model, 0, "t")
    assert(changed)
    assert(out.render ==
      "(SENT (1 (GROUP::4 (ENT::A 1) (ENT::B 2) (ENT::C 3)) (GROUP::3 (ENT::D 4) (ENT::E 5))))")
  }
}
