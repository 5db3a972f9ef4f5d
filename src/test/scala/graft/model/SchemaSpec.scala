package graft.model

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-side schema semantics: validity matrix, extract_valid_trees
  * golden, collapsible groups, orientation — ported from
  * tests/test_schema.py and schema.py doctests.
  */
class SchemaSpec extends AnyFunSuite {

  private def t(s: String): ArchiTree = SExpr.parse(s)

  test("validity matrix (test_schema.py:8-23)") {
    val cases = Seq(
      ("(SENT word1 word2)", false, true),
      ("(SENT word1 word2)", true, true),
      ("(SENT (X word1 word2))", false, true),
      ("(SENT (X word1 word2))", true, false),
      ("(GROUP::1 (ENT::A AAA) (ENT::B bbb))", false, true),
      ("(GROUP::1 (ENT::A AAA) (ENT::B bbb))", true, true),
    )
    cases.foreach { case (s, keep, expected) =>
      val schema = Schema.fromTrees(Seq(t(s)), keepUnlabelled = keep)
      assert(schema.verify == expected, s"for '$s' keep=$keep")
    }
  }

  test("group entities merge across instances (merge_lhs)") {
    val schema = Schema.fromTrees(Seq(
      t("(S (GROUP::P (ENT::name Alice) (ENT::age 30)))"),
      t("(S (GROUP::P (ENT::name Bob) (ENT::city NYC)))")))
    assert(schema.groups == Set(Group("P", Set("name", "age", "city"))))
    // merged single production with sorted rhs
    val prod = schema.productions.find(_.lhs == "GROUP::P").get
    assert(prod.rhs == Seq("ENT::age", "ENT::city", "ENT::name"))
  }

  test("relation production keeps sorted rhs; duplicate-group relation invalid") {
    val schema = Schema.fromTrees(Seq(
      t("(S (REL::r (GROUP::B (ENT::b 1)) (GROUP::A (ENT::a 2))))")),
      keepUnlabelled = false)
    val prod = schema.productions.find(_.lhs == "REL::r").get
    assert(prod.rhs == Seq("GROUP::A", "GROUP::B"))
    assert(schema.verify)

    val bad = Schema.fromTrees(Seq(
      t("(S (REL::r (GROUP::A (ENT::a 1)) (GROUP::A (ENT::a 2))))")),
      keepUnlabelled = false)
    assert(!bad.verify)
  }

  test("relation orientation: multi side becomes the source") {
    // left member oid participates in two distinct pairs → LEFT
    def rel(leftOid: String, rightOid: String) = ArchiTree(
      Typed(NodeType.Rel, "r"),
      Vector(
        Child.Node(ArchiTree(Typed(NodeType.Group, "L"),
          Vector(Child.Node(ArchiTree.leafNode("ENT::a", "x"))), leftOid)),
        Child.Node(ArchiTree(Typed(NodeType.Group, "R"),
          Vector(Child.Node(ArchiTree.leafNode("ENT::b", "y"))), rightOid))))
    def root(ts: ArchiTree*) = ArchiTree(Plain("ROOT"), ts.map(Child.Node(_)).toVector)

    val leftMulti = Schema.fromTrees(Seq(root(rel("l1", "r1"), rel("l1", "r2"))))
    assert(leftMulti.relations == Set(Relation("r", "L", "R", RelationOrientation.Left)))

    val rightMulti = Schema.fromTrees(Seq(root(rel("l1", "r1"), rel("l2", "r1"))))
    assert(rightMulti.relations == Set(Relation("r", "L", "R", RelationOrientation.Right)))

    val both = Schema.fromTrees(Seq(root(rel("l1", "r1"), rel("l2", "r2"))))
    assert(both.relations == Set(Relation("r", "L", "R", RelationOrientation.Both)))
  }

  test("extract_valid_trees golden (test_schema.py:25-46)") {
    val schema = Schema.fromDescription(
      groups = Set(Group("1", Set("A")), Group("2", Set("C"))),
      collections = false)
    val tree1 = t("(SENT (GROUP::1 (ENT::A AAA) (ENT::B bbb)) (GROUP::3 (ENT::D DDD)))")
    val tree2 = t("(SENT (GROUP::1 (ENT::A AAA)) (COLL::1 (REL::1 (GROUP::1 (ENT::A AAA)) (GROUP::2 (ENT::C CCC)))))")
    val tree3 = t("(SENT A B C)")

    val valid = Seq(tree1, tree2, tree3).flatMap(schema.extractValidTree)
    assert(valid.size == 2)
    assert(valid(0).render == "(ROOT (GROUP::1 (ENT::A AAA)))")
    assert(valid(1).render == "(ROOT (GROUP::1 (ENT::A AAA)) (GROUP::1 (ENT::A AAA)) (GROUP::2 (ENT::C CCC)))")
  }

  test("find_collapsible_groups doctests (schema.py:457-484)") {
    import RelationOrientation._
    def s(rels: Relation*) = Schema.fromDescription(relations = rels.toSet)
    assert(s(Relation("R1", "A", "M", Left), Relation("R2", "M", "B", Right))
      .findCollapsibleGroups == Set("M"))
    assert(s(Relation("R1", "M", "B", Right), Relation("R2", "M", "C", Right))
      .findCollapsibleGroups == Set("M"))
    assert(s(Relation("R1", "A", "M", Both), Relation("R2", "M", "B", Right))
      .findCollapsibleGroups == Set.empty)
    assert(s(
      Relation("R1", "A", "M", Left), Relation("R2", "M", "B", Right),
      Relation("R2b", "M", "C", Right)).findCollapsibleGroups == Set.empty)
  }

  test("to_tree expands groups and relations (schema.py:362-373)") {
    val schema = Schema.fromDescription(
      groups = Set(Group("G1", Set("A", "B")), Group("G2", Set("A", "C", "D"))),
      relations = Set(Relation("R1", "G1", "G2", RelationOrientation.Left)),
      collections = false)
    val tree = schema.toTree
    assert(tree.render ==
      "(ROOT (GROUP::G1 (ENT::A) (ENT::B)) (GROUP::G2 (ENT::A) (ENT::C) (ENT::D)) " +
        "(REL::R1 (GROUP::G1 (ENT::A) (ENT::B)) (GROUP::G2 (ENT::A) (ENT::C) (ENT::D))))")
  }

  test("group_overlap and balance score") {
    val schema = Schema.fromDescription(groups =
      Set(Group("G1", Set("A", "B")), Group("G2", Set("A", "C"))))
    assert(math.abs(schema.groupOverlap - 1.0 / 3.0) < 1e-12)
    assert(schema.groupBalanceScore == 1.0) // equal sizes → no variation
    assert(Schema(Seq.empty, Set.empty, Set.empty).groupBalanceScore == 1.0)
  }

  test("schema union concatenates productions and unions views (schema.py:85-93)") {
    val a = Schema.fromTrees(Seq(t("(GROUP::1 (ENT::A AAA) (ENT::B bbb))")), keepUnlabelled = false)
    val b = Schema.fromTrees(Seq(t("(GROUP::2 (ENT::B bbb) (ENT::C ccc))")), keepUnlabelled = false)
    val u = a | b
    // reference keeps duplicate productions; views are set unions
    assert(u.productions == a.productions ++ b.productions)
    assert(u.groups == a.groups ++ b.groups)
    assert(u.relations == a.relations ++ b.relations)
    assert(u.entities == Set("A", "B", "C"))
    val dup = a | a
    assert(dup.productions.size == 2 * a.productions.size)
    assert(dup.groups == a.groups)
  }
}
