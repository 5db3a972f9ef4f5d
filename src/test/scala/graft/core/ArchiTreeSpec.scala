package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Structural-operation goldens ported from the reference doctests
  * (architxt/tree.py — reduce :775-828, group_instances :622-667,
  * has_unlabelled_nodes :740-753, merge :755-773).
  */
class ArchiTreeSpec extends AnyFunSuite {

  private def t(s: String): ArchiTree = SExpr.parse(s)

  test("reduce_all doctest: deep single-child chains splice to leaves") {
    val in = t("(S (X (Y (Z (NP Alice)))) (VP (VB likes) (NP (NNS apples))))")
    assert(in.reduceAll().render == "(S Alice (VP likes apples))")
  }

  test("reduce_all with skip_types keeps typed single-child nodes") {
    val in = t("(S (X (ENT::a aaa)) (Y (B bbb)))")
    assert(in.reduceAll(Set(NodeType.Ent)).render == "(S (ENT::a aaa) bbb)")
  }

  test("reduce_all never reduces the root") {
    val in = t("(S (X xxx))")
    assert(in.reduceAll().render == "(S xxx)")
  }

  test("group_instances doctest: group A rows in order") {
    val tree = t(
      "(S (GROUP::A (ENT::person Alice) (ENT::fruit apple)) " +
        "(GROUP::A (ENT::person Bob) (ENT::fruit banana)) " +
        "(GROUP::B (ENT::person Charlie) (ENT::animal dog)))")
    assert(tree.groupInstances("A") == Vector(
      Map("person" -> "Alice", "fruit" -> "apple"),
      Map("person" -> "Bob", "fruit" -> "banana")))
    assert(tree.groupInstances("B") == Vector(Map("person" -> "Charlie", "animal" -> "dog")))
    assert(tree.groupInstances("C") == Vector.empty)
  }

  test("group_instances deduplicates identical rows (drop_duplicates)") {
    val tree = t(
      "(S (GROUP::A (ENT::p x)) (GROUP::A (ENT::p x)) (GROUP::A (ENT::p y)))")
    assert(tree.groupInstances("A") == Vector(Map("p" -> "x"), Map("p" -> "y")))
  }

  test("group_instances joins multi-leaf entities with spaces") {
    val tree = t("(S (GROUP::A (ENT::name New York)))")
    assert(tree.groupInstances("A") == Vector(Map("name" -> "New York")))
  }

  test("has_unlabelled_nodes doctest: untyped children → true, typed → false") {
    assert(t("(S (X xxx) (Y yyy) (Z zzz))").hasUnlabelledNodes)
    assert(!t("(S (ENT::X xxx) (REL::Y yyy) (COLL::Z zzz))").hasUnlabelledNodes)
  }

  test("has_unlabelled_nodes counts string-leaf children (tree.py:753)") {
    assert(t("(X xxx)").hasUnlabelledNodes)
  }

  test("merge keeps subtree levels; ROOT labels flatten") {
    val a = t("(ROOT (GROUP::A (ENT::x 1)))")
    val b = t("(GROUP::B (ENT::y 2))")
    assert(a.merge(b).render == "(ROOT (GROUP::A (ENT::x 1)) (GROUP::B (ENT::y 2)))")
    val c = t("(S (NP x))")
    assert(c.merge(c).render == "(ROOT (S (NP x)) (S (NP x)))")
  }

  test("height is NLTK-compatible: node over leaves = 2") {
    assert(t("(ENT::x aaa)").height == 2)
    assert(t("(S (NP (D the) (N dog)))").height == 4)
  }

  test("entities returns pre-order ENT subtrees; entityLabels the name set") {
    val tree = t("(S (X (ENT::person Alice)) (ENT::fruit apple))")
    assert(tree.entities.map(_.label.name) == Vector("person", "fruit"))
    assert(tree.entityLabels == Set("person", "fruit"))
  }

  test("hasDuplicateEntity detects repeated entity labels") {
    assert(t("(S (ENT::a 1) (ENT::a 2))").hasDuplicateEntity)
    assert(!t("(S (ENT::a 1) (ENT::b 2))").hasDuplicateEntity)
  }

  test("updated/apply navigate and replace by path") {
    val tree = t("(S (NP (D the) (N dog)) (VP run))")
    assert(tree(Vector(0, 1)).render == "(N dog)")
    val swapped = tree.updated(Vector(0, 1), t("(N cat)"))
    assert(swapped.render == "(S (NP (D the) (N cat)) (VP run))")
  }

  test("deterministicOid is stable, hex, and distinct per input") {
    val a = ArchiTree.deterministicOid("ns", "customer", "1")
    val b = ArchiTree.deterministicOid("ns", "customer", "2")
    assert(a == ArchiTree.deterministicOid("ns", "customer", "1"))
    assert(a != b)
    assert(a.matches("[0-9a-f]{32}"))
  }
}
