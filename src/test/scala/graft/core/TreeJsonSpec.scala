package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** JSON dict codec goldens (reference architxt/tree.py:1277-1333). */
class TreeJsonSpec extends AnyFunSuite {

  test("round-trips a typed tree with oid and metadata") {
    val tree = ArchiTree(
      Typed(NodeType.Group, "customer"),
      Vector(
        Child.Node(ArchiTree(Typed(NodeType.Ent, "name"), Vector(Child.Leaf("Alice")), "oid-ent")),
        Child.Leaf("stray")),
      oid = "oid-group",
      metadata = Map("primary_keys" -> "id"))
    val back = TreeJson.fromJson(TreeJson.toJson(tree))
    assert(back == tree)
  }

  test("plain labels serialize with type:null and round-trip") {
    val tree = SExpr.parse("(S (NP Alice))")
    val json = TreeJson.toJson(tree)
    assert(json.contains("\"type\":null"))
    assert(TreeJson.fromJson(json) == tree)
  }

  test("special characters in leaves survive JSON round-trip") {
    val tree = ArchiTree.leafNode("ENT::x", "a\"b\\c\nd\ttab", "unicode é€")
    assert(TreeJson.fromJson(TreeJson.toJson(tree)) == tree)
  }

  test("empty oid serializes as null and reads back empty") {
    val tree = SExpr.parse("(ENT::a aaa)")
    val json = TreeJson.toJson(tree)
    assert(json.contains("\"oid\":null"))
    assert(TreeJson.fromJson(json).oid == "")
  }
}
