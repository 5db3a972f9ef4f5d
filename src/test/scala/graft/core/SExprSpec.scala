package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the bracket/S-expression codec.
  * Fixtures from FIXTURES.md §1 / reference architxt/tree.py:1128-1275.
  */
class SExprSpec extends AnyFunSuite {

  private def roundTrip(s: String): String = SExpr.format(SExpr.parse(s))

  test("plain syntax tree round-trips (tree.py:436 fixture)") {
    val s = "(S (NP (D the) (N dog)) (VP (V chased) (NP (D the) (N cat))))"
    assert(roundTrip(s) == s)
  }

  test("typed entities under untyped nodes round-trip (tree.py:372 fixture)") {
    val s = "(S (X (ENT::person Alice) (ENT::fruit apple)) (Y (ENT::person Bob) (ENT::animal rabbit)))"
    assert(roundTrip(s) == s)
  }

  test("group fixture parses with typed labels") {
    val t = SExpr.parse(
      "(S (GROUP::A (ENT::person Alice) (ENT::fruit apple)) (GROUP::B (ENT::person Charlie) (ENT::animal dog)))")
    assert(t.label == Plain("S"))
    assert(t.childTrees.map(_.label) ==
      Vector(Typed(NodeType.Group, "A"), Typed(NodeType.Group, "B")))
    assert(t.childTrees.head.childTrees.head.leaves == Vector("Alice"))
  }

  test("leaves with spaces are percent-quoted on format and decoded on parse") {
    val t = ArchiTree.leafNode("ENT::city", "New York")
    val s = SExpr.format(t)
    assert(s == "(ENT::city New%20York)")
    assert(SExpr.parse(s).leaves == Vector("New York"))
  }

  test("parens and percent in leaves survive a round-trip") {
    val t = ArchiTree.leafNode("ENT::x", "a(b)c", "50%")
    val parsed = SExpr.parse(SExpr.format(t))
    assert(parsed.leaves == Vector("a(b)c", "50%"))
  }

  test("lone '(' opens an empty-label node (NLTK-compat, reference parser)") {
    val t = SExpr.parse("((A b))")
    assert(t.label == Plain(""))
    assert(t.childTrees.head.label == Plain("A"))
    assert(t.childTrees.head.leaves == Vector("b"))
  }

  test("unbalanced ')' raises") {
    assertThrows[SExpr.ParseException](SExpr.parse("(S (NP a)))"))
  }

  test("missing ')' raises") {
    assertThrows[SExpr.ParseException](SExpr.parse("(S (NP a)"))
  }

  test("trailing garbage after tree raises") {
    assertThrows[SExpr.ParseException](SExpr.parse("(S a) extra"))
  }

  test("empty input raises") {
    assertThrows[SExpr.ParseException](SExpr.parse("   "))
  }

  test("quote/unquote are inverse on unicode") {
    val s = "héllo wörld / ok_.-~"
    assert(SExpr.unquote(SExpr.quote(s)) == s)
    assert(SExpr.quote("a/b") == "a/b") // '/' is safe, like urllib quote
  }
}
