package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Label parse/format contract (reference architxt/tree.py:56-94). */
class LabelSpec extends AnyFunSuite {

  test("TYPE::name parses to Typed and renders back") {
    assert(Label.parse("ENT::person") == Typed(NodeType.Ent, "person"))
    assert(Label.parse("GROUP::A").render == "GROUP::A")
    assert(Label.parse("REL::a<->b") == Typed(NodeType.Rel, "a<->b"))
    assert(Label.parse("COLL::xs") == Typed(NodeType.Coll, "xs"))
  }

  test("bare TYPE parses to Typed with empty name") {
    assert(Label.parse("ENT") == Typed(NodeType.Ent, ""))
    assert(Label.parse("ENT").render == "ENT")
  }

  test("unknown prefixes stay Plain") {
    assert(Label.parse("FOO::bar") == Plain("FOO::bar"))
    assert(Label.parse("S") == Plain("S"))
  }

  test("hasType / isTyped behave per node type") {
    assert(Label.parse("ENT::x").hasType(NodeType.Ent))
    assert(!Label.parse("ENT::x").hasType(NodeType.Group))
    assert(!Label.parse("S").isTyped)
  }
}
