package graft.nlp

import graft.core.SExpr
import org.scalatest.funsuite.AnyFunSuite

/** Doctest goldens from architxt/nlp/parser/__init__.py and brat/utils. */
class NlpSpec extends AnyFunSuite {

  test("fix_coord doctest") {
    val t = MTree.parse("(S (NP Alice) (VP (VB eats) (NP (NNS apples) (COORD (CCONJ and) (NP (NNS oranges))))))")
    assert(NlpOps.fixCoord(t.node(Vector(1)), 1))
    assert(t.toString == "(S (NP Alice) (VP (VB eats) (CONJ (NP (NNS apples)) (NP (NNS oranges)))))")
  }

  test("fix_conj doctests") {
    val t1 = MTree.parse("(S (NP Alice) (VP (VB eats) (CONJ (NP (NNS apples)) (NP (NNS oranges)))))")
    assert(!NlpOps.fixConj(t1.node(Vector(1)), 1))

    val t2 = MTree.parse(
      "(S (NP Alice) (VP (VB eats) (CONJ (NP (NNS apples)) (CONJ (NP (NNS oranges)) (NP (NNS bananas))))))")
    assert(NlpOps.fixConj(t2.node(Vector(1)), 1))
    assert(t2.toString ==
      "(S (NP Alice) (VP (VB eats) (CONJ (NP (NNS apples)) (NP (NNS oranges)) (NP (NNS bananas)))))")
  }

  test("fix_all_coord doctests incl. nested coordination") {
    val t = MTree.parse("(S (NP Alice) (VP (VB eats) (NP (NNS apples) (COORD (CCONJ and) (NP (NNS oranges))))))")
    NlpOps.fixAllCoord(t)
    assert(t.toString == "(S (NP Alice) (VP (VB eats) (CONJ (NP (NNS apples)) (NP (NNS oranges)))))")

    val t2 = MTree.parse(
      "(S (NP Alice) (VP (VB eats) (NP (NNS apples) (COORD (CCONJ and) (NP (NNS oranges) (COORD (CCONJ and) (NP (NNS bananas))))))))")
    NlpOps.fixAllCoord(t2)
    assert(t2.toString ==
      "(S (NP Alice) (VP (VB eats) (CONJ (NP (NNS apples)) (NP (NNS oranges)) (NP (NNS bananas)))))")
  }

  test("ins_ent doctests: single-leaf and span entities") {
    val t = MTree.parse("(S (NP Alice) (VP (VB like) (NP (NNS apples))))")
    NlpOps.insEnt(t, TreeEntity("person", Seq(Vector(0, 0))))
    assert(t.toString == "(S (ENT::person Alice) (VP (VB like) (NP (NNS apples))))")
    NlpOps.insEnt(t, TreeEntity("fruit", Seq(Vector(1, 1, 0, 0))))
    assert(t.toString == "(S (ENT::person Alice) (VP (VB like) (ENT::fruit apples)))")

    val t2 = MTree.parse("(S (NP Alice) (VP (VB like) (NP (NNS apples))))")
    NlpOps.insEnt(t2, TreeEntity("xxx", Seq(Vector(1, 0, 0), Vector(1, 1, 0, 0))))
    assert(t2.toString == "(S (NP Alice) (ENT::xxx like apples))")

    val t3 = MTree.parse("(S (NP Alice) (VP (VB like) (NP (NNS apples))))")
    NlpOps.insEnt(t3, TreeEntity("xxx", Seq(Vector(0, 0), Vector(1, 1, 0, 0))))
    assert(t3.toString == "(S (ENT::xxx Alice apples) (VP (VB like)))")

    val t4 = MTree.parse("(S (NP Alice) (VP (VB like) (NP (NNS apples))))")
    NlpOps.insEnt(t4, TreeEntity("xxx", Seq(Vector(0, 0), Vector(1, 0, 0), Vector(1, 1, 0, 0))))
    assert(t4.toString == "(S (ENT::xxx Alice like apples))")
    NlpOps.insEnt(t4, TreeEntity("yyy", Seq(Vector(0, 2))))
    assert(t4.toString == "(S (ENT::xxx Alice like (ENT::yyy apples)))")
  }

  test("ins_ent doctests: flat tree with overlap duplication") {
    val t = MTree.parse("(S x y z)")
    NlpOps.insEnt(t, TreeEntity("XY", Seq(Vector(0), Vector(1))))
    assert(t.toString == "(S (ENT::XY x y) z)")
    NlpOps.insEnt(t, TreeEntity("YZ", Seq(Vector(0, 1), Vector(1))))
    assert(t.toString == "(S (ENT::XY x y) (ENT::YZ y z))")
  }

  test("ins_ent records the entity value as metadata") {
    val t = MTree.parse("(S x y z)")
    NlpOps.insEnt(t, TreeEntity("XY", Seq(Vector(0), Vector(1)), Some("AAA")))
    assert(t.node(Vector(0)).metadata.get("value").contains("AAA"))
  }

  test("unnest_ent doctest") {
    val t = MTree.parse("(S (ENT::person Alice (ENT::person Bob) (ENT::person Charlie)))")
    NlpOps.unnestEnt(t.node(Vector(0)), 0)
    assert(t.toString == "(S (ENT::person Alice (ENT::person Bob) (ENT::person Charlie)))")
    NlpOps.unnestEnt(t, 0)
    assert(t.toString ==
      "(S (REL (ENT::person Alice Bob Charlie) (nested (ENT::person Bob) (ENT::person Charlie))))")
  }

  test("enrich_tree doctest: entity alignment and pruning") {
    val t = MTree.parse("(S (NP Alice) (VP (VB likes) (NP (NNS apples) (CCONJ and) (NNS oranges))))")
    NlpOps.enrichTree(t, "Alice likes apples and oranges", Seq(
      Entity("person", 0, 5, "E1", "alice"),
      Entity("fruit", 12, 18, "E2", "apples"),
      Entity("fruit", 23, 30, "E3", "oranges")), Seq.empty)
    assert(t.toString == "(S (ENT::person Alice) (VP (NP (ENT::fruit apples) (ENT::fruit oranges))))")
  }

  test("enrich_tree doctest: nested/overlap case") {
    val t = MTree.parse("(S (NP XXX) (NP YYY))")
    NlpOps.enrichTree(t, "XXX YYY", Seq(
      Entity("nested1", 0, 3, "E1", "xxx"),
      Entity("nested2", 4, 7, "E2", "yyy"),
      Entity("overlap", 0, 7, "E3", "zzz")), Seq.empty)
    assert(t.toString ==
      "(S (REL (ENT::overlap XXX YYY) (nested (ENT::nested1 XXX) (ENT::nested2 YYY))))")
  }

  test("process_tree: full pipeline with UNDEF renames") {
    val tree = SExpr.parse("(S (NP Alice) (VP (VB likes) (NP (NNS apples) (CCONJ and) (NNS oranges))))")
    val sentence = AnnotatedSentence("Alice likes apples and oranges", Seq(
      Entity("person", 0, 5, "E1", "alice"),
      Entity("fruit", 12, 18, "E2", "apples"),
      Entity("fruit", 23, 30, "E3", "oranges")), Seq.empty)
    val out = NlpOps.processTree(sentence, tree)
    assert(out.isDefined)
    val rendered = out.get.render
    assert(rendered.startsWith("(ROOT "))
    assert(rendered.contains("(ENT::person Alice)"))
    assert(rendered.contains("(ENT::fruit apples)"))
    assert(rendered.contains("UNDEF_"))
  }

  test("align_tokens finds sequential spans") {
    assert(NlpOps.alignTokens(Seq("Alice", "likes", "apples"), "Alice likes apples") ==
      Seq((0, 5), (6, 11), (12, 18)))
  }

  test("brat: ann parsing, conversion filters, sentence splitting") {
    val txt = "Alice likes apples\nBob hates pears"
    val ann =
      """T1	person 0 5	Alice
        |T2	fruit 12 18	apples
        |T3	person 19 22	Bob
        |T4	freq 29 34	pears
        |R1	likes Arg1:T1 Arg2:T2
        |A1	Negated T1""".stripMargin
    val sentences = Brat.parseDocument(txt, ann)
    assert(sentences.size == 2)
    assert(sentences(0).txt == "Alice likes apples")
    assert(sentences(0).entities.map(_.name) == Seq("PERSON", "FRUIT"))
    assert(sentences(0).rels.map(_.name) == Seq("LIKES"))
    // second sentence offsets re-anchored
    assert(sentences(1).entities.map(e => (e.name, e.start, e.end)) ==
      Seq(("PERSON", 0, 3), ("FREQ", 10, 15)))
    assert(sentences(1).rels.isEmpty)
  }

  test("brat: unicode folding and entity filtering/mapping") {
    val ents = Seq(
      Brat.BratEntity("T1", "person", 0, 5, "E1"),
      Brat.BratEntity("T2", "FREQ", 10, 15, "E2"),
      Brat.BratEntity("T3", "MOMENT", 20, 25, "E3"))
    val out = Brat.convertEntities(ents, allowList = Set("MOMENT"), mapping = Map("FREQ" -> "FREQUENCE"))
    assert(out.map(_.name) == Seq("PERSON", "FREQUENCE"))
    assert(Brat.asciiFold("This is à test") == "This is a test")
  }
}
