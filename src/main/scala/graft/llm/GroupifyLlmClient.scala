package graft.llm

import graft.core._

/** Deterministic offline "endpoint": parses the numbered list out of the
  * prompt and simplifies each tree by wrapping untyped nodes whose
  * children are all entities into a GROUP named after the first entity —
  * a stand-in for the reference LLM's schema-induction behavior
  * (architxt/simplification/llm.py) that keeps the whole pipeline
  * (batching, numbering, parse, sanitize, vocab snap, fallback) real and
  * reproducible in a zero-egress environment. Callers with a live
  * endpoint implement [[LlmClient]] against it instead.
  */
class GroupifyLlmClient extends LlmClient {

  protected def groupify(t: ArchiTree): ArchiTree = {
    val kids = t.children.map {
      case Child.Node(c) => Child.Node(groupify(c)): Child
      case leaf          => leaf
    }
    val out = t.copy(children = kids)
    if (!out.isTyped && out.childTrees.nonEmpty &&
      out.childTrees.forall(_.hasType(NodeType.Ent)) && out.children.size == out.childTrees.size)
      out.copy(label = Typed(NodeType.Group, out.childTrees.head.label.name))
    else out
  }

  override def complete(prompt: String): String =
    LlmRewrite.parseNumberedList(prompt).zipWithIndex.map { case (json, i) =>
      val tree = TreeJson.fromJson(json)
      s"${i + 1}. ${TreeJson.toJson(groupify(tree))}"
    }.mkString("\n")
}
