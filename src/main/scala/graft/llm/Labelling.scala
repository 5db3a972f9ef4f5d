package graft.llm

import graft.core._
import graft.model.{Forest, TreeRow}
import graft.model.{Schema => GraftSchema}
import org.apache.spark.sql.Dataset

/** LLM-assisted schema labelling (reference
  * architxt/labelling/__init__.py:71-164): propose SNAKE_CASE renames
  * for groups (given sample rows + attributes) and relations (given the
  * renamed side tables), then apply them over the forest.
  *
  * The renaming application is the Spark-relevant half: a broadcast
  * (type, name) → name map over one `mapTrees` pass. Proposal calls are
  * driver-side — one per group/relation, small by construction.
  */
object Labelling {

  final case class Renaming(nodeType: NodeType, oldName: String, newName: String)

  /** Deterministic env-free labelling client: answers every proposal
    * prompt with the current name upper-cased — protocol-preserving
    * stand-in (prompt parse → completion → normalize → apply) that a
    * live endpoint replaces through the same [[LlmClient]] seam.
    */
  final class UppercaseLabelClient extends LlmClient {
    override def complete(prompt: String): String =
      prompt.linesIterator.collectFirst {
        case l if l.startsWith("Current Name: ") =>
          l.stripPrefix("Current Name: ")
        case l if l.startsWith("Current Relationship Name: ") =>
          l.stripPrefix("Current Relationship Name: ")
      }.fold("")(_.toUpperCase)
  }

  // Full vocabulary normalization (NFKC, non-alphanumerics → '_') — a
  // chatty multi-line or punctuated answer must never become a label
  private def normalizeAnswer(raw: String): String =
    LlmRewrite.normalize(raw.takeWhile(c => c != '\n' && c != '\r'))

  /** One rename proposal per group (llm_group_labelling): prompt carries
    * the attribute list and up to `sampleSize` JSON sample rows from the
    * group's extracted dataset.
    */
  def groupLabelling(
      schema: GraftSchema,
      client: LlmClient,
      samples: Map[String, Seq[String]] = Map.empty,
      sampleSize: Int = 5,
  ): Set[Renaming] =
    schema.groups.flatMap { group =>
      val attributes = group.entities.toSeq.sorted.mkString(", ")
      val sampleStr = samples.get(group.name) match {
        case Some(rows) if rows.nonEmpty => rows.take(sampleSize).mkString("[", ",", "]")
        case _                           => "No sample data"
      }
      val prompt =
        "Return ONLY the SNAKE_CASE name for the database table name.\n" +
          s"Sample Data: $sampleStr\nCurrent Name: ${group.name}\n" +
          s"Attributes: $attributes\nSuggested Name:"
      val newName = normalizeAnswer(client.complete(prompt))
      if (newName.isEmpty || newName == group.name) None
      else Some(Renaming(NodeType.Group, group.name, newName))
    }

  /** One rename proposal per relation (llm_relation_labelling), shown
    * the group renames so side-table names are consistent.
    */
  def relationLabelling(
      schema: GraftSchema,
      client: LlmClient,
      groupRenames: Set[Renaming] = Set.empty,
  ): Set[Renaming] = {
    val renamed = groupRenames.collect {
      case Renaming(NodeType.Group, old, nw) => old -> nw
    }.toMap
    schema.relations.flatMap { rel =>
      val left = renamed.getOrElse(rel.left, rel.left)
      val right = renamed.getOrElse(rel.right, rel.right)
      val prompt =
        "Return ONLY the SNAKE_CASE name for the relationship between these tables.\n" +
          s"Table A: $left\nTable B: $right\n" +
          s"Current Relationship Name: ${rel.name}\nSuggested Relationship Name:"
      val newName = normalizeAnswer(client.complete(prompt))
      if (newName.isEmpty || newName == rel.name) None
      else Some(Renaming(NodeType.Rel, rel.name, newName))
    }
  }

  /** Apply renames over the forest (apply_renaming): broadcast the
    * (type, old) → new map, relabel matching typed nodes in one pass.
    */
  def applyRenaming(forest: Dataset[TreeRow], renames: Set[Renaming]): Dataset[TreeRow] = {
    val byKey: Map[(String, String), String] =
      renames.map(r => (r.nodeType.value, r.oldName) -> r.newName).toMap
    if (byKey.isEmpty) forest
    else {
      val bc = forest.sparkSession.sparkContext.broadcast(byKey)
      Forest.mapTrees(forest) { tree =>
        def go(t: ArchiTree): ArchiTree = {
          val kids = t.children.map {
            case Child.Node(c) => Child.Node(go(c)): Child
            case leaf          => leaf
          }
          val label = t.label match {
            case Typed(tpe, name) =>
              bc.value.get((tpe.value, name)).map(Typed(tpe, _)).getOrElse(t.label)
            case other => other
          }
          t.copy(label = label, children = kids)
        }
        go(tree)
      }
    }
  }
}
