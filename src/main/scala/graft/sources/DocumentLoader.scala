package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.core._
import graft.model.TreeRow
import org.apache.spark.sql.{Dataset, SparkSession}

import scala.jdk.CollectionConverters._

/** Document ingestion (reference database/loader/documents.py:104-220):
  * dictionaries become groups, lists become collections, scalars become
  * entities; `traverseTree` then normalizes to the metamodel — entities
  * of an object grouped under one GROUP, nested objects linked by
  * `REL::parent<->child` per collection element.
  *
  * Spark-first: one document per row, the whole recursion is a pure
  * per-row function (no shuffle); formats are explicit (JSON here, CSV
  * via the relational loader) instead of the reference's try-each-parser
  * chain.
  */
object DocumentLoader {

  private val mapper = new ObjectMapper()

  /** read_tree (documents.py:104-139). */
  def readTree(node: JsonNode, rootName: String = "ROOT"): ArchiTree = {
    val name = rootName.replace(' ', '_').toLowerCase
    // properties() is a java Set: map it VIA ITERATOR or Scala rebuilds a
    // hash set and loses Jackson's insertion order
    val subElements: Seq[(String, JsonNode)] =
      if (node.isObject) node.properties().iterator.asScala.map(e => e.getKey -> e.getValue).toSeq
      else if (node.isArray) node.asScala.map(c => name -> c).toSeq
      else Seq.empty

    val children = subElements.flatMap { case (childName, child) =>
      if (child.isObject || child.isArray) Some(Child.Node(readTree(child, childName)))
      else if (child.isNull || child.asText.isEmpty) None
      else
        Some(Child.Node(ArchiTree(
          Typed(NodeType.Ent, childName.replace(' ', '_').toLowerCase),
          Vector(Child.Leaf(child.asText)))))
    }.toVector

    // flatten a single nested collection (documents.py:134-136)
    children match {
      case Vector(Child.Node(only)) if only.hasType(NodeType.Coll) => only
      case _ =>
        val label = if (node.isArray) Typed(NodeType.Coll, name) else Plain(name)
        ArchiTree(label, children)
    }
  }

  /** traverse_tree (documents.py:166-220). Returns (anchor group,
    * transformed tree).
    */
  def traverseTree(tree: ArchiTree): (ArchiTree, ArchiTree) = {
    if (tree.hasType(NodeType.Ent)) {
      val group = ArchiTree(Typed(NodeType.Group, tree.label.name), Vector(Child.Node(tree)))
      return (group, group)
    }
    if (tree.hasType(NodeType.Coll)) {
      val updated = tree.copy(children =
        tree.childTrees.map(c => Child.Node(traverseTree(c)._1): Child))
      return (updated, updated)
    }

    val entities = tree.childTrees.filter(_.hasType(NodeType.Ent))
    val nonEntities = tree.childTrees.filterNot(_.hasType(NodeType.Ent))
    val groupNode = ArchiTree(
      Typed(NodeType.Group, tree.label.name),
      entities.map(e => Child.Node(e): Child))

    val relations = scala.collection.mutable.ArrayBuffer.empty[ArchiTree]
    nonEntities.foreach { child =>
      val (childGroup, childTree) = traverseTree(child)
      if (childTree.label == Plain("ROOT"))
        relations ++= childTree.childTrees

      val elements =
        if (childGroup.hasType(NodeType.Coll)) childGroup.childTrees
        else Vector(childGroup)
      elements.foreach { element =>
        val relLabel = Typed(NodeType.Rel, s"${groupNode.label.name}<->${element.label.name}")
        relations += ArchiTree(relLabel, Vector(Child.Node(groupNode), Child.Node(element)))
      }
    }

    if (relations.isEmpty) (groupNode, groupNode)
    else (groupNode, ArchiTree(Plain("ROOT"), relations.toVector.map(r => Child.Node(r): Child)))
  }

  /** parse_document_tree (documents.py:142-163): root collections yield
    * one tree per element.
    */
  def parseDocumentTree(tree: ArchiTree): Seq[ArchiTree] = {
    val sources = if (tree.hasType(NodeType.Coll)) tree.childTrees else Vector(tree)
    sources.flatMap { t =>
      val (_, parsed) = traverseTree(t)
      Option.when(parsed.children.nonEmpty)(parsed)
    }
  }

  /** One metamodel forest from one JSON string (a single document). */
  def fromJsonString(json: String): Seq[ArchiTree] =
    parseDocumentTree(readTree(mapper.readTree(json)))

  /** Load a directory/file of JSON documents, one document per LINE. */
  def loadJsonLines(spark: SparkSession, path: String): Dataset[TreeRow] = {
    import spark.implicits._
    spark.read.textFile(path).rdd
      .zipWithIndex()
      .flatMap { case (line, docIdx) =>
        fromJsonString(line).zipWithIndex.map { case (t, i) =>
          TreeRow(docIdx * 1000000 + i, TreeJson.toJson(t))
        }
      }
      .toDS()
  }
}
