package graft.sources

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** FIXTURES.md §3 golden: the nested-order JSON document. */
class DocumentLoaderSpec extends AnyFunSuite with SparkSpec {

  private val orderJson =
    """{"order": {"quantity": 2,
      |           "consumer": {"name": "Alice", "age": 30},
      |           "items": [{"name": "Laptop", "price": 1000},
      |                     {"name": "Smartphone", "price": 500}]}}""".stripMargin

  test("read_tree: dict→group shape, list→COLL, scalar→ENT") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val tree = DocumentLoader.readTree(mapper.readTree(orderJson))
    assert(tree.render ==
      "(root (order (ENT::quantity 2) (consumer (ENT::name Alice) (ENT::age 30)) " +
        "(COLL::items (items (ENT::name Laptop) (ENT::price 1000)) (items (ENT::name Smartphone) (ENT::price 500)))))")
  }

  test("traverse_tree normalizes to groups and relations") {
    val trees = DocumentLoader.fromJsonString(orderJson)
    assert(trees.size == 1)
    val kids = trees.head.childTrees.map(_.label.render)
    assert(kids == Vector(
      "REL::order<->consumer", "REL::order<->items", "REL::order<->items", "REL::root<->order"))
    val relC = trees.head.childTrees.head
    assert(relC.childTrees.map(_.label.render) == Vector("GROUP::order", "GROUP::consumer"))
    assert(relC.childTrees(0).render == "(GROUP::order (ENT::quantity 2))")
    assert(relC.childTrees(1).render == "(GROUP::consumer (ENT::name Alice) (ENT::age 30))")
  }

  test("root collection yields one tree per element") {
    val json = """[{"a": {"x": 1}}, {"a": {"x": 2}}]"""
    val trees = DocumentLoader.fromJsonString(json)
    assert(trees.size == 2)
  }

  test("loadJsonLines builds a forest dataset") {
    val dir = java.nio.file.Files.createTempDirectory("docs")
    java.nio.file.Files.writeString(
      dir.resolve("docs.jsonl"),
      Seq("""{"a": {"x": 1, "b": {"y": 2}}}""", """{"a": {"x": 3}}""").mkString("\n"))
    val forest = DocumentLoader.loadJsonLines(spark, dir.toString)
    assert(forest.count() == 2)
  }
}
