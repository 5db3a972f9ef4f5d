package graft.sinks

import graft.SparkSpec
import graft.core._
import graft.model.{Forest, Schema}
import graft.sources.{RelationalLoader, Testdata}
import org.scalatest.funsuite.AnyFunSuite

class SinksSpec extends AnyFunSuite with SparkSpec {

  test("export_sql: group tables, FK wiring, DDL on the customer star") {
    val nodes = RelationalLoader.loadNodes(spark, "/root/testdata/sf0.001", Testdata.customerDb)
    val schema = Schema.fromForest(nodes, keepUnlabelled = false)
    val ex = SqlExporter.export(nodes, schema)

    assert(ex.tables.keySet == Set("customer", "nation", "region"))
    val customer = ex.tables("customer")
    assert(customer.columns.contains("architxt_customerID"))
    assert(customer.count() == 150)
    // RIGHT orientation → the right group (nation) carries the FK column,
    // faithful to export/sql.py:114-134
    assert(ex.tables("nation").columns.contains("architxt_customerID"))
    assert(ex.tables("nation").count() == 25)
    // cast-on-export: numeric entity columns become typed
    val types = customer.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("c_custkey") == "bigint")
    assert(types("c_acctbal") == "double")
    assert(types("c_name") == "string")
    assert(ex.ddl.exists(d => d.startsWith("CREATE TABLE customer") && d.contains("PRIMARY KEY")))
  }

  test("export_sql: BOTH orientation produces a junction table") {
    def rel(l: String, r: String) = ArchiTree(Plain("ROOT"), Vector(Child.Node(
      ArchiTree(Typed(NodeType.Rel, "A<->B"), Vector(
        Child.Node(ArchiTree(Typed(NodeType.Group, "A"),
          Vector(Child.Node(ArchiTree.leafNode("ENT::x", l))), s"oidA$l")),
        Child.Node(ArchiTree(Typed(NodeType.Group, "B"),
          Vector(Child.Node(ArchiTree.leafNode("ENT::y", r))), s"oidB$r")))))))
    // both sides multi → BOTH
    val forest = Forest.fromTrees(spark, Seq(rel("1", "1"), rel("1", "2"), rel("2", "1")))
    val nodes = Forest.toNodesDF(forest)
    val schema = Schema.fromForest(nodes, keepUnlabelled = false)
    assert(schema.relations.head.orientation == graft.model.RelationOrientation.Both)
    val ex = SqlExporter.export(nodes, schema)
    assert(ex.tables.keySet == Set("A", "B", "A<->B"))
    assert(ex.tables("A<->B").columns.toSet == Set("architxt_AID", "architxt_BID"))
    assert(ex.tables("A<->B").count() == 3)
  }

  test("castOnExport picks the strongest uniform type per column") {
    import spark.implicits._
    val df = Seq(
      ("1", "1.5", "true", "2024-01-02", "2024-01-02 10:00:00", "mixed1"),
      ("2", "7.0", "false", "2024-02-03", "2024-02-03 11:30:00", "8"))
      .toDF("i", "d", "b", "dt", "ts", "s")
    val out = SqlExporter.castOnExport(df, Set.empty)
    val types = out.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types == Map(
      "i" -> "bigint", "d" -> "double", "b" -> "boolean",
      "dt" -> "date", "ts" -> "timestamp", "s" -> "string"))
  }

  test("export_sql: per-group pivot columns stay separate when entity names overlap") {
    // groups A (x,y) and B (x,z) share entity name "x" — the one-pass
    // column derivation must not leak one group's columns into the other
    def tree(i: Int) = ArchiTree(Plain("ROOT"), Vector(
      Child.Node(ArchiTree(Typed(NodeType.Group, "A"), Vector(
        Child.Node(ArchiTree.leafNode("ENT::x", s"ax$i")),
        Child.Node(ArchiTree.leafNode("ENT::y", s"ay$i"))), s"oidA$i")),
      Child.Node(ArchiTree(Typed(NodeType.Group, "B"), Vector(
        Child.Node(ArchiTree.leafNode("ENT::x", s"bx$i")),
        Child.Node(ArchiTree.leafNode("ENT::z", s"bz$i"))), s"oidB$i"))))
    val forest = Forest.fromTrees(spark, (1 to 3).map(tree))
    val nodes = Forest.toNodesDF(forest)
    val schema = Schema.fromForest(nodes, keepUnlabelled = false)
    val ex = SqlExporter.export(nodes, schema)
    assert(ex.tables("A").columns.toSet == Set("architxt_AID", "x", "y"))
    assert(ex.tables("B").columns.toSet == Set("architxt_BID", "x", "z"))
    assert(ex.tables("A").count() == 3)
    assert(ex.tables("B").count() == 3)
  }

  test("JSONL round-trips a forest") {
    val trees = Seq(
      SExpr.parse("(ROOT (GROUP::A (ENT::x New York)) (REL::r (GROUP::A (ENT::x 1)) (GROUP::B (ENT::y 2))))"),
      SExpr.parse("(S plain leaves)"))
    val forest = Forest.fromTrees(spark, trees)
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString + "/out"
    Jsonl.write(forest, dir)
    val back = Forest.collectTrees(Jsonl.read(spark, dir))
    assert(back.map(_.render).toSet == trees.map(_.render).toSet)
  }
}
