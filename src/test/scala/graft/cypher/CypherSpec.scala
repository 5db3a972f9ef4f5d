package graft.cypher

import graft.SparkSpec
import graft.core._
import graft.model.{Forest, Schema}
import org.scalatest.funsuite.AnyFunSuite

class CypherSpec extends AnyFunSuite with SparkSpec {

  private def graph() = {
    import spark.implicits._
    val nodes = Seq(
      ("p1", "Person", Map("name" -> "Alice")),
      ("p2", "Person", Map("name" -> "Bob")),
      ("c1", "City", Map("city" -> "Paris"))).toDF("id", "label", "props")
    val edges = Seq(
      ("p1", "c1", "LIVES_IN", Map.empty[String, String]),
      ("p2", "c1", "LIVES_IN", Map.empty[String, String]),
      ("p1", "p2", "KNOWS", Map("since" -> "2020"))).toDF("src", "dst", "tpe", "props")
    (nodes, edges)
  }

  test("read_cypher: roots, undirected BFS, per-type visited, edge data") {
    val (nodes, edges) = graph()
    val forest = CypherLoader.load(spark, nodes, edges)
    val trees = Forest.collectTrees(forest)
    // p1 and p2 have no incoming edges? p2 has incoming (p1->p2 KNOWS)
    // and c1 has incoming; only p1 is a root
    assert(trees.size == 1)
    val rendered = trees.head.render
    assert(rendered.contains("(GROUP::Person (ENT::name Alice))"))
    assert(rendered.contains("(REL::LIVES_IN (GROUP::Person (ENT::name Alice)) (GROUP::City (ENT::city Paris)))"))
    // KNOWS carries properties → GROUP-with-data linked by two RELs
    assert(rendered.contains("(REL::KNOWS (GROUP::KNOWS (ENT::since 2020))"))
    // per-type visited: LIVES_IN traversed once even though both persons have it
    assert("REL::LIVES_IN".r.findAllIn(rendered).size == 1)
  }

  test("read_cypher: disconnected components each yield their own trees") {
    import spark.implicits._
    val nodes = Seq(
      ("a1", "A", Map("x" -> "1")),
      ("b1", "B", Map("y" -> "2")),
      ("a2", "A", Map("x" -> "3")),
      ("iso", "Lone", Map("z" -> "9"))).toDF("id", "label", "props")
    val edges = Seq(
      ("a1", "b1", "LINKS", Map.empty[String, String])).toDF("src", "dst", "tpe", "props")
    val forest = CypherLoader.load(spark, nodes, edges)
    val trees = Forest.collectTrees(forest)
    // roots: a1 (component {a1, b1}), a2 and iso (isolated components);
    // b1 has an incoming edge
    assert(trees.size == 3)
    val rendered = trees.map(_.render).sorted
    assert(rendered.exists(r => r.contains("(REL::LINKS (GROUP::A (ENT::x 1)) (GROUP::B (ENT::y 2)))")))
    assert(rendered.exists(r => r.contains("(GROUP::A (ENT::x 3))") && !r.contains("REL::")))
    assert(rendered.exists(r => r.contains("(GROUP::Lone (ENT::z 9))")))

    // sample = 2 keeps the first two roots in sorted order (a1, a2)
    val sampled = Forest.collectTrees(CypherLoader.load(spark, nodes, edges, sample = 2))
    assert(sampled.size == 2)
    assert(!sampled.map(_.render).exists(_.contains("Lone")))
  }

  test("export_cypher: node MERGEs, edge MERGEs, cleanup") {
    val tree = SExpr.parse(
      "(ROOT (GROUP::customer (ENT::c_name Alice)) " +
        "(REL::customer<->nation (GROUP::customer (ENT::c_name Alice)) (GROUP::nation (ENT::n_name FRANCE))))")
      .copy(oid = "")
    val forest = Forest.fromTrees(spark, Seq(tree))
    val schema = Schema.fromForest(Forest.toNodesDF(forest), keepUnlabelled = false)
    val ex = CypherExporter.export(forest, schema)
    val stmts = ex.statements.collect().toSeq
    assert(stmts.exists(s => s.startsWith("MERGE (n:`customer`") && s.contains("`c_name`: 'Alice'")))
    assert(stmts.exists(s => s.startsWith("MERGE (n:`nation`")))
    assert(stmts.exists(s => s.contains("MERGE (src)-[r:`customer_nation`]->(dest)")))
    assert(ex.cleanup.exists(_.contains("REMOVE n._architxt_oid")))
  }

  test("export_cypher: collapsible group becomes an attributed edge") {
    import graft.model.{Group, Relation, RelationOrientation}
    // A --LEFT--> M <--RIGHT-- B ⇒ M collapsible
    val tree = SExpr.parse(
      "(ROOT (REL::r1 (GROUP::A (ENT::a 1)) (GROUP::M (ENT::m 5))) " +
        "(REL::r2 (GROUP::M (ENT::m 5)) (GROUP::B (ENT::b 2))))")
    val schema = Schema(
      productions = Seq.empty,
      groups = Set(Group("A", Set("a")), Group("M", Set("m")), Group("B", Set("b"))),
      relations = Set(
        Relation("r1", "A", "M", RelationOrientation.Left),
        Relation("r2", "M", "B", RelationOrientation.Right)))
    assert(schema.findCollapsibleGroups == Set("M"))
    val stmts = CypherExporter.treeStatements(tree, Set("M"))
    assert(!stmts.exists(_.contains("MERGE (n:`M`"))) // collapsible → no node
    assert(stmts.exists(s => s.contains("[r:`M` { `m`: 5 }]")))
  }

  test("offline session executes the exported script: MERGE idempotency, edge resolution, cleanup") {
    val forest = graft.sources.RelationalLoader.load(
      spark, "/root/testdata/sf0.001", graft.sources.Testdata.customerDb)
    val schema = Schema.fromForest(Forest.toNodesDF(forest))
    val ex = CypherExporter.export(forest, schema)

    val session = new OfflineGraphSession
    CypherExecutor.run(ex, session) // throws if any edge MATCH misses its node
    val byLabel = session.nodes.values.groupBy(_.label).view.mapValues(_.size).toMap
    assert(byLabel("customer") == 150)
    assert(byLabel.contains("nation") && byLabel.contains("region"))
    assert(session.edges.nonEmpty && session.indexes.size == 1)
    val nodeProps = session.nodes.values.find(_.label == "customer").get.props
    assert(nodeProps.keySet == Set("c_acctbal", "c_custkey", "c_mktsegment", "c_name"))

    // replaying the whole script must be a no-op (MERGE semantics)
    val (n0, e0) = (session.nodes.size, session.edges.size)
    CypherExecutor.run(ex, session)
    assert(session.nodes.size == n0 && session.edges.size == e0)

    // cleanup: oid property removed everywhere, index dropped
    ex.cleanup.foreach(session.run)
    assert(session.nodes.values.forall(!_.hasOid))
    assert(session.indexes.isEmpty)

    // unsupported Cypher fails loudly instead of silently succeeding
    intercept[IllegalArgumentException](session.run("DETACH DELETE n"))
  }

  test("export -> execute -> reload round trip recovers the customer rows") {
    import org.apache.spark.sql.functions.col
    val forest = graft.sources.RelationalLoader.load(
      spark, "/root/testdata/sf0.001", graft.sources.Testdata.customerDb)
    val schema = Schema.fromForest(Forest.toNodesDF(forest))
    val session = new OfflineGraphSession
    CypherExecutor.run(CypherExporter.export(forest, schema), session)
    val reloaded = CypherLoader.load(spark, session.nodesDf(spark), session.edgesDf(spark))
    val got = Schema.extractDataset(Forest.toNodesDF(reloaded), "customer")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_name"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val want = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select(col("c_custkey").cast("string"), col("c_mktsegment"), col("c_name"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == want)
    assert(got.size == 150)
  }

  test("cypher literals: numbers bare, booleans lowercase, strings quoted") {
    val props = CypherExporter.properties(SExpr.parse(
      "(GROUP::x (ENT::n 42) (ENT::f 1.5) (ENT::b true) (ENT::s O'Brien))"))
    assert(props.toMap == Map("n" -> "42", "f" -> "1.5", "b" -> "true", "s" -> "'O\\'Brien'"))
  }

  test("distributed executor: per-task factory sessions, phased passes, nothing lost") {
    val forest = graft.sources.RelationalLoader.load(
      spark, "/root/testdata/sf0.001", graft.sources.Testdata.customerDb)
    val schema = Schema.fromForest(Forest.toNodesDF(forest))
    val ex = CypherExporter.export(forest, schema)
    val want = ex.statements.collect().toSeq

    RecordingCypherSessions.reset()
    CypherExecutor.runDistributed(ex, () => RecordingCypherSessions.open(), cleanup = true)

    import scala.jdk.CollectionConverters._
    val events = RecordingCypherSessions.events.asScala.toSeq.sortBy(_._1)
    val stmts = events.map(_._2)
    // exactly the exported script plus the cleanup tail, nothing dropped
    // or duplicated across tasks
    assert(stmts.sorted == (want ++ ex.cleanup).sorted)

    // phase barriers: every index statement lands before every node
    // MERGE, every node MERGE before every edge MERGE, cleanup last —
    // the property a live bolt write needs (edges MATCH their nodes)
    def positions(p: String => Boolean) =
      stmts.zipWithIndex.collect { case (s, i) if p(s) => i }
    val idx = positions(_.startsWith("CREATE INDEX"))
    val nodes = positions(_.startsWith("MERGE (n:"))
    val edges = positions(s => s.startsWith("MATCH (src:"))
    val tail = positions(s => ex.cleanup.contains(s))
    assert(idx.nonEmpty && nodes.nonEmpty && edges.nonEmpty && tail.nonEmpty)
    assert(idx.max < nodes.min, "an index statement ran after a node MERGE")
    assert(nodes.max < edges.min, "a node MERGE ran after an edge MERGE")
    assert(edges.max < tail.min, "cleanup ran before the last edge MERGE")

    // session hygiene: every opened session was closed, and the data
    // phases opened executor-side sessions (not one driver session)
    assert(RecordingCypherSessions.opened.get() == RecordingCypherSessions.closed.get())
    assert(RecordingCypherSessions.opened.get() >= 4,
      s"expected driver + per-task sessions, got ${RecordingCypherSessions.opened.get()}")
  }
}

/** Shared-JVM recording double for the distributed executor spec: in
  * `local[n]` the executors see this object's statics, so per-task
  * sessions can append to one global, ordered event log. The factory
  * closure serializes by module reference — exactly the shape a real
  * bolt factory (closing over host/credentials, not a connection) has.
  */
object RecordingCypherSessions {
  import java.util.concurrent.ConcurrentLinkedQueue
  import java.util.concurrent.atomic.AtomicLong

  val seq = new AtomicLong(0)
  val events = new ConcurrentLinkedQueue[(Long, String)]()
  val opened = new AtomicLong(0)
  val closed = new AtomicLong(0)

  def reset(): Unit = { seq.set(0); events.clear(); opened.set(0); closed.set(0) }

  def open(): CypherSession = {
    opened.incrementAndGet()
    new CypherSession {
      override def run(statement: String): Unit =
        events.add((seq.incrementAndGet(), statement))
      override def close(): Unit = { closed.incrementAndGet(); () }
    }
  }
}
