package graft.cypher

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Statement-execution seam for the Cypher export — the same pattern as
  * the LLM protocol's `LlmClient`: the reference writes its MERGE
  * statements through a live Neo4j driver session
  * (database/export/cypher.py:89-176), which is env-absent here, so the
  * pipeline is written against this trait and a deployment drops in a
  * bolt-backed implementation without touching the exporter.
  *
  * On a cluster the statement Dataset is executed per partition with
  * one session per task (`CypherExecutor.run`); index/cleanup
  * statements run once from the driver.
  */
trait CypherSession extends AutoCloseable {
  def run(statement: String): Unit
  override def close(): Unit = ()
}

/** Offline [[CypherSession]] executing the exporter's statement dialect
  * against in-memory graph state — NOT a Cypher interpreter: it
  * understands exactly the five statement shapes `CypherExporter`
  * emits (node MERGE with ON CREATE SET, matched edge MERGE with and
  * without properties, CREATE/DROP INDEX, MATCH-REMOVE cleanup) with
  * real MERGE idempotency semantics. That is what lets a spec prove
  * the exported script is EXECUTABLE and lands the right graph, not
  * just well-formed text.
  */
final class OfflineGraphSession extends CypherSession {

  final case class NodeState(label: String, oid: String,
      var props: Map[String, String], var hasOid: Boolean = true)
  final case class EdgeState(srcLabel: String, srcOid: String, tpe: String,
      dstLabel: String, dstOid: String, props: Map[String, String])

  val nodes = scala.collection.mutable.LinkedHashMap.empty[(String, String), NodeState]
  val edges = scala.collection.mutable.LinkedHashSet.empty[EdgeState]
  val indexes = scala.collection.mutable.LinkedHashSet.empty[String]

  private val nodeMerge =
    """(?s)MERGE \(n:`([^`]+)` \{ _architxt_oid: '((?:[^'\\]|\\.)*)' \}\) ON CREATE SET n \+= \{ (.*) \}""".r
  private val edgeMerge =
    ("""(?s)MATCH \(src:`([^`]+)` \{ _architxt_oid: '((?:[^'\\]|\\.)*)' \}\) """ +
      """MATCH \(dest:`([^`]+)` \{ _architxt_oid: '((?:[^'\\]|\\.)*)' \}\) """ +
      """MERGE \(src\)-\[r:`([^`]+)`(?: \{ (.*) \})?\]->\(dest\)""").r
  private val createIndex =
    """CREATE INDEX (\S+) IF NOT EXISTS FOR \(n:`([^`]+)`\) ON \(n\._architxt_oid\)""".r
  private val dropIndex = """DROP INDEX (\S+) IF EXISTS""".r
  private val removeOid = """MATCH \(n\) REMOVE n\._architxt_oid""".r

  override def run(statement: String): Unit = statement match {
    case nodeMerge(label, oid, props) =>
      val key = (label, unescape(oid))
      // MERGE: ON CREATE SET fires only for a new node — re-running the
      // script must not clobber or duplicate
      if (!nodes.contains(key))
        nodes(key) = NodeState(label, key._2, parseProps(props))
    case edgeMerge(sl, so, dl, do_, tpe, props) =>
      val (sKey, dKey) = ((sl, unescape(so)), (dl, unescape(do_)))
      require(nodes.contains(sKey), s"edge MATCH missed src node $sKey")
      require(nodes.contains(dKey), s"edge MATCH missed dest node $dKey")
      edges += EdgeState(sl, sKey._2, tpe, dl, dKey._2,
        Option(props).map(parseProps).getOrElse(Map.empty))
    case createIndex(name, _) => indexes += name
    case dropIndex(name)      => indexes -= name
    case removeOid()          => nodes.values.foreach(_.hasOid = false)
    case other =>
      throw new IllegalArgumentException(s"unsupported statement: ${other.take(120)}")
  }

  /** `k: v` Cypher map body → string map (inverse of the exporter's
    * literal rendering; quoted strings unescaped, numbers/bools kept
    * in their rendered form).
    */
  private def parseProps(body: String): Map[String, String] =
    if (body.trim.isEmpty) Map.empty
    else
      """`([^`]+)`: ('(?:[^'\\]|\\.)*'|[^,]+)""".r.findAllMatchIn(body).map { m =>
        val v = m.group(2).trim
        m.group(1) -> (if (v.startsWith("'")) unescape(v.substring(1, v.length - 1)) else v)
      }.toMap

  private def unescape(s: String): String = s.replace("\\'", "'").replace("\\\\", "\\")

  /** The resulting graph in [[CypherLoader]]'s input shape (node id =
    * oid) — closing the loop: export → execute → reload.
    */
  def nodesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    nodes.values.toSeq.map(n => (n.oid, n.label, n.props)).toDF("id", "label", "props")
  }

  def edgesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    edges.toSeq.map(e => (e.srcOid, e.dstOid, e.tpe, e.props))
      .toDF("src", "dst", "tpe", "props")
  }
}

object CypherExecutor {

  /** Statement-phase classification, shared by the driver and
    * distributed executors (ONE copy: a new statement kind from
    * CypherExporter must change phasing here and nowhere else).
    */
  private[cypher] def isIndexStmt(s: String): Boolean = s.startsWith("CREATE INDEX")
  private[cypher] def isNodeStmt(s: String): Boolean = s.startsWith("MERGE (n:")

  /** Execute an exported statement set in the three phases a live
    * write needs: indexes, then node MERGEs, then edge MERGEs — edges
    * MATCH their endpoint nodes, so node statements must all land
    * first (the statement Dataset is distinct()ed and carries no
    * order). This entry point collects, because the offline double's
    * state is driver-side; [[runDistributed]] is the per-partition
    * path a real connector uses.
    */
  def run(export: CypherExporter.CypherExport, session: CypherSession,
      cleanup: Boolean = false): Unit = {
    val stmts = export.statements.collect()
    val (idx, data) = stmts.partition(isIndexStmt)
    val (nodeStmts, edgeStmts) = data.partition(isNodeStmt)
    idx.foreach(session.run)
    nodeStmts.foreach(session.run)
    edgeStmts.foreach(session.run)
    if (cleanup) export.cleanup.foreach(session.run)
  }

  /** Distributed execution against a live connector: the same three
    * phases, but node and edge MERGEs each run as ONE per-partition
    * pass over the statement Dataset with a session per task — the
    * factory is invoked on the executor, the statement set never
    * reaches the driver (reference write path
    * database/export/cypher.py:89-176 streams batches through a driver
    * session; at 100 TB the statement stream must stay distributed).
    *
    * Phase boundaries are separate Spark actions, so every node MERGE
    * commits before any edge MERGE starts — edges MATCH their endpoint
    * nodes. Index statements (bounded by label variety) and the cleanup
    * tail run once through a driver-side session from the same factory.
    *
    * The factory must be serializable (an `object`-held function or a
    * closure over serializable config — host, credentials — not over a
    * live connection).
    */
  def runDistributed(
      export: CypherExporter.CypherExport,
      factory: () => CypherSession,
      cleanup: Boolean = false): Unit = {
    val stmts = export.statements.persist()
    try {
      val driverSession = factory()
      try stmts.filter(isIndexStmt(_)).collect().foreach(driverSession.run)
      finally driverSession.close()

      def phase(pred: String => Boolean): Unit =
        stmts.filter(pred(_)).foreachPartition { (it: Iterator[String]) =>
          if (it.hasNext) {
            val s = factory()
            try it.foreach(s.run) finally s.close()
          }
        }
      phase(s => !isIndexStmt(s) && isNodeStmt(s))
      phase(s => !isIndexStmt(s) && !isNodeStmt(s))

      if (cleanup) {
        val tail = factory()
        try export.cleanup.foreach(tail.run) finally tail.close()
      }
    } finally stmts.unpersist()
  }
}
