package graft.cypher

import graft.core._
import graft.model.TreeRow
import graft.sources.RelationalLoader
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Property-graph loader (reference database/loader/cypher.py:17-175):
  * root nodes = nodes with no incoming edge; undirected BFS with a
  * per-tree visited RELATION-TYPE set; relation types carrying
  * properties become a GROUP of the edge data linked by two RELs.
  *
  * Input is two DataFrames — (id, label, props) nodes and (src, dst,
  * tpe, props) edges — rather than a live Neo4j session. The adjacency
  * is broadcast and trees are built distributed over root nodes; for
  * graphs whose edge list exceeds broadcast size, pre-partition the
  * edges and run per-component (the traversal itself is data-dependent,
  * like the reference's per-root cursor walk).
  */
object CypherLoader {

  final case class GraphNode(id: String, label: String, props: Seq[(String, String)])
  final case class GraphEdge(src: String, dst: String, tpe: String, props: Seq[(String, String)])

  def load(
      spark: SparkSession,
      nodesDf: DataFrame,
      edgesDf: DataFrame,
      sample: Int = 0,
  ): Dataset[TreeRow] = {
    import spark.implicits._

    val nodes: Map[String, GraphNode] = nodesDf
      .select("id", "label", "props")
      .collect()
      .map { r =>
        val props = r.getMap[String, String](2).toSeq.sortBy(_._1)
        r.getString(0) -> GraphNode(r.getString(0), r.getString(1), props)
      }.toMap

    val edges: Seq[GraphEdge] = edgesDf
      .select("src", "dst", "tpe", "props")
      .collect()
      .map(r => GraphEdge(r.getString(0), r.getString(1), r.getString(2),
        r.getMap[String, String](3).toSeq.sortBy(_._1)))
      .toSeq

    val hasIncoming = edges.map(_.dst).toSet
    var roots = nodes.keys.toSeq.filterNot(hasIncoming.contains).sorted
    if (sample > 0) roots = roots.take(sample)

    val relationsWithData: Set[String] =
      edges.groupBy(_.tpe).collect { case (t, es) if es.exists(_.props.nonEmpty) => t }.toSet

    // undirected adjacency (cypher.py:76-83 matches (n)-[r]-(m))
    val adjacency: Map[String, Seq[(GraphEdge, String)]] =
      (edges.map(e => e.src -> (e, e.dst)) ++ edges.map(e => e.dst -> (e, e.src)))
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap

    val nodesB = spark.sparkContext.broadcast(nodes)
    val adjB = spark.sparkContext.broadcast(adjacency)
    val rwdB = spark.sparkContext.broadcast(relationsWithData)

    spark.createDataset(roots).map { rootId =>
      val children = readNode(
        nodesB.value(rootId), nodesB.value, adjB.value, rwdB.value,
        scala.collection.mutable.Set.empty[String])
      val tree = ArchiTree(Plain("ROOT"), children.map(t => Child.Node(t): Child).toVector)
      // graph node ids are unique, so a 60-bit hash of the root oid is a
      // collision-safe-enough tree id here (unlike declared relational
      // pks, which the loader no longer trusts for identity)
      val oid = ArchiTree.deterministicOid("cypher", rootId)
      TreeRow(java.lang.Long.parseUnsignedLong(oid.take(15), 16) & Long.MaxValue,
        TreeJson.toJson(tree))
    }
  }

  private def buildGroup(label: String, props: Seq[(String, String)]): ArchiTree =
    ArchiTree(
      Typed(NodeType.Group, label),
      props.collect { case (k, v) if v != null && v.nonEmpty =>
        Child.Node(ArchiTree(Typed(NodeType.Ent, k), Vector(Child.Leaf(v))))
      }.toVector)

  private def buildRelation(a: ArchiTree, b: ArchiTree, relName: String): ArchiTree =
    ArchiTree(Typed(NodeType.Rel, relName), Vector(Child.Node(a), Child.Node(b)))

  /** read_node (cypher.py:55-85): the node's group, then per unvisited
    * relation type the relation trees and the recursive neighbor walk.
    */
  private def readNode(
      node: GraphNode,
      nodes: Map[String, GraphNode],
      adjacency: Map[String, Seq[(GraphEdge, String)]],
      relationsWithData: Set[String],
      visited: scala.collection.mutable.Set[String],
  ): Seq[ArchiTree] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[ArchiTree]
    out += buildGroup(node.label, node.props)

    adjacency.getOrElse(node.id, Seq.empty).foreach { case (edge, otherId) =>
      if (!visited.contains(edge.tpe)) {
        visited += edge.tpe
        val other = nodes(otherId)
        val nGroup = buildGroup(node.label, node.props)
        val mGroup = buildGroup(other.label, other.props)
        if (relationsWithData.contains(edge.tpe)) {
          val edgeGroup = buildGroup(edge.tpe, edge.props)
          out += buildRelation(edgeGroup, nGroup, edge.tpe)
          out += buildRelation(edgeGroup, mGroup, edge.tpe)
        } else {
          out += buildRelation(nGroup, mGroup, edge.tpe)
        }
        out ++= readNode(other, nodes, adjacency, relationsWithData, visited)
      }
    }
    out.toSeq
  }
}
