package graft.metrics

import graft.core._
import graft.model.{Forest, NodeRow, Schema, TreeRow}
import graft.similarity.{SeqMetrics, TreeClusterer}
import org.apache.spark.sql.Dataset

/** Snapshot-vs-current forest comparison (reference
  * architxt/metrics.py:153-473): captures the schema, entity-oid set,
  * label counts, and entity clustering of a forest at construction, then
  * scores the current state against it after rewriting.
  */
/** Point-in-time forest state captured for comparison. Top level (not
  * nested in Metrics) so pattern matches need no outer-instance check.
  */
final case class Snapshot(
    schema: Schema,
    entityOids: Set[String],
    labelCounts: Map[String, Long],
    clustering: Map[String, String])

final class Metrics(
    source: Dataset[TreeRow],
    tau: Double = 0.7,
    decay: Double = 2.0,
    metricName: String = "jaro") {

  private def snapshot(forest: Dataset[TreeRow]): Snapshot = {
    import forest.sparkSession.implicits._
    val nodes = Forest.toNodesDF(forest)
    val schema = Schema.fromForest(nodes)
    val oids = forest.flatMap { row =>
      val tree = TreeJson.fromJson(row.tree)
      tree.positionedSubtrees.collect {
        case (path, t) if t.hasType(NodeType.Ent) =>
          if (t.oid.nonEmpty) t.oid else s"${row.treeId}/${path.mkString(".")}"
      }
    }.collect().toSet
    val labels = forest.flatMap { row =>
      TreeJson.fromJson(row.tree).subtrees.map(_.label.render)
    }.groupByKey(identity).count().collect().toMap
    val clustering = TreeClusterer.entityLabels(forest, tau, metricName, decay)
    Snapshot(schema, oids, labels, clustering)
  }

  val origin: Snapshot = snapshot(source)
  private var currentSnapshot: Snapshot = origin

  def update(forest: Dataset[TreeRow]): Unit = currentSnapshot = snapshot(forest)
  def current: Snapshot = currentSnapshot

  /** Jaccard of entity oid sets (metrics.py:226-238). */
  def coverage: Double = SeqMetrics.jaccard(origin.entityOids, currentSnapshot.entityOids)

  private def alignedLabels: (Seq[String], Seq[String]) = {
    val entities = (origin.clustering.keySet ++ currentSnapshot.clustering.keySet).toSeq.sorted
    val a = entities.zipWithIndex.map { case (e, i) => origin.clustering.getOrElse(e, s"-$i") }
    val b = entities.zipWithIndex.map { case (e, i) => currentSnapshot.clustering.getOrElse(e, s"-$i") }
    (a, b)
  }

  /** AMI between origin and current entity clusterings (metrics.py:240-258). */
  def clusterAmi: Double = {
    val (a, b) = alignedLabels
    ClusterComparison.adjustedMutualInfo(a, b)
  }

  /** Completeness between origin and current clusterings (metrics.py:260-277). */
  def clusterCompleteness: Double = {
    val (a, b) = alignedLabels
    ClusterComparison.completeness(a, b)
  }

  /** Mean redundancy over the current schema's group datasets
    * (metrics.py:279-302).
    */
  def redundancy(nodes: Dataset[NodeRow], tau: Double = 1.0): Double = {
    val groups = currentSnapshot.schema.groups.toSeq.sortBy(_.name)
    if (groups.isEmpty) return 0.0
    val scores = groups.map(g => FdMetrics.redundancyScore(Schema.extractDataset(nodes, g.name), tau))
    scores.sum / scores.size
  }

  def numNodes: Long = currentSnapshot.labelCounts.values.sum
  def numNonTerminal: Int = currentSnapshot.labelCounts.size
  def numUnlabeledNodes: Long = currentSnapshot.labelCounts.collect {
    case (l, c) if !Label.parse(l).isTyped => c
  }.sum
  def ratioUnlabeledNodes: Double =
    if (numNodes == 0) 0 else numUnlabeledNodes.toDouble / numNodes

  def numType(t: NodeType): Long = currentSnapshot.labelCounts.collect {
    case (l, c) if Label.parse(l).hasType(t) => c
  }.sum
  def numDistinctType(t: NodeType): Int =
    currentSnapshot.labelCounts.keys.count(l => Label.parse(l).hasType(t))
  def ratioType(t: NodeType): Double = {
    val d = numDistinctType(t)
    if (d == 0) 0 else numType(t).toDouble / d
  }

  def numProductions: Int = currentSnapshot.schema.productions.size
  def numProductionsOrigin: Int = origin.schema.productions.size
  def ratioProductions: Double =
    if (numProductionsOrigin == 0) 0 else numProductions.toDouble / numProductionsOrigin
  def groupOverlap: Double = currentSnapshot.schema.groupOverlap
  def groupBalanceScore: Double = currentSnapshot.schema.groupBalanceScore
}
