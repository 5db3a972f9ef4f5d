package graft.metrics

import graft.model.NodeRow
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** Streaming forest statistics (reference architxt/inspector.py:16-83) as
  * one aggregation pass over the nodes DataFrame plus one tiny per-label
  * count.
  */
final case class InspectorResult(
    totalTrees: Long,
    totalEntities: Long,
    totalGroups: Long,
    totalRelations: Long,
    totalCollections: Long,
    totalNodes: Long,
    maxChildren: Int,
    avgBranching: Double,
    maxHeight: Int,
    avgHeight: Double,
    maxSize: Long,
    avgSize: Double,
    entityCount: Map[String, Long]) {
  override def toString: String =
    f"trees=$totalTrees nodes=$totalNodes ents=$totalEntities groups=$totalGroups " +
      f"rels=$totalRelations colls=$totalCollections maxH=$maxHeight avgH=$avgHeight%.2f " +
      f"maxSize=$maxSize avgSize=$avgSize%.2f branch=$avgBranching%.3f"
}

object ForestInspector {

  /** Tree size = leaf count; per tree that is Σ nChildren − (nodes − 1)
    * (every non-root node row is somebody's subtree child; the rest of
    * the declared children are leaves).
    */
  def inspect(nodes: Dataset[NodeRow]): InspectorResult = {
    val perTree = nodes
      .groupBy("treeId")
      .agg(
        count(lit(1)).as("nNodes"),
        sum("nChildren").as("sumChildren"),
        max("nChildren").as("maxChildren"),
        sum(when(col("nodeType") === "ENT", 1).otherwise(0)).as("ents"),
        sum(when(col("nodeType") === "GROUP", 1).otherwise(0)).as("groups"),
        sum(when(col("nodeType") === "REL", 1).otherwise(0)).as("rels"),
        sum(when(col("nodeType") === "COLL", 1).otherwise(0)).as("colls"),
        max(when(col("nodeId") === 0, col("height"))).as("height"))
      .withColumn("size", col("sumChildren") - (col("nNodes") - 1))

    val row = perTree
      .agg(
        count(lit(1)).as("trees"),
        sum("nNodes").as("nodes"),
        sum("sumChildren").as("sumChildren"),
        max("maxChildren").as("maxChildren"),
        sum("ents").as("ents"),
        sum("groups").as("groups"),
        sum("rels").as("rels"),
        sum("colls").as("colls"),
        max("height").as("maxHeight"),
        avg("height").as("avgHeight"),
        max("size").as("maxSize"),
        avg("size").as("avgSize"))
      .head

    val entityCount = nodes
      .filter(col("nodeType") === "ENT")
      .groupBy("name")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap

    val totalNodes = row.getAs[Long]("nodes")
    InspectorResult(
      totalTrees = row.getAs[Long]("trees"),
      totalEntities = row.getAs[Long]("ents"),
      totalGroups = row.getAs[Long]("groups"),
      totalRelations = row.getAs[Long]("rels"),
      totalCollections = row.getAs[Long]("colls"),
      totalNodes = totalNodes,
      maxChildren = row.getAs[Int]("maxChildren"),
      avgBranching = if (totalNodes > 0) row.getAs[Long]("sumChildren").toDouble / totalNodes else 0,
      maxHeight = row.getAs[Int]("maxHeight"),
      avgHeight = row.getAs[Double]("avgHeight"),
      maxSize = row.getAs[Long]("maxSize"),
      avgSize = row.getAs[Double]("avgSize"),
      entityCount = entityCount)
  }

  /** The query-surface form: one row per label-count statistic, hash-
    * comparable against a SQL oracle.
    */
  def inspectTable(nodes: Dataset[NodeRow]): org.apache.spark.sql.DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    val r = inspect(nodes)
    (Seq(
      "total_trees" -> r.totalTrees,
      "total_entities" -> r.totalEntities,
      "total_groups" -> r.totalGroups,
      "total_relations" -> r.totalRelations,
      "total_collections" -> r.totalCollections,
      "total_nodes" -> r.totalNodes) ++
      r.entityCount.toSeq.sortBy(_._1).map { case (k, v) => s"ent:$k" -> v })
      .toDF("stat", "value")
  }
}
