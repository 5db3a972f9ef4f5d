package graft.model

import graft.core._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One tree per row, serialized as the TreeJson dict format.
  *
  * The Dataset[TreeRow] is the master representation of a forest
  * (SURVEY §7.1): per-tree rewrites are pure `ArchiTree => ArchiTree`
  * functions mapped over it (zero shuffle); cross-tree stages derive the
  * columnar nodes DataFrame below, which is cheap to rebuild per iteration
  * and never the master copy.
  */
final case class TreeRow(treeId: Long, tree: String)

/** One row per tree node — the columnar bridge for clustering features,
  * schema derivation, dataset extraction, metrics and export.
  *
  * @param nodeId    pre-order index within the tree (root = 0)
  * @param parentId  pre-order index of the parent (-1 for the root)
  * @param pos       child position within the parent
  * @param nodeType  "ENT" | "GROUP" | "REL" | "COLL" | null for plain labels
  * @param name      label name (or raw label when untyped)
  * @param value     space-joined leaves for ENT nodes, null otherwise
  * @param depth     distance from the root
  * @param height    NLTK height (leaf-only node = 2)
  * @param nChildren direct child count (leaves + subtrees)
  */
final case class NodeRow(
    treeId: Long,
    nodeId: Int,
    parentId: Int,
    pos: Int,
    nodeType: String,
    name: String,
    value: String,
    oid: String,
    depth: Int,
    height: Int,
    nChildren: Int,
)

object Forest {

  /** Parallelize local trees into a forest Dataset. */
  def fromTrees(spark: SparkSession, trees: Seq[ArchiTree]): Dataset[TreeRow] = {
    import spark.implicits._
    trees.zipWithIndex
      .map { case (t, i) => TreeRow(i.toLong, TreeJson.toJson(t)) }
      .toDS()
  }

  /** Pure per-tree rewrite over the whole forest — no shuffle. */
  def mapTrees(forest: Dataset[TreeRow])(f: ArchiTree => ArchiTree): Dataset[TreeRow] = {
    import forest.sparkSession.implicits._
    forest.map(row => TreeRow(row.treeId, TreeJson.toJson(f(TreeJson.fromJson(row.tree)))))
  }

  /** Demote GROUP/REL typing to plain labels (ENT leaves keep their
    * type) — the "untyped ingestion" shape the rewrite and LLM-simplify
    * pipelines are specified against (they must re-discover structure,
    * not inherit it from the loader).
    */
  def untypeStructure(forest: Dataset[TreeRow]): Dataset[TreeRow] =
    mapTrees(forest) { tree =>
      def strip(t: ArchiTree): ArchiTree = {
        val kids = t.children.map {
          case Child.Node(c) => Child.Node(strip(c)): Child
          case l             => l
        }
        t.label match {
          case Typed(NodeType.Group, n) => t.copy(label = Plain(n), children = kids)
          case Typed(NodeType.Rel, n)   => t.copy(label = Plain(n), children = kids)
          case _                        => t.copy(children = kids)
        }
      }
      strip(tree)
    }

  def trees(forest: Dataset[TreeRow]): Dataset[(Long, ArchiTree)] = {
    implicit val enc = org.apache.spark.sql.Encoders.kryo[(Long, ArchiTree)]
    forest.map(row => (row.treeId, TreeJson.fromJson(row.tree)))
  }

  /** Flatten a forest into one NodeRow per tree node (SURVEY §7.1). */
  def toNodesDF(forest: Dataset[TreeRow]): Dataset[NodeRow] = {
    import forest.sparkSession.implicits._
    forest.flatMap(row => nodeRows(row.treeId, TreeJson.fromJson(row.tree)))
  }

  /** Fused per-tree rewrite + flatten: parse each tree ONCE, apply `f`,
    * emit its NodeRows directly. `mapTrees(f)` followed by `toNodesDF`
    * pays serialize + re-parse of the REWRITTEN tree — which is often
    * the larger one (Tree.merge doubles every tree) — purely to cross
    * the row boundary; when the caller only needs the columnar view,
    * this single-pass shape skips that round trip entirely.
    */
  def mapTreesToNodes(forest: Dataset[TreeRow])(f: ArchiTree => ArchiTree): Dataset[NodeRow] = {
    import forest.sparkSession.implicits._
    forest.flatMap(row => nodeRows(row.treeId, f(TreeJson.fromJson(row.tree))))
  }

  /** Local flattening of one tree (pre-order ids). */
  def nodeRows(treeId: Long, tree: ArchiTree): Seq[NodeRow] = {
    val buf = Vector.newBuilder[NodeRow]
    var nextId = 0
    def go(t: ArchiTree, parentId: Int, pos: Int, depth: Int): Unit = {
      val id = nextId
      nextId += 1
      val isEnt = t.hasType(NodeType.Ent)
      buf += NodeRow(
        treeId = treeId,
        nodeId = id,
        parentId = parentId,
        pos = pos,
        nodeType = t.label.nodeType.map(_.value).orNull,
        name = t.label.name,
        value = if (isEnt) t.leaves.mkString(" ") else null,
        oid = t.oid,
        depth = depth,
        height = t.height,
        nChildren = t.children.size,
      )
      t.children.zipWithIndex.foreach {
        case (Child.Node(c), i) => go(c, id, i, depth + 1)
        case _                  =>
      }
    }
    go(tree, -1, 0, 0)
    buf.result()
  }

  /** Collect a (small) forest to the driver — tests and golden checks only. */
  def collectTrees(forest: Dataset[TreeRow]): Seq[ArchiTree] =
    forest.collect().sortBy(_.treeId).map(r => TreeJson.fromJson(r.tree)).toSeq

  /** Break lineage between rewrite iterations (SURVEY §7.5.4). Uses the
    * reliable checkpoint when a checkpoint dir is configured — on a real
    * cluster an executor loss must not kill a 100-epoch lineage —
    * and falls back to localCheckpoint in plain local runs.
    */
  def checkpoint(forest: Dataset[TreeRow]): Dataset[TreeRow] =
    if (forest.sparkSession.sparkContext.getCheckpointDir.isDefined)
      forest.checkpoint(true)
    else forest.localCheckpoint(true)
}
