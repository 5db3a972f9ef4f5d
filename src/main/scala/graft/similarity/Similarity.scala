package graft.similarity

import graft.core._

/** One ancestor level of a subtree's context: identity, label, and the
  * entity-label set beneath it. `id` is the node's oid when set,
  * otherwise a synthetic per-node id — equality of ids means "the same
  * node instance" (reference similarity.py:148-151 oid check).
  */
final case class LevelFeature(
    id: String,
    label: String,
    isTyped: Boolean,
    entLabels: Set[String]) extends Serializable

/** Ancestor-context feature of one candidate subtree: level 0 is the
  * subtree itself, then its parents up to MAX_SIM_CTX_DEPTH levels.
  */
final case class SubtreeFeature(levels: Vector[LevelFeature], height: Int, depth: Int)
    extends Serializable {
  def self: LevelFeature = levels.head
}

/** Decay-weighted ancestor similarity (reference similarity.py:92-168),
  * computed over precomputed features so no tree access is needed at
  * scoring time.
  */
object Similarity {

  val MaxSimCtxDepth = 5
  val Decay = 2.0

  def similarity(
      x: SubtreeFeature,
      y: SubtreeFeature,
      metric: SeqMetrics.Metric = SeqMetrics.default,
      decay: Double = Decay,
      maxDepth: Int = MaxSimCtxDepth,
  ): Double = {
    require(decay > 0, "decay must be a positive number")
    // Subtrees with disjoint entities cannot be similar (:133) — note two
    // empty sets ARE disjoint in the reference, so entity-free subtrees
    // score 0 even against themselves here (the oid check comes second).
    if ((x.self.entLabels & y.self.entLabels).isEmpty) return 0.0
    // Identical node or equal typed label → perfectly similar (:138)
    if (levelEquivalent(x.self, y.self)) return 1.0

    var weightSum = 0.0
    var simSum = 0.0
    var d = 0
    val n = math.min(math.min(x.levels.size, y.levels.size), maxDepth)
    while (d < n) {
      val lx = x.levels(d); val ly = y.levels(d)
      val sim =
        if (levelEquivalent(lx, ly)) 1.0
        else metric(lx.entLabels, ly.entLabels)
      val w = math.pow(decay, -d)
      weightSum += w
      simSum += w * sim
      d += 1
    }
    math.max(0.0, math.min(1.0, simSum / weightSum))
  }

  private def levelEquivalent(a: LevelFeature, b: LevelFeature): Boolean =
    a.id == b.id || (a.isTyped && b.isTyped && a.label == b.label)

  /** Candidate predicate (similarity.py:278-290): height ≤ maxHeight,
    * not an ENT, no duplicate entity labels.
    */
  def isCandidate(t: ArchiTree, maxHeight: Int = 5): Boolean =
    t.height <= maxHeight && !t.hasType(NodeType.Ent) && !t.hasDuplicateEntity

  /** Extract candidate-subtree features for one tree. Keys are the
    * (treeKey, preorder-path) of each candidate; ids fall back to a
    * synthetic "<treeKey>@<nodeIndex>" so distinct nodes never compare
    * equal by accident.
    *
    * @return (pathKey, feature) per candidate subtree
    */
  def treeFeatures(
      tree: ArchiTree,
      treeKey: String,
      maxHeight: Int = 5,
  ): Vector[(String, SubtreeFeature)] = {
    // assign synthetic ids in pre-order
    val positioned = tree.positionedSubtrees
    val idOf: Map[Vector[Int], String] = positioned.zipWithIndex.map {
      case ((path, t), i) => path -> (if (t.oid.nonEmpty) t.oid else s"$treeKey@$i")
    }.toMap

    positioned.collect {
      case (path, t) if isCandidate(t, maxHeight) =>
        val chain = Iterator
          .iterate(path)(p => p.dropRight(1))
          .takeWhile(_ => true)
          .take(path.size + 1)
          .take(MaxSimCtxDepth)
          .toVector
        val levels = chain.map { p =>
          val node = tree(p)
          LevelFeature(idOf(p), node.label.render, node.label.isTyped, node.entityLabels)
        }
        val key = s"$treeKey/${path.mkString(".")}"
        key -> SubtreeFeature(levels, t.height, path.size)
    }
  }
}
