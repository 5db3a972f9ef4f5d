package graft.rewrite

import graft.core._
import graft.similarity.{ClusterModel, LevelFeature, Similarity, SubtreeFeature}

/** Cluster-support-driven group mining — functional re-expressions of
  * FindSubGroupsOperation and MergeGroupsOperation
  * (operations/groups.py:22-304). Both search k-combinations per node
  * with the reference's cluster-informed bounds; an additional hard cap
  * on the combination count guards against pathological widths (logged
  * when hit).
  */
object GroupOps {

  val CombinationCap = 5000

  /** Ancestor-context feature of the node at `path`, preserving real oids
    * and falling back to synthetic per-path ids.
    */
  def featureAt(tree: ArchiTree, path: Vector[Int], keyPrefix: String): SubtreeFeature = {
    val chain = Iterator.iterate(path)(_.dropRight(1)).take(path.size + 1)
      .take(Similarity.MaxSimCtxDepth).toVector
    val levels = chain.map { p =>
      val node = tree(p)
      val id = if (node.oid.nonEmpty) node.oid else s"$keyPrefix@${p.mkString(".")}"
      LevelFeature(id, node.label.render, node.label.isTyped, node.entityLabels)
    }
    SubtreeFeature(levels, tree(path).height, path.size)
  }

  private def entChildren(t: ArchiTree): Vector[(ArchiTree, Int)] =
    t.children.zipWithIndex.collect { case (Child.Node(c), i) if c.hasType(NodeType.Ent) => (c, i) }

  private def undefName(seed: String): String =
    s"UNDEF_${Integer.toHexString(seed.hashCode).takeWhile(_ != '-')}${math.abs(seed.hashCode)}"

  /** FindSubGroupsOperation.apply (groups.py:74-176). Candidates (nodes
    * whose children are all ENTs) are never nested, so a single
    * bottom-up rebuild visits each independently.
    */
  def findSubGroups(tree: ArchiTree, model: ClusterModel, minSupport: Int, treeKey: String): (ArchiTree, Boolean) = {
    var changed = false

    def processNode(node: ArchiTree, path: Vector[Int]): ArchiTree = {
      var subtree = node
      val initialFeature = featureAt(tree, path, treeKey)
      val groupSupport = model.getEquivOf(initialFeature).map(model.support).getOrElse(0)

      var entityTrees = entChildren(subtree)
      val entityLabels = entityTrees.map(_._1.label.name).toSet

      // search-space pruning (groups.py:92-130): entity-label sets of
      // members in clusters with higher support that intersect ours —
      // memoized in the model (same result as the former inline walk)
      val entityGroups: Set[Seq[String]] =
        model.entityGroupsAbove(groupSupport, entityLabels)
      if (entityGroups.isEmpty) return subtree

      val availableLabels = entityGroups.flatten.toSet
      entityTrees = entityTrees.filter { case (e, _) => availableLabels.contains(e.label.name) }
      val filteredLabels = entityTrees.map(_._1.label.name).toSet

      var k = math.min(
        math.min(entityTrees.size, subtree.children.size - 1),
        entityGroups.filter(g => g.forall(filteredLabels.contains))
          .map(_.size).maxOption.getOrElse(entityTrees.size))
      val support0 = math.max(groupSupport + 1, minSupport)

      while (k > 1) {
        val ents = entChildren(subtree).filter { case (e, _) => availableLabels.contains(e.label.name) }
        val combos = ents.combinations(k)
          .filter(c => c.map(_._1.label.name).distinct.size == c.size)
          .take(CombinationCap)

        var best: Option[(ArchiTree, Int, Int)] = None
        combos.foreach { combo =>
          evaluateSubgroup(subtree, combo, support0, model, treeKey).foreach { cand =>
            if (best.forall(_._2 < cand._2)) best = Some(cand)
          }
        }

        best match {
          case None => k -= 1
          case Some((newSubtree, _, _)) =>
            changed = true
            subtree = newSubtree
            k = math.min(entChildren(subtree).size, k)
        }
      }
      subtree
    }

    def go(t: ArchiTree, path: Vector[Int]): ArchiTree = {
      val processed = t.copy(children = t.children.zipWithIndex.map {
        case (Child.Node(c), i) => Child.Node(go(c, path :+ i)): Child
        case (l, _)             => l
      })
      val allEnt = processed.children.nonEmpty && processed.children.forall {
        case Child.Node(c) => c.hasType(NodeType.Ent)
        case _             => false
      }
      if (allEnt && !processed.hasType(NodeType.Ent)) processNode(processed, path) else processed
    }

    (go(tree, Vector.empty), changed)
  }

  /** _create_and_evaluate_subgroup (groups.py:29-72): extract the combo
    * into a fresh GROUP at the earliest index; accept when the group's
    * cluster support ≥ threshold.
    */
  private def evaluateSubgroup(
      subtree: ArchiTree,
      combo: Vector[(ArchiTree, Int)],
      minSupport: Int,
      model: ClusterModel,
      treeKey: String,
  ): Option[(ArchiTree, Int, Int)] = {
    val indices = combo.map(_._2).toSet
    val insertAt = combo.map(_._2).min
    val groupTree = ArchiTree(Typed(NodeType.Group, ""), combo.map(c => Child.Node(c._1): Child))
    val remaining = subtree.children.zipWithIndex.filterNot { case (_, i) => indices.contains(i) }
    val (before, after) = remaining.partition(_._2 < insertAt)
    var newSubtree = subtree.copy(children =
      before.map(_._1) ++ Vector(Child.Node(groupTree): Child) ++ after.map(_._1))
    if (newSubtree.label.isTyped)
      newSubtree = newSubtree.copy(label = Plain(undefName(treeKey + insertAt)))

    // context = [group, newSubtree] — the copy is detached from its root
    // in the reference, so ancestors above the subtree don't participate
    val groupIdx = before.size
    val groupFeature = SubtreeFeature(
      Vector(
        LevelFeature(s"$treeKey!g$insertAt", "GROUP", true, groupTree.entityLabels),
        LevelFeature(s"$treeKey!s$insertAt", newSubtree.label.render,
          newSubtree.label.isTyped, newSubtree.entityLabels)),
      groupTree.height, 1)

    model.getEquivOf(groupFeature).flatMap { cluster =>
      val support = model.support(cluster)
      Option.when(support >= minSupport) {
        val named = groupTree.copy(label = Typed(NodeType.Group, cluster))
        val withNamed = newSubtree.copy(children =
          newSubtree.children.updated(groupIdx, Child.Node(named)))
        (withNamed, support, groupIdx)
      }
    }
  }

  /** MergeGroupsOperation.apply (groups.py:179-304): in untyped nodes
    * holding at least one GROUP, try k-combinations of (GROUP|ENT)
    * children; a merged GROUP survives when its cluster support is at
    * least the max support of the groups it consumed.
    */
  def mergeGroups(tree: ArchiTree, model: ClusterModel, minSupport: Int, treeKey: String): (ArchiTree, Boolean) = {
    var changed = false

    def processNode(node: ArchiTree, path: Vector[Int]): ArchiTree = {
      var subtree = node
      var groupEnts = memberChildren(subtree)
      var k = groupEnts.map(_._1.label.render).toSet.size

      while (k > 1) {
        val combos = groupEnts.combinations(k).take(CombinationCap)
        var best: Option[(ArchiTree, Int)] = None
        combos.foreach { combo =>
          mergeInner(subtree, combo, path, model, treeKey).foreach { cand =>
            if (best.forall(_._2 < cand._2)) best = Some(cand)
          }
        }
        best match {
          case None => k -= 1
          case Some((newSubtree, _)) =>
            changed = true
            subtree = newSubtree
            groupEnts = memberChildren(subtree)
            k = math.min(groupEnts.size, k)
        }
      }
      subtree
    }

    def memberChildren(t: ArchiTree): Vector[(ArchiTree, Int)] =
      t.children.zipWithIndex.collect {
        case (Child.Node(c), i) if c.hasType(NodeType.Group) || c.hasType(NodeType.Ent) => (c, i)
      }

    def go(t: ArchiTree, path: Vector[Int]): ArchiTree = {
      val processed = t.copy(children = t.children.zipWithIndex.map {
        case (Child.Node(c), i) => Child.Node(go(c, path :+ i)): Child
        case (l, _)             => l
      })
      val eligible = !processed.isTyped && processed.childTrees.exists(_.hasType(NodeType.Group))
      if (eligible) processNode(processed, path) else processed
    }

    (go(tree, Vector.empty), changed)
  }

  private def mergeInner(
      subtree: ArchiTree,
      combo: Vector[(ArchiTree, Int)],
      path: Vector[Int],
      model: ClusterModel,
      treeKey: String,
  ): Option[(ArchiTree, Int)] = {
    val subGroup = scala.collection.mutable.ArrayBuffer.empty[ArchiTree]
    var maxSubSupport = 1
    var groupCount = 0

    combo.foreach { case (c, i) =>
      if (c.hasType(NodeType.Ent)) subGroup += c
      else if (c.hasType(NodeType.Group)) {
        groupCount += 1
        val f = featureOfChild(subtree, c, i, path, treeKey)
        model.getEquivOf(f).foreach(cl => maxSubSupport = math.max(maxSubSupport, model.support(cl)))
        subGroup ++= c.entities
      }
    }
    if (subGroup.isEmpty || groupCount == 0) return None
    val labels = subGroup.map(_.label.name)
    if (labels.distinct.size != labels.size) return None

    val indices = combo.map(_._2).toSet
    val insertAt = combo.map(_._2).min
    val groupTree = ArchiTree(Typed(NodeType.Group, ""), subGroup.toVector.map(e => Child.Node(e): Child))
    val remaining = subtree.children.zipWithIndex.filterNot { case (_, i) => indices.contains(i) }
    val (before, after) = remaining.partition(_._2 < insertAt)
    val newSubtree = subtree.copy(children =
      before.map(_._1) ++ Vector(Child.Node(groupTree): Child) ++ after.map(_._1))

    // full-tree context in the reference (root copy); approximated with
    // the two innermost levels (group → node)
    val groupFeature = SubtreeFeature(
      LevelFeature(s"$treeKey!m$insertAt", "GROUP", true, groupTree.entityLabels) +:
        LevelFeature(s"$treeKey!n${path.mkString(".")}", newSubtree.label.render,
          newSubtree.label.isTyped, newSubtree.entityLabels) +: Vector.empty,
      groupTree.height, path.size + 1)

    model.getEquivOf(groupFeature).flatMap { cluster =>
      val support = model.support(cluster)
      Option.when(support >= maxSubSupport) {
        val named = groupTree.copy(label = Typed(NodeType.Group, cluster))
        val groupIdx = before.size
        (newSubtree.copy(children = newSubtree.children.updated(groupIdx, Child.Node(named))), support)
      }
    }
  }

  private def featureOfChild(
      parent: ArchiTree,
      child: ArchiTree,
      idx: Int,
      parentPath: Vector[Int],
      treeKey: String,
  ): SubtreeFeature = {
    val id = if (child.oid.nonEmpty) child.oid else s"$treeKey@${(parentPath :+ idx).mkString(".")}"
    val pid = if (parent.oid.nonEmpty) parent.oid else s"$treeKey@${parentPath.mkString(".")}"
    SubtreeFeature(
      Vector(
        LevelFeature(id, child.label.render, child.label.isTyped, child.entityLabels),
        LevelFeature(pid, parent.label.render, parent.label.isTyped, parent.entityLabels)),
      child.height, parentPath.size + 1)
  }
}
