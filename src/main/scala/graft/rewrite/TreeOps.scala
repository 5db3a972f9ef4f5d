package graft.rewrite

import graft.core._

/** Pure per-tree rewrite operations — functional re-expressions of the
  * reference's in-place mutations (the simplification/tree_rewriting/
  * operations package). Each returns the new tree plus a "simplified"
  * flag with the reference's exact flag semantics (a pure relabel of an
  * already-REL node does NOT count, etc).
  */
object TreeOps {

  private def isEntChild(c: Child): Boolean = c match {
    case Child.Node(t) => t.hasType(NodeType.Ent)
    case _             => false
  }

  /** ReduceBottomOperation (reductions.py:62-76): splice untyped nodes
    * whose children are all ENT subtrees, bottom-up.
    */
  def reduceBottom(tree: ArchiTree): (ArchiTree, Boolean) = {
    var changed = false
    // The reference precomputes the reducible set on the ORIGINAL tree
    // (reductions.py:71-76), so a node whose children become all-ENT only
    // through this very pass is NOT spliced — judge each child by its
    // original children.
    def go(t: ArchiTree): ArchiTree = {
      val spliced = t.children.flatMap {
        case Child.Node(c) =>
          val qualifies = !c.isTyped && c.children.forall(isEntChild)
          val processed = go(c)
          if (qualifies) { changed = true; processed.children }
          else Vector(Child.Node(processed): Child)
        case l => Vector(l)
      }
      t.copy(children = spliced)
    }
    (go(tree), changed)
  }

  /** ReduceTopOperation (reductions.py:79-88): splice untyped DIRECT
    * children of the root.
    */
  def reduceTop(tree: ArchiTree): (ArchiTree, Boolean) = {
    var changed = false
    val newChildren = tree.children.flatMap {
      case Child.Node(c) if !c.isTyped =>
        changed = true
        c.children
      case other => Vector(other)
    }
    (tree.copy(children = newChildren), changed)
  }

  /** FindRelationsOperation (relations.py:21-121). Deepest-first; the
    * GROUP<->GROUP case relabels (flag only when the node was not
    * already a REL); the GROUP<->COLL case distributes the group over
    * homogeneous collection members.
    */
  def findRelations(tree: ArchiTree, namingOnly: Boolean = false): (ArchiTree, Boolean) = {
    var changed = false

    def eligible(t: ArchiTree): Boolean =
      t.children.size == 2 &&
        !t.hasType(NodeType.Ent) && !t.hasType(NodeType.Group) &&
        t.childTrees.size == 2 &&
        t.childTrees.forall(c => c.hasType(NodeType.Group) || c.hasType(NodeType.Coll))

    def go(t: ArchiTree): ArchiTree = {
      val processed = t.copy(children = t.children.map {
        case Child.Node(c) => Child.Node(go(c))
        case l             => l
      })
      if (!eligible(processed)) processed
      else {
        val Vector(a, b) = processed.childTrees
        if (a.hasType(NodeType.Group) && b.hasType(NodeType.Group)) {
          if (a.label.name == b.label.name) processed
          else {
            val names = Seq(a.label.name, b.label.name).sorted
            if (!processed.hasType(NodeType.Rel)) changed = true
            processed.copy(label = Typed(NodeType.Rel, s"${names(0)}<->${names(1)}"))
          }
        } else if (!namingOnly) {
          val (group, coll) =
            if (a.hasType(NodeType.Group) && b.hasType(NodeType.Coll)) (a, b)
            else if (a.hasType(NodeType.Coll) && b.hasType(NodeType.Group)) (b, a)
            else return processed
          val members = coll.childTrees
          val homogeneous = members.nonEmpty &&
            coll.children.size == members.size &&
            members.forall(_.hasType(NodeType.Group)) &&
            members.map(_.label.name).distinct.size == 1
          if (!homogeneous || group.label.name == members.head.label.name) processed
          else {
            val names = Seq(group.label.name, members.head.label.name).sorted
            val relLabel = Typed(NodeType.Rel, s"${names(0)}<->${names(1)}")
            changed = true
            val rels = members.map(m =>
              Child.Node(ArchiTree(relLabel, Vector(Child.Node(group), Child.Node(m)))))
            processed.copy(children = rels)
          }
        } else processed
      }
    }
    val result = go(tree)
    (result, changed)
  }

  /** FindCollectionsOperation (collections.py:20-103). Deepest-first over
    * non-ENT/GROUP/REL nodes with typed children: existing COLLs are
    * renamed after their first child; otherwise same-label GROUP/REL/COLL
    * siblings merge into one COLL (flattening nested COLLs), the node
    * itself becoming the COLL when the merge consumes every child.
    */
  def findCollections(tree: ArchiTree, namingOnly: Boolean = false): (ArchiTree, Boolean) = {
    var changed = false

    def typedMember(t: ArchiTree): Boolean =
      t.hasType(NodeType.Group) || t.hasType(NodeType.Rel) || t.hasType(NodeType.Coll)

    def eligible(t: ArchiTree): Boolean =
      !t.hasType(NodeType.Ent) && !t.hasType(NodeType.Group) && !t.hasType(NodeType.Rel) &&
        t.childTrees.exists(typedMember)

    def go(t: ArchiTree): ArchiTree = {
      val processed = t.copy(children = t.children.map {
        case Child.Node(c) => Child.Node(go(c))
        case l             => l
      })
      if (!eligible(processed)) processed
      else if (processed.hasType(NodeType.Coll)) {
        // renaming only, no flag (collections.py:46-48)
        processed.childTrees.headOption match {
          case Some(first) => processed.copy(label = Typed(NodeType.Coll, first.label.name))
          case None        => processed
        }
      } else if (namingOnly) {
        val kids = processed.childTrees
        val allSame = kids.size == processed.children.size && kids.nonEmpty &&
          (kids.head.hasType(NodeType.Group) || kids.head.hasType(NodeType.Rel)) &&
          kids.map(_.label.render).distinct.size == 1
        if (allSame) {
          changed = true
          processed.copy(label = Typed(NodeType.Coll, kids.head.label.name))
        } else processed
      } else {
        mergeSiblings(processed) match {
          case Some(merged) => changed = true; merged
          case None         => processed
        }
      }
    }

    def mergeSiblings(t: ArchiTree): Option[ArchiTree] = {
      val members = t.children.zipWithIndex.collect {
        case (Child.Node(c), i) if typedMember(c) => (c.label.name, i, c)
      }
      val byName = members.groupBy(_._1)
      val dupNames = members.map(_._1).distinct.filter(n => byName(n).size > 1)
      if (dupNames.isEmpty) return None

      val firstIdx = dupNames.map(n => n -> byName(n).head._2).toMap
      val memberIdx = dupNames.flatMap(n => byName(n).map(_._2)).toSet

      def collFor(name: String): Child = {
        val flattened = byName(name).flatMap { case (_, _, c) =>
          if (c.hasType(NodeType.Coll)) c.children else Vector(Child.Node(c))
        }
        Child.Node(ArchiTree(Typed(NodeType.Coll, name), flattened.toVector))
      }

      val newChildren = t.children.zipWithIndex.flatMap {
        case (_, i) if memberIdx.contains(i) =>
          dupNames.find(n => firstIdx(n) == i).map(collFor).toVector
        case (c, _) => Vector(c)
      }

      // when the merges consumed every child and exactly one set exists,
      // the node itself becomes the collection (collections.py:95-98)
      newChildren match {
        case Vector(Child.Node(only))
            if dupNames.size == 1 && t.children.forall {
              case Child.Node(c) => typedMember(c) && c.label.name == dupNames.head
              case _             => false
            } =>
          Some(t.copy(label = only.label, children = only.children))
        case _ => Some(t.copy(children = newChildren))
      }
    }

    (go(tree), changed)
  }

  /** create_group (tree_rewriting/__init__.py:636-645): relabel as GROUP
    * and keep only the entity descendants.
    */
  def createGroup(t: ArchiTree, groupName: String): ArchiTree =
    ArchiTree(
      Typed(NodeType.Group, groupName),
      t.entities.map(e => Child.Node(e): Child),
      t.oid, t.metadata)

  /** _simple_rewrite_tree (simple_rewrite.py:19-40): collapse a tree with
    * unlabelled nodes into a single GROUP of its first-occurrence
    * entities; the group id comes from the label-set → id map.
    */
  def simpleRewriteTree(tree: ArchiTree, groupIds: Map[Seq[String], String]): ArchiTree = {
    if (tree.hasType(NodeType.Ent) || !hasUnlabelledAnywhere(tree)) return tree
    val key = tree.entityLabels.toSeq.sorted
    val id = groupIds(key)
    val seen = scala.collection.mutable.Set.empty[String]
    val ents = tree.entities.filter(e => seen.add(e.label.name))
    val group = ArchiTree(Typed(NodeType.Group, id), ents.map(e => Child.Node(e): Child))
    tree.copy(children = Vector(Child.Node(group)))
  }

  /** The reference gates on tree.has_unlabelled_nodes() — direct children
    * only (tree.py:740-753).
    */
  private def hasUnlabelledAnywhere(tree: ArchiTree): Boolean = tree.hasUnlabelledNodes

  /** Group-label key of a tree for simple_rewrite id assignment. */
  def simpleRewriteKey(tree: ArchiTree): Option[Seq[String]] =
    if (tree.hasType(NodeType.Ent) || !tree.hasUnlabelledNodes) None
    else Some(tree.entityLabels.toSeq.sorted)
}
