package graft.nlp

import graft.core._

import scala.collection.mutable.ArrayBuffer

/** NLP annotation model (reference architxt/nlp/model.py:13-86). */
final case class Entity(name: String, start: Int, end: Int, id: String, value: String) {
  require(start >= 0, "Start cannot be negative.")
  require(start < end, "Start cannot be larger than end.")
  def length: Int = end - start
}
final case class Relation(src: String, dst: String, name: String)
final case class AnnotatedSentence(txt: String, entities: Seq[Entity], rels: Seq[Relation])

final case class TreeEntity(name: String, positions: Seq[Vector[Int]], value: Option[String] = None) {
  require(positions.nonEmpty, "Cannot have empty list of positions.")

  /** Common covering position (model.py:46-50). */
  def rootPos: Vector[Int] = {
    val prefix = positions.reduce { (a, b) =>
      a.zip(b).takeWhile { case (x, y) => x == y }.map(_._1)
    }
    if (prefix == positions.head) prefix.dropRight(1) else prefix
  }
}

/** Tree-enrichment operators (reference architxt/nlp/parser/__init__.py:
  * 141-626), translated literally onto the local mutable tree. All public
  * entry points are pure ArchiTree functions for Spark use.
  */
object NlpOps {

  /** nltk.tokenize.util.align_tokens: char spans of tokens in the
    * sentence, searched left to right.
    */
  def alignTokens(tokens: Seq[String], sentence: String): Seq[(Int, Int)] = {
    var cursor = 0
    tokens.map { tok =>
      val start = sentence.indexOf(tok, cursor)
      if (start < 0) throw new IllegalArgumentException(s"token '$tok' not found in sentence")
      cursor = start + tok.length
      (start, start + tok.length)
    }
  }

  // ---- coordination fixes (parser/__init__.py:247-407) ----

  /** fix_coord: restructure `(X a (COORD (CCONJ and) b))` → `(CONJ (X a) b)`. */
  def fixCoord(tree: MTree, pos: Int): Boolean = {
    val subtree = tree.child(pos) match {
      case Right(t) => t
      case _        => return false
    }
    val coord = subtree.children.collectFirst {
      case Right(c) if c.label == "COORD" && c.size > 0 &&
        c.child(0).exists(_.label == "CCONJ") => c
    }.getOrElse(return false)

    val coordIndex = coord.parentIndex
    val left = new MTree(subtree.label)
    subtree.children.take(coordIndex).foreach {
      case Right(t) => left.insert(left.size, Right(t))
      case l        => left.insert(left.size, l)
    }
    val right = coord.children.drop(1).toVector
    val conj = new MTree("CONJ")
    conj.insert(0, Right(left))
    right.zipWithIndex.foreach { case (c, i) => conj.insert(i + 1, c) }

    val remaining = subtree.children.drop(coordIndex + 1).toVector
    val newTree =
      if (remaining.nonEmpty) {
        val nt = new MTree(subtree.label)
        nt.insert(0, Right(conj))
        remaining.zipWithIndex.foreach { case (c, i) => nt.insert(i + 1, c) }
        nt
      } else conj

    tree.setChild(pos, Right(newTree))
    true
  }

  /** fix_conj: flatten nested CONJ nodes. */
  def fixConj(tree: MTree, pos: Int): Boolean = {
    val subtree = tree.child(pos) match {
      case Right(t) if t.label == "CONJ" => t
      case _                             => return false
    }
    val newChildren = ArrayBuffer.empty[Either[String, MTree]]
    subtree.children.foreach {
      case Right(c) if c.label == "CONJ" => newChildren ++= c.children
      case other                         => newChildren += other
    }
    if (newChildren.size <= subtree.size) return false
    val nt = new MTree("CONJ")
    newChildren.zipWithIndex.foreach { case (c, i) => nt.insert(i, c) }
    tree.setChild(pos, Right(nt))
    true
  }

  /** fix_all_coord: iterate both fixes to fixpoint. */
  def fixAllCoord(tree: MTree): Unit = {
    var fixed = true
    while (fixed) {
      fixed = false
      tree.positions.find { pos =>
        pos.nonEmpty && (tree(pos.dropRight(1)) match {
          case Right(p) => fixCoord(p, pos.last)
          case _        => false
        })
      }.foreach(_ => fixed = true)
    }
    fixed = true
    while (fixed) {
      fixed = false
      tree.positions.find { pos =>
        pos.nonEmpty && (tree(pos.dropRight(1)) match {
          case Right(p) => fixConj(p, pos.last)
          case _        => false
        })
      }.foreach(_ => fixed = true)
    }
  }

  /** Pure wrapper for Spark rows. */
  def fixAllCoord(tree: ArchiTree): ArchiTree = {
    val m = MTree.from(tree)
    fixAllCoord(m)
    m.toArchi
  }

  // ---- entity insertion (parser/__init__.py:410-560) ----

  /** ins_ent, translated statement by statement. */
  def insEnt(tree: MTree, treeEnt: TreeEntity): MTree = {
    var anchorPos = treeEnt.rootPos
    val anchorLen = anchorPos.size
    val childPos = treeEnt.positions.head

    var entityIndex =
      if (childPos.drop(anchorLen + 1).sum > 0) childPos(anchorLen) + 1
      else if (
        treeEnt.rootPos.isEmpty ||
        childPos(anchorLen) > 0 ||
        treeEnt.positions.last(anchorLen) < tree.node(treeEnt.rootPos).size - 1
      ) childPos(anchorLen)
      else {
        var idx = treeEnt.rootPos.last
        anchorPos = treeEnt.rootPos.dropRight(1)
        while (anchorPos.nonEmpty && tree.node(anchorPos).size == 1) {
          idx = anchorPos.last
          anchorPos = anchorPos.dropRight(1)
        }
        idx
      }

    val children = ArrayBuffer.empty[Either[String, MTree]]
    treeEnt.positions.reverse.foreach { childPosition =>
      val parentPosition = childPosition.dropRight(1)
      val subtree = tree.node(parentPosition)
      if (!subtree.hasType(NodeType.Ent)) {
        children += tree(childPosition)
        subtree.removeAt(childPosition.last)
      } else if (parentPosition.size <= anchorPos.size &&
        parentPosition == anchorPos.take(parentPosition.size)) {
        children += tree(childPosition)
        subtree.removeAt(childPosition.last)
      } else if (subtree.leafPositions.exists(lp => !treeEnt.positions.contains(lp))) {
        // overlap: duplicate the leaf (reference compares the subtree's
        // RELATIVE leaf positions against the entity's absolute ones —
        // replicated verbatim)
        children += tree(childPosition)
      }
    }

    val newTree = new MTree(s"ENT::${treeEnt.name}")
    children.reverse.zipWithIndex.foreach { case (c, i) =>
      c match {
        case Left(s)  => newTree.insert(i, Left(s))
        case Right(t) => newTree.insert(i, Right(t.copyTree()))
      }
    }
    treeEnt.value.foreach(v => newTree.metadata = Map("value" -> v))
    tree.node(anchorPos).insert(entityIndex, Right(newTree))
    val entityTree = tree.node(anchorPos).node(Vector(entityIndex))

    // drop empty subtrees left behind
    tree.subtrees.drop(1).filter(_.size == 0).foreach(st => if (st.parent != null) st.parent.remove(st))

    entityTree
  }

  /** unnest_ent (parser/__init__.py:563-599): nested entities become
    * `(REL (ENT::outer leaves) (nested (ENT::inner …)…))`.
    */
  def unnestEnt(tree: MTree, pos: Int): Unit = {
    val subtree = tree.child(pos) match {
      case Right(t) if t.hasType(NodeType.Ent) => t
      case _                                   => return
    }
    val entityTree = new MTree(subtree.label)
    subtree.leaves.zipWithIndex.foreach { case (l, i) => entityTree.insert(i, Left(l)) }

    val nested = subtree.children.collect {
      case Right(c) if c.hasType(NodeType.Ent) => c.copyTree()
    }
    if (nested.isEmpty) { tree.setChild(pos, Right(entityTree)); return }

    val nestedTree = new MTree("nested")
    nested.zipWithIndex.foreach { case (c, i) => nestedTree.insert(i, Right(c)) }
    val rel = new MTree("REL")
    rel.insert(0, Right(entityTree))
    rel.insert(1, Right(nestedTree))
    tree.setChild(pos, Right(rel))
  }

  // ---- enrichment pipeline (parser/__init__.py:179-244) ----

  def isConflicting(span: Seq[Int], computed: Set[Seq[Int]]): Boolean =
    computed.contains(span) // partial overlaps are allowed (duplicated)

  /** enrich_tree: align character-span entities to token positions,
    * insert largest first, unnest nested, drop untyped leaf-level nodes.
    */
  def enrichTree(
      tree: MTree,
      sentence: String,
      entities: Seq[Entity],
      relations: Seq[Relation],
  ): Unit = {
    val tokens = alignTokens(tree.leaves, sentence)
    // reference condition verbatim (parser/__init__.py:210-213):
    // entity.start <= token_end and token_start < entity.end
    val entityTokens: Map[String, Seq[Int]] = entities.map { e =>
      e.id -> tokens.zipWithIndex.collect {
        case ((tokStart, tokEnd), i) if e.start <= tokEnd && tokStart < e.end => i
      }
    }.toMap

    val computed = scala.collection.mutable.Set.empty[Seq[Int]]
    val entityTrees = ArrayBuffer.empty[MTree]
    entities.sortBy(e => -entityTokens(e.id).size).foreach { entity =>
      val span = entityTokens(entity.id)
      if (span.nonEmpty && !isConflicting(span, computed.toSet)) {
        val treeEnt = TreeEntity(
          entity.name,
          span.map(i => tree.leafPosition(i)),
          Option(entity.value))
        entityTrees += insEnt(tree, treeEnt)
        computed += span
      }
    }

    entityTrees.sortBy(_.height).foreach { et =>
      if (et.parent != null) unnestEnt(et.parent, et.parentIndex)
    }

    // remove generic leaf-level subtrees (height 2, untyped)
    tree.subtrees.drop(1)
      .filter(st => st.height == 2 && !st.isTyped)
      .foreach(st => if (st.parent != null) st.parent.remove(st))
  }

  /** Pure wrapper. */
  def enrichTree(tree: ArchiTree, sentence: AnnotatedSentence): ArchiTree = {
    val m = MTree.from(tree)
    enrichTree(m, sentence.txt, sentence.entities, sentence.rels)
    m.toArchi
  }

  /** process_tree (parser/__init__.py:141-176): -LRB-/-RRB- fixups,
    * coordination flattening, enrichment, reduce, unique UNDEF renames.
    * Returns None when the tree degenerates.
    */
  def processTree(sentence: AnnotatedSentence, tree0: ArchiTree): Option[ArchiTree] = {
    val tree = MTree.from(tree0)

    tree.subtrees.foreach { st =>
      if (st.height == 2 && st.size == 1) st.child(0) match {
        case Left("-LRB-") => st.setChild(0, Left("("))
        case Left("-RRB-") => st.setChild(0, Left(")"))
        case _             =>
      }
    }

    fixAllCoord(tree)

    try enrichTree(tree, sentence.txt, sentence.entities, sentence.rels)
    catch { case _: IllegalArgumentException => return None }

    var archi = tree.toArchi.reduceAll(NodeType.all.toSet)

    if (archi.children.isEmpty || archi.children.exists(_.isInstanceOf[Child.Leaf])) return None
    if (archi.children.size == 1) archi = archi.childTrees.head

    // unique UNDEF names for non-ENT nodes; root stays ROOT
    var counter = 0
    def rename(t: ArchiTree, isRoot: Boolean): ArchiTree = {
      val kids = t.children.map {
        case Child.Node(c) => Child.Node(rename(c, isRoot = false)): Child
        case l             => l
      }
      if (t.hasType(NodeType.Ent)) t.copy(children = kids)
      else {
        val name = if (isRoot) "ROOT" else { counter += 1; s"UNDEF_$counter" }
        t.copy(label = Plain(name), children = kids)
      }
    }
    Some(rename(archi, isRoot = true))
  }
}
