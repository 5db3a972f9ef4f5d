package graft.rewrite

import graft.core._
import graft.model.{Forest, TreeRow}
import graft.similarity.{ClusterModel, TreeClusterer}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The iterative rewrite driver — Spark re-expression of `rewrite()`
  * (simplification/tree_rewriting/__init__.py:56-308).
  *
  * Per epoch: reduce_all({ENT}) → cluster → find_groups → apply the
  * operation list with early exit at the first operation that changed
  * anything; stop when an epoch changes nothing. Post-process runs
  * naming-only FindRelations/FindCollections, then group/relation names
  * are canonicalized.
  *
  * The reference's ProcessPoolExecutor + barrier + OID-queue machinery
  * (tree_rewriting/__init__.py:311-633) disappears into Spark stages:
  * each operation is one shuffle-free Dataset map plus a boolean
  * aggregation; the forest is checkpointed per epoch to break lineage.
  */
object Rewrite {

  @inline private def timed[A](label: String)(body: => A): A =
    graft.util.Spark.timed("rewrite-profile", label)(body)

  /** One rewrite operation: pure per-tree function that may consult the
    * broadcast cluster model.
    */
  final case class Op(name: String, fn: (ArchiTree, ClusterModel, Int, String) => (ArchiTree, Boolean))

  val defaultOperations: Seq[Op] = Seq(
    Op("FindSubGroups", (t, m, ms, k) => GroupOps.findSubGroups(t, m, ms, k)),
    Op("MergeGroups", (t, m, ms, k) => GroupOps.mergeGroups(t, m, ms, k)),
    Op("FindCollections", (t, _, _, _) => TreeOps.findCollections(t)),
    Op("FindRelations", (t, _, _, _) => TreeOps.findRelations(t)),
    Op("FindCollections2", (t, _, _, _) => TreeOps.findCollections(t)),
    Op("ReduceBottom", (t, _, _, _) => TreeOps.reduceBottom(t)),
    Op("ReduceTop", (t, _, _, _) => TreeOps.reduceTop(t)),
  )

  final case class Config(
      tau: Double = 0.7,
      decay: Double = 2.0,
      epochs: Int = 100,
      minSupport: Option[Int] = None,
      metricName: String = "jaro",
      operations: Seq[Op] = defaultOperations,
      simplifyNames: Boolean = true,
      // cluster the schema template instead of the instances
      // (similarity.py:230): cheaper on huge low-variety forests, may
      // differ from instance clustering
      schemaOnly: Boolean = false,
      // called with (epoch, forest-after-epoch); None = zero cost. The
      // ForestStore transaction lane hangs per-epoch snapshot commits
      // here (the reference commits its ZODB transaction per rewrite
      // step, tree_rewriting/__init__.py epoch loop)
      epochHook: Option[(Int, Dataset[TreeRow]) => Unit] = None)

  /** Convergence telemetry for one `rewrite` run: `epochsToConverge` is
    * the epoch number of the first pass in which NO operation fired (the
    * natural fixpoint — the reference's stop condition,
    * tree_rewriting/__init__.py:153-155), or None when the loop was cut
    * off by the `epochs` cap while still changing. An empty forest is
    * trivially its own fixpoint: Some(0).
    */
  final case class RewriteResult(forest: Dataset[TreeRow], epochsToConverge: Option[Int])

  def rewrite(forest: Dataset[TreeRow], cfg: Config = Config()): Dataset[TreeRow] =
    rewriteWithStats(forest, cfg).forest

  def rewriteWithStats(forest: Dataset[TreeRow], cfg: Config = Config()): RewriteResult = {
    val spark = forest.sparkSession
    import spark.implicits._
    implicit val kryoEnc: org.apache.spark.sql.Encoder[(Long, ArchiTree)] =
      org.apache.spark.sql.Encoders.kryo[(Long, ArchiTree)]
    implicit val kryoChangedEnc: org.apache.spark.sql.Encoder[((Long, ArchiTree), Boolean)] =
      org.apache.spark.sql.Encoders.kryo[((Long, ArchiTree), Boolean)]

    // the epoch loop's master representation is the parsed Kryo tree
    // dataset — ONE JSON parse on entry and one serialize on exit, not a
    // codec round trip per step (the reference applies up to 7 ops ×
    // 100 epochs; three JSON passes per epoch dominated the loop).
    // Each checkpoint supersedes the previous one: release the old
    // blocks as soon as the new checkpoint has materialized (GC +
    // ContextCleaner reclaim is too lazy — superseded epochs piled up
    // in storage and taxed every later job in the session)
    var lastCkpt: Dataset[(Long, ArchiTree)] = null
    def ckptReleasing(ds: Dataset[(Long, ArchiTree)]): Dataset[(Long, ArchiTree)] = {
      val c = checkpointTrees(ds)
      if (lastCkpt != null) graft.util.Spark.release(lastCkpt)
      lastCkpt = c
      c
    }
    var trees: Dataset[(Long, ArchiTree)] =
      ckptReleasing(Forest.trees(forest))
    val total = trees.count()
    if (total == 0) return RewriteResult(forest, Some(0))
    val minSupport = cfg.minSupport.getOrElse(math.max((total / 10).toInt, 2))

    // epoch counts like the reference: `trange(1, epoch)`
    // (tree_rewriting/__init__.py:127) runs epochs-1 iterations, so
    // epochs=1 is a no-op pass and the default 100 runs 99 — intentional
    // parity, not an off-by-one
    var epoch = 1
    var converged = false
    // deferred release of the op output backing the current `trees` —
    // dropped only after the next checkpoint breaks the lineage
    var releasePrevOp: () => Unit = () => ()

    while (epoch < cfg.epochs && !converged) {
      // 1. reduce_all({ENT}) (tree_rewriting/__init__.py:196-201)
      trees = timed("reduceAll+ckpt") { ckptReleasing(
        trees.map { case (id, t) => (id, t.reduceAll(Set(NodeType.Ent))) })
      }
      releasePrevOp(); releasePrevOp = () => ()

      // 2. cluster the candidate subtrees
      val result = timed("fit") { TreeClusterer.fitTrees(trees, cfg.tau, cfg.decay,
        cfg.metricName, schemaOnly = cfg.schemaOnly)
      }
      val model = result.model
      val modelB = spark.sparkContext.broadcast(model)

      // 3. find_groups (tree_rewriting/__init__.py:648-706): relabel
      // qualifying cluster members as GROUPs, frequent clusters first.
      // Typed cogroup — the Kryo dataset has no named columns to join on.
      val rank: Map[String, Int] = model.clusters.values.toSeq
        .filter(_.support > minSupport)
        .sortBy(c => (-c.support, -c.avgEntities, -c.avgDepth, c.name))
        .zipWithIndex.map { case (c, i) => c.name -> i }.toMap
      val rankB = spark.sparkContext.broadcast(rank)
      // with no cluster above minSupport, findGroupsInTree is identity
      // on every tree — skip the cogroup shuffle and checkpoint outright
      if (rank.nonEmpty) {
        trees = trees.groupByKey(_._1)
          .cogroup(result.assignments.groupByKey(_.treeId)) { case (tid, ts, as) =>
            val assigns = as.map(a => a.key -> a.cluster).toSeq
            ts.map { case (id, tree) =>
              (id, findGroupsInTree(tree, id, assigns, rankB.value))
            }
          }
        // materialize the cogroup output once for the op passes below
        trees = timed("findGroups+ckpt") { ckptReleasing(trees) }
      }
      // the per-fit assignments cache is consumed (or unused) now —
      // release it, or N epochs stack N caches in executor storage
      result.assignments.unpersist()

      // 4. operations with early exit at the first op that changed
      // anything (tree_rewriting/__init__.py:203-218). Trials never
      // mutate the forest, so the firing index is computable on the
      // SAME epoch input in ONE fused pass. The consumed quantity is
      // only the MINIMUM op index that changed any tree (the old
      // per-op counts were only ever tested for > 0 at indexWhere), so
      // each tree stops trialing at its own first hit AND at the
      // partition's running minimum — ops that can no longer lower the
      // global minimum are never evaluated. Semantics are unchanged:
      // ops below the returned index changed NOTHING anywhere, so the
      // global first-positive index is exactly the min over trees of
      // each tree's first-changing index.
      val opsArr = cfg.operations.toArray
      val firing: Int = timed("opTrials") {
        trees.mapPartitions { it =>
          var m = opsArr.length // = "no op fired" sentinel, and the bound
          it.foreach { case (id, tree) =>
            var i = 0
            var hit = false
            while (!hit && i < m) {
              hit = opsArr(i).fn(tree, modelB.value, minSupport, id.toString)._2
              if (hit) m = i else i += 1
            }
          }
          Iterator.single(m)
        }.reduce(math.min)
      }
      if (firing < opsArr.length) {
        val op = opsArr(firing)
        // LAZY apply: the op output's one consumer is the next epoch's
        // reduceAll checkpoint (or the exit serialization), so the op
        // map fuses into that pass instead of paying its own eager
        // persist + count — one full Kryo write+read cycle per firing
        // epoch gone. Ops below `firing` are identity on every tree
        // (proven by the trial pass), so applying only the firing op
        // is the reference's early-exit application exactly. The
        // epoch-hook path adds a second consumer per epoch — only
        // there a (lazy) cache pays for itself.
        timed(s"op:${op.name} (lazy)") {
          var mapped = trees.map { case (id, tree) =>
            (id, op.fn(tree, modelB.value, minSupport, id.toString)._1)
          }
          if (cfg.epochHook.isDefined) {
            val persisted = mapped.persist(StorageLevel.MEMORY_AND_DISK)
            releasePrevOp = () => { persisted.unpersist(); () }
            mapped = persisted
          }
          trees = mapped
        }
      }

      converged = firing == opsArr.length
      cfg.epochHook.foreach { hook =>
        hook(epoch, trees.map { case (id, t) => TreeRow(id, TreeJson.toJson(t)) })
      }
      epoch += 1
    }

    // post-process (tree_rewriting/__init__.py:227-259): naming-only
    // relations + collections, no early exit. The WHOLE exit chain stays
    // on the parsed Kryo trees: the old TreeRow-shaped exit serialized
    // to JSON first and then paid a parse+serialize round trip in the
    // post-process map plus a parse in EACH simplifyNames pass — three
    // full-forest JSON codec passes whose only purpose was crossing the
    // row boundary. Now the forest is serialized exactly once, at the
    // very end.
    var curTrees: Dataset[(Long, ArchiTree)] = trees.map { case (id, t) =>
      val (t1, _) = TreeOps.findRelations(t, namingOnly = true)
      val (t2, _) = TreeOps.findCollections(t1, namingOnly = true)
      (id, t2)
    }

    // simplifyNames adds a second exit action (its group-name collect)
    // on top of the final checkpoint — cache the post-processed exit
    // chain lazily so the (possibly still-pending lazy op plus)
    // post-process work runs once, not once per action
    val sharedExit =
      if (cfg.simplifyNames) Some(curTrees.persist(StorageLevel.MEMORY_AND_DISK))
      else None
    sharedExit.foreach(c => curTrees = c)
    if (cfg.simplifyNames)
      curTrees = timed("simplifyNames") { simplifyNamesTrees(curTrees) }
    val out = timed("final ckpt") { Forest.checkpoint(
      curTrees.map { case (id, t) => TreeRow(id, TreeJson.toJson(t)) }) }
    sharedExit.foreach(_.unpersist(blocking = false))
    if (lastCkpt != null) graft.util.Spark.release(lastCkpt)
    releasePrevOp()
    // the loop exits with `epoch` one past the last pass run; when that
    // last pass fired nothing, it IS the natural fixpoint epoch
    RewriteResult(out, if (converged) Some(epoch - 1) else None)
  }

  /** Per-epoch lineage break for the Kryo tree dataset. */
  private def checkpointTrees(ds: Dataset[(Long, ArchiTree)]): Dataset[(Long, ArchiTree)] =
    graft.util.Spark.checkpoint(ds)

  /** find_groups applied inside one tree: assignments ordered by cluster
    * rank (frequent first); conditions re-checked on the evolving tree.
    */
  private[rewrite] def findGroupsInTree(
      tree: ArchiTree,
      treeId: Long,
      assigns: Seq[(String, String)],
      rank: Map[String, Int],
  ): ArchiTree = {
    val ordered = assigns
      .flatMap { case (key, cluster) =>
        rank.get(cluster).map { r =>
          val path = key.split("/", 2)(1) match {
            case ""   => Vector.empty[Int]
            case rest => rest.split("\\.").map(_.toInt).toVector
          }
          (r, path, cluster)
        }
      }
      .sortBy { case (r, path, _) => (r, path.mkString(".")) }

    ordered.foldLeft(tree) { case (t, (_, path, cluster)) =>
      nodeAt(t, path) match {
        case Some(node) if qualifies(t, path, node) =>
          if (node.hasType(NodeType.Group))
            t.updated(path, node.copy(label = Typed(NodeType.Group, cluster)))
          else
            t.updated(path, TreeOps.createGroup(node, cluster))
        case _ => t
      }
    }
  }

  private def nodeAt(t: ArchiTree, path: Vector[Int]): Option[ArchiTree] =
    path.foldLeft(Option(t)) {
      case (Some(n), i) if i < n.children.size =>
        n.children(i) match {
          case Child.Node(c) => Some(c)
          case _             => None
        }
      case _ => None
    }

  private def qualifies(root: ArchiTree, path: Vector[Int], node: ArchiTree): Boolean = {
    val parentIsGroup = path.nonEmpty &&
      nodeAt(root, path.dropRight(1)).exists(_.hasType(NodeType.Group))
    node.children.size >= 2 &&
    !parentIsGroup &&
    node.children.forall {
      case Child.Node(c) => c.hasType(NodeType.Ent)
      case _             => false
    } &&
    !node.hasDuplicateEntity
  }

  /** _simplify_names (tree_rewriting/__init__.py:262-308): canonicalize
    * group names (strip `_<n>` suffixes, disambiguate collisions with an
    * index), then rename RELs `A<->B` and COLLs after contained groups.
    * The reference indexes original labels in forest-iteration order;
    * here they are sorted for determinism.
    */
  def simplifyNames(forest: Dataset[TreeRow]): Dataset[TreeRow] = {
    import forest.sparkSession.implicits._
    val groupNames = timed("simplify:groupNames") { forest.flatMap { row =>
      TreeJson.fromJson(row.tree).subtrees.collect {
        case t if t.hasType(NodeType.Group) => t.label.name
      }
    }.distinct().collect().sorted }
    val renamesB = forest.sparkSession.sparkContext.broadcast(renameMap(groupNames))
    Forest.mapTrees(forest)(t => renameTree(renamesB.value, t))
  }

  /** [[simplifyNames]] over the parsed Kryo tree dataset — the rewrite
    * exit path's variant: same name collection, same rename map, same
    * per-tree transform, no JSON codec round trips.
    */
  private def simplifyNamesTrees(
      trees: Dataset[(Long, ArchiTree)]): Dataset[(Long, ArchiTree)] = {
    import trees.sparkSession.implicits._
    implicit val kryoEnc: org.apache.spark.sql.Encoder[(Long, ArchiTree)] =
      org.apache.spark.sql.Encoders.kryo[(Long, ArchiTree)]
    val groupNames = timed("simplify:groupNames") { trees.flatMap { case (_, tree) =>
      tree.subtrees.collect {
        case t if t.hasType(NodeType.Group) => t.label.name
      }
    }.distinct().collect().sorted }
    val renamesB = trees.sparkSession.sparkContext.broadcast(renameMap(groupNames))
    trees.map { case (id, t) => (id, renameTree(renamesB.value, t)) }
  }

  private def renameMap(groupNames: Array[String]): Map[String, String] =
    groupNames
      .groupBy(baseName)
      .flatMap { case (base, originals) =>
        originals.sorted.zipWithIndex.map { case (orig, i) =>
          orig -> (if (i == 0) base else s"${base}_$i")
        }
      }

  /** The per-tree simplify transform: group renames, then REL/COLL
    * relabelling after the contained groups.
    */
  private def renameTree(renames: Map[String, String], tree: ArchiTree): ArchiTree = {
    def rename(t: ArchiTree): ArchiTree = {
      val kids = t.children.map {
        case Child.Node(c) => Child.Node(rename(c)): Child
        case l             => l
      }
      val relabelled = t.label match {
        case Typed(NodeType.Group, n) =>
          Typed(NodeType.Group, renames.getOrElse(n, n))
        case other => other
      }
      t.copy(label = relabelled, children = kids)
    }
    val renamed = rename(tree)
    def fixRelColl(t: ArchiTree): ArchiTree = {
      val kids = t.children.map {
        case Child.Node(c) => Child.Node(fixRelColl(c)): Child
        case l             => l
      }
      val withKids = t.copy(children = kids)
      val groups = withKids.groups
      val relabelled =
        if (withKids.hasType(NodeType.Rel) && groups.nonEmpty)
          withKids.copy(label = Typed(NodeType.Rel, groups.toSeq.sorted.mkString("<->")))
        else if (withKids.hasType(NodeType.Coll) && groups.nonEmpty)
          withKids.copy(label = Typed(NodeType.Coll, groups.toSeq.sorted.head))
        else withKids
      relabelled
    }
    fixRelColl(renamed)
  }

  private def baseName(name: String): String = {
    val base = name.replaceAll("(_\\d+)+$", "")
    if (base.matches("^\\d*$")) "UndefinedGroup" else base
  }

  /** simple_rewrite (simplification/simple_rewrite.py:19-66): collapse
    * every tree with unlabelled nodes into one GROUP of its distinct
    * entities; group ids are assigned per distinct sorted entity-label
    * set (sorted order here; insertion order in the reference).
    */
  def simpleRewrite(forest: Dataset[TreeRow]): Dataset[TreeRow] = {
    import forest.sparkSession.implicits._
    val keys = forest
      .flatMap(row => TreeOps.simpleRewriteKey(TreeJson.fromJson(row.tree)))
      .distinct()
      .collect()
      .sortBy(_.mkString("\u0001"))
    val ids: Map[Seq[String], String] =
      keys.zipWithIndex.map { case (k, i) => (k: Seq[String]) -> (i + 1).toString }.toMap
    val idsB = forest.sparkSession.sparkContext.broadcast(ids)
    Forest.mapTrees(forest)(t => TreeOps.simpleRewriteTree(t, idsB.value))
  }
}
