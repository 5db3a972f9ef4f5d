package graft.similarity

import graft.core._
import graft.model.{Forest, TreeRow}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Serializable feature rows (Set → sorted Seq for the product encoder). */
final case class LevelRow(id: String, label: String, isTyped: Boolean, ents: Seq[String]) {
  def toFeature: LevelFeature = LevelFeature(id, label, isTyped, ents.toSet)
}
final case class CandRow(
    key: String,
    treeId: Long,
    height: Int,
    depth: Int,
    labelName: String,
    labelTyped: Boolean,
    levels: Seq[LevelRow]) {
  def toFeature: SubtreeFeature =
    SubtreeFeature(levels.map(_.toFeature).toVector, height, depth)
}

/** One clustered subtree: cluster name + membership weight. */
final case class Assignment(key: String, treeId: Long, cluster: String, prob: Double)

/** Joined (assignment, candidate) row for the executor-side model build. */
final case class MemberRow(cluster: String, prob: Double, key: String, cand: CandRow)

/** Identity-free canonical form of a subtree feature — exactly the key
  * the fit() collapse groups on (level ids excluded, ent sets sorted).
  * Two subtrees with equal StructKeys score 1.0 and always co-cluster,
  * so "my StructKey is one of the cluster's" is an exact membership
  * test, and the set of distinct StructKeys per cluster is bounded by
  * schema variety — broadcastable at any data size (unlike the raw
  * member-id set, which grows with the data).
  */
final case class StructLevel(label: String, isTyped: Boolean, ents: Seq[String])
final case class StructKey(height: Int, depth: Int, levels: Seq[StructLevel]) {
  override def toString: String = s"StructKey(h=$height,d=$depth,${levels.size} levels)"
}
object StructKey {
  def of(f: SubtreeFeature): StructKey =
    StructKey(f.height, f.depth,
      f.levels.map(l => StructLevel(l.label, l.isTyped, l.entLabels.toSeq.sorted)))
}

/** Broadcastable cluster summary for get_equiv_of scoring
  * (reference similarity.py:370-432): members sorted by probability
  * descending, capped at `keep` features per cluster; membership is
  * testable via the distinct structural features (`memberFeats`).
  */
final case class ClusterSummary(
    name: String,
    support: Int,
    memberFeats: Set[StructKey],
    members: Vector[(SubtreeFeature, Double)],
    avgEntities: Double,
    avgDepth: Double) extends Serializable

final class ClusterModel(
    val clusters: Map[String, ClusterSummary],
    val tau: Double,
    val decay: Double,
    metricName: String) extends Serializable {

  @transient private lazy val metric = SeqMetrics.byName(metricName)

  // --- getEquivOf memo --------------------------------------------------
  // The score depends on the query feature f only through (a) its
  // StructKey — labels, typed flags, sorted entity sets, height, depth —
  // and (b) level-id EQUALITY against a kept member's level id (the
  // reference's oid check, similarity.py:148-151). When none of f's ids
  // occurs among the model's member ids, (b) can never fire and the
  // result is a pure function of (StructKey, topK) — cacheable. The ids
  // that CAN match are only those of the kept top-K member features
  // (the similarity paths see no others), a set bounded by
  // clusters × keepPerCluster × levels. One epoch's trees are
  // structurally repetitive (the fit collapse measures hundredfold
  // rep ratios), so op trials across structural twins re-ask the same
  // keys thousands of times; the cache lives inside the (per-epoch)
  // broadcast instance and dies with it. Size-capped as a guard against
  // pathological shape variety — past the cap lookups still hit, new
  // shapes just stop being added.
  @transient private lazy val memberIds: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    clusters.valuesIterator.foreach(_.members.foreach(_._1.levels.foreach(l => s.add(l.id))))
    s
  }
  @transient private lazy val equivCache =
    new java.util.concurrent.ConcurrentHashMap[(StructKey, Int), Option[String]]()
  private val EquivCacheCap = 100000

  def support(name: String): Int = clusters.get(name).map(_.support).getOrElse(0)

  // flat (support, member self ent-set, its sorted rendering) index for
  // entityGroupsAbove — iterated once per miss instead of re-walking the
  // cluster map / re-sorting each member set per query
  @transient private lazy val memberEnts: Array[(Int, Set[String], Seq[String])] =
    clusters.valuesIterator.flatMap(c =>
      c.members.iterator.map(m =>
        (c.support, m._1.self.entLabels, m._1.self.entLabels.toSeq.sorted))).toArray
  @transient private lazy val entityGroupsCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Set[String]), Set[Seq[String]]]()

  /** Entity-label sets of members in clusters with support strictly above
    * `support` that intersect `entityLabels`, as sorted label seqs — the
    * FindSubGroups search-space prune (groups.py:92-130). Memoized: the
    * op trials re-ask this for every candidate node of every structural
    * twin in an epoch.
    */
  def entityGroupsAbove(support: Int, entityLabels: Set[String]): Set[Seq[String]] = {
    val key = (support, entityLabels)
    val hit = entityGroupsCache.get(key)
    if (hit != null) return hit
    val r = memberEnts.iterator
      .filter { case (s, ls, _) => s > support && ls.exists(entityLabels.contains) }
      .map(_._3)
      .toSet
    if (entityGroupsCache.size < 100000) entityGroupsCache.put(key, r)
    r
  }

  /** Mirror of TreeClusterer.get_equiv_of: membership by id; else early
    * accept when similarity to the cluster center ≥ tau; else
    * probability-weighted mean similarity against the top_k members in
    * center-similarity order.
    */
  def getEquivOf(f: SubtreeFeature, topK: Int = 20): Option[String] = {
    val sk = StructKey.of(f)
    var idFree = true
    f.levels.foreach(l => if (memberIds.contains(l.id)) idFree = false)
    if (!idFree) return computeEquiv(f, sk, topK)
    val key = (sk, topK)
    val hit = equivCache.get(key)
    if (hit != null) hit
    else {
      val r = computeEquiv(f, sk, topK)
      if (equivCache.size < EquivCacheCap) equivCache.put(key, r)
      r
    }
  }

  private def computeEquiv(f: SubtreeFeature, sk: StructKey, topK: Int): Option[String] = {
    val centerSims = scala.collection.mutable.ListBuffer.empty[(String, Double)]
    for ((name, c) <- clusters) {
      if (c.memberFeats.contains(sk)) return Some(name)
      c.members.headOption.foreach { case (center, _) =>
        val sim = Similarity.similarity(f, center, metric, decay)
        if (sim >= tau) return Some(name)
        centerSims += name -> sim
      }
    }
    centerSims.sortBy(-_._2).foreach { case (name, _) =>
      val c = clusters(name)
      var simSum = 0.0
      var wSum = 0.0
      c.members.take(topK).foreach { case (m, p) =>
        simSum += Similarity.similarity(f, m, metric, decay) * p
        wSum += p
      }
      if (wSum > 0 && simSum / wSum >= tau) return Some(name)
    }
    None
  }
}

/** Spark-native replacement of the reference's O(n²)+HDBSCAN clusterer
  * (similarity.py:200-368), per SURVEY §2.5:
  *
  *   1. candidate subtrees (height ≤ 5, non-ENT, no duplicate entities)
  *      with precomputed ancestor features — one flatMap, no shuffle;
  *   2. pair generation by BLOCKING on shared entity label (the
  *      reference's own shortcut proves disjoint pairs score 0), plus the
  *      height/depth-gap prune (similarity.py:456-461) as a join filter;
  *   3. similarity scoring of surviving pairs only; keep ≥ tau;
  *   4. clusters = connected components of the tau-graph via iterative
  *      min-label propagation (O(log n) rounds);
  *   5. membership "probability" = mean incident-edge similarity
  *      (replaces HDBSCAN's soft membership), clusters named
  *      `<modalTypedLabel>_<i>` like the reference (:341-368).
  *
  * This reproduces the role (equivalence classes of similar subtrees) —
  * not HDBSCAN's exact labels; quality is validated by AMI in tests.
  */
object TreeClusterer {

  final case class Result(assignments: Dataset[Assignment], model: ClusterModel)

  @inline private def timed[A](label: String)(body: => A): A =
    graft.util.Spark.timed("fit-profile", label)(body)

  def candidates(
      forest: Dataset[TreeRow],
      maxHeight: Int = 5,
      entityParentsOnly: Boolean = false,
  ): Dataset[CandRow] = {
    import forest.sparkSession.implicits._
    forest.flatMap(row =>
      candidateRows(row.treeId, TreeJson.fromJson(row.tree), maxHeight, entityParentsOnly))
  }

  /** Same extraction over an already-parsed tree dataset — the rewrite
    * epoch loop keeps its forest as Kryo trees and skips the JSON codec.
    */
  def candidatesFromTrees(
      trees: Dataset[(Long, ArchiTree)],
      maxHeight: Int = 5,
      entityParentsOnly: Boolean = false,
  ): Dataset[CandRow] = {
    import trees.sparkSession.implicits._
    trees.flatMap { case (id, tree) => candidateRows(id, tree, maxHeight, entityParentsOnly) }
  }

  private def candidateRows(
      treeId: Long,
      tree: ArchiTree,
      maxHeight: Int,
      entityParentsOnly: Boolean,
  ): Iterator[CandRow] = {
    val feats = Similarity.treeFeatures(tree, treeId.toString, maxHeight)
    val kept =
      if (!entityParentsOnly) feats
      else {
        // entity_labels mode (similarity.py:539-545): only subtrees
        // with a direct ENT child participate
        val parents = tree.positionedSubtrees.collect {
          case (path, t) if !t.hasType(NodeType.Ent) && t.hasEntityChild =>
            s"$treeId/${path.mkString(".")}"
        }.toSet
        feats.filter { case (k, _) => parents.contains(k) }
      }
    kept.iterator.map { case (key, f) =>
      CandRow(
        key, treeId, f.height, f.depth,
        // label NAME for cluster naming; typed flag filters untyped
        keyLabelName(f.self.label), f.self.isTyped,
        f.levels.map(l => LevelRow(l.id, l.label, l.isTyped, l.entLabels.toSeq.sorted)))
    }
  }

  private def keyLabelName(rendered: String): String = Label.parse(rendered).name

  def fit(
      forest: Dataset[TreeRow],
      tau: Double = 0.7,
      decay: Double = Similarity.Decay,
      metricName: String = "jaro",
      maxHeight: Int = 5,
      minClusterSize: Int = 2,
      keepPerCluster: Int = 20,
      entityParentsOnly: Boolean = false,
      schemaOnly: Boolean = false,
      buildModel: Boolean = true,
  ): Result =
    fitImpl(candidates(forest, maxHeight, entityParentsOnly),
      () => graft.model.Schema.templateFromTrees(Forest.trees(forest)).toTree,
      tau, decay, metricName, maxHeight, minClusterSize, keepPerCluster, schemaOnly,
      buildModel)

  /** fit() over an already-parsed Kryo tree dataset — the rewrite epoch
    * loop's entry point; skips the JSON parse in candidate extraction.
    */
  def fitTrees(
      trees: Dataset[(Long, ArchiTree)],
      tau: Double = 0.7,
      decay: Double = Similarity.Decay,
      metricName: String = "jaro",
      maxHeight: Int = 5,
      minClusterSize: Int = 2,
      keepPerCluster: Int = 20,
      entityParentsOnly: Boolean = false,
      schemaOnly: Boolean = false,
      buildModel: Boolean = true,
  ): Result =
    // the schema-only template derives from the parsed trees directly —
    // no JSON round trip (and no nodes self-join) per epoch
    fitImpl(candidatesFromTrees(trees, maxHeight, entityParentsOnly),
      () => graft.model.Schema.templateFromTrees(trees).toTree,
      tau, decay, metricName, maxHeight, minClusterSize, keepPerCluster, schemaOnly,
      buildModel)

  private def fitImpl(
      candsIn: Dataset[CandRow],
      schemaTemplate: () => ArchiTree,
      tau: Double,
      decay: Double,
      metricName: String,
      maxHeight: Int,
      minClusterSize: Int,
      keepPerCluster: Int,
      schemaOnly: Boolean,
      buildModel: Boolean = true,
  ): Result = {
    require(tau >= 0 && tau <= 1, "tau must be between 0 and 1")
    val spark = candsIn.sparkSession
    import spark.implicits._

    // both member paths scan the candidate extraction exactly once (the
    // instance path materializes it straight into the persisted withFeat
    // frame), so caching it here would only duplicate that storage
    val cands = candsIn

    val (membersDf, releaseIntermediates) =
      if (schemaOnly)
        (schemaOnlyMembers(schemaTemplate(), cands, tau, decay, metricName, maxHeight,
          minClusterSize), () => ())
      else instanceMembers(cands, tau, decay, metricName, maxHeight)

    // schema-only members scan the raw candidate extraction (no cache
    // underneath), so re-deriving them per downstream job would re-walk
    // every tree — persist. The instance path needs no cache here: its
    // members frame is the persisted withFeat scan plus rep-sized
    // broadcast joins, re-derivable per job for less than one full-width
    // cache write per fit (the distributed tau-graph variant persists
    // inside instanceMembers, where the recompute would be real work)
    val members =
      if (schemaOnly) membersDf.persist(StorageLevel.MEMORY_AND_DISK) else membersDf

    // component stats for deterministic naming, ONE aggregation at the
    // (comp, labelName, labelTyped) grain — bounded by comps × labels —
    // from which sizes, min nodes, and modal typed labels all derive.
    // When the model is wanted, the SAME pass also carries the model's
    // per-cluster support/avgEntities/avgDepth sums and the distinct
    // member StructKeys (collect_set at this grain ≡ the old
    // distinct-then-collect featRows job): what used to be two more
    // full member scans (statRows + featRows) folds into this one.
    val structKeyCol = struct(
      col("height"), col("depth"),
      expr("transform(levels, l -> struct(l.label AS label, l.isTyped AS isTyped, l.ents AS ents))"))
    val nameAggs =
      if (!buildModel) Seq(count(lit(1)).as("n"), min("node").as("minNode"))
      else Seq(count(lit(1)).as("n"), min("node").as("minNode"),
        sum(size(col("levels").getItem(0).getField("ents"))).as("sumEnts"),
        sum(col("depth")).as("sumDepth"),
        collect_set(structKeyCol).as("feats"))
    val nameStats = timed("nameStats") { members
      .groupBy("comp", "labelName", "labelTyped")
      .agg(nameAggs.head, nameAggs.tail: _*)
      .collect()
    }
    val byComp = nameStats.groupBy(_.getString(0))
    val compStats = byComp.toSeq
      .map { case (comp, rows) =>
        (comp, rows.map(_.getLong(3)).sum, rows.map(_.getString(4)).min)
      }
      .filter(_._2 >= minClusterSize)
      .sortBy { case (comp, size, minNode) => (-size, minNode) }
    val modal: Map[String, String] = byComp.flatMap { case (comp, rows) =>
      val typed = rows.filter(_.getBoolean(2))
      if (typed.isEmpty) None
      else Some(comp -> typed.maxBy(r => (r.getLong(3), r.getString(1))).getString(1))
    }.toMap

    val naming: Map[String, String] = compStats.zipWithIndex.map { case ((comp, _, _), i) =>
      val name = modal.get(comp).map(m => s"${m}_$i").getOrElse(i.toString)
      comp -> name
    }.toMap
    val namingDf = naming.toSeq.toDF("comp", "cluster")

    val withCluster = members.join(broadcast(namingDf), Seq("comp"))
    val assignments = withCluster
      .select(col("node").as("key"), col("treeId"), col("cluster"), col("prob"))
      .as[Assignment]
      .persist(StorageLevel.MEMORY_AND_DISK)

    // --- broadcastable model, built executor-side ---
    // the driver receives only (a) one stats row per cluster, (b) the
    // distinct StructKeys per cluster (bounded by schema variety, the
    // whole point of the identity-free key), and (c) the window-ranked
    // top-`keepPerCluster` member features — O(clusters × K), never
    // O(members). The members frame already carries every candidate
    // column, so the model rows come straight from it — no second
    // shuffle join back against cands. Callers that consume only the
    // assignments (entity_labels) pass buildModel = false and skip all
    // three jobs.
    val summaries: Map[String, ClusterSummary] = if (!buildModel) {
      // materialize the returned assignments BEFORE the backing frames
      // are released — afterwards a recompute would rebuild the chain
      timed("assignments") { assignments.count() }
      if (schemaOnly) members.unpersist()
      Map.empty
    } else {
      // lazy projection of the (cached-or-cheap) members frame — the
      // top-K job below re-derives it rather than paying a third
      // full-width materialization per fit
      val memberRows = withCluster
        .select(col("cluster"), col("prob"), col("node").as("key"),
          struct(col("node").as("key"), col("treeId"), col("height"), col("depth"),
            col("labelName"), col("labelTyped"), col("levels")).as("cand"))
        .as[MemberRow]

      val rankWin = org.apache.spark.sql.expressions.Window
        .partitionBy("cluster").orderBy(col("prob").desc, col("key").asc)
      val topRows = timed("topRows") { memberRows.toDF()
        .withColumn("rn", row_number().over(rankWin))
        .filter(col("rn") <= keepPerCluster)
        .drop("rn")
        .as[MemberRow]
        .collect()
      }
      // materialize the returned assignments BEFORE the backing frames are
      // released — afterwards a recompute would rebuild the whole chain
      timed("assignments") { assignments.count() }
      if (schemaOnly) members.unpersist()

      // per-cluster support / avgEntities / avgDepth / distinct
      // StructKeys — all derived driver-side from the extended
      // nameStats rows (exact long sums, ONE double division each:
      // bit-identical to the former per-cluster Spark avg()), so the
      // old statRows + featRows member scans are gone
      val membersByCluster = topRows.groupBy(_.cluster)
      naming.map { case (comp, name) =>
        val rows = byComp(comp)
        val support = rows.map(_.getLong(3)).sum
        val sumEnts = rows.map(_.getLong(5)).sum
        val sumDepth = rows.map(_.getLong(6)).sum
        val feats: Set[StructKey] = rows.iterator
          .flatMap(_.getSeq[org.apache.spark.sql.Row](7))
          .map { f =>
            StructKey(f.getInt(0), f.getInt(1),
              f.getSeq[org.apache.spark.sql.Row](2).map(l =>
                StructLevel(l.getString(0), l.getBoolean(1), l.getSeq[String](2))))
          }.toSet
        val ms = membersByCluster.getOrElse(name, Array.empty[MemberRow])
          .sortBy(m => (-m.prob, m.key))
          .map(m => (m.cand.toFeature, m.prob)).toVector
        name -> ClusterSummary(
          name, support.toInt, feats, ms,
          sumEnts.toDouble / support, sumDepth.toDouble / support)
      }.toMap
    }

    releaseIntermediates()
    Result(assignments, new ClusterModel(summaries, tau, decay, metricName))
  }

  /** schema_only mode (similarity.py:230,296-339): cluster the SCHEMA
    * template's subtrees driver-side — the template is bounded by schema
    * variety, never data size — then map every instance candidate to its
    * self-label's component. Membership probability is 1.0, as in the
    * reference. Components with fewer than minClusterSize schema
    * subtrees are noise (the reference's HDBSCAN drops them before the
    * label expansion).
    */
  private def schemaOnlyMembers(
      template: ArchiTree,
      cands: Dataset[CandRow],
      tau: Double,
      decay: Double,
      metricName: String,
      maxHeight: Int,
      minClusterSize: Int,
  ): DataFrame = {
    val spark = cands.sparkSession
    import spark.implicits._
    val metric = SeqMetrics.byName(metricName)
    val schemaFeats = Similarity.treeFeatures(template, "schema", maxHeight)
      .toSeq.sortBy(_._1)

    // union-find over the O(k²) template pairs
    val parent = schemaFeats.indices.toArray
    def find(i: Int): Int = {
      var r = i
      while (parent(r) != r) r = parent(r)
      var c = i
      while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    for {
      i <- schemaFeats.indices
      j <- (i + 1) until schemaFeats.size
      if Similarity.similarity(schemaFeats(i)._2, schemaFeats(j)._2, metric, decay) >= tau
    } {
      val (ra, rb) = (find(i), find(j))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val labelComp: Seq[(String, String)] = schemaFeats.indices
      .groupBy(find)
      .filter(_._2.size >= math.max(minClusterSize, 2))
      .toSeq
      .flatMap { case (root, members) =>
        members.map(i => schemaFeats(i)._2.self.label -> s"schema/$root")
      }.distinct

    val compDf = labelComp.toDF("selfLabel", "comp")
    cands.toDF()
      .withColumn("selfLabel", col("levels").getItem(0).getField("label"))
      .join(broadcast(compDf), Seq("selfLabel"))
      .drop("selfLabel")
      .withColumn("prob", lit(1.0))
      .withColumnRenamed("key", "node")
  }

  /** Above this many distinct structural representatives the tau-graph
    * is built distributed; at or below it the pair scoring + components
    * run driver-side in one pass. The rep count is bounded by schema
    * VARIETY (never data size — that is what the structural collapse
    * guarantees), so for most forests it is tiny and the distributed
    * path's ~10 jobs + iterative CC rounds are pure scheduling latency.
    * Same philosophy as Spark's own broadcast-join threshold: pick the
    * local algorithm when the input provably fits, keep the distributed
    * one as the unbounded-case path. The default (2000 reps) caps the
    * worst case (every rep sharing one entity label) at ~2M scored
    * pairs; tune — or set to -1 to force the distributed path — via the
    * session conf.
    */
  val LocalTauGraphMaxRepsKey = "spark.graft.cluster.localTauGraphMaxReps"
  private def localTauGraphMaxReps(spark: SparkSession): Long =
    spark.conf.getOption(LocalTauGraphMaxRepsKey).map(_.toLong).getOrElse(2000L)

  /** Instance-mode membership: representative collapse → blocking join →
    * tau-edges → connected components → incident-edge probabilities.
    * Returns the members frame plus a release hook for the persisted
    * intermediates (they back the frame until the caller's actions run).
    */
  private def instanceMembers(
      cands: Dataset[CandRow],
      tau: Double,
      decay: Double,
      metricName: String,
      maxHeight: Int,
  ): (DataFrame, () => Unit) = {
    val spark = cands.sparkSession
    import spark.implicits._

    // --- collapse identical structural features ---
    // The similarity metric sees ONLY the ancestor label-sets (never
    // leaf values), so two subtrees with identical (levels, height,
    // depth) score exactly 1.0 and always co-cluster. Collapsing them to
    // one representative (with a multiplicity) BEFORE the pair join is
    // therefore result-preserving, and it is the 100×-scale keystone:
    // a forest of N structurally-identical trees otherwise degenerates
    // the blocking join into N²/2 pairs (15k customer trees ⇒ 112M
    // scored pairs, unbounded at 100 TB), while the distinct-structure
    // count is bounded by schema variety, not data size.
    // the feature key is a STRUCT (not a delimited string — unescaped
    // corpus labels containing the delimiter would collide and wrongly
    // collapse distinct structures); level ids are excluded so twins
    // compare equal. UNTYPED labels are blanked: levelEquivalent only
    // consults labels when BOTH sides are typed, and the fallback metric
    // sees entity-label sets only — so an untyped label can never affect
    // a similarity score, and keeping it in the key shatters the
    // collapse whenever an op mints per-tree-unique UNDEF names
    // (evaluateSubgroup's undefName rename turned 150k structurally
    // identical trees into 24k distinct reps at the 10× canary,
    // degenerating the blocking join). Entity-free subtrees are excluded
    // up front: the metric scores them 0 even against themselves
    // (Similarity shortcut), so they can never cluster — seeding their
    // twins would manufacture clusters the metric forbids.
    val featCol = struct(
      col("height"), col("depth"),
      expr("transform(levels, l -> struct(CASE WHEN l.isTyped THEN l.label ELSE '' END AS label, l.isTyped, l.ents))"))
    val withFeat = cands
      .filter(size(col("levels")(0)("ents")) > 0)
      .withColumn("feat", featCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val repKeys = withFeat.groupBy("feat")
      .agg(min(col("key")).as("key"), count(lit(1)).as("mult"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // --- tau-graph: adaptive local/distributed (see LocalTauGraphMaxRepsKey) ---
    val repCount = timed("collapse+count") { repKeys.count() }
    graft.util.Spark.note("fit-profile", s"repCount=$repCount")
    val small = repCount <= localTauGraphMaxReps(spark)
    // the rep-sized frames (repKeys, labels, incident) are bounded by
    // schema variety when the local path fired; hint the broadcast so
    // the expansion below is map-side instead of shuffling the full
    // candidate set once per join
    def hinted(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    val reps = hinted(repKeys)
      .join(withFeat.drop("feat"), "key")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (labels, incident, releaseGraph) =
      if (small)
        timed("localTauGraph") { localTauGraph(reps, tau, decay, metricName, maxHeight) }
      else
        distributedTauGraph(reps, tau, decay, metricName, maxHeight)

    // --- expand representatives back to every original subtree ---
    // withFeat already carries every candidate column, so the expansion
    // joins the ONE full-size frame against three rep-sized ones — no
    // re-join of the full candidate set against itself by key
    val joined = withFeat
      .join(hinted(repKeys.select(col("feat"), col("key").as("rep"))), "feat")
      .join(hinted(labels.withColumnRenamed("node", "rep")), "rep")
      .join(hinted(incident.withColumnRenamed("node", "rep")), "rep")
      .drop("rep", "feat")
      .withColumnRenamed("key", "node")
    // local path: the chain above is the cached withFeat scan plus three
    // broadcast joins — cheaper to re-derive per downstream job than to
    // write a second full-width cache. Distributed path: labels/incident
    // re-derivation would re-run the CC rounds and edge aggregations, so
    // materialize once here.
    val membersDf =
      if (small) joined else joined.persist(StorageLevel.MEMORY_AND_DISK)

    (membersDf, () => {
      if (!small) membersDf.unpersist()
      withFeat.unpersist()
      repKeys.unpersist()
      reps.unpersist()
      releaseGraph()
      ()
    })
  }

  /** Typed projection of a representative row for the local tau-graph.
    * Public: Spark's generated SafeProjection cannot access a private
    * class and would fall back to interpreted deserialization (after a
    * logged compile failure) on every collect.
    */
  final case class RepRow(
      key: String, mult: Long, height: Int, depth: Int, levels: Seq[LevelRow])

  /** Driver-side tau-graph for a provably-small representative set: the
    * SAME blocking (shared self-level entity label), height/depth-gap
    * prune, min-key component labels and multiplicity-weighted incident
    * probabilities as the distributed path — but one collect and zero
    * shuffles instead of ~10 jobs plus the iterative CC rounds, which at
    * low rep counts are pure scheduler latency.
    */
  private def localTauGraph(
      reps: DataFrame,
      tau: Double,
      decay: Double,
      metricName: String,
      maxHeight: Int,
  ): (DataFrame, DataFrame, () => Unit) = {
    val spark = reps.sparkSession
    import spark.implicits._
    val rows = reps.select("key", "mult", "height", "depth", "levels")
      .as[RepRow].collect().sortBy(_.key)
    val n = rows.length
    val feats = rows.map(r => SubtreeFeature(r.levels.map(_.toFeature).toVector, 0, 0))
    val metric = SeqMetrics.byName(metricName)

    // blocking on the self level's entity labels; rows are key-sorted so
    // index order IS the distributed path's `a.key < b.key` order
    val byEnt = scala.collection.mutable.HashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[Int]]
    for (i <- 0 until n; e <- rows(i).levels.head.ents)
      byEnt.getOrElseUpdate(e, scala.collection.mutable.ArrayBuffer.empty) += i

    // union-find: roots always merge max-under-min, so every root stays
    // the minimum index (= minimum key) of its component — the same
    // label the distributed min-propagation CC produces
    val parent = Array.tabulate(n)(identity)
    def find(i: Int): Int = {
      var r = i
      while (parent(r) != r) r = parent(r)
      var c = i
      while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }

    // probability accumulators over the UNCOLLAPSED graph (same formula
    // as the distributed path: (m_F−1 twins at sim 1.0) + cross edges
    // weighted by the other side's multiplicity)
    val num = Array.tabulate(n)(i => (rows(i).mult - 1).toDouble)
    val den = Array.tabulate(n)(i => (rows(i).mult - 1).toDouble)
    val seen = scala.collection.mutable.HashSet.empty[Long]
    for {
      bucket <- byEnt.valuesIterator
      bi <- 0 until bucket.length
      bj <- (bi + 1) until bucket.length
    } {
      val i = bucket(bi)
      val j = bucket(bj)
      if (seen.add((i.toLong << 32) | j) &&
        math.min(math.abs(rows(i).height - rows(j).height),
          math.abs(rows(i).depth - rows(j).depth)) < maxHeight) {
        val sim = Similarity.similarity(feats(i), feats(j), metric, decay)
        if (sim >= tau) {
          val (ra, rb) = (find(i), find(j))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
          num(i) += rows(j).mult * sim; den(i) += rows(j).mult
          num(j) += rows(i).mult * sim; den(j) += rows(i).mult
        }
      }
    }

    val labels = (0 until n).map(i => (rows(i).key, rows(find(i)).key)).toDF("node", "comp")
    val incident = (0 until n)
      .collect { case i if den(i) > 0 => (rows(i).key, num(i) / den(i)) }
      .toDF("node", "prob")
    (labels, incident, () => ())
  }

  /** Distributed tau-graph: blocking join → UDF scoring → pointer-
    * jumping connected components → incident-edge aggregation. The
    * unbounded-rep-count path; results match localTauGraph exactly.
    */
  private def distributedTauGraph(
      reps: DataFrame,
      tau: Double,
      decay: Double,
      metricName: String,
      maxHeight: Int,
  ): (DataFrame, DataFrame, () => Unit) = {
    // --- blocking join on shared entity label (representatives only) ---
    val byEnt = reps
      .select(col("key"), col("height"), col("depth"), explode(col("levels")(0)("ents")).as("ent"))
    val rawPairs = byEnt.as("a")
      .join(byEnt.as("b"),
        col("a.ent") === col("b.ent") && col("a.key") < col("b.key") &&
          // reference prune (similarity.py:456-461): skip pairs whose
          // min(|Δheight|, |Δdepth|) ≥ maxHeight
          least(
            abs(col("a.height") - col("b.height")),
            abs(col("a.depth") - col("b.depth"))) < maxHeight)
      .select(col("a.key").as("ka"), col("b.key").as("kb"))
      .distinct()

    val metric = metricName
    val d = decay
    val scoreUdf = udf { (la: Seq[org.apache.spark.sql.Row], lb: Seq[org.apache.spark.sql.Row]) =>
      Similarity.similarity(rowsToFeature(la), rowsToFeature(lb), SeqMetrics.byName(metric), d)
    }
    val edges = rawPairs
      .join(reps.select(col("key").as("ka"), col("levels").as("la")), "ka")
      .join(reps.select(col("key").as("kb"), col("levels").as("lb")), "kb")
      .withColumn("sim", scoreUdf(col("la"), col("lb")))
      .filter(col("sim") >= tau)
      .select("ka", "kb", "sim")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // --- connected components of the tau-graph (shared pointer-jumping
    // CC — O(log diameter) rounds, fails loudly if unconverged) ---
    // every representative is seeded: a feature with multiplicity ≥ 2
    // is a complete sim-1.0 subgraph in the uncollapsed graph and must
    // survive as a component even with no cross-feature edge
    val labels = graft.util.Graph.connectedComponents(
      reps.select(col("key").as("node")),
      edges.select(col("ka").as("src"), col("kb").as("dst")))

    // --- membership probability: mean incident kept-edge similarity ---
    // computed over the UNCOLLAPSED graph: a node with feature F has
    // (mult_F − 1) implicit sim-1.0 edges to its structural twins, and
    // its edge to a node of feature G exists once per twin of G — so
    // prob = ((m_F−1)·1 + Σ_G m_G·sim_FG) / ((m_F−1) + Σ_G m_G).
    val multByKey = reps.select(col("key"), col("mult"))
    val crossIncident = edges
      .select(col("ka").as("node"), col("kb").as("other"), col("sim"))
      .union(edges.select(col("kb").as("node"), col("ka").as("other"), col("sim")))
      .join(multByKey.withColumnRenamed("key", "other").withColumnRenamed("mult", "mOther"), "other")
      .groupBy("node")
      .agg(sum(col("mOther") * col("sim")).as("xNum"), sum(col("mOther")).as("xDen"))
    val incident = multByKey.withColumnRenamed("key", "node")
      .join(crossIncident, Seq("node"), "left")
      .withColumn("num", (col("mult") - 1).cast("double") + coalesce(col("xNum"), lit(0.0)))
      .withColumn("den", (col("mult") - 1).cast("double") + coalesce(col("xDen"), lit(0.0)))
      .filter(col("den") > 0)
      .select(col("node"), (col("num") / col("den")).as("prob"))

    (labels, incident, () => {
      edges.unpersist()
      labels.unpersist()
      ()
    })
  }

  private def rowsToFeature(levels: Seq[org.apache.spark.sql.Row]): SubtreeFeature = {
    val ls = levels.map { r =>
      LevelFeature(r.getString(0), r.getString(1), r.getBoolean(2), r.getSeq[String](3).toSet)
    }.toVector
    SubtreeFeature(ls, 0, 0)
  }

  /** entity_labels (similarity.py:514-553): cluster the entity PARENTS
    * (non-ENT subtrees with an ENT child), then assign each child entity
    * oid its parent's cluster name. `metricName = null` variant maps each
    * entity to its parent's label directly.
    *
    * Returns a Dataset of (oid, label), one row per distinct entity oid
    * — callers join rather than receive a driver-side map, so nothing
    * here is sized by entity count. An oid duplicated under differently
    * labelled parents (REL duplication does this) resolves to the max
    * label for determinism (the reference's dict insertion made the
    * winner ordering-dependent).
    */
  def entityLabels(
      forest: Dataset[TreeRow],
      tau: Double,
      metricName: String = "jaro",
      decay: Double = Similarity.Decay,
  ): Dataset[(String, String)] = {
    val trees = Forest.trees(forest).persist(StorageLevel.MEMORY_AND_DISK)
    val out = entityLabelsFromTrees(trees, tau, metricName, decay)
    trees.unpersist()
    out
  }

  /** entityLabels over an already-parsed (and caller-managed) tree
    * dataset — callers holding the parsed forest (Metrics snapshots)
    * avoid a fresh JSON parse per labelling.
    */
  def entityLabelsFromTrees(
      trees: Dataset[(Long, ArchiTree)],
      tau: Double,
      metricName: String = "jaro",
      decay: Double = Similarity.Decay,
  ): Dataset[(String, String)] = {
    import trees.sparkSession.implicits._
    if (metricName == null) {
      val labelled = trees.flatMap { case (treeId, tree) =>
        tree.positionedSubtrees.flatMap { case (path, t) =>
          t.childTrees.zipWithIndex.collect {
            case (c, i) if c.hasType(NodeType.Ent) =>
              val oid = if (c.oid.nonEmpty) c.oid else s"$treeId/${(path :+ i).mkString(".")}"
              oid -> t.label.render
          }
        }
      }.groupBy(col("_1").as("oid")).agg(max(col("_2")).as("label"))
        .as[(String, String)]
      return graft.util.Spark.checkpoint(labelled)
    }

    // assignments are the only consumed output — skip the three
    // model-build jobs (stats, struct-keys, top-K) entirely
    val result = fitTrees(trees, tau = tau, decay = decay, metricName = metricName,
      entityParentsOnly = true, buildModel = false)
    // (parent key, entity oid) pairs, joined against the assignments —
    // no driver-side parent map, no broadcast sized by the forest
    val parentChild = trees.flatMap { case (treeId, tree) =>
      tree.positionedSubtrees.flatMap { case (path, t) =>
        val key = s"$treeId/${path.mkString(".")}"
        t.childTrees.zipWithIndex.collect {
          case (c, i) if c.hasType(NodeType.Ent) =>
            val oid = if (c.oid.nonEmpty) c.oid else s"$treeId/${(path :+ i).mkString(".")}"
            key -> oid
        }
      }
    }.toDF("key", "oid")

    val labelled = result.assignments.toDF().select(col("key"), col("cluster"))
      .join(parentChild, "key")
      .groupBy("oid").agg(max(col("cluster")).as("label"))
      .as[(String, String)]
    // materialize before the caller releases the backing trees (the
    // result is data-sized, so the reliable-checkpoint policy applies)
    val out = graft.util.Spark.checkpoint(labelled)
    result.assignments.unpersist()
    out
  }
}
