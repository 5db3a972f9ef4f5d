package graft.similarity

import graft.SparkSpec
import graft.core._
import graft.model.Forest
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite with SparkSpec {

  test("jaccard doctests (similarity.py:50-60)") {
    assert(SeqMetrics.jaccard(Set("A", "B"), Set("A", "B", "C")) == 2.0 / 3.0)
    assert(SeqMetrics.jaccard(Set("apple", "banana", "cherry"), Set("apple", "cherry", "date")) == 0.5)
    assert(SeqMetrics.jaccard(Set.empty, Set.empty) == 1.0)
  }

  test("levenshtein ratio over sorted label sequences") {
    // indel distance semantics: ratio = 2·LCS/(|a|+|b|)
    assert(SeqMetrics.levenshtein(Set("A", "B"), Set("A", "B", "C")) == 0.8)
    assert(SeqMetrics.levenshtein(Set("A"), Set("B")) == 0.0)
    assert(SeqMetrics.levenshtein(Set("A", "B"), Set("A", "B")) == 1.0)
    assert(SeqMetrics.levenshtein(Set.empty, Set.empty) == 1.0)
  }

  test("jaro-winkler over sorted label sequences") {
    val jw = SeqMetrics.jaro(Set("A", "B"), Set("A", "B", "C"))
    assert(math.abs(jw - 0.9111111111111111) < 1e-12, s"got $jw")
    assert(SeqMetrics.jaro(Set("A", "B"), Set("A", "B")) == 1.0)
    assert(SeqMetrics.jaro(Set("A"), Set("B")) == 0.0)
  }

  private def featuresOf(treeStr: String): Map[String, SubtreeFeature] =
    Similarity.treeFeatures(SExpr.parse(treeStr), "t").toMap

  test("similarity doctest: siblings under one root = 0.5555… with jaccard") {
    val fs = featuresOf(
      "(S (X (ENT::person Alice) (ENT::fruit apple)) (Y (ENT::person Bob) (ENT::animal rabbit)))")
    val sim = Similarity.similarity(fs("t/0"), fs("t/1"), SeqMetrics.jaccard)
    assert(math.abs(sim - 0.5555555555555555) < 1e-12, s"got $sim")
  }

  test("similarity shortcuts: disjoint → 0, same typed label → 1") {
    val fs = featuresOf("(S (GROUP::A (ENT::x 1)) (GROUP::A (ENT::x 2)) (Z (ENT::q 3)))")
    assert(Similarity.similarity(fs("t/0"), fs("t/1")) == 1.0) // same typed label
    assert(Similarity.similarity(fs("t/0"), fs("t/2")) == 0.0) // disjoint ents
  }

  test("candidate predicate: ENTs, tall and duplicate-entity subtrees excluded") {
    val t = SExpr.parse("(S (ENT::a 1) (X (ENT::b 2) (ENT::b 3)))")
    assert(!Similarity.isCandidate(t(Vector(0)))) // ENT node
    assert(!Similarity.isCandidate(t(Vector(1)))) // duplicate entity labels
    assert(!Similarity.isCandidate(t)) // dup propagates to the root
    val ok = SExpr.parse("(X (ENT::b 2) (ENT::c 3))")
    assert(Similarity.isCandidate(ok))
    assert(!Similarity.isCandidate(ok, maxHeight = 2)) // too tall for cap
  }

  test("clusterer groups equivalent subtrees across trees") {
    def tree(p: String, f: String, a: String) =
      SExpr.parse(s"(S (X (ENT::person $p) (ENT::fruit $f)) (Y (ENT::person $p) (ENT::animal $a)))")
    val forest = Forest.fromTrees(spark,
      Seq(tree("Alice", "apple", "rabbit"), tree("Bob", "banana", "dog"), tree("Carol", "cherry", "cat")))
    val result = TreeClusterer.fit(forest, tau = 0.7, metricName = "jaccard")
    val byCluster = result.assignments.collect().groupBy(_.cluster)
    assert(byCluster.size == 2)
    // each cluster holds the three same-role nodes, one per tree
    assert(byCluster.values.map(_.length).toSet == Set(3))
    val keysByCluster = byCluster.values.map(_.map(_.key.split("/")(1)).toSet).toSet
    assert(keysByCluster == Set(Set("0"), Set("1"))) // all X together, all Y together
  }

  test("structural twins with no similar neighbor still cluster, at prob 1.0") {
    // all three X-subtrees are feature-identical (the metric never sees
    // leaf values); the Z-subtree shares no entity label with anything.
    // Exercises the representative-collapse path: the twins form a
    // complete sim-1.0 subgraph with NO cross-feature edge, so the
    // cluster must come from the multiplicity seeding, not edges.
    // the duplicated ENT::a at root level excludes the S-root itself
    // from candidacy (no-duplicate-entities rule), as in the test above
    // tree 3: root excluded by the duplicated ENT::zz, and Z vs W score
    // 0.667 < tau — genuinely nothing tau-similar inside it
    val trees = Seq("v1", "v2", "v3").map(v =>
      SExpr.parse(s"(S (X (ENT::a $v) (ENT::b w)) (Y (ENT::a $v)))")) :+
      SExpr.parse("(S (Z (ENT::zz q)) (W (ENT::zz r) (ENT::ww s)))")
    val forest = Forest.fromTrees(spark, trees)
    val result = TreeClusterer.fit(forest, tau = 0.7, metricName = "jaccard")
    val byCluster = result.assignments.collect().groupBy(_.cluster)
    val xCluster = byCluster.values.find(_.exists(_.key.endsWith("/0"))).get
    assert(xCluster.length == 3)
    assert(xCluster.forall(_.prob == 1.0))
    // the lone Z subtree must NOT appear in any cluster (min size 2)
    assert(!byCluster.values.flatten.exists(a => a.treeId == 3))
  }

  test("entity-free structural twins never cluster (metric scores them 0)") {
    // two identical untyped subtrees over plain string leaves: the
    // similarity shortcut scores entity-free pairs 0 even against
    // themselves, so the representative collapse must NOT seed them
    val trees = Seq.fill(2)(SExpr.parse("(S (X plain leaf) (ENT::a v))"))
    val forest = Forest.fromTrees(spark, trees)
    val result = TreeClusterer.fit(forest, tau = 0.7, metricName = "jaccard")
    val clustered = result.assignments.collect().map(_.key)
    assert(!clustered.exists(_.endsWith("/0")), s"X subtrees clustered: ${clustered.mkString(",")}")
  }

  test("cluster naming uses the modal typed label") {
    def tree(k: String) = SExpr.parse(s"(S (GROUP::Person (ENT::name $k) (ENT::age 1)))")
    val forest = Forest.fromTrees(spark, Seq(tree("a"), tree("b")))
    val result = TreeClusterer.fit(forest, tau = 0.7, metricName = "jaccard")
    assert(result.model.clusters.keySet.exists(_.startsWith("Person_")))
  }

  test("getEquivOf finds the cluster of an equivalent new subtree") {
    def tree(p: String, f: String) =
      SExpr.parse(s"(S (X (ENT::person $p) (ENT::fruit $f)))")
    val forest = Forest.fromTrees(spark, Seq(tree("Alice", "apple"), tree("Bob", "banana")))
    val result = TreeClusterer.fit(forest, tau = 0.7, metricName = "jaccard")
    assert(result.model.clusters.size == 1)
    val name = result.model.clusters.keys.head

    // a brand-new equivalent subtree (not a member)
    val fresh = Similarity.treeFeatures(tree("Carol", "cherry"), "fresh").toMap
    assert(result.model.getEquivOf(fresh("fresh/0")) == Some(name))
    // a dissimilar one
    val other = Similarity.treeFeatures(
      SExpr.parse("(S (Z (ENT::qq 1) (ENT::ww 2)))"), "other").toMap
    assert(result.model.getEquivOf(other("other/0")).isEmpty)
  }

  test("memberFeats membership: structural twin matches via StructKey, distinct non-member does not") {
    def tree(p: String, f: String) =
      SExpr.parse(s"(S (X (ENT::person $p) (ENT::fruit $f)))")
    val forest = Forest.fromTrees(spark, Seq(tree("Alice", "apple"), tree("Bob", "banana")))
    val result = TreeClusterer.fit(forest, tau = 0.7, metricName = "jaccard")
    assert(result.model.clusters.size == 1)
    val (name, summary) = result.model.clusters.head
    // identity-free: the 4 members (2 S-roots + 2 X-nodes) collapse to
    // 2 structural keys — bounded by schema variety, not data size
    assert(summary.memberFeats.size == 2)
    // a structural twin (same labels/ents, different oids and tree key)
    // is a member by StructKey — the O(1) fast path in getEquivOf
    val twin = Similarity.treeFeatures(tree("Carol", "cherry"), "twin").toMap
    assert(summary.memberFeats.contains(StructKey.of(twin("twin/0"))))
    assert(result.model.getEquivOf(twin("twin/0")) == Some(name))
    // structurally distinct and below tau → not a member, no cluster
    val other = Similarity.treeFeatures(
      SExpr.parse("(S (Z (ENT::qq 1) (ENT::ww 2)))"), "other").toMap
    assert(!summary.memberFeats.contains(StructKey.of(other("other/0"))))
    assert(result.model.getEquivOf(other("other/0")).isEmpty)
  }

  test("buildModel=false yields identical assignments and an empty model") {
    def tree(p: String, f: String, a: String) =
      SExpr.parse(s"(S (X (ENT::person $p) (ENT::fruit $f)) (Y (ENT::person $p) (ENT::animal $a)))")
    val trees = Forest.trees(Forest.fromTrees(spark,
      Seq(tree("Alice", "apple", "rabbit"), tree("Bob", "banana", "dog"), tree("Carol", "cherry", "cat"))))
    val withModel = TreeClusterer.fitTrees(trees, tau = 0.7, metricName = "jaccard")
    val without = TreeClusterer.fitTrees(trees, tau = 0.7, metricName = "jaccard",
      buildModel = false)
    assert(without.model.clusters.isEmpty)
    assert(withModel.model.clusters.nonEmpty)
    assert(without.assignments.collect().toSet == withModel.assignments.collect().toSet)
  }

  test("entityLabels with null metric maps entities to parent labels") {
    val forest = Forest.fromTrees(spark, Seq(
      SExpr.parse("(S (X (ENT::a 1)) (GROUP::G (ENT::b 2)))")))
    val labels = TreeClusterer.entityLabels(forest, tau = 0.7, metricName = null).collect().toMap
    assert(labels.values.toSet == Set("X", "GROUP::G"))
  }

  test("entityLabels clusters entity parents and labels their children") {
    def tree(p: String, f: String) =
      SExpr.parse(s"(S (X (ENT::person $p) (ENT::fruit $f)))")
    val forest = Forest.fromTrees(spark, Seq(tree("Alice", "apple"), tree("Bob", "banana")))
    val labels = TreeClusterer.entityLabels(forest, tau = 0.7, metricName = "jaccard").collect().toMap
    // 4 entities (2 per tree), all labelled with the single X-cluster
    assert(labels.size == 4)
    assert(labels.values.toSet.size == 1)
  }

  test("entityGroupsAbove matches the inline cluster walk it memoizes") {
    def tree(p: String, f: String, a: String) =
      SExpr.parse(s"(S (X (ENT::person $p) (ENT::fruit $f)) (Y (ENT::person $p) (ENT::animal $a)))")
    val forest = Forest.fromTrees(spark,
      Seq(tree("Alice", "apple", "rabbit"), tree("Bob", "banana", "dog"), tree("Carol", "cherry", "cat")))
    val model = TreeClusterer.fit(forest, tau = 0.7, metricName = "jaccard").model
    assert(model.clusters.nonEmpty)
    for {
      support <- 0 to 4
      labels <- Seq(Set("person"), Set("animal"), Set("fruit", "animal"), Set("zzz"))
    } {
      val expected: Set[Seq[String]] = model.clusters.values.iterator
        .filter(_.support > support)
        .flatMap(_.members.iterator.map(_._1.self.entLabels))
        .filter(ls => ls.exists(labels.contains))
        .map(_.toSeq.sorted)
        .toSet
      assert(model.entityGroupsAbove(support, labels) == expected,
        s"support=$support labels=$labels")
      // memoized second ask returns the same value
      assert(model.entityGroupsAbove(support, labels) == expected)
    }
  }

  // Reference re-implementation of treeFeatures as it stood before the
  // linear-time rewrite: positionedSubtrees + pre-order synthetic-id map
  // + per-candidate ancestor chain via root walks. The production version
  // must emit EXACTLY this (same keys, same order, same level chains) —
  // it only changes the asymptotics, O(n·subtree) → O(n).
  private def referenceTreeFeatures(
      tree: ArchiTree,
      treeKey: String,
      maxHeight: Int = 5,
  ): Vector[(String, SubtreeFeature)] = {
    val positioned = tree.positionedSubtrees
    val idOf: Map[Vector[Int], String] = positioned.zipWithIndex.map {
      case ((path, t), i) => path -> (if (t.oid.nonEmpty) t.oid else s"$treeKey@$i")
    }.toMap
    positioned.collect {
      case (path, t) if Similarity.isCandidate(t, maxHeight) =>
        val chain = Iterator
          .iterate(path)(p => p.dropRight(1))
          .take(path.size + 1)
          .take(Similarity.MaxSimCtxDepth)
          .toVector
        val levels = chain.map { p =>
          val node = tree(p)
          LevelFeature(idOf(p), node.label.render, node.label.isTyped, node.entityLabels)
        }
        s"$treeKey/${path.mkString(".")}" -> SubtreeFeature(levels, t.height, path.size)
    }
  }

  test("property: treeFeatures matches the quadratic reference on random trees") {
    val rnd = new scala.util.Random(42)
    // mixed leaf/node children at varying positions (the candidate path
    // indexes the FULL children vector), depths past maxHeight, duplicate
    // entity labels, and typed/untyped labels — every branch of the
    // candidate predicate and of the ancestor-chain truncation
    def nodeStr(depth: Int): String = {
      val label = Seq("X", "Y", "GROUP::G", "REL::r", "ENT::person", "ENT::fruit",
        "ENT::person")(rnd.nextInt(7))
      val n = 1 + rnd.nextInt(3)
      val kids = (0 until n).map { _ =>
        if (depth >= 7 || rnd.nextInt(3) == 0) "leaf" + rnd.nextInt(5)
        else nodeStr(depth + 1)
      }
      s"($label ${kids.mkString(" ")})"
    }
    // stamp oids on every third pre-order node: both id paths (oid kept,
    // synthetic fallback) appear in the same tree
    def stampOids(t: ArchiTree, counter: Iterator[Int]): ArchiTree = {
      val i = counter.next()
      val kids = t.children.map {
        case Child.Node(c) => Child.Node(stampOids(c, counter)): Child
        case l             => l
      }
      t.copy(children = kids, oid = if (i % 3 == 0) s"oid$i" else "")
    }
    (1 to 200).foreach { _ =>
      val it = Iterator.from(0)
      val tree = stampOids(SExpr.parse(s"(S ${nodeStr(0)} ${nodeStr(0)})"), it)
      assert(Similarity.treeFeatures(tree, "t") == referenceTreeFeatures(tree, "t"))
      assert(Similarity.treeFeatures(tree, "t", maxHeight = 3) ==
        referenceTreeFeatures(tree, "t", maxHeight = 3))
    }
  }

  test("property: tau-graph paths agree on random forests") {
    import org.scalacheck.Gen
    // random small forests over a shared entity alphabet so blocking
    // produces cross-tree edges, twins, and noise in varying mixes
    val entGen = Gen.oneOf("person", "fruit", "animal", "city", "qq")
    val nodeGen: Gen[String] = for {
      label <- Gen.oneOf("X", "Y", "X2", "Z")
      n <- Gen.choose(1, 3)
      ents <- Gen.pick(n, Seq("person", "fruit", "animal", "city", "qq"))
      vals <- Gen.listOfN(n, Gen.alphaLowerStr.map(s => if (s.isEmpty) "v" else s.take(4)))
    } yield ents.zip(vals).map { case (e, v) => s"(ENT::$e $v)" }.mkString(s"($label ", " ", ")")
    val treeGen: Gen[String] = Gen.choose(1, 3)
      .flatMap(k => Gen.listOfN(k, nodeGen))
      .map(_.mkString("(S ", " ", ")"))
    val forestGen: Gen[Seq[String]] = Gen.choose(2, 6).flatMap(n => Gen.listOfN(n, treeGen))

    val forests = Gen.listOfN(8, forestGen)
      .pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(7L))
    forests.foreach { treeStrs =>
      val forest = Forest.fromTrees(spark, treeStrs.map(SExpr.parse))
      def run(): Map[String, (String, Double)] =
        TreeClusterer.fit(forest, tau = 0.6, metricName = "jaccard")
          .assignments.collect().map(a => a.key -> (a.cluster, a.prob)).toMap
      val local = run()
      spark.conf.set(TreeClusterer.LocalTauGraphMaxRepsKey, "-1")
      val dist =
        try run()
        finally spark.conf.unset(TreeClusterer.LocalTauGraphMaxRepsKey)
      assert(local.keySet == dist.keySet,
        s"keys diverge on forest ${treeStrs.mkString(" | ")}")
      local.foreach { case (key, (cluster, prob)) =>
        val (dc, dp) = dist(key)
        assert(cluster == dc && math.abs(prob - dp) < 1e-9,
          s"$key: ($cluster,$prob) vs ($dc,$dp) on forest ${treeStrs.mkString(" | ")}")
      }
    }
  }

  test("local and distributed tau-graph paths produce identical results") {
    // varied structures: twins, a near-duplicate family sharing entity
    // labels (cross-feature edges), a noise subtree, an untyped root —
    // exercises blocking, gap prune, multiplicity seeding, and naming
    val trees = Seq(
      SExpr.parse("(S (X (ENT::person Alice) (ENT::fruit apple)) (Y (ENT::person Alice)))"),
      SExpr.parse("(S (X (ENT::person Bob) (ENT::fruit banana)) (Y (ENT::person Bob)))"),
      SExpr.parse("(S (X2 (ENT::person Carol) (ENT::fruit cherry) (ENT::animal cat)))"),
      SExpr.parse("(S (X2 (ENT::person Dave) (ENT::fruit date) (ENT::animal dog)))"),
      SExpr.parse("(S (Z (ENT::qq 1) (ENT::ww 2)))"),
    )
    val forest = Forest.fromTrees(spark, trees)
    def run(): (Map[String, (String, Double)], Map[String, (Int, Set[StructKey], Double, Double)]) = {
      val r = TreeClusterer.fit(forest, tau = 0.6, metricName = "jaccard")
      (r.assignments.collect().map(a => a.key -> (a.cluster, a.prob)).toMap,
        r.model.clusters.map { case (n, c) =>
          n -> (c.support, c.memberFeats, c.avgEntities, c.avgDepth)
        })
    }
    val local = run()
    spark.conf.set(TreeClusterer.LocalTauGraphMaxRepsKey, "-1") // force distributed
    val dist =
      try run()
      finally spark.conf.unset(TreeClusterer.LocalTauGraphMaxRepsKey)
    assert(local._1.nonEmpty)
    assert(local._1.keySet == dist._1.keySet, "assignment keys diverge between tau-graph paths")
    local._1.foreach { case (key, (cluster, prob)) =>
      val (dc, dp) = dist._1(key)
      assert(cluster == dc, s"cluster of $key diverges")
      // probabilities may differ by summation order only
      assert(math.abs(prob - dp) < 1e-9, s"prob of $key diverges: $prob vs $dp")
    }
    assert(local._2.keySet == dist._2.keySet, "cluster names diverge between tau-graph paths")
    local._2.foreach { case (name, (support, feats, avgE, avgD)) =>
      val (ds, df, de, dd) = dist._2(name)
      assert(support == ds && feats == df, s"summary of $name diverges")
      assert(math.abs(avgE - de) < 1e-9 && math.abs(avgD - dd) < 1e-9)
    }
  }

  test("local-path member expansion broadcasts every rep-sized frame") {
    // Plan guardrail for the fit join chain: the representative set is
    // bounded by schema variety when the local tau-graph fired, so the
    // expansion back to every original subtree must be the ONE cached
    // candidate scan plus broadcast joins. A SortMergeJoin here means a
    // full-size shuffle of the candidate set per fit — the regression
    // that made nameStats the top fit cost before the chain was
    // restructured. The two allowed exchanges are the repKeys groupBy
    // (partial/final pair), the only place the candidate set may shuffle.
    def tree(p: String, f: String, a: String) =
      SExpr.parse(s"(S (X (ENT::person $p) (ENT::fruit $f)) (Y (ENT::person $p) (ENT::animal $a)))")
    val forest = Forest.fromTrees(spark,
      Seq(tree("Alice", "apple", "rabbit"), tree("Bob", "banana", "dog"), tree("Carol", "cherry", "cat")))
    val result = TreeClusterer.fit(forest, tau = 0.7, metricName = "jaccard")
    val p = result.assignments.queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("SortMergeJoin"),
      s"member expansion shuffles the candidate set through a sort-merge join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "member expansion plans an unbounded join")
    assert(p.contains("BroadcastHashJoin"), "member expansion lost its broadcast joins")
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, s"member expansion plans $exchanges exchanges, expected <=2:\n$p")
    result.assignments.unpersist()
  }
}
