package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted IVFADC index: build→save→load→query must be
  * bit-compatible with the inline [[Ann]] operators (same training,
  * same probe order, same integer-ADC ranking), and the cid-partitioned
  * codes layout must prune at the partition level when probed.
  */
class AnnIndexSpec extends AnyFunSuite with SparkSpec {

  private lazy val emb: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def tmpIdx(): String =
    java.nio.file.Files.createTempDirectory("graft_annidx").toString + "/idx"

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def queriesOf(ids: Seq[Long]): DataFrame =
    emb.filter(col("vec_id").isInCollection(ids))

  test("full-probe query over a persisted index reproduces pqTopK bit-for-bit") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path)
    val persisted = AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16)
    val inline = Ann.pqTopK(emb, "vec_id", "embedding", 0L to 9L, k = 5)
    assert(pairs(persisted) == pairs(inline))
  }

  test("probe-limited query equals the inline IVFADC path, incl. exact re-rank") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path)
    val persisted = AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 4)
    val inline = Ann.ivfAdcTopK(emb, "vec_id", "embedding", 0L to 9L, k = 5,
      nLists = 16, nProbe = 4)
    assert(pairs(persisted) == pairs(inline))

    val pr = AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 4, rerank = 50,
      exact = Some(emb), exactIdCol = "vec_id", exactVecCol = "embedding")
    val ir = Ann.ivfAdcTopK(emb, "vec_id", "embedding", 0L to 9L, k = 5,
      nLists = 16, nProbe = 4, rerank = 50)
    assert(pairs(pr) == pairs(ir))
  }

  test("loadModel round-trips the trained model shapes") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path,
      nLists = 8, subspaces = 8, codebook = 16, iters = 2)
    val m = AnnIndex.loadModel(spark, path)
    assert(m.nLists == 8 && m.subspaces == 8 && m.codebook == 16)
    assert(m.dim == 64 && m.subDim == 8)
    assert(m.centroids.nonEmpty && m.centroids.length <= 8)
    assert(m.codebooks.length == 8)
    assert(m.codebooks.forall(cb => cb.nonEmpty && cb.length <= 16))
    assert(m.codebooks.forall(_.forall(_._2.size == 8)))
    // centroids and codebooks must be exactly what the inline trainers
    // produce for the same corpus and params — bit-compatibility is the
    // whole contract
    val corpus = emb.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("v"))
    // lloydCentroids returns means in collect order (assignment and
    // probing are order-independent) — compare cid-sorted
    val cents = Ann.lloydCentroids(corpus, 8, 2, unrolled = true)
    assert(m.centroids.toSeq == cents.sortBy(_._1).toSeq)
    val cbs = Ann.pqTrain(corpus, 8, 8, 16, 2)
    assert(m.codebooks.map(_.toSeq).toSeq == cbs.map(_.toSeq).toSeq)
  }

  test("probed query prunes codes partitions at the directory level") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path)
    val q = AnnIndex.topK(spark, path, queriesOf(Seq(0L)),
      "vec_id", "embedding", k = 5, nProbe = 2)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cid"),
      s"expected a partition filter on cid:\n$plan")
    // the same pruning restriction topK builds, pinned at the file level:
    // only the probed cid directories are listed
    val m = AnnIndex.loadModel(spark, path)
    val qv = queriesOf(Seq(0L)).select(col("embedding").cast("array<double>"))
      .head.getSeq[Double](0)
    val probed = Ann.probeOrder(m.centroids, qv, 2)
    val scan = spark.read.parquet(AnnIndex.codesPath(spark, path))
      .filter(col("cid").isInCollection(probed))
    val files = scan.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head.selectedPartitions.toPartitionArray.map(_.urlEncodedPath)
    assert(files.nonEmpty && files.forall(p => probed.exists(c => p.contains(s"cid=$c"))),
      s"scan must touch only probed cid dirs, got:\n${files.mkString("\n")}")

    // the LARGE-BATCH path prunes the same way: its probed-cid set is
    // collected (bounded by nLists) exactly to keep this predicate on
    // the scan
    spark.conf.set("spark.graft.ann.localDtMaxQueries", "-1")
    try {
      val qd = AnnIndex.topK(spark, path, queriesOf(Seq(0L)),
        "vec_id", "embedding", k = 5, nProbe = 2)
      qd.collect()
      val planD = qd.queryExecution.executedPlan.toString
      assert(planD.contains("PartitionFilters") && planD.contains("cid"),
        s"distributed path lost the partition filter on cid:\n$planD")
    } finally spark.conf.unset("spark.graft.ann.localDtMaxQueries")
  }

  test("append encodes with the frozen model bit-identically to build") {
    // same training corpus → same model; path2's codes arrive entirely
    // through append, so a full-probe query must be bit-equal to the
    // built index (and to pqTopK, by the first test's transitivity)
    val p1 = tmpIdx(); val p2 = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", p1)
    AnnIndex.build(emb, "vec_id", "embedding", p2)
    val codesDir = java.nio.file.Paths.get(AnnIndex.codesPath(spark, p2))
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(codesDir).iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.delete)
    AnnIndex.append(emb, "vec_id", "embedding", p2)
    val q1 = AnnIndex.topK(spark, p1, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16)
    val q2 = AnnIndex.topK(spark, p2, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16)
    assert(pairs(q1) == pairs(q2))
  }

  test("appended rows join the index and are served by queries") {
    val path = tmpIdx()
    val half = emb.filter(col("vec_id") < 250)
    val rest = emb.filter(col("vec_id") >= 250)
    AnnIndex.build(half, "vec_id", "embedding", path)
    val before = spark.read.parquet(AnnIndex.codesPath(spark, path)).count()
    AnnIndex.append(rest, "vec_id", "embedding", path)
    val after = spark.read.parquet(AnnIndex.codesPath(spark, path)).count()
    assert(before == 250 && after == 500)
    // full probe over the appended index = exhaustive frozen-model ADC
    // over the union: every query still gets k neighbors, and appended
    // ids are reachable as neighbors
    val q = AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16)
    val got = pairs(q)
    assert(got.size == 50)
    assert(got.exists(_._2 >= 250), "appended rows must be servable as neighbors")
  }

  test("residual layout: meta round-trip, deterministic rebuild, codes differ from plain") {
    val p1 = tmpIdx(); val p2 = tmpIdx(); val p3 = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", p1, residual = true)
    AnnIndex.build(emb, "vec_id", "embedding", p2, residual = true)
    AnnIndex.build(emb, "vec_id", "embedding", p3)
    assert(AnnIndex.loadModel(spark, p1).residual)
    assert(!AnnIndex.loadModel(spark, p3).residual)
    val q1 = AnnIndex.topK(spark, p1, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16)
    val q2 = AnnIndex.topK(spark, p2, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16)
    assert(pairs(q1) == pairs(q2), "residual build+query must be deterministic")
    // the flag must actually change the stored codes (coarse metric AND
    // the quantized values both differ)
    val c1 = spark.read.parquet(AnnIndex.codesPath(spark, p1)).collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    val c3 = spark.read.parquet(AnnIndex.codesPath(spark, p3)).collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    assert(c1.keySet == c3.keySet && c1 != c3)
  }

  test("residual append encodes with the frozen model bit-identically to build") {
    val p1 = tmpIdx(); val p2 = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", p1, residual = true)
    AnnIndex.build(emb, "vec_id", "embedding", p2, residual = true)
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(AnnIndex.codesPath(spark, p2)))
      .iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
    AnnIndex.append(emb, "vec_id", "embedding", p2)
    val q1 = AnnIndex.topK(spark, p1, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16)
    val q2 = AnnIndex.topK(spark, p2, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16)
    assert(pairs(q1) == pairs(q2))
  }

  test("residual probe-limited query with exact re-rank recovers recall vs brute force") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path,
      subspaces = 8, residual = true)
    val res = AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 8, rerank = 200,
      exact = Some(emb), exactIdCol = "vec_id", exactVecCol = "embedding")
    val brute = pairs(Ann.bruteForceTopK(emb, "vec_id", "embedding", 0L to 9L, 5))
    val got = pairs(res)
    assert(got.forall { case (q, _) => (0L to 9L).contains(q) } && got.size == 50)
    val recall = got.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.8, s"residual rerank recall $recall < 0.8")
  }

  test("compact folds append fragments back to one file per list, results unchanged") {
    val path = tmpIdx()
    AnnIndex.build(emb.filter(col("vec_id") < 300), "vec_id", "embedding", path)
    AnnIndex.append(emb.filter(col("vec_id").between(300, 399)), "vec_id", "embedding", path)
    AnnIndex.append(emb.filter(col("vec_id") >= 400), "vec_id", "embedding", path)
    def files(): Int = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(AnnIndex.codesPath(spark, path)))
        .iterator().asScala.count(_.toString.endsWith(".parquet"))
    }
    val before = AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16)
    val beforePairs = pairs(before)
    val fragmented = files()
    val m = AnnIndex.loadModel(spark, path)
    val lists = spark.read.parquet(AnnIndex.codesPath(spark, path)).select("cid").distinct.count().toInt
    assert(fragmented > lists, s"expected fragmentation, got $fragmented files for $lists lists")
    val n = AnnIndex.compact(spark, path)
    assert(n == lists && files() == lists)
    assert(spark.read.parquet(AnnIndex.codesPath(spark, path)).count() == 500)
    val after = AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16)
    assert(pairs(after) == beforePairs)
    assert(m.nLists == AnnIndex.loadModel(spark, path).nLists)
  }

  test("appendStream feeds the index continuously through foreachBatch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = tmpIdx()
    AnnIndex.build(emb.filter(col("vec_id") < 400), "vec_id", "embedding", path)
    val rows = emb.filter(col("vec_id") >= 400)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val src = MemoryStream[(Long, Seq[Double])]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_annstream_ck").toString
    val q = AnnIndex.appendStream(
      src.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding", path, ckpt)
    try {
      src.addData(rows.take(50).toSeq: _*)
      q.processAllAvailable()
      src.addData(rows.drop(50).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.read.parquet(AnnIndex.codesPath(spark, path)).count() == 500)
    // streamed rows must be bit-identical to a batch append of the same
    // vectors (same frozen model, same encode path)
    val p2 = tmpIdx()
    AnnIndex.build(emb.filter(col("vec_id") < 400), "vec_id", "embedding", p2)
    AnnIndex.append(emb.filter(col("vec_id") >= 400), "vec_id", "embedding", p2)
    val c1 = spark.read.parquet(AnnIndex.codesPath(spark, path)).collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1), r.getInt(2))).toSet
    val c2 = spark.read.parquet(AnnIndex.codesPath(spark, p2)).collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1), r.getInt(2))).toSet
    assert(c1 == c2)
  }

  test("compact publishes through the pointer: a reader mid-compact always resolves a complete layout") {
    val path = tmpIdx()
    AnnIndex.build(emb.filter(col("vec_id") < 400), "vec_id", "embedding", path)
    AnnIndex.append(emb.filter(col("vec_id") >= 400), "vec_id", "embedding", path)
    val expected = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16))
    assert(AnnIndex.codesPath(spark, path).endsWith("codes_v1"))

    // simulate the state a reader observes DURING a compact: the staged
    // codes_v2 exists (here: partial — worst case) but the pointer has
    // not flipped. Resolution must ignore the staging entirely.
    val staged = java.nio.file.Paths.get(s"$path/codes_v2/cid=0")
    java.nio.file.Files.createDirectories(staged)
    assert(AnnIndex.codesPath(spark, path).endsWith("codes_v1"))
    val during = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16))
    assert(during == expected, "reader mid-compact must see the OLD complete layout")

    // a crash between staging and flip strands nothing: rerunning
    // compact reclaims the partial staging and completes the swap
    val n = AnnIndex.compact(spark, path)
    assert(AnnIndex.codesPath(spark, path).endsWith("codes_v2"))
    assert(n > 0)
    val after = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16))
    assert(after == expected)
    // the superseded version is RETAINED for in-flight readers that
    // resolved just before the flip...
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/codes_v1")))
    // ...and a BACK-TO-BACK compact cannot reclaim it either: the
    // maintenance sweep reads the manifest's retirement timestamps with
    // the same grace guard as vacuum, so a just-retired generation
    // survives even when maintenance passes stack up
    AnnIndex.compact(spark, path)
    assert(AnnIndex.codesPath(spark, path).endsWith("codes_v3"))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/codes_v1")),
      "grace must protect the just-retired generation across back-to-back compacts")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/codes_v2")))
    // once aged past grace, reclaim proceeds (explicit zero-grace here)
    Thread.sleep(150)
    assert(AnnIndex.vacuum(spark, path, graceMs = 100L) >= 2)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/codes_v1")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/codes_v2")))
  }

  test("rebuild over a live index is ONE manifest flip; previous generation retained a cycle") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path)
    val v1 = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16))
    AnnIndex.build(emb, "vec_id", "embedding", path)
    assert(AnnIndex.codesPath(spark, path).endsWith("codes_v2"))
    // the old generation stays on disk one cycle for in-flight readers
    // (model artifacts too — a reader that resolved just before the
    // flip finishes against a consistent set) ...
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/codes_v1")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/meta_v1")))
    val v2 = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16))
    assert(v1 == v2, "deterministic rebuild must serve identical results")
    // ... and a back-to-back build keeps it too (the maintenance sweep
    // shares vacuum's retirement-age grace guard); an aged retirement
    // is reclaimed by vacuum
    AnnIndex.build(emb, "vec_id", "embedding", path)
    assert(AnnIndex.codesPath(spark, path).endsWith("codes_v3"))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/codes_v1")),
      "grace must protect the retired generation across back-to-back builds")
    Thread.sleep(150)
    assert(AnnIndex.vacuum(spark, path, graceMs = 100L) >= 2)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/codes_v1")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/meta_v1")))
  }

  test("bare legacy layout (no manifest, unversioned dirs) stays readable and migrates on first compact") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path)
    val expected = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16))
    // devolve to the original pre-manifest layout: bare directory names,
    // no INDEX file
    Seq("codes", "meta", "centroids", "codebooks").foreach { a =>
      java.nio.file.Files.move(
        java.nio.file.Paths.get(s"$path/${a}_v1"),
        java.nio.file.Paths.get(s"$path/$a"))
    }
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$path/INDEX"))
    assert(AnnIndex.codesPath(spark, path).endsWith("/codes"))
    val legacy = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16))
    assert(legacy == expected)
    AnnIndex.compact(spark, path)
    assert(AnnIndex.codesPath(spark, path).endsWith("codes_v1"))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/INDEX")))
    val migrated = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16))
    assert(migrated == expected)
  }

  test("transitional CODES/MODEL pointer layout stays readable and migrates on first compact") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path)
    val expected = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16))
    // devolve to the interim round-13 layout: versioned codes behind a
    // CODES pointer, bare model dirs, no manifest
    Seq("meta", "centroids", "codebooks").foreach { a =>
      java.nio.file.Files.move(
        java.nio.file.Paths.get(s"$path/${a}_v1"),
        java.nio.file.Paths.get(s"$path/$a"))
    }
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$path/INDEX"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$path/CODES"), "codes_v1")
    assert(AnnIndex.codesPath(spark, path).endsWith("codes_v1"))
    val interim = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16))
    assert(interim == expected)
    AnnIndex.compact(spark, path)
    // migrated: manifest present, pointer files retired
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/INDEX")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/CODES")))
    assert(AnnIndex.codesPath(spark, path).endsWith("codes_v2"))
    val migrated = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16))
    assert(migrated == expected)
  }

  test("recallCurve measures the quality/cost trade of this index deterministically") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path)
    val curve = AnnIndex.recallCurve(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", emb, "vec_id", "embedding",
      probes = Seq(1, 4, 16), k = 5, rerank = 200).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(curve.keySet == Set(1, 4, 16))
    assert(curve.values.forall(r => r >= 0 && r <= 1000000L))
    // full probe + exact rerank of a 200-candidate shortlist on this
    // corpus recovers high recall (the pinned gates use the same bars)
    assert(curve(16) >= 800000L, s"full-probe rerank recall ${curve(16)} ppm")
    assert(curve(16) >= curve(1),
      "full probe cannot lose to a single probed list at this scale")
    // deterministic: identical inputs → identical ppm values
    val again = AnnIndex.recallCurve(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", emb, "vec_id", "embedding",
      probes = Seq(1, 4, 16), k = 5, rerank = 200).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(again == curve)
  }

  test("vacuum is age-guarded: grace protects retained generations, then reclaims") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path)
    AnnIndex.build(emb, "vec_id", "embedding", path) // v1 retained
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/codes_v1")))
    val expected = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16))
    // default grace (10 min): the just-retired generation is protected
    // with NO caller discipline involved
    assert(AnnIndex.vacuum(spark, path) == 0,
      "grace must protect the just-retired generation")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/codes_v1")))
    // once the retirement timestamp ages past the grace window, reclaim
    Thread.sleep(250)
    val removed = AnnIndex.vacuum(spark, path, graceMs = 100L)
    assert(removed >= 4, s"expected the retained generation gone, removed $removed")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/codes_v1")))
    assert(AnnIndex.vacuum(spark, path, graceMs = 0L) == 0,
      "second vacuum must be a no-op")
    val after = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16))
    assert(after == expected, "vacuum must never touch the live set")
  }

  test("grace window keeps an in-flight old-layout reader readable") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path)
    // a reader plans against the CURRENT layout but has not executed yet
    val inFlight = AnnIndex.topK(spark, path, queriesOf(0L to 4L),
      "vec_id", "embedding", k = 5, nProbe = 16)
    // a maintenance flip supersedes the codes generation under it
    AnnIndex.compact(spark, path)
    // vacuum within grace: the superseded generation survives, so the
    // in-flight plan still executes against intact directories
    assert(AnnIndex.vacuum(spark, path, graceMs = 60000L) == 0)
    assert(pairs(inFlight).size == 25, "old-layout reader must stay readable")
    // after grace the generation is reclaimed; new resolutions serve on
    Thread.sleep(250)
    assert(AnnIndex.vacuum(spark, path, graceMs = 100L) >= 1)
    assert(pairs(AnnIndex.topK(spark, path, queriesOf(0L to 4L),
      "vec_id", "embedding", k = 5, nProbe = 16)).size == 25)
  }

  test("delete: tombstoned ids vanish from stats and queries; compact folds them physically") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path)
    val total = AnnIndex.stats(spark, path)
      .agg(sum(col("n_vectors"))).head.getLong(0)
    val doomed = emb.filter(col("vec_id") % 7 === 0)
    val k = doomed.count()
    val tomb = AnnIndex.delete(spark, path, doomed, "vec_id")
    assert(tomb == k, s"tombstone count $tomb != deleted $k")
    // stats shows N-K without touching the data-sized codes
    assert(AnnIndex.stats(spark, path).agg(sum(col("n_vectors"))).head.getLong(0)
      == total - k)
    // no query path serves a deleted row
    val served = pairs(AnnIndex.topK(spark, path, queriesOf(1L to 10L),
      "vec_id", "embedding", k = 5, nProbe = 16))
    assert(served.size == 50 && served.forall(_._2 % 7 != 0),
      "a tombstoned id leaked into query results")
    // delete is idempotent (same set → same count)
    assert(AnnIndex.delete(spark, path, doomed, "vec_id") == k)
    // compact folds the tombstones into the physical layout and drops
    // the set: same stats, same results, codes physically shrunk
    AnnIndex.compact(spark, path)
    assert(spark.read.parquet(AnnIndex.codesPath(spark, path)).count() == total - k)
    assert(AnnIndex.stats(spark, path).agg(sum(col("n_vectors"))).head.getLong(0)
      == total - k)
    assert(pairs(AnnIndex.topK(spark, path, queriesOf(1L to 10L),
      "vec_id", "embedding", k = 5, nProbe = 16)) == served)
  }

  test("delete: survivors serve bit-equal to an index that never held the deleted rows") {
    val survivors = emb.filter(col("vec_id") % 7 =!= 0)
    val doomed = emb.filter(col("vec_id") % 7 === 0)
    // pA: the counterfactual — the deleted rows never entered
    val pA = tmpIdx()
    AnnIndex.build(survivors, "vec_id", "embedding", pA)
    // pB: same frozen model (trained on the same survivors), the doomed
    // rows enter through append (no retrain) and leave through delete
    val pB = tmpIdx()
    AnnIndex.build(survivors, "vec_id", "embedding", pB)
    AnnIndex.append(doomed, "vec_id", "embedding", pB)
    AnnIndex.delete(spark, pB, doomed, "vec_id")
    val statsA = AnnIndex.stats(spark, pA).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    val statsB = AnnIndex.stats(spark, pB).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(statsA == statsB, "occupancy must match the never-held index")
    val qs = queriesOf(Seq(1L, 2L, 3L, 4L, 5L, 6L, 8L, 9L, 10L, 11L))
    val a = pairs(AnnIndex.topK(spark, pA, qs, "vec_id", "embedding",
      k = 5, nProbe = 16))
    val b = pairs(AnnIndex.topK(spark, pB, qs, "vec_id", "embedding",
      k = 5, nProbe = 16))
    assert(a == b, "full-probe results must be bit-equal to the never-held index")
    // and the equality survives the physical fold
    AnnIndex.compact(spark, pB)
    assert(pairs(AnnIndex.topK(spark, pB, qs, "vec_id", "embedding",
      k = 5, nProbe = 16)) == a)
  }

  test("delete between streaming appends: survivors and late arrivals both serve") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path)
    val total = AnnIndex.stats(spark, path)
      .agg(sum(col("n_vectors"))).head.getLong(0)
    val ck = java.nio.file.Files.createTempDirectory("graft_anndelstream").toString
    val vecOf = emb
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Long, Seq[Double])]
    val q = AnnIndex.appendStream(
      src.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding", path, ck)
    try {
      // batch 1 arrives, then a delete lands mid-stream, then batch 2
      src.addData((10001L, vecOf(1L)), (10002L, vecOf(2L)))
      q.processAllAvailable()
      AnnIndex.delete(spark, path, Seq(10001L, 3L))
      src.addData((10003L, vecOf(4L)))
      q.processAllAvailable()
      val n = AnnIndex.stats(spark, path).agg(sum(col("n_vectors"))).head.getLong(0)
      assert(n == total + 3 - 2, s"expected ${total + 1} live rows, got $n")
      val served = pairs(AnnIndex.topK(spark, path, queriesOf(1L to 5L),
        "vec_id", "embedding", k = 5, nProbe = 16))
      assert(!served.exists(p => p._2 == 10001L || p._2 == 3L),
        "deleted rows served after the delete")
      assert(served.exists(p => p._2 == 10002L || p._2 == 10003L),
        "surviving appends must be servable (10002/10003 duplicate hot vectors)")
    } finally q.stop()
  }

  test("delete after compact versions past the retained tombstone set; recall baseline folds tombstones") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path)
    AnnIndex.delete(spark, path, Seq(1L, 2L))
    def exists(n: String) =
      java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/$n"))
    assert(exists("tombstones_v1"))
    // compact folds the set and publishes tombstones=None, but RETAINS
    // tombstones_v1 on disk for grace-window readers
    AnnIndex.compact(spark, path)
    assert(exists("tombstones_v1"))
    // a new delete must version PAST the retained dir, never overwrite
    // it mid-read (the version comes from what is on disk, not just the
    // live pointer, which is None here)
    AnnIndex.delete(spark, path, Seq(3L))
    assert(exists("tombstones_v1") && exists("tombstones_v2"))
    val v1 = spark.read.parquet(s"$path/tombstones_v1")
      .collect().map(_.getLong(0)).toSet
    assert(v1 == Set(1L, 2L),
      "the retained grace-window tombstone set must stay intact")
    assert(spark.read.parquet(s"$path/tombstones_v2")
      .collect().map(_.getLong(0)).toSet == Set(3L))
    // the recall diagnostic's brute baseline folds the live tombstones
    // like every other snapshot reader — full probe still reads 1.0
    val curve = AnnIndex.recallCurve(spark, path, queriesOf(5L to 9L),
      "vec_id", "embedding", emb, "vec_id", "embedding",
      Seq(16), k = 5, rerank = emb.count().toInt)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(curve(16) == 1000000L,
      s"full-probe recall after delete must be exactly 1.0, got ${curve(16)}")
  }

  test("topKRetrying propagates a genuinely missing index immediately") {
    val bad = tmpIdx() // never built
    val t0 = System.nanoTime()
    intercept[Throwable] {
      AnnIndex.topKRetrying(spark, bad, queriesOf(Seq(0L)),
        "vec_id", "embedding", k = 5, nProbe = 4, attempts = 10)
    }
    // ten retries with backoff would take seconds; immediate propagation
    // stays well under one
    assert((System.nanoTime() - t0) / 1e9 < 5.0,
      "a permanent config error must not be retried as a reclaimed read")
  }

  test("split and merge fold tombstoned members out of the lists they rewrite") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path)
    val hot = AnnIndex.hottestList(spark, path)
    val hotIds = spark.read.parquet(AnnIndex.codesPath(spark, path))
      .filter(col("cid") === hot).select("id").collect().map(_.getLong(0)).sorted
    val doomedHot = hotIds.take(3).toSeq
    AnnIndex.delete(spark, path, doomedHot)
    val liveBefore = AnnIndex.stats(spark, path)
      .agg(sum(col("n_vectors"))).head.getLong(0)
    AnnIndex.split(spark, path, hot, k = 2, emb, "vec_id", "embedding")
    // the split lists hold only survivors, and none of the doomed ids
    // physically moved into them
    val afterSplit = AnnIndex.stats(spark, path)
      .agg(sum(col("n_vectors"))).head.getLong(0)
    assert(afterSplit == liveBefore, "split must conserve live rows")
    val m = AnnIndex.loadModel(spark, path)
    val newCids = m.centroids.map(_._1).filter(_ > hot).toSeq
    val movedIds = spark.read.parquet(AnnIndex.codesPath(spark, path))
      .filter(col("cid").isInCollection(newCids))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(doomedHot.forall(id => !movedIds.contains(id)),
      "split physically folded the tombstoned members out")
    // merge folds them too for the lists it rewrites
    val cold = AnnIndex.coldestLists(spark, path, 2)
    val coldIds = spark.read.parquet(AnnIndex.codesPath(spark, path))
      .filter(col("cid").isInCollection(cold)).select("id")
      .collect().map(_.getLong(0)).sorted
    val doomedCold = coldIds.take(2).toSeq
    AnnIndex.delete(spark, path, doomedCold)
    AnnIndex.merge(spark, path, cold)
    val m2 = AnnIndex.loadModel(spark, path)
    val mergedCid = m2.centroids.map(_._1).max
    val mergedIds = spark.read.parquet(AnnIndex.codesPath(spark, path))
      .filter(col("cid") === mergedCid).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(doomedCold.forall(id => !mergedIds.contains(id)),
      "merge physically folded the tombstoned members out")
    assert(AnnIndex.stats(spark, path).agg(sum(col("n_vectors"))).head.getLong(0)
      == liveBefore - 2)
  }

  test("topKRetrying serves through a concurrent split/merge/vacuum loop") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path)
    @volatile var maintErr: Option[Throwable] = None
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val maintenance = new Thread(() => {
      try {
        var i = 0
        while (i < 6 && !stop.get()) {
          val hot = AnnIndex.hottestList(spark, path)
          AnnIndex.split(spark, path, hot, k = 2, emb, "vec_id", "embedding")
          AnnIndex.vacuum(spark, path, graceMs = 0L)
          val cold = AnnIndex.coldestLists(spark, path, 2)
          AnnIndex.merge(spark, path, cold)
          AnnIndex.vacuum(spark, path, graceMs = 0L)
          i += 1
        }
      } catch { case t: Throwable => maintErr = Some(t) }
    })
    maintenance.start()
    try {
      // the serving loop: every batch must come back complete — the
      // wrapper re-resolves the manifest on reclaimed-directory reads
      var batches = 0
      while (maintenance.isAlive && batches < 40) {
        val got = AnnIndex.topKRetrying(spark, path, queriesOf(0L to 4L),
          "vec_id", "embedding", k = 5, nProbe = 4, attempts = 10)
        val rows = got.collect()
        assert(rows.length == 25, s"batch $batches returned ${rows.length} rows")
        batches += 1
      }
      assert(batches > 0)
    } finally { stop.set(true); maintenance.join(120000) }
    assert(maintErr.isEmpty, s"maintenance loop failed: $maintErr")
    // the index is intact afterwards
    assert(AnnIndex.stats(spark, path).agg(sum(col("n_vectors"))).head.getLong(0)
      == emb.count())
  }

  test("merge policy: occupancy-blind pairing of distant cold cells loses recall; nearest does not, and the gate catches it") {
    import spark.implicits._
    // Four Voronoi cells in 8-d: two COLD NEIGHBORING cells A1/A2
    // (directions 10 degrees apart around +x), one COLD DISTANT cell C
    // (orthogonal), one hot ballast cell B. Sizes 6/8/7/31 make
    // {A1, C, A2} the cold pool with mean exactly 13, so the legacy
    // occupancy pairing takes [A1(6), C(7)] — a merge across empty
    // space whose centroid lands between the regions — while the
    // nearest policy takes [A1, A2]. Every A1 member's true top-5 is
    // the other five A1 members (within-cell cosine ~0.9998 vs 0.980
    // to A2), so recall@1 tells the two merges apart sharply: after
    // [A1, C] the probe for an A1 query picks the UNMERGED A2 cell
    // (0.980 beats the dragged-away merged centroid's ~0.65) and
    // recall collapses; after [A1, A2] the merged centroid stays in
    // the A region and recall holds at 1.0.
    def jit(id: Long, d: Int): Double = 0.05 * (((id * 7 + d) % 5).toDouble - 2.0)
    def member(id: Long, dir: Seq[Double]): (Long, Seq[Double]) =
      (id, dir.zipWithIndex.map { case (x, i) => if (i >= 4) x + jit(id, i) else x })
    val dirA1 = Seq(10.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val dirC = Seq(0.0, 0.0, 10.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val dirA2 = Seq(10.0, -1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val dirB = Seq(0.0, 0.0, 0.0, 0.0, 10.0, 0.0, 0.0, 0.0)
    val rows: Seq[(Long, Seq[Double])] =
      Seq((0L, dirA1), (1L, dirC), (2L, dirA2), (3L, dirB)) ++ // Lloyd seeds
        (4L to 8L).map(member(_, dirA1)) ++
        (9L to 14L).map(member(_, dirC)) ++
        (15L to 21L).map(member(_, dirA2)) ++
        (22L to 51L).map(member(_, dirB))
    val df = rows.toDF("vec_id", "embedding")
    val a1Ids = Seq(0L, 4L, 5L, 6L, 7L, 8L)
    val qFrame = df.filter(col("vec_id").isInCollection(a1Ids))
    def recallAt1(path: String): Long =
      AnnIndex.recallCurve(spark, path, qFrame, "vec_id", "embedding",
        df, "vec_id", "embedding", Seq(1), k = 5, rerank = 20)
        .head.getLong(1)

    val pOld = tmpIdx()
    AnnIndex.build(df, "vec_id", "embedding", pOld, nLists = 4)
    val occ0 = AnnIndex.stats(spark, pOld).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(occ0 == Map(0 -> 6L, 1 -> 7L, 2 -> 8L, 3 -> 31L),
      s"fixture trained unexpectedly: $occ0")
    assert(recallAt1(pOld) == 1000000L, "pre-merge recall@1 must be perfect")
    val ex = intercept[IllegalStateException] {
      AnnIndex.rebalance(spark, pOld, df, "vec_id", "embedding",
        hi = 3.0, lo = 0.65, mergePolicy = "occupancy",
        recallQueries = Some(qFrame), recallProbe = 1, recallRerank = 20)
    }
    assert(ex.getMessage.contains("degraded recall"), ex.getMessage)
    // the distant pairing really happened and really lost recall
    val mOld = AnnIndex.loadModel(spark, pOld)
    assert(!mOld.centroids.exists(c => c._1 == 0 || c._1 == 1) &&
      mOld.centroids.exists(_._1 == 4),
      "occupancy policy should have merged [A1, C]")
    assert(recallAt1(pOld) < 1000000L,
      "the distant merge must cost recall — else this fixture proves nothing")

    val pNew = tmpIdx()
    AnnIndex.build(df, "vec_id", "embedding", pNew, nLists = 4)
    // dry run first: the same plan, nothing executed, index untouched
    val planned = AnnIndex.rebalance(spark, pNew, df, "vec_id", "embedding",
      hi = 3.0, lo = 0.65, dryRun = true).collect()
      .filter(_.getString(0) == "merge").map(_.getSeq[Int](1).toSet).toSeq
    assert(planned == Seq(Set(0, 2)), s"dry-run plan: $planned")
    assert(AnnIndex.loadModel(spark, pNew).centroids.map(_._1).toSet
      == Set(0, 1, 2, 3), "dry run must not touch the index")
    val log = AnnIndex.rebalance(spark, pNew, df, "vec_id", "embedding",
      hi = 3.0, lo = 0.65,
      recallQueries = Some(qFrame), recallProbe = 1, recallRerank = 20)
      .collect()
    val merges = log.filter(_.getString(0) == "merge")
      .map(_.getSeq[Int](1).toSet).toSeq
    assert(merges == Seq(Set(0, 2)),
      s"nearest policy must pair the neighboring cold cells, got $merges")
    assert(merges == planned, "the dry-run plan must match the live pass")
    assert(recallAt1(pNew) == 1000000L,
      "nearest policy must preserve recall@1")
  }

  test("OPQ on the residual layout lowers the residual quantization objective like the plain path") {
    // end-to-end encode error of each built index, replayed driver-side
    // with the index's own model (same L2 argmin tie rule, same
    // residual, nearest codebook entry per subspace). Orthogonal
    // rotations preserve L2, so the two geometries compare directly.
    def residualObjective(path: String): Double = {
      val m = AnnIndex.loadModel(spark, path)
      assert(m.residual)
      def l2sq(a: Array[Double], b: Seq[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
        s
      }
      val rows = emb
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => r.getSeq[Double](1).toArray)
      var total = 0.0
      rows.foreach { v0 =>
        val v = m.rotation.fold(v0)(r =>
          r.map(row => row.zip(v0).map { case (a, b) => a * b }.sum))
        val (_, cv) = m.centroids.minBy { case (c, cc) => (l2sq(v, cc), -c) }
        val res = v.indices.map(i => v(i) - cv(i)).toArray
        (0 until m.subspaces).foreach { s =>
          val sub = res.slice(s * m.subDim, (s + 1) * m.subDim)
          total += m.codebooks(s).map { case (_, e) => l2sq(sub, e) }.min
        }
      }
      total
    }
    val pPlain = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", pPlain,
      subspaces = 8, residual = true)
    val pOpq = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", pOpq,
      subspaces = 8, residual = true, opqIters = 3)
    assert(AnnIndex.loadModel(spark, pOpq).rotation.nonEmpty)
    val objPlain = residualObjective(pPlain)
    val objOpq = residualObjective(pOpq)
    // same margin as the plain-layout OPQ gates: the rotation must beat
    // the unrotated objective by a real margin, not noise
    assert(objOpq < objPlain * 0.97,
      s"residual OPQ objective $objOpq !< 0.97 * $objPlain")
  }

  test("filtered search: allow restricts candidates exactly; deny beats allow; pruning survives") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path)
    val unfiltered = AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // allow-everything is bit-equal to no filter at all
    val allowAll = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16,
      allow = Some(emb), allowIdCol = "vec_id"))
    assert(allowAll == unfiltered.toSet)
    // a real filter: only multiples of 3 are candidates
    val filtered = AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16,
      allow = Some(emb.filter(col("vec_id") % 3 === 0)), allowIdCol = "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(filtered.length == 50 && filtered.forall(_._2 % 3 == 0),
      "a disallowed candidate leaked into filtered results")
    // consistency with the unfiltered ranking: any unfiltered top-5
    // member that IS allowed must also be in the filtered top-5 (the
    // filter removes candidates, it cannot demote surviving ones)
    val filteredSet = filtered.toSet
    unfiltered.filter(_._2 % 3 == 0).foreach { p =>
      assert(filteredSet.contains(p),
        s"allowed neighbor $p fell out of the filtered top-5")
    }
    // deny beats allow: tombstone an allowed id that was being served
    val servedAllowed = filtered.head._2
    AnnIndex.delete(spark, path, Seq(servedAllowed))
    val afterDelete = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16,
      allow = Some(emb.filter(col("vec_id") % 3 === 0)), allowIdCol = "vec_id"))
    assert(!afterDelete.exists(_._2 == servedAllowed),
      "a tombstoned id must stay excluded even when allowed")
    // the filter join must not cost the scan its partition pruning
    val probeQ = AnnIndex.topK(spark, path, queriesOf(Seq(0L)),
      "vec_id", "embedding", k = 5, nProbe = 2,
      allow = Some(emb.filter(col("vec_id") % 3 === 0)), allowIdCol = "vec_id")
    probeQ.collect()
    val plan = probeQ.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cid"),
      s"filtered probe lost the partition filter on cid:\n$plan")
  }

  test("append rejects ragged vectors loudly before anything commits") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path)
    val before = spark.read.parquet(AnnIndex.codesPath(spark, path)).count()
    import spark.implicits._
    val bad = Seq((9001L, Seq(1.0, 2.0, 3.0))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      AnnIndex.append(bad, "vec_id", "embedding", path)
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + messages(t.getCause)
    assert(messages(ex).contains("index expects 64"),
      s"want the dim-guard message, got: ${messages(ex)}")
    assert(spark.read.parquet(AnnIndex.codesPath(spark, path)).count() == before,
      "a failed append must not commit rows")
  }

  test("OPQ-rotated index: full probe ≡ inline opqTopK; append/split/query stay in the rotated space") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path, opqIters = 3)
    val m = AnnIndex.loadModel(spark, path)
    assert(m.rotation.isDefined && m.rotation.get.length == 64)
    // the persisted OPQ pipeline must reproduce the inline operator
    // bit-for-bit under exhaustive probing (same fitted rotation — the
    // deterministic sample covers this corpus — same training, codes,
    // integer ADC, tie-breaks)
    val persisted = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16))
    val inline = pairs(Ann.opqTopK(emb, "vec_id", "embedding", 0L to 9L,
      k = 5, opqIters = 3))
    assert(persisted == inline)
    // distributed query path agrees in the rotated space too
    spark.conf.set("spark.graft.ann.localDtMaxQueries", "-1")
    try {
      val dist = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
        "vec_id", "embedding", k = 5, nProbe = 16))
      assert(dist == persisted)
    } finally spark.conf.unset("spark.graft.ann.localDtMaxQueries")

    // append encodes with the frozen rotation: rebuild-from-append must
    // be bit-identical to the built codes
    val p2 = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", p2, opqIters = 3)
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(AnnIndex.codesPath(spark, p2)))
      .iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
    AnnIndex.append(emb, "vec_id", "embedding", p2)
    val c1 = spark.read.parquet(AnnIndex.codesPath(spark, path)).collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1), r.getInt(2))).toSet
    val c2 = spark.read.parquet(AnnIndex.codesPath(spark, p2)).collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1), r.getInt(2))).toSet
    assert(c1 == c2)

    // split re-Lloyds in the rotated space; plain codes still move
    // unchanged, so the exhaustive probe stays bit-equal
    val hot = AnnIndex.hottestList(spark, path)
    AnnIndex.split(spark, path, hot, k = 3, emb, "vec_id", "embedding")
    val m2 = AnnIndex.loadModel(spark, path)
    assert(m2.rotation.isDefined, "split must not drop the rotation")
    val after = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = m2.centroids.length))
    assert(after == persisted)

    // a rebuild WITHOUT opq clears the rotation (no stale-layout bleed)
    AnnIndex.build(emb, "vec_id", "embedding", path)
    assert(AnnIndex.loadModel(spark, path).rotation.isEmpty)
  }

  test("OPQ residual index with raw-space exact re-rank holds the recall gate") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path,
      subspaces = 8, residual = true, opqIters = 3)
    val res = AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 8, rerank = 200,
      exact = Some(emb), exactIdCol = "vec_id", exactVecCol = "embedding")
    val brute = pairs(Ann.bruteForceTopK(emb, "vec_id", "embedding", 0L to 9L, 5))
    val got = pairs(res)
    assert(got.size == 50)
    val recall = got.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.8, s"opq residual rerank recall $recall < 0.8")
  }

  test("split (plain layout): occupancy conserved, codes move unchanged, full probe bit-equal") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path)
    val statsBefore = AnnIndex.stats(spark, path).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    val before = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16))
    val hot = AnnIndex.hottestList(spark, path)
    // the deterministic rule: max occupancy, ties to the larger cid
    assert(statsBefore(hot) == statsBefore.values.max)

    AnnIndex.split(spark, path, hot, k = 4, emb, "vec_id", "embedding")

    val m = AnnIndex.loadModel(spark, path)
    assert(!m.centroids.exists(_._1 == hot), "the split cid must leave the model")
    val newCids = m.centroids.map(_._1).filter(_ > statsBefore.keys.max)
    assert(newCids.nonEmpty && newCids.length <= 4)
    assert(m.nLists == m.centroids.length)
    val statsAfter = AnnIndex.stats(spark, path).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(!statsAfter.contains(hot))
    assert(newCids.map(statsAfter).sum == statsBefore(hot),
      "the split lists must hold exactly the old list's members")
    (statsBefore - hot).foreach { case (c, n) =>
      assert(statsAfter(c) == n, s"untouched list $c changed occupancy")
    }
    // codes moved UNCHANGED (plain layout quantizes raw vectors), so an
    // exhaustive probe is bit-equal to the pre-split index
    val after = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = m.centroids.length))
    assert(after == before)
    // and only that list's partitions were rewritten on disk
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(
      s"${AnnIndex.codesPath(spark, path)}/cid=$hot")))
    newCids.foreach { c =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
        s"${AnnIndex.codesPath(spark, path)}/cid=$c")))
    }
  }

  test("split (residual layout): codes re-encode against the new centroids, recall holds") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path, subspaces = 8, residual = true)
    val hot = AnnIndex.hottestList(spark, path)
    val nBefore = AnnIndex.stats(spark, path)
      .agg(sum(col("n_vectors"))).head.getLong(0)
    AnnIndex.split(spark, path, hot, k = 3, emb, "vec_id", "embedding")
    val m = AnnIndex.loadModel(spark, path)
    assert(m.residual && !m.centroids.exists(_._1 == hot))
    val nAfter = AnnIndex.stats(spark, path)
      .agg(sum(col("n_vectors"))).head.getLong(0)
    assert(nAfter == nBefore)
    val res = AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 8, rerank = 200,
      exact = Some(emb), exactIdCol = "vec_id", exactVecCol = "embedding")
    val brute = pairs(Ann.bruteForceTopK(emb, "vec_id", "embedding", 0L to 9L, 5))
    val got = pairs(res)
    assert(got.size == 50)
    val recall = got.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.8, s"post-split rerank recall $recall < 0.8")
  }

  test("merge (plain layout): corpus-free, occupancy conserved, full probe bit-equal") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path)
    val statsBefore = AnnIndex.stats(spark, path).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    val before = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16))
    val cold = AnnIndex.coldestLists(spark, path, 2)
    val expectedCold = statsBefore.toSeq.sortBy { case (c, n) => (n, c) }
      .take(2).map(_._1)
    assert(cold == expectedCold,
      "coldest-list rule: min occupancy, ties to the smaller cid")

    // plain layout: NO corpus argument — codes move unchanged
    AnnIndex.merge(spark, path, cold)

    val m = AnnIndex.loadModel(spark, path)
    val base = statsBefore.keys.max + 1
    assert(cold.forall(c => !m.centroids.exists(_._1 == c)))
    assert(m.centroids.exists(_._1 == base) && m.nLists == m.centroids.length)
    val statsAfter = AnnIndex.stats(spark, path).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(statsAfter(base) == cold.map(statsBefore).sum)
    (statsBefore -- cold).foreach { case (c, n) => assert(statsAfter(c) == n) }
    // the merged centroid is the count-weighted nano-mean of the olds
    val byCid = m.centroids.toMap
    val after = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = m.centroids.length))
    assert(after == before, "codes unchanged → exhaustive probe bit-equal")
    assert(byCid(base).size == 64)
    // disk: the old list dirs are gone, the merged one exists
    cold.foreach { c =>
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(
        s"${AnnIndex.codesPath(spark, path)}/cid=$c")))
    }
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
      s"${AnnIndex.codesPath(spark, path)}/cid=$base")))
  }

  test("merge (residual layout): re-encodes against the merged centroid, recall holds; recovery") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path, subspaces = 8, residual = true)
    val nBefore = AnnIndex.stats(spark, path)
      .agg(sum(col("n_vectors"))).head.getLong(0)
    val cold = AnnIndex.coldestLists(spark, path, 2)
    // residual layout without a corpus must refuse loudly
    intercept[IllegalArgumentException] {
      AnnIndex.merge(spark, path, cold)
    }
    AnnIndex.merge(spark, path, cold, corpus = Some(emb),
      idCol = "vec_id", vecCol = "embedding")
    assert(AnnIndex.stats(spark, path)
      .agg(sum(col("n_vectors"))).head.getLong(0) == nBefore)
    val res = AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 8, rerank = 200,
      exact = Some(emb), exactIdCol = "vec_id", exactVecCol = "embedding")
    val brute = pairs(Ann.bruteForceTopK(emb, "vec_id", "embedding", 0L to 9L, 5))
    val got = pairs(res)
    assert(got.size == 50)
    assert(got.intersect(brute).size.toDouble / brute.size >= 0.8)

    // crash-between-flip-and-reclaim recovery: orphan dirs of merged
    // cids are reclaimed by a re-run; nothing left → loud error
    val orphan = java.nio.file.Paths.get(
      s"${AnnIndex.codesPath(spark, path)}/cid=${cold.head}")
    java.nio.file.Files.createDirectories(orphan)
    AnnIndex.merge(spark, path, cold, corpus = Some(emb),
      idCol = "vec_id", vecCol = "embedding")
    assert(!java.nio.file.Files.exists(orphan))
    intercept[IllegalArgumentException] {
      AnnIndex.merge(spark, path, cold, corpus = Some(emb),
        idCol = "vec_id", vecCol = "embedding")
    }
  }

  test("rebalance: one policy pass splits hot lists, folds cold runs, conserves content") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path)
    val before = AnnIndex.stats(spark, path).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    val total = before.values.sum
    val probeAll = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16))
    // aggressive thresholds so the natural occupancy spread triggers
    // both halves of the policy on this corpus
    val log = AnnIndex.rebalance(spark, path, emb, "vec_id", "embedding",
      hi = 1.2, lo = 0.9).collect()
    val acts = log.map(_.getString(0)).toSeq
    assert(acts.contains("split") && acts.contains("merge"),
      s"thresholds should trigger both halves, got $acts over ${before.values}")
    val after = AnnIndex.stats(spark, path).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(after.values.sum == total, "rebalance must conserve every vector")
    // the policy's bound: splits cut hot lists toward the mean, and a
    // merged group stops growing once it reaches the mean, so no list
    // can end above max(old max, (1 + lo)·mean)
    val meanAfter = total.toDouble / after.size
    assert(after.values.max <= math.max(before.values.max, ((1 + 0.9) * meanAfter).toLong + 1),
      s"a rebalanced list exceeds the policy bound: ${after.values.max}")
    val m = AnnIndex.loadModel(spark, path)
    assert(m.nLists == m.centroids.length && after.keySet == m.centroids.map(_._1).toSet)
    // plain layout: codes untouched throughout → exhaustive probe bit-equal
    val probeAfter = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = m.centroids.length))
    assert(probeAfter == probeAll)
  }

  test("split is deterministic and crash-recoverable") {
    val p1 = tmpIdx(); val p2 = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", p1)
    AnnIndex.build(emb, "vec_id", "embedding", p2)
    val hot = AnnIndex.hottestList(spark, p1)
    AnnIndex.split(spark, p1, hot, k = 4, emb, "vec_id", "embedding")
    AnnIndex.split(spark, p2, hot, k = 4, emb, "vec_id", "embedding")
    val s1 = AnnIndex.stats(spark, p1).collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val s2 = AnnIndex.stats(spark, p2).collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(s1 == s2, "identical inputs must split identically")

    // crash-between-flip-and-reclaim: the old list dir survives as an
    // orphan; a re-run for the same cid completes the reclaim
    val orphan = java.nio.file.Paths.get(
      s"${AnnIndex.codesPath(spark, p1)}/cid=$hot")
    java.nio.file.Files.createDirectories(orphan)
    AnnIndex.split(spark, p1, hot, k = 4, emb, "vec_id", "embedding")
    assert(!java.nio.file.Files.exists(orphan))
    // with nothing left to recover, the same call is a loud error
    intercept[IllegalArgumentException] {
      AnnIndex.split(spark, p1, hot, k = 4, emb, "vec_id", "embedding")
    }
    // rebuild resets the model pointer: a stale versioned model from
    // this generation must not shadow the fresh build
    AnnIndex.build(emb, "vec_id", "embedding", p1)
    val m = AnnIndex.loadModel(spark, p1)
    assert(m.nLists == 16 && m.centroids.exists(_._1 == hot))
  }

  test("appendStream with a compaction cadence keeps the file count bounded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = tmpIdx()
    AnnIndex.build(emb.filter(col("vec_id") < 300), "vec_id", "embedding", path)
    val rows = emb.filter(col("vec_id") >= 300)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val src = MemoryStream[(Long, Seq[Double])]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_annstrc_ck").toString
    def files(): Int = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(AnnIndex.codesPath(spark, path)))
        .iterator().asScala.count(_.toString.endsWith(".parquet"))
    }
    // every 2nd micro-batch compacts: after 4 batches the layout must
    // be back at one file per list, with every row served
    val q = AnnIndex.appendStream(
      src.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding", path, ckpt,
      compactEvery = 2)
    try {
      rows.grouped(50).foreach { g =>
        src.addData(g.toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val lists = spark.read.parquet(AnnIndex.codesPath(spark, path))
      .select("cid").distinct.count().toInt
    assert(files() == lists,
      s"cadenced compaction should end at one file per list, got ${files()} for $lists")
    assert(spark.read.parquet(AnnIndex.codesPath(spark, path)).count() == 500)
    val got = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16))
    assert(got.size == 50)
  }

  test("empty query batch yields an empty frame; dim mismatch fails loudly") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path)
    assert(AnnIndex.topK(spark, path, queriesOf(Seq(-1L)),
      "vec_id", "embedding", k = 5).count() == 0)
    import spark.implicits._
    val bad = Seq((0L, Array(1.0, 2.0))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      AnnIndex.topK(spark, path, bad, "vec_id", "embedding", k = 5)
    }
    intercept[IllegalArgumentException] {
      AnnIndex.topK(spark, path, queriesOf(Seq(0L)), "vec_id", "embedding",
        k = 5, rerank = 10)
    }
  }

  test("withRank returns the per-query rank column, consistent with the plain output") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path)
    val ranked = AnnIndex.topK(spark, path, queriesOf(0L to 4L),
      "vec_id", "embedding", k = 5, nProbe = 16, withRank = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(ranked.length == 25)
    // ranks are exactly 1..k per query and the (query, neighbor) pairs
    // match the rank-less output bit-for-bit
    assert(ranked.groupBy(_._1).values
      .forall(_.map(_._3).sorted.toSeq == (1 to 5)))
    val plain = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 4L),
      "vec_id", "embedding", k = 5, nProbe = 16))
    assert(ranked.map(t => (t._1, t._2)).toSet == plain)
    // same for the exact-rerank path (rank = the rerank ordering)
    val rr = AnnIndex.topK(spark, path, queriesOf(0L to 4L),
      "vec_id", "embedding", k = 5, nProbe = 16, rerank = 50,
      exact = Some(emb), exactIdCol = "vec_id", exactVecCol = "embedding",
      withRank = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rr.length == 25 &&
      rr.groupBy(_._1).values.forall(_.map(_._3).sorted.toSeq == (1 to 5)))
  }

  test("manifest generation counter: a stale-snapshot publish fails loudly, the index survives") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path)
    val expected = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16))
    // writer A resolves its snapshot ...
    val snapA = AnnIndex.readLayoutNow(spark, path)
    // ... then writer B completes a full maintenance flip in between
    AnnIndex.delete(spark, path, Seq(999999L))
    // A's publish against the moved manifest must fail LOUDLY — a
    // silent last-writer-wins flip would lose B's bookkeeping
    val ex = intercept[IllegalStateException] {
      AnnIndex.publishLayout(spark, path, snapA)
    }
    assert(ex.getMessage.contains("concurrent maintenance writer"),
      s"wrong failure: ${ex.getMessage}")
    // B's flip survived intact: generation moved exactly once and the
    // index serves exactly as before (999999 was never a member)
    val after = AnnIndex.readLayoutNow(spark, path)
    assert(after.generation == snapA.generation + 1)
    assert(after.tombstones.nonEmpty, "the loser must not clobber B's flip")
    assert(pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16)) == expected)
  }

  test("racing maintenance writers: at most one flip wins per generation, losers fail loudly, index stays consistent") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path)
    val total = AnnIndex.stats(spark, path)
      .agg(sum(col("n_vectors"))).head.getLong(0)
    val gen0 = AnnIndex.readLayoutNow(spark, path).generation
    // two concurrent writers race real maintenance passes; a loser
    // fails LOUDLY (the generation conflict, or a staging collision
    // that precedes it) — what can never happen is a silent interleave:
    // generation moves exactly once per SUCCESSFUL pass
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 2).map { _ =>
      new Thread(() => {
        try { AnnIndex.delete(spark, path, Seq(777777L)); () }
        catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    val successes = 2 - errs.size()
    assert(successes >= 1, s"at least one writer must win: ${errs.peek()}")
    // the index is consistent regardless of who won: one flip per win
    val genN = AnnIndex.readLayoutNow(spark, path).generation
    assert(genN == gen0 + successes,
      s"generation moved $gen0 -> $genN with $successes successful flips")
    assert(AnnIndex.stats(spark, path).agg(sum(col("n_vectors"))).head.getLong(0)
      == total)
    assert(pairs(AnnIndex.topK(spark, path, queriesOf(0L to 4L),
      "vec_id", "embedding", k = 5, nProbe = 16)).size == 25)
  }

  test("a crash inside the manifest flip window recovers from INDEX.tmp for readers and writers") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path)
    val expected = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16))
    def mf = java.nio.file.Paths.get(s"$path/INDEX")
    def tmp = java.nio.file.Paths.get(s"$path/INDEX.tmp")
    // simulate the writer dying between the OVERWRITE rename's delete
    // and its move: INDEX gone, the staged INDEX.tmp still on disk
    java.nio.file.Files.move(mf, tmp)
    // a WRITER resolving now must recover the staged manifest, never
    // resolve legacy bare names (which don't exist on this index) —
    // this delete would otherwise publish a manifest naming ghosts
    AnnIndex.delete(spark, path, Seq(0L))
    assert(java.nio.file.Files.exists(mf) && !java.nio.file.Files.exists(tmp))
    val served = pairs(AnnIndex.topK(spark, path, queriesOf(1L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16))
    assert(served.size == 45 && served.forall(_._2 != 0L))
    // and a READER landing in the crashed window recovers too (after
    // waiting out the live-flip grace)
    java.nio.file.Files.move(mf, tmp)
    assert(pairs(AnnIndex.topK(spark, path, queriesOf(1L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16)) == served)
    assert(java.nio.file.Files.exists(mf), "the reader must re-publish the tmp")
    // sanity: the recovered index still matches its pre-crash self
    // modulo the delete (drop query 0's rows too — it is not queried
    // after the delete)
    assert(expected.filter(p => p._1 != 0L && p._2 != 0L).subsetOf(served))
  }

  test("delete then re-add: append folds the tombstone and the stale rows, no manual compact") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path)
    val total = AnnIndex.stats(spark, path)
      .agg(sum(col("n_vectors"))).head.getLong(0)
    val before = pairs(AnnIndex.topK(spark, path, queriesOf(1L to 10L),
      "vec_id", "embedding", k = 5, nProbe = 16))
    // delete two ids that actually SERVE (the two most frequent
    // top-5 neighbors, ties by id), re-add ONE with its original vector
    val byFreq = before.toSeq.map(_._2).groupBy(identity).toSeq
      .sortBy { case (id, v) => (-v.size, id) }.map(_._1)
    val (victim, other) = (byFreq.head, byFreq(1))
    AnnIndex.delete(spark, path, Seq(victim, other))
    AnnIndex.append(emb.filter(col("vec_id") === victim),
      "vec_id", "embedding", path)
    // visible immediately, with NO manual compact ...
    val served = AnnIndex.topK(spark, path, queriesOf(1L to 10L),
      "vec_id", "embedding", k = 5, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(served.exists(_._2 == victim), "the re-added id must serve again")
    assert(!served.exists(_._2 == other), "the still-deleted id must stay deleted")
    // ... exactly once: the stale physical row was folded out, so no
    // (query, neighbor) pair appears twice
    assert(served.length == served.toSet.size,
      "stale physical rows resurrected as duplicate candidates")
    // identical vector, same frozen model → the victim's pre-delete
    // slots are all restored
    assert(before.filter(_._2 == victim).subsetOf(served.toSet),
      "the re-added id must reclaim its exact pre-delete ranking slots")
    // occupancy: one id net-deleted
    assert(AnnIndex.stats(spark, path).agg(sum(col("n_vectors"))).head.getLong(0)
      == total - 1)
    // the tombstone artifact kept the OTHER id only
    val l = AnnIndex.readLayoutNow(spark, path)
    assert(l.tombstones.nonEmpty)
    assert(spark.read.parquet(s"$path/${l.tombstones.get}")
      .collect().map(_.getLong(0)).toSet == Set(other))
    // physically: exactly ONE row with the victim's id in the codes
    assert(spark.read.parquet(s"$path/${l.codes}")
      .filter(col("id") === victim).count() == 1)
    assert(before.filter(p => p._2 != victim && p._2 != other)
      .subsetOf(served.toSet))
  }

  test("fsck: healthy index all OK; each corruption class surfaces with its repair hint") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path, opqIters = 1)
    def report(deep: Boolean = false): Map[String, (String, String)] =
      AnnIndex.fsck(spark, path, deep).collect()
        .map(r => (r.getString(0), (r.getString(1), r.getString(2))))
        .groupBy(_._1).map { case (k, v) => (k, v.head._2) }
    // healthy: every check OK, deep included
    val healthy = AnnIndex.fsck(spark, path, deep = true).collect()
    assert(healthy.nonEmpty && healthy.forall(_.getString(1) == "OK"),
      s"healthy index must be all-OK: ${healthy.mkString("; ")}")
    assert(report()("manifest")._2.contains("generation 1"))

    // tombstone-heavy: deep advises a compact
    AnnIndex.delete(spark, path, emb.filter(col("vec_id") % 3 === 0), "vec_id")
    val heavy = report(deep = true)("tombstones")
    assert(heavy._1 == "WARN" && heavy._2.contains("compact"), s"$heavy")
    AnnIndex.compact(spark, path, retainPrevious = false)

    // grace-retained orphan: OK with the vacuum hint
    AnnIndex.compact(spark, path) // retains the superseded codes
    val orphan = report()("orphans")
    assert(orphan._1 == "OK" && orphan._2.contains("vacuum"), s"$orphan")

    // unpublished staging: WARN
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$path/codes_v99"))
    val staging = AnnIndex.fsck(spark, path).collect()
      .filter(r => r.getString(0) == "orphans" && r.getString(2).contains("codes_v99"))
    assert(staging.length == 1 && staging.head.getString(1) == "WARN")
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$path/codes_v99"))

    // stale list partition (crashed split's reclaim half): WARN naming it
    val codes = s"$path/${AnnIndex.readLayoutNow(spark, path).codes}"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$codes/cid=777"))
    val stale = report()("lists")
    assert(stale._1 == "WARN" && stale._2.contains("777"), s"$stale")
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$codes/cid=777"))

    // crashed flip window: ERROR naming INDEX.tmp recovery
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$path/INDEX"),
      java.nio.file.Paths.get(s"$path/INDEX.tmp"))
    val crashed = report()("manifest")
    assert(crashed._1 == "ERROR" && crashed._2.contains("INDEX.tmp"), s"$crashed")
    // fsck is READ-ONLY: it parsed the tmp but did NOT recover it
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/INDEX")),
      "fsck must not repair the crashed flip itself")
    // a real read recovers, after which fsck reads OK
    assert(AnnIndex.topK(spark, path, queriesOf(Seq(1L)),
      "vec_id", "embedding", k = 5, nProbe = 16).count() == 5)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/INDEX")))
    assert(report()("manifest")._1 == "OK")

    // referenced artifact missing: ERROR
    val l = AnnIndex.readLayoutNow(spark, path)
    val victim = java.nio.file.Paths.get(s"$path/${l.centroids}")
    val moved = java.nio.file.Paths.get(s"$path/_hidden_centroids")
    java.nio.file.Files.move(victim, moved)
    val miss = report()("artifacts")
    assert(miss._1 == "ERROR" && miss._2.contains(l.centroids), s"$miss")
    java.nio.file.Files.move(moved, victim)
    assert(report()("artifacts")._1 == "OK")

    // missing root: single ERROR row
    val gone = AnnIndex.fsck(spark, s"$path/nope").collect()
    assert(gone.length == 1 && gone.head.getString(1) == "ERROR")
  }

  test("clone: one-snapshot copy serves bit-equal, keeps deletes, stays independent") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path)
    AnnIndex.build(emb, "vec_id", "embedding", path) // leave a retained generation
    AnnIndex.delete(spark, path, Seq(2L, 4L))
    val src = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16))
    val dst = tmpIdx()
    AnnIndex.clone(spark, path, dst)
    // bit-equal serving, tombstones included
    val cloned = pairs(AnnIndex.topK(spark, dst, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16))
    assert(cloned == src && cloned.forall(p => p._2 != 2L && p._2 != 4L))
    // fresh lineage: generation 1, no retained history — the source's
    // grace-retained codes_v1 (superseded by the rebuild) is NOT copied
    val l = AnnIndex.readLayoutNow(spark, dst)
    assert(l.generation == 1L && l.retired.isEmpty)
    assert(l.codes == "codes_v2")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/codes_v1")),
      "fixture: the source must hold a retained generation")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dst/codes_v1")),
      "retained generations must not ride along")
    val health = AnnIndex.fsck(spark, dst, deep = true).collect()
    assert(health.forall(_.getString(1) == "OK"),
      s"clone must be healthy: ${health.mkString("; ")}")
    // independence: maintenance on the clone never touches the source
    AnnIndex.compact(spark, dst, retainPrevious = false)
    assert(pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16)) == src)
    // and vice versa: delete a neighbor the clone SERVES on the source
    // side — the clone must keep serving it
    val servedId = cloned.head._2
    AnnIndex.delete(spark, path, Seq(servedId))
    assert(pairs(AnnIndex.topK(spark, dst, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16)).exists(_._2 == servedId))
    // refuses to overwrite an existing index
    intercept[IllegalArgumentException] {
      AnnIndex.clone(spark, path, dst)
    }
  }

  test("re-add with a DIFFERENT vector moves the row; re-adding the whole set clears the tombstones") {
    import spark.implicits._
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path)
    val model = AnnIndex.loadModel(spark, path)
    // pick an id and a replacement vector from a DIFFERENT list so the
    // re-add provably lands elsewhere and the old list is rewritten
    val codes0 = spark.read.parquet(s"$path/${AnnIndex.readLayoutNow(spark, path).codes}")
      .select("id", "cid").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val vecOf = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    val victim = 7L
    val donor = vecOf.keys.find(id => codes0(id) != codes0(victim)).get
    AnnIndex.delete(spark, path, Seq(victim))
    AnnIndex.append(Seq((victim, vecOf(donor))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", path)
    val l = AnnIndex.readLayoutNow(spark, path)
    // tombstones fully cleared (the only deleted id was re-added)
    assert(l.tombstones.isEmpty, "re-adding the whole tombstone set must clear it")
    val rows = spark.read.parquet(s"$path/${l.codes}")
      .filter(col("id") === victim).select("cid")
      .collect().map(_.getInt(0))
    assert(rows.length == 1, s"expected exactly one physical row, got ${rows.length}")
    assert(rows.head == codes0(donor),
      "the re-added row must live in the donor vector's list")
    assert(AnnIndex.stats(spark, path).agg(sum(col("n_vectors"))).head.getLong(0)
      == emb.count())
    // the moved row serves from its new list under a full probe
    val served = pairs(AnnIndex.topK(spark, path,
      queriesOf(Seq(donor)), "vec_id", "embedding", k = 5, nProbe = model.nLists))
    assert(served.contains((donor, victim)),
      "the re-added duplicate of the donor vector must be its nearest neighbor")
  }

  test("model cache: rm-rf + rebuild at the same path inside one mtime tick is not served stale") {
    import java.nio.file.{Files, Paths, Path => JPath}
    import java.nio.file.attribute.FileTime
    val path = tmpIdx()
    val root = Paths.get(path)
    def setAllMtimes(t: FileTime): Unit = {
      import scala.jdk.CollectionConverters._
      Files.walk(root).iterator().asScala.foreach(p => Files.setLastModifiedTime(p, t))
    }
    def rmRf(): Unit = {
      import scala.jdk.CollectionConverters._
      Files.walk(root).iterator().asScala.toSeq.sortBy(-_.getNameCount)
        .foreach(p => Files.deleteIfExists(p))
    }
    // pin every mtime to one fixed tick in BOTH generations — the
    // worst-case coarse-granularity filesystem where a rebuild lands on
    // the identical version dir names AND the identical mtime
    val tick = FileTime.fromMillis(1700000000000L)
    AnnIndex.build(emb, "vec_id", "embedding", path, nLists = 8)
    setAllMtimes(tick)
    assert(AnnIndex.loadModel(spark, path).nLists == 8)
    rmRf()
    AnnIndex.build(emb, "vec_id", "embedding", path, nLists = 4)
    setAllMtimes(tick)
    assert(AnnIndex.loadModel(spark, path).nLists == 4,
      "a from-scratch rebuild at the same path must never serve the previous build's model")
  }
}
