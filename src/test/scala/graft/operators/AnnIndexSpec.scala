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
    // ...and reclaimed by the NEXT compact
    AnnIndex.compact(spark, path)
    assert(AnnIndex.codesPath(spark, path).endsWith("codes_v3"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/codes_v1")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/codes_v2")))
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
    // ... and the NEXT build reclaims it
    AnnIndex.build(emb, "vec_id", "embedding", path)
    assert(AnnIndex.codesPath(spark, path).endsWith("codes_v3"))
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

  test("vacuum reclaims retained generations, never the live set") {
    val path = tmpIdx()
    AnnIndex.build(emb, "vec_id", "embedding", path)
    AnnIndex.build(emb, "vec_id", "embedding", path) // v1 retained
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/codes_v1")))
    val expected = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16))
    val removed = AnnIndex.vacuum(spark, path)
    assert(removed >= 4, s"expected the retained generation gone, removed $removed")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/codes_v1")))
    assert(AnnIndex.vacuum(spark, path) == 0, "second vacuum must be a no-op")
    val after = pairs(AnnIndex.topK(spark, path, queriesOf(0L to 9L),
      "vec_id", "embedding", k = 5, nProbe = 16))
    assert(after == expected, "vacuum must never touch the live set")
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
}
