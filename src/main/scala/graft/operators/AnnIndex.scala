package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVFADC index: build ONCE, query many times.
  *
  * Every inline ANN operator in [[Ann]] retrains its model per call —
  * fine for a one-shot query, wrong for the production serving pattern
  * where a 100 TB corpus is indexed once and then queried by thousands
  * of batches. This operator splits the two phases across a durable
  * parquet layout (reference behavior: ArchiTXT caches derived
  * per-corpus artifacts once and reuses them across runs,
  * `nlp/__init__.py` corpus cache; the index structure itself is
  * Jégou/Douze/Schmid, "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011, §IV — public):
  *
  * {{{
  *   path/INDEX                 one-line JSON manifest naming the live
  *                              directory of every artifact below
  *   path/meta_vN/              one row: nLists, subspaces, subDim, dim, codebook
  *   path/centroids_vN/         (cid, cv)       — coarse quantizer, model-sized
  *   path/codebooks_vN/         (m, cid, cv)    — PQ codebooks, model-sized
  *   path/rotation_vN/          (i, r)          — optional OPQ rotation row i
  *                                                (present iff built with
  *                                                opqIters > 0), model-sized
  *   path/codes_vN/cid=K/       (id, codes)     — the compressed corpus,
  *                                                PARTITIONED BY the coarse cid
  * }}}
  *
  * Every artifact directory is VERSIONED and named by ONE atomically-
  * published manifest (the [[graft.model.ForestStore]] HEAD pattern:
  * tmp-file + overwriting rename). Writers stage complete new
  * directories first and flip the manifest once, so any reader
  * resolves a MUTUALLY CONSISTENT artifact set at any instant:
  * [[build]] replaces the whole generation in one flip (a rebuild over
  * a live index cannot pair a half-new model with old codes),
  * [[compact]] swaps only `codes`, [[split]]/[[merge]] swap only
  * meta+centroids while their codes changes stay additive until the
  * flip. A crash at any step leaves the previous manifest valid, and
  * the orphaned staging directories are reclaimed by the next
  * maintenance pass. Pre-manifest indexes (bare directories, or the
  * transitional CODES/MODEL pointer files) stay readable and migrate on
  * the next maintenance write. Maintenance writers
  * ([[append]]/[[compact]]/[[split]]/[[merge]]/[[delete]]) are
  * single-writer among
  * themselves; manifest-snapshot readers ([[topK]], [[stats]] and
  * everything built on them) need no coordination — they restrict the
  * scan to the snapshot model's cids, so split/merge's additive
  * pre-flip appends are invisible to them. A RAW whole-directory scan
  * of [[codesPath]] does not get that guarantee: during a split/merge
  * window it counts the staged `cid=base` partitions alongside the old
  * lists, so raw scans are only consistent outside maintenance windows
  * (after a split/merge flip, old list dirs are reclaimed — see the
  * reader contract on [[merge]] and the [[topKRetrying]] helper).
  *
  * Scale design: `codes/` is the only data-sized artifact and it stores
  * `subspaces` small ints per vector (16 bits at the defaults vs a
  * 256-byte raw vector). Because it is written `partitionBy("cid")`, a
  * probe-limited query's `cid IN (probed)` restriction is TRUE partition
  * pruning — the scan lists `nProbe` directories and never opens the
  * rest, which is exactly the inverted-list file layout of the paper
  * expressed as a parquet convention. Training is bit-identical to
  * [[Ann.ivfAdcTopK]] (same deterministic Lloyd init, same
  * order-independent nano-unit integer means), so `nProbe = nLists`
  * against a persisted index must reproduce [[Ann.pqTopK]]'s exhaustive
  * integer-ADC ranking bit-for-bit — which keeps the whole
  * build→save→load→query machinery under the same relational oracle.
  */
object AnnIndex {

  /** Driver-side model: everything except the compressed corpus.
    * `residual = true` marks the paper's residual layout (§IV): codes
    * quantize `v − centroid(cid)` under an L2 coarse quantizer, and
    * queries use per-(query, probed-list) distance tables.
    */
  final case class Model(
      nLists: Int,
      subspaces: Int,
      subDim: Int,
      dim: Int,
      codebook: Int,
      residual: Boolean,
      centroids: Array[(Int, Seq[Double])],
      codebooks: Array[Array[(Int, Seq[Double])]],
      rotation: Option[Array[Array[Double]]] = None)

  // ---- one atomic manifest naming every artifact directory ----------
  // Every mutable artifact (codes, meta, centroids, codebooks, rotation)
  // lives in a versioned directory, and ONE manifest file (`INDEX`, a
  // single JSON line) names the live directory of each. Writers stage
  // complete new directories, then flip the manifest via tmp-file +
  // overwriting atomic rename (ForestStore's HEAD recipe) — so any
  // reader resolves a MUTUALLY CONSISTENT set of artifacts at any
  // instant: build replaces the whole generation in one flip,
  // compact swaps only `codes`, split/merge swap only meta+centroids
  // while their codes changes are additive until the flip. Pre-manifest
  // layouts (bare dirs, or the interim CODES/MODEL pointer files) stay
  // readable and are migrated by the next maintenance write.

  /** The live directory name of each artifact, as resolved from one
    * manifest snapshot — the unit of reader consistency.
    */
  private[operators] final case class Layout(
      codes: String,
      meta: String,
      centroids: String,
      codebooks: String,
      rotation: Option[String],
      tombstones: Option[String] = None,
      retired: Map[String, Long] = Map.empty,
      generation: Long = 0L) {
    def dirs: Set[String] =
      Set(codes, meta, centroids, codebooks) ++ rotation ++ tombstones
  }

  private val ArtifactRe =
    "(codes|meta|centroids|codebooks|rotation|tombstones)(_v\\d+)?"

  private def fsFor(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def manifestFile(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/INDEX")

  private def readSmall(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): String = {
    // The manifest rename is atomic for the DATA file, but local
    // ChecksumFileSystem moves the data file and its .crc sidecar as
    // two steps — a reader overlapping a flip can transiently see the
    // new bytes against the old checksum. The window is microseconds;
    // ride it out rather than surface a phantom corruption. (HDFS and
    // object stores have no client-side sidecar — the retry never
    // triggers there.)
    var attempt = 0
    while (true) {
      try {
        val in = fs.open(p)
        try return new String(
          in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8).trim
        finally in.close()
      } catch {
        // ChecksumException: the .crc sidecar lags the data rename.
        // FileNotFoundException: the exists() check raced the
        // delete-then-rename pair of an OVERWRITE flip. Both transient.
        case _: org.apache.hadoop.fs.ChecksumException if attempt < 100 =>
          attempt += 1; Thread.sleep(10)
        case _: java.io.FileNotFoundException if attempt < 100 =>
          attempt += 1; Thread.sleep(10)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Resolve the live layout: the `INDEX` manifest when present, else
    * the interim single-artifact pointer files (`CODES`/`MODEL`), else
    * the original bare directory names.
    *
    * Flip-window tolerance: the manifest publish renames with
    * OVERWRITE, and local filesystems implement that as a
    * delete-then-rename pair — a reader landing inside the pair sees NO
    * manifest for a moment. Falling back to the legacy bare-name layout
    * there would resolve directories that never existed on a
    * manifest-published index, so the legacy fallback only engages when
    * the directory holds no versioned artifacts at all; otherwise the
    * reader waits out the flip (bounded) and re-reads.
    */
  private def readLayout(spark: SparkSession, path: String): Layout = {
    val (fs, root) = fsFor(spark, path)
    val mf = manifestFile(path)
    var attempt = 0
    while (!fs.exists(mf)) {
      // transitional round-13 layouts name their versioned dirs through
      // pointer FILES — only a pointer-less versioned layout with no
      // manifest means a flip is in its delete-then-rename window
      val hasPointer =
        fs.exists(new org.apache.hadoop.fs.Path(s"$path/CODES")) ||
          fs.exists(new org.apache.hadoop.fs.Path(s"$path/MODEL"))
      val versioned = fs.exists(root) && fs.listStatus(root).exists(st =>
        st.isDirectory && st.getPath.getName.matches(ArtifactRe) &&
          st.getPath.getName.contains("_v"))
      if (hasPointer || !versioned) return legacyLayout(fs, path)
      // a LIVE flip's window is microseconds; a manifest still missing
      // after ~1 s means the flipping writer CRASHED between its delete
      // and rename — the staged manifest is still on disk as INDEX.tmp,
      // so recover it instead of stranding every reader
      if (attempt >= 100) {
        val recovered = recoverManifest(spark, fs, path)
        if (recovered.isDefined) return recovered.get
      }
      attempt += 1
      require(attempt <= 200,
        s"INDEX manifest missing at $path while versioned artifacts exist " +
          "and INDEX.tmp is unrecoverable — corrupt index?")
      Thread.sleep(10)
    }
    readManifest(fs, mf)
  }

  /** The writer-side resolve: manifest if present, else legacy — NO
    * flip-window wait. A maintenance writer is the only flipper
    * (single-writer contract), so a missing manifest during ITS OWN
    * publish is not a race; during a first build/delete it is simply
    * the pre-manifest state with the new generation already staged.
    *
    * A missing manifest WITH versioned artifacts and an INDEX.tmp on
    * disk is a crashed flip — recover the staged manifest rather than
    * resolving legacy bare names that never existed on this index (a
    * writer publishing against those would name nonexistent dirs).
    * Versioned artifacts with NEITHER manifest nor tmp are a crashed
    * FIRST build's staging (nothing was ever published) — the legacy
    * resolve is correct there and the rerun overwrites the staging.
    */
  private[operators] def readLayoutNow(spark: SparkSession, path: String): Layout = {
    val (fs, _) = fsFor(spark, path)
    val mf = manifestFile(path)
    if (fs.exists(mf)) readManifest(fs, mf)
    else recoverManifest(spark, fs, path).getOrElse {
      // recoverManifest also returns None when it LOSES the recovery
      // race (tmp parsed fine, rename failed because a concurrent
      // recoverer/writer already published INDEX) — its doc says the
      // caller re-reads the now-present manifest, so do that before
      // falling back to legacy bare names that never existed on a
      // versioned index (legacy's generation 0 would bypass the
      // sweepStale grace guard and misfire the publish guard)
      if (fs.exists(mf)) readManifest(fs, mf) else legacyLayout(fs, path)
    }
  }

  /** Recover a crashed manifest flip: the OVERWRITE rename is
    * delete-then-rename on local filesystems, so a writer dying inside
    * the pair leaves no `INDEX` but a complete `INDEX.tmp`. Re-publish
    * the tmp (validating it parses first — a LIVE writer's half-written
    * tmp fails the parse and recovery abstains). Racing recoverers are
    * safe: the loser's rename fails, it returns None, and the caller
    * re-reads the now-present manifest.
    */
  private def recoverManifest(
      spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      path: String): Option[Layout] = {
    val tmp = new org.apache.hadoop.fs.Path(s"$path/INDEX.tmp")
    if (!fs.exists(tmp)) return None
    scala.util.Try {
      val l = readManifest(fs, tmp)
      val mf = manifestFile(path)
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        mf.toUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(tmp, mf, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      l
    }.toOption
  }

  private def readManifest(
      fs: org.apache.hadoop.fs.FileSystem,
      mf: org.apache.hadoop.fs.Path): Layout = {
    {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(readSmall(fs, mf))
      def field(k: String, dflt: String): String = {
        val v = if (node.hasNonNull(k)) node.get(k).asText() else dflt
        require(v.matches(ArtifactRe), s"corrupt INDEX manifest field $k: '$v'")
        v
      }
      val retired =
        if (!node.hasNonNull("retired")) Map.empty[String, Long]
        else {
          val r = node.get("retired")
          val it = r.fieldNames()
          var m = Map.empty[String, Long]
          while (it.hasNext) { val k = it.next(); m += k -> r.get(k).asLong() }
          m
        }
      Layout(
        codes = field("codes", "codes"),
        meta = field("meta", "meta"),
        centroids = field("centroids", "centroids"),
        codebooks = field("codebooks", "codebooks"),
        rotation = if (node.hasNonNull("rotation"))
          Some(field("rotation", "rotation")) else None,
        tombstones = if (node.hasNonNull("tombstones"))
          Some(field("tombstones", "tombstones")) else None,
        retired = retired,
        generation = if (node.hasNonNull("generation"))
          node.get("generation").asLong() else 0L)
    }
  }

  /** The pre-manifest layouts: interim pointer files (round-13
    * transitional) or the original bare directory names.
    */
  private def legacyLayout(
      fs: org.apache.hadoop.fs.FileSystem, path: String): Layout = {
    {
      val codesPtr = new org.apache.hadoop.fs.Path(s"$path/CODES")
      val modelPtr = new org.apache.hadoop.fs.Path(s"$path/MODEL")
      val codes =
        if (!fs.exists(codesPtr)) "codes"
        else {
          val s = readSmall(fs, codesPtr)
          require(s.matches("codes(_v\\d+)?"), s"corrupt CODES pointer: '$s'")
          s
        }
      val sfx =
        if (!fs.exists(modelPtr)) ""
        else {
          val s = readSmall(fs, modelPtr)
          require(s.matches("v\\d+"), s"corrupt MODEL pointer: '$s'")
          "_" + s
        }
      Layout(
        codes = codes,
        meta = s"meta$sfx",
        centroids = s"centroids$sfx",
        codebooks = "codebooks",
        rotation = if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/rotation")))
          Some("rotation") else None)
    }
  }

  /** Atomically publish a layout: write a tmp manifest then rename with
    * OVERWRITE, so a concurrent reader sees the old manifest or the new
    * one, never a missing or half-written file. Retires any interim
    * pointer files (ignored once the manifest exists).
    *
    * Retirement bookkeeping: every directory this flip supersedes is
    * recorded in the manifest's `retired` map with the flip's wall-clock
    * millis (carrying forward earlier entries for dirs still on disk) —
    * the age record [[vacuum]]'s grace guard reads, so reclaim safety
    * stops depending on caller discipline.
    *
    * Single-writer ENFORCEMENT (not just contract): the manifest carries
    * a monotone `generation` counter. `l0.generation` is the generation
    * of the snapshot the writer resolved at the start of its pass; if
    * the on-disk manifest moved past it — a second maintenance writer
    * flipped in between — this publish fails LOUDLY instead of silently
    * interleaving generations and losing the other flip's retirement
    * bookkeeping. At 100 TB with scheduled compacts and manual
    * rebalances, convention is not a guard; the counter is.
    */
  private[operators] def publishLayout(spark: SparkSession, path: String, l0: Layout): Unit = {
    val (fs, root) = fsFor(spark, path)
    val now = System.currentTimeMillis()
    val onDisk: Set[String] =
      if (!fs.exists(root)) Set.empty
      else fs.listStatus(root).filter(_.isDirectory).map(_.getPath.getName).toSet
    val prev = readLayoutNow(spark, path)
    if (prev.generation != l0.generation)
      throw new IllegalStateException(
        s"concurrent maintenance writer detected at $path: this pass " +
          s"started from manifest generation ${l0.generation} but the " +
          s"index is now at generation ${prev.generation} — another " +
          "writer flipped in between. Maintenance ops are single-writer; " +
          "re-resolve and re-run this pass.")
    val retired = (prev.retired ++ (prev.dirs -- l0.dirs).map(_ -> now).toMap)
      .filter { case (dir, _) => onDisk.contains(dir) && !l0.dirs.contains(dir) }
    val l = l0.copy(retired = retired, generation = prev.generation + 1)
    val json = {
      val q = graft.util.Json.quote _
      val rot = l.rotation.map(r => s""","rotation":${q(r)}""").getOrElse("")
      val tomb = l.tombstones.map(t => s""","tombstones":${q(t)}""").getOrElse("")
      val ret =
        if (l.retired.isEmpty) ""
        else l.retired.toSeq.sortBy(_._1)
          .map { case (k, v) => s"${q(k)}:$v" }
          .mkString(""","retired":{""", ",", "}")
      s"""{"codes":${q(l.codes)},"meta":${q(l.meta)},"centroids":${q(l.centroids)},"codebooks":${q(l.codebooks)},"generation":${l.generation}$rot$tomb$ret}"""
    }
    val mf = manifestFile(path)
    val tmp = new org.apache.hadoop.fs.Path(s"$path/INDEX.tmp")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      mf.toUri, spark.sparkContext.hadoopConfiguration)
    try fc.rename(tmp, mf, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    catch {
      // a reader's crash-recovery ([[recoverManifest]]) can race THIS
      // flip and move the tmp itself: if the manifest now holds exactly
      // the bytes this writer staged, the flip already happened — done
      case e: Throwable =>
        val published = scala.util.Try(readSmall(fs, mf)).getOrElse("")
        if (published != json) throw e
    }
    Seq("CODES", "MODEL").foreach { n =>
      val p = new org.apache.hadoop.fs.Path(s"$path/$n")
      if (fs.exists(p)) fs.delete(p, false)
    }
  }

  /** Resolved filesystem path of the live codes directory. Public so
    * external tooling (CLI counts, specs) never hardcodes a layout
    * version; internal operators resolve a full [[Layout]] snapshot
    * instead so their model and codes always come from ONE manifest
    * read.
    */
  def codesPath(spark: SparkSession, path: String): String =
    s"$path/${readLayout(spark, path).codes}"

  private def dirVersion(name: String): Int =
    "_v(\\d+)$".r.findFirstMatchIn(name).map(_.group(1).toInt).getOrElse(0)

  private def nextDir(prefix: String, cur: String): String =
    s"${prefix}_v${dirVersion(cur) + 1}"

  /** Delete every artifact directory not in `keep` (the live set and,
    * for maintenance passes, the superseded generation retained one
    * cycle for in-flight readers) — crash-orphaned staging directories
    * and older versions are reclaimed here, never left to strand the
    * index.
    *
    * Grace guard (same record [[vacuum]] reads): a directory RETIRED
    * through a manifest flip keeps its retirement timestamp in the
    * manifest, and the maintenance sweeps skip it until it has been
    * superseded for `graceMs` — so back-to-back maintenance passes
    * cannot reclaim a just-retired generation out from under an
    * in-flight reader that resolved just before the previous flip.
    * Directories with NO retirement record (crash-orphaned staging that
    * was never published, so no reader can reference it) are reclaimed
    * unconditionally. `graceMs < 0` reads
    * `spark.graft.ann.vacuumGraceMs` (default 10 minutes); `0` restores
    * immediate reclaim (the explicit no-readers-in-flight fast path).
    */
  private def sweepStale(
      spark: SparkSession, path: String, keep: Set[String],
      graceMs: Long = -1L): Unit = {
    val grace =
      if (graceMs >= 0) graceMs
      else spark.conf.getOption("spark.graft.ann.vacuumGraceMs")
        .map(_.toLong).getOrElse(600000L)
    val (fs, root) = fsFor(spark, path)
    if (!fs.exists(root)) return
    val retired = readLayoutNow(spark, path).retired
    val now = System.currentTimeMillis()
    fs.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      val stale = st.isDirectory &&
        (n.matches(ArtifactRe) || n == "codes_staged" || n == "codes_old") &&
        !keep.contains(n)
      val oldEnough = retired.get(n).forall(ts => now - ts >= grace)
      if (stale && oldEnough) fs.delete(st.getPath, true)
    }
  }

  /** Train the coarse quantizer + PQ codebooks on `emb` and persist the
    * full index layout at `path` (overwriting any previous index).
    * Training is delegated to the same [[Ann]] internals the inline
    * operators use, so a persisted index is bit-compatible with them.
    */
  def build(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      nLists: Int = 16,
      subspaces: Int = 4,
      codebook: Int = 16,
      iters: Int = 2,
      residual: Boolean = false,
      opqIters: Int = 0,
      opqSample: Int = 2048): Unit = {
    val spark = emb.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val raw = emb
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    // opqIters > 0: the FAISS-style OPQ→IVF(ADC) pipeline — fit the
    // rotation once ([[Ann.opqFit]], deterministic bounded sample),
    // persist it beside the codebooks, and run EVERYTHING downstream
    // (coarse quantizer, codebooks, codes, queries, appends, splits) in
    // the rotated space, which orthogonality makes distance-lossless
    val rotation: Option[Array[Array[Double]]] =
      if (opqIters <= 0) None
      else Some(Ann.opqFit(raw, "id", "v", subspaces, codebook, iters,
        opqIters, opqSample))
    val corpus = applyRotation(raw, rotation).cache()
    try {
      val dim = corpus.select(size(col("v"))).head.getInt(0)
      require(dim % subspaces == 0, s"dim $dim not divisible into $subspaces subspaces")
      val subDim = dim / subspaces

      // residual layout: L2 coarse quantizer (the metric the ADC
      // distances live in), PQ codebooks trained on v − centroid(cid);
      // plain layout: cosine coarse quantizer shared with the inline
      // IVF family, codebooks on the raw vectors
      val centroids =
        if (residual) Ann.lloydCentroidsL2(corpus, nLists, iters)
        else Ann.lloydCentroids(corpus, nLists, iters,
          nLists <= Ann.maxUnrolled(spark))
      val trainCorpus =
        if (!residual) corpus
        else residualFrame(corpus, centroids).select("id", "v")
      val model = Ann.pqTrain(trainCorpus, subDim, subspaces, codebook, iters)
      val full = Model(nLists, subspaces, subDim, dim, codebook, residual,
        centroids, model, rotation)

      // stage the ENTIRE new generation in fresh versioned directories,
      // then publish with ONE manifest flip — a rebuild over a live
      // index is atomic to readers across every artifact at once (no
      // window pairing a half-new model with old codes). The previous
      // generation is retained one cycle for in-flight readers and
      // reclaimed by the next build/compact.
      val cur = readLayoutNow(spark, path)
      val next = Layout(
        codes = nextDir("codes", cur.codes),
        meta = nextDir("meta", cur.meta),
        centroids = nextDir("centroids", cur.centroids),
        codebooks = nextDir("codebooks", cur.codebooks),
        rotation = rotation.map(_ =>
          nextDir("rotation", cur.rotation.getOrElse("rotation"))),
        generation = cur.generation)
      sweepStale(spark, path, keep = cur.dirs ++ next.dirs)

      import spark.implicits._
      Seq((nLists, subspaces, subDim, dim, codebook, residual))
        .toDF("n_lists", "subspaces", "sub_dim", "dim", "codebook", "residual")
        .write.mode("overwrite").parquet(s"$path/${next.meta}")
      centroids.toSeq.toDF("cid", "cv")
        .write.mode("overwrite").parquet(s"$path/${next.centroids}")
      rotation.foreach { r =>
        r.zipWithIndex.map { case (row, i) => (i, row.toSeq) }.toSeq
          .toDF("i", "r").write.mode("overwrite")
          .parquet(s"$path/${next.rotation.get}")
      }
      model.zipWithIndex.toSeq
        .flatMap { case (cb, m) => cb.map { case (cid, cv) => (m, cid, cv) } }
        .toDF("m", "cid", "cv")
        .write.mode("overwrite").parquet(s"$path/${next.codebooks}")

      // the data-sized artifact: coarse assignment + PQ codes, laid out
      // as one directory per inverted list so probes prune at the
      // partition level. The repartition co-locates each list before the
      // write — without it every write task emits a fragment per cid it
      // touches (tasks × lists files); with it a list is one file per
      // holding partition, the actual inverted-list layout. One shuffle,
      // paid once at build time.
      encodedFrame(corpus, full)
        .repartition(col("cid"))
        .write.mode("overwrite").partitionBy("cid").parquet(s"$path/${next.codes}")
      publishLayout(spark, path, next)
      sweepStale(spark, path, keep = cur.dirs ++ next.dirs)
    } finally corpus.unpersist()
  }

  /** Rotate an (id, v) frame into the index's OPQ space (identity =
    * no-op frame). The one transform every ingest/query path shares, so
    * stored codes and query distance tables always live in the same
    * space; the kernel is the codegen'd graft_matvec, a pure map-side
    * projection on the corpus scan.
    */
  private def applyRotation(
      corpus: DataFrame,
      rotation: Option[Array[Array[Double]]]): DataFrame =
    rotation.fold(corpus) { r =>
      val rLit = typedLit(r.map(_.toSeq).toSeq).cast("array<array<double>>")
      corpus.withColumn("v", graft.functions.GraftFunctions.matVec(rLit, col("v")))
    }

  /** Driver-side counterpart of [[applyRotation]] for a single query
    * vector — same sequential per-coordinate accumulation as the
    * graft_matvec kernel, so both paths produce bit-identical doubles.
    */
  private def rotateVec(r: Array[Array[Double]], v: Seq[Double]): Seq[Double] = {
    val out = new Array[Double](r.length)
    var i = 0
    while (i < r.length) {
      var s = 0.0
      var j = 0
      while (j < v.size) { s += r(i)(j) * v(j); j += 1 }
      out(i) = s
      i += 1
    }
    out.toIndexedSeq
  }

  /** `(id, cid, v − centroid(cid))` under the L2 coarse assignment —
    * the frame the residual layout trains and encodes on.
    */
  private def residualFrame(
      corpus: DataFrame,
      centroids: Array[(Int, Seq[Double])]): DataFrame = {
    val cMap = typedLit(centroids.toMap)
    Ann.assignL2(corpus, centroids)
      .withColumn("v",
        zip_with(col("v"), element_at(cMap, col("cid")), (x, c) => x - c))
      .select("id", "cid", "v")
  }

  /** The `(id, codes, cid)` frame a given model encodes a corpus to —
    * the single encode path shared by [[build]] and [[append]], so an
    * appended row is bit-identical to the same row indexed at build
    * time.
    */
  private def encodedFrame(corpus: DataFrame, m: Model): DataFrame = {
    // dim guard IN the encode scan (no extra pass): a ragged vector
    // would otherwise take cid=null from the disqualifying argmax and
    // land in a partition no probe ever reads — silent data loss on
    // ingest. raise_error fails the job before the write commits.
    val checked = corpus.withColumn("v",
      when(size(col("v")) === lit(m.dim), col("v"))
        .otherwise(raise_error(concat(
          lit("ingested vector id="), col("id").cast("string"),
          lit(" has dim "), size(col("v")).cast("string"),
          lit(s", index expects ${m.dim}")))))
    val assigned =
      if (m.residual) residualFrame(checked, m.centroids)
      else Ann.assignToCentroids(checked, m.centroids,
        m.nLists <= Ann.maxUnrolled(corpus.sparkSession))
    assigned
      .withColumn("codes",
        array((0 until m.subspaces).map(i =>
          Ann.pqCodeExpr(i, m.subDim, m.codebooks(i))): _*))
      .select("id", "codes", "cid")
  }

  /** Append new vectors to an existing index WITHOUT retraining: encode
    * them with the persisted (frozen) coarse quantizer + PQ codebooks
    * and append into the cid partitions. This is the incremental-ingest
    * half of the serving pattern — daily increments join the index as
    * one encode scan + partitioned append, never a rebuild; queries see
    * the rows immediately. The frozen model slowly drifts from the data
    * distribution (standard IVF behavior) — rebuild on your reindex
    * cadence. Encoding is the exact expression [[build]] uses, so an
    * appended row is bit-identical to the same row indexed at build
    * time (pinned in AnnIndexSpec). Id uniqueness across batches is the
    * caller's contract, as with every loader in this library.
    *
    * Re-adding a previously [[delete]]d id works WITHOUT a manual
    * compact: the append folds the re-added ids out of the live
    * tombstone set in the same pass (one model-sized manifest flip).
    * Because the deleted id's OLD physical rows may still be on disk
    * (delete itself never touches the data-sized codes),
    * un-tombstoning alone would resurrect them beside the new row —
    * duplicate neighbor candidates — so when old rows exist the pass
    * stages the folded codes (live rows minus re-added ids, plus the
    * new batch) in a fresh versioned directory and publishes codes +
    * tombstones in ONE manifest flip, the compact pattern: a crash at
    * any step leaves the previous manifest fully valid, and no live
    * row is ever deleted before its replacement is durable. Re-adds
    * are the rare path; the common no-readd append pays nothing.
    */
  def append(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      path: String): Unit = {
    val spark = emb.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val layout = readLayoutNow(spark, path)
    val model = loadModelAt(spark, path, layout)
    val corpus = applyRotation(emb
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v")),
      model.rotation)
    val codesDir = s"$path/${layout.codes}"

    // re-added ids: this batch ∩ the live tombstone set (collect is
    // bounded by the tombstone set, which is model-sized by contract)
    val readds: Array[Long] = tombstoneIds(spark, path, layout) match {
      case None => Array.empty[Long]
      case Some(t) => t.join(
          corpus.select(col("id").cast("long").as("id")).distinct(),
          Seq("id"), "left_semi")
        .collect().map(_.getLong(0))
    }
    if (readds.nonEmpty) {
      import spark.implicits._
      val readdDf = readds.toSeq.toDF("id")
      val affected = spark.read.parquet(codesDir)
        .join(broadcast(readdDf), "id").select("cid").limit(1)
        .collect()
      if (affected.nonEmpty) {
        // Old physical rows of re-added ids exist on disk. Stage the
        // folded codes (every live row minus the re-added ids, plus the
        // new batch) in a fresh versioned directory and publish via the
        // manifest flip — the compact pattern. The previous generation
        // stays intact until the flip, so a crash at ANY step leaves
        // the prior manifest fully valid: no live row is ever deleted
        // before its replacement is durable. (An in-place rewrite that
        // deletes live cid dirs before rewriting them has a crash
        // window that permanently loses non-tombstoned rows of
        // unrelated documents in the affected lists.)
        val nextName = nextDir("codes", layout.codes)
        sweepStale(spark, path, keep = layout.dirs + nextName)
        spark.read.parquet(codesDir)
          .join(broadcast(readdDf), Seq("id"), "left_anti")
          .select("id", "codes", "cid")
          .unionByName(encodedFrame(corpus, model).select("id", "codes", "cid"))
          .repartition(col("cid"))
          .write.mode("overwrite").partitionBy("cid").parquet(s"$path/$nextName")
        val published = publishReaddLayout(spark, path, layout, readdDf, Some(nextName))
        // retain the superseded generation one cycle for in-flight
        // readers (grace-guarded), like compact
        sweepStale(spark, path, keep = layout.dirs ++ published.dirs)
        return
      }
      // tombstoned re-adds with no physical rows left (already folded by
      // a compact): plain append + tombstone fold, nothing to rewrite
      encodedFrame(corpus, model)
        .repartition(col("cid"))
        .write.mode("append").partitionBy("cid").parquet(codesDir)
      publishReaddLayout(spark, path, layout, readdDf, None)
      return
    }

    encodedFrame(corpus, model)
      .repartition(col("cid"))
      .write.mode("append").partitionBy("cid").parquet(codesDir)
  }

  /** Publish the layout after a re-add pass: fold the re-added ids out
    * of the live tombstone set and (when the codes were staged in a
    * fresh generation) flip the codes pointer in the SAME manifest
    * write.
    */
  private def publishReaddLayout(
      spark: SparkSession,
      path: String,
      layout: Layout,
      readdDf: DataFrame,
      stagedCodes: Option[String]): Layout = {
    val withCodes = stagedCodes.fold(layout)(n => layout.copy(codes = n))
    val remaining = tombstoneIds(spark, path, layout).get
      .join(readdDf, Seq("id"), "left_anti")
    val next =
      if (remaining.isEmpty) withCodes.copy(tombstones = None)
      else {
        val nextName = nextTombstoneDir(spark, path, layout)
        remaining.write.mode("overwrite").parquet(s"$path/$nextName")
        withCodes.copy(tombstones = Some(nextName))
      }
    publishLayout(spark, path, next)
    next
  }

  /** Rewrite the codes layout back to one file per inverted list.
    * Every [[append]] lands one file per (batch × touched list), so a
    * frequently-fed index fragments — and at 100 TB file COUNT, not
    * byte volume, is what hurts a serving scan (listing latency, one
    * task per tiny file). Content-lossless: same rows, same layout
    * contract, fewer files.
    *
    * The rewrite lands in a fresh `codes_v{N+1}` directory and the
    * manifest flips atomically, so a reader resolving at ANY instant
    * gets a complete layout and a crash at any step leaves the previous
    * manifest valid. The superseded version is RETAINED for readers
    * that resolved just before the flip and are still mid-scan; it is
    * reclaimed by a later compact or [[vacuum]] once its retirement has
    * aged past the grace window (`spark.graft.ann.vacuumGraceMs`,
    * default 10 min — back-to-back maintenance passes cannot reclaim a
    * just-retired generation). Pass `retainPrevious = false` to reclaim
    * immediately when no reader can be in flight. Returns the parquet
    * file count after compaction.
    */
  def compact(
      spark: SparkSession,
      path: String,
      retainPrevious: Boolean = true): Int = {
    val (fs, _) = fsFor(spark, path)
    val layout = readLayoutNow(spark, path)
    val cur = new org.apache.hadoop.fs.Path(s"$path/${layout.codes}")
    require(fs.exists(cur), s"no codes directory to compact at $path")
    val nextName = nextDir("codes", layout.codes)
    // reclaim crash leftovers first: anything that is neither the live
    // set nor the target (a failed prior compact's staging dir with
    // this same name is overwritten by the write below)
    sweepStale(spark, path, keep = layout.dirs + nextName)
    // fold tombstones: the rewrite drops deleted rows physically, so the
    // published layout carries no tombstone set afterwards
    antiTomb(
      spark.read.parquet(cur.toString).select("id", "codes", "cid"),
      tombstoneIds(spark, path, layout))
      .repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(s"$path/$nextName")
    publishLayout(spark, path, layout.copy(codes = nextName, tombstones = None))
    // retainPrevious=false is the caller's explicit no-readers-in-flight
    // assertion — reclaim NOW (grace 0); otherwise the grace guard keeps
    // just-retired generations safe even across back-to-back compacts
    sweepStale(spark, path,
      keep = if (retainPrevious) layout.dirs + nextName
      else layout.dirs - layout.codes -- layout.tombstones + nextName,
      graceMs = if (retainPrevious) -1L else 0L)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(s"$path/$nextName"), true)
    var n = 0
    while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    n
  }

  /** Recall diagnostic for choosing `nProbe`: run [[topK]] at each
    * probe width against an exact brute-force pass over the raw
    * corpus and return `(n_probe, recall_ppm)` — the measured
    * quality/cost curve of THIS index on THIS query sample (recall in
    * exact parts-per-million, deterministic for a fixed index+sample).
    * Cost: one brute pass over the corpus plus one probe-limited scan
    * per requested width — run it on a bounded query sample, the same
    * way the recall gates in the spec suite do.
    */
  def recallCurve(
      spark: SparkSession,
      path: String,
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      probes: Seq[Int],
      k: Int = 5,
      rerank: Int = 0): DataFrame = {
    import spark.implicits._
    recallCurves(spark, path, queries, qidCol, qvecCol, corpus, idCol, vecCol,
      probes, k, Seq(rerank))
      .map { case (_, p, r) => (p, r) }.toDF("n_probe", "recall_ppm")
  }

  /** [[recallCurve]] at several rerank depths in one pass: the exact
    * brute baseline is the expensive half of the diagnostic and is
    * identical across rerank configs, so comparing (say) the
    * theorem-grade corpus-sized rerank against the production ~200
    * config pays for it once instead of once per curve. Returns
    * (rerank, n_probe, recall_ppm) tuples, probes sorted per rerank.
    */
  def recallCurves(
      spark: SparkSession,
      path: String,
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      probes: Seq[Int],
      k: Int,
      reranks: Seq[Int]): Seq[(Int, Int, Long)] = {
    require(probes.nonEmpty && probes.forall(_ >= 1), s"bad probe widths $probes")
    require(reranks.nonEmpty, "need at least one rerank depth")
    val qids = queries.select(col(qidCol).cast("long")).collect().map(_.getLong(0))
    // the brute baseline folds the SAME tombstone set topK anti-joins —
    // a deleted row is not a true neighbor, so measured recall stays
    // meaningful after deletes (full probe still reads 1.0)
    val corpusLive = tombstoneIds(spark, path, readLayout(spark, path))
      .fold(corpus)(t =>
        corpus.join(t.withColumnRenamed("id", idCol), Seq(idCol), "left_anti"))
    val brute = graft.util.Spark.timed("rc-profile", "brute") {
      Ann.bruteForceTopK(corpusLive, idCol, vecCol, qids.toSeq, k)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet }
    require(brute.nonEmpty, "empty query sample — nothing to measure")
    for {
      rerank <- reranks
      p <- probes.distinct.sorted
    } yield {
      val got = graft.util.Spark.timed("rc-profile", s"topK r=$rerank p=$p") {
        topK(spark, path, queries, qidCol, qvecCol, k = k,
          nProbe = p, rerank = rerank,
          exact = if (rerank > 0) Some(corpus) else None,
          exactIdCol = idCol, exactVecCol = vecCol)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet }
      (rerank, p, got.intersect(brute).size.toLong * 1000000L / brute.size)
    }
  }

  /** Reclaim artifact directories the live manifest does not reference —
    * the retained previous generations (kept one cycle for in-flight
    * readers) and any crash-orphaned staging. Returns the number of
    * directories removed.
    *
    * Age guard (safe by default): a directory retired through a
    * manifest flip carries its retirement timestamp in the manifest, and
    * vacuum only reclaims it once it has been superseded for at least
    * `graceMs` — an in-flight reader that resolved the old layout just
    * before the flip keeps its directories readable for the grace
    * window, no caller discipline required. `graceMs < 0` (the default)
    * reads `spark.graft.ann.vacuumGraceMs` (default 10 minutes);
    * `graceMs = 0` restores the old reclaim-everything-now semantics and
    * is also the only setting that touches directories with NO
    * retirement record (crash-orphaned staging, or generations retained
    * by a pre-grace manifest — their age is unknowable, so they wait
    * for an explicit zero-grace pass).
    */
  def vacuum(spark: SparkSession, path: String, graceMs: Long = -1L): Int = {
    val grace =
      if (graceMs >= 0) graceMs
      else spark.conf.getOption("spark.graft.ann.vacuumGraceMs")
        .map(_.toLong).getOrElse(600000L)
    val (fs, root) = fsFor(spark, path)
    val layout = readLayout(spark, path)
    val keep = layout.dirs
    if (!fs.exists(root)) return 0
    val now = System.currentTimeMillis()
    var n = 0
    fs.listStatus(root).foreach { st =>
      val name = st.getPath.getName
      val stale = st.isDirectory &&
        (name.matches(ArtifactRe) || name == "codes_staged" || name == "codes_old") &&
        !keep.contains(name)
      val oldEnough = layout.retired.get(name) match {
        case Some(ts) => now - ts >= grace
        case None => grace == 0L
      }
      if (stale && oldEnough) { fs.delete(st.getPath, true); n += 1 }
    }
    n
  }

  /** Consistent snapshot COPY of the index — the backup / disaster-
    * recovery / staging-to-serving promotion move. Resolves ONE
    * manifest snapshot and copies exactly the artifacts it references
    * (never retained generations, never staging orphans, never the
    * retirement history), then publishes a fresh manifest at `dst`
    * (generation 1). Because the source snapshot is immutable-by-
    * convention (writers stage NEW versioned dirs and flip — they never
    * rewrite a referenced dir in place except the in-list rewrites of
    * split/merge/readd, which are single-writer-serialized against this
    * by the generation guard), a clone taken outside a maintenance
    * window is bit-identical to the source; the tombstone set rides
    * along, so delete semantics survive the copy. The clone is
    * INDEPENDENT: maintenance on either side never touches the other.
    */
  def clone(spark: SparkSession, src: String, dst: String): Unit = {
    val (fs, _) = fsFor(spark, src)
    val (dfs, droot) = fsFor(spark, dst)
    require(!dfs.exists(manifestFile(dst)),
      s"clone destination $dst already holds an index — refusing to overwrite")
    val layout = readLayout(spark, src)
    dfs.mkdirs(droot)
    layout.dirs.toSeq.sorted.foreach { d =>
      val from = new org.apache.hadoop.fs.Path(s"$src/$d")
      require(fs.exists(from), s"source artifact $d missing — run fsck on $src")
      org.apache.hadoop.fs.FileUtil.copy(fs, from,
        dfs, new org.apache.hadoop.fs.Path(s"$dst/$d"),
        false, spark.sparkContext.hadoopConfiguration)
    }
    publishLayout(spark, dst, layout.copy(retired = Map.empty, generation = 0L))
  }

  /** Index health check — the operational "is this index serving-safe
    * and does it need maintenance" report, one `(check, status, detail)`
    * row per inspection, `status ∈ OK | WARN | ERROR`. READ-ONLY: fsck
    * never repairs (every finding's detail names the repairing
    * operation). Default cost is metadata-only (manifest read + one
    * directory listing + model-sized artifact reads); `deep = true`
    * additionally counts codes rows and per-list files (a column-pruned
    * data scan) for fragmentation and tombstone-ratio advice.
    *
    * Checks: manifest presence/recoverability (a crashed flip's
    * `INDEX.tmp` is called out), referenced-artifact existence, model
    * shape consistency (centroid count vs meta, codebook shapes,
    * rotation dimension), stale list partitions (a crashed split/merge's
    * reclaim half), unreferenced on-disk artifacts (grace-retained vs
    * unpublished staging), leftover transitional pointer files, and —
    * deep only — per-list file fragmentation and the tombstone ratio.
    */
  def fsck(spark: SparkSession, path: String, deep: Boolean = false): DataFrame = {
    val (fs, root) = fsFor(spark, path)
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    def add(check: String, status: String, detail: String): Unit =
      rows += ((check, status, detail))
    import spark.implicits._
    if (!fs.exists(root)) {
      add("root", "ERROR", s"index root $path does not exist")
      return rows.toSeq.toDF("check", "status", "detail")
    }
    val onDisk: Set[String] = fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath.getName).toSet
    val hasManifest = fs.exists(manifestFile(path))
    val hasTmp = fs.exists(new org.apache.hadoop.fs.Path(s"$path/INDEX.tmp"))
    val versioned = onDisk.exists(n => n.matches(ArtifactRe) && n.contains("_v"))
    if (!hasManifest && versioned && hasTmp)
      add("manifest", "ERROR",
        "INDEX missing with versioned artifacts and INDEX.tmp present — " +
          "crashed flip window; any reader/writer resolve recovers it")
    else if (!hasManifest && versioned)
      add("manifest", "ERROR",
        "INDEX missing with versioned artifacts and NO INDEX.tmp — " +
          "unpublished staging of a crashed first build; re-run build")
    else if (!hasManifest)
      add("manifest", "WARN",
        "pre-manifest legacy layout (bare dirs / pointer files); the " +
          "next maintenance write migrates it")
    // READ-ONLY layout resolution: a crashed flip's INDEX.tmp is PARSED
    // but never re-published here (readLayoutNow would recover it as a
    // side effect — fsck reports, repairs are the named operations')
    val layout: Option[Layout] =
      if (hasManifest)
        scala.util.Try(readManifest(fs, manifestFile(path))).toOption
      else if (hasTmp)
        scala.util.Try(readManifest(fs,
          new org.apache.hadoop.fs.Path(s"$path/INDEX.tmp"))).toOption
      else scala.util.Try(legacyLayout(fs, path)).toOption
    layout match {
      case None =>
        add("manifest", "ERROR", "layout unresolvable — corrupt manifest/pointers")
      case Some(l) =>
        if (hasManifest)
          add("manifest", "OK", s"generation ${l.generation}, " +
            s"${l.retired.size} retired record(s)")
        val missing = l.dirs.filterNot(onDisk.contains)
        if (missing.nonEmpty)
          add("artifacts", "ERROR",
            s"manifest references missing dir(s): ${missing.toSeq.sorted.mkString(",")}")
        else add("artifacts", "OK", s"all ${l.dirs.size} referenced dirs present")
        Seq("CODES", "MODEL").foreach { p =>
          if (hasManifest && fs.exists(new org.apache.hadoop.fs.Path(s"$path/$p")))
            add("pointers", "WARN",
              s"transitional $p pointer file alongside the manifest — " +
                "ignored by readers; the next publish retires it")
        }
        // unreferenced on-disk artifacts: grace-retained vs staging
        val now = System.currentTimeMillis()
        onDisk.filter(n => n.matches(ArtifactRe) && !l.dirs.contains(n))
          .toSeq.sorted.foreach { n =>
            l.retired.get(n) match {
              case Some(ts) => add("orphans", "OK",
                s"$n retired ${(now - ts) / 1000}s ago — grace-retained; vacuum reclaims")
              case None => add("orphans", "WARN",
                s"$n on disk but unreferenced with no retirement record — " +
                  "unpublished staging (crashed writer?); zero-grace vacuum reclaims")
            }
          }
        if (missing.isEmpty) {
          val model = scala.util.Try(loadModelAt(spark, path, l)).toOption
          model match {
            case None => add("model", "ERROR", "model artifacts unreadable")
            case Some(m) =>
              if (m.centroids.length != m.nLists)
                // harmless for serving (probe order reads the centroids
                // themselves) but worth surfacing: Lloyd collapse on a
                // degenerate corpus, or a stale meta
                add("model", "WARN",
                  s"meta names ${m.nLists} lists but ${m.centroids.length} centroids exist")
              else if (m.codebooks.length != m.subspaces ||
                m.codebooks.exists(cb => cb.isEmpty || cb.exists(_._2.size != m.subDim)))
                add("model", "ERROR", "codebook shapes inconsistent with meta")
              else if (m.centroids.exists(_._2.size != m.dim))
                add("model", "ERROR", "centroid dimension inconsistent with meta")
              else if (m.rotation.exists(r =>
                r.length != m.dim || r.exists(_.length != m.dim)))
                add("model", "ERROR", "rotation is not dim x dim")
              else add("model", "OK",
                s"${m.centroids.length} lists, ${m.subspaces}x${m.codebook} codebooks, " +
                  s"dim ${m.dim}${if (m.residual) ", residual" else ""}" +
                  s"${if (m.rotation.nonEmpty) ", OPQ-rotated" else ""}")
              // list partitions vs model cids (directory listing only)
              val codesDir = new org.apache.hadoop.fs.Path(s"$path/${l.codes}")
              val partCids: Set[Int] =
                if (!fs.exists(codesDir)) Set.empty
                else fs.listStatus(codesDir).filter(_.isDirectory)
                  .map(_.getPath.getName)
                  .collect { case s if s.startsWith("cid=") => s.drop(4).toInt }.toSet
              val liveCids = m.centroids.map(_._1).toSet
              val stale = (partCids -- liveCids).toSeq.sorted
              if (stale.nonEmpty)
                add("lists", "WARN",
                  s"partition dir(s) for non-live cid(s) ${stale.mkString(",")} — " +
                    "a crashed split/merge's reclaim half; manifest readers ignore " +
                    "them but raw scans double-count; re-run the op or compact")
              else add("lists", "OK",
                s"${partCids.size} list partition(s), all live " +
                  s"(${(liveCids -- partCids).size} live list(s) currently empty)")
              if (deep) {
                val files = {
                  var nf = 0
                  val it = fs.listFiles(codesDir, true)
                  while (it.hasNext)
                    if (it.next().getPath.getName.endsWith(".parquet")) nf += 1
                  nf
                }
                val perList =
                  if (partCids.isEmpty) 0.0 else files.toDouble / partCids.size
                if (perList > 3.0)
                  add("fragmentation", "WARN",
                    f"$files parquet files over ${partCids.size} lists " +
                      f"($perList%.1f/list) — compact advised")
                else add("fragmentation", "OK",
                  f"$files parquet files over ${partCids.size} lists ($perList%.1f/list)")
                val phys = spark.read.parquet(codesDir.toString)
                  .filter(col("cid").isInCollection(liveCids.toSeq)).count()
                val tomb = tombstoneIds(spark, path, l).map(_.count()).getOrElse(0L)
                if (tomb == 0L) add("tombstones", "OK", s"none ($phys physical rows)")
                else if (tomb * 5 >= phys)
                  add("tombstones", "WARN",
                    s"$tomb tombstoned vs $phys physical rows (>=20%) — compact " +
                      "advised to reclaim")
                else add("tombstones", "OK", s"$tomb tombstoned vs $phys physical rows")
              }
          }
        }
    }
    rows.toSeq.toDF("check", "status", "detail")
  }

  /** Remove ids from the index WITHOUT touching the data-sized codes:
    * the ids land in a versioned tombstone artifact named by the same
    * atomic manifest as everything else, and every manifest-snapshot
    * reader ([[topK]], [[stats]], [[recallCurve]]) anti-joins it — one
    * model-sized write, visible atomically, regardless of corpus size.
    * The physical rows are folded out by the next [[compact]] (which
    * then drops the tombstone set) and by [[split]]/[[merge]] for the
    * lists they rewrite — the delete-heavy pipeline's reclaim rides the
    * maintenance cadence it already runs. This is the removal third of
    * the index lifecycle (reference analogue: bucket `del`,
    * `architxt/bucket/__init__.py`).
    *
    * Delete-then-readd needs NO manual compact: [[append]] folds
    * re-added ids out of the live tombstone set (and their stale
    * physical rows out of the affected lists) in its own pass.
    * Returns the total live tombstone count after this call.
    */
  def delete(
      spark: SparkSession,
      path: String,
      ids: DataFrame,
      idCol: String = "id"): Long = {
    val layout = readLayoutNow(spark, path)
    val newIds = ids.select(col(idCol).cast("long").as("id")).distinct()
    val union = layout.tombstones match {
      case Some(t) =>
        spark.read.parquet(s"$path/$t").select("id").union(newIds).distinct()
      case None => newIds
    }
    val nextName = nextTombstoneDir(spark, path, layout)
    union.write.mode("overwrite").parquet(s"$path/$nextName")
    publishLayout(spark, path, layout.copy(tombstones = Some(nextName)))
    spark.read.parquet(s"$path/$nextName").count()
  }

  /** The next free tombstone artifact name — versioned from the highest
    * tombstones dir ON DISK, not just the live pointer: compact
    * publishes tombstones=None while RETAINING the old set for
    * grace-window readers, so versioning from the pointer alone would
    * regenerate that retained name and overwrite it mid-read.
    */
  private def nextTombstoneDir(
      spark: SparkSession, path: String, layout: Layout): String = {
    val (fs, root) = fsFor(spark, path)
    val maxOnDisk =
      if (!fs.exists(root)) 0
      else fs.listStatus(root).iterator
        .filter(st => st.isDirectory && st.getPath.getName.matches("tombstones(_v\\d+)?"))
        .map(st => dirVersion(st.getPath.getName)).foldLeft(0)(math.max)
    val cur = math.max(maxOnDisk,
      layout.tombstones.map(dirVersion).getOrElse(0))
    s"tombstones_v${cur + 1}"
  }

  /** Convenience overload for a driver-side id list. */
  def delete(spark: SparkSession, path: String, ids: Seq[Long]): Long = {
    import spark.implicits._
    delete(spark, path, ids.toDF("id"), "id")
  }

  /** The tombstone id set of a layout snapshot, if any. */
  private def tombstoneIds(
      spark: SparkSession, path: String, l: Layout): Option[DataFrame] =
    l.tombstones.map(t => spark.read.parquet(s"$path/$t").select("id"))

  /** Anti-join a codes frame against the snapshot's tombstones. The
    * extra join is on the SCAN side of every reader, below the cid
    * filter — Catalyst pushes the partition predicate through the left
    * side of the anti join, so probe pruning is unchanged.
    */
  private def antiTomb(df: DataFrame, tomb: Option[DataFrame]): DataFrame =
    tomb.fold(df)(t => df.join(t, Seq("id"), "left_anti"))

  /** Per-list occupancy of the index: `(cid, n_vectors)`. The serving
    * health metric — a skewed histogram means hot lists dominate probe
    * cost (retrain with more lists, or [[split]] the hot region); scan
    * cost is one count over the codes table's partition column.
    *
    * Consistency: the scan is restricted to the cids of the SAME
    * manifest snapshot's model — the exact discipline [[topK]] uses —
    * so a concurrent split/merge that has appended its new `cid=base`
    * partitions but not yet flipped the manifest cannot double-count
    * the moved members (raw `codesPath` scans outside this method don't
    * get that guarantee and are only consistent outside maintenance
    * windows).
    */
  def stats(spark: SparkSession, path: String): DataFrame = {
    val layout = readLayout(spark, path)
    // only the cid set is needed — skip the codebooks/rotation collects
    // a full model load pays (stats runs repeatedly inside rebalance)
    val live = spark.read.parquet(s"$path/${layout.centroids}")
      .select("cid").collect().map(_.getInt(0)).toSeq
    antiTomb(
      spark.read.parquet(s"$path/${layout.codes}")
        .filter(col("cid").isInCollection(live)),
      tombstoneIds(spark, path, layout))
      .groupBy("cid").agg(count(lit(1)).as("n_vectors"))
  }

  /** The hottest list of the index: max occupancy, ties to the larger
    * cid — the deterministic selection rule the split oracle replays
    * (`ORDER BY n DESC, cid DESC LIMIT 1`).
    */
  def hottestList(spark: SparkSession, path: String): Int =
    stats(spark, path)
      .orderBy(col("n_vectors").desc, col("cid").desc)
      .head.getInt(0)

  /** The coldest `n` lists of the index: min occupancy first, ties to
    * the SMALLER cid — the deterministic selection rule the merge
    * oracle replays (`ORDER BY n ASC, cid ASC LIMIT n`).
    */
  def coldestLists(spark: SparkSession, path: String, n: Int): Seq[Int] =
    stats(spark, path)
      .orderBy(col("n_vectors").asc, col("cid").asc)
      .limit(n).collect().map(_.getInt(0)).toSeq

  /** Merge several under-full inverted lists into one — [[split]]'s
    * inverse, for the other half of [[stats]]' skew histogram: lists too
    * cold to earn their directory-listing cost (at 100 TB, probe cost
    * has a fixed per-list floor — list count hygiene matters both ways).
    *
    * The merged centroid is the count-weighted integer-nano mean of the
    * merged lists' centroids — index-local and deterministic, so the
    * PLAIN layout needs NO raw data: its codes quantize raw vectors and
    * move unchanged (a full-probe query is bit-equal before/after,
    * pinned in AnnIndexSpec). The residual layout re-encodes the merged
    * members against the new centroid with the frozen codebooks, so it
    * needs the raw `corpus` (same convention as [[split]]).
    *
    * Publication mirrors [[split]]: fresh versioned meta/centroids, new
    * list partition appended while unreferenced, atomic manifest
    * flip, old list directories reclaimed last — crash anywhere leaves
    * a serving index, and a re-run for the same cids completes the
    * recovery. Single maintenance writer.
    *
    * Reader contract (split shares it): the model flip is atomic, but
    * the superseded LIST directories are reclaimed immediately after it
    * (they cannot be retained — a full scan of the live codes dir would
    * double-count them). A reader that resolved the OLD model and is
    * still scanning when the reclaim lands can fail its read; resolve
    * per query batch (loadModel is model-sized) and retry on
    * FAILED_READ_FILE, or run maintenance in a quiet window.
    */
  def merge(
      spark: SparkSession,
      path: String,
      cids: Seq[Int],
      corpus: Option[DataFrame] = None,
      idCol: String = "id",
      vecCol: String = "v"): Unit = {
    require(cids.size >= 2 && cids.distinct.size == cids.size,
      s"merge needs >= 2 distinct lists, got $cids")
    graft.functions.GraftFunctions.register(spark)
    val layout = readLayoutNow(spark, path)
    val model = loadModelAt(spark, path, layout)
    val (fs, _) = fsFor(spark, path)
    val codesDir = s"$path/${layout.codes}"
    def listDir(c: Int) = new org.apache.hadoop.fs.Path(s"$codesDir/cid=$c")
    val present = cids.filter(c => model.centroids.exists(_._1 == c))
    if (present.isEmpty) {
      // recovery half: a previous merge of these cids crashed after its
      // pointer flip but before reclaiming the old list directories
      val orphans = cids.map(listDir).filter(fs.exists)
      require(orphans.nonEmpty, s"none of $cids are lists of this index")
      orphans.foreach(fs.delete(_, true))
      return
    }
    require(present.size == cids.size,
      s"lists ${cids.diff(present).mkString(",")} are not lists of this index")
    require(!model.residual || corpus.nonEmpty,
      "residual layout merge needs the raw corpus (codes re-encode against the new centroid)")

    // tombstoned members fold out of the merged list (and out of the
    // merged centroid's weights) exactly as split folds them
    val old = antiTomb(
      spark.read.parquet(codesDir).filter(col("cid").isInCollection(cids)),
      tombstoneIds(spark, path, layout))
    val counts = old.groupBy("cid").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    val base = model.centroids.map(_._1).max + 1
    // count-weighted integer-nano mean of the merged centroids: the
    // same fixed sumNanos/count/1e9 expression as every Lloyd mean, so
    // an oracle can replay it exactly from the stored centroids. The
    // weighted nano sums accumulate in BigInt — a Long caps total merged
    // membership at ~9.2e9 unit-scale members, the exact capacity bound
    // the tiered decimal(20,0) Lloyd accumulators removed (a BigInt that
    // fits in a Long converts to Double bit-identically, so the
    // non-overflowing result is unchanged).
    val totalN = cids.map(c => counts.getOrElse(c, 0L)).sum
    require(totalN > 0, s"merged lists $cids hold no vectors")
    val byCid = model.centroids.toMap
    val newCv: Seq[Double] = (0 until model.dim).map { i =>
      cids.map { c =>
        BigInt(math.round(byCid(c)(i) * 1e9)) * BigInt(counts.getOrElse(c, 0L))
      }.sum.toDouble / totalN / 1e9
    }
    val newCents = Array((base, newCv))

    val newRows =
      if (!model.residual)
        old.select("id", "codes").withColumn("cid", lit(base))
      else {
        val memberIds = old.select("id")
        val members = applyRotation(corpus.get
          .select(col(idCol).cast("long").as("id"),
            col(vecCol).cast("array<double>").as("v")), model.rotation)
          .join(memberIds, "id")
        residualFrame(members, newCents)
          .withColumn("codes",
            array((0 until model.subspaces).map(i =>
              Ann.pqCodeExpr(i, model.subDim, model.codebooks(i))): _*))
          .select("id", "codes", "cid")
      }

    val next = layout.copy(
      meta = nextDir("meta", layout.meta),
      centroids = nextDir("centroids", layout.centroids))
    val updatedCents = model.centroids.filterNot(c => cids.contains(c._1)) ++ newCents
    import spark.implicits._
    Seq((updatedCents.length, model.subspaces, model.subDim, model.dim,
      model.codebook, model.residual))
      .toDF("n_lists", "subspaces", "sub_dim", "dim", "codebook", "residual")
      .write.mode("overwrite").parquet(s"$path/${next.meta}")
    updatedCents.toSeq.toDF("cid", "cv")
      .write.mode("overwrite").parquet(s"$path/${next.centroids}")
    val target = listDir(base)
    if (fs.exists(target)) fs.delete(target, true)
    // for the residual layout this counts members BEFORE the write —
    // a corpus missing raw vectors for some members must fail loudly
    // rather than silently shrink the merged list
    if (model.residual) {
      val n = newRows.count()
      require(n == totalN,
        s"corpus supplies raw vectors for $n of the merged lists' $totalN members")
    }
    newRows.repartition(col("cid"))
      .write.mode("append").partitionBy("cid").parquet(codesDir)
    publishLayout(spark, path, next)
    cids.foreach(c => fs.delete(listDir(c), true))
    // retain the superseded meta/centroids one cycle for in-flight readers
    sweepStale(spark, path,
      keep = next.dirs ++ Set(layout.meta, layout.centroids))
  }

  /** One-call occupancy rebalance: [[split]] every list holding more
    * than `hi ×` the mean into ⌈n/mean⌉ lists, then [[merge]] groups of
    * lists below `lo ×` the (recomputed) mean until each merged group
    * reaches it — the maintenance policy [[stats]]' histogram feeds, as
    * one deterministic pass (hot lists processed by occupancy desc /
    * cid desc; cold groups seeded by occupancy asc / cid asc).
    * Content-lossless like its constituents: plain-layout codes never
    * change, so exhaustive probes are bit-equal before/after; every
    * step publishes through the versioned pointers, so a crash
    * mid-pass leaves a serving index and the next pass completes the
    * work. Returns one row per action: (action, cids, n_before).
    *
    * Merge-group selection (`mergePolicy`): `"nearest"` (default) grows
    * each group from its coldest seed by repeatedly adding the cold
    * list whose centroid is CLOSEST to the group's running
    * count-weighted centroid (the layout's coarse metric — cosine
    * distance for the plain layout, squared L2 for the residual one;
    * ties to the smaller cid). IVF lists are Voronoi cells (Jégou et
    * al. §IV) — merging geometrically neighboring cells keeps the
    * merged centroid inside the region its members occupy, where an
    * occupancy-only pairing of two DISTANT cold cells plants it in
    * empty space and silently degrades probe ordering (codes stay
    * exact either way — the regression is in which lists a bounded
    * probe visits). `"occupancy"` keeps the legacy
    * coldest-runs-in-occupancy-order pairing for comparison; the
    * policy spec constructs exactly the distant-cold-cells fixture
    * where it loses recall and `"nearest"` does not.
    *
    * Recall gate: pass `recallQueries` (a query sample sharing
    * `idCol`/`vecCol` with `corpus`) and the pass measures
    * recall@`recallProbe` via [[recallCurve]] before and after; if the
    * pass degraded it by more than `maxRecallLossPpm` parts-per-million
    * it FAILS LOUDLY (IllegalStateException) instead of letting the
    * quality regression ship silently. The index content is lossless
    * either way — on a gate failure, split the merged groups back
    * apart or rebuild to restore probe ordering.
    *
    * `dryRun = true` computes and returns the full action plan —
    * identical selection logic, identical ordering — without executing
    * a single split/merge (and without touching the recall gate): the
    * operational "what would this pass do" preview to review before a
    * maintenance window. Note the plan's later actions are computed
    * against PRE-PASS occupancy snapshots where a live pass would
    * recompute after its splits, so a plan with splits approximates the
    * merge half.
    */
  def rebalance(
      spark: SparkSession,
      path: String,
      corpus: DataFrame,
      idCol: String = "id",
      vecCol: String = "v",
      hi: Double = 2.0,
      lo: Double = 0.5,
      mergePolicy: String = "nearest",
      recallQueries: Option[DataFrame] = None,
      recallProbe: Int = 4,
      recallK: Int = 5,
      recallRerank: Int = 0,
      maxRecallLossPpm: Long = 0L,
      dryRun: Boolean = false): DataFrame = {
    require(hi > 1.0 && lo < 1.0 && lo > 0.0, s"need lo < 1 < hi, got lo=$lo hi=$hi")
    require(mergePolicy == "nearest" || mergePolicy == "occupancy",
      s"mergePolicy must be nearest|occupancy, got $mergePolicy")
    val actions = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[Int], Long)]

    def occupancy(): Seq[(Int, Long)] =
      stats(spark, path).collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    def recallAt(): Long = recallCurve(spark, path, recallQueries.get,
      idCol, vecCol, corpus, idCol, vecCol, Seq(recallProbe),
      k = recallK, rerank = recallRerank).collect().head.getLong(1)

    val recallBefore = if (dryRun) None else recallQueries.map(_ => recallAt())

    val occ0 = occupancy()
    val mean0 = occ0.map(_._2).sum.toDouble / occ0.size
    val hot = occ0.filter(_._2 > hi * mean0)
      .sortBy { case (c, n) => (-n, -c) }
    hot.foreach { case (c, n) =>
      val k = math.max(2, math.round(n / mean0).toInt)
      if (!dryRun) split(spark, path, c, k, corpus, idCol, vecCol)
      actions += (("split", Seq(c), n))
    }

    val occ1 = occupancy()
    val mean1 = occ1.map(_._2).sum.toDouble / occ1.size
    val cold = occ1.filter(_._2 < lo * mean1)
      .sortBy { case (c, n) => (n, c) }

    def doMerge(group: Seq[(Int, Long)]): Unit = {
      if (!dryRun) merge(spark, path, group.map(_._1), Some(corpus), idCol, vecCol)
      actions += (("merge", group.map(_._1), group.map(_._2).sum))
    }

    if (mergePolicy == "occupancy") {
      // legacy pairing: coldest runs in occupancy order, blind to geometry
      var group = Vector.empty[(Int, Long)]
      def flush(): Unit = { if (group.size >= 2) doMerge(group); group = Vector.empty }
      cold.foreach { cn =>
        group :+= cn
        if (group.map(_._2).sum >= mean1) flush()
      }
      flush()
    } else {
      // proximity-aware pairing over the PRE-MERGE model snapshot (every
      // cold cid appears in at most one group, so the snapshot stays
      // valid across the pass's own merges)
      val model = loadModel(spark, path)
      val cents: Map[Int, Seq[Double]] = model.centroids.toMap
      def dist(a: Seq[Double], b: Seq[Double]): Double =
        if (model.residual) {
          var s = 0.0; var i = 0
          while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
          s
        } else {
          var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < a.length) {
            dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
          }
          val denom = math.sqrt(na) * math.sqrt(nb)
          if (denom == 0.0) 2.0 else 1.0 - dot / denom
        }
      val pool = scala.collection.mutable.LinkedHashMap(cold: _*)
      while (pool.size >= 2) {
        val (seed, seedN) = pool.head
        pool.remove(seed)
        var group = Vector((seed, seedN))
        var gc: Array[Double] = cents(seed).toArray
        var gn: Long = seedN
        while (gn < mean1 && pool.nonEmpty) {
          val (next, nextN) = pool.minBy { case (c, _) => (dist(gc, cents(c)), c) }
          pool.remove(next)
          group :+= ((next, nextN))
          val cv = cents(next)
          val tot = (gn + nextN).toDouble
          var i = 0
          while (i < gc.length) { gc(i) = (gc(i) * gn + cv(i) * nextN) / tot; i += 1 }
          gn += nextN
        }
        if (group.size >= 2) doMerge(group)
      }
    }

    import spark.implicits._
    val out = actions.toSeq.toDF("action", "cids", "n_before")
    recallBefore.foreach { before =>
      val after = recallAt()
      if (before - after > maxRecallLossPpm)
        throw new IllegalStateException(
          s"rebalance degraded recall@$recallProbe from ${before}ppm to " +
            s"${after}ppm (loss > $maxRecallLossPpm ppm). The landed pass is " +
            "content-lossless (exhaustive probes unchanged) — split the " +
            "merged groups back apart or rebuild to restore probe ordering.")
    }
    out
  }

  /** Split one over-full inverted list into `k` new lists — the
    * maintenance move [[stats]]' skew histogram calls for when a hot
    * region dominates probe cost. Re-runs Lloyd WITHIN the list only
    * (same deterministic protocol as the coarse trainer: first-k-by-id
    * init, `iters` rounds, order-independent integer-nano means, under
    * the layout's coarse metric), assigns the members among the `k` new
    * centroids `maxCid+1 … maxCid+k`, and rewrites ONLY that list's
    * partitions — the rest of the corpus is untouched, which is the
    * point at 100 TB.
    *
    * PQ codes are frozen: in the plain layout they quantize raw vectors,
    * so the stored codes move to their new list UNCHANGED (a full-probe
    * query is bit-equal before/after — pinned in AnnIndexSpec); in the
    * residual layout codes are re-encoded against the new centroids
    * with the same frozen codebooks (`build`'s exact encode expression).
    *
    * `corpus` supplies the raw vectors for the list's members (codes
    * are lossy — same convention as [[topK]]'s `exact` re-rank frame);
    * the members are located by an id join against ONE pruned codes
    * partition, never a corpus-wide recompute.
    *
    * Publication order makes every step reader-safe and crash
    * recoverable: (1) the updated meta+centroids land in fresh
    * `meta_v{N}`/`centroids_v{N}` dirs; (2) the new list partitions are
    * appended (invisible — no live centroid references them); (3) the
    * manifest flips atomically; (4) the old list directory is
    * reclaimed. A reader resolves either the old model (probing the old
    * list, still on disk through step 3) or the new one (probing only
    * the new lists). A crash before (3) leaves the index exactly as it
    * was; a crash between (3) and (4) leaves an orphan directory that a
    * re-run of `split` for the same cid reclaims. Single maintenance
    * writer, like [[append]]/[[compact]].
    */
  def split(
      spark: SparkSession,
      path: String,
      cid: Int,
      k: Int,
      corpus: DataFrame,
      idCol: String = "id",
      vecCol: String = "v",
      iters: Int = 2): Unit = {
    require(k >= 2, s"split needs k >= 2 target lists, got $k")
    graft.functions.GraftFunctions.register(spark)
    val layout = readLayoutNow(spark, path)
    val model = loadModelAt(spark, path, layout)
    val (fs, _) = fsFor(spark, path)
    val codesDir = s"$path/${layout.codes}"
    val oldListDir = new org.apache.hadoop.fs.Path(s"$codesDir/cid=$cid")
    if (!model.centroids.exists(_._1 == cid)) {
      // recovery half: a previous split of this cid crashed after its
      // pointer flip but before reclaiming the old list directory
      require(fs.exists(oldListDir), s"cid $cid is not a list of this index")
      fs.delete(oldListDir, true)
      return
    }
    // tombstoned members fold out here: they neither move to the new
    // lists nor need raw vectors from the corpus
    val memberIds = antiTomb(
      spark.read.parquet(codesDir).filter(col("cid") === cid),
      tombstoneIds(spark, path, layout)).select("id", "codes")
    // the within-list re-Lloyd, reassignment, and (residual) re-encode
    // all happen in the index's space — rotate the supplied raw vectors
    // first, exactly as build/append encode them
    val members = applyRotation(corpus
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v")), model.rotation)
      .join(memberIds.select("id"), "id")
      .cache()
    try {
      val nList = memberIds.count()
      val nMembers = members.count()
      require(nMembers == nList,
        s"corpus supplies raw vectors for $nMembers of the list's $nList members " +
          "— split needs every one (codes are lossy)")
      require(nMembers >= k, s"list $cid holds $nMembers vectors, cannot split into $k")

      val sub =
        if (model.residual) Ann.lloydCentroidsL2(members, k, iters)
        else Ann.lloydCentroids(members, k, iters, k <= Ann.maxUnrolled(spark))
      val base = model.centroids.map(_._1).max + 1
      val newCents = sub.map { case (i, cv) => (base + i, cv) }

      val newRows =
        if (model.residual)
          // residuals move with the centroid: re-encode v − newCentroid
          // under the frozen codebooks (build's exact encode expression)
          residualFrame(members, newCents)
            .withColumn("codes",
              array((0 until model.subspaces).map(i =>
                Ann.pqCodeExpr(i, model.subDim, model.codebooks(i))): _*))
            .select("id", "codes", "cid")
        else {
          // plain layout: codes quantize raw vectors — they move UNCHANGED,
          // only the list assignment is recomputed
          val reassigned = Ann.assignToCentroids(members, newCents,
            newCents.length <= Ann.maxUnrolled(spark)).select("id", "cid")
          memberIds.join(reassigned, "id").select("id", "codes", "cid")
        }

      // (1) stage the updated model in a fresh version
      val next = layout.copy(
        meta = nextDir("meta", layout.meta),
        centroids = nextDir("centroids", layout.centroids))
      val updatedCents = model.centroids.filterNot(_._1 == cid) ++ newCents
      import spark.implicits._
      Seq((updatedCents.length, model.subspaces, model.subDim, model.dim,
        model.codebook, model.residual))
        .toDF("n_lists", "subspaces", "sub_dim", "dim", "codebook", "residual")
        .write.mode("overwrite").parquet(s"$path/${next.meta}")
      updatedCents.toSeq.toDF("cid", "cv")
        .write.mode("overwrite").parquet(s"$path/${next.centroids}")
      // (2) new list partitions (reclaiming any crash leftovers first —
      // a rerun after a crash here must not double-append)
      newCents.foreach { case (c, _) =>
        val d = new org.apache.hadoop.fs.Path(s"$codesDir/cid=$c")
        if (fs.exists(d)) fs.delete(d, true)
      }
      newRows.repartition(col("cid"))
        .write.mode("append").partitionBy("cid").parquet(codesDir)
      // (3) atomic flip; (4) reclaim; retain the previous model version
      // one cycle for in-flight readers (like compact's codes retention)
      publishLayout(spark, path, next)
      fs.delete(oldListDir, true)
      sweepStale(spark, path,
        keep = next.dirs ++ Set(layout.meta, layout.centroids))
    } finally members.unpersist()
  }

  /** Continuous ingest: run [[append]] on every micro-batch of a
    * streaming vector source. The model stays frozen (loaded once per
    * batch from the index — cheap, model-sized) and each batch lands as
    * one encode scan + partitioned append; run [[compact]] on your
    * maintenance cadence. The returned query is started; the caller
    * owns its lifecycle.
    */
  def appendStream(
      stream: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      checkpoint: String,
      compactEvery: Int = 0): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          append(batch, idCol, vecCol, path)
          // in-line maintenance cadence: every Nth micro-batch folds the
          // accumulated per-batch fragments back to one file per list —
          // the file-count growth of continuous ingest stays bounded by
          // the cadence instead of the stream's lifetime. Safe here
          // because foreachBatch serializes with the appends (single
          // maintenance writer by construction) and compact publishes
          // through the manifest, so concurrent READERS stay correct.
          if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
            compact(batch.sparkSession, path)
            ()
          }
        }
      }
      .start()

  /** Load the driver-side model (meta + centroids + codebooks — all
    * model-sized; the compressed corpus stays on disk).
    */
  def loadModel(spark: SparkSession, path: String): Model =
    loadModelAt(spark, path, readLayout(spark, path))

  /** O(model) driver-side cache of loaded models, keyed by the layout's
    * versioned artifact directories plus the meta dir's modification
    * time. Every maintenance op stages a NEW versioned generation and
    * publishes via the manifest flip — artifacts are immutable once
    * published — so a key can never serve stale content; the mtime
    * guards the one path around that invariant (an index directory
    * deleted outright and rebuilt from scratch restarts its version
    * numbering). Serving a query batch otherwise paid four small Spark
    * jobs (meta/centroids/codebooks/rotation reads) per call.
    */
  private val modelCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, String, String), Model](64, 0.75f, true) {
      // true LRU (access-ordered) capped at 64 — the old size>64 clear()
      // flushed every resident model on the 65th insert
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String, String), Model]): Boolean = size() > 64
    })

  private def loadModelAt(spark: SparkSession, path: String, l: Layout): Model = {
    val (fs, _) = fsFor(spark, path)
    // rebuild nonce: the meta dir's FILE listing (name:length:mtime).
    // Parquet part files carry a fresh write-UUID in their names, so an
    // index deleted and rebuilt from scratch at the same path — which
    // restarts version numbering and can land inside one mtime tick —
    // still changes this signature. (Published generations themselves
    // are immutable by the manifest-flip discipline.)
    val metaSig = scala.util.Try(
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/${l.meta}"))
        .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
        .sorted.mkString(",")).getOrElse("?")
    val key = (path,
      s"${l.meta}|${l.centroids}|${l.codebooks}|${l.rotation.getOrElse("")}", metaSig)
    val hit = modelCache.get(key)
    if (hit != null) hit
    else {
      val m = loadModelUncached(spark, path, l)
      modelCache.put(key, m)
      m
    }
  }

  private def loadModelUncached(spark: SparkSession, path: String, l: Layout): Model = {
    val meta = spark.read.parquet(s"$path/${l.meta}").head
    val cents = spark.read.parquet(s"$path/${l.centroids}").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
    val cbRows = spark.read.parquet(s"$path/${l.codebooks}").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
    val subspaces = meta.getAs[Int]("subspaces")
    val cbs = (0 until subspaces).map { m =>
      cbRows.filter(_._1 == m).map { case (_, cid, cv) => (cid, cv) }.sortBy(_._1)
    }.toArray
    val rotation = l.rotation.map { rDir =>
      spark.read.parquet(s"$path/$rDir").collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).sortBy(_._1).map(_._2)
    }
    Model(
      nLists = meta.getAs[Int]("n_lists"),
      subspaces = subspaces,
      subDim = meta.getAs[Int]("sub_dim"),
      dim = meta.getAs[Int]("dim"),
      codebook = meta.getAs[Int]("codebook"),
      residual = meta.schema.fieldNames.contains("residual") &&
        meta.getAs[Boolean]("residual"),
      centroids = cents,
      codebooks = cbs,
      rotation = rotation)
  }

  /** Query a persisted index without retraining anything: load the
    * model, compute each query's integer nano-unit ADC distance table
    * and probe set driver-side, then scan ONLY the probed `codes/`
    * partitions. Same semantics as [[Ann.ivfAdcTopK]] from the probe
    * onward — including the self-exclusion (`id =!= query_id`), the
    * null-ADC filter, and the (adc asc, neighbor_id asc) tie-break —
    * so `nProbe = nLists` reproduces [[Ann.pqTopK]] exactly.
    *
    * `queries` carries the query vectors (any frame with an id and a
    * vector column — the corpus itself filtered to the query ids, or an
    * external batch). With `rerank > 0`, `exact` must supply raw
    * vectors for the shortlist re-rank (the corpus the index was built
    * from); the compressed scan then only shortlists `rerank`
    * candidates and exact cosine picks the final `k`.
    *
    * FILTERED search: `allow` restricts CANDIDATES (not queries) to an
    * id set — "nearest neighbors among documents passing this
    * predicate", the production shape where ANN composes with metadata
    * filters. It joins the scan side exactly like the tombstone
    * deny-list (left-semi vs left-anti — the partition filter pushes
    * through both), so cost is one membership join, never a rebuild or
    * a post-hoc shrunken top-k; ADC ranking within the allowed set is
    * bit-identical to the unfiltered ranking restricted to it (pinned
    * in spec). A tombstoned id stays excluded even if allowed.
    * PROBE WIDTH under selective filters: the unfiltered recall gate
    * does not transfer — a selective allow-list pushes the nearest
    * ALLOWED neighbors outside the top probed cells (measured: 1%
    * selectivity at nProbe=4/16 reads recall 0.5–0.7 vs
    * within-allowed brute force; BASELINE.md round-15 canary). When
    * the filter keeps less than ~1/nLists of the corpus, probe at or
    * near full width: the semi-join already shrank the scan, so full
    * probing costs what a narrow unfiltered probe costs and restores
    * recall 1.0 there.
    *
    * `withRank = true` adds the per-query `rank` column (1 = nearest;
    * the ADC rank, or the exact-rerank rank when `rerank > 0`) — the
    * shape rank-fusion consumers ([[Hybrid.retrieveIndexed]]) need.
    */
  def topK(
      spark: SparkSession,
      path: String,
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      k: Int = 5,
      nProbe: Int = 4,
      rerank: Int = 0,
      exact: Option[DataFrame] = None,
      exactIdCol: String = "id",
      exactVecCol: String = "v",
      allow: Option[DataFrame] = None,
      allowIdCol: String = "id",
      withRank: Boolean = false): DataFrame = {
    def finalSelect(df: DataFrame): DataFrame =
      if (withRank) df.select("query_id", "neighbor_id", "rank")
      else df.select("query_id", "neighbor_id")
    require(rerank <= 0 || exact.nonEmpty,
      "rerank > 0 needs the raw-vector frame (exact=...) for the final ranking")
    graft.functions.GraftFunctions.register(spark)
    // ONE manifest snapshot supplies both the model and the codes dir,
    // so a maintenance flip between the two reads cannot mix epochs
    val layout = readLayout(spark, path)
    val model = loadModelAt(spark, path, layout)

    val qSel = queries
      .select(col(qidCol).cast("long").as("id"),
        col(qvecCol).cast("array<double>").as("v"))
    // adaptive: batches up to the localDtMaxQueries threshold prepare
    // distance tables driver-side (ONE broadcast, the reference-shaped
    // pattern); larger batches — the 1M-query serving case — prepare
    // them as executor-side columns so driver state stays O(model).
    // The threshold probe is the decision AND the data: one limit-k+1
    // collect, reused as the driver path's query rows.
    val localMax = Ann.localDtMaxQueries(spark)
    val head =
      if (localMax < 0) Array.empty[org.apache.spark.sql.Row]
      else qSel.limit(localMax + 1).collect()
    val useLocal = localMax >= 0 && head.length <= localMax

    val codes0 = antiTomb(
      spark.read.parquet(s"$path/${layout.codes}"),
      tombstoneIds(spark, path, layout))
    val codes = allow.fold(codes0)(a => codes0.join(
      a.select(col(allowIdCol).cast("long").as("id")).distinct(),
      Seq("id"), "left_semi"))
    val w = Window.partitionBy("query_id").orderBy(col("adc").asc, col("neighbor_id").asc)
    val w2 = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)

    if (useLocal) {
      val qRows = head.map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
      if (qRows.isEmpty)
        return finalSelect(spark.range(0)
          .select(col("id").as("query_id"), col("id").as("neighbor_id"),
            col("id").cast("int").as("rank")))
      qRows.foreach { case (qid, qv) =>
        require(qv.size == model.dim,
          s"query $qid has dim ${qv.size}, index expects ${model.dim}")
      }
      // distance tables and probes live in the index's (possibly OPQ-
      // rotated) space; the exact re-rank below stays in the RAW space,
      // where the caller's `exact` corpus lives (cosine is rotation-
      // invariant, so the semantics agree)
      val qRowsIdx = model.rotation.fold(qRows)(r =>
        qRows.map { case (qid, qv) => (qid, rotateVec(r, qv)) })
      // plain layout: ONE distance table per query (codes quantize raw
      // vectors), shipped as (query_id, dt, probe) rows with a per-pair
      // probe-membership check. Residual layout: one table per (query,
      // probed list) — dt depends on the list's centroid — shipped as
      // (query_id, cid, dt) rows, so the probe restriction is the
      // broadcast equi-join on cid itself.
      // Either way the union of probed lists is a plain `cid IN (...)` on
      // the scan — against the partitionBy("cid") layout that prunes at
      // directory level (the plan's PartitionFilters, pinned in
      // AnnIndexSpec).
      val scored = (if (!model.residual) {
        val perQuery = qRowsIdx.toSeq.map { case (qid, qv) =>
          (qid,
            Ann.nanoDistanceTable(qv, model.codebooks, model.subspaces, model.subDim),
            Ann.probeOrder(model.centroids, qv, nProbe))
        }
        val qTable = {
          import spark.implicits._
          perQuery.toDF("query_id", "dt", "probe")
        }
        val allProbed = perQuery.flatMap(_._3).distinct
        codes
          .filter(col("cid").isInCollection(allProbed))
          .crossJoin(broadcast(qTable))
          .filter(array_contains(col("probe"), col("cid")) && col("id") =!= col("query_id"))
      } else {
        val centMap = model.centroids.toMap
        val perQL = qRowsIdx.toSeq.flatMap { case (qid, qv) =>
          Ann.probeOrderL2(model.centroids, qv, nProbe).map { cidL =>
            val cL = centMap(cidL)
            val qr: Seq[Double] = (0 until model.dim).map(i => qv(i) - cL(i))
            (qid, cidL,
              Ann.nanoDistanceTable(qr, model.codebooks, model.subspaces, model.subDim))
          }
        }
        val qTable = {
          import spark.implicits._
          perQL.toDF("query_id", "cid", "dt")
        }
        val allProbed = perQL.map(_._2).distinct
        codes
          .filter(col("cid").isInCollection(allProbed))
          .join(broadcast(qTable), "cid")
          .filter(col("id") =!= col("query_id"))
      })
        .select(col("query_id"), col("id").as("neighbor_id"),
          Ann.adcColExpr(model.subspaces).as("adc"))
        .filter(col("adc").isNotNull)
      val shortlisted = scored
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= math.max(k, rerank))
        .select("query_id", "neighbor_id", "rank")

      if (rerank <= 0) finalSelect(shortlisted.filter(col("rank") <= k))
      else {
        val corpus = exact.get.select(
          col(exactIdCol).cast("long").as("id"),
          col(exactVecCol).cast("array<double>").as("v"))
        val qMapLit = typedLit(qRows.toMap)
        finalSelect(corpus
          .join(broadcast(shortlisted.select("query_id", "neighbor_id")),
            col("id") === col("neighbor_id"))
          .withColumn("sim", Ann.cosine(element_at(qMapLit, col("query_id")), col("v")))
          .withColumn("rank", row_number().over(w2))
          .filter(col("rank") <= k))
      }
    } else {
      // LARGE-BATCH serving path: same semantics, distance tables and
      // probe sets computed as columns over the query frame, probe
      // restriction as an equi-join on cid. The only driver-sided piece
      // is the DISTINCT probed-cid set (bounded by nLists) for the
      // partition-pruning predicate. Bit-equal to the driver path,
      // pinned by the equivalence spec.
      val qFrame = qSel.select(col("id").as("query_id"),
        Ann.dimGuard(col("v"), col("id"), model.dim).as("qv"))
      // dt/probe computation happens in the index's (possibly OPQ-
      // rotated) space; the rerank below joins the RAW qFrame against
      // the caller's raw `exact` corpus
      val qIdx = model.rotation.fold(qFrame) { r =>
        val rLit = typedLit(r.map(_.toSeq).toSeq).cast("array<array<double>>")
        qFrame.withColumn("qv", graft.functions.GraftFunctions.matVec(rLit, col("qv")))
      }
      val ql = if (!model.residual) {
        // dt computed BEFORE the probe explode: one table per query row,
        // duplicated (not recomputed) per probed list by the generator
        qIdx.select(col("query_id"),
          Ann.dtColExpr(model.codebooks, model.subDim, col("qv")).as("dt"),
          explode(Ann.probeColExpr(model.centroids, nProbe, col("qv"))).as("cid"))
      } else {
        val centMapLit = typedLit(model.centroids.toMap)
        qIdx
          .select(col("query_id"), col("qv"),
            explode(Ann.probeColExprL2(model.centroids, nProbe, col("qv"))).as("cid"))
          .withColumn("qr",
            zip_with(col("qv"), element_at(centMapLit, col("cid")), (x, c) => x - c))
          .select(col("query_id"), col("cid"),
            Ann.dtColExpr(model.codebooks, model.subDim, col("qr")).as("dt"))
      }
      val allProbed = ql.select("cid").distinct().collect().map(_.getInt(0)).toSeq
      val scored = codes
        .filter(col("cid").isInCollection(allProbed))
        .join(ql, Seq("cid"))
        .filter(col("id") =!= col("query_id"))
        .select(col("query_id"), col("id").as("neighbor_id"),
          Ann.adcColExpr(model.subspaces).as("adc"))
        .filter(col("adc").isNotNull)
      val shortlisted = scored
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= math.max(k, rerank))
        .select("query_id", "neighbor_id", "rank")

      if (rerank <= 0) finalSelect(shortlisted.filter(col("rank") <= k))
      else {
        val corpus = exact.get.select(
          col(exactIdCol).cast("long").as("id"),
          col(exactVecCol).cast("array<double>").as("v"))
        finalSelect(corpus
          .join(shortlisted.select("query_id", "neighbor_id"),
            col("id") === col("neighbor_id"))
          .join(qFrame, Seq("query_id"))
          .withColumn("sim", Ann.cosine(col("qv"), col("v")))
          .withColumn("rank", row_number().over(w2))
          .filter(col("rank") <= k))
      }
    }
  }

  /** [[topK]] with the maintenance-race reader contract folded in: the
    * result is MATERIALIZED under one layout resolution, and if a
    * concurrent split/merge/vacuum reclaims a directory mid-scan
    * (surfacing as a FAILED_READ_FILE / file-not-found failure), the
    * whole query re-resolves the manifest and re-executes — up to
    * `attempts` times, after which the last failure propagates. Every
    * failure mode that is NOT a reclaimed-read (bad dims, missing
    * index, genuine IO trouble) propagates immediately.
    *
    * The returned frame is never a lazy plan over index files — a lazy
    * plan re-executed after a later maintenance flip is exactly the
    * race this wrapper exists to close. Query batches at or below the
    * `spark.graft.ann.localDtMaxQueries` threshold materialize as a
    * driver-local relation (k rows per query); larger batches — the
    * serving case topK's executor-side path exists for — materialize
    * via an eager localCheckpoint so driver state stays O(model).
    */
  def topKRetrying(
      spark: SparkSession,
      path: String,
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      k: Int = 5,
      nProbe: Int = 4,
      rerank: Int = 0,
      exact: Option[DataFrame] = None,
      exactIdCol: String = "id",
      exactVecCol: String = "v",
      allow: Option[DataFrame] = None,
      allowIdCol: String = "id",
      attempts: Int = 5,
      withRank: Boolean = false): DataFrame = {
    require(attempts >= 1, s"attempts must be >= 1, got $attempts")
    val localMax = Ann.localDtMaxQueries(spark)
    val smallBatch = localMax >= 0 &&
      queries.limit(localMax + 1).count() <= localMax
    var attempt = 0
    while (true) {
      attempt += 1
      try {
        val out = topK(spark, path, queries, qidCol, qvecCol, k, nProbe,
          rerank, exact, exactIdCol, exactVecCol, allow, allowIdCol, withRank)
        if (smallBatch) {
          val rows = out.collect()
          return spark.createDataFrame(
            spark.sparkContext.parallelize(rows.toIndexedSeq, 1), out.schema)
        } else {
          // executor-side materialization: computes NOW (a reclaim
          // mid-compute throws here and is retried), and the returned
          // frame reads cached blocks, not index files
          return out.localCheckpoint(true)
        }
      } catch {
        case e: Throwable if attempt < attempts && isReclaimedRead(e) =>
          Thread.sleep(50L * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Does this failure look like a read of a directory a maintenance
    * flip reclaimed? Walks the cause chain — Spark wraps the worker's
    * FileNotFoundException in SparkException layers whose error class
    * is FAILED_READ_FILE. Every retryable class — file-level failures
    * (FAILED_READ_FILE, task FileNotFoundException, the
    * ChecksumFileSystem .crc rename window) AND path-does-not-exist
    * failures — must ALSO name a VERSIONED artifact directory: only
    * versioned index artifacts are ever reclaimed by a flip, so a
    * permanently missing caller-supplied frame (a queries/exact/allow
    * parquet deleted mid-run) and a missing index root both propagate
    * on the first failure instead of re-paying the full query
    * `attempts` times.
    */
  private val VersionedDirRe =
    (".*(codes|meta|centroids|codebooks|rotation|tombstones)_v\\d+.*").r
  private def isReclaimedRead(e: Throwable): Boolean = {
    var anyNamesIndex = false
    var anyTypedFileLevel = false
    var t: Throwable = e
    var depth = 0
    while (t != null && depth < 20) {
      val m = Option(t.getMessage).getOrElse("")
      val flat = m.replace('\n', ' ')
      val namesIndex = VersionedDirRe.matches(flat)
      anyNamesIndex ||= namesIndex
      // a TYPED FileNotFoundException/ChecksumException may be wrapped
      // with a null or pathless message on its own frame (e.g. a codec
      // layer re-throws without the path) — it is still retryable as
      // long as ANY frame in the chain names a versioned dir
      anyTypedFileLevel ||= t.isInstanceOf[java.io.FileNotFoundException] ||
        t.isInstanceOf[org.apache.hadoop.fs.ChecksumException]
      val fileLevel =
        m.contains("FAILED_READ_FILE") || m.contains("FileNotFoundException") ||
        m.contains("Checksum error")
      val pathMissing =
        m.contains("PATH_NOT_FOUND") || m.contains("does not exist")
      if ((fileLevel || pathMissing) && namesIndex) return true
      t = t.getCause
      depth += 1
    }
    anyTypedFileLevel && anyNamesIndex
  }
}
