package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. A query that throws is recorded under "errors"
  * with -1 in "queries" so broken queries can never masquerade as fast
  * ones.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // optional comma-separated subset for local iteration; unset = all
    val only = SparkEntry.querySubset()

    def time(name: String): (Double, Option[String]) = {
      val t0 = System.nanoTime()
      val err =
        try { SparkEntry.queries(name)(spark, sfDir).count(); None }
        catch { case e: Throwable => Some(e.toString.linesIterator.next().take(200)) }
      (if (err.isEmpty) (System.nanoTime() - t0) / 1e9 else -1.0, err)
    }

    // same-run CONTROL lane, executed FIRST: a fixed cheap query whose
    // time moves with host noise (CPU steal, cold page cache) but not
    // with any code under test. Per-query ratios against it let a
    // reviewer adjudicate "lane got slower" vs "host was slow" from the
    // artifact itself instead of re-running (the round-12 calm-bench
    // protocol, emitted by default).
    val controlName = "ann_topk_brute"
    val controlSec: Double =
      if (!SparkEntry.queries.contains(controlName)) -1.0
      else {
        // first execution absorbs JVM/codegen warm-up (measured 8×
        // slower than warm) — discard it and take the second as the
        // steady-state control, which also warms the suite uniformly
        time(controlName)
        time(controlName)._1
      }

    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, _) =>
        val (secs, err) = time(name)
        (name, secs, err)
      }

    val qs = results.map { case (k, v, _) => graft.util.Json.quote(k) + ":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val ratios =
      if (controlSec <= 0) "{}"
      else results.collect { case (k, v, None) =>
        graft.util.Json.quote(k) + ":" + f"${v / controlSec}%.3f"
      }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) =>
      graft.util.Json.quote(k) + ":" + graft.util.Json.quote(e)
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    val control =
      s"""{"name":${graft.util.Json.quote(controlName)},"sec":${f"$controlSec%.3f"}}"""
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"control":$control,"ratios":$ratios,"errors":$errs,"sf":${graft.util.Json.quote(sfDir)}}"""
    println(line)
    // stdout tail-capture has truncated this (long) line before, losing
    // the parsed totals — persist a copy so the full timing map is
    // always recoverable from disk
    val copy = sys.env.getOrElse("SPARK_GRAFT_BENCH_FILE", "BENCH_LAST.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(copy), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
