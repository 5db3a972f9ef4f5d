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
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable => Some(e.toString.linesIterator.next().take(200)) }
      val secs = (System.nanoTime() - t0) / 1e9
      (name, if (err.isEmpty) secs else -1.0, err)
    }

    val qs = results.map { case (k, v, _) => graft.util.Json.quote(k) + ":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) =>
      graft.util.Json.quote(k) + ":" + graft.util.Json.quote(e)
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":${graft.util.Json.quote(sfDir)}}"""
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
