package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev aid for the optimization rounds: dump `.explain("formatted")` of
  * each named query's result frame to `<outDir>/<name>_<tag>.txt`, so
  * plan-shape claims (Exchange counts, join strategies, PushedFilters)
  * are checkable without running Spark. Queries whose result is a
  * driver-side composite (gates, collected curves) show the final tiny
  * plan; the interesting plans for those live in the operator itself and
  * are captured by the focused runners instead.
  *
  * Usage: runMain graft.Plans <sfDir> <outDir> <tag> <q1,q2,...>
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, tag, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), plan)
      println(s"[plans] wrote $outDir/${name}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
