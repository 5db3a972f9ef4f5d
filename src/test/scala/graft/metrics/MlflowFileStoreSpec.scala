package graft.metrics

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

class MlflowFileStoreSpec extends AnyFunSuite {

  private def newStore() = {
    val root = Files.createTempDirectory("mlruns").toString
    (root, new MlflowFileStoreSink(root, experimentName = "exp", runName = "r1"))
  }

  test("creates the mlruns file-store layout") {
    val (root, sink) = newStore()
    val expMeta = Files.readString(java.nio.file.Paths.get(root, "0", "meta.yaml"))
    assert(expMeta.contains("experiment_id: 0"))
    assert(expMeta.contains("name: 'exp'"))
    assert(expMeta.contains("lifecycle_stage: active"))
    val runMeta = Files.readString(sink.runDirectory.resolve("meta.yaml"))
    assert(runMeta.contains("status: RUNNING"))
    assert(runMeta.contains(s"run_id: ${sink.runDirectory.getFileName}"))
    assert(Files.readString(sink.runDirectory.resolve("tags/mlflow.runName")) == "r1")
  }

  test("metric history appends '<ts> <value> <step>' lines per step") {
    val (_, sink) = newStore()
    sink.logMetrics(0, Map("schema.overlap" -> 0.25, "nodes.count" -> 10.0))
    sink.logMetrics(1, Map("schema.overlap" -> 0.5))
    val lines = Files.readAllLines(
      sink.runDirectory.resolve("metrics/schema.overlap")).asScala
    assert(lines.size == 2)
    val Array(ts, v, step) = lines.head.split(" ")
    assert(ts.toLong > 0 && v.toDouble == 0.25 && step.toInt == 0)
    assert(lines(1).endsWith(" 0.5 1"))
    assert(Files.exists(sink.runDirectory.resolve("metrics/nodes.count")))
  }

  test("params, artifacts, and end_run stamping") {
    val (_, sink) = newStore()
    sink.logParams(Map("tau" -> "0.7"))
    sink.logText("debug/0/schema.txt", "ROOT -> A;")
    assert(Files.readString(sink.runDirectory.resolve("params/tau")) == "0.7")
    assert(Files.readString(
      sink.runDirectory.resolve("artifacts/debug/0/schema.txt")) == "ROOT -> A;")
    sink.endRun()
    val meta = Files.readString(sink.runDirectory.resolve("meta.yaml"))
    assert(meta.contains("status: FINISHED"))
    assert(!meta.contains("end_time: null"))
    intercept[IllegalArgumentException](sink.logMetrics(2, Map("x" -> 1.0)))
  }

  test("rejects path-escaping keys and artifact paths") {
    val (_, sink) = newStore()
    intercept[IllegalArgumentException](sink.logMetrics(0, Map("a/b" -> 1.0)))
    intercept[IllegalArgumentException](sink.logText("../escape.txt", "x"))
  }

  test("MetricsLog bundle writes every reference key as a metric file") {
    // shape-only check against the seam: the bundle's key set is pinned
    // ppb-exact in MetricsSinkSpec; here we assert the file-store client
    // accepts the full bundle through the same trait
    val (_, sink) = newStore()
    val keys = Seq("nodes.count", "unlabeled.ratio", "clustering.ami",
      "entities.coverage", "schema.balance", "collections.distinct_count")
    sink.logMetrics(3, keys.map(_ -> 1.0).toMap)
    keys.foreach { k =>
      assert(Files.exists(sink.runDirectory.resolve(s"metrics/$k")), k)
    }
  }
}
