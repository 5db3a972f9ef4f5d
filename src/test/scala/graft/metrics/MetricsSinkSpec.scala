package graft.metrics

import graft.SparkSpec
import graft.sources.{RelationalLoader, Testdata}
import org.scalatest.funsuite.AnyFunSuite

/** MetricsLog mirrors the reference's log_to_mlflow key set
  * (metrics.py:429-462) through the env-free JSONL sink.
  */
class MetricsSinkSpec extends AnyFunSuite with SparkSpec {

  test("the metric bundle carries the reference's keys and self-compare values") {
    val forest = RelationalLoader.load(spark, "/root/testdata/sf0.001", Testdata.customerDb)
      .localCheckpoint(true)
    val m = new Metrics(forest, 0.7)
    m.update(forest)

    val dir = java.nio.file.Files.createTempDirectory("graft-mlog")
    val file = dir.resolve("metrics.jsonl").toString
    MetricsLog.log(m, new JsonlMetricsSink(file), iteration = 3, debug = true)

    val line = java.nio.file.Files.readString(java.nio.file.Paths.get(file)).trim
    assert(line.startsWith("""{"step":3,"metrics":{"""))
    // the reference bundle's key families (metrics.py:429-462)
    for (key <- Seq(
        "nodes.count", "unlabeled.count", "unlabeled.ratio",
        "clustering.cluster_count", "clustering.ami", "clustering.completeness",
        "entities.coverage", "entities.count", "entities.distinct_count", "entities.ratio",
        "groups.count", "groups.distinct_count", "groups.ratio",
        "relations.count", "relations.distinct_count", "relations.ratio",
        "collections.count", "collections.distinct_count", "collections.ratio",
        "schema.overlap", "schema.balance", "schema.productions", "schema.non_terminal"))
      assert(line.contains(s""""$key":"""), s"bundle is missing $key")

    // self-compare identities: full coverage, perfect cluster agreement
    assert(line.contains(""""entities.coverage":1.0"""))
    assert(line.contains(""""clustering.completeness":1.0"""))
    // 150 customer trees: 6 labeled node kinds, no COLL in this corpus
    assert(line.contains(""""collections.count":0.0"""))

    // debug artifact: the schema as CFG text next to the metrics file
    val cfg = dir.resolve("debug/3/schema.txt")
    assert(java.nio.file.Files.exists(cfg))
    assert(java.nio.file.Files.readString(cfg).contains("GROUP::customer"))

    // appending a second step keeps the first line intact
    MetricsLog.log(m, new JsonlMetricsSink(file), iteration = 4)
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(file))
    assert(lines.size == 2 && lines.get(1).startsWith("""{"step":4"""))
  }
}
