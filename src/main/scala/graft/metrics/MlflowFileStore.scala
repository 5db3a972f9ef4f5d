package graft.metrics

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

/** A real [[MetricsSink]] client: writes MLflow's on-disk FileStore
  * layout (the `mlruns/` directory an `mlflow ui
  * --backend-store-uri file:<root>` serves directly), so the
  * reference's tracking surface (metrics.py:414-473 `log_to_mlflow`)
  * works end-to-end without a tracking server or any client library.
  *
  * Layout (public MLflow file-store contract):
  * {{{
  * <root>/<experimentId>/meta.yaml
  * <root>/<experimentId>/<runId>/meta.yaml
  * <root>/<experimentId>/<runId>/metrics/<key>   # "<ts_ms> <value> <step>" per line
  * <root>/<experimentId>/<runId>/params/<key>    # single value
  * <root>/<experimentId>/<runId>/tags/<key>
  * <root>/<experimentId>/<runId>/artifacts/<path>
  * }}}
  *
  * Metric history appends one line per `logMetrics` call — MLflow's
  * step semantics, so per-epoch rewrite metrics chart as curves.
  */
final class MlflowFileStoreSink(
    root: String,
    experimentName: String = "graft",
    runName: String = "run",
) extends MetricsSink {

  // deterministic single-experiment store: id 0, like a fresh `mlruns/`
  private val experimentId = "0"
  private val runId = java.util.UUID.randomUUID().toString.replace("-", "")
  private val expDir = Paths.get(root, experimentId)
  private val runDir = expDir.resolve(runId)
  private val startTime = System.currentTimeMillis()
  @volatile private var closed = false

  locally {
    Files.createDirectories(runDir.resolve("metrics"))
    Files.createDirectories(runDir.resolve("params"))
    Files.createDirectories(runDir.resolve("tags"))
    Files.createDirectories(runDir.resolve("artifacts"))
    write(expDir.resolve("meta.yaml"),
      s"""artifact_location: file://${expDir.toAbsolutePath}
         |creation_time: $startTime
         |experiment_id: $experimentId
         |last_update_time: $startTime
         |lifecycle_stage: active
         |name: ${yamlStr(experimentName)}
         |""".stripMargin)
    writeRunMeta(status = "RUNNING", endTime = None)
    write(runDir.resolve("tags/mlflow.runName"), runName)
  }

  private def yamlStr(s: String): String =
    "'" + s.replace("'", "''") + "'"

  private def writeRunMeta(status: String, endTime: Option[Long]): Unit =
    write(runDir.resolve("meta.yaml"),
      s"""artifact_uri: file://${runDir.resolve("artifacts").toAbsolutePath}
         |end_time: ${endTime.map(_.toString).getOrElse("null")}
         |entry_point_name: ''
         |experiment_id: $experimentId
         |lifecycle_stage: active
         |run_id: $runId
         |run_name: ${yamlStr(runName)}
         |run_uuid: $runId
         |source_name: ''
         |source_type: 4
         |source_version: ''
         |start_time: $startTime
         |status: $status
         |user_id: graft
         |""".stripMargin)

  private def write(p: Path, text: String): Unit = {
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.writeString(p, text, UTF_8)
  }

  /** Sanitize a metric/param key into a single relative file name —
    * MLflow forbids path separators and parent escapes in keys.
    */
  private def keyFile(dir: String, key: String): Path = {
    require(key.nonEmpty && !key.contains('/') && !key.contains('\\') && key != ".." ,
      s"invalid key: $key")
    runDir.resolve(dir).resolve(key)
  }

  override def logMetrics(step: Int, metrics: Map[String, Double]): Unit = {
    require(!closed, "run already ended")
    val ts = System.currentTimeMillis()
    metrics.toSeq.sortBy(_._1).foreach { case (k, v) =>
      // NaN/Inf: MLflow stores them as extreme sentinels; keep the raw
      // token instead — the file is still line-parseable and honest
      Files.writeString(keyFile("metrics", k), s"$ts $v $step\n", UTF_8,
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }

  override def logText(artifact: String, text: String): Unit = {
    require(!closed, "run already ended")
    val rel = Paths.get(artifact)
    require(!rel.isAbsolute && !artifact.contains(".."), s"invalid artifact path: $artifact")
    write(runDir.resolve("artifacts").resolve(rel), text)
  }

  def logParams(params: Map[String, String]): Unit = {
    require(!closed, "run already ended")
    params.foreach { case (k, v) => write(keyFile("params", k), v) }
  }

  /** Finish the run (mlflow.end_run): stamps end_time + FINISHED. */
  def endRun(status: String = "FINISHED"): Unit = {
    writeRunMeta(status, Some(System.currentTimeMillis()))
    closed = true
  }

  def runDirectory: Path = runDir
}
