package graft.nlp

import graft.model.TreeRow
import org.apache.spark.sql.{Dataset, SparkSession}

/** Content-keyed corpus cache (reference architxt/nlp/__init__.py:45-76,
  * 168-178: MD5 of archive + settings keys a ZODB cache of parsed
  * forests). Spark re-expression: the cache is a parquet directory keyed
  * by the same hash — idempotent to re-runs, shared across sessions.
  * Concurrent writers each stage into a private temp directory and
  * commit with an atomic filesystem rename: the first rename wins, a
  * loser discards its staging copy and reads the winner's.
  */
object CorpusCache {

  /** Deterministic cache key for (corpus content identity, pipeline
    * settings). Callers pass a stable content fingerprint (file path +
    * size + mtime, or a content digest) plus whatever settings change
    * the parse output.
    */
  def cacheKey(contentId: String, settings: Map[String, String]): String = {
    val settingsStr = settings.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(";")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s"$contentId|$settingsStr".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
  }

  /** Load the forest for `key` from the cache, or compute + cache it.
    * The parse runs only on a cache miss; the cached parquet is the
    * durable artifact (same role as the reference's bucket cache).
    */
  def getOrParse(
      spark: SparkSession,
      cacheDir: String,
      key: String,
  )(parse: => Dataset[TreeRow]): Dataset[TreeRow] = {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    val target = new Path(s"$cacheDir/$key")
    // Path(...).getFileSystem accepts raw local paths (spaces included),
    // unlike FileSystem.get(new URI(...))
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // directory existence IS the commit marker (the rename below is
    // atomic) — do not rely on _SUCCESS, which cloud committers may be
    // configured not to write
    if (!fs.exists(target)) {
      val staging = new Path(s"$cacheDir/.tmp-$key-${java.util.UUID.randomUUID()}")
      parse.write.mode("overwrite").parquet(staging.toString)
      // first committer wins; a concurrent loser cleans up its staging
      // copy and reads the winner's directory
      if (!fs.rename(staging, target)) fs.delete(staging, true)
    }
    spark.read.parquet(target.toString).as[TreeRow]
  }
}
