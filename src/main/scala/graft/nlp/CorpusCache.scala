package graft.nlp

import graft.model.TreeRow
import org.apache.spark.sql.{Dataset, SparkSession}

/** Content-keyed corpus cache (reference architxt/nlp/__init__.py:45-76,
  * 168-178: MD5 of archive + settings keys a ZODB cache of parsed
  * forests). Spark re-expression: the cache is a parquet directory keyed
  * by the same hash — idempotent to re-runs, shared across sessions,
  * safe under concurrent writers via parquet's atomic directory commit.
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
    import spark.implicits._
    val path = s"$cacheDir/$key"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val qualified = new org.apache.hadoop.fs.Path(path)
    if (fs.exists(new org.apache.hadoop.fs.Path(qualified, "_SUCCESS"))) {
      spark.read.parquet(path).as[TreeRow]
    } else {
      parse.write.mode("overwrite").parquet(path)
      spark.read.parquet(path).as[TreeRow]
    }
  }
}
