package graft.model

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

import java.io.IOException
import java.net.URI

/** A simulated rename-less store for ForestStoreSpec: local disk under a
  * `nonatomic://` scheme whose rename REFUSES any store-protocol move —
  * anything touching `staging/` or `aside/` (every publish/park rename
  * the rename-based protocol issues goes through one of those). Renames
  * inside a snapshot's own directory tree (Spark's parquet committer
  * moving `_temporary` task files into place) stay allowed, as a real
  * object-store committer would arrange. A marker-mode ForestStore must
  * run its whole protocol on this filesystem without ever tripping the
  * refusal; the rename-based protocol trips it on the first publish.
  *
  * Registered per-test via
  * `hadoopConfiguration.set("fs.nonatomic.impl", classOf[NonAtomicFs].getName)`.
  */
class NonAtomicFs extends RawLocalFileSystem {
  override def getScheme: String = "nonatomic"
  override def getUri: URI = URI.create("nonatomic:///")

  private def storeLevel(p: Path): Boolean = {
    val s = p.toUri.getPath
    s.contains("/staging/") || s.contains("/aside/")
  }

  override def rename(src: Path, dst: Path): Boolean = {
    if (storeLevel(src) || storeLevel(dst))
      throw new IOException(
        s"rename is not atomic on this store (refused: $src -> $dst)")
    super.rename(src, dst)
  }
}
