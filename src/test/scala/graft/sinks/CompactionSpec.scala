package graft.sinks

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class CompactionSpec extends AnyFunSuite with SparkSpec {

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_compact").toString

  private def writeFragmented(path: String, rows: Int, parts: Int): Unit = {
    import spark.implicits._
    (1 to rows).map(i => (i.toLong, s"row $i payload %04d".format(i)))
      .toDF("id", "text")
      .repartition(parts)
      .write.parquet(path)
  }

  test("compaction collapses a fragmented directory and preserves content exactly") {
    val base = tmp()
    writeFragmented(s"$base/src", rows = 1000, parts = 37)
    val srcFiles = new java.io.File(s"$base/src").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(srcFiles == 37)

    val outFiles = Compaction.compact(spark, s"$base/src", s"$base/dst", "id",
      targetBytes = 1L << 30) // everything fits one target file
    assert(outFiles == 1)

    val src = spark.read.parquet(s"$base/src").collect().map(_.toSeq).toSet
    val dst = Compaction.read(spark, s"$base/dst").collect().map(_.toSeq).toSet
    assert(dst == src)
  }

  test("file count follows ceil(bytes/target) and files cover disjoint key ranges") {
    val base = tmp()
    writeFragmented(s"$base/src", rows = 5000, parts = 20)
    val bytes = Compaction.dataBytes(spark, s"$base/src")
    val target = bytes / 4 + 1
    val outFiles = Compaction.compact(spark, s"$base/src", s"$base/dst", "id", target)
    assert(outFiles == math.ceil(bytes.toDouble / target).toInt)

    // range clustering: per-file id ranges must not overlap
    val dstDir = new java.io.File(s"$base/dst")
    val ranges = dstDir.listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
      val ids = spark.read.parquet(f.getAbsolutePath)
        .agg(org.apache.spark.sql.functions.min("id"),
          org.apache.spark.sql.functions.max("id")).head
      (ids.getLong(0), ids.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) => assert(aMax < bMin, ranges.mkString(","))
      case _ =>
    }
  }

  test("invalid target is rejected") {
    intercept[IllegalArgumentException](Compaction.compact(spark, "x", "y", "id", 0))
  }
}
