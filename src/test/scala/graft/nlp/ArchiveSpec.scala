package graft.nlp

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class ArchiveSpec extends AnyFunSuite with SparkSpec {

  private val docs = Seq(
    "corpus/a.txt" -> "John likes Mary\nBob hates Eve".getBytes("UTF-8"),
    "corpus/a.ann" -> "T1\tpers 0 4\tJohn\nT2\tpers 11 15\tMary\nR1\tlikes Arg1:T1 Arg2:T2".getBytes("UTF-8"),
    "corpus/b.txt" -> "standalone text with no annotations".getBytes("UTF-8"),
    // 512-byte payload exercises the zero-padding boundary of ustar
    "corpus/pad.bin" -> Array.fill[Byte](512)('x'.toByte),
    "corpus/empty.txt" -> Array.emptyByteArray)

  test("tar.gz writer/reader round trip (padding boundary, empty entry, nested names)") {
    val bytes = Archive.writeTarGz(docs)
    val back = Archive.tarEntries(new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))).toSeq
    assert(back.map(_._1) == docs.map(_._1))
    assert(back.map(_._2.toSeq) == docs.map(_._2.toSeq))
  }

  test("zip writer/reader round trip; dispatch by extension") {
    val zip = Archive.writeZip(docs)
    val back = Archive.entries("c.zip", new java.io.ByteArrayInputStream(zip)).toSeq
    assert(back.map(_._1) == docs.map(_._1))
    intercept[IllegalArgumentException](
      Archive.entries("c.rar", new java.io.ByteArrayInputStream(zip)))
  }

  test("a gnu tar written by the system tar is readable (ustar compatibility)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tar")
    java.nio.file.Files.createDirectory(dir.resolve("c"))
    java.nio.file.Files.write(dir.resolve("c/x.txt"), "hello tar".getBytes)
    java.nio.file.Files.write(dir.resolve("c/x.ann"), "T1\tpers 0 5\thello".getBytes)
    val tarball = dir.resolve("c.tar.gz")
    val p = new ProcessBuilder("tar", "czf", tarball.toString, "-C", dir.toString, "c")
      .inheritIO().start()
    assert(p.waitFor() == 0)
    val got = Archive.entries(tarball.toString,
      java.nio.file.Files.newInputStream(tarball)).toMap
    assert(new String(got("c/x.txt"), "UTF-8") == "hello tar")
    assert(got.contains("c/x.ann"))
  }

  test("archiveDocuments pairs txt/ann per base across archives; loadArchives parses") {
    val dir = java.nio.file.Files.createTempDirectory("graft-arch")
    java.nio.file.Files.write(dir.resolve("p0.tar.gz"), Archive.writeTarGz(docs.take(3)))
    java.nio.file.Files.write(dir.resolve("p1.zip"), Archive.writeZip(Seq(
      "corpus/c.txt" -> "Anna greets Otto".getBytes("UTF-8"),
      "corpus/c.ann" -> "T1\tpers 0 4\tAnna".getBytes("UTF-8"))))
    val done = Brat.archiveDocuments(spark, s"$dir/*").collect().sortBy(_._1)
    assert(done.map(_._1).toSeq == Seq("corpus/a", "corpus/b", "corpus/c"))
    val a = done.find(_._1 == "corpus/a").get
    assert(a._2.startsWith("John likes Mary") && a._3.startsWith("T1\tpers"))
    assert(done.find(_._1 == "corpus/b").get._3 == "") // no .ann → empty

    val sentences = Brat.loadArchives(spark, s"$dir/*").collect()
    // corpus/a: two sentences with entities; corpus/c: one
    assert(sentences.count(_.entities.nonEmpty) == 2)
    assert(sentences.exists(s => s.txt == "John likes Mary" &&
      s.rels.exists(_.name == "LIKES")))
  }
}
