package graft.nlp

import java.io.{ByteArrayOutputStream, EOFException, InputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream, ZipEntry, ZipInputStream, ZipOutputStream}

/** Self-contained archive container access for corpus ingestion
  * (reference `open_archive` + extractall in nlp/__init__.py:168-231):
  * `.zip` through `java.util.zip`, `.tar`/`.tar.gz`/`.tgz` through a
  * minimal ustar reader — the JDK has gzip but no tar, and the format
  * is 512-byte headers with octal sizes, so a subset reader beats a
  * dependency. Entries STREAM: nothing is extracted to disk, which is
  * what lets one Spark task consume one archive wherever it runs.
  *
  * Out of scope (loud skip, not corruption): GNU long-name/PAX
  * extension entries ('L', 'x', 'g' typeflags are skipped; their
  * payloads are metadata, not files), sparse files, hard/soft links.
  */
object Archive {

  /** Dispatch by file name: (entryName, bytes) pairs for regular files. */
  def entries(name: String, in: InputStream): Iterator[(String, Array[Byte])] = {
    val lower = name.toLowerCase
    if (lower.endsWith(".zip")) zipEntries(new ZipInputStream(in))
    else if (lower.endsWith(".tar.gz") || lower.endsWith(".tgz"))
      tarEntries(new GZIPInputStream(in))
    else if (lower.endsWith(".tar")) tarEntries(in)
    else throw new IllegalArgumentException(
      s"unsupported archive (expected .zip/.tar/.tar.gz/.tgz): $name")
  }

  def zipEntries(zip: ZipInputStream): Iterator[(String, Array[Byte])] =
    Iterator.continually(zip.getNextEntry).takeWhile(_ != null).collect {
      case e if !e.isDirectory => e.getName -> zip.readAllBytes()
    }

  /** Minimal ustar reader: 512-byte header (name 0..100, octal size
    * 124..136, typeflag 156, ustar prefix 345..500), data rounded up to
    * 512, two zero blocks terminate.
    */
  def tarEntries(in: InputStream): Iterator[(String, Array[Byte])] = new Iterator[(String, Array[Byte])] {
    private val header = new Array[Byte](512)
    private val scratch = new Array[Byte](512)
    private var nextEntry: (String, Array[Byte]) = null
    private var done = false

    private def readFully(buf: Array[Byte], len: Int): Boolean = {
      var off = 0
      while (off < len) {
        val n = in.read(buf, off, len - off)
        if (n < 0) return false
        off += n
      }
      true
    }

    private def str(off: Int, len: Int): String = {
      var end = off
      while (end < off + len && header(end) != 0) end += 1
      new String(header, off, end - off, "UTF-8")
    }

    private def advance(): Unit = {
      nextEntry = null
      while (nextEntry == null && !done) {
        if (!readFully(header, 512)) { done = true; return }
        if (header.forall(_ == 0)) { done = true; return } // terminator block
        val name0 = str(0, 100)
        val prefix = str(345, 155)
        val name = if (prefix.isEmpty) name0 else s"$prefix/$name0"
        val sizeStr = str(124, 12).trim
        val size = if (sizeStr.isEmpty) 0L else java.lang.Long.parseLong(sizeStr, 8)
        val typeflag = header(156).toChar
        val data = new Array[Byte](size.toInt)
        if (size > 0 && !readFully(data, size.toInt))
          throw new EOFException(s"truncated tar entry: $name")
        val pad = ((512 - size % 512) % 512).toInt
        if (pad > 0 && !readFully(scratch, pad))
          throw new EOFException(s"truncated tar padding: $name")
        if (typeflag == '0' || typeflag == 0.toChar) nextEntry = name -> data
        // anything else (dirs, links, GNU/PAX metadata) is skipped
      }
    }

    advance()
    override def hasNext: Boolean = nextEntry != null
    override def next(): (String, Array[Byte]) = {
      val e = nextEntry; advance(); e
    }
  }

  // ---- writers (fixtures and export) ----

  def writeTarGz(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    entries.foreach { case (name, data) => writeTarEntry(gz, name, data) }
    gz.write(new Array[Byte](1024)) // two terminator blocks
    gz.close()
    bos.toByteArray
  }

  private def writeTarEntry(out: java.io.OutputStream, name: String, data: Array[Byte]): Unit = {
    require(name.getBytes("UTF-8").length < 100, s"entry name too long for ustar short form: $name")
    val h = new Array[Byte](512)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes("UTF-8"); System.arraycopy(b, 0, h, off, b.length)
    }
    put(0, name)
    put(100, "0000644")
    put(108, "0000000")
    put(116, "0000000")
    put(124, f"${data.length}%011o")
    put(136, "00000000000")
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum spaces while summing
    h(156) = '0'
    put(257, "ustar")
    h(263) = '0'; h(264) = '0'
    val sum = h.foldLeft(0L)((a, b) => a + (b & 0xff))
    put(148, f"$sum%06o")
    h(154) = 0; h(155) = ' '
    out.write(h)
    out.write(data)
    val pad = (512 - data.length % 512) % 512
    if (pad > 0) out.write(new Array[Byte](pad))
  }

  def writeZip(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos)
    entries.foreach { case (name, data) =>
      zip.putNextEntry(new ZipEntry(name))
      zip.write(data)
      zip.closeEntry()
    }
    zip.close()
    bos.toByteArray
  }
}
