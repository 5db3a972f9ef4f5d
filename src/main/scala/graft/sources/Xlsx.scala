package graft.sources

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.JsonNodeFactory

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

/** Minimal XLSX reader backing the document loader's Excel lane
  * (reference documents.py:27: `pd.read_excel(x, sheet_name=None)` →
  * `{sheet: records}`). XLSX is a zip of XML parts, so a subset reader
  * needs no external library: shared strings, inline strings, numbers
  * and booleans; the FIRST row of each sheet is the header, later rows
  * become one record each keyed by header name (absent cells are
  * omitted, like pandas records drop NaN through `read_tree`'s
  * non-empty-leaf rule). Out of scope: formulas (cached values are
  * read), dates (surface as serial numbers), styles, merged cells.
  *
  * Sheet k in `xl/workbook.xml` document order is read from
  * `xl/worksheets/sheet{k+1}.xml` — the layout every mainstream writer
  * produces.
  */
object Xlsx {

  private val f = JsonNodeFactory.instance

  /** Parse an .xlsx byte array to `{sheetName: [{col: value}, …]}`. */
  def parse(bytes: Array[Byte]): JsonNode = {
    val parts = readZip(bytes)
    val shared: IndexedSeq[String] = parts.get("xl/sharedStrings.xml") match {
      case Some(xml) =>
        (scala.xml.XML.loadString(xml) \ "si")
          .map(si => (si \\ "t").map(_.text).mkString).toIndexedSeq
      case None => IndexedSeq.empty
    }
    val workbook = parts.getOrElse("xl/workbook.xml",
      throw new IllegalArgumentException("not an xlsx: missing xl/workbook.xml"))
    val sheetNames = (scala.xml.XML.loadString(workbook) \ "sheets" \ "sheet")
      .map(s => (s \@ "name"))

    val out = f.objectNode()
    sheetNames.zipWithIndex.foreach { case (name, i) =>
      parts.get(s"xl/worksheets/sheet${i + 1}.xml")
        .foreach(xml => out.set[JsonNode](name, sheetRecords(xml, shared)))
    }
    if (out.isEmpty) throw new IllegalArgumentException("Empty document")
    out
  }

  private def readZip(bytes: Array[Byte]): Map[String, String] = {
    val zip = new ZipInputStream(new ByteArrayInputStream(bytes))
    val parts = scala.collection.mutable.Map.empty[String, String]
    try {
      var entry = zip.getNextEntry
      while (entry != null) {
        if (!entry.isDirectory &&
            (entry.getName.startsWith("xl/worksheets/") ||
              entry.getName == "xl/workbook.xml" ||
              entry.getName == "xl/sharedStrings.xml"))
          parts(entry.getName) = new String(zip.readAllBytes(), "UTF-8")
        entry = zip.getNextEntry
      }
    } finally zip.close()
    parts.toMap
  }

  private def sheetRecords(sheetXml: String, shared: IndexedSeq[String]): JsonNode = {
    val rows = (scala.xml.XML.loadString(sheetXml) \ "sheetData" \ "row").map { row =>
      (row \ "c").flatMap { c =>
        cellValue(c, shared).map(v => colIndex((c \@ "r")) -> v)
      }.toMap
    }
    val records = f.arrayNode()
    rows.headOption.foreach { header =>
      val names = header.map { case (i, v) => i -> v.asText }
      rows.drop(1).foreach { cells =>
        val rec = f.objectNode()
        cells.foreach { case (i, v) =>
          names.get(i).foreach(n => rec.set[JsonNode](n, v))
        }
        records.add(rec)
      }
    }
    records
  }

  /** Minimal single-sheet .xlsx WRITER — the fixture/round-trip
    * counterpart of [[parse]]: strings become inline-string cells,
    * numbers plain numeric cells. Only the parts [[parse]] reads are
    * emitted (workbook + sheet1); that is sufficient for this reader
    * and keeps the writer an explicit test/fixture surface, not a
    * general-purpose exporter.
    */
  def writeSingleSheet(sheet: String, header: Seq[String], rows: Seq[Seq[Any]]): Array[Byte] = {
    def colRef(i: Int): String = {
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { sb.insert(0, ('A' + (n - 1) % 26).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    def esc(s: String): String = scala.xml.Utility.escape(s)
    def cell(r: Int, c: Int, v: Any): String = v match {
      case n: Int    => s"""<c r="${colRef(c)}$r"><v>$n</v></c>"""
      case n: Long   => s"""<c r="${colRef(c)}$r"><v>$n</v></c>"""
      case n: Double => s"""<c r="${colRef(c)}$r"><v>$n</v></c>"""
      case s         => s"""<c r="${colRef(c)}$r" t="inlineStr"><is><t>${esc(String.valueOf(s))}</t></is></c>"""
    }
    val allRows = header +: rows
    val body = allRows.zipWithIndex.map { case (cells, i) =>
      cells.zipWithIndex.map { case (v, c) => cell(i + 1, c, v) }
        .mkString(s"""<row r="${i + 1}">""", "", "</row>")
    }.mkString
    val parts = Seq(
      "xl/workbook.xml" ->
        s"""<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheets><sheet name="${esc(sheet)}" sheetId="1"/></sheets></workbook>""",
      "xl/worksheets/sheet1.xml" ->
        s"""<worksheet><sheetData>$body</sheetData></worksheet>""")
    val buf = new java.io.ByteArrayOutputStream()
    val zip = new java.util.zip.ZipOutputStream(buf)
    parts.foreach { case (name, content) =>
      zip.putNextEntry(new java.util.zip.ZipEntry(name))
      zip.write(content.getBytes("UTF-8"))
      zip.closeEntry()
    }
    zip.close()
    buf.toByteArray
  }

  /** `A1` → 0, `B7` → 1, `AA3` → 26 … (column letters only). */
  private[sources] def colIndex(cellRef: String): Int =
    cellRef.takeWhile(_.isLetter).foldLeft(0)((a, ch) => a * 26 + (ch - 'A' + 1)) - 1

  private def cellValue(c: scala.xml.Node, shared: IndexedSeq[String]): Option[JsonNode] = {
    val t = c \@ "t"
    t match {
      case "inlineStr" =>
        Some(f.textNode((c \ "is" \\ "t").map(_.text).mkString))
      case _ =>
        val v = (c \ "v").text
        if (v.isEmpty) None
        else t match {
          case "s"   => Some(f.textNode(shared(v.toInt)))
          case "str" => Some(f.textNode(v))
          case "b"   => Some(f.booleanNode(v == "1"))
          case _ =>
            // general cells are numeric; keep ints exact
            if (v.matches("[+-]?[0-9]+")) Some(f.numberNode(v.toLong))
            else scala.util.Try(v.toDouble).toOption.map(f.numberNode(_): JsonNode)
              .orElse(Some(f.textNode(v)))
        }
    }
  }
}
