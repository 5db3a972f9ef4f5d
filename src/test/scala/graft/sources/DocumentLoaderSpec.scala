package graft.sources

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** FIXTURES.md §3 golden: the nested-order JSON document. */
class DocumentLoaderSpec extends AnyFunSuite with SparkSpec {

  private val orderJson =
    """{"order": {"quantity": 2,
      |           "consumer": {"name": "Alice", "age": 30},
      |           "items": [{"name": "Laptop", "price": 1000},
      |                     {"name": "Smartphone", "price": 500}]}}""".stripMargin

  test("read_tree: dict→group shape, list→COLL, scalar→ENT") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val tree = DocumentLoader.readTree(mapper.readTree(orderJson))
    assert(tree.render ==
      "(root (order (ENT::quantity 2) (consumer (ENT::name Alice) (ENT::age 30)) " +
        "(COLL::items (items (ENT::name Laptop) (ENT::price 1000)) (items (ENT::name Smartphone) (ENT::price 500)))))")
  }

  test("traverse_tree normalizes to groups and relations") {
    val trees = DocumentLoader.fromJsonString(orderJson)
    assert(trees.size == 1)
    val kids = trees.head.childTrees.map(_.label.render)
    assert(kids == Vector(
      "REL::order<->consumer", "REL::order<->items", "REL::order<->items", "REL::root<->order"))
    val relC = trees.head.childTrees.head
    assert(relC.childTrees.map(_.label.render) == Vector("GROUP::order", "GROUP::consumer"))
    assert(relC.childTrees(0).render == "(GROUP::order (ENT::quantity 2))")
    assert(relC.childTrees(1).render == "(GROUP::consumer (ENT::name Alice) (ENT::age 30))")
  }

  test("parse_document_tree goldens (reference tests/database/test_read_documents.py)") {
    import graft.core.{ArchiTree, Plain, SExpr}
    def parsed(s: String) = DocumentLoader.parseDocumentTree(SExpr.parse(s)).map(_.render)
    // id='empty'
    assert(DocumentLoader.parseDocumentTree(ArchiTree(Plain("ROOT"), Vector.empty)).isEmpty)
    // id='group'
    assert(parsed("(name (ENT::A x) (ENT::B y))") ==
      Seq("(GROUP::name (ENT::A x) (ENT::B y))"))
    // id='coll'
    assert(parsed("(COLL::A (ENT::A x) (ENT::A y))") ==
      Seq("(GROUP::A (ENT::A x))", "(GROUP::A (ENT::A y))"))
    // id='rel'
    assert(parsed("(name (ENT::A x) (sub (ENT::B y)))") ==
      Seq("(ROOT (REL::name<->sub (GROUP::name (ENT::A x)) (GROUP::sub (ENT::B y))))"))
  }

  test("root collection yields one tree per element") {
    val json = """[{"a": {"x": 1}}, {"a": {"x": 2}}]"""
    val trees = DocumentLoader.fromJsonString(json)
    assert(trees.size == 2)
  }

  private val orderXml =
    "<order><quantity>2</quantity>" +
      "<consumer><name>Alice</name><age>30</age></consumer>" +
      "<items><name>Laptop</name><price>1000</price></items>" +
      "<items><name>Smartphone</name><price>500</price></items></order>"

  private val orderYaml =
    """order:
      |  quantity: 2
      |  consumer:
      |    name: Alice
      |    age: 30
      |  items:
      |    - name: Laptop
      |      price: 1000
      |    - name: Smartphone
      |      price: 500""".stripMargin

  private val orderToml =
    """[order]
      |quantity = 2                 # a comment
      |[order.consumer]
      |name = "Alice"
      |age = 30
      |[[order.items]]
      |name = "Laptop"
      |price = 1000
      |[[order.items]]
      |name = "Smartphone"
      |price = 500""".stripMargin

  test("XML, YAML, and TOML lanes produce the same forest as JSON") {
    val expected = DocumentLoader.fromJsonString(orderJson).map(_.render)
    assert(DocumentLoader.fromXmlString(orderXml).map(_.render) == expected)
    assert(DocumentLoader.fromYamlString(orderYaml).map(_.render) == expected)
    assert(DocumentLoader.fromTomlString(orderToml).map(_.render) == expected)
  }

  test("XML: attributes become @-prefixed entities, repeated tags a collection") {
    val trees = DocumentLoader.fromXmlString("""<doc id="7"><tag>a</tag><tag>b</tag></doc>""")
    val rendered = trees.map(_.render).mkString("\n")
    assert(rendered.contains("(ENT::@id 7)"))
    assert(rendered.contains("REL::doc<->tag"))
  }

  test("YAML: multi-document stream yields one tree per document") {
    val yaml = "---\na:\n  x: 1\n---\na:\n  x: 2"
    assert(DocumentLoader.fromYamlString(yaml).size == 2)
  }

  test("TOML: arrays, floats, booleans, literal strings") {
    val toml =
      """title = 'lit'
        |ratio = 1.5
        |on = true
        |tags = ["x", "y"]""".stripMargin
    val tree = DocumentLoader.readTree(DocumentLoader.TomlSubset.parse(toml))
    val r = tree.render
    assert(r.contains("(ENT::title lit)"))
    assert(r.contains("(ENT::ratio 1.5)"))
    assert(r.contains("(ENT::on true)"))
    assert(r.contains("(COLL::tags (ENT::tags x) (ENT::tags y))"))
  }

  test("Excel lane: a generated xlsx parses like its JSON equivalent") {
    def part(name: String, body: String): (String, String) = name -> body
    val parts = Seq(
      part("xl/workbook.xml",
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |<sheets><sheet name="items" sheetId="1"/></sheets></workbook>""".stripMargin),
      part("xl/sharedStrings.xml",
        "<sst><si><t>name</t></si><si><t>price</t></si><si><t>Laptop</t></si><si><t>Smartphone</t></si></sst>"),
      part("xl/worksheets/sheet1.xml",
        """<worksheet><sheetData>
          |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
          |<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>1000</v></c></row>
          |<row r="3"><c r="A3" t="s"><v>3</v></c><c r="B3"><v>500</v></c></row>
          |</sheetData></worksheet>""".stripMargin))
    val buf = new java.io.ByteArrayOutputStream()
    val zip = new java.util.zip.ZipOutputStream(buf)
    parts.foreach { case (name, body) =>
      zip.putNextEntry(new java.util.zip.ZipEntry(name))
      zip.write(body.getBytes("UTF-8"))
      zip.closeEntry()
    }
    zip.close()

    val viaExcel = DocumentLoader.fromExcelBytes(buf.toByteArray).map(_.render)
    val viaJson = DocumentLoader.fromJsonString(
      """{"items": [{"name": "Laptop", "price": 1000}, {"name": "Smartphone", "price": 500}]}"""
    ).map(_.render)
    assert(viaExcel == viaJson)
    assert(Xlsx.colIndex("AA3") == 26)
  }

  test("Excel writer round trip: writeSingleSheet parses back like its JSON equivalent") {
    val bytes = Xlsx.writeSingleSheet("items",
      Seq("name", "price"),
      Seq(Seq("Laptop <&> \"special\"", 1000L), Seq("Smartphone", 499.5)))
    val viaExcel = DocumentLoader.fromExcelBytes(bytes).map(_.render)
    val viaJson = DocumentLoader.fromJsonString(
      """{"items": [{"name": "Laptop <&> \"special\"", "price": 1000}, {"name": "Smartphone", "price": 499.5}]}"""
    ).map(_.render)
    assert(viaExcel == viaJson)
    // 27th column exercises the two-letter ref path of the writer
    val wide = Xlsx.writeSingleSheet("w", (0 to 26).map(i => s"c$i"), Seq((0 to 26).map(_.toLong)))
    val rec = Xlsx.parse(wide).get("w").get(0)
    assert(rec.get("c26").asLong == 26L)
  }

  test("CSV lane: rows parse like their JSON record-list equivalent") {
    val viaCsv = DocumentLoader.fromCsvString(
      "name,price\nLaptop,1000\nSmartphone,500").map(_.render)
    val viaJson = DocumentLoader.fromJsonString(
      """[{"name": "Laptop", "price": 1000}, {"name": "Smartphone", "price": 500}]"""
    ).map(_.render)
    assert(viaCsv == viaJson)
  }

  test("CSV: RFC-4180 quoting, empty-field drop, strictness guards") {
    val trees = DocumentLoader.fromCsvString(
      "a,b\n\"x,1\n2\",\"say \"\"hi\"\"\"\nplain,")
    assert(trees.size == 2)
    // render percent-encodes the delimiter/quote/newline characters
    val first = trees.head.render
    assert(first.contains("(ENT::a x%2C1%0A2)") && first.contains("(ENT::b say%20%22hi%22)"))
    // the empty b field drops like the reference's pd.notna filter
    assert(trees(1).render == "(GROUP::root (ENT::a plain))")

    // LF, CRLF, and classic-Mac lone-CR line endings all split records
    assert(DocumentLoader.CsvSubset.parse("a,b\r1,2\r3,4").size == 2)
    assert(DocumentLoader.CsvSubset.parse("a,b\r\n1,2\r\n").size == 1)

    // strictness: prose, single columns, ragged and duplicate headers
    // are NOT CSV — they must fall through to the later chain lanes
    assertThrows[IllegalArgumentException](DocumentLoader.fromCsvString("just: prose\nno: commas"))
    assertThrows[IllegalArgumentException](DocumentLoader.fromCsvString("a,a\n1,2"))
    assertThrows[IllegalArgumentException](DocumentLoader.fromCsvString("a,b\n1,2,3"))
    // header-only input is EMPTY, not invalid
    assertThrows[IllegalArgumentException](DocumentLoader.fromCsvString("a,b"))
  }

  test("CSV subset: serialize/parse round-trips arbitrary field content") {
    import org.scalacheck.Gen
    def samples[A](g: Gen[A], n: Int): Seq[A] =
      Gen.listOfN(n, g).pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(7L))

    val fieldGen: Gen[String] = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(',', '"', '\n', '\r', ' ', '\'', '#'))).map(_.mkString)
    val tableGen: Gen[(Vector[String], Vector[Vector[String]])] = for {
      nCols <- Gen.choose(2, 5)
      header <- Gen.containerOfN[Set, String](nCols,
        Gen.choose(1, 6).flatMap(Gen.stringOfN(_, Gen.alphaLowerChar))).suchThat(_.size >= 2)
      nRows <- Gen.choose(1, 6)
      rows <- Gen.listOfN(nRows, Gen.listOfN(header.size, fieldGen).map(_.toVector))
    } yield (header.toVector, rows.toVector)

    def esc(f: String): String =
      if (f.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        "\"" + f.replace("\"", "\"\"") + "\""
      else f

    for ((header, rows) <- samples(tableGen, 60)) {
      val csv = (header +: rows).map(_.map(esc).mkString(",")).mkString("\n")
      val parsed = DocumentLoader.CsvSubset.parse(csv)
      assert(parsed.size == rows.size)
      parsed.zip(rows).foreach { case (node, row) =>
        header.zip(row).foreach { case (k, v) =>
          assert(Option(node.get(k)).map(_.asText).contains(v))
        }
      }
    }
  }

  test("fromString try-each chain detects the format") {
    val expected = DocumentLoader.fromJsonString(orderJson).map(_.render)
    for (doc <- Seq(orderJson, orderXml, orderYaml, orderToml))
      assert(DocumentLoader.fromString(doc).map(_.render) == expected)
    assert(DocumentLoader.fromString("name,price\nLaptop,1000").head.render ==
      "(GROUP::root (ENT::name Laptop) (ENT::price 1000))")
    // reference chain-order quirk, pinned: CSV tries BEFORE YAML
    // (documents.py:22-29), so a mapping whose every line carries a
    // comma parses as 2-column CSV — here exactly as with pd.read_csv
    val commaYaml = "k1: a, b\nk2: c, d"
    assert(DocumentLoader.fromString(commaYaml).map(_.render) ==
      DocumentLoader.fromCsvString(commaYaml).map(_.render))
    assertThrows[IllegalArgumentException](DocumentLoader.fromString(""))
  }

  test("sample caps collection elements deterministically") {
    val trees = DocumentLoader.parseDocumentTree(
      DocumentLoader.readTree(
        new com.fasterxml.jackson.databind.ObjectMapper().readTree(orderJson)),
      sample = 1)
    val kids = trees.head.childTrees.map(_.label.render)
    assert(kids.count(_ == "REL::order<->items") == 1)
    // the kept element is the FIRST in document order
    assert(trees.head.render.contains("Laptop") && !trees.head.render.contains("Smartphone"))
  }

  test("readDocument: raw read, root name, and sample (documents.py:32-58)") {
    // raw_read returns the untransformed document tree (one tree)
    val raw = DocumentLoader.readDocument(orderJson, rawRead = true)
    assert(raw.size == 1)
    assert(raw.head.render.startsWith("(root (order (ENT::quantity 2)"))
    // root_name flows into the document tree label (lowercased like read_tree)
    assert(DocumentLoader.readDocument(orderJson, rawRead = true, rootName = "DB")
      .head.label.render == "db")
    // default transformed path ≡ fromString
    assert(DocumentLoader.readDocument(orderJson).map(_.render) ==
      DocumentLoader.fromString(orderJson).map(_.render))
    // sample caps collections through the chain
    val sampled = DocumentLoader.readDocument(orderJson, sample = 1)
    assert(sampled.head.render.contains("Laptop") && !sampled.head.render.contains("Smartphone"))
  }

  test("loadJsonLines builds a forest dataset") {
    val dir = java.nio.file.Files.createTempDirectory("docs")
    java.nio.file.Files.writeString(
      dir.resolve("docs.jsonl"),
      Seq("""{"a": {"x": 1, "b": {"y": 2}}}""", """{"a": {"x": 3}}""").mkString("\n"))
    val forest = DocumentLoader.loadJsonLines(spark, dir.toString)
    assert(forest.count() == 2)
  }
}
