package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

class PartitionersSpec extends AnyFunSuite {

  private def zip(entries: (String, String)*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  // ------------------------------------------------------------- detect_filetype

  test("detect: binary magic beats extension") {
    assert(DetectFiletype.detect("x.txt", "%PDF-1.7 ...".getBytes) == FileType.Pdf)
    assert(DetectFiletype.detect("x.bin", zip("word/document.xml" -> "<w:document/>"))
      == FileType.Docx)
    assert(DetectFiletype.detect("x.bin", zip("xl/workbook.xml" -> "<x/>")) == FileType.Xlsx)
    assert(DetectFiletype.detect("x.bin", zip("ppt/slides/slide1.xml" -> "<x/>"))
      == FileType.Pptx)
    val ole = Array[Byte](0xD0.toByte, 0xCF.toByte, 0x11, 0xE0.toByte, 0, 0)
    assert(DetectFiletype.detect("m.doc", ole) == FileType.Doc)
    assert(DetectFiletype.detect("m.msg", ole) == FileType.Msg)
  }

  test("detect: asserted content-type wins over extension") {
    assert(DetectFiletype.detect("x.weird", "hello".getBytes, Some("text/html"))
      == FileType.Html)
    assert(DetectFiletype.detect("x.weird", "hello".getBytes, Some("text/csv; charset=utf-8"))
      == FileType.Csv)
  }

  test("detect: text differentiators for ambiguous text") {
    assert(DetectFiletype.detect("f", "<!DOCTYPE html><html></html>".getBytes) == FileType.Html)
    // a COMPLETE single-line object is 1-record NDJSON (filetype.py:163-167);
    // a multi-line JSON value is JSON
    assert(DetectFiletype.detect("f", "{\"a\": 1}".getBytes) == FileType.Ndjson)
    assert(DetectFiletype.detect("f", "{\n  \"a\": 1\n}".getBytes) == FileType.Json)
    assert(DetectFiletype.detect("f", "{\"a\": 1}\n{\"a\": 2}\n".getBytes) == FileType.Ndjson)
    assert(DetectFiletype.detect("f",
      "From: a@b.com\nTo: c@d.com\nSubject: hi\n\nbody".getBytes) == FileType.Eml)
    assert(DetectFiletype.detect("f", "a,b,c\n1,2,3\n4,5,6".getBytes) == FileType.Csv)
    assert(DetectFiletype.detect("f", "just some plain text".getBytes) == FileType.Txt)
    assert(DetectFiletype.detect("notes.md", "# Title".getBytes) == FileType.Md)
  }

  // ------------------------------------------------------------- csv / tsv

  test("csv: delimiter sniffing among , ; |") {
    assert(Partitioners.sniffDelimiter("a,b\nc,d").contains(','))
    assert(Partitioners.sniffDelimiter("a;b\nc;d").contains(';'))
    assert(Partitioners.sniffDelimiter("a|b\nc|d").contains('|'))
  }

  test("csv: quoted fields and html render") {
    val ps = Partitioners.partitionCsv("name,note\n\"Smith, Jo\",\"said \"\"hi\"\"\"")
    assert(ps.size == 1)
    assert(ps(0).elementType.contains("Table"))
    assert(ps(0).text == "name note Smith, Jo said \"hi\"")
    assert(ps(0).textAsHtml.get ==
      "<table><tr><td>name</td><td>note</td></tr>" +
        "<tr><td>Smith, Jo</td><td>said \"hi\"</td></tr></table>")
  }

  test("tsv partitions with tab delimiter") {
    val ps = Partitioners.partitionTsv("a\tb\nc\td")
    assert(ps(0).text == "a b c d")
  }

  // ------------------------------------------------------------- email

  private val sampleEml =
    "From: Alice <alice@example.com>\r\n" +
      "To: bob@example.com, carol@example.com\r\n" +
      "Cc: dave@example.com\r\n" +
      "Subject: Test\r\n" +
      " subject continued\r\n" +
      "Message-ID: <abc123@example.com>\r\n" +
      "MIME-Version: 1.0\r\n" +
      "Content-Type: multipart/alternative; boundary=\"BOUND\"\r\n" +
      "\r\n" +
      "--BOUND\r\n" +
      "Content-Type: text/plain\r\n" +
      "\r\n" +
      "Plain body.\r\n" +
      "--BOUND\r\n" +
      "Content-Type: text/html\r\n" +
      "Content-Transfer-Encoding: quoted-printable\r\n" +
      "\r\n" +
      "<p>Caf=C3=A9 body</p>\r\n" +
      "--BOUND--\r\n"

  test("email: headers unfold, html body preferred, quoted-printable decoded") {
    val (meta, paras) = Partitioners.partitionEmail(sampleEml)
    assert(meta.sentFrom == Seq("Alice <alice@example.com>"))
    assert(meta.sentTo == Seq("bob@example.com", "carol@example.com"))
    assert(meta.cc == Seq("dave@example.com"))
    assert(meta.subject.contains("Test subject continued"))
    assert(meta.messageId.contains("abc123@example.com"))
    assert(paras.map(_.text) == Seq("Café body"))
  }

  test("email: text/plain preference and attachments") {
    val (_, paras) = Partitioners.partitionEmail(sampleEml, contentSource = "text/plain")
    assert(paras.map(_.text) == Seq("Plain body."))
    val withAtt = sampleEml.replace("--BOUND--",
      "--BOUND\r\nContent-Type: text/csv\r\n" +
        "Content-Disposition: attachment; filename=\"d.csv\"\r\n\r\na,b\r\n--BOUND--")
    val atts = Partitioners.emailAttachments(withAtt)
    assert(atts.map(_._1) == Seq("d.csv"))
    assert(atts.head._2.trim == "a,b")
  }

  // ------------------------------------------------------------- markdown

  test("markdown: headings, lists, code, emphasis, links") {
    val md =
      """# Top Title
        |
        |A paragraph with **bold** and [link](http://x).
        |
        |- item one
        |- item two
        |
        |```
        |code line
        |```""".stripMargin
    val ps = Partitioners.partitionMd(md)
    assert(ps(0).elementType.contains("Title") && ps(0).text == "Top Title")
    assert(ps(1).text == "A paragraph with bold and link.")
    assert(ps(1).emphasizedContents == Seq("bold"))
    assert(ps(1).linkUrls == Seq("http://x"))
    assert(ps(2).elementType.contains("ListItem") && ps(2).text == "item one")
    assert(ps(3).text == "item two")
    assert(ps(4).elementType.contains("CodeSnippet") && ps(4).text == "code line")
  }

  // ------------------------------------------------------------- xml

  test("xml: leaf text becomes paragraphs") {
    val ps = Partitioners.partitionXml(
      "<?xml version=\"1.0\"?><root><a>First text</a><b><c>Nested text</c></b></root>")
    assert(ps.map(_.text) == Seq("First text", "Nested text"))
  }

  // ------------------------------------------------------------- docx

  test("docx: headings, lists, rendered page breaks, tables") {
    val docXml =
      """<w:document><w:body>
        |<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr><w:r><w:t>Intro</w:t></w:r></w:p>
        |<w:p><w:r><w:t>Body text one.</w:t><w:t> And more.</w:t></w:r></w:p>
        |<w:p><w:pPr><w:numPr><w:ilvl w:val="0"/></w:numPr></w:pPr><w:r><w:t>bullet</w:t></w:r></w:p>
        |<w:p><w:r><w:lastRenderedPageBreak/><w:t>after break</w:t></w:r></w:p>
        |<w:tbl><w:tr><w:tc><w:p><w:r><w:t>h1</w:t></w:r></w:p></w:tc>
        |<w:tc><w:p><w:r><w:t>h2</w:t></w:r></w:p></w:tc></w:tr></w:tbl>
        |</w:body></w:document>""".stripMargin
    val ps = OoxmlPartitioner.partitionDocx(zip("word/document.xml" -> docXml))
    assert(ps(0).elementType.contains("Title") && ps(0).categoryDepth.contains(0))
    assert(ps(0).text == "Intro" && ps(0).pageNumber.contains(1))
    assert(ps(1).text == "Body text one. And more." && ps(1).elementType.isEmpty)
    assert(ps(2).elementType.contains("ListItem") && ps(2).categoryDepth.contains(0))
    // the rendered page-break splits the paragraph: PageBreak, then page-2 text
    assert(ps(3).elementType.contains("PageBreak") && ps(3).text == "")
    assert(ps(4).text == "after break" && ps(4).pageNumber.contains(2))
    assert(ps(5).elementType.contains("Table") && ps(5).pageNumber.contains(2))
    assert(ps(5).textAsHtml.contains("<table><tr><td>h1</td><td>h2</td></tr></table>"))
  }

  test("docx: hard page breaks alone no longer page-number the stream") {
    val docXml =
      """<w:document><w:body>
        |<w:p><w:r><w:t>one</w:t><w:br w:type="page"/></w:r></w:p>
        |<w:p><w:r><w:t>two</w:t></w:r></w:p>
        |</w:body></w:document>""".stripMargin
    val ps = OoxmlPartitioner.partitionDocx(zip("word/document.xml" -> docXml))
    assert(!ps.exists(_.elementType.contains("PageBreak")))
    assert(ps.forall(_.pageNumber.isEmpty))
  }

  test("docx picture partitioner protocol: registered sub-partitioner emits Images") {
    val docXml =
      """<w:document><w:body>
        |<w:p><w:r><w:t>Before pic</w:t></w:r>
        |<w:drawing><a:blip r:embed="rId5"/></w:drawing></w:p>
        |</w:body></w:document>""".stripMargin
    val rels =
      """<Relationships><Relationship Id="rId5" Type="http://x/image" """ +
        """Target="media/image1.png"/></Relationships>"""
    val bytes = zip(
      "word/document.xml" -> docXml,
      "word/_rels/document.xml.rels" -> rels,
      "word/media/image1.png" -> "PNGBYTES")

    // default (null) partitioner extracts nothing — docx.py's _NullPicturePartitioner
    assert(!OoxmlPartitioner.partitionDocx(bytes).exists(_.elementType.contains("Image")))

    object B64PicturePartitioner extends OoxmlPartitioner.DocxPicturePartitioner {
      private val Blip = "r:embed=\"([^\"]+)\"".r
      def elements(paragraphXml: String,
          media: String => Option[Array[Byte]]): Seq[HtmlPartitioner.RawPara] =
        Blip.findAllMatchIn(paragraphXml).flatMap(m => media(m.group(1))).map { b =>
          HtmlPartitioner.RawPara("", Some("Image"),
            imageBase64 = Some(java.util.Base64.getEncoder.encodeToString(b)),
            imageMime = Some("image/png"))
        }.toSeq
    }
    graft.operators.Registries.registerPicturePartitioner(B64PicturePartitioner)
    try {
      val ps = OoxmlPartitioner.partitionDocx(bytes)
      assert(ps(0).text == "Before pic")
      val img = ps.find(_.elementType.contains("Image")).get
      assert(img.imageBase64.contains(
        java.util.Base64.getEncoder.encodeToString("PNGBYTES".getBytes("UTF-8"))))
      assert(img.imageMime.contains("image/png"))
      // no rendered page-breaks in the doc -> page metadata omitted (docx.py:270-282)
      assert(img.pageNumber.isEmpty)
    } finally graft.operators.Registries.registerPicturePartitioner(
      OoxmlPartitioner.NullPicturePartitioner)
  }

  // ------------------------------------------------------------- xlsx

  test("xlsx: shared strings, cell grid, sheet name") {
    val shared = "<sst><si><t>Name</t></si><si><t>Alice</t></si></sst>"
    val sheet =
      """<worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1"><v>42</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2"><v>7</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val wb = "<workbook><sheets><sheet name=\"People\" sheetId=\"1\"/></sheets></workbook>"
    val ps = OoxmlPartitioner.partitionXlsx(zip(
      "xl/sharedStrings.xml" -> shared,
      "xl/workbook.xml" -> wb,
      "xl/worksheets/sheet1.xml" -> sheet))
    assert(ps.size == 1)
    assert(ps(0).elementType.contains("Table"))
    assert(ps(0).text == "Name 42 Alice 7")
    assert(ps(0).pageName.contains("People"))
    assert(ps(0).textAsHtml.contains(
      "<table><tr><td>Name</td><td>42</td></tr><tr><td>Alice</td><td>7</td></tr></table>"))
  }

  test("xlsx: subtable connected-components split sheet into titles and tables") {
    // layout (rows 1-8):  "Sales Report" title row, 2x2 table, blank row,
    // then a second 2x2 table with a trailing note row
    val shared = "<sst>" + Seq("Sales Report", "h1", "h2", "a", "b",
      "x1", "x2", "c", "d", "note below").zipWithIndex
      .map { case (s, _) => s"<si><t>$s</t></si>" }.mkString + "</sst>"
    val sheet =
      """<worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2" t="s"><v>2</v></c></row>
        |<row r="3"><c r="A3" t="s"><v>3</v></c><c r="B3" t="s"><v>4</v></c></row>
        |<row r="5"><c r="A5" t="s"><v>5</v></c><c r="B5" t="s"><v>6</v></c></row>
        |<row r="6"><c r="A6" t="s"><v>7</v></c><c r="B6" t="s"><v>8</v></c></row>
        |<row r="7"><c r="A7" t="s"><v>9</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val ps = OoxmlPartitioner.partitionXlsx(zip(
      "xl/sharedStrings.xml" -> shared,
      "xl/worksheets/sheet1.xml" -> sheet), findSubtable = true)
    assert(ps.map(_.text) == Seq(
      "Sales Report", "h1 h2 a b", "x1 x2 c d", "note below"))
    // classified downstream via the restricted spreadsheet cascade
    assert(ps(0).elementType.isEmpty && ps(0).classifier == "tabular")
    assert(ps(1).elementType.contains("Table"))
    assert(ps(1).textAsHtml.contains(
      "<table><tr><td>h1</td><td>h2</td></tr><tr><td>a</td><td>b</td></tr></table>"))
    assert(ps(3).elementType.isEmpty) // trailing single-cell row
    // the title row is NOT merged into the table: single-cell rows split off
  }

  test("xlsx: row-overlapping components merge into one subtable") {
    // two column groups sharing rows -> one component after row-merge
    val shared = "<sst>" + Seq("a", "b").map(s => s"<si><t>$s</t></si>").mkString + "</sst>"
    val sheet =
      """<worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="D1" t="s"><v>1</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val ps = OoxmlPartitioner.partitionXlsx(zip(
      "xl/sharedStrings.xml" -> shared,
      "xl/worksheets/sheet1.xml" -> sheet), findSubtable = true)
    // one row, two disconnected cells, same row -> merged -> one core table row
    assert(ps.size == 1)
    assert(ps(0).elementType.contains("Table"))
    assert(ps(0).text == "a b")
  }

  // ------------------------------------------------------------- pptx

  test("pptx: title placeholder and body paragraphs per slide") {
    val slide1 =
      """<p:sld><p:cSld><p:spTree>
        |<p:sp><p:nvSpPr><p:nvPr><p:ph type="title"/></p:nvPr></p:nvSpPr>
        |<p:txBody><a:p><a:r><a:t>Slide Title</a:t></a:r></a:p></p:txBody></p:sp>
        |<p:sp><p:txBody><a:p><a:r><a:t>Body paragraph.</a:t></a:r></a:p></p:txBody></p:sp>
        |</p:spTree></p:cSld></p:sld>""".stripMargin
    val slide2 = "<p:sld><p:cSld><p:spTree><p:sp><p:txBody><a:p><a:r>" +
      "<a:t>Second slide text</a:t></a:r></a:p></p:txBody></p:sp></p:spTree></p:cSld></p:sld>"
    val ps = OoxmlPartitioner.partitionPptx(zip(
      "ppt/slides/slide1.xml" -> slide1,
      "ppt/slides/slide2.xml" -> slide2))
    assert(ps(0).elementType.contains("Title") && ps(0).text == "Slide Title")
    assert(ps(0).pageNumber.contains(1))
    assert(ps(1).text == "Body paragraph." && ps(1).elementType.isEmpty)
    // slide boundary emits a PageBreak carrying the page it closes (pptx.py:382-396)
    assert(ps(2).elementType.contains("PageBreak") && ps(2).pageNumber.contains(1))
    assert(ps(3).text == "Second slide text" && ps(3).pageNumber.contains(2))
  }

  // ------------------------------------------------------------- auto router

  test("auto router dispatches by detected type") {
    val (ft1, ps1) = Partitioners.partitionAuto("a.csv", "x,y\n1,2".getBytes)
    assert(ft1 == FileType.Csv && ps1.head.elementType.contains("Table"))
    val (ft2, ps2) = Partitioners.partitionAuto("a.html",
      "<html><body><h1>T</h1><p>hello world text</p></body></html>".getBytes)
    assert(ft2 == FileType.Html && ps2.head.elementType.contains("Title"))
    val (ft3, ps3) = Partitioners.partitionAuto("b.bin",
      zip("word/document.xml" -> "<w:p><w:r><w:t>docx text</w:t></w:r></w:p>"))
    assert(ft3 == FileType.Docx && ps3.head.text == "docx text")
    val (ft4, _) = Partitioners.partitionAuto("a.pdf", "%PDF-1.4".getBytes)
    assert(ft4 == FileType.Pdf)
  }

  // -- common/test_html_table.py Describe_htmlify_matrix_of_cell_texts --------

  test("htmlify matrix: empty cells render self-closing td") {
    assert(Partitioners.htmlifyMatrix(
      Seq(Seq("cell1", "", "cell3"), Seq("", "cell5", ""))) ==
      "<table><tr><td>cell1</td><td/><td>cell3</td></tr>" +
        "<tr><td/><td>cell5</td><td/></tr></table>")
  }

  test("htmlify matrix: special characters escape and newlines become br") {
    assert(Partitioners.htmlifyMatrix(Seq(Seq("<>&\"", "newline\n")),
      escapeQuotes = true) ==
      "<table><tr><td>&lt;&gt;&amp;&quot;</td><td>newline<br/></td></tr></table>")
  }

  test("htmlify matrix: multiple rows and cells") {
    assert(Partitioners.htmlifyMatrix(
      Seq(Seq("cell1", "cell2"), Seq("cell3", "cell4"))) ==
      "<table><tr><td>cell1</td><td>cell2</td></tr>" +
        "<tr><td>cell3</td><td>cell4</td></tr></table>")
  }

  test("htmlify matrix: empty matrix renders empty string") {
    assert(Partitioners.htmlifyMatrix(Nil) == "")
  }
}
