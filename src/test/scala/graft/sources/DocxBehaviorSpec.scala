package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase
import graft.sources.DocxPartitioner.DocxOptions
import graft.sources.HtmlPartitioner.RawPara

/**
 * Behavior suite ported from the reference's own DOCX tests
 * (`/root/reference/test_unstructured/partition/test_docx.py`), running against
 * the same example documents (`/root/reference/example-docs/`). Untyped
 * paragraphs resolve through the production `classifier = "docx"` cascade.
 */
class DocxBehaviorSpec extends SparkSuiteBase {

  private val docs = "/root/reference/example-docs/"

  private def bytes(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(docs + name))

  private def paras(name: String, opts: DocxOptions = DocxOptions()): Seq[RawPara] =
    DocxPartitioner.partition(bytes(name), opts)

  /** (resolved type, text) pairs — raw types pass through, untyped paragraphs
    * classify via the DOCX text cascade like the production query path. */
  private def typed(ps: Seq[RawPara]): Seq[(String, String)] = {
    val sp = spark
    import sp.implicits._
    val df = ps.zipWithIndex
      .map { case (p, i) => (i, p.elementType.orNull, p.text, p.classifier) }
      .toDF("i", "raw_type", "text", "classifier")
    val derived = HtmlSource.classifierCascade(col("classifier"), col("text"))
    df.select(col("i"), coalesce(col("raw_type"), derived).as("t"), col("text"))
      .orderBy("i").collect().toSeq.map(r => (r.getString(1), r.getString(2)))
  }

  // -- test_parition_docx_from_team_chat: section-less document -------------------

  test("teams chat transcript: section-less docx partitions paragraphs and tables") {
    val ps = paras("teams_chat.docx")
    assert(ps.map(_.text) == Seq(
      "0:0:0.0 --> 0:0:1.510\nSome Body\nOK. Yeah.",
      "0:0:3.270 --> 0:0:4.250\nJames Bond\nUmm.",
      "saved-by Dennis Forsythe"))
    assert(ps.last.elementType.contains("Table"))
    // section-less: no headers or footers
    assert(!ps.exists(p => p.elementType.contains("Header") || p.elementType.contains("Footer")))
  }

  // -- test_partition_docx_processes_table / infer_table_structure ----------------

  test("fake_table: table text and exact text_as_html") {
    val ps = paras("fake_table.docx")
    val t = ps.head
    assert(t.elementType.contains("Table"))
    assert(t.text == "Header Col 1 Header Col 2 Lorem ipsum A Link example")
    assert(t.textAsHtml.contains(
      "<table>" +
        "<tr><td>Header Col 1</td><td>Header Col 2</td></tr>" +
        "<tr><td>Lorem ipsum</td><td>A Link example</td></tr>" +
        "</table>"))
  }

  test("fake_table: infer_table_structure=false drops text_as_html") {
    val ps = paras("fake_table.docx", DocxOptions(inferTableStructure = false))
    assert(ps.head.elementType.contains("Table"))
    assert(ps.head.textAsHtml.isEmpty)
  }

  // -- test_partition_docx_grabs_header_and_footer --------------------------------

  test("handbook-1p: header element first, footer element last") {
    val ps = paras("handbook-1p.docx")
    assert(ps.head.elementType.contains("Header"))
    assert(ps.head.text == "US Trustee Handbook")
    assert(ps.head.headerFooterType.contains("primary"))
    assert(ps.last.elementType.contains("Footer"))
    assert(ps.last.text == "Copyright")
    assert(ps.last.headerFooterType.contains("primary"))
  }

  // -- page-break behaviors -------------------------------------------------------

  test("hard page-breaks alone yield no PageBreak elements and no page numbers") {
    val ps = paras("handbook-1p-no-rendered-page-breaks.docx",
      DocxOptions(includePageBreaks = true))
    assert(!ps.exists(_.elementType.contains("PageBreak")))
    assert(ps.forall(_.pageNumber.isEmpty))
  }

  test("page numbers survive when PageBreak elements are suppressed") {
    val ps = paras("handbook-1p.docx", DocxOptions(includePageBreaks = false))
    assert(!ps.exists(_.elementType.contains("PageBreak")))
    assert(ps(1).pageNumber.contains(1))
    assert(ps(ps.size - 2).pageNumber.contains(2))
  }

  test("PageBreak elements included when instructed, with starting_page_number") {
    val ps = paras("handbook-1p.docx",
      DocxOptions(includePageBreaks = true, startingPageNumber = 3))
    assert(ps.exists(_.elementType.contains("PageBreak")))
    assert(ps(1).pageNumber.contains(3))
    assert(ps(ps.size - 2).pageNumber.contains(4))
  }

  // -- test_partition_docx_detects_lists ------------------------------------------

  test("detects list items (bullet chars and list styles)") {
    val ps = typed(paras("example-list-items-multiple.docx"))
    assert(ps.last == (("ListItem",
      "This is simply dummy text of the printing and typesetting industry.")))
    assert(ps.count(_._1 == "ListItem") == 10)
  }

  // -- emphasis -------------------------------------------------------------------

  test("emphasized texts: table and paragraph runs carry b/i emphasis") {
    val ps = paras("fake-doc-emphasized-text.docx")
    val expC = Seq("bold", "italic", "bold-italic", "bold-italic")
    val expT = Seq("b", "i", "b", "i")
    val table = ps.head
    assert(table.elementType.contains("Table"))
    assert(table.emphasizedContents == expC && table.emphasizedTags == expT)
    val narr = ps(1)
    assert(narr.text == "I am a bold italic bold-italic text.")
    assert(narr.emphasizedContents == expC && narr.emphasizedTags == expT)
    val normal = ps(2)
    assert(normal.text == "I am a normal text.")
    assert(normal.emphasizedContents.isEmpty && normal.emphasizedTags.isEmpty)
  }

  // -- test_partition_docx_includes_hyperlink_metadata ----------------------------

  test("hyperlink metadata: external links only, with run-text offsets") {
    val ps = paras("hlink-meta.docx")
    assert(ps(0).text == "One" && ps(0).linkTexts.isEmpty)
    // internal bookmark jump: no URL, no link metadata
    assert(ps(1).text == "Two with link to bookmark." && ps(1).linkTexts.isEmpty)
    assert(ps(2).text == "Three with link to foo.com.")
    assert(ps(2).linkTexts == Seq("link to foo.com"))
    assert(ps(2).linkUrls == Seq("https://foo.com"))
    assert(ps(2).linkStartIndexes == Seq(11))
    assert(ps(3).text == "Four with link to foo.com searching for bar.")
    assert(ps(3).linkUrls == Seq("https://foo.com?q=bar"))
    assert(ps(3).linkStartIndexes == Seq(10))
    assert(ps(4).text == "Five with link to foo.com introduction section.")
    assert(ps(4).linkUrls == Seq("http://foo.com/#intro"))
    assert(ps(7).text == "Eight with link to file.")
    assert(ps(7).linkUrls == Seq("court-exif.jpg"))
    assert(ps(7).linkStartIndexes == Seq(11))
    assert(ps(8).text == "Nine." && ps(8).linkTexts.isEmpty)
  }

  // -- test_it_considers_text_inside_shapes ---------------------------------------

  test("inline-shape text contributes; floating-shape text is ignored") {
    val ps = paras("docx-shapes.docx")
    assert(ps.map(_.text) == Seq(
      "Paragraph with single <inline-image> within.",
      "Paragraph with <inline-image1> and <inline-image2> within.",
      "Paragraph with floating shape attached."))
  }

  // -- picture sub-partitioning ---------------------------------------------------

  test("contains-pictures: no Image elements by default") {
    val ps = paras("contains-pictures.docx")
    assert(!ps.exists(_.elementType.contains("Image")))
    assert(ps.count(p => p.text.nonEmpty) == 5)
  }

  test("contains-pictures: injected picture partitioner runs once per paragraph") {
    // the reference's FakeParagraphPicturePartitioner yields one Image per
    // paragraph unconditionally -> 11 elements, 6 of them images (test_docx.py:591)
    object PerParagraph extends OoxmlPartitioner.DocxPicturePartitioner {
      def elements(paragraphXml: String,
          media: String => Option[Array[Byte]]): Seq[RawPara] =
        Seq(RawPara("", Some("Image")))
    }
    val ps = DocxPartitioner.partition(bytes("contains-pictures.docx"), pictures = PerParagraph)
    assert(ps.size == 11)
    assert(ps.count(_.elementType.contains("Image")) == 6)
  }

  // -- malformed tables -----------------------------------------------------------

  test("grid_offset_error: malformed merged rows do not crash") {
    val ps = paras("grid_offset_error.docx")
    assert(ps.nonEmpty)
    assert(ps.exists(_.text.strip.nonEmpty))
  }

  test("tables-with-incomplete-rows: partitions without error and keeps cell text") {
    val ps = paras("tables-with-incomplete-rows.docx")
    val tables = ps.filter(_.elementType.contains("Table"))
    assert(tables.nonEmpty)
    assert(tables.exists(_.text.nonEmpty))
  }

  // -- duplicate-paragraphs: repeated content survives as distinct elements -------

  test("duplicate paragraphs all survive partitioning") {
    val ps = paras("duplicate-paragraphs.docx")
    val texts = ps.map(_.text).filter(_.nonEmpty)
    assert(texts.distinct.size < texts.size, "expected repeated paragraph texts")
  }

  // -- test_partition_docx_assigns_deterministic_and_unique_element_ids --
  test("hash ids over duplicate paragraphs are deterministic and unique") {
    import graft.model.{Element, ElementMetadata}
    def idsOf(): Seq[String] = {
      val els = paras("duplicate-paragraphs.docx").zipWithIndex.map { case (p, i) =>
        Element(s"prov-$i", p.elementType.getOrElse("UncategorizedText"), p.text,
          "d", i.toLong, ElementMetadata(
            filename = Some("duplicate-paragraphs.docx"),
            page_number = p.pageNumber))
      }
      graft.operators.MetadataOps.assignHashIds(els).map(_.element_id)
    }
    val ids = idsOf()
    // deterministic on content even when partitioned separately
    assert(ids == idsOf())
    // unique despite identical texts (the on-page sequence feeds the hash)
    assert(ids.length == ids.distinct.length)
    assert(ids.length > 1)
  }

  // -- mock-document equivalent: style map + text cascade -------------------------

  private def zipDoc(entries: (String, String)*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    entries.foreach { case (n, c) =>
      z.putNextEntry(new java.util.zip.ZipEntry(n))
      z.write(c.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  private val mockStyles =
    """<w:styles>
      |<w:style w:type="paragraph" w:styleId="Heading1"><w:name w:val="heading 1"/></w:style>
      |<w:style w:type="paragraph" w:styleId="ListBullet"><w:name w:val="List Bullet"/></w:style>
      |<w:style w:type="paragraph" w:styleId="BodyText"><w:name w:val="Body Text"/></w:style>
      |<w:style w:type="paragraph" w:styleId="Normal"><w:name w:val="Normal"/></w:style>
      |</w:styles>""".stripMargin

  private def p(text: String, style: Option[String] = None): String = {
    val pPr = style.map(s => s"""<w:pPr><w:pStyle w:val="$s"/></w:pPr>""").getOrElse("")
    s"""<w:p>$pPr<w:r><w:t xml:space="preserve">$text</w:t></w:r></w:p>"""
  }

  test("mock document: style-based and text-parsed element types match the reference") {
    val body = Seq(
      p("These are a few of my favorite things:", Some("Heading1")),
      p("• Parrots"),
      p("• "), // -- drops: empty after bullet cleaning
      p("Hockey", Some("ListBullet")),
      p("", Some("ListBullet")), // -- drops: empty
      p("Analysis"),
      p(""), // -- drops: empty
      p("This is my first thought. This is my second thought."),
      p("This is my third thought.", Some("BodyText")),
      p("2023"),
      p("DOYLESTOWN, PA 18901")).mkString
    val doc = s"<w:document><w:body>$body</w:body></w:document>"
    val ps = typed(DocxPartitioner.partition(
      zipDoc("word/document.xml" -> doc, "word/styles.xml" -> mockStyles)))
    assert(ps == Seq(
      ("Title", "These are a few of my favorite things:"),
      ("ListItem", "Parrots"),
      ("ListItem", "Hockey"),
      ("UncategorizedText", "Analysis"),
      ("NarrativeText", "This is my first thought. This is my second thought."),
      ("NarrativeText", "This is my third thought."),
      ("UncategorizedText", "2023"),
      ("Address", "DOYLESTOWN, PA 18901")))
  }

  // -- test_parse_category_depth_by_style / _by_style_name ------------------------

  test("category depth: numPr ilvl wins, then style-name depth, else 0") {
    val body =
      s"""<w:p><w:pPr><w:pStyle w:val="ListBullet3"/><w:numPr><w:ilvl w:val="2"/>
         |<w:numId w:val="1"/></w:numPr></w:pPr><w:r><w:t>x1</w:t></w:r></w:p>
         |<w:p><w:pPr><w:pStyle w:val="Heading2"/></w:pPr><w:r><w:t>Heading text</w:t></w:r></w:p>
         |<w:p><w:pPr><w:pStyle w:val="Subtitle"/></w:pPr><w:r><w:t>Sub</w:t></w:r></w:p>
         |<w:p><w:r><w:t>plain paragraph text here</w:t></w:r></w:p>""".stripMargin
    val styles =
      """<w:styles>
        |<w:style w:styleId="ListBullet3"><w:name w:val="List Bullet 3"/></w:style>
        |<w:style w:styleId="Heading2"><w:name w:val="heading 2"/></w:style>
        |<w:style w:styleId="Subtitle"><w:name w:val="Subtitle"/></w:style>
        |</w:styles>""".stripMargin
    val ps = DocxPartitioner.partition(zipDoc(
      "word/document.xml" -> s"<w:document><w:body>$body</w:body></w:document>",
      "word/styles.xml" -> styles))
    assert(ps(0).categoryDepth.contains(2)) // ilvl beats style name
    assert(ps(1).categoryDepth.contains(1)) // heading 2 -> 1
    assert(ps(2).categoryDepth.contains(1)) // Subtitle -> 1
    assert(ps(3).categoryDepth.contains(0)) // default
  }

  // -- header_footer_type variants ------------------------------------------------

  test("first-page and even-page headers emit only when configured") {
    def doc(titlePg: Boolean) = {
      val tp = if (titlePg) "<w:titlePg/>" else ""
      s"""<w:document><w:body>
         |<w:p><w:r><w:t>Body content paragraph.</w:t></w:r></w:p>
         |<w:sectPr>$tp<w:headerReference w:type="default" r:id="rH1"/>
         |<w:headerReference w:type="first" r:id="rH2"/>
         |<w:headerReference w:type="even" r:id="rH3"/></w:sectPr>
         |</w:body></w:document>""".stripMargin
    }
    val rels =
      """<Relationships>
        |<Relationship Id="rH1" Target="header1.xml"/>
        |<Relationship Id="rH2" Target="header2.xml"/>
        |<Relationship Id="rH3" Target="header3.xml"/>
        |</Relationships>""".stripMargin
    def hdr(t: String) = s"<w:hdr><w:p><w:r><w:t>$t</w:t></w:r></w:p></w:hdr>"
    def build(titlePg: Boolean, evenOdd: Boolean) = zipDoc(
      Seq("word/document.xml" -> doc(titlePg),
        "word/_rels/document.xml.rels" -> rels,
        "word/header1.xml" -> hdr("primary hdr"),
        "word/header2.xml" -> hdr("first hdr"),
        "word/header3.xml" -> hdr("even hdr")) ++
        (if (evenOdd) Seq("word/settings.xml" -> "<w:settings><w:evenAndOddHeaders/></w:settings>")
         else Nil): _*)

    val base = DocxPartitioner.partition(build(titlePg = false, evenOdd = false))
    assert(base.filter(_.elementType.contains("Header")).map(_.headerFooterType.get) ==
      Seq("primary"))
    val withFirst = DocxPartitioner.partition(build(titlePg = true, evenOdd = false))
    assert(withFirst.filter(_.elementType.contains("Header")).map(_.headerFooterType.get) ==
      Seq("primary", "first_page"))
    val all = DocxPartitioner.partition(build(titlePg = true, evenOdd = true))
    assert(all.filter(_.elementType.contains("Header")).map(_.headerFooterType.get) ==
      Seq("primary", "first_page", "even_page"))
    assert(all.filter(_.elementType.contains("Header")).map(_.text) ==
      Seq("primary hdr", "first hdr", "even hdr"))
  }
}
