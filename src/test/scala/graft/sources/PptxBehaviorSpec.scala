package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase
import graft.sources.PptxPartitioner.PptxOptions
import graft.sources.HtmlPartitioner.RawPara

/**
 * Behavior suite ported from the reference's PPTX tests
 * (`/root/reference/test_unstructured/partition/test_pptx.py`) over the same
 * example decks. Untyped body paragraphs resolve through the production
 * `classifier = "pptx"` cascade.
 */
class PptxBehaviorSpec extends SparkSuiteBase {

  private val docs = "/root/reference/example-docs/"

  private def bytes(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(docs + name))

  private def paras(name: String, opts: PptxOptions = PptxOptions()): Seq[RawPara] =
    PptxPartitioner.partition(bytes(name), opts)

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

  // -- test_partition_pptx_from_filename ------------------------------------------

  test("fake-power-point: title, bullets, narrative order matches the reference") {
    val ps = typed(paras("fake-power-point.pptx"))
    assert(ps == Seq(
      ("Title", "Adding a Bullet Slide"),
      ("ListItem", "Find the bullet slide layout"),
      ("ListItem", "Use _TextFrame.text for first bullet"),
      ("ListItem", "Use _TextFrame.add_paragraph() for subsequent bullets"),
      ("NarrativeText", "Here is a lot of text!"),
      ("NarrativeText", "Here is some text in a text box!")))
  }

  // -- test_partition_pptx_recurses_into_group_shapes -----------------------------

  test("group shapes recurse in document order") {
    val ps = paras("group-shapes-nested.pptx")
    assert(ps.map(_.text) == Seq("A", "B", "C", "D", "E", "F", "G", "H", "I", "J"))
  }

  // -- page-break behaviors -------------------------------------------------------

  test("many-pages: page numbers track slides; PageBreaks carry no page gaps") {
    val ps = paras("fake-power-point-many-pages.pptx")
    val pages = ps.filterNot(_.elementType.contains("PageBreak"))
      .flatMap(_.pageNumber).toSet
    assert(pages == Set(1, 2))
    assert(ps.count(_.elementType.contains("PageBreak")) == 1)
  }

  test("page breaks toggle off leaves page numbers intact") {
    val ps = paras("fake-power-point-many-pages.pptx",
      PptxOptions(includePageBreaks = false))
    assert(!ps.exists(_.elementType.contains("PageBreak")))
    assert(ps.flatMap(_.pageNumber).toSet == Set(1, 2))
  }

  // -- test_partition_pptx_grabs_tables / infer_table_structure -------------------

  test("tables: cell matrix renders to compact html and space-joined text") {
    val ps = paras("fake-power-point-table.pptx")
    val t = ps.find(_.elementType.contains("Table")).get
    assert(t.text.startsWith("Column 1"))
    assert(t.text.strip.endsWith("Aqua"))
    assert(t.textAsHtml.contains(
      "<table>" +
        "<tr><td>Column 1</td><td>Column 2</td><td>Column 3</td></tr>" +
        "<tr><td>Red</td><td>Green</td><td>Blue</td></tr>" +
        "<tr><td>Purple</td><td>Orange</td><td>Yellow</td></tr>" +
        "<tr><td>Tangerine</td><td>Pink</td><td>Aqua</td></tr>" +
        "</table>"))
  }

  test("infer_table_structure=false drops text_as_html but keeps table text") {
    val ps = paras("fake-power-point-table.pptx", PptxOptions(inferTableStructure = false))
    val t = ps.find(_.elementType.contains("Table")).get
    assert(t.textAsHtml.isEmpty && t.text.nonEmpty)
  }

  // -- test_partition_pptx_malformed ----------------------------------------------

  test("malformed deck still partitions") {
    val ps = paras("fake-power-point-malformed.pptx")
    assert(ps.map(_.text).take(2) == Seq("Problem Date Placeholder", "Test Slide"))
  }

  // -- picture sub-partitioning ---------------------------------------------------

  test("no Image elements by default; registered partitioner receives p:pic shapes") {
    assert(!paras("picture.pptx").exists(_.elementType.contains("Image")))
    object PerPicture extends PptxPartitioner.PptxPicturePartitioner {
      def elements(pictureXml: String,
          media: String => Option[Array[Byte]]): Seq[RawPara] =
        Seq(RawPara("", Some("Image")))
    }
    val ps = PptxPartitioner.partition(bytes("picture.pptx"), pictures = PerPicture)
    assert(ps.count(_.elementType.contains("Image")) >= 1)
  }

  // -- test_partition_pptx_uses_registered_picture_partitioner (test_pptx.py:290):
  // -- the reference's FakePicturePartitioner hashes the picture BLOB — its
  // -- pinned sha1 proves the media callback hands over the image bytes
  // -- byte-exactly --
  test("the picture partitioner's media callback delivers the exact image blob") {
    object HashPicture extends PptxPartitioner.PptxPicturePartitioner {
      def elements(pictureXml: String,
          media: String => Option[Array[Byte]]): Seq[RawPara] = {
        val rid = """r:embed="([^"]+)"""".r
          .findFirstMatchIn(pictureXml).map(_.group(1))
        val sha1 = rid.flatMap(media).map(b =>
          java.security.MessageDigest.getInstance("SHA-1").digest(b)
            .map("%02x".format(_)).mkString)
        Seq(RawPara(s"Image with hash ${sha1.getOrElse("missing")}, " +
          "strategy: fast", Some("Image")))
      }
    }
    val ps = PptxPartitioner.partition(bytes("picture.pptx"), pictures = HashPicture)
    val imgs = ps.filter(_.elementType.contains("Image"))
    assert(imgs.size == 1)
    assert(imgs.head.text ==
      "Image with hash b0a1e6cf904691e6fa42bd9e72acc2b05280dc86, strategy: fast")
  }

  // -- test_partition_pptx_title_shape_detection ----------------------------------

  private def zipDeck(entries: (String, String)*): Array[Byte] = {
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

  private def sp(body: String): String = s"<p:sp>$body</p:sp>"
  private def ap(text: String, attrs: String = ""): String =
    s"<a:p>$attrs<a:r><a:t>$text</a:t></a:r></a:p>"
  private def slide(shapes: String): String =
    s"<p:sld><p:cSld><p:spTree>$shapes</p:spTree></p:cSld></p:sld>"

  test("title shape: each paragraph is a Title with incrementing depth") {
    val s = slide(sp(
      "<p:nvSpPr><p:nvPr><p:ph type=\"title\"/></p:nvPr></p:nvSpPr><p:txBody>" +
        ap("This is a title, it's a bit long so we can make sure it's not narrative text") +
        ap("this is a subtitle") + "</p:txBody>"))
    val ps = PptxPartitioner.partition(zipDeck("ppt/slides/slide1.xml" -> s))
    assert(ps(0).elementType.contains("Title") && ps(0).categoryDepth.contains(0))
    assert(ps(1).elementType.contains("Title") && ps(1).categoryDepth.contains(1))
    assert(ps(1).text == "this is a subtitle")
  }

  // -- test_partition_pptx_level_detection ----------------------------------------

  test("paragraph lvl attribute becomes category_depth") {
    val s = slide(
      sp("<p:nvSpPr><p:nvPr><p:ph type=\"title\"/></p:nvPr></p:nvSpPr><p:txBody>" +
        ap("This is a title, it's a bit long so we can make sure it's not narrative text") +
        "</p:txBody>") +
        sp("<p:txBody>" +
          ap("this is the root level bullet") +
          ap("this is the level 1 bullet", "<a:pPr lvl=\"1\"/>") +
          ap("this is the level 2 bullet", "<a:pPr lvl=\"2\"/>") + "</p:txBody>"))
    val ps = PptxPartitioner.partition(zipDeck("ppt/slides/slide1.xml" -> s))
    assert(ps.map(_.categoryDepth.get) == Seq(0, 0, 1, 2))
    val ts = typed(ps)
    assert(ts.map(_._1) == Seq("Title", "NarrativeText", "NarrativeText", "NarrativeText"))
  }

  // -- ordering behaviors (test_partition_pptx_orders_elements) -------------------

  test("shapes order by (top, left); off-slide shapes are skipped") {
    def box(text: String, x: Long, y: Long): String =
      sp("<p:spPr><a:xfrm><a:off x=\"" + x + "\" y=\"" + y + "\"/></a:xfrm></p:spPr>" +
        "<p:txBody>" + ap(text) + "</p:txBody>")
    val s = slide(
      box("This is lower and should come second", 1828800, 1828800) +
        box("This is off the page and shouldn't appear", -9144000, -9144000) +
        box("", 1828800, 1828800) +
        box("This is higher and should come first", 914400, 914400) +
        box("-------------TOP-------------", 457200, 914400))
    val ps = PptxPartitioner.partition(zipDeck("ppt/slides/slide1.xml" -> s))
    assert(ps.map(_.text) == Seq(
      "-------------TOP-------------",
      "This is higher and should come first",
      "This is lower and should come second"))
  }

  // -- slide notes ----------------------------------------------------------------

  test("slide notes emit one NarrativeText when enabled, nothing by default") {
    val s = slide(sp("<p:txBody>" + ap("Main body text for the slide.") + "</p:txBody>"))
    val notes = slide(
      sp("<p:nvSpPr><p:nvPr><p:ph type=\"body\"/></p:nvPr></p:nvSpPr><p:txBody>" +
        ap("These are the speaker notes.") + "</p:txBody>"))
    val deck = zipDeck(
      "ppt/slides/slide1.xml" -> s,
      "ppt/slides/_rels/slide1.xml.rels" ->
        ("<Relationships><Relationship Id=\"rId9\" " +
          "Type=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships/notesSlide\" " +
          "Target=\"../notesSlides/notesSlide1.xml\"/></Relationships>"),
      "ppt/notesSlides/notesSlide1.xml" -> notes)
    assert(!PptxPartitioner.partition(deck).exists(_.text.contains("speaker notes")))
    val withNotes = PptxPartitioner.partition(deck, PptxOptions(includeSlideNotes = true))
    assert(withNotes.head.elementType.contains("NarrativeText"))
    assert(withNotes.head.text == "These are the speaker notes.")
  }
}
