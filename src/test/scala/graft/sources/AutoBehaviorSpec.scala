package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase
import graft.sources.HtmlPartitioner.RawPara

/**
 * Behavior suite ported from the reference's auto-router tests
 * (`/root/reference/test_unstructured/partition/test_auto.py`) over the same
 * example documents: every file routes through `Partitioners.partitionAuto`
 * exactly as the production file-scan source does, with untyped paragraphs
 * resolving through the per-format classifier cascade.
 */
class AutoBehaviorSpec extends SparkSuiteBase {

  private val docs = "/root/reference/example-docs/"

  private def route(name: String): (FileType, Seq[RawPara]) =
    Partitioners.partitionAuto(name.split('/').last,
      Files.readAllBytes(Paths.get(docs + name)))

  /** (type, text) pairs after the per-format derive cascade, including the
    * derived-ListItem bullet cleaning the production query path applies. */
  private def typed(ps: Seq[RawPara]): Seq[(String, String)] = {
    val sp = spark
    import sp.implicits._
    val df = ps.zipWithIndex
      .map { case (p, i) => (i, p.elementType.orNull, p.text, p.classifier) }
      .toDF("i", "raw_type", "text", "classifier")
    val derived = HtmlSource.classifierCascade(col("classifier"), col("text"))
    df.select(col("i"), coalesce(col("raw_type"), derived).as("t"),
        when(col("raw_type").isNull && derived === "ListItem",
          graft.functions.Cleaners.cleanBullets(col("text")))
          .otherwise(col("text")).as("text"))
      .filter(col("t").isNotNull && (col("raw_type").isNotNull || col("text") =!= ""))
      .orderBy("i").collect().toSeq.map(r => (r.getString(1), r.getString(2)))
  }

  private val ExpectedStanleyText =
    "Stanley Cups Team Location Stanley Cups Blues STL 1 Flyers PHI 2 Maple Leafs TOR 13"
  private val ExpectedStanleyTable =
    "<table>" +
      "<tr><td>Stanley Cups</td><td/><td/></tr>" +
      "<tr><td>Team</td><td>Location</td><td>Stanley Cups</td></tr>" +
      "<tr><td>Blues</td><td>STL</td><td>1</td></tr>" +
      "<tr><td>Flyers</td><td>PHI</td><td>2</td></tr>" +
      "<tr><td>Maple Leafs</td><td>TOR</td><td>13</td></tr>" +
      "</table>"

  private val ExpectedDocxElements = Seq(
    ("Title", "These are a few of my favorite things:"),
    ("ListItem", "Parrots"),
    ("ListItem", "Hockey"),
    ("UncategorizedText", "Analysis"),
    ("NarrativeText", "This is my first thought. This is my second thought."),
    ("NarrativeText", "This is my third thought."),
    ("UncategorizedText", "2023"),
    ("Address", "DOYLESTOWN, PA 18901"))

  private val ExpectedPptxElements = Seq(
    ("Title", "Adding a Bullet Slide"),
    ("ListItem", "Find the bullet slide layout"),
    ("ListItem", "Use _TextFrame.text for first bullet"),
    ("ListItem", "Use _TextFrame.add_paragraph() for subsequent bullets"),
    ("NarrativeText", "Here is a lot of text!"),
    ("NarrativeText", "Here is some text in a text box!"))

  test("csv routes to one Table with the stanley-cups text and html") {
    val (ft, ps) = route("stanley-cups.csv")
    assert(ft == FileType.Csv && ft.mimeType == "text/csv")
    assert(HtmlPartitioner.normalizeWs(ps.head.text) == ExpectedStanleyText)
    assert(ps.head.textAsHtml.contains(ExpectedStanleyTable))
  }

  test("tsv routes to one Table with the stanley-cups text and html") {
    val (ft, ps) = route("stanley-cups.tsv")
    assert(ft == FileType.Tsv && ft.mimeType == "text/tsv")
    assert(HtmlPartitioner.normalizeWs(ps.head.text) == ExpectedStanleyText)
    assert(ps.head.textAsHtml.contains(ExpectedStanleyTable))
  }

  test("docx routes to the expected_docx_elements fixture stream") {
    val (ft, ps) = route("simple.docx")
    assert(ft == FileType.Docx)
    assert(typed(ps) == ExpectedDocxElements)
  }

  test("legacy doc routes to the same text stream as its docx twin") {
    // the reference converts .doc -> .docx via LibreOffice before partitioning;
    // the native Word-97 reader recovers the text stream but not paragraph
    // styles, so types come from the text cascade alone (documented seam)
    val (ft, ps) = route("simple.doc")
    assert(ft == FileType.Doc)
    assert(typed(ps).map(_._2) == ExpectedDocxElements.map(_._2))
  }

  test("eml routes to the EXPECTED_EMAIL_OUTPUT stream") {
    val (ft, ps) = route("eml/fake-email.eml")
    assert(ft == FileType.Eml)
    assert(typed(ps) == Seq(
      ("NarrativeText", "This is a test email to use for unit tests."),
      ("UncategorizedText", "Important points:"),
      ("ListItem", "Roses are red"),
      ("ListItem", "Violets are blue")))
  }

  test("txt routes through the text cascade; all-whitespace file yields nothing") {
    val (ft, ps) = route("fake-text.txt")
    assert(ft == FileType.Txt)
    assert(typed(ps) == Seq(
      ("NarrativeText", "This is a test document to use for unit tests."),
      ("Address", "Doylestown, PA 18901"),
      ("Title", "Important points:"),
      ("ListItem", "Hamburgers are delicious"),
      ("ListItem", "Dogs are the best"),
      ("ListItem", "I love fuzzy blankets")))
    assert(typed(route("fake-text-all-whitespace.txt")._2).isEmpty)
  }

  test("pptx routes to the EXPECTED_PPTX_OUTPUT stream") {
    val (ft, ps) = route("fake-power-point.pptx")
    assert(ft == FileType.Pptx)
    assert(typed(ps) == ExpectedPptxElements)
  }

  test("xlsx routes to two title/table subtable pairs across two sheets") {
    val (ft, ps) = route("stanley-cups.xlsx")
    assert(ft == FileType.Xlsx)
    assert(ps.size == 4)
    assert(ps.count(_.elementType.contains("Table")) == 2)
    assert(HtmlPartitioner.normalizeWs(ps(0).text) == "Stanley Cups")
    assert(HtmlPartitioner.normalizeWs(ps(1).text) ==
      "Team Location Stanley Cups Blues STL 1 Flyers PHI 2 Maple Leafs TOR 13")
    assert(ps(1).textAsHtml.contains(
      "<table>" +
        "<tr><td>Team</td><td>Location</td><td>Stanley Cups</td></tr>" +
        "<tr><td>Blues</td><td>STL</td><td>1</td></tr>" +
        "<tr><td>Flyers</td><td>PHI</td><td>2</td></tr>" +
        "<tr><td>Maple Leafs</td><td>TOR</td><td>13</td></tr>" +
        "</table>"))
    assert(ps.take(2).flatMap(_.pageNumber) == Seq(1, 1))
    assert(ps.drop(2).flatMap(_.pageNumber) == Seq(2, 2))
  }

  test("epub routes with the Gutenberg header near the stream head") {
    val (ft, ps) = route("winter-sports.epub")
    assert(ft == FileType.Epub)
    assert(ps.exists(_.text.startsWith("The Project Gutenberg eBook of Winter Sports")))
  }

  test("org and rst route through pandoc-style conversion") {
    val (ftOrg, psOrg) = route("README.org")
    assert(ftOrg == FileType.Org && psOrg.nonEmpty)
    val (ftRst, psRst) = route("README.rst")
    assert(ftRst == FileType.Rst && psRst.nonEmpty)
    assert(psRst.exists(_.text.contains("Example Docs")) ||
      psOrg.exists(_.text.contains("Example Docs")))
  }

  // -- test_auto_partition_respects_skip_infer_table_types (test_auto.py:1183)
  test("skip_infer_table_types suppresses text_as_html per filetype") {
    val csv = Files.readAllBytes(Paths.get(docs + "stanley-cups.csv"))
    val (_, withHtml) = Partitioners.partitionAuto("stanley-cups.csv", csv)
    assert(withHtml.exists(_.textAsHtml.isDefined))
    val (_, noHtml) = Partitioners.partitionAuto("stanley-cups.csv", csv,
      skipInferTableTypes = Seq("csv"))
    assert(noHtml.nonEmpty && noHtml.forall(_.textAsHtml.isEmpty))
    assert(noHtml.map(_.text) == withHtml.map(_.text))
    // the xlsx twin honors the same list
    val xlsx = Files.readAllBytes(Paths.get(docs + "stanley-cups.xlsx"))
    val (_, noXlsxHtml) = Partitioners.partitionAuto("stanley-cups.xlsx", xlsx,
      skipInferTableTypes = Seq("xlsx"))
    assert(noXlsxHtml.forall(_.textAsHtml.isEmpty))
  }

  // -- decide_table_extraction (auto.py:323-338)
  test("decide_table_extraction honors the pdf legacy override") {
    import Partitioners.decideTableExtraction
    val skip = Partitioners.DefaultSkipInferTableTypes
    assert(!decideTableExtraction(FileType.Pdf, skip))
    assert(decideTableExtraction(FileType.Pdf, skip, pdfInferTableStructure = true))
    assert(decideTableExtraction(FileType.Xlsx, skip))
    assert(!decideTableExtraction(FileType.Xlsx, Seq("xlsx")))
  }

  // -- test_auto_partition_xlsx_respects_starting_page_number_argument (:899)
  test("starting_page_number offsets sheet pages in auto xlsx and xls") {
    val xlsx = Files.readAllBytes(Paths.get(docs + "stanley-cups.xlsx"))
    val (_, shifted) = Partitioners.partitionAuto("stanley-cups.xlsx", xlsx,
      startingPageNumber = 3)
    assert(shifted.take(2).forall(_.pageNumber.contains(3)))
    assert(shifted.drop(2).forall(_.pageNumber.contains(4)))
    val xls = Files.readAllBytes(Paths.get(docs + "tests-example.xls"))
    val (_, xlsShifted) = Partitioners.partitionAuto("tests-example.xls", xls,
      startingPageNumber = 5)
    assert(xlsShifted.head.pageNumber.contains(5))
    assert(xlsShifted.map(_.pageNumber.getOrElse(0)).max >= 6)
  }

  // -- test_auto_partition_raises_with_bad_type (test_auto.py:943-960)
  test("strict mode raises the reference error for unpartitionable types") {
    val junk = Array[Byte](0x01, 0x02, 0x03, 0x00, 0x7f)
    // lenient default: skip-and-continue for a distributed sweep
    val (ft, paras) = Partitioners.partitionAuto("made-up.fake", junk)
    assert(ft == FileType.Unknown && paras.isEmpty)
    val e = intercept[Partitioners.UnsupportedFileFormatError](
      Partitioners.partitionAuto("made-up.fake", junk, strict = true))
    assert(e.getMessage ==
      "Partitioning is not supported for the FileType.UNKNOWN file type.")
    // zip containers are detected but not partitionable
    val zipMagic = Array[Byte](0x50, 0x4b, 0x05, 0x06) ++ new Array[Byte](18)
    assertThrows[Partitioners.UnsupportedFileFormatError](
      Partitioners.partitionAuto("a.zip", zipMagic, strict = true))
  }

  // -- test_partition_xlsx_password_protected_raises_exception
  // (test_xlsx.py:172-175): an encrypted workbook is a CFB container wrapping
  // EncryptedPackage — detected by extension as XLSX (not msg), raising
  // UnprocessableEntityError from partition_xlsx, skipped by the lenient router
  test("a password-protected xlsx detects as xlsx and is unprocessable") {
    val bytes = Files.readAllBytes(Paths.get(
      "/root/reference/example-docs/password_protected.xlsx"))
    assert(DetectFiletype.detect("password_protected.xlsx", bytes) == FileType.Xlsx)
    val e = intercept[OoxmlPartitioner.UnprocessableEntityError](
      OoxmlPartitioner.partitionXlsx(bytes))
    assert(e.getMessage.contains("encrypted"))
    // lenient auto: skip-and-continue; strict: propagate
    val (ft, paras) = Partitioners.partitionAuto("password_protected.xlsx", bytes)
    assert(ft == FileType.Xlsx && paras.isEmpty)
    assertThrows[OoxmlPartitioner.UnprocessableEntityError](
      Partitioners.partitionAuto("password_protected.xlsx", bytes, strict = true))
  }

  // -- test_auto_partition_from_filename_works_on_empty_file (:1398-1404)
  test("an empty file partitions to zero elements, even in strict mode") {
    val (ft, paras) = Partitioners.partitionAuto("empty.txt", Array.emptyByteArray,
      strict = true)
    assert(ft == FileType.Empty && paras.isEmpty)
  }

  // -- test_auto_partition_adds_filetype_to_metadata (:1202-1232) — the
  // -- recorded metadata.filetype per (content_type, detected) combination
  test("a recognized content-type records its canonical mime, overriding detection") {
    assert(Partitioners.recordedFiletype(Some("text/csv"), FileType.Pdf)
      .contains("text/csv"))
    assert(Partitioners.recordedFiletype(Some("text/html"), FileType.Pdf)
      .contains("text/html"))
  }

  test("an unrecognized content-type records NULL filetype") {
    assert(Partitioners.recordedFiletype(Some("jdsfjdfsjkds"), FileType.Pdf).isEmpty)
  }

  test("a content-type alias records the CANONICAL mime, not the alias") {
    // auto.py:204-206: FileType.from_mime_type(content_type).mime_type
    assert(Partitioners.recordedFiletype(Some("application/x-markdown"), FileType.Md)
      .isEmpty) // not an alias the reference knows either
    assert(Partitioners.recordedFiletype(Some("text/x-markdown"), FileType.Txt)
      .contains("text/markdown"))
    assert(Partitioners.recordedFiletype(Some("application/epub+zip"), FileType.Epub)
      .contains("application/epub"))
    // RFC 9110 parameters are stripped before the lookup
    assert(Partitioners.recordedFiletype(Some("text/plain; charset=utf-8"),
      FileType.Pdf).contains("text/plain"))
  }

  // -- test_auto_partition_overwrites_any_filetype_applied_by_file_specific_partitioner
  test("absent a content-type, the DETECTED type's mime is recorded unconditionally") {
    // the overwrite applies whatever a file-specific partitioner set — the
    // recorded value is a pure function of (content_type, detected), with no
    // partitioner-provided input at all
    assert(Partitioners.recordedFiletype(None, FileType.Pdf)
      .contains("application/pdf"))
    assert(Partitioners.recordedFiletype(None, FileType.Unknown)
      .contains("application/octet-stream"))
  }

  // -- test_auto_partition_applies_the_correct_filetype_for_all_filetypes
  // -- (:1265-1306), re-expressed detection-true: the router's detected type
  // -- and its recorded mime for every example doc in the matrix. (The
  // -- reference parametrizes tests-example.xls as XLSX because it calls
  // -- partition_xlsx DIRECTLY — pandas reads both; detection yields XLS.)
  private val filetypeMatrix = Seq(
    ("stanley-cups.csv", FileType.Csv, "text/csv"),
    ("simple.doc", FileType.Doc, "application/msword"),
    ("simple.docx", FileType.Docx,
      "application/vnd.openxmlformats-officedocument.wordprocessingml.document"),
    ("eml/fake-email.eml", FileType.Eml, "message/rfc822"),
    ("winter-sports.epub", FileType.Epub, "application/epub"),
    ("example-10k-1p.html", FileType.Html, "text/html"),
    ("README.md", FileType.Md, "text/markdown"),
    ("fake-email.msg", FileType.Msg, "application/vnd.ms-outlook"),
    ("simple.odt", FileType.Odt, "application/vnd.oasis.opendocument.text"),
    ("pdf/DA-1p.pdf", FileType.Pdf, "application/pdf"),
    ("fake-power-point.ppt", FileType.Ppt, "application/vnd.ms-powerpoint"),
    ("simple.pptx", FileType.Pptx,
      "application/vnd.openxmlformats-officedocument.presentationml.presentation"),
    ("README.rst", FileType.Rst, "text/x-rst"),
    ("fake-doc.rtf", FileType.Rtf, "text/rtf"),
    ("stanley-cups.tsv", FileType.Tsv, "text/tsv"),
    ("fake-text.txt", FileType.Txt, "text/plain"),
    ("tests-example.xls", FileType.Xls, "application/vnd.ms-excel"),
    ("stanley-cups.xlsx", FileType.Xlsx,
      "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"),
    ("factbook.xml", FileType.Xml, "application/xml"))

  filetypeMatrix.foreach { case (name, expectedFt, expectedMime) =>
    test(s"filetype matrix: $name routes as ${expectedFt.name} recording $expectedMime") {
      val (ft, paras) = route(name)
      assert(ft == expectedFt)
      assert(paras.nonEmpty, s"$name produced no elements")
      assert(Partitioners.recordedFiletype(None, ft).contains(expectedMime))
    }
  }

  // -- test_auto_partition_html_from_filename / _pdf_from_filename content-type
  // -- permutations (:230-268, :493-543): an asserted matching content-type
  // -- must not change the routed element stream
  test("html routes identically with and without an asserted text/html content-type") {
    val bytes = Files.readAllBytes(Paths.get(docs + "example-10k-1p.html"))
    val plain = Partitioners.partitionAuto("example-10k-1p.html", bytes)
    val asserted = Partitioners.partitionAuto("example-10k-1p.html", bytes,
      contentType = Some("text/html"))
    assert(plain._1 == FileType.Html && asserted._1 == FileType.Html)
    assert(plain._2.nonEmpty && plain._2 == asserted._2)
  }

  test("pdf routes identically with and without an asserted application/pdf content-type") {
    val bytes = Files.readAllBytes(Paths.get(docs + "pdf/layout-parser-paper-fast.pdf"))
    val plain = Partitioners.partitionAuto("layout-parser-paper-fast.pdf", bytes)
    val asserted = Partitioners.partitionAuto("layout-parser-paper-fast.pdf", bytes,
      contentType = Some("application/pdf"))
    assert(plain._1 == FileType.Pdf && asserted._1 == FileType.Pdf)
    assert(plain._2.nonEmpty && plain._2 == asserted._2)
  }

  // -- content-type vs detection DISAGREEMENT --
  test("binary magic beats a junk asserted content-type (pdf stays pdf)") {
    val bytes = Files.readAllBytes(Paths.get(docs + "pdf/layout-parser-paper-fast.pdf"))
    val (ft, paras) = Partitioners.partitionAuto("layout-parser-paper-fast.pdf",
      bytes, contentType = Some("jdsfjdfsjkds"))
    assert(ft == FileType.Pdf && paras.nonEmpty)
    // ...but the RECORDED filetype is NULL: the caller's assertion was junk
    assert(Partitioners.recordedFiletype(Some("jdsfjdfsjkds"), ft).isEmpty)
  }

  test("a recognized asserted type beats extension for magicless text (csv as html)") {
    // strategy order (filetype.py:200-231): magic, ASSERTED type, sniff,
    // extension — a caller asserting text/html on a .csv routes to the HTML
    // partitioner (the reference trusts the caller for non-container types)
    val bytes = Files.readAllBytes(Paths.get(docs + "stanley-cups.csv"))
    val (ft, paras) = Partitioners.partitionAuto("stanley-cups.csv", bytes,
      contentType = Some("text/html"))
    assert(ft == FileType.Html && paras.nonEmpty)
    // and a container-type assertion on non-container bytes is RULED OUT by
    // the missing magic: the CSV still sniffs as CSV (filetype.py refinement)
    val (ft2, _) = Partitioners.partitionAuto("stanley-cups.csv", bytes,
      contentType = Some("application/vnd.ms-excel"))
    assert(ft2 == FileType.Csv)
  }
}
