package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The remaining untested PDF fixtures: the two multi-hundred-page documents
  * (object-model reader at depth — page-tree walking, per-page fonts, xref
  * scale) and the single-page excerpts whose filenames LOOK multi-page
  * (interface-config-guide-p93 = page 93 of the guide, /Count 1). */
class PdfLargeDocSpec extends AnyFunSuite {

  private def paras(n: String) =
    PdfPartitioner.partitionPdf(Files.readAllBytes(
      Paths.get(s"/root/reference/example-docs/pdf/$n")))

  test("DA-619p.pdf: all 619 pages extract in order") {
    val ps = paras("DA-619p.pdf")
    val pages = ps.flatMap(_.pageNumber)
    assert(pages.max == 619)
    assert(pages == pages.sorted)
    assert(ps.size > 25000)
    assert(ps.head.text == "Table of Contents")
  }

  test("pdf2image-memory-error-test-400p.pdf extracts every page, bounded") {
    val ps = paras("pdf2image-memory-error-test-400p.pdf")
    val pages = ps.flatMap(_.pageNumber)
    assert(pages.max >= 399)
    assert(pages == pages.sorted)
    assert(ps.exists(_.text.contains("EFFECTIVE DATE")))
  }

  test("single-page excerpts parse their one dense page") {
    val guide = paras("interface-config-guide-p93.pdf")
    assert(guide.head.text.startsWith("Interface Configuration Guide"))
    assert(guide.flatMap(_.pageNumber).distinct == Seq(1))
    val backus = paras("a1977-backus-p21.pdf")
    assert(backus.exists(_.text.contains("functions")))
    assert(backus.flatMap(_.pageNumber).distinct == Seq(1))
    val korean = paras("korean-text-with-tables.pdf")
    assert(korean.nonEmpty)
  }
}
