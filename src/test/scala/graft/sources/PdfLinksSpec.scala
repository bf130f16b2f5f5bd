package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/**
 * PDF hyperlink annotations → `links` metadata on the fast strategy
 * (`get_uris`/`get_uris_from_annots` `pdfminer_processing.py:965-1064`,
 * `check_annotations_within_element` `:1171-1204`, `map_bbox_and_index`
 * `:1315-1356`, assembly `pdf.py:508-557`; reference tests
 * `test_pdf.py:1083-1116`, `test_get_uris_from_annots_string_annotation`).
 */
class PdfLinksSpec extends AnyFunSuite {

  /** A 1-page PDF showing one text line with /Link annots over chosen words.
    * The text is placed at 12pt from x=72; the reader estimates glyph
    * advances at 0.5em = 6pt, so annot rects built on that same grid align
    * exactly with the estimated word boxes. */
  private def linkPdf(text: String, links: Seq[(Int, Int, String)]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val annotIds = links.indices.map(_ + 10)
    val annotRefs = annotIds.map(i => s"$i 0 R").mkString(" ")
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      s"/Contents 4 0 R /Annots [$annotRefs] >> endobj\n")
    val stream = s"BT /F1 12 Tf 72 700 Td ($text) Tj ET"
    w(s"4 0 obj << /Length ${stream.length} >> stream\n$stream\nendstream endobj\n")
    links.zip(annotIds).foreach { case ((startChar, endChar, uri), id) =>
      // chars advance 6pt from x=72; the glyph box spans y=[700, 712)
      val x1 = 72 + startChar * 6
      val x2 = 72 + endChar * 6
      val action =
        if (uri.startsWith("#")) s"<< /S /GoTo /D (${uri.substring(1)}) >>"
        else s"<< /S /URI /URI ($uri) >>"
      w(s"$id 0 obj << /Type /Annot /Subtype /Link " +
        s"/Rect [$x1 700 $x2 712] /A $action >> endobj\n")
    }
    w("trailer << /Root 1 0 R >>\n%%EOF\n")
    out.toByteArray
  }

  test("a URI link annot over one word maps to that word's text and index") {
    //          0123456789012345678901
    val text = "See the docs site now"
    val pdf = linkPdf(text, Seq((8, 12, "https://docs.example.com")))
    val paras = PdfPartitioner.partitionPdf(pdf)
    assert(paras.map(_.text) == Seq(text))
    assert(paras.head.linkTexts == Seq("docs"))
    assert(paras.head.linkUrls == Seq("https://docs.example.com"))
    assert(paras.head.linkStartIndexes == Seq(8))
  }

  test("a GoTo destination link carries the destination name as the url") {
    val text = "Jump to section five"
    val pdf = linkPdf(text, Seq((8, 15, "#cite.section5")))
    val paras = PdfPartitioner.partitionPdf(pdf)
    assert(paras.head.linkTexts == Seq("section"))
    assert(paras.head.linkUrls == Seq("cite.section5"))
    assert(paras.head.linkStartIndexes == Seq(8))
  }

  test("a multi-word annot spans from nearest start word to nearest end word") {
    val text = "Visit the user guide today"
    val pdf = linkPdf(text, Seq((10, 20, "https://g.example")))
    val paras = PdfPartitioner.partitionPdf(pdf)
    assert(paras.head.linkTexts == Seq("user guide"))
    assert(paras.head.linkStartIndexes == Seq(10))
  }

  test("multiple annots on one line accumulate in order") {
    val text = "alpha beta gamma delta"
    val pdf = linkPdf(text,
      Seq((0, 5, "https://a.example"), (11, 16, "https://c.example")))
    val paras = PdfPartitioner.partitionPdf(pdf)
    assert(paras.head.linkTexts == Seq("alpha", "gamma"))
    assert(paras.head.linkUrls == Seq("https://a.example", "https://c.example"))
    assert(paras.head.linkStartIndexes == Seq(0, 11))
  }

  test("an annot outside any text line attaches nothing") {
    val text = "No links down here"
    val out = new ByteArrayOutputStream()
    // rect far from the text line (y near the page bottom)
    val pdf = linkPdf(text, Seq.empty) // control: no annots at all
    assert(PdfPartitioner.partitionPdf(pdf).head.linkTexts.isEmpty)
    val pdf2 = {
      val base = linkPdf(text, Seq((0, 4, "https://x.example")))
      // shift the annot's rect out of the line by rewriting its y span
      new String(base, java.nio.charset.StandardCharsets.ISO_8859_1)
        .replace("/Rect [72 700 96 712]", "/Rect [72 100 96 112]")
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    }
    assert(PdfPartitioner.partitionPdf(pdf2).head.linkTexts.isEmpty)
    out.close()
  }

  // -- test_partition_pdf_hyperlinks_multiple_lines (test_pdf.py:1104-1116)
  // on the real fixture, including the reference's exact last-element pins
  test("embedded-link.pdf hyperlinks map to their words across elements") {
    val path = Paths.get("/root/reference/example-docs/pdf/embedded-link.pdf")
    assume(Files.exists(path))
    val paras = PdfPartitioner.partitionPdf(Files.readAllBytes(path))
    // the three header sentences each carry their typed link
    assert(paras(0).text == "This is the link.")
    assert(paras(0).linkTexts == Seq("link") && paras(0).linkStartIndexes == Seq(12))
    assert(paras(0).linkUrls == Seq("https://github.com/Unstructured-IO/unstructured"))
    assert(paras(1).linkTexts == Seq("email") &&
      paras(1).linkUrls == Seq("mailto:unstructuredai@earlygrowth.com"))
    assert(paras(2).linkTexts == Seq("phone number") &&
      paras(2).linkUrls == Seq("tel:6505124019"))
    // the reference pins: last element has 2 links, the last one "capturing"
    assert(paras.last.linkUrls.length == 2)
    assert(paras.last.linkTexts.last == "capturing")
    assert(paras.last.linkUrls.forall(_ == "http://www.apple.com"))
  }
}
