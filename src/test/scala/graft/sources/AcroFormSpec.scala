package graft.sources

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

/**
 * AcroForm widget-annotation text recovery
 * (`get_widget_text_from_annots`, `pdfminer_processing.py:1078-1168`;
 * behavior tests `test_pdfminer_processing.py:380-525`): values typed into
 * fillable form fields live in `/Annots` widget objects, not the content
 * stream, and must surface from both the fast strategy and the hi_res
 * extracted layer.
 */
class AcroFormSpec extends AnyFunSuite {

  /** Mirror of the reference's `_build_synthetic_form_pdf`: a 1-page PDF with
    * an EMPTY content stream whose only text lives in /Tx and /Ch widgets. */
  private def formPdf(extraObjs: String = "", annotIds: Seq[Int] = Seq(5, 6, 7, 8)): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val refs = annotIds.map(i => s"$i 0 R").mkString(" ")
    w("%PDF-1.4\n")
    w(s"1 0 obj << /Type /Catalog /Pages 2 0 R /AcroForm << /Fields [$refs] >> >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      s"/Annots [$refs] >> endobj\n")
    w("5 0 obj << /Type /Annot /Subtype /Widget /FT /Tx /T (name) " +
      "/V (Jane Doe) /Rect [72 700 300 720] >> endobj\n")
    w("6 0 obj << /Type /Annot /Subtype /Widget /FT /Tx /T (dob) " +
      "/V (1990-01-01) /Rect [72 660 300 680] >> endobj\n")
    w("7 0 obj << /Type /Annot /Subtype /Widget /FT /Tx /T (address) " +
      "/V (123 Main Street) /Rect [72 620 300 640] >> endobj\n")
    w("8 0 obj << /Type /Annot /Subtype /Widget /FT /Tx /T (phone) " +
      "/V () /Rect [72 580 300 600] >> endobj\n")
    w(extraObjs)
    w("trailer << /Root 1 0 R >>\n%%EOF\n")
    out.toByteArray
  }

  // -- test_get_widget_text_from_annots_extracts_filled_text_fields (:419) --
  test("filled /Tx field values extract with valid top-left bboxes; empty skipped") {
    val ps = PdfPartitioner.pageStreams(formPdf())
    assert(ps.length === 1)
    assert(ps.head.widgets.map(_._1) === Seq("Jane Doe", "1990-01-01", "123 Main Street"))
    // rect [72 700 300 720] in a 792pt page -> top-left frame (72, 72, 300, 92)
    assert(ps.head.widgets.head._2 === ((72.0, 72.0, 300.0, 92.0)))
    assert(ps.head.widgets.forall { case (_, (x1, y1, x2, y2)) => x2 > x1 && y2 > y1 })
  }

  // -- test_get_widget_text_from_annots_decodes_utf16_text_without_bom (:436) --
  test("UTF-16BE hex field value decodes through the BOM") {
    val extra = "9 0 obj << /Type /Annot /Subtype /Widget /FT /Tx /T (u16) " +
      "/V <FEFF004A0061006E0065> /Rect [10 80 90 95] >> endobj\n"
    val ps = PdfPartitioner.pageStreams(formPdf(extra, Seq(9)))
    assert(ps.head.widgets.map(_._1) === Seq("Jane"))
  }

  // -- test_get_widget_text_from_annots_decodes_choice_field_value_arrays (:454) --
  test("multi-select /Ch array values newline-join") {
    val extra = "9 0 obj << /Type /Annot /Subtype /Widget /FT /Ch /T (colors) " +
      "/V [(red) (blue)] /Rect [10 80 90 95] >> endobj\n"
    val ps = PdfPartitioner.pageStreams(formPdf(extra, Seq(9)))
    assert(ps.head.widgets.map(_._1) === Seq("red\nblue"))
  }

  // -- test_get_widget_text_from_annots_inherits_field_type_and_value_from_parent (:472) --
  test("FT and V inherit from the parent field node") {
    val extra = "9 0 obj << /Type /Annot /Subtype /Widget /Parent 10 0 R " +
      "/Rect [10 80 90 95] >> endobj\n" +
      "10 0 obj << /FT /Tx /T (inherited) /V (From Parent) >> endobj\n"
    val ps = PdfPartitioner.pageStreams(formPdf(extra, Seq(9)))
    assert(ps.head.widgets.map(_._1) === Seq("From Parent"))
  }

  // -- test_partition_pdf_fast_recovers_form_field_text (:512) --
  test("fast strategy emits elements for filled form fields") {
    val paras = PdfPartitioner.partitionPdf(formPdf())
    val blob = paras.map(_.text).mkString("\n")
    assert(blob.contains("Jane Doe"))
    assert(blob.contains("1990-01-01"))
    assert(blob.contains("123 Main Street"))
    assert(!blob.contains("phone"))
  }

  // -- test_process_file_with_pdfminer_recovers_form_field_text (:497) --
  test("hi_res extracted layer includes widget values as extracted regions") {
    val pages = PdfHiRes.extractedPageLayouts(formPdf())
    val texts = pages.head.regions.flatMap(_.text)
    assert(texts.contains("Jane Doe"))
    assert(texts.contains("1990-01-01"))
    assert(texts.contains("123 Main Street"))
    assert(pages.head.regions.forall(r => r.isExtracted && r.source == "pdfminer"))
  }
}
