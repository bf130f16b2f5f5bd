package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{PdfminerGeometry, Registries}
import graft.operators.PdfminerGeometry.SourceRegion

/**
 * The auto router's hi_res / ocr_only branches become REAL when model seams
 * are registered (`partition/pdf.py:300-338` + `strategies.py:75-86`): a
 * registered layout detector satisfies the inference dependency, a registered
 * OCR agent the OCR dependency, and the strategy resolution then routes
 * non-extractable PDFs through [[PdfHiRes]] instead of returning nothing.
 */
class RouterModelSeamsSpec extends AnyFunSuite {

  /** A drawing-only one-page PDF (no text operators) — the scanned-PDF shape
    * that resolves auto → ocr_only. */
  private def noTextPdf: Array[Byte] = {
    val body = "0 0 m 5 5 l S\n0 5 m 5 0 l S\n"
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${body.length} >> stream\n")
    w(body); w("\nendstream endobj\n")
    w("trailer << /Root 1 0 R >>\n%%EOF\n")
    out.toByteArray
  }

  test("no registered seams: scanned PDF routes to no elements (fast-only engine)") {
    Registries.clearLayoutDetector()
    Registries.clearOcrAgent()
    val (ft, paras) = Partitioners.partitionAuto("scan.pdf", noTextPdf)
    assert(ft === FileType.Pdf)
    assert(paras.isEmpty)
  }

  test("registered OCR agent: scanned PDF resolves ocr_only and emits OCR elements") {
    // line-level fake OCR built through the real hOCR parser + region merge
    def wordSpan(bbox: String, text: String): String =
      s"<span class='ocrx_word' title='bbox $bbox'>" +
        text.map(c => s"<span class='ocrx_cinfo' title='x_conf 99'>$c</span>").mkString +
        "</span>"
    val hocr = "<div class='ocr_page'><span class='ocr_line'>" +
      wordSpan("10 10 60 24", "Scanned") + wordSpan("65 10 120 24", "title") +
      "</span><span class='ocr_line'>" +
      wordSpan("10 40 80 54", "body") + wordSpan("85 40 150 54", "words") +
      "</span></div>"
    val words = Hocr.parse(hocr)
    assert(words.size === 4)
    val lines = words.grouped(2).map { ws =>
      val (bbox, text) = PdfminerGeometry.mergeTextRegions(
        ws.map(w => ((w.left.toDouble, w.top.toDouble,
          (w.left + w.width).toDouble, (w.top + w.height).toDouble),
          Option(w.text))))
      SourceRegion(bbox, Some(text), isExtracted = false)
    }.toSeq
    try {
      Registries.registerOcrAgent(_ => lines)
      val (_, paras) = Partitioners.partitionAuto("scan.pdf", noTextPdf)
      assert(paras.map(_.text) === Seq("Scanned title", "body words"))
      assert(paras.forall(_.elementType.contains("UncategorizedText")))
      assert(paras.forall(_.pageNumber.contains(1)))
    } finally Registries.clearOcrAgent()
  }

  test("registered detector without OCR: scanned PDF falls back to hi_res and runs it") {
    var invoked = false
    try {
      Registries.registerLayoutDetector { pages =>
        invoked = true
        pages.map(_ => Seq(PdfminerGeometry.LayoutRegion((10, 10, 200, 50), None,
          elementType = "Table", prob = Some(0.9))))
      }
      val (_, paras) = Partitioners.partitionAuto("scan.pdf", noTextPdf)
      // the detector ran (hi_res path taken); with no embedded text and no OCR
      // the detected region aggregates no text and is dropped — faithfully
      assert(invoked)
      assert(paras.isEmpty)
    } finally Registries.clearLayoutDetector()
  }

  test("registered OCR agent: image partitions to OCR elements with real geometry") {
    // 1x1 PNG (smallest valid header) — the OCR seam supplies the text layer
    val png = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg==")
    try {
      Registries.registerOcrAgent(page =>
        Seq(SourceRegion((0, 0, page.width, page.height / 2), Some("ocr line one"),
          isExtracted = false),
          SourceRegion((0, page.height / 2, page.width, page.height),
            Some("ocr line two"), isExtracted = false)))
      val (ft, paras) = Partitioners.partitionAuto("scan.png", png)
      assert(ft === FileType.Png)
      assert(paras.map(_.text) === Seq("ocr line one", "ocr line two"))
      assert(paras.forall(_.pageNumber.contains(1)))
    } finally Registries.clearOcrAgent()
  }

  test("image without OCR agent still yields the metadata-bearing Image element") {
    Registries.clearOcrAgent()
    val png = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg==")
    val (_, paras) = Partitioners.partitionAuto("pic.png", png)
    assert(paras.map(_.elementType) === Seq(Some("Image")))
  }

  test("extractable PDF keeps routing fast even with seams registered") {
    try {
      Registries.registerLayoutDetector(pages => pages.map(_ => Nil))
      Registries.registerOcrAgent(_ => Nil)
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        "/root/reference/example-docs/pdf/layout-parser-paper-fast.pdf"))
      val (_, paras) = Partitioners.partitionAuto("paper.pdf", bytes)
      assert(paras.nonEmpty) // the fast extraction, not an empty model path
      assert(paras.exists(_.text.contains("LayoutParser")))
    } finally { Registries.clearLayoutDetector(); Registries.clearOcrAgent() }
  }
}
