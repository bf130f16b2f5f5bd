package graft.sources

import java.nio.charset.StandardCharsets.ISO_8859_1
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CorpusBytes
import graft.queries.CorpusBytes.Doc
import PdfStrategy.{Auto, Decision, Deps, Fast, HiRes, OcrOnly}

/**
 * PDF/image strategy resolution (`partition/strategies.py:8-109`) and the
 * vector-drawing complexity probe (`partition/pdf.py:618-744`), including the
 * reference's own parametrized fallback table
 * (`test_unstructured/partition/test_strategies.py`).
 */
class PdfStrategySpec extends AnyFunSuite {

  private val doc = Doc(1L, "alpha beta gamma", Seq("one para", "two para"),
    "alpha", "src", 42L)

  // ------------------------------------------------------------ validate_strategy

  test("validate_strategy: unknown name and fast-on-image are rejected") {
    assert(PdfStrategy.validateStrategy("fastest") ==
      Some("fastest is not a valid strategy."))
    assert(PdfStrategy.validateStrategy(Fast, isImage = true) ==
      Some("The fast strategy is not available for image files."))
    assert(PdfStrategy.validateStrategy(Fast).isEmpty)
    assert(PdfStrategy.validateStrategy(Auto, isImage = true).isEmpty)
  }

  // ----------------------------------------------- determine_pdf_or_image_strategy

  test("auto resolution: image -> hi_res, tables/images -> hi_res, text -> fast, else ocr_only") {
    val deps = Deps(inference = true, ocr = true)
    assert(PdfStrategy.determineStrategy(Auto, isImage = true, deps = deps) ==
      Right(HiRes))
    assert(PdfStrategy.determineStrategy(Auto, pdfTextExtractable = true,
      inferTableStructure = true, deps = deps) == Right(HiRes))
    assert(PdfStrategy.determineStrategy(Auto, pdfTextExtractable = true,
      extractImagesInPdf = true, deps = deps) == Right(HiRes))
    assert(PdfStrategy.determineStrategy(Auto, pdfTextExtractable = true,
      deps = deps) == Right(Fast))
    assert(PdfStrategy.determineStrategy(Auto, deps = deps) == Right(OcrOnly))
  }

  // test_strategies.py::test_determine_pdf_or_image_strategy fallback table
  test("dependency fallbacks: hi_res -> ocr_only -> fast chain") {
    // hi_res without the layout model falls to ocr_only when OCR exists
    assert(PdfStrategy.determineStrategy(HiRes, deps = Deps(ocr = true)) ==
      Right(OcrOnly))
    // ...and to fast when it doesn't (text must be extractable or it's the dead end)
    assert(PdfStrategy.determineStrategy(HiRes, pdfTextExtractable = true,
      deps = Deps()) == Right(Fast))
    // ocr_only without OCR falls to fast when text is extractable
    assert(PdfStrategy.determineStrategy(OcrOnly, pdfTextExtractable = true,
      deps = Deps()) == Right(Fast))
    // ...and to hi_res when it isn't
    assert(PdfStrategy.determineStrategy(OcrOnly, deps = Deps(inference = true)) ==
      Right(HiRes))
    // fully-available deps keep the requested strategy
    assert(PdfStrategy.determineStrategy(HiRes,
      deps = Deps(inference = true, ocr = true)) == Right(HiRes))
  }

  test("no deps + no extractable text is the reference's ValueError dead end") {
    val res = PdfStrategy.determineStrategy(Auto, deps = Deps())
    assert(res.isLeft)
    assert(res.swap.exists(_.contains("not extractable")))
    // but a requested fast strategy with extractable text never errors
    assert(PdfStrategy.determineStrategy(Fast, pdfTextExtractable = true,
      deps = Deps()) == Right(Fast))
  }

  // --------------------------------------------------------- is_pdf_too_complex

  test("complexity probe flags a dense vector page at lowered thresholds") {
    val vector = CorpusBytes.vectorPdf(doc)
    assert(PdfStrategy.isPdfTooComplex(vector, maxGraphicsOps = 100,
      minFileSizeBytes = 1024, minRawStreamBytes = 256))
    // graphics count below the op threshold -> not complex
    assert(!PdfStrategy.isPdfTooComplex(vector, maxGraphicsOps = 100000,
      minFileSizeBytes = 1024, minRawStreamBytes = 256))
    // file below the size floor skips the probe entirely
    assert(!PdfStrategy.isPdfTooComplex(vector, maxGraphicsOps = 100,
      minFileSizeBytes = 1 << 20, minRawStreamBytes = 256))
    // stream below the raw-stream floor skips operator counting
    assert(!PdfStrategy.isPdfTooComplex(vector, maxGraphicsOps = 100,
      minFileSizeBytes = 1024, minRawStreamBytes = 1 << 20))
  }

  test("complexity probe at DEFAULT thresholds on a >1MB vector PDF") {
    // 70k path segments (~210k graphics ops, >1 MB decoded stream), zero text
    val ops = new StringBuilder()
    var i = 0
    while (i < 70000) { ops.append(i % 997).append(" 0 m 10 ")
      .append(i % 7).append(" l S\n"); i += 1 }
    val big = {
      val body = ops.toString.getBytes(ISO_8859_1)
      val out = new java.io.ByteArrayOutputStream()
      def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
      w("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
      w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
      w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
      w(s"4 0 obj << /Length ${body.length} >> stream\n")
      out.write(body); w("\nendstream endobj\ntrailer << /Root 1 0 R >>\n%%EOF\n")
      out.toByteArray
    }
    assert(big.length > PdfStrategy.DefaultMinFileSizeBytes)
    assert(PdfStrategy.isPdfTooComplex(big))
    // a text-heavy page of the same bulk is NOT flagged (ratio gate)
    val textOps = new StringBuilder()
    i = 0
    while (i < 60000) { textOps.append("BT (x) Tj 0 -16 TD q Q cm ET\n"); i += 1 }
    val bigText = {
      val body = textOps.toString.getBytes(ISO_8859_1)
      val out = new java.io.ByteArrayOutputStream()
      def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
      w("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
      w(s"4 0 obj << /Length ${body.length} >> stream\n")
      out.write(body); w("\nendstream endobj\n%%EOF\n")
      out.toByteArray
    }
    assert(!PdfStrategy.isPdfTooComplex(bigText))
  }

  test("complexity probe on real reference PDFs: text docs are not complex") {
    val bytes = Files.readAllBytes(
      Paths.get("/root/reference/example-docs/pdf/layout-parser-paper-fast.pdf"))
    assert(!PdfStrategy.isPdfTooComplex(bytes))
  }

  // --------------------------------------------------------------- decideForPdf

  test("decideForPdf: text corpus PDF routes auto -> fast with no deps") {
    assert(PdfStrategy.decideForPdf(CorpusBytes.pdf(doc)) ==
      Right(Decision(Fast, textExtractable = true, tooComplex = false)))
  }

  test("decideForPdf: too-complex PDF skips extraction and routes to ocr_only") {
    val res = PdfStrategy.decideForPdf(CorpusBytes.vectorPdf(doc),
      deps = Deps(inference = true, ocr = true), maxGraphicsOps = 100,
      minFileSizeBytes = 1024, minRawStreamBytes = 256)
    assert(res == Right(Decision(OcrOnly, textExtractable = false, tooComplex = true)))
  }

  test("decideForPdf: scanned (no-text) PDF routes auto -> ocr_only") {
    assert(PdfStrategy.decideForPdf(CorpusBytes.noTextPdf(doc),
      deps = Deps(ocr = true)) ==
      Right(Decision(OcrOnly, textExtractable = false, tooComplex = false)))
  }

  test("decideForPdf: invalid strategy name surfaces the validation error") {
    assert(PdfStrategy.decideForPdf(CorpusBytes.pdf(doc), strategy = "fastest") ==
      Left("fastest is not a valid strategy."))
  }

  // ------------------------------------------------------------------ auto router

  test("auto router: extractable PDF partitions, scanned PDF lands on the OCR stub") {
    val (ft1, paras1) = Partitioners.partitionAuto("a.pdf", CorpusBytes.pdf(doc))
    assert(ft1 == FileType.Pdf)
    assert(paras1.nonEmpty)
    val (ft2, paras2) = Partitioners.partitionAuto("b.pdf", CorpusBytes.noTextPdf(doc))
    assert(ft2 == FileType.Pdf)
    assert(paras2.isEmpty) // ocr_only resolution -> pluggable kernel stub
  }
}
