package graft.sources

import java.nio.charset.StandardCharsets.ISO_8859_1

/**
 * PDF / image partitioning-strategy selection, re-expressed as pure decision
 * functions (`/root/reference/unstructured/partition/strategies.py:8-109`,
 * `partition/pdf.py:94-108` op-count regexes, `pdf.py:300-338` the auto flow,
 * `pdf.py:618-744` `is_pdf_too_complex`).
 *
 * The reference decides fast vs hi_res vs ocr_only per file from (a) the
 * requested strategy, (b) whether pdfminer can pull real text out, (c) a cheap
 * content-stream probe that flags complex vector drawings (CAD-style pages
 * where text extraction is slow and garbage), and (d) which model dependencies
 * are importable. Here all four inputs are explicit parameters so the decision
 * runs inside the scan `flatMap` — per-file, executor-side, no driver
 * round-trip — and "dependency installed" maps onto the pluggable-kernel seams
 * ([[graft.operators.Registries]]), which is what availability means in a
 * model-free library.
 */
object PdfStrategy {

  val Auto = "auto"
  val Fast = "fast"
  val HiRes = "hi_res"
  val OcrOnly = "ocr_only"
  private val validStrategies = Set(Auto, Fast, HiRes, OcrOnly)

  /** Kernel availability (`strategies.py:35-36` probes installed packages;
    * `inference` = the hi_res layout model, `ocr` = the OCR engine). */
  final case class Deps(inference: Boolean = false, ocr: Boolean = false)

  /** The resolved routing for one PDF payload. */
  final case class Decision(strategy: String, textExtractable: Boolean, tooComplex: Boolean)

  // GRAPHICS_OPS_PATTERN / TEXT_OPS_PATTERN (`pdf.py:95-107`) — operator tokens
  // counted over the decoded content stream without parsing it.
  private val GraphicsOps =
    ("(?m)(?:^|(?<=\\s))" +
      "(?:m|l|c|v|y|h|re|S|s|f|F|f\\*|B|B\\*|b|b\\*|n|W|W\\*|cm|q|Q|Do|" +
      "g|G|rg|RG|k|K|cs|CS|w|J|j|M|d|i|gs)" +
      "(?=\\s|$)").r
  private val TextOps =
    "(?m)(?:^|(?<=\\s))(?:Tj|TJ|'|\"|Tf|Td|TD|Tm|T\\*|BT|ET)(?=\\s|$)".r

  val DefaultMaxGraphicsOps = 10000
  val DefaultMinGraphicsToTextRatio = 20.0
  val DefaultMinFileSizeBytes: Int = 1 << 20 // 1 MB (pdf.py:108)
  val DefaultMinRawStreamBytes = 100000 // 100 KB (pdf.py:109)

  /**
   * `is_pdf_too_complex` (`pdf.py:618-744`): a page is "too complex" when its
   * decoded content stream has more than `maxGraphicsOps` graphics operators
   * AND a graphics-to-text operator ratio above `minGraphicsToTextRatio`.
   * Early exits mirror the reference: files under `minFileSizeBytes` skip the
   * probe entirely; streams under `minRawStreamBytes` skip operator counting.
   * The thresholds are parameters (as in the reference) so tests can probe the
   * logic with small constructed corpora.
   */
  def isPdfTooComplex(bytes: Array[Byte],
      maxGraphicsOps: Int = DefaultMaxGraphicsOps,
      minGraphicsToTextRatio: Double = DefaultMinGraphicsToTextRatio,
      minFileSizeBytes: Int = DefaultMinFileSizeBytes,
      minRawStreamBytes: Int = DefaultMinRawStreamBytes): Boolean = {
    if (bytes.length < minFileSizeBytes || !PdfPartitioner.isPdf(bytes)) return false
    val raw = new String(bytes, ISO_8859_1)
    PdfPartitioner.StreamRe.findAllMatchIn(raw).exists { m =>
      val body = m.group(1).getBytes(ISO_8859_1)
      val content = PdfPartitioner.inflate(body) match {
        case Some(d) => new String(d, ISO_8859_1)
        case None => m.group(1)
      }
      if (content.length < minRawStreamBytes) false
      else {
        val nGraphics = GraphicsOps.findAllMatchIn(content).size
        // early exit before text counting, as in the reference (pdf.py:723-726)
        nGraphics > maxGraphicsOps && {
          val nText = TextOps.findAllMatchIn(content).size
          nGraphics.toDouble / math.max(nText, 1) > minGraphicsToTextRatio
        }
      }
    }
  }

  /** `validate_strategy` (`strategies.py:8-21`): unknown strategy names and
    * fast-on-image are rejected. Returns the error message, or None if valid. */
  def validateStrategy(strategy: String, isImage: Boolean = false): Option[String] =
    if (!validStrategies(strategy)) Some(s"$strategy is not a valid strategy.")
    else if (strategy == Fast && isImage)
      Some("The fast strategy is not available for image files.")
    else None

  /**
   * `determine_pdf_or_image_strategy` (`strategies.py:24-109`): resolve `auto`
   * (images → hi_res; table/image extraction requested → hi_res; extractable
   * text → fast; else ocr_only), then apply the dependency fallback chain —
   * hi_res without the layout model falls to ocr_only then fast; ocr_only
   * without an OCR engine falls to fast (extractable) or hi_res. The
   * no-deps-and-no-text dead end is the reference's ValueError, surfaced as
   * Left.
   */
  def determineStrategy(strategy: String, isImage: Boolean = false,
      pdfTextExtractable: Boolean = false, inferTableStructure: Boolean = false,
      extractImagesInPdf: Boolean = false, extractImageBlockTypes: Boolean = false,
      deps: Deps = Deps()): Either[String, String] = {
    val resolved =
      if (strategy == Auto) {
        val extractElement = extractImagesInPdf || extractImageBlockTypes
        if (isImage) HiRes // _determine_image_auto_strategy (strategies.py:88-92)
        else if (inferTableStructure || extractElement) HiRes
        else if (pdfTextExtractable) Fast
        else OcrOnly // _determine_pdf_auto_strategy (strategies.py:95-109)
      } else strategy
    if (!deps.inference && !deps.ocr && !pdfTextExtractable)
      Left("the layout model and OCR engine are unavailable and the text of " +
        "the PDF is not extractable") // strategies.py:47-56
    else if (resolved == HiRes && !deps.inference)
      Right(if (deps.ocr) OcrOnly else Fast) // strategies.py:58-73
    else if (resolved == OcrOnly && !deps.ocr)
      Right(if (pdfTextExtractable) Fast else HiRes) // strategies.py:75-86
    else Right(resolved)
  }

  /**
   * The full per-PDF auto flow (`pdf.py:300-338`): probe complexity first —
   * a too-complex PDF skips text extraction entirely (extractable=false) —
   * otherwise run the fast extraction and test for any real text, then resolve
   * the strategy. The extraction probe reuses [[PdfPartitioner.partitionPdf]],
   * the same parse the fast path would run.
   */
  def decideForPdf(bytes: Array[Byte], strategy: String = Auto,
      inferTableStructure: Boolean = false, extractImagesInPdf: Boolean = false,
      extractImageBlockTypes: Boolean = false, deps: Deps = Deps(),
      maxGraphicsOps: Int = DefaultMaxGraphicsOps,
      minGraphicsToTextRatio: Double = DefaultMinGraphicsToTextRatio,
      minFileSizeBytes: Int = DefaultMinFileSizeBytes,
      minRawStreamBytes: Int = DefaultMinRawStreamBytes): Either[String, Decision] =
    validateStrategy(strategy, isImage = false) match {
      case Some(err) => Left(err)
      case None =>
        val tooComplex = isPdfTooComplex(bytes, maxGraphicsOps,
          minGraphicsToTextRatio, minFileSizeBytes, minRawStreamBytes)
        val extractable = !tooComplex &&
          PdfPartitioner.partitionPdf(bytes).exists(_.text.trim.nonEmpty)
        determineStrategy(strategy, isImage = false, pdfTextExtractable = extractable,
          inferTableStructure = inferTableStructure,
          extractImagesInPdf = extractImagesInPdf,
          extractImageBlockTypes = extractImageBlockTypes, deps = deps)
          .map(s => Decision(s, extractable, tooComplex))
    }
}
