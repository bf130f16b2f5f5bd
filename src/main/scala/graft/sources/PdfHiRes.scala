package graft.sources

import scala.collection.mutable

import graft.model.{Element, ElementType}
import graft.operators.{LayoutNormalize, PdfminerGeometry, Sorting}
import graft.operators.PdfminerGeometry.{Bbox, LayoutRegion, SourceRegion}

/**
 * The hi_res PDF pipeline end-to-end —
 * `partition/pdf.py:779-1106` `_partition_pdf_or_image_local`, composed from
 * the already-ported kernels:
 *
 *  1. extracted layout: per-line text regions WITH bounding boxes from the
 *     object-model content-stream reader (the pdfminer layer,
 *     `pdfminer_processing.py:568-664` `process_data_with_pdfminer` — text
 *     regions are LTTextLine-granular, class 0, source "pdfminer",
 *     is_extracted true);
 *  2. per-class near-duplicate removal (text 0.9 / image 0.6 thresholds,
 *     `utils/config.py:196-213`) then the basic lexsort (y1, x1, y2, x2);
 *  3. inferred layout from the pluggable layout DETECTOR (the OD model is the
 *     one genuinely model-bound seam — `process_file_with_model`; the seam
 *     function receives the extracted page layouts so deterministic fakes can
 *     align boxes without rasterizing);
 *  4. [[PdfminerGeometry.arrayMergeInferredWithExtracted]] per page, basic
 *     sort, then `aggregate_embedded_text_by_block` for regions the merge left
 *     textless + `remove_control_characters`
 *     (`pdfminer_processing.py:772-830`);
 *  5. optional OCR supplement per page (`ocr.py:373-411`) when an OCR source
 *     is supplied — the OCR inference call itself stays a seam;
 *  6. `clean_pdfminer_inner_elements` over the merged stream
 *     (`pdfminer_processing.py:831-860`);
 *  7. `document_to_element_list` (`pdf.py:1400-1533`): per-region
 *     normalization with `infer_list_items=False`, headline-driven Title
 *     depth, XY-cut reading order, optional PageBreaks, and the final
 *     whitespace cleanup / empty-drop (`pdf.py:1047-1066`).
 *
 * Scale shape: everything here is pure per-document logic — on a cluster it
 * runs inside the same `flatMap` over document bytes as the fast path, one
 * task per document, no shuffle and no driver-side state.
 */
object PdfHiRes {

  /** One page's extracted (pdfminer-layer) regions plus geometry, in rendered
    * pixel space (`coef = dpi / 72` applied, `pdfminer_processing.py:589`). */
  final case class PageLayout(pageNumber: Int, width: Double, height: Double,
      regions: Seq[LayoutRegion])

  /** The OD-model seam: extracted page layouts in, one inferred-region list
    * per page out (types are layout labels: Title, NarrativeText, Table,
    * Picture, Headline, ...). The real implementation rasterizes pages and
    * runs the detector; fakes derive regions from the page geometry. */
  type Detector = Seq[PageLayout] => Seq[Seq[LayoutRegion]]

  /** Per-page OCR seam (`ocr_agent.get_layout_elements_from_image`): page in,
    * OCR word/line regions out. */
  type OcrSource = PageLayout => Seq[SourceRegion]

  /** One OCR token handed to the table agent (`get_table_tokens`,
    * `ocr.py:344-370`): bbox in CROP-local pixels, text, and the span index
    * (line/block numbers are constant 0 in the reference too). */
  final case class TableToken(bbox: Bbox, text: String, spanNum: Int)

  /** The table-model seam (`tables_agent.predict(..., result_format="cells")`,
    * `ocr.py:292-341`): cropped table raster + OCR tokens in, TATR span cells
    * out. An empty result means "table not recognized" — `text_as_html`
    * becomes `""` exactly like the reference's `tatr_cells == ""` branch. */
  type TableAgent =
    (java.awt.image.BufferedImage, Seq[TableToken]) => Seq[graft.operators.TableExtraction.TatrCell]

  // ------------------------------------------------ extracted layout (pdfminer layer)

  // text-showing / positioning operators, extended over the fast path's scan
  // with Tf size, Tm scale, and TL/T* leading tracking
  private val RegionTokenRe =
    ("""\(((?:[^()\\]|\\.)*)\)\s*(Tj|'|")""" + // 1 str, 2 op
      """|<([0-9A-Fa-f\s]+)>\s*Tj""" + // 3 hex
      """|\[((?:\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>|[-0-9.\s])*)\]\s*TJ""" + // 4 TJ
      """|/([A-Za-z0-9.+_-]+)\s+(-?[0-9.]+)\s+Tf""" + // 5 name, 6 size
      """|(-?[0-9.]+)\s+(-?[0-9.]+)\s+(Td|TD)""" + // 7 tx, 8 ty, 9 op
      """|(-?[0-9.]+)\s+(?:-?[0-9.]+\s+){2}(-?[0-9.]+)\s+(-?[0-9.]+)\s+(-?[0-9.]+)\s+Tm""" + // 10 a, 11 d, 12 e, 13 f
      """|(-?[0-9.]+)\s+TL""" + // 14 leading
      """|(T\*|BT)""" + // 15
      """|(-?[0-9.]+)\s+(-?[0-9.]+)\s+(-?[0-9.]+)\s+(-?[0-9.]+)\s+(-?[0-9.]+)\s+(-?[0-9.]+)\s+cm""" + // 16-21 CTM
      """|(?<![A-Za-z])([qQ])(?![A-Za-z0-9*])""" + // 22 gsave/grestore
      """|(\d+)\s+Tr""" + // 23 text render mode
      // CONSUME strings bound to other operators (BDC /ActualText, …) so a
      // literal "q"/"Q" inside them can't corrupt the CTM stack
      """|\((?:[^()\\]|\\.)*\)""" +
      """|<[0-9A-Fa-f\s]*>""").r

  private val TjPartRe = """\(((?:[^()\\]|\\.)*)\)|<([0-9A-Fa-f\s]*)>|(-?[0-9.]+)""".r

  /** Average glyph advance as a fraction of the font size. The object-model
    * reader does not parse per-glyph `/Widths` tables, so region widths are
    * ESTIMATED at the Helvetica-ish average; pdfminer computes exact widths.
    * Deterministic, and only geometry-threshold comparisons consume it. */
  val GlyphWidthEm = 0.5

  /**
   * Per-line text regions with bboxes from one content stream — the stand-in
   * for pdfminer's LTTextLine layer. Tracks the text-line matrix (`Td`/`TD`/
   * `Tm`/`T*`/`TL`), font size (`Tf`, scaled by Tm's d), and advances the pen
   * by the estimated glyph width per shown char. Output bboxes are top-left
   * origin (`rect_to_bbox`, `pdfminer_utils.py`) scaled by `coef`.
   */
  private[sources] def extractLineRegions(content: String,
      fonts: Map[String, PdfPartitioner.PdfFont], pageHeight: Double,
      coef: Double): Seq[LayoutRegion] = {
    val out = mutable.ArrayBuffer.empty[LayoutRegion]
    var font: Option[PdfPartitioner.PdfFont] = None
    var fontSize = 12.0
    var scaleY = 1.0
    var lineX, lineY = 0.0
    var leading = 0.0
    var curX = 0.0
    val run = new StringBuilder
    var runX0, runY, runSize = 0.0
    // `Tr` text render mode — mode 3 is invisible (a scanned page's hidden
    // OCR layer). Lines dominated by invisible chars are emitted with
    // isExtracted = false, the reference's `text_is_embedded` rule
    // (`pdfminer_processing.py:421-463`, ratio cap
    // PDF_MAX_EMBED_LOW_FIDELITY_TEXT_RATIO = 0.1): the text still rides the
    // region, but downstream treats it as NOT embedded — OCR-eligible.
    var renderMode = 0
    var runMode3Chars = 0
    // graphics-state CTM — content that positions text via `q a 0 0 d e f cm`
    // instead of Tm (common in Quartz/macOS-produced PDFs) needs it for real
    // geometry. The FULL 2x2 is composed so rotation/skew is detected
    // robustly (including a rotation later cancelled by its inverse without
    // q/Q); geometry uses the diagonal terms and is SKIPPED while the
    // composed matrix is non-diagonal — emitting silently unrotated
    // coordinates would be worse than emitting nothing.
    var ctmA, ctmD = 1.0
    var ctmB, ctmC = 0.0
    var ctmE, ctmF = 0.0
    def ctmRotated: Boolean = math.abs(ctmB) > 1e-9 || math.abs(ctmC) > 1e-9
    // q/Q saves the render mode alongside the CTM: Tr is part of the graphics
    // state (PDF 32000 §9.3.1 Table 104), so `3 Tr` inside a q..Q block must
    // not leak past Q and mark subsequent visible text OCR-eligible. (It is
    // NOT reset at BT — text state persists across text objects, matching
    // pdfminer's PDFTextState.)
    var ctmStack =
      List.empty[(Double, Double, Double, Double, Double, Double, Int)]

    def effSize: Double = fontSize * (if (scaleY == 0) 1.0 else math.abs(scaleY))

    def flush(): Unit = {
      val text = run.toString.trim
      if (text.nonEmpty && curX > runX0 && !ctmRotated) {
        val devX0 = ctmA * runX0 + ctmE
        val devX1 = ctmA * curX + ctmE
        val devY = ctmD * runY + ctmF
        val devSize = runSize * math.abs(ctmD)
        val bbox: Bbox = (devX0 * coef, (pageHeight - devY - devSize) * coef,
          devX1 * coef, (pageHeight - devY) * coef)
        val lowFidelity = run.length > 0 &&
          runMode3Chars.toDouble / run.length > 0.1
        if (PdfminerGeometry.validateBbox(Seq(bbox._1, bbox._2, bbox._3, bbox._4)))
          out += LayoutRegion(bbox, Some(text), classId = 0,
            elementType = ElementType.UncategorizedText,
            isExtracted = !lowFidelity,
            source = "pdfminer")
      }
      run.clear()
      runMode3Chars = 0
    }

    def show(decoded: String): Unit = {
      if (decoded.nonEmpty) {
        if (run.isEmpty) { runX0 = curX; runY = lineY; runSize = effSize }
        run.append(decoded)
        if (renderMode == 3) runMode3Chars += decoded.length
        curX += decoded.length * GlyphWidthEm * effSize
      }
    }

    def newlineTo(x: Double, y: Double): Unit = { flush(); lineX = x; lineY = y; curX = x }

    RegionTokenRe.findAllMatchIn(content).foreach { m =>
      if (m.group(15) != null) { // T* / BT
        if (m.group(15) == "BT") newlineTo(0, 0)
        else newlineTo(lineX, lineY - leading)
      } else if (m.group(1) != null) { // (s) Tj / ' / "
        if (m.group(2) != "Tj") newlineTo(lineX, lineY - leading)
        show(PdfPartitioner.decodeWithFont(
          PdfPartitioner.decodePdfString(m.group(1)), font))
      } else if (m.group(3) != null) { // <hex> Tj
        show(PdfPartitioner.decodeWithFont(
          PdfPartitioner.decodeHexString(m.group(3)), font))
      } else if (m.group(4) != null) { // [..] TJ
        TjPartRe.findAllMatchIn(m.group(4)).foreach { p =>
          if (p.group(1) != null)
            show(PdfPartitioner.decodeWithFont(
              PdfPartitioner.decodePdfString(p.group(1)), font))
          else if (p.group(2) != null)
            show(PdfPartitioner.decodeWithFont(
              PdfPartitioner.decodeHexString(p.group(2)), font))
          else if (p.group(3) != null) {
            val n = p.group(3).toDouble
            curX -= n / 1000.0 * effSize
            if (math.abs(n) > 180) show(" ")
          }
        }
      } else if (m.group(5) != null) { // Tf
        font = fonts.get(m.group(5))
        fontSize = m.group(6).toDouble
      } else if (m.group(9) != null) { // Td / TD
        val tx = m.group(7).toDouble
        val ty = m.group(8).toDouble
        if (m.group(9) == "TD") leading = -ty
        if (ty != 0.0) newlineTo(lineX + tx, lineY + ty)
        else { flush(); lineX += tx; curX = lineX }
      } else if (m.group(12) != null) { // Tm
        scaleY = m.group(11).toDouble
        newlineTo(m.group(12).toDouble, m.group(13).toDouble)
      } else if (m.group(14) != null) { // TL
        leading = m.group(14).toDouble
      } else if (m.group(16) != null) { // cm — compose the FULL matrix
        flush()
        val a = m.group(16).toDouble
        val b = m.group(17).toDouble
        val c = m.group(18).toDouble
        val d = m.group(19).toDouble
        val e = m.group(20).toDouble
        val f = m.group(21).toDouble
        // new = [a b c d e f] × ctm (PDF row-vector convention)
        val nA = a * ctmA + b * ctmC
        val nB = a * ctmB + b * ctmD
        val nC = c * ctmA + d * ctmC
        val nD = c * ctmB + d * ctmD
        val nE = e * ctmA + f * ctmC + ctmE
        val nF = e * ctmB + f * ctmD + ctmF
        // degenerate diagonal (a or d scaled to 0) keeps the previous axis
        // scale so the pre-r12 behavior for `0 0 ...` fills is preserved
        ctmB = nB; ctmC = nC; ctmE = nE; ctmF = nF
        ctmA = if (nA == 0 && !ctmRotated) ctmA else nA
        ctmD = if (nD == 0 && !ctmRotated) ctmD else nD
      } else if (m.group(22) != null) { // q / Q
        if (m.group(22) == "q")
          ctmStack = (ctmA, ctmB, ctmC, ctmD, ctmE, ctmF, renderMode) :: ctmStack
        else ctmStack match {
          case (a, b, c, d, e, f, rm) :: rest =>
            flush()
            ctmA = a; ctmB = b; ctmC = c; ctmD = d; ctmE = e; ctmF = f
            renderMode = rm
            ctmStack = rest
          case Nil => ()
        }
      } else if (m.group(23) != null) { // Tr — render mode (3 = invisible)
        m.group(23).toIntOption.foreach { mode =>
          if (mode != renderMode) {
            // an ACTUAL mode change mid-line splits the run (pdfminer tags
            // per char); a redundant re-assert of the current mode — common
            // generator noise — must not fragment the line region
            flush()
            renderMode = mode
          }
        }
      }
    }
    flush()
    out.toSeq
  }

  /** `sort_text_regions(..., SORT_MODE_BASIC)` — lexsort by (y1, x1, y2, x2)
    * (`utils/sorting.py:259-264`). */
  def sortBasic(regions: Seq[LayoutRegion]): Seq[LayoutRegion] =
    regions.sortBy(r => (r.bbox._2, r.bbox._1, r.bbox._4, r.bbox._3))

  /** The pdfminer-layer page pass (`process_data_with_pdfminer`): extract line
    * regions, remove near-duplicates per class (fake-bold double renders),
    * basic sort. */
  def extractedPageLayouts(bytes: Array[Byte], dpi: Int = 72): Seq[PageLayout] = {
    val coef = dpi / 72.0
    PdfPartitioner.pageStreams(bytes).map { ps =>
      // widget-annotation (AcroForm) values join the extracted layer as
      // already-extracted text regions (`pdfminer_processing.py:543-552`)
      val widgetRegions = ps.widgets.map { case (t, (x1, y1, x2, y2)) =>
        LayoutRegion((x1 * coef, y1 * coef, x2 * coef, y2 * coef), Some(t),
          classId = 0, elementType = ElementType.UncategorizedText,
          isExtracted = true, source = "pdfminer")
      }
      val regions = extractLineRegions(ps.content, ps.fonts, ps.height, coef) ++
        widgetRegions
      val deduped = Seq(0 -> 0.9, 1 -> 0.6).flatMap { case (cls, thr) =>
        val ofClass = regions.filter(_.classId == cls)
        PdfminerGeometry.removeDuplicateIndices(ofClass.map(_.bbox), thr)
          .map(ofClass(_))
      }
      PageLayout(ps.pageNumber, ps.width * coef, ps.height * coef,
        sortBasic(deduped))
    }
  }

  // --------------------------------------------------------------- pipeline

  /** `remove_control_characters` (`pdf_image_utils.py:432-439`): tabs/newlines
    * become spaces, all other Unicode category-C codepoints drop. */
  def removeControlCharacters(text: String): String = {
    val sb = new StringBuilder(text.length)
    text.foreach { c =>
      if (c == '\t' || c == '\n') sb.append(' ')
      else Character.getType(c) match {
        case Character.CONTROL | Character.FORMAT | Character.SURROGATE |
          Character.PRIVATE_USE | Character.UNASSIGNED => ()
        case _ => sb.append(c)
      }
    }
    sb.toString
  }

  private val ImageClasses = Set(ElementType.Image, "Picture")

  /** The per-page merge wrapper (`merge_inferred_with_extracted_layout`,
    * `pdfminer_processing.py:772-830`): array merge → basic sort → aggregate
    * embedded text into still-textless regions (+ is_extracted status for
    * non-image classes) → control-char cleanup. */
  def mergePage(inferred: Seq[LayoutRegion], extracted: PageLayout)
      : Seq[LayoutRegion] = {
    val merged0 = PdfminerGeometry.arrayMergeInferredWithExtracted(
      inferred, extracted.regions, extracted.width, extracted.height)
    val sources = extracted.regions.filter(_.classId == 0)
      .map(r => SourceRegion(r.bbox, r.text, r.isExtracted))
    sortBasic(merged0).map { r =>
      r.text match {
        case Some(t) => r.copy(text = Some(removeControlCharacters(t)))
        case None =>
          val (text, _) = PdfminerGeometry.aggregateEmbeddedTextByBlock(
            r.bbox, sources)
          // the reference also records the IsExtracted status for non-image
          // classes (`:819-827`); the flag is carried for downstream ops
          val extractedNow = !ImageClasses.contains(r.elementType) &&
            sources.nonEmpty && text.nonEmpty
          r.copy(text = Some(removeControlCharacters(text)),
            isExtracted = r.isExtracted || extractedNow)
      }
    }
  }

  /**
   * `supplement_element_with_table_extraction` for one merged page
   * (`ocr.py:292-341`): every Table-classed region's padded bbox crops from
   * the page raster; tokens within the crop translate to crop-local
   * coordinates (the reference OCRs the crop directly — same frame); the
   * table agent's span cells render to `text_as_html` via `cells_to_html`,
   * and — when `extractAsCells` (EXTRACT_TABLE_AS_CELLS) — to the
   * `table_as_cells` SimpleTableCell rows.
   */
  def supplementTablesPage(regions: Seq[LayoutRegion],
      raster: java.awt.image.BufferedImage, tokens: Seq[SourceRegion],
      agent: TableAgent, extractAsCells: Boolean = false,
      pad: Double = 0.0): Seq[LayoutRegion] =
    regions.map { r =>
      if (r.elementType != ElementType.Table) r
      else {
        val (x1, y1) = (r.bbox._1 - pad, r.bbox._2 - pad)
        val (x2, y2) = (r.bbox._3 + pad, r.bbox._4 + pad)
        PdfImages.crop(raster, x1, y1, x2, y2) match {
          case None => r // degenerate box: nothing to hand the model
          case Some(img) =>
            val toks = tokens
              .filter(t => t.bbox._1 < x2 && t.bbox._3 > x1 &&
                t.bbox._2 < y2 && t.bbox._4 > y1)
              .zipWithIndex.map { case (t, i) =>
                TableToken((t.bbox._1 - x1, t.bbox._2 - y1,
                  t.bbox._3 - x1, t.bbox._4 - y1), t.text.getOrElse(""), i)
              }
            val cells = agent(img, toks)
            val html =
              if (cells.isEmpty) ""
              else graft.operators.TableExtraction.cellsToHtml(cells)
            r.copy(textAsHtml = Some(html),
              tableAsCells =
                if (extractAsCells)
                  Some(graft.operators.TableExtraction.toSimpleCells(cells))
                else None)
        }
      }
    }

  /** `clean_pdfminer_inner_elements` for one merged page
    * (`pdfminer_processing.py:831-860`). */
  def cleanPage(regions: Seq[LayoutRegion]): Seq[LayoutRegion] = {
    val kept = PdfminerGeometry.cleanPdfminerInnerElements(
      regions.map(r => PdfminerGeometry.PageRegion(r.bbox, r.source == "pdfminer")))
    kept.map(regions(_))
  }

  /** `document_to_element_list` for one page (`pdf.py:1400-1533`):
    * normalization (no list-item inference, `pdf.py:1002-1006`), headline
    * Title depth, XY-cut order, and the final text cleanup / empty-drop. */
  def pageToElements(regions: Seq[LayoutRegion], page: PageLayout): Seq[Element] = {
    val hasHeadline = regions.exists(r =>
      r.elementType == "Headline" || r.elementType == "Subheadline")
    val normalized = regions.flatMap { r =>
      val lr = LayoutNormalize.LayoutRegion(
        tpe = Option(r.elementType).filter(_.nonEmpty),
        text = r.text.getOrElse(""),
        coordinates = LayoutNormalize.bboxPoints(
          r.bbox._1, r.bbox._2, r.bbox._3, r.bbox._4),
        prob = r.prob,
        source = Some(r.source),
        textAsHtml = r.textAsHtml,
        tableAsCells = r.tableAsCells)
      LayoutNormalize.normalizeLayoutElement(lr, Some("PixelSpace"),
        inferListItems = false).map { e =>
        val depth =
          if (e.`type` == ElementType.Title &&
            e.metadata.category_depth.isEmpty && hasHeadline) Some(0)
          else e.metadata.category_depth
        e.copy(metadata = e.metadata.copy(
          page_number = Some(page.pageNumber),
          category_depth = depth,
          coordinates = e.metadata.coordinates.map(_.copy(
            layout_width = Some(page.width), layout_height = Some(page.height)))))
      }
    }
    val sorted = Sorting.sortPageElements(normalized, Sorting.SortModeXyCut)
    sorted.flatMap { e =>
      if (e.`type` == ElementType.Image) Some(e)
      else {
        val cleaned =
          if (e.`type` == ElementType.Table)
            e.text.replaceAll("[^\\S\\n]+", " ").trim
          else e.text.replaceAll("\\s+", " ").trim
        if (cleaned.nonEmpty || e.`type` == ElementType.PageBreak)
          Some(e.copy(text = cleaned))
        else None
      }
    }
  }

  /**
   * The ocr_only strategy (`pdf.py:1151-1227`
   * `_partition_pdf_or_image_with_ocr`): per page, the OCR agent's
   * line-level regions normalize straight to elements
   * (`ocr_data_to_elements`, `common.py:435-460`), sort into reading order,
   * and take the same final cleanup as the hi_res stream. The page
   * rasterization + OCR inference live behind the [[OcrSource]] seam; the
   * page geometry, normalization, ordering, and cleanup are real.
   */
  def partitionOcrOnly(bytes: Array[Byte], ocr: OcrSource, dpi: Int = 72,
      includePageBreaks: Boolean = false): Seq[Element] = {
    val pages = extractedPageLayouts(bytes, dpi)
    val out = mutable.ArrayBuffer.empty[Element]
    pages.foreach { page =>
      val regions = ocr(page).map(r => LayoutRegion(r.bbox, r.text,
        classId = 0, elementType = ElementType.UncategorizedText,
        isExtracted = false, source = "ocr_tesseract"))
      out ++= pageToElements(sortBasic(regions), page)
      if (includePageBreaks)
        out += Element("", ElementType.PageBreak, "", "", 0,
          graft.model.ElementMetadata(page_number = Some(page.pageNumber)))
    }
    out.toSeq.zipWithIndex.map { case (e, i) => e.copy(seq = i + 1L) }
  }

  /** Element → router paragraph, for the auto router's hi_res/ocr_only
    * branches (the rest of the engine consumes RawPara streams). */
  def toRawPara(e: Element): HtmlPartitioner.RawPara =
    HtmlPartitioner.RawPara(e.text, Some(e.`type`),
      categoryDepth = e.metadata.category_depth,
      pageNumber = e.metadata.page_number, classifier = "text")

  /**
   * `_partition_pdf_or_image_local` — the full composition. Elements come
   * back with `seq` assigned in final reading order; `doc_id`/ids are the
   * caller's (hash-ids pass), as everywhere else in the engine.
   *
   * `imageBlocks` runs the `extract_image_block_types` /
   * `extract_images_in_pdf` save pass over the final elements
   * (`pdf.py:1013-1043`) — page rasters composite lazily (only pages an
   * extracted element actually lands on rasterize) at the same `dpi` the
   * element coordinates use.
   */
  /** `partition_pdf(..., analysis=True)` options (`pdf.py:797,891-906`):
    * where to save the per-stage layout dumps and bbox renders. */
  final case class AnalysisOptions(outputDirPath: String, filename: String = "document.pdf",
      skipBboxes: Boolean = false, skipDump: Boolean = false, drawCaption: Boolean = true)

  def partitionHiRes(bytes: Array[Byte], detector: Detector, dpi: Int = 72,
      includePageBreaks: Boolean = false,
      ocr: Option[OcrSource] = None,
      imageBlocks: PdfImages.ImageBlockOptions = PdfImages.ImageBlockOptions(),
      inferTableStructure: Boolean = false,
      tableAgent: Option[TableAgent] = None,
      extractTableAsCells: Boolean = false,
      analysis: Option[AnalysisOptions] = None,
      rotationCorrections: Seq[Int] = Nil): Seq[Element] = {
    val extracted0 = extractedPageLayouts(bytes, dpi)
    // `_rotation_corrections_from_layout` (`pdf.py:769-775`): per-page
    // rotations the inference layer applied to make page images upright,
    // mirrored onto the extracted coordinates so both layers share one frame
    // (`pdfminer_processing.py:62-81`)
    val extracted =
      if (rotationCorrections.isEmpty) extracted0
      else extracted0.zipWithIndex.map { case (p, i) =>
        val angle = ((rotationCorrections.lift(i).getOrElse(0) % 360) + 360) % 360
        if (angle == 0) p
        else {
          val rotated = p.regions.map(r => r.copy(
            bbox = PdfminerGeometry.rotateBbox(r.bbox, angle, p.width, p.height)))
          // expand=True swaps the canvas for quarter turns
          if (angle == 90 || angle == 270)
            p.copy(width = p.height, height = p.width, regions = rotated)
          else p.copy(regions = rotated)
        }
      }
    if (extracted.isEmpty) return Nil
    if (inferTableStructure && tableAgent.isEmpty)
      throw new IllegalStateException("Unable to load table extraction agent.")
    // lazily composited page rasters, shared by the table-structure supplement
    // and the image-block save pass — only pages one of them actually touches
    // pay the compositing cost
    val coef = dpi / 72.0
    lazy val placements = PdfImages.placedImages(bytes)
    // page dims in points (PageLayout width/height are already coef-scaled)
    val dims: Map[Int, (Double, Double)] = extracted
      .map(p => p.pageNumber -> (p.width / coef, p.height / coef)).toMap
    val rasterCache = mutable.Map.empty[Int, Option[java.awt.image.BufferedImage]]
    def raster(page: Int): Option[java.awt.image.BufferedImage] =
      rasterCache.getOrElseUpdate(page, dims.get(page).map { case (w, h) =>
        PdfImages.rasterizePage(w, h, coef, placements.getOrElse(page, Nil))
      })
    val inferred = detector(extracted)
    // analysis processors accumulate alongside the per-page pipeline
    // (pdf.py:891-906: od + extracted dumpers up front, ocr added per page)
    // the reference instantiates its OCR dumper unconditionally but only OCRs
    // when an agent is available; here the dump exists iff the OCR seam is wired
    val ocrDumper =
      if (analysis.isDefined && ocr.isDefined) Some(new PdfAnalysis.OcrLayoutDumper)
      else None
    val out = mutable.ArrayBuffer.empty[Element]
    extracted.zipWithIndex.foreach { case (page, i) =>
      val inf = if (i < inferred.length) inferred(i) else Nil
      var merged = mergePage(inf, page)
      val ocrRegions = ocr.map(o => o(page))
      ocrRegions.foreach { regions =>
        ocrDumper.foreach(_.addOcredPage(regions))
        merged = PdfminerGeometry.mergeOutLayoutWithOcrLayout(merged, regions)
      }
      if (inferTableStructure) tableAgent.foreach { agent =>
        // table tokens come from the page OCR when an agent is wired (the
        // reference OCRs each crop); otherwise the extracted pdfminer lines
        // stand in — the same text the OCR would read off the crop
        val tokens = ocrRegions.getOrElse(
          page.regions.filter(_.classId == 0)
            .map(r => SourceRegion(r.bbox, r.text, r.isExtracted)))
        raster(page.pageNumber).foreach { img =>
          merged = supplementTablesPage(merged, img, tokens, agent,
            extractTableAsCells)
        }
      }
      val cleaned = cleanPage(merged)
      out ++= pageToElements(cleaned, page)
      if (includePageBreaks)
        out += Element("", ElementType.PageBreak, "", "", 0,
          graft.model.ElementMetadata(page_number = Some(page.pageNumber)))
    }
    val elements = out.toSeq.zipWithIndex.map { case (e, i) => e.copy(seq = i + 1L) }
    val withImages =
      if (!imageBlocks.enabled) elements
      else PdfImages.applyImageBlocks(elements, imageBlocks, raster)
    analysis.foreach { opts =>
      // pdf.py:1077-1102: od + extracted + ocr + final dumps, then artifacts
      val dumps = Seq(
        PdfAnalysis.odLayoutDump(extracted, inferred),
        PdfAnalysis.extractedLayoutDump(extracted)) ++
        ocrDumper.map(_.dump).toSeq :+
        PdfAnalysis.finalLayoutDump(withImages)
      PdfAnalysis.saveAnalysisArtifacts(dumps, opts.filename, opts.outputDirPath,
        raster, pageCount = extracted.map(_.pageNumber).maxOption.getOrElse(0),
        skipBboxes = opts.skipBboxes, skipDump = opts.skipDump,
        drawCaption = opts.drawCaption)
    }
    withImages
  }
}
