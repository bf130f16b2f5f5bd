package graft.operators

/**
 * The hi_res path's pdfminer post-processing geometry —
 * `partition/pdf_image/pdfminer_processing.py`: bbox rotation/validation,
 * vectorized pixel-inclusive intersection/IoU/subregion tests, near-duplicate
 * removal, pdfminer-inside-table cleanup, and per-block embedded-text
 * aggregation with extraction-coverage status.
 *
 * The matrix kernels keep the reference's +1 pixel-inclusive area convention
 * (a degenerate box has area 1 and matches itself); `_aggregated_iou` uses
 * plain areas, as upstream. All functions are pure per-page math — on a
 * cluster they run inside the per-(doc, page) groupBy of the layout-merge
 * stage, no cross-page state.
 */
object PdfminerGeometry {

  /** `EPSILON_AREA` / env defaults (`pdfminer_processing.py:38`,
    * `utils/config.py:201-208,285-288`). */
  val EpsilonArea = 0.01
  val EmbeddedTextAggregationSubregionThreshold = 0.99
  val TextCoverageThreshold = 0.25

  type Bbox = (Double, Double, Double, Double) // (x1, y1, x2, y2)

  /** `_rotate_bboxes` (`:62-82`) — mirror a PIL counter-clockwise
    * `rotate(angle, expand=True)` of a width x height page image. */
  def rotateBboxes(coords: Seq[Bbox], angle: Int, width: Double,
      height: Double): Seq[Bbox] = {
    val a = ((angle % 360) + 360) % 360
    a match {
      case 90 => coords.map { case (x1, y1, x2, y2) => (y1, width - x2, y2, width - x1) }
      case 180 => coords.map { case (x1, y1, x2, y2) =>
        (width - x2, height - y2, width - x1, height - y1) }
      case 270 => coords.map { case (x1, y1, x2, y2) =>
        (height - y2, x1, height - y1, x2) }
      case _ => coords
    }
  }

  /** `_rotate_bboxes` (`pdfminer_processing.py:62-81`): mirror a
    * counter-clockwise page-image rotation (PIL convention, expand=True) onto
    * a bbox so the pdfminer layer shares the object-detection layer's frame.
    * `width`/`height` are the page dimensions in the UN-rotated frame. */
  def rotateBbox(bbox: Bbox, angle: Int, width: Double, height: Double): Bbox = {
    val a = ((angle % 360) + 360) % 360
    val (x1, y1, x2, y2) = bbox
    a match {
      case 90 => (y1, width - x2, y2, width - x1)
      case 180 => (width - x2, height - y2, width - x1, height - y1)
      case 270 => (height - y2, x1, height - y1, x2)
      case _ => bbox
    }
  }

  /** `_validate_bbox` (`:84-85`): four present values with positive extent
    * (NaN fails both comparisons, like None/np.nan upstream). */
  def validateBbox(bbox: Seq[Double]): Boolean =
    bbox.length == 4 && bbox.forall(v => !v.isNaN) &&
      bbox(2) - bbox(0) > 0 && bbox(3) - bbox(1) > 0

  /** `_minimum_containing_coords` (`:88-104`) for one pair. */
  def minimumContainingCoords(a: Bbox, b: Bbox): Bbox =
    (math.min(a._1, b._1), math.min(a._2, b._2),
      math.max(a._3, b._3), math.max(a._4, b._4))

  /** Pixel-inclusive intersection area (`areas_of_boxes_and_intersection_area`,
    * `:691-705`). */
  private def interAreaPlus1(a: Bbox, b: Bbox): Double =
    math.max(math.min(a._3, b._3) - math.max(a._1, b._1) + 1, 0) *
      math.max(math.min(a._4, b._4) - math.max(a._2, b._2) + 1, 0)

  private def areaPlus1(b: Bbox): Double = (b._3 - b._1 + 1) * (b._4 - b._2 + 1)

  /** `bboxes1_is_almost_subregion_of_bboxes2` (`:707-722`):
    * inter/area1 > threshold AND area1 <= area2. */
  def isAlmostSubregionOf(bboxes1: Seq[Bbox], bboxes2: Seq[Bbox],
      threshold: Double = 0.5): Seq[Seq[Boolean]] =
    bboxes1.map { b1 =>
      bboxes2.map { b2 =>
        interAreaPlus1(b1, b2) / math.max(areaPlus1(b1), EpsilonArea) > threshold &&
          areaPlus1(b1) <= areaPlus1(b2)
      }
    }

  /** `boxes_iou` (`:733-748`): inter > threshold * union. */
  def boxesIou(bboxes1: Seq[Bbox], bboxes2: Seq[Bbox],
      threshold: Double = 0.75): Seq[Seq[Boolean]] =
    bboxes1.map { b1 =>
      bboxes2.map { b2 =>
        val inter = interAreaPlus1(b1, b2)
        val union = math.max(EpsilonArea, areaPlus1(b1) + areaPlus1(b2) - inter)
        inter > threshold * union
      }
    }

  /** `boxes_self_iou` (`:724-731`). */
  def boxesSelfIou(bboxes: Seq[Bbox], threshold: Double = 0.5): Seq[Seq[Boolean]] =
    boxesIou(bboxes, bboxes, threshold)

  /** `remove_duplicate_elements` (`:863-893`): drop an element only when it
    * near-duplicates (IoU over `threshold`) a LATER element — the strict
    * upper triangle of the self-IoU matrix. (The reference's split-matrix
    * memory capping with per-chunk diagonal offsets collapses to the direct
    * triangle here; same result by construction.) */
  def removeDuplicateIndices(bboxes: Seq[Bbox], threshold: Double = 0.5): Seq[Int] = {
    val iou = boxesSelfIou(bboxes, threshold)
    bboxes.indices.filter { i =>
      !(i + 1 until bboxes.length).exists(j => iou(i)(j))
    }
  }

  /** One page row for [[cleanPdfminerInnerElements]]. */
  /** One positioned character: glyph text + bbox, the LTChar fields the
    * fake-bold detector reads (`pdfminer_utils.py:370-421`). */
  final case class PChar(text: String, x0: Double, y0: Double, x1: Double)

  /**
   * `_is_duplicate_char` (`pdf_image/pdfminer_utils.py:370-421`): some PDF
   * generators fake bold by rendering each glyph twice at a sub-pixel offset.
   * A duplicate is the same glyph within `threshold` of the previous one AND
   * with >`overlapRatioThreshold` horizontal bbox overlap — legitimate
   * doubled letters ("ll") are adjacent, not overlapping.
   */
  def isDuplicateChar(c1: PChar, c2: PChar, threshold: Double,
      overlapRatioThreshold: Double = 0.5): Boolean = {
    if (c1.text != c2.text) return false
    if (math.abs(c1.x0 - c2.x0) >= threshold ||
      math.abs(c1.y0 - c2.y0) >= threshold) return false
    val w1 = c1.x1 - c1.x0
    val w2 = c2.x1 - c2.x0
    val overlap = math.max(0.0, math.min(c1.x1, c2.x1) - math.max(c1.x0, c2.x0))
    val avgWidth = (w1 + w2) / 2
    val ratio = if (avgWidth > 0) overlap / avgWidth else 0.0
    ratio > overlapRatioThreshold
  }

  /** `_deduplicate_ltchars` (`pdfminer_processing.py:1207-1232`): drop each
    * char that duplicates the previously KEPT char; `threshold <= 0`
    * disables. */
  def deduplicateChars(chars: Seq[PChar], threshold: Double): Seq[PChar] = {
    if (threshold <= 0 || chars.isEmpty) return chars
    val result = scala.collection.mutable.ArrayBuffer(chars.head)
    for (c <- chars.tail)
      if (!isDuplicateChar(result.last, c, threshold)) result += c
    result.toSeq
  }

  final case class PageRegion(bbox: Bbox, isPdfminer: Boolean)

  /** `clean_pdfminer_inner_elements` (`:831-860`): remove pdfminer-sourced
    * regions that sit inside exactly ONE non-pdfminer region (table-interior
    * scaffolding); returns the kept indices in original order. */
  def cleanPdfminerInnerElements(regions: Seq[PageRegion],
      threshold: Double = EmbeddedTextAggregationSubregionThreshold): Seq[Int] = {
    val pdfminerIdx = regions.indices.filter(regions(_).isPdfminer)
    val otherIdx = regions.indices.filterNot(regions(_).isPdfminer)
    if (pdfminerIdx.isEmpty || otherIdx.isEmpty) return regions.indices
    val sub = isAlmostSubregionOf(
      pdfminerIdx.map(regions(_).bbox), otherIdx.map(regions(_).bbox), threshold)
    val dropped = pdfminerIdx.zip(sub).collect {
      case (i, row) if row.count(identity) == 1 => i
    }.toSet
    regions.indices.filterNot(dropped.contains)
  }

  /** `calculate_intersection_area` / `calculate_bbox_area`
    * (`:1358-1406`) — the plain (non-inclusive) variants. */
  def bboxArea(b: Bbox): Double = (b._3 - b._1) * (b._4 - b._2)

  def intersectionArea(a: Bbox, b: Bbox): Double = {
    val x1 = math.max(a._1, b._1)
    val y1 = math.max(a._2, b._2)
    val x2 = math.min(a._3, b._3)
    val y2 = math.min(a._4, b._4)
    if (x1 < x2 && y1 < y2) bboxArea((x1, y1, x2, y2)) else 0.0
  }

  /** `_aggregated_iou` (`:893-906`). */
  def aggregatedIou(sources: Seq[Bbox], target: Bbox): Double = {
    var intersection = 0.0
    var sumAreas = bboxArea(target)
    sources.foreach { s =>
      intersection += intersectionArea(s, target)
      sumAreas += bboxArea(s)
    }
    val union = sumAreas - intersection
    if (union == 0) 1.0 else intersection / union
  }

  /** One embedded source region for [[aggregateEmbeddedTextByBlock]]. */
  final case class SourceRegion(bbox: Bbox, text: Option[String], isExtracted: Boolean)

  /** `IsExtracted` result states. */
  val ExtractedTrue = "true"
  val ExtractedPartial = "partial"
  val ExtractedFalse = "false"

  // ------------------------------------------------- OCR region building

  /** `merge_text_regions` (`pdf_image/inference_utils.py:86-110`): envelope
    * bbox + space-joined non-empty texts, in region order. */
  def mergeTextRegions(regions: Seq[(Bbox, Option[String])]): (Bbox, String) = {
    require(regions.nonEmpty, "The text regions to be merged must be provided.")
    val bbox = (
      regions.map(_._1._1).min, regions.map(_._1._2).min,
      regions.map(_._1._3).max, regions.map(_._1._4).max)
    (bbox, regions.flatMap(_._2).filter(_.nonEmpty).mkString(" "))
  }

  /**
   * `build_layout_elements_from_ocr_regions(group_by_ocr_text=True)`
   * (`inference_utils.py:43-83`): the OCR full-text splits on blank lines;
   * each section claims, in scan order over still-unclaimed regions, one
   * region per matching word (duplicates claim the earliest remaining);
   * each claimed group merges into one UncategorizedText element.
   * (The `group_by_ocr_text=False` branch delegates to the inference
   * library's proximity grouping and stays behind the OCR seam.)
   */
  def buildLayoutElementsFromOcrText(regions: Seq[(Bbox, Option[String])],
      ocrText: String): Seq[LayoutRegion] = {
    val claimed = Array.fill(regions.length)(false)
    val groups = scala.collection.mutable.ArrayBuffer.empty[Seq[Int]]
    ocrText.split("\n\n", -1).foreach { section =>
      val words = scala.collection.mutable.ArrayBuffer.from(
        section.replace("\n", " ").split("\\s+").filter(_.nonEmpty))
      val group = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i < regions.length && words.nonEmpty) {
        if (!claimed(i)) {
          val text = regions(i)._2.getOrElse("")
          val w = words.indexOf(text)
          if (w >= 0) {
            group += i
            words.remove(w)
          }
        }
        i += 1
      }
      if (group.nonEmpty) {
        group.foreach(claimed(_) = true)
        groups += group.toSeq
      }
    }
    groups.map { g =>
      val (bbox, text) = mergeTextRegions(g.map(regions(_)))
      LayoutRegion(bbox, Some(text), classId = 0, elementType = "UncategorizedText")
    }.toSeq
  }

  // ------------------------------------------------------- OCR merge

  /** `OCR_LAYOUT_SUBREGION_THRESHOLD` default (`utils/config.py:186-193`). */
  val OcrLayoutSubregionThreshold = 0.5

  /** `valid_text` (`pdf_image/pdf_image_utils.py:257-261`): non-empty and no
    * unresolved `(cid:` glyph references. */
  def validText(text: Option[String]): Boolean =
    text.exists(t => t.nonEmpty && !t.contains("(cid:"))

  /** Single-pair `Rectangle.is_almost_subregion_of` — PLAIN areas, unlike the
    * +1-inclusive matrix kernels (the inference library's scalar variant). */
  def isAlmostSubregionPlain(a: Bbox, b: Bbox, threshold: Double): Boolean =
    intersectionArea(a, b) / math.max(bboxArea(a), EpsilonArea) > threshold &&
      bboxArea(a) <= bboxArea(b)

  /** `aggregate_ocr_text_by_block` (`ocr.py:414-432`): plain-area scalar
    * subregion test, texts joined with spaces. */
  def aggregateOcrTextByBlock(ocr: Seq[SourceRegion], region: Bbox,
      subregionThreshold: Double = OcrLayoutSubregionThreshold): String =
    ocr.collect {
      case r if isAlmostSubregionPlain(r.bbox, region, subregionThreshold) &&
        r.text.exists(_.nonEmpty) => r.text.get
    }.mkString(" ")

  /** `supplement_layout_with_ocr_elements` (`ocr.py:436-491`): OCR regions
    * that are (+1-matrix) subregions of an existing layout element are
    * dropped; the rest append as UncategorizedText regions. */
  def supplementLayoutWithOcrElements(layout: Seq[LayoutRegion],
      ocr: Seq[SourceRegion],
      subregionThreshold: Double = OcrLayoutSubregionThreshold): Seq[LayoutRegion] = {
    if (ocr.isEmpty) return layout
    val toAdd =
      if (layout.isEmpty) ocr
      else {
        val sub = isAlmostSubregionOf(ocr.map(_.bbox), layout.map(_.bbox),
          subregionThreshold)
        ocr.zip(sub).collect { case (r, row) if !row.exists(identity) => r }
      }
    layout ++ toAdd.map(r =>
      LayoutRegion(r.bbox, r.text, classId = 0, elementType = "UncategorizedText"))
  }

  /** `merge_out_layout_with_ocr_layout` (`ocr.py:373-411`): OD elements whose
    * text is invalid adopt the aggregated OCR text inside their box; the
    * layout is then optionally supplemented with uncovered OCR regions. */
  def mergeOutLayoutWithOcrLayout(outLayout: Seq[LayoutRegion],
      ocrLayout: Seq[SourceRegion],
      supplementWithOcrElements: Boolean = true,
      subregionThreshold: Double = OcrLayoutSubregionThreshold): Seq[LayoutRegion] = {
    if (outLayout.isEmpty || ocrLayout.isEmpty) return outLayout
    val updated = outLayout.map { el =>
      if (validText(el.text)) el
      else el.copy(text = Some(aggregateEmbeddedTextByBlock(el.bbox, ocrLayout,
        subregionThreshold)._1))
    }
    if (supplementWithOcrElements)
      supplementLayoutWithOcrElements(updated, ocrLayout, subregionThreshold)
    else updated
  }

  // ------------------------------------------------------- layout merge

  /** `FULL_PAGE_REGION_THRESHOLD` + unstructured-inference config defaults
    * (`LAYOUT_SAME_REGION_THRESHOLD` / `LAYOUT_SUBREGION_THRESHOLD`). */
  val FullPageRegionThreshold = 0.99
  val LayoutSameRegionThreshold = 0.75
  val LayoutSubregionThreshold = 0.75

  /** One layout region for the merge: `classId` 0 = text, 1 = image (the
    * extracted side's pdfminer classes); `elementType` carries the inferred
    * side's label for the text/table masks. `source` tracks provenance
    * ("pdfminer" vs "inferred", `LayoutElements.sources`) through the merge so
    * [[cleanPdfminerInnerElements]] can run on the merged stream; `prob` is the
    * detector confidence (`detection_class_prob`). Rule-2 merges keep the
    * inferred side's source/prob, as upstream (only text/coords/is_extracted
    * copy across). */
  final case class LayoutRegion(
      bbox: Bbox,
      text: Option[String],
      classId: Int = 0,
      elementType: String = "",
      isExtracted: Boolean = false,
      source: String = "inferred",
      prob: Option[Double] = None,
      /** hi_res table-structure supplement results (`LayoutElements.text_as_html`
        * / `.table_as_cells`, `ocr.py:292-341`) — ride the region until
        * `document_to_element_list` copies them into element metadata. */
      textAsHtml: Option[String] = None,
      tableAsCells: Option[Seq[graft.model.TableCellMeta]] = None)

  /** `_inferred_is_text` (`:122-135`): non-image-like inferred types. */
  private val ImageLikeTypes = Set("Figure", "Image", "PageBreak", "Table")
  private val PictureLikeTypes = Set("Figure", "Image", "Picture")

  /**
   * `array_merge_inferred_layout_with_extracted_layout` (`:250-410`) — the
   * hi_res merge of the OD model's inferred regions with pdfminer's extracted
   * regions, rule for rule:
   *
   *  0. full-page extracted images are dropped;
   *  1. inferred regions almost-same as a kept extracted image are dropped;
   *  2. extracted text almost-same as an inferred region merges INTO it
   *     (text + extraction state adopted, bbox extended to contain both);
   *  3. up to `maxRounds` passes: extracted text subregions of an unprocessed
   *     inferred TEXT region are absorbed, expanding the inferred bbox;
   *  4. non-table inferred regions in any subregion relationship with a kept
   *     extracted region are dropped;
   *  5. everything else: kept extracted regions (original order) then
   *     surviving inferred regions.
   */
  def arrayMergeInferredWithExtracted(
      inferred0: Seq[LayoutRegion],
      extracted: Seq[LayoutRegion],
      pageWidth: Double,
      pageHeight: Double,
      sameRegionThreshold: Double = LayoutSameRegionThreshold,
      subregionThreshold: Double = LayoutSubregionThreshold,
      maxRounds: Int = 5): Seq[LayoutRegion] = {
    if (extracted.isEmpty) return inferred0
    if (inferred0.isEmpty) return extracted

    val fullPage: Bbox = (0, 0, pageWidth, pageHeight)

    // RULE 0
    val imageIdx0 = extracted.indices.filter(extracted(_).classId == 1)
    val imageIdxKeep = imageIdx0.filterNot { i =>
      boxesIou(Seq(extracted(i).bbox), Seq(fullPage), FullPageRegionThreshold).head.head
    }

    // RULE 1
    val keptImageBoxes = imageIdxKeep.map(extracted(_).bbox)
    val inferred = scala.collection.mutable.ArrayBuffer.from(
      inferred0.filterNot { inf =>
        keptImageBoxes.nonEmpty &&
          boxesIou(Seq(inf.bbox), keptImageBoxes, sameRegionThreshold).head.exists(identity)
      })
    val inferredToKeep = Array.fill(inferred.length)(true)

    val textIdx = extracted.indices.filter(extracted(_).classId == 0)
    if (textIdx.isEmpty)
      return inferred.toSeq ++ imageIdxKeep.map(extracted(_))
    if (inferred.isEmpty)
      return (imageIdxKeep ++ textIdx).sorted.map(extracted(_))

    // RULE 2 — the almost-same matrix is computed ONCE against the original
    // inferred boxes; duplicate first-matches resolve last-write-wins, and the
    // containing bbox derives from the ORIGINAL inferred coords (numpy
    // fancy-index assignment semantics, :138-176)
    val extractedText = scala.collection.mutable.ArrayBuffer.from(textIdx.map(extracted(_)))
    val extractedRemoved = Array.fill(extractedText.length)(false)
    val originalInferredBoxes = inferred.map(_.bbox).toSeq
    val lastMatchFor = scala.collection.mutable.Map.empty[Int, Int] // inferred -> extracted
    extractedText.indices.foreach { e =>
      val row = boxesIou(Seq(extractedText(e).bbox), originalInferredBoxes,
        sameRegionThreshold).head
      val first = row.indexOf(true)
      if (first >= 0) {
        extractedRemoved(e) = true
        lastMatchFor(first) = e
      }
    }
    lastMatchFor.foreach { case (i, e) =>
      inferred(i) = inferred(i).copy(
        text = extractedText(e).text,
        isExtracted = extractedText(e).isExtracted,
        bbox = minimumContainingCoords(originalInferredBoxes(i), extractedText(e).bbox))
    }

    // RULE 3
    val inferredToProc = Array.tabulate(inferred.length)(i =>
      !ImageLikeTypes.contains(inferred(i).elementType))
    val extractedToProc = extractedRemoved.map(!_)
    var rounds = 0
    var changed = true
    while (rounds < maxRounds && changed &&
      inferredToProc.contains(true) && extractedToProc.contains(true)) {
      rounds += 1
      changed = false
      val procInferred = inferred.indices.filter(inferredToProc)
      val procExtracted = extractedText.indices.filter(extractedToProc)
      val sub = isAlmostSubregionOf(
        procExtracted.map(extractedText(_).bbox),
        procInferred.map(inferred(_).bbox), subregionThreshold)
      procInferred.zipWithIndex.foreach { case (infIdx, col) =>
        val matches = procExtracted.indices.filter(r => sub(r)(col))
        if (matches.nonEmpty) {
          changed = true
          inferredToProc(infIdx) = false
          var box = inferred(infIdx).bbox
          matches.foreach { r =>
            extractedToProc(procExtracted(r)) = false
            box = minimumContainingCoords(box, extractedText(procExtracted(r)).bbox)
          }
          inferred(infIdx) = inferred(infIdx).copy(bbox = box)
        }
      }
    }

    // RULE 4
    val keptExtracted: Seq[LayoutRegion] =
      imageIdxKeep.map(extracted(_)) ++
        extractedText.indices.filter(extractedToProc).map(extractedText(_))
    if (keptExtracted.nonEmpty) {
      val proc = inferred.indices.filter { i =>
        inferredToProc(i) || PictureLikeTypes.contains(inferred(i).elementType)
      }
      val keptBoxes = keptExtracted.map(_.bbox)
      proc.foreach { i =>
        if (inferredToKeep(i)) {
          val infSubOfExt = isAlmostSubregionOf(Seq(inferred(i).bbox), keptBoxes,
            subregionThreshold).head.exists(identity)
          val extSubOfInf = isAlmostSubregionOf(keptBoxes, Seq(inferred(i).bbox),
            subregionThreshold).exists(_.head)
          if (infSubOfExt || extSubOfInf) inferredToKeep(i) = false
        }
      }
    }

    // RULE 5
    keptExtracted ++ inferred.indices.filter(inferredToKeep).map(inferred(_))
  }

  /**
   * `aggregate_embedded_text_by_block` (`:908-946`): join the texts of
   * source regions that are almost-subregions of the target block; the
   * extraction status is `true` only when every contributing region was
   * fully extracted AND their aggregate IoU with the block clears the
   * coverage threshold, `partial` otherwise, `false` when nothing landed.
   */
  def aggregateEmbeddedTextByBlock(target: Bbox, sources: Seq[SourceRegion],
      subregionThreshold: Double = EmbeddedTextAggregationSubregionThreshold,
      textCoverageThreshold: Double = TextCoverageThreshold)
      : (String, Option[String]) = {
    if (sources.isEmpty) return ("", None)
    val mask = isAlmostSubregionOf(sources.map(_.bbox), Seq(target),
      subregionThreshold).map(_.head)
    val inside = sources.zip(mask).collect { case (s, true) => s }
    val text = inside.flatMap(_.text).filter(_.nonEmpty).mkString(" ")
    val status =
      if (inside.isEmpty) ExtractedFalse
      else {
        val iou = aggregatedIou(inside.map(_.bbox), target)
        if (inside.forall(_.isExtracted) && iou > textCoverageThreshold)
          ExtractedTrue
        else ExtractedPartial
      }
    (text, Some(status))
  }
}
