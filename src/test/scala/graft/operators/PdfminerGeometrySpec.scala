package graft.operators

/** See also: rotation vectors appended at the bottom of this suite. */

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PdfminerGeometry._

/**
 * Behavior port of `test_unstructured/partition/pdf_image/
 * test_pdfminer_processing.py` — the pure-geometry slice of the hi_res
 * post-processing pipeline over the reference's numeric vectors. (The
 * pdfminer/LTChar parsing and file-driven cases are model/library-bound.)
 */
class PdfminerGeometrySpec extends AnyFunSuite {

  test("rotate_bboxes matches PIL counter-clockwise expand rotation") {
    val w = 100.0
    val h = 200.0
    val box: Seq[Bbox] = Seq((10.0, 20.0, 30.0, 60.0))
    assert(rotateBboxes(box, 0, w, h) == box)
    assert(rotateBboxes(box, 360, w, h) == box)
    val r90 = rotateBboxes(box, 90, w, h)
    assert(r90 == Seq((20.0, w - 30.0, 60.0, w - 10.0)))
    assert(rotateBboxes(box, 180, w, h)
      == Seq((w - 30.0, h - 60.0, w - 10.0, h - 20.0)))
    assert(rotateBboxes(box, 270, w, h)
      == Seq((h - 60.0, 10.0, h - 20.0, 30.0)))
    // 90 then 270 about the rotated canvas restores the original
    assert(rotateBboxes(r90, 270, h, w) == box)
    Seq(90, 180, 270).foreach { a =>
      val Seq((x1, y1, x2, y2)) = rotateBboxes(box, a, w, h)
      assert(x1 < x2 && y1 < y2, a)
    }
  }

  test("validate_bbox vectors") {
    assert(!validateBbox(Seq(0, 1, 0, 1))) // zero width
    assert(validateBbox(Seq(0, 1, 1, 2)))
    assert(!validateBbox(Seq(0, 1, 1, Double.NaN))) // missing value
    assert(!validateBbox(Seq(0, 1, -1, 0))) // negative extent
    assert(!validateBbox(Seq(0, 1, -1, 2)))
  }

  test("bboxes1_is_almost_subregion_of_bboxes2 matrices") {
    def m(c1: Seq[Seq[Int]], c2: Seq[Seq[Int]]): Seq[Seq[Boolean]] =
      isAlmostSubregionOf(
        c1.map(r => (r(0).toDouble, r(1).toDouble, r(2).toDouble, r(3).toDouble)),
        c2.map(r => (r(0).toDouble, r(1).toDouble, r(2).toDouble, r(3).toDouble)))
    assert(m(
      Seq(Seq(0, 0, 10, 10), Seq(10, 0, 20, 10), Seq(10, 10, 20, 20)),
      Seq(Seq(0, 0, 10, 10), Seq(0, 0, 12, 12)))
      == Seq(Seq(true, true), Seq(false, false), Seq(false, false)))
    assert(m(
      Seq(Seq(0, 0, 10, 10), Seq(10, 0, 20, 10), Seq(10, 10, 20, 20)),
      Seq(Seq(0, 0, 10, 10), Seq(10, 10, 22, 22), Seq(0, 0, 5, 5)))
      == Seq(Seq(true, false, false), Seq(false, false, false),
        Seq(false, true, false)))
    // a degenerate box is a subregion of anything containing its pixel
    assert(m(
      Seq(Seq(0, 0, 10, 10), Seq(10, 10, 10, 10)),
      Seq(Seq(0, 0, 10, 10), Seq(10, 10, 22, 22), Seq(0, 0, 5, 5)))
      == Seq(Seq(true, false, false), Seq(true, true, false)))
  }

  test("boxes_self_iou matrices at 0.5 and 0.9 thresholds") {
    def boxes(c: Seq[Seq[Int]]): Seq[Bbox] =
      c.map(r => (r(0).toDouble, r(1).toDouble, r(2).toDouble, r(3).toDouble))
    val three = boxes(Seq(Seq(0, 0, 10, 10), Seq(2, 2, 12, 12), Seq(10, 10, 20, 20)))
    assert(boxesSelfIou(three, 0.5)
      == Seq(Seq(true, true, false), Seq(true, true, false), Seq(false, false, true)))
    assert(boxesSelfIou(three, 0.9)
      == Seq(Seq(true, false, false), Seq(false, true, false), Seq(false, false, true)))
    val degenerate = boxes(Seq(Seq(0, 0, 10, 10), Seq(10, 10, 10, 10)))
    assert(boxesSelfIou(degenerate, 0.5)
      == Seq(Seq(true, false), Seq(false, true)))
  }

  test("remove_duplicate_elements keeps the LAST of a near-duplicate pair") {
    val boxes: Seq[Bbox] = Seq((0, 0, 10, 10), (0, 0, 10, 10), (20, 20, 30, 30))
    assert(removeDuplicateIndices(boxes) == Seq(1, 2))
  }

  test("dense pages are not decimated (cross-pair duplicate only)") {
    // 2500 unique non-overlapping boxes + one exact duplicate of the first
    val unique: Seq[Bbox] = (0 until 2500).map { i =>
      val x = (i % 50) * 20.0
      val y = (i / 50) * 20.0
      (x, y, x + 10, y + 10)
    }
    val boxes = unique :+ unique.head
    assert(removeDuplicateIndices(boxes).length == 2500)
  }

  test("clean_pdfminer_inner_elements removes table-interior pdfminer regions") {
    // deletable: both pdfminer boxes sit inside the one table -> only it remains
    val deletable = Seq(
      PageRegion((0, 0, 100, 100), isPdfminer = false),
      PageRegion((50, 50, 70, 70), isPdfminer = true),
      PageRegion((70, 70, 80, 80), isPdfminer = true))
    assert(cleanPdfminerInnerElements(deletable) == Seq(0))
    // nothing pdfminer-sourced -> untouched
    val noDeletable = deletable.map(_.copy(isPdfminer = false))
    assert(cleanPdfminerInnerElements(noDeletable) == Seq(0, 1, 2))
    // mix: 8 regions, 3 pdfminer-inside-table removals -> 5 survive
    val mix = Seq(
      PageRegion((0, 0, 100, 100), isPdfminer = false), // Table1
      PageRegion((50, 50, 70, 70), isPdfminer = false), // inside, not pdfminer
      PageRegion((70, 70, 80, 80), isPdfminer = true), // inside Table1
      PageRegion((150, 150, 170, 170), isPdfminer = true), // outside
      PageRegion((180, 180, 200, 200), isPdfminer = true), // outside
      PageRegion((0, 500, 100, 700), isPdfminer = false), // Table2
      PageRegion((0, 510, 50, 600), isPdfminer = true), // inside Table2
      PageRegion((0, 550, 70, 650), isPdfminer = true)) // inside Table2
    assert(cleanPdfminerInnerElements(mix) == Seq(0, 1, 3, 4, 5))
  }

  test("aggregate_embedded_text_by_block: full coverage -> true") {
    val target: Bbox = (0, 0, 300, 300)
    val sources = Seq(
      SourceRegion((0, 0, 300, 20), Some("Inside region1"), isExtracted = true),
      SourceRegion((0, 20, 300, 80), None, isExtracted = true),
      SourceRegion((0, 80, 200, 300), Some("Inside region2"), isExtracted = true),
      SourceRegion((250, 250, 350, 350), Some("Outside region"), isExtracted = true))
    val (text, status) = aggregateEmbeddedTextByBlock(target, sources)
    assert(text == "Inside region1 Inside region2")
    assert(status.contains(ExtractedTrue))
  }

  test("aggregate: partial fill -> partial") {
    val (text, status) = aggregateEmbeddedTextByBlock((0, 0, 300, 300),
      Seq(SourceRegion((0, 0, 20, 20), Some("Inside region1"), isExtracted = true)))
    assert(text == "Inside region1")
    assert(status.contains(ExtractedPartial))
  }

  test("aggregate: nothing inside -> false") {
    val (text, status) = aggregateEmbeddedTextByBlock((0, 0, 300, 300),
      Seq(SourceRegion((300, 0, 400, 20), Some("outside"), isExtracted = true)))
    assert(text == "")
    assert(status.contains(ExtractedFalse))
  }

  test("minimum containing coords") {
    assert(minimumContainingCoords((0, 5, 10, 10), (2, 0, 12, 8)) == ((0.0, 0.0, 12.0, 10.0)))
  }

  // -- test_merge_elements.py --
  test("merge preserves extracted text and state on an almost-same region") {
    import PdfminerGeometry.{arrayMergeInferredWithExtracted, LayoutRegion}
    val inferred = Seq(LayoutRegion((0, 0, 100, 50), None, elementType = "NarrativeText"))
    val extracted = Seq(
      LayoutRegion((0, 0, 100, 50), Some("Extracted text"), isExtracted = true))
    val merged = arrayMergeInferredWithExtracted(inferred, extracted, 200, 200)
    assert(merged.flatMap(_.text) == Seq("Extracted text"))
    assert(merged.exists(_.isExtracted))
  }

  test("a lone extracted text region absorbs an inferred subregion") {
    import PdfminerGeometry.{arrayMergeInferredWithExtracted, LayoutRegion}
    val inferred = Seq(
      LayoutRegion((10, 10, 40, 40), None, elementType = "Section-header"))
    val extracted = Seq(
      LayoutRegion((0, 0, 100, 50), Some("Extracted text")))
    val merged = arrayMergeInferredWithExtracted(inferred, extracted, 200, 200)
    assert(merged.length == 1)
    assert(merged.head.text.contains("Extracted text"))
  }

  test("full-page extracted images are dropped; others kept (RULE 0)") {
    import PdfminerGeometry.{arrayMergeInferredWithExtracted, LayoutRegion}
    val inferred = Seq(
      LayoutRegion((500, 500, 600, 600), Some("inf"), elementType = "NarrativeText"))
    val extracted = Seq(
      LayoutRegion((0, 0, 200, 200), None, classId = 1), // full page
      LayoutRegion((10, 10, 50, 50), None, classId = 1)) // partial image
    val merged = arrayMergeInferredWithExtracted(inferred, extracted, 200, 200)
    // full-page image gone; partial image + far-away inferred survive
    assert(merged.length == 2)
    assert(merged.count(_.classId == 1) == 1)
  }

  test("extracted subregions expand the inferred text region (RULE 3)") {
    import PdfminerGeometry.{arrayMergeInferredWithExtracted, LayoutRegion}
    val inferred = Seq(
      LayoutRegion((10, 10, 100, 100), None, elementType = "NarrativeText"))
    val extracted = Seq(
      LayoutRegion((20, 20, 60, 60), Some("a")),
      LayoutRegion((50, 50, 105, 95), Some("b"))) // pokes out on x
    val merged = arrayMergeInferredWithExtracted(inferred, extracted, 500, 500)
    // both extracted absorbed; inferred bbox expanded to contain them
    assert(merged.length == 1)
    assert(merged.head.bbox == ((10.0, 10.0, 105.0, 100.0)))
  }

  // -- test_ocr.py (pure-geometry slice) --

  private def embeddedTextRegions: Seq[Bbox] = Seq(
    (453.00277777777774, 317.319341111111, 711.5338541666665, 358.28571222222206),
    (726.4778125, 317.319341111111, 760.3308594444444, 357.1698966666667),
    (775.2748177777777, 317.319341111111, 917.3579885555555, 357.1698966666667),
    (932.3019468888888, 317.319341111111, 1071.8426522222221, 357.1698966666667),
    (1086.7866105555556, 317.319341111111, 1141.2105142777777, 357.1698966666667),
    (1156.154472611111, 317.319341111111, 1256.334784222222, 357.1698966666667),
    (437.83888888888885, 367.13322999999986, 610.0171992222222, 406.9837855555556),
    (624.9611575555555, 367.13322999999986, 741.6754646666665, 406.9837855555556),
    (756.619423, 367.13322999999986, 958.3867708333332, 406.9837855555556),
    (973.3307291666665, 367.13322999999986, 1092.0535042777776, 406.9837855555556))

  private def mockOcrRegions: Seq[SourceRegion] = Seq(
    SourceRegion((10, 10, 90, 90), Some("0"), isExtracted = false),
    SourceRegion((200, 200, 300, 300), Some("1"), isExtracted = false),
    SourceRegion((500, 320, 600, 350), Some("3"), isExtracted = false))

  test("aggregate_ocr_text_by_block uses plain-area subregion semantics") {
    val ocr = Seq(
      SourceRegion((0, 0, 20, 20), Some("A"), isExtracted = false),
      SourceRegion((50, 50, 150, 150), Some("Unified"), isExtracted = false),
      SourceRegion((150, 150, 300, 250), Some("Toolkit"), isExtracted = false),
      SourceRegion((200, 250, 300, 350), Some("Deep"), isExtracted = false))
    assert(aggregateOcrTextByBlock(ocr, (0, 0, 250, 350), 0.5) == "A Unified Toolkit")
  }

  test("supplement_layout_with_ocr_elements keeps layout, appends uncovered OCR") {
    val layout = embeddedTextRegions.zipWithIndex.map { case (b, i) =>
      LayoutRegion(b, Some(s"t$i"), elementType = "UncategorizedText")
    }
    val out = supplementLayoutWithOcrElements(layout, mockOcrRegions)
    // every original element survives
    layout.foreach(el => assert(out.contains(el)))
    // OCR "0" and "1" are uncovered and appended; "3" sits inside layout[0]
    assert(out.exists(_.text.contains("0")))
    assert(out.exists(_.text.contains("1")))
    assert(!out.exists(_.text.contains("3")))
  }

  test("merge_out_layout_with_ocr_layout fills invalid text from OCR") {
    val outLayout = embeddedTextRegions.map(b =>
      LayoutRegion(b, Some(""), elementType = "Text"))
    val merged = mergeOutLayoutWithOcrLayout(outLayout, mockOcrRegions)
    // first element adopts the OCR text of the region inside its bbox
    assert(merged.head.text.contains("3"))
    assert(merged.head.bbox == outLayout.head.bbox)
    // other out elements keep their (empty-aggregated) place
    assert(merged.length == outLayout.length + 2) // + OCR "0" and "1"
    // a valid-text element is never overwritten
    val withValid = outLayout.updated(0, outLayout.head.copy(text = Some("keep me")))
    assert(mergeOutLayoutWithOcrLayout(withValid, mockOcrRegions)
      .head.text.contains("keep me"))
  }

  test("valid_text rejects empty and cid-bearing strings") {
    assert(!validText(None))
    assert(!validText(Some("")))
    assert(!validText(Some("foo (cid:123) bar")))
    assert(validText(Some("plain text")))
  }

  // -- test_inference_utils.py --

  private def lineOne: Seq[(Bbox, Option[String])] = Seq(
    ((453.00277777777774, 317.319341111111, 711.5338541666665, 358.28571222222206),
      Some("LayoutParser:")),
    ((726.4778125, 317.319341111111, 760.3308594444444, 357.1698966666667), Some("A")),
    ((775.2748177777777, 317.319341111111, 917.3579885555555, 357.1698966666667),
      Some("Unified")),
    ((932.3019468888888, 317.319341111111, 1071.8426522222221, 357.1698966666667),
      Some("Toolkit")),
    ((1086.7866105555556, 317.319341111111, 1141.2105142777777, 357.1698966666667),
      Some("for")),
    ((1156.154472611111, 317.319341111111, 1256.334784222222, 357.1698966666667),
      Some("Deep")),
    ((437.83888888888885, 367.13322999999986, 610.0171992222222, 406.9837855555556),
      Some("Learning")),
    ((624.9611575555555, 367.13322999999986, 741.6754646666665, 406.9837855555556),
      Some("Based")),
    ((756.619423, 367.13322999999986, 958.3867708333332, 406.9837855555556),
      Some("Document")),
    ((973.3307291666665, 367.13322999999986, 1092.0535042777776, 406.9837855555556),
      Some("Image")))

  test("merge_text_regions: envelope bbox + joined text") {
    val (bbox, text) = mergeTextRegions(lineOne)
    assert(bbox == ((437.83888888888885, 317.319341111111,
      1256.334784222222, 406.9837855555556)))
    assert(text == "LayoutParser: A Unified Toolkit for Deep Learning Based Document Image")
  }

  test("group_by_ocr_text: one section claims everything") {
    val out = buildLayoutElementsFromOcrText(lineOne,
      "LayoutParser: A Unified Toolkit for Deep Learning Based Document Image")
    assert(out.length == 1)
    assert(out.head.text.contains(
      "LayoutParser: A Unified Toolkit for Deep Learning Based Document Image"))
    assert(out.head.elementType == "UncategorizedText")
  }

  test("group_by_ocr_text: blank-line sections split the groups") {
    val out = buildLayoutElementsFromOcrText(lineOne,
      "LayoutParser: \n\nA Unified Toolkit for Deep Learning Based Document Image")
    assert(out.length == 2)
    assert(out(0).text.contains("LayoutParser:"))
    assert(out(0).bbox == ((453.00277777777774, 317.319341111111,
      711.5338541666665, 358.28571222222206)))
    assert(out(1).text.contains("A Unified Toolkit for Deep Learning Based Document Image"))
    assert(out(1).bbox == ((437.83888888888885, 317.319341111111,
      1256.334784222222, 406.9837855555556)))
  }

  test("group_by_ocr_text: repeated words claim later duplicate regions") {
    val extra: Seq[(Bbox, Option[String])] = Seq(
      ((453.00277777777774, 417.319341111111, 711.5338541666665, 458.28571222222206),
        Some("LayoutParser")),
      ((453.00277777777774, 468.319341111111, 711.5338541666665, 478.28571222222206),
        Some("for")),
      ((453.00277777777774, 488.319341111111, 711.5338541666665, 500.28571222222206),
        Some("Deep")),
      ((453.00277777777774, 510.319341111111, 711.5338541666665, 550.28571222222206),
        Some("Learning")))
    val out = buildLayoutElementsFromOcrText(lineOne ++ extra,
      "LayoutParser: \n\nA Unified Toolkit for Deep Learning Based Document Image\n\n" +
        "LayoutParser for Deep Learning")
    assert(out.length == 3)
    assert(out(2).text.contains("LayoutParser for Deep Learning"))
    assert(out(2).bbox == ((453.00277777777774, 417.319341111111,
      711.5338541666665, 550.28571222222206)))
  }

  // -- TestDeduplicateLtchars (test_pdfminer_processing.py:620-678) ----------
  private def ch(t: String, x: Double, y: Double): PdfminerGeometry.PChar =
    PdfminerGeometry.PChar(t, x, y, x + 10.0) // textwidth=10, like the mock LTChar

  test("char dedup: empty list returns empty") {
    assert(PdfminerGeometry.deduplicateChars(Nil, 3.0).isEmpty)
  }

  test("char dedup: threshold zero disables deduplication") {
    val chars = Seq(ch("A", 10.0, 20.0), ch("A", 10.5, 20.0))
    assert(PdfminerGeometry.deduplicateChars(chars, 0).size == 2)
  }

  test("char dedup: fake-bold double-rendered glyphs collapse") {
    val chars = Seq(ch("A", 10.0, 20.0), ch("A", 10.5, 20.0),
      ch("B", 25.0, 20.0), ch("B", 25.5, 20.0))
    val out = PdfminerGeometry.deduplicateChars(chars, 3.0)
    assert(out.map(_.text) == Seq("A", "B"))
  }

  test("char dedup: legitimate repeated chars at distinct positions survive") {
    val chars = Seq(ch("A", 10.0, 20.0), ch("A", 25.0, 20.0))
    assert(PdfminerGeometry.deduplicateChars(chars, 3.0).size == 2)
  }

  test("char dedup: single char returns single") {
    val out = PdfminerGeometry.deduplicateChars(Seq(ch("X", 10.0, 20.0)), 3.0)
    assert(out.map(_.text) == Seq("X"))
  }

  test("char dedup: mixed duplicates and normal chars (HELLO case)") {
    val chars = Seq(
      ch("H", 10.0, 20.0), ch("H", 10.5, 20.0), // duplicate
      ch("E", 20.0, 20.0),
      ch("L", 30.0, 20.0), ch("L", 30.5, 20.0), // duplicate
      ch("L", 40.0, 20.0),                      // legitimate second L
      ch("O", 50.0, 20.0))
    val out = PdfminerGeometry.deduplicateChars(chars, 3.0)
    assert(out.size == 5)
    assert(out.map(_.text).mkString == "HELLO")
  }

  test("char dedup: near positions but low overlap are kept (adjacent ll)") {
    // same glyph 2.0 apart with width 3 -> overlap 1/3 = 0.33 < 0.5 threshold
    val a = PdfminerGeometry.PChar("l", 10.0, 20.0, 13.0)
    val b = PdfminerGeometry.PChar("l", 12.0, 20.0, 15.0)
    assert(!PdfminerGeometry.isDuplicateChar(a, b, 3.0))
    // but 70%+ overlap at the same offset collapses
    val c = PdfminerGeometry.PChar("l", 10.5, 20.0, 13.5)
    assert(PdfminerGeometry.isDuplicateChar(a, c, 3.0))
  }

  // -- test_rotate_bboxes_matches_pil_rotation_directions
  // (test_pdfminer_processing.py:93-112): PIL CCW rotation with expand=True
  test("rotateBbox mirrors PIL rotation directions") {
    import PdfminerGeometry.rotateBbox
    val (w, h) = (100.0, 200.0)
    val box = (10.0, 20.0, 30.0, 60.0)
    assert(rotateBbox(box, 0, w, h) == box)
    assert(rotateBbox(box, 360, w, h) == box)
    val r90 = rotateBbox(box, 90, w, h)
    assert(r90 == ((20.0, w - 30.0, 60.0, w - 10.0)))
    assert(rotateBbox(box, 180, w, h) == ((w - 30.0, h - 60.0, w - 10.0, h - 20.0)))
    assert(rotateBbox(box, 270, w, h) == ((h - 60.0, 10.0, h - 20.0, 30.0)))
    // 90 then 270 about the post-rotation H x W canvas restores the box
    assert(rotateBbox(r90, 270, h, w) == box)
  }
}
