package graft.sources

import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PdfminerGeometry.LayoutRegion

/**
 * End-to-end hi_res pipeline (`_partition_pdf_or_image_local`,
 * `partition/pdf.py:779-1106`): the five merge rules, inner-element cleanup,
 * text aggregation, normalization, and reading-order sort COMPOSING in one
 * pass — the piecewise kernels are pinned in PdfminerGeometrySpec; here the
 * stream flows through the whole pipeline.
 */
class PdfHiResSpec extends AnyFunSuite {

  private def refPdf(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(s"/root/reference/example-docs/pdf/$name"))

  // ------------------------------------------------- content-stream geometry

  test("extractLineRegions tracks Td/TD/Tm/TL/T* and flips to top-left space") {
    val content = "BT /F1 10 Tf 72 700 Td (first) Tj 0 -20 TD (second) Tj " +
      "14 TL T* (third) Tj 1 0 0 2 300 100 Tm (scaled) Tj ET"
    val rs = PdfHiRes.extractLineRegions(content, Map.empty, 792, 1.0)
    assert(rs.map(_.text.get) === Seq("first", "second", "third", "scaled"))
    val first = rs.head.bbox
    // baseline 700, size 10 -> top-left y span (792-710, 792-700)
    assert(first._1 === 72.0 && first._2 === 82.0 && first._4 === 92.0)
    // width estimate: 5 chars * 0.5em * 10pt
    assert(first._3 === 72.0 + 25.0)
    // TD moved to y=680; T* applied the 14pt leading from TL -> y=666
    assert(rs(1).bbox._4 === 792.0 - 680.0)
    assert(rs(2).bbox._4 === 792.0 - 666.0)
    // Tm d=2 doubles the effective size (10 -> 20) at (300, 100)
    assert(rs(3).bbox === ((300.0, 792.0 - 120.0, 300.0 + 6 * 0.5 * 20, 792.0 - 100.0)))
  }

  test("extractLineRegions groups same-baseline shows into one region") {
    val content = "BT /F1 12 Tf 72 700 Td (one ) Tj (two) Tj 50 0 Td (gap) Tj ET"
    val rs = PdfHiRes.extractLineRegions(content, Map.empty, 792, 1.0)
    // same Td line: "one two" merges; the x-only Td starts a new region at the
    // same baseline (pdfminer would likewise split on the horizontal jump)
    assert(rs.map(_.text.get) === Seq("one two", "gap"))
    assert(rs(0).bbox._2 === rs(1).bbox._2)
  }

  test("invisible text (render mode 3) marks its line region not-extracted") {
    // a scanned page's hidden OCR layer: `3 Tr` text is not rendered, so the
    // region carries the text but isExtracted=false (text_is_embedded,
    // pdfminer_processing.py:421-463) — downstream OCR may replace it
    val content = "BT /F1 10 Tf 3 Tr 72 700 Td (hidden ocr layer) Tj " +
      "0 Tr 0 -20 Td (visible caption) Tj ET"
    val regions = PdfHiRes.extractLineRegions(content, Map.empty, 792, 1.0)
    assert(regions.size === 2)
    val hidden = regions.find(_.text.contains("hidden ocr layer")).get
    val visible = regions.find(_.text.contains("visible caption")).get
    assert(!hidden.isExtracted, "mode-3 text must not count as embedded")
    assert(visible.isExtracted)
  }

  test("render mode is graphics state: `3 Tr` inside q..Q does not leak past Q") {
    // Tr is saved/restored by q/Q (PDF 32000 §9.3.1) — a hidden layer scoped
    // inside a q..Q block must not mark the page's subsequent REAL embedded
    // text OCR-eligible
    val content = "q BT /F1 10 Tf 3 Tr 72 700 Td (scoped hidden) Tj ET Q " +
      "BT /F1 10 Tf 72 600 Td (real embedded text) Tj ET"
    val rs = PdfHiRes.extractLineRegions(content, Map.empty, 792, 1.0)
    val hidden = rs.find(_.text.contains("scoped hidden")).get
    val real = rs.find(_.text.contains("real embedded text")).get
    assert(!hidden.isExtracted)
    assert(real.isExtracted, "mode 3 leaked past Q onto visible text")
    // and the unscoped form still persists across text objects (BT does NOT
    // reset text state)
    val unscoped = "BT /F1 10 Tf 3 Tr 72 700 Td (h1) Tj ET " +
      "BT /F1 10 Tf 72 600 Td (h2) Tj ET"
    assert(PdfHiRes.extractLineRegions(unscoped, Map.empty, 792, 1.0)
      .forall(!_.isExtracted))
  }

  test("a rotation-shaped cm suppresses geometry until Q restores the state") {
    // `0 1 -1 0 0 0 cm` is a quarter-turn: the diagonal CTM model cannot
    // express it, so emitting unrotated coordinates would be silently wrong.
    // Text inside the rotated q..Q is skipped; text after Q emits normally.
    val content = "q 0 1 -1 0 100 50 cm " +
      "BT /F1 10 Tf 72 700 Td (sideways) Tj ET Q " +
      "BT /F1 10 Tf 72 600 Td (upright) Tj ET"
    val rs = PdfHiRes.extractLineRegions(content, Map.empty, 792, 1.0)
    assert(rs.map(_.text.get) === Seq("upright"))
    assert(rs.head.bbox._1 === 72.0 && rs.head.bbox._4 === 792.0 - 600.0)
    // a plain scale+translate cm still produces geometry (no over-skipping)
    val scaled = "q 2 0 0 2 0 0 cm BT /F1 10 Tf 10 300 Td (kept) Tj ET Q"
    assert(PdfHiRes.extractLineRegions(scaled, Map.empty, 792, 1.0)
      .map(_.text.get) === Seq("kept"))
    // a rotation cancelled by its INVERSE without q/Q restores a diagonal
    // CTM — the full 2x2 composition clears the suppression (a sticky flag
    // would silently drop the rest of the page)
    val roundTrip = "0 1 -1 0 0 0 cm " +
      "BT /F1 10 Tf 72 700 Td (rotated-skipped) Tj ET " +
      "0 -1 1 0 0 0 cm " +
      "BT /F1 10 Tf 72 500 Td (back upright) Tj ET"
    assert(PdfHiRes.extractLineRegions(roundTrip, Map.empty, 792, 1.0)
      .map(_.text.get) === Seq("back upright"))
  }

  test("removeControlCharacters mirrors the reference cleanup") {
    // tab/newline -> space; the zero-width space (Cf) and BEL (Cc) drop
    assert(PdfHiRes.removeControlCharacters("a\tb\ncd\u200b\u0007ef") === "a b cdef")
  }

  // --------------------------------------------- all five merge rules compose

  /** One synthetic page through mergePage → cleanPage → pageToElements:
    * RULE 0 (full-page extracted image dropped), RULE 1 (inferred Figure
    * matching a kept extracted image dropped), RULE 2 (extracted line
    * almost-same as inferred Title -> text adopted), RULE 3 (lines absorbed
    * into inferred NarrativeText, text aggregated), RULE 4 (inferred box in
    * subregion relation with a kept extracted line dropped), RULE 5 (the kept
    * line survives as UncategorizedText), plus the pdfminer-inside-table
    * cleanup (a line under an inferred Table aggregates into the Table and
    * the scaffolding region is removed). */
  test("five merge rules + inner cleanup compose end-to-end on one page") {
    def line(bb: (Double, Double, Double, Double), t: String) =
      LayoutRegion(bb, Some(t), classId = 0, elementType = "UncategorizedText",
        isExtracted = true, source = "pdfminer")
    val extracted = Seq(
      LayoutRegion((0, 0, 1000, 800), None, classId = 1,
        elementType = "Image", source = "pdfminer"), // full page -> RULE 0
      LayoutRegion((700, 50, 900, 150), None, classId = 1,
        elementType = "Image", source = "pdfminer"), // kept image
      line((100, 50, 300, 70), "Heading line"), // RULE 2 target
      line((100, 100, 400, 115), "body one"), // RULE 3
      line((100, 120, 380, 135), "body two"), // RULE 3
      line((100, 300, 420, 320), "standalone kept"), // RULE 4/5
      line((120, 520, 280, 540), "cell text")) // inside Table -> cleanup
    val inferred = Seq(
      LayoutRegion((700, 50, 900, 150), None, elementType = "Figure",
        prob = Some(0.9)), // RULE 1: same as kept image
      LayoutRegion((100, 50, 300, 70), None, elementType = "Title",
        prob = Some(0.95)), // RULE 2
      LayoutRegion((95, 95, 405, 140), None, elementType = "NarrativeText",
        prob = Some(0.9)), // RULE 3
      LayoutRegion((150, 305, 260, 315), None, elementType = "NarrativeText",
        prob = Some(0.4)), // RULE 4: subregion of the standalone line
      LayoutRegion((100, 500, 300, 560), None, elementType = "Table",
        prob = Some(0.8))) // aggregates "cell text"; line cleaned up after
    val page = PdfHiRes.PageLayout(1, 1000, 800, extracted)
    val merged = PdfHiRes.mergePage(inferred, page)
    val cleaned = PdfHiRes.cleanPage(merged)
    val els = PdfHiRes.pageToElements(cleaned, page)
    assert(els.map(e => (e.`type`, e.text)) === Seq(
      "Title" -> "Heading line",
      "NarrativeText" -> "body one body two",
      "UncategorizedText" -> "standalone kept",
      "Table" -> "cell text",
      "Image" -> ""))
    // the rule-1-dropped Figure and the rule-4-dropped box are gone; the
    // full-page image never surfaced; the in-table scaffolding line is gone
    assert(els.count(_.`type` == "Image") === 1)
    // rule-2 merge carried the detector provenance, not the pdfminer one
    assert(els.head.metadata.detection_class_prob === Some(0.95))
  }

  // ------------------------------------------- real document, golden-pinned

  /** Deterministic stand-in detector: clusters the extracted lines into
    * blocks on vertical gaps (what a layout model's region proposals look
    * like over a clean two-column paper), labels the first page-1 block Title
    * and the rest NarrativeText. */
  private def blockDetector(pages: Seq[PdfHiRes.PageLayout]): Seq[Seq[LayoutRegion]] =
    pages.map { p =>
      val text = p.regions.filter(_.classId == 0)
      val blocks = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[LayoutRegion]]
      text.foreach { r =>
        if (blocks.nonEmpty && r.bbox._2 - blocks.last.map(_.bbox._4).max <= 6)
          blocks.last += r
        else blocks += mutable.ArrayBuffer(r)
      }
      blocks.zipWithIndex.map { case (b, i) =>
        val bb = (b.map(_.bbox._1).min - 3, b.map(_.bbox._2).min - 3,
          b.map(_.bbox._3).max + 3, b.map(_.bbox._4).max + 3)
        LayoutRegion(bb, None,
          elementType = if (p.pageNumber == 1 && i == 0) "Title" else "NarrativeText",
          prob = Some(0.9))
      }.toSeq
    }

  test("layout-parser-paper-fast.pdf partitions hi_res against the golden") {
    val els = PdfHiRes.partitionHiRes(
      refPdf("layout-parser-paper-fast.pdf"), blockDetector)
    assert(els.nonEmpty)
    // the paper's title (reference expected-structured-output for this doc
    // family) must come through the merge as the page-1 Title element
    val title = els.find(_.`type` == "Title").get
    assert(title.text.contains("LayoutParser"))
    assert(title.text.contains("Toolkit"))
    assert(title.metadata.page_number === Some(1))
    // the merged hi_res stream carries exactly the fast path's content: the
    // two paths glue TJ fragments differently around ligature kerns and sort
    // in different orders, so compare the letter/digit character multiset
    def letterBag(texts: Seq[String]): Map[Char, Int] =
      texts.flatten.filter(_.isLetterOrDigit).groupBy(identity).view.mapValues(_.size).toMap
    val fastBag = letterBag(
      PdfPartitioner.partitionPdf(refPdf("layout-parser-paper-fast.pdf")).map(_.text))
    assert(letterBag(els.map(_.text)) === fastBag)

    val rendered = els.map(e =>
      s"${e.metadata.page_number.get}|${e.`type`}|" +
        s"${e.metadata.category_depth.getOrElse(-1)}|${e.text}").mkString("\n")
    val goldenPath = Paths.get("src/test/resources/graft/hires/layout-parser-paper-fast.golden.txt")
    if (sys.env.contains("GRAFT_REGEN_GOLDEN")) {
      Files.writeString(goldenPath, rendered)
    }
    assert(rendered === Files.readString(goldenPath))
  }

  test("hi_res element stream is deterministic across runs") {
    val bytes = refPdf("layout-parser-paper-fast.pdf")
    val a = PdfHiRes.partitionHiRes(bytes, blockDetector)
    val b = PdfHiRes.partitionHiRes(bytes, blockDetector)
    assert(a === b)
  }

  // ------------------------------------------------- widened golden corpus

  private def render(els: Seq[graft.model.Element]): String =
    els.map(e =>
      s"${e.metadata.page_number.getOrElse(-1)}|${e.`type`}|" +
        s"${e.metadata.category_depth.getOrElse(-1)}|${e.text}").mkString("\n")

  private def checkGolden(name: String, rendered: String): Unit = {
    val goldenPath = Paths.get(s"src/test/resources/graft/hires/$name")
    if (sys.env.contains("GRAFT_REGEN_GOLDEN")) Files.writeString(goldenPath, rendered)
    assert(rendered === Files.readString(goldenPath))
  }

  test("multi-column-2p.pdf: multi-page reading order with PageBreak emission") {
    val els = PdfHiRes.partitionHiRes(refPdf("multi-column-2p.pdf"),
      blockDetector, includePageBreaks = true)
    // one PageBreak closes each page (include_page_breaks, pdf.py:1047-1050)
    assert(els.count(_.`type` == "PageBreak") === 2)
    assert(els.last.`type` === "PageBreak")
    // reading order never jumps back to an earlier page
    val pages = els.flatMap(_.metadata.page_number)
    assert(pages === pages.sorted)
    assert(pages.distinct === Seq(1, 2))
    checkGolden("multi-column-2p.golden.txt", render(els))
  }

  test("fake-memo.pdf: OCR supplement fills a textless region and adds leftovers") {
    // fake OCR source: one region under a detector box that has no extracted
    // text (the box text aggregates from OCR), one free-standing region far
    // from any box (supplement_layout_with_ocr_elements adds it)
    val ocr: PdfHiRes.OcrSource = _ => Seq(
      graft.operators.PdfminerGeometry.SourceRegion(
        (452, 702, 548, 718), Some("RECEIVED MAR 4"), isExtracted = false),
      graft.operators.PdfminerGeometry.SourceRegion(
        (50, 740, 180, 760), Some("scanned stamp"), isExtracted = false))
    val det: PdfHiRes.Detector = pages => blockDetector(pages).zip(pages).map {
      case (blocks, p) =>
        if (p.pageNumber == 1)
          blocks :+ LayoutRegion((445, 695, 555, 725), None,
            elementType = "NarrativeText", prob = Some(0.8))
        else blocks
    }
    val els = PdfHiRes.partitionHiRes(refPdf("fake-memo.pdf"), det, ocr = Some(ocr))
    assert(els.exists(_.text == "RECEIVED MAR 4"))
    assert(els.exists(e => e.text == "scanned stamp" &&
      e.`type` == "UncategorizedText"))
    checkGolden("fake-memo-ocr.golden.txt", render(els))
  }

  /** Deterministic grid agent: tokens cluster into rows on y-centers (new row
    * when the center moves > 3 crop px down), columns are positional within a
    * row in x order, first row is the header — the shape a TATR-style model
    * yields on a clean grid, as a seam stand-in. */
  private def gridAgent: PdfHiRes.TableAgent = (_, tokens) => {
    import graft.operators.TableExtraction.TatrCell
    val sorted = tokens.sortBy(t => ((t.bbox._2 + t.bbox._4) / 2, t.bbox._1))
    val rows = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[PdfHiRes.TableToken]]
    var lastY = Double.MinValue
    sorted.foreach { t =>
      val cy = (t.bbox._2 + t.bbox._4) / 2
      if (rows.isEmpty || cy - lastY > 3) rows += mutable.ArrayBuffer(t)
      else rows.last += t
      lastY = cy
    }
    rows.zipWithIndex.flatMap { case (r, ri) =>
      r.sortBy(_.bbox._1).zipWithIndex.map { case (t, ci) =>
        TatrCell(Seq(ri), Seq(ci), t.text, columnHeader = ri == 0)
      }
    }.toSeq
  }

  test("embedded-images-tables.pdf: image crop + table structure in ONE hi_res pass") {
    // the r11 image-block and table-structure paths composing on a real
    // scientific page that carries BOTH: a polarization-curve figure (real
    // DCT XObject) and the potentiodynamic-data table — plus the PageBreak
    // closing the page
    val bytes = refPdf("embedded-images-tables.pdf")
    val placed = PdfImages.placedImages(bytes)
    assert(placed.values.flatten.nonEmpty)
    val det: PdfHiRes.Detector = pages => blockDetector(pages).zip(pages).map {
      case (blocks, p) =>
        val pics = placed.getOrElse(p.pageNumber, Nil).map(pi =>
          LayoutRegion(pi.bbox, None, elementType = "Picture", prob = Some(0.95)))
        val table =
          if (p.pageNumber == 1)
            Seq(LayoutRegion((250, 264, 520, 302), None,
              elementType = "Table", prob = Some(0.9)))
          else Nil
        blocks ++ pics ++ table
    }
    val els = PdfHiRes.partitionHiRes(bytes, det,
      includePageBreaks = true,
      inferTableStructure = true, tableAgent = Some(gridAgent),
      extractTableAsCells = true,
      imageBlocks = PdfImages.ImageBlockOptions(types = Seq("Image"), toPayload = true))
    assert(els.last.`type` == "PageBreak")
    val table = els.find(_.`type` == "Table").get
    assert(table.metadata.text_as_html.get.contains("Inhibitor"))
    assert(table.metadata.text_as_html.get.startsWith("<table><thead>"))
    assert(table.metadata.table_as_cells.get.nonEmpty)
    val images = els.filter(e => e.`type` == "Image" &&
      e.metadata.image_base64.isDefined)
    assert(images.nonEmpty)
    val dims = images.map { e =>
      val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        java.util.Base64.getDecoder.decode(e.metadata.image_base64.get)))
      s"${e.metadata.page_number.get}|${dec.getWidth}x${dec.getHeight}"
    }
    checkGolden("embedded-images-tables.golden.txt",
      render(els) + "\n--table--\n" + table.metadata.text_as_html.get +
        "\n--payloads--\n" + dims.mkString("\n"))
  }

  test("layout-parser-paper-with-table.pdf: model-zoo table structure against the golden") {
    // the paper page whose ingest-test twin ships reference
    // expected-structured-output (local-single-file-with-pdf-infer-table-
    // structure): the model-zoo table must come through structured, with the
    // Dataset/Base Model/Large Model/Notes header row leading the grid
    val bytes = refPdf("layout-parser-paper-with-table.pdf")
    val det: PdfHiRes.Detector = pages => blockDetector(pages).zip(pages).map {
      case (blocks, p) =>
        if (p.pageNumber == 1)
          blocks :+ LayoutRegion((133, 137, 556, 203), None,
            elementType = "Table", prob = Some(0.9))
        else blocks
    }
    val els = PdfHiRes.partitionHiRes(bytes, det,
      includePageBreaks = true,
      inferTableStructure = true, tableAgent = Some(gridAgent),
      extractTableAsCells = true)
    assert(els.count(_.`type` == "PageBreak") == 1)
    val table = els.find(_.`type` == "Table").get
    val html = table.metadata.text_as_html.get
    assert(html.contains("<th>Dataset</th>"))
    assert(html.contains("PubLayNet"))
    assert(table.metadata.table_as_cells.get.exists(_.content == "HJDataset [31]"))
    checkGolden("layout-parser-paper-with-table.golden.txt",
      render(els) + "\n--table--\n" + html)
  }

  test("DA-1p.pdf: dense game-manual layout reading order against the golden") {
    // the single-page fixture the reference's analysis tests use (test_pdf.py
    // analysis_artifacts cases): 38 extracted line regions over a dense
    // multi-block layout — block clustering, reading order, and the PageBreak
    // pinned as a golden
    val els = PdfHiRes.partitionHiRes(refPdf("DA-1p.pdf"),
      blockDetector, includePageBreaks = true)
    assert(els.nonEmpty)
    assert(els.head.text == "MAIN GAME")
    assert(els.count(_.`type` == "PageBreak") == 1)
    // reading order: y strictly advances block to block on the one page
    val texts = els.filter(_.`type` != "PageBreak").map(_.text)
    assert(texts.exists(_.contains("Abomination")))
    checkGolden("DA-1p.golden.txt", render(els))
  }

  test("rotated-page-90.pdf: rotation corrections keep words grouped (golden)") {
    // the reference fixture carries `/Rotate 90` on the page dict: the
    // inference layer uprights the raster and threads rotation_corrections
    // = [90] into the pdfminer extraction (`pdf.py:769-775`, pinned by
    // test_pdf.py::test_hi_res_groups_rotated_page_text_into_words) —
    // extracted coordinates must land in the SAME rotated frame the
    // detector sees, or every line shatters into stray characters
    val bytes = Files.readAllBytes(
      Paths.get("/root/reference/example-docs/rotated-page-90.pdf"))
    val els = PdfHiRes.partitionHiRes(bytes, blockDetector,
      rotationCorrections = Seq(90))
    assert(els.nonEmpty)
    // the reference's own assertions on this fixture
    val texts = els.map(_.text).filter(_.length > 5)
    assert(texts.exists(_.contains("Hello World")),
      s"expected 'Hello World' grouped, got: ${els.map(_.text)}")
    assert(!els.exists(_.text.length == 1),
      "rotated page produced single-char elements")
    // geometry actually rotated: the canvas swapped to landscape and every
    // element's coordinates fit the rotated page box
    els.flatMap(_.metadata.coordinates).foreach { c =>
      val (w, h) = (c.layout_width.get, c.layout_height.get)
      assert(w > h, "canvas did not swap for 90°")
      assert(c.points.forall(p => p.x >= 0 && p.x <= w && p.y >= 0 && p.y <= h))
    }
    checkGolden("rotated-page-90.golden.txt", render(els))
  }

  test("embedded-images.pdf: real DCT XObjects place, rasterize, and crop") {
    val bytes = refPdf("embedded-images.pdf")
    val placed = PdfImages.placedImages(bytes)
    assert(placed.values.flatten.nonEmpty, "no decoded image placements found")
    // detector proposes a Picture box exactly on each placed image — what a
    // layout model does on this fixture — so the block crops are the images
    val det: PdfHiRes.Detector = pages => pages.map { p =>
      placed.getOrElse(p.pageNumber, Nil).map(pi =>
        LayoutRegion(pi.bbox, None, elementType = "Picture", prob = Some(0.95)))
    }
    val els = PdfHiRes.partitionHiRes(bytes, det,
      imageBlocks = PdfImages.ImageBlockOptions(types = Seq("Image"), toPayload = true))
    val images = els.filter(_.`type` == "Image")
    assert(images.nonEmpty)
    val withPayload = images.filter(_.metadata.image_base64.isDefined)
    assert(withPayload.nonEmpty)
    withPayload.foreach { e =>
      assert(e.metadata.image_mime_type.contains("image/jpeg"))
      val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        java.util.Base64.getDecoder.decode(e.metadata.image_base64.get)))
      assert(dec != null && dec.getWidth > 0 && dec.getHeight > 0)
    }
    checkGolden("embedded-images.golden.txt",
      render(els) + "\n--payloads--\n" +
        withPayload.map { e =>
          val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
            java.util.Base64.getDecoder.decode(e.metadata.image_base64.get)))
          s"${e.metadata.page_number.get}|${dec.getWidth}x${dec.getHeight}"
        }.mkString("\n"))
  }
}
