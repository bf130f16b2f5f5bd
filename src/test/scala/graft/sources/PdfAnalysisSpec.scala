package graft.sources

import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PdfminerGeometry.LayoutRegion
import graft.sources.PdfAnalysis.TextAlignment

/**
 * The hi_res analysis surface, ported from
 * `test_unstructured/partition/pdf_image/test_analysis.py` — color/sizing/
 * label-geometry vectors plus the OD layout-dump shape — and an end-to-end
 * artifact pass over a reference PDF.
 */
class PdfAnalysisSpec extends AnyFunSuite {

  // -- test_get_rgb_color --
  test("getRgbColor resolves CSS names to byte triples") {
    Seq("red", "green", "blue", "yellow", "black", "white").foreach { name =>
      val (r, g, b) = PdfAnalysis.getRgbColor(name)
      assert(Seq(r, g, b).forall(c => c >= 0 && c <= 255), name)
    }
    assertThrows[IllegalArgumentException](PdfAnalysis.getRgbColor("not-a-color"))
  }

  // -- test_get_bbox_text_size --
  test("getBboxTextSize scales with the bbox/page diagonal ratio") {
    val pageSize = (1700, 2200)
    assert(PdfAnalysis.getBboxTextSize((0, 0, 90, 90), pageSize) === 17)
    assert(PdfAnalysis.getBboxTextSize((0, 0, 500, 200), pageSize) === 21)
    assert(PdfAnalysis.getBboxTextSize((0, 0, 10000, 10000), pageSize) === 32)
  }

  // -- test_get_bbox_thickness --
  test("getBboxThickness scales with the bbox/page diagonal ratio") {
    val pageSize = (1700, 2200)
    assert(PdfAnalysis.getBboxThickness((0, 0, 90, 90), pageSize) === 1)
    assert(PdfAnalysis.getBboxThickness((0, 0, 450, 250), pageSize) === 2)
    assert(PdfAnalysis.getBboxThickness((0, 0, 600, 1000), pageSize) === 3)
  }

  // -- test_best_text_color --
  test("getTextColor picks the contrastive black/white label color") {
    val expectWhite = Seq("navy", "crimson", "maroon", "dimgray", "darkgreen",
      "darkcyan", "fuchsia")
    val expectBlack = Seq("violet", "gold", "aqua", "greenyellow")
    expectWhite.foreach { c =>
      assert(PdfAnalysis.getTextColor(PdfAnalysis.getRgbColor(c))._2 ===
        ((255, 255, 255)), c)
    }
    expectBlack.foreach { c =>
      assert(PdfAnalysis.getTextColor(PdfAnalysis.getRgbColor(c))._2 === ((0, 0, 0)), c)
    }
  }

  // -- test_get_text_bbox --
  test("getLabelRectAndCoords anchors the label per alignment") {
    val vectors: Seq[(TextAlignment, ((Int, Int), (Int, Int)))] = Seq(
      (TextAlignment.Center, ((145, 145), (155, 155))),
      (TextAlignment.TopLeft, ((100, 90), (120, 100))),
      (TextAlignment.TopRight, ((180, 100), (200, 110))),
      (TextAlignment.BottomLeft, ((100, 190), (120, 200))),
      (TextAlignment.BottomRight, ((180, 190), (200, 200))))
    vectors.foreach { case (alignment, ((ex1, ey1), (ex2, ey2))) =>
      val (((x1, y1), (x2, y2)), _) = PdfAnalysis.getLabelRectAndCoords(
        alignment, (100, 100, 200, 200), textWidth = 10, textHeight = 10)
      // atol=10 as upstream — the rect extends for indent/correction padding
      Seq(x1 - ex1, y1 - ey1, x2 - ex2, y2 - ey2).foreach(d =>
        assert(math.abs(d) <= 10, s"$alignment: ($x1,$y1,$x2,$y2)"))
    }
  }

  // -- test_od_document_layout_dump --
  test("odLayoutDump renders pages, sizes, elements, and the class list") {
    def page(n: Int) = PdfHiRes.PageLayout(n, 100, 100, Nil)
    val inferred = Seq(
      Seq(LayoutRegion((0, 0, 10, 10), None, elementType = "Title", prob = Some(0.7)),
        LayoutRegion((0, 100, 10, 110), None, elementType = "Paragraph", prob = Some(0.8))),
      Seq(LayoutRegion((0, 0, 10, 10), None, elementType = "Table", prob = Some(0.9)),
        LayoutRegion((0, 100, 10, 110), None, elementType = "Image", prob = Some(1.0))))
    val dump = PdfAnalysis.odLayoutDump(Seq(page(1), page(2)), inferred,
      modelName = Some("yolox"))
    val json = PdfAnalysis.renderJson(dump)
    assert(json ===
      """{"pages":[{"number":1,"size":{"width":100.0,"height":100.0},""" +
      """"elements":[{"bbox":[0.0,0.0,10.0,10.0],"type":"Title","prob":0.7},""" +
      """{"bbox":[0.0,100.0,10.0,110.0],"type":"Paragraph","prob":0.8}]},""" +
      """{"number":2,"size":{"width":100.0,"height":100.0},""" +
      """"elements":[{"bbox":[0.0,0.0,10.0,10.0],"type":"Table","prob":0.9},""" +
      """{"bbox":[0.0,100.0,10.0,110.0],"type":"Image","prob":1.0}]}],""" +
      """"object_detection_classes":["Caption","Footnote","Formula","List-item",""" +
      """"Page-footer","Page-header","Picture","Section-header","Table","Text",""" +
      """"Title"]}""")
    // unknown / absent model name -> empty class list (the ValueError branch)
    assert(PdfAnalysis.renderJson(PdfAnalysis.odLayoutDump(Seq(page(1)), inferred))
      .endsWith(""""object_detection_classes":[]}"""))
  }

  // ------------------------------------------------------------- end-to-end

  private def refPdf(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(s"/root/reference/example-docs/pdf/$name"))

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

  test("partitionHiRes(analysis) writes layout dumps and bbox renders") {
    val outDir = Files.createTempDirectory("graft-analysis").toString
    val els = PdfHiRes.partitionHiRes(
      refPdf("multi-column-2p.pdf"), blockDetector,
      analysis = Some(PdfHiRes.AnalysisOptions(outDir, filename = "multi-column-2p.pdf")))
    assert(els.nonEmpty)
    val dumpDir = Paths.get(outDir, "analysis", "multi-column-2p", "layout_dump")
    // od + pdfminer + final (no OCR seam wired -> no ocr.json)
    assert(Files.exists(dumpDir.resolve("object_detection.json")))
    assert(Files.exists(dumpDir.resolve("pdfminer.json")))
    assert(Files.exists(dumpDir.resolve("final.json")))
    assert(!Files.exists(dumpDir.resolve("ocr.json")))
    val finalJson = new String(Files.readAllBytes(dumpDir.resolve("final.json")), "UTF-8")
    assert(finalJson.contains("\"type\":\"Title\"") || finalJson.contains("NarrativeText"))
    assert(finalJson.contains("\"cluster\":null"))
    val bboxDir = Paths.get(outDir, "analysis", "multi-column-2p", "bboxes")
    // 2 pages x 3 sources
    Seq("object_detection", "pdfminer", "final").foreach { src =>
      assert(Files.exists(bboxDir.resolve(s"page1_layout_$src.png")), src)
      assert(Files.exists(bboxDir.resolve(s"page2_layout_$src.png")), src)
    }
    // the png is a real image: readable, page-sized, with the caption band
    val img = javax.imageio.ImageIO.read(
      bboxDir.resolve("page1_layout_final.png").toFile)
    assert(img.getWidth > 100 && img.getHeight > 100)
    // skip flags suppress all artifacts, as upstream (tools.py:90-91)
    val outDir2 = Files.createTempDirectory("graft-analysis2").toString
    PdfHiRes.partitionHiRes(refPdf("multi-column-2p.pdf"), blockDetector,
      analysis = Some(PdfHiRes.AnalysisOptions(outDir2, skipBboxes = true)))
    assert(!Files.exists(Paths.get(outDir2, "analysis")))
  }
}
