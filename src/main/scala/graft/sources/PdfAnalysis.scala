package graft.sources

import java.awt.image.BufferedImage
import java.awt.{BasicStroke, Color, Font, Graphics2D, RenderingHints}
import java.nio.file.{Files, Path, Paths}

import scala.collection.mutable

import graft.model.Element
import graft.operators.PdfminerGeometry.{Bbox, LayoutRegion, SourceRegion}
import graft.operators.Sorting
import graft.sinks.ElementJson
import graft.sources.PdfHiRes.PageLayout

/**
 * The hi_res analysis surface: per-stage layout dumps and bbox visualisations
 * for `partition_pdf(..., analysis=True)`.
 *
 * Re-derives `partition/pdf_image/analysis/{layout_dump,bbox_visualisation,
 * tools}.py`. Four layout sources are dumped/drawn, mirroring the reference's
 * processors: the OD-model (inferred) layout, the extracted (pdfminer-layer)
 * layout, the OCR layout, and the final element list. Dumps are JSON trees
 * with the reference's exact key sets (`layout_dump.py:40-183`); drawings are
 * produced with `java.awt` on the composited page rasters (the reference
 * draws on poppler-rendered page images with PIL — same geometry, different
 * rasterizer backend).
 */
object PdfAnalysis {

  // ------------------------------------------------------------ colors

  /** CSS/X11 color table covering every name the reference drawers and their
    * tests use (matplotlib resolves these same public CSS4 values —
    * `bbox_visualisation.py:62-76` `colors.to_rgb`). */
  val CssColors: Map[String, (Int, Int, Int)] = Map(
    "red" -> (255, 0, 0), "green" -> (0, 128, 0), "blue" -> (0, 0, 255),
    "yellow" -> (255, 255, 0), "black" -> (0, 0, 0), "white" -> (255, 255, 255),
    "navy" -> (0, 0, 128), "crimson" -> (220, 20, 60), "maroon" -> (128, 0, 0),
    "dimgray" -> (105, 105, 105), "darkgreen" -> (0, 100, 0),
    "darkcyan" -> (0, 139, 139), "fuchsia" -> (255, 0, 255),
    "violet" -> (238, 130, 238), "gold" -> (255, 215, 0), "aqua" -> (0, 255, 255),
    "greenyellow" -> (173, 255, 47), "salmon" -> (250, 128, 114),
    "orange" -> (255, 165, 0), "mediumpurple" -> (147, 112, 219),
    "deeppink" -> (255, 20, 147), "sienna" -> (160, 82, 45),
    "darkorange" -> (255, 140, 0), "turquoise" -> (64, 224, 208),
    "cyan" -> (0, 255, 255), "brown" -> (165, 42, 42),
    "lightskyblue" -> (135, 206, 250), "magenta" -> (255, 0, 255))

  /** `get_rgb_color` — `bbox_visualisation.py:62-76`. */
  def getRgbColor(color: String): (Int, Int, Int) =
    CssColors.getOrElse(color,
      throw new IllegalArgumentException(s"Invalid RGBA argument: '$color'"))

  // ------------------------------------------------------------ sizing

  private def bboxToPageRatio(bbox: (Int, Int, Int, Int), pageSize: (Int, Int)): Double = {
    val (x1, y1, x2, y2) = bbox
    val (pw, ph) = pageSize
    val pageDiagonal = math.sqrt(ph.toDouble * ph + pw.toDouble * pw)
    val w = (x2 - x1).toDouble
    val h = (y2 - y1).toDouble
    math.sqrt(h * h + w * w) / pageDiagonal
  }

  /** `_linear_polyfit_2point` — slope/intercept through two points. */
  private def linearPolyfit2Point(x0: Double, x1: Double, y0: Double, y1: Double)
      : (Double, Double) =
    if (x1 == x0) (0.0, (y0 + y1) / 2.0)
    else { val slope = (y1 - y0) / (x1 - x0); (slope, y0 - slope * x0) }

  /** `_get_optimal_value_for_bbox` — linear in the bbox/page diagonal ratio,
    * clamped to [min, max] (`bbox_visualisation.py:98-127`). */
  private def optimalValueForBbox(bbox: (Int, Int, Int, Int), pageSize: (Int, Int),
      minValue: Int, maxValue: Int,
      ratioForMin: Double = 0.01, ratioForMax: Double = 0.5): Int = {
    val ratio = bboxToPageRatio(bbox, pageSize)
    val (slope, intercept) = linearPolyfit2Point(ratioForMin, ratioForMax,
      minValue.toDouble, maxValue.toDouble)
    val value = (ratio * slope + intercept).toInt // int() truncation, as upstream
    math.max(minValue, math.min(maxValue, value))
  }

  /** `get_bbox_text_size` — label font size for a bbox (`:129-151`). */
  def getBboxTextSize(bbox: (Int, Int, Int, Int), pageSize: (Int, Int),
      minFontSize: Int = 16, maxFontSize: Int = 32): Int =
    optimalValueForBbox(bbox, pageSize, minFontSize, maxFontSize)

  /** `get_bbox_thickness` — outline width for a bbox (`:154-177`). */
  def getBboxThickness(bbox: (Int, Int, Int, Int), pageSize: (Int, Int),
      minThickness: Int = 1, maxThickness: Int = 4): Int =
    optimalValueForBbox(bbox, pageSize, minThickness, maxThickness)

  /** `get_text_color` (`:180-199`) — contrastive black/white for a background.
    * The brightness formula is mirrored bit-for-bit, INCLUDING the upstream
    * quirk of weighting channel 0 (red) with the 0.114 blue coefficient —
    * the ported test vectors depend on it. */
  def getTextColor(background: (Int, Int, Int), brightnessThreshold: Double = 0.5)
      : (String, (Int, Int, Int)) = {
    val brightness =
      (0.299 * background._1 + 0.587 * background._2 + 0.114 * background._1) / 255.0
    if (brightness > brightnessThreshold) ("black", (0, 0, 0))
    else ("white", (255, 255, 255))
  }

  // ------------------------------------------------------------ label layout

  sealed trait TextAlignment
  object TextAlignment {
    case object TopLeft extends TextAlignment
    case object TopRight extends TextAlignment
    case object BottomLeft extends TextAlignment
    case object BottomRight extends TextAlignment
    case object Center extends TextAlignment
  }

  /** `get_label_rect_and_coords` (`:202-264`): the label's background
    * rectangle ((x1,y1),(x2,y2)) and the text anchor, per alignment. */
  def getLabelRectAndCoords(alignment: TextAlignment, bboxPoints: (Int, Int, Int, Int),
      textWidth: Int, textHeight: Int): (((Int, Int), (Int, Int)), (Int, Int)) = {
    val indent = math.max((textWidth * 0.2).toInt, 10)
    val verticalCorrection = math.max((textHeight * 0.3).toInt, 10)
    val rectWidth = textWidth + indent * 2
    val rectHeight = textHeight + verticalCorrection
    val (x1, y1, x2, y2) = bboxPoints
    alignment match {
      case TextAlignment.Center =>
        val horizontalHalf = (rectWidth / 2 * 1.05).toInt
        val verticalHalf = (rectHeight / 2 * 1.05).toInt
        val cx = x1 + (x2 - x1) / 2
        val cy = y1 + (y2 - y1) / 2
        (((cx - horizontalHalf, cy - verticalHalf), (cx + horizontalHalf, cy + verticalHalf)),
          (cx - horizontalHalf + (indent * 1.05).toInt, (cy - verticalHalf * 1.05).toInt))
      case TextAlignment.TopLeft =>
        (((x1, y1 - rectHeight), (x1 + rectWidth, y1)), (x1 + indent, y1 - rectHeight))
      case TextAlignment.TopRight =>
        (((x2 - rectWidth, y1), (x2, y1 + rectHeight)), (x2 - textWidth - indent, y1))
      case TextAlignment.BottomLeft =>
        (((x1, y2 - rectHeight), (x1 + rectWidth, y2)), (x1 + indent, y2 - rectHeight))
      case TextAlignment.BottomRight =>
        (((x2 - rectWidth, y2 - rectHeight), (x2, y2)),
          (x2 - textWidth - indent, y2 - rectHeight))
    }
  }

  // ------------------------------------------------------------ drawing

  /** `BboxLabels` — optional text at each anchor of a drawn box. */
  final case class BboxLabels(
      topLeft: Option[String] = None, topRight: Option[String] = None,
      bottomLeft: Option[String] = None, bottomRight: Option[String] = None,
      center: Option[String] = None)

  /** `BBox` — pixel points plus labels. */
  final case class BBoxSpec(points: (Int, Int, Int, Int), labels: Option[BboxLabels] = None)

  // `get_font` picks an Arial-ish system font; the JVM's logical SansSerif is
  // the always-available equivalent (no font_manager in a headless JVM)
  private def font(size: Int) = new Font(Font.SANS_SERIF, Font.PLAIN, size)

  private def drawLabel(g: Graphics2D, text: String, bboxPoints: (Int, Int, Int, Int),
      alignment: TextAlignment, fontSize: Int, background: (Int, Int, Int)): Unit = {
    g.setFont(font(fontSize))
    val fm = g.getFontMetrics
    val textWidth = fm.stringWidth(text)
    val textHeight = fm.getAscent
    val (((rx1, ry1), (rx2, ry2)), (tx, ty)) =
      getLabelRectAndCoords(alignment, bboxPoints, textWidth, textHeight)
    g.setColor(new Color(background._1, background._2, background._3))
    g.fillRect(math.min(rx1, rx2), math.min(ry1, ry2), math.abs(rx2 - rx1), math.abs(ry2 - ry1))
    val (_, textRgb) = getTextColor(background)
    g.setColor(new Color(textRgb._1, textRgb._2, textRgb._3))
    // PIL anchors text at the top-left of the glyph box; awt drawString
    // anchors at the baseline — add the ascent
    g.drawString(text, tx, ty + fm.getAscent)
  }

  /** `draw_bbox_on_image` (`:315-388`): outline plus anchored labels; invalid
    * (degenerate) boxes are skipped, as upstream. */
  def drawBboxOnImage(image: BufferedImage, bbox: BBoxSpec, color: String): Unit = {
    val (x1, y1, x2, y2) = bbox.points
    if (x1 >= x2 || y1 >= y2) return
    val pageSize = (image.getWidth, image.getHeight)
    val thickness = getBboxThickness(bbox.points, pageSize)
    val fontSize = getBboxTextSize(bbox.points, pageSize)
    val rgb = getRgbColor(color)
    val g = image.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_TEXT_ANTIALIASING,
        RenderingHints.VALUE_TEXT_ANTIALIAS_ON)
      g.setColor(new Color(rgb._1, rgb._2, rgb._3))
      g.setStroke(new BasicStroke(thickness.toFloat))
      g.drawRect(x1, y1, x2 - x1, y2 - y1)
      bbox.labels.foreach { ls =>
        ls.topLeft.foreach(drawLabel(g, _, bbox.points, TextAlignment.TopLeft, fontSize, rgb))
        ls.topRight.foreach(drawLabel(g, _, bbox.points, TextAlignment.TopRight, fontSize, rgb))
        ls.bottomLeft.foreach(
          drawLabel(g, _, bbox.points, TextAlignment.BottomLeft, fontSize, rgb))
        ls.bottomRight.foreach(
          drawLabel(g, _, bbox.points, TextAlignment.BottomRight, fontSize, rgb))
        ls.center.foreach(
          drawLabel(g, _, bbox.points, TextAlignment.Center, fontSize * 2, rgb))
      }
    } finally g.dispose()
  }

  // ------------------------------------------------------------ layout dumps

  /** One dumped region — the union of the per-source key sets; rendering picks
    * the keys its `source` flavor defines (`layout_dump.py:40-183`). */
  final case class DumpElement(
      bbox: Seq[Double],
      elementType: Option[String] = None,
      prob: Option[Double] = None,
      text: Option[String] = None,
      source: Option[String] = None,
      isImage: Option[Boolean] = None)

  final case class DumpPage(number: Int, size: Option[(Option[Double], Option[Double])],
      elements: Seq[DumpElement])

  /** One layout source's dump: `layoutSource` selects the rendered key set. */
  final case class LayoutDump(layoutSource: String, pages: Seq[DumpPage],
      objectDetectionClasses: Option[Seq[String]] = None)

  /** YOLOX label universe — public DocLayNet-style class list the OD dump
    * attaches (`layout_dump.py:54-62`); unknown/fake model names dump an
    * empty list, mirroring the ValueError fallback. */
  val ObjectDetectionClasses: Seq[String] = Seq(
    "Caption", "Footnote", "Formula", "List-item", "Page-footer", "Page-header",
    "Picture", "Section-header", "Table", "Text", "Title")

  private def bboxSeq(b: Bbox): Seq[Double] = Seq(b._1, b._2, b._3, b._4)

  /** `ObjectDetectionLayoutDumper` — inferred regions per page with page raster
    * size; classes list attached when the model name is recognized. */
  def odLayoutDump(extracted: Seq[PageLayout], inferred: Seq[Seq[LayoutRegion]],
      modelName: Option[String] = None): LayoutDump = {
    val pages = extracted.zipWithIndex.map { case (page, i) =>
      val regions = if (i < inferred.length) inferred(i) else Nil
      DumpPage(page.pageNumber, Some((Some(page.width), Some(page.height))),
        regions.map(r => DumpElement(bboxSeq(r.bbox),
          elementType = Some(r.elementType), prob = r.prob)))
    }
    val classes =
      if (modelName.exists(n => n == "yolox" || n.startsWith("yolox_"))) ObjectDetectionClasses
      else Nil
    LayoutDump("object_detection", pages, Some(classes))
  }

  /** `ExtractedLayoutDumper` — the pdfminer-layer regions (`layout_source =
    * "pdfminer"`): bbox/text/source/is_image per region. */
  def extractedLayoutDump(extracted: Seq[PageLayout]): LayoutDump =
    LayoutDump("pdfminer", extracted.map { page =>
      DumpPage(page.number, None, page.regions.map(r =>
        DumpElement(bboxSeq(r.bbox), text = r.text, source = Some("pdfminer"),
          isImage = Some(r.classId == 1))))
    })

  /** `OCRLayoutDumper` — accumulates pages as they are OCRed. */
  final class OcrLayoutDumper {
    private val pages = mutable.ArrayBuffer.empty[DumpPage]
    private var pageNumber = 1
    def addOcredPage(regions: Seq[SourceRegion]): Unit = {
      pages += DumpPage(pageNumber, None, regions.map(r =>
        DumpElement(bboxSeq(r.bbox), text = r.text, source = Some("ocr"),
          isImage = Some(false))))
      pageNumber += 1
    }
    def dump: LayoutDump = LayoutDump("ocr", pages.toSeq)
  }

  /** `FinalLayoutDumper` — the emitted element list grouped by page, with
    * type/prob/text/bbox per element and the page size read off the first
    * element's coordinate system. */
  def finalLayoutDump(elements: Seq[Element]): LayoutDump = {
    val byPage = mutable.LinkedHashMap.empty[Int, mutable.ArrayBuffer[DumpElement]]
    val sizes = mutable.Map.empty[Int, (Option[Double], Option[Double])]
    elements.foreach { e =>
      val page = e.metadata.page_number.getOrElse(0)
      val buf = byPage.getOrElseUpdate(page, mutable.ArrayBuffer.empty)
      val bbox = e.metadata.coordinates match {
        case Some(c) if c.points.nonEmpty =>
          val (x1, y1, x2, y2) = Sorting.coordinatesToBbox(c)
          Seq(x1.toDouble, y1.toDouble, x2.toDouble, y2.toDouble)
        case _ => Seq(0.0, 0.0, 0.0, 0.0)
      }
      if (!sizes.contains(page))
        sizes(page) = e.metadata.coordinates
          .map(c => (c.layout_width, c.layout_height))
          .getOrElse((None, None))
      buf += DumpElement(bbox, elementType = Some(e.`type`),
        prob = e.metadata.detection_class_prob, text = Some(e.text))
    }
    LayoutDump("final",
      byPage.toSeq.sortBy(_._1).map { case (n, els) =>
        DumpPage(n, Some(sizes(n)), els.toSeq)
      })
  }

  // ------------------------------------------------------------ JSON render

  private def jStr(s: String): String = "\"" + ElementJson.esc(s) + "\""
  private def jNum(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) {
      // json.dumps renders float-typed whole numbers with a trailing ".0"
      s"${d.toLong}.0"
    } else d.toString

  /** Render one dump to JSON with the reference's per-source key sets and
    * orders (`layout_dump.py` — od: bbox/type/prob; pdfminer+ocr:
    * bbox/text/source/is_image; final: type/prob/text/bbox/cluster). */
  def renderJson(dump: LayoutDump): String = {
    def element(e: DumpElement): String = {
      val bbox = "\"bbox\":" + e.bbox.map(jNum).mkString("[", ",", "]")
      val fields = dump.layoutSource match {
        case "object_detection" =>
          Seq(Some(bbox), Some("\"type\":" + jStr(e.elementType.getOrElse(""))),
            Some("\"prob\":" + e.prob.map(jNum).getOrElse("null"))).flatten
        case "final" =>
          Seq("\"type\":" + jStr(e.elementType.getOrElse("")),
            "\"prob\":" + e.prob.map(jNum).getOrElse("null"),
            "\"text\":" + e.text.map(jStr).getOrElse("null"),
            bbox, "\"cluster\":null")
        case _ => // pdfminer / ocr
          Seq(bbox, "\"text\":" + e.text.map(jStr).getOrElse("null"),
            "\"source\":" + jStr(e.source.getOrElse(dump.layoutSource)),
            "\"is_image\":" + e.isImage.getOrElse(false).toString)
      }
      fields.mkString("{", ",", "}")
    }
    def page(p: DumpPage): String = {
      val fields = Seq.newBuilder[String]
      fields += "\"number\":" + p.number
      p.size.foreach { case (w, h) =>
        fields += "\"size\":{\"width\":" + w.map(jNum).getOrElse("null") +
          ",\"height\":" + h.map(jNum).getOrElse("null") + "}"
      }
      fields += "\"elements\":" + p.elements.map(element).mkString("[", ",", "]")
      fields.result().mkString("{", ",", "}")
    }
    val top = Seq.newBuilder[String]
    top += "\"pages\":" + dump.pages.map(page).mkString("[", ",", "]")
    dump.objectDetectionClasses.foreach { cs =>
      top += "\"object_detection_classes\":" + cs.map(jStr).mkString("[", ",", "]")
    }
    top.result().mkString("{", ",", "}")
  }

  // ------------------------------------------------------------ drawers

  /** OD color map — `ODModelLayoutDrawer.color_map` (`:477-489`). */
  val OdColorMap: Map[String, String] = Map(
    "Caption" -> "salmon", "Footnote" -> "orange", "Formula" -> "mediumpurple",
    "List-item" -> "navy", "Page-footer" -> "deeppink", "Page-header" -> "green",
    "Picture" -> "sienna", "Section-header" -> "darkorange", "Table" -> "blue",
    "Text" -> "turquoise", "Title" -> "greenyellow")

  /** Final color map — `FinalLayoutDrawer.color_map` (`:512-527`). */
  val FinalColorMap: Map[String, String] = Map(
    "CheckBox" -> "brown", "ListItem" -> "red", "Title" -> "greenyellow",
    "NarrativeText" -> "turquoise", "Header" -> "green", "Footer" -> "orange",
    "FigureCaption" -> "sienna", "Image" -> "sienna", "Table" -> "blue",
    "Address" -> "gold", "EmailAddress" -> "lightskyblue",
    "Formula" -> "mediumpurple", "CodeSnippet" -> "magenta",
    "PageNumber" -> "crimson")

  /** Draw one dump's page onto `image` — dispatches per layout source
    * (`SimpleLayoutDrawer` / `ODModelLayoutDrawer` / `FinalLayoutDrawer`). */
  def drawLayoutOnPage(image: BufferedImage, dump: LayoutDump, pageNum: Int): Unit = {
    val pageDump = dump.pages.lift(pageNum - 1).getOrElse(return)
    pageDump.elements.zipWithIndex.foreach { case (e, idx0) =>
      val idx = idx0 + 1
      val points = (e.bbox(0).toInt, e.bbox(1).toInt, e.bbox(2).toInt, e.bbox(3).toInt)
      dump.layoutSource match {
        case "object_detection" =>
          val tpe = e.elementType.getOrElse("")
          drawBboxOnImage(image, BBoxSpec(points, Some(BboxLabels(
            topLeft = Some(tpe),
            topRight = e.prob.map(p => f"prob: $p%.2f")))),
            OdColorMap.getOrElse(tpe, "cyan"))
        case "final" =>
          val tpe = e.elementType.getOrElse("")
          val textLen = e.text.map(_.length).getOrElse(0)
          drawBboxOnImage(image, BBoxSpec(points, Some(BboxLabels(
            topLeft = Some(tpe),
            topRight = e.prob.map(p => f"prob: $p%.2f"),
            bottomRight = Some(s"len: $textLen"),
            center = Some(s"$idx")))),
            FinalColorMap.getOrElse(tpe, "cyan"))
        case "pdfminer" =>
          // show_order=true for the pdfminer drawer (`PdfminerLayoutDrawer`)
          drawBboxOnImage(image, BBoxSpec(points,
            Some(BboxLabels(center = Some(s"$idx")))), "red")
        case _ => // ocr: plain red boxes
          drawBboxOnImage(image, BBoxSpec(points, None), "red")
      }
    }
  }

  // ------------------------------------------------------------ artifacts

  /** `save_analysis_artifiacts` + `JsonLayoutDumper.process` +
    * `AnalysisDrawer.process`: write `analysis/<stem>/layout_dump/<source>
    * .json` and `analysis/<stem>/bboxes/page{N}_layout_{source}.png` under
    * `saveDir`. `pageImage` supplies the rendered page raster (the composited
    * canvas in this engine); pages with no raster are skipped. */
  def saveAnalysisArtifacts(dumps: Seq[LayoutDump], filename: String, saveDir: String,
      pageImage: Int => Option[BufferedImage], pageCount: Int,
      skipBboxes: Boolean = false, skipDump: Boolean = false,
      drawCaption: Boolean = true): Seq[String] = {
    // upstream returns early when EITHER skip flag is set (tools.py:90-91);
    // mirrored as-is so the flag semantics stay wire-compatible
    if (skipBboxes || skipDump) return Nil
    val written = mutable.ArrayBuffer.empty[String]
    val stem = {
      val base = Paths.get(filename).getFileName.toString
      val dot = base.lastIndexOf('.')
      if (dot > 0) base.substring(0, dot) else base
    }
    val dumpDir = Paths.get(saveDir, "analysis", stem, "layout_dump")
    Files.createDirectories(dumpDir)
    dumps.foreach { d =>
      val p = dumpDir.resolve(s"${d.layoutSource}.json")
      Files.write(p, renderJson(d).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      written += p.toString
    }
    val bboxDir = Paths.get(saveDir, "analysis", stem, "bboxes")
    Files.createDirectories(bboxDir)
    (1 to pageCount).foreach { pageNum =>
      pageImage(pageNum).foreach { orig =>
        dumps.foreach { d =>
          val copy = new BufferedImage(orig.getWidth, orig.getHeight,
            BufferedImage.TYPE_INT_RGB)
          val g0 = copy.createGraphics()
          try g0.drawImage(orig, 0, 0, null) finally g0.dispose()
          drawLayoutOnPage(copy, d, pageNum)
          val image = if (drawCaption) addCaption(copy,
            s"Layout source: ${d.layoutSource}") else copy
          val p = bboxDir.resolve(s"page${pageNum}_layout_${d.layoutSource}.png")
          javax.imageio.ImageIO.write(image, "png", p.toFile)
          written += p.toString
        }
      }
    }
    written.toSeq
  }

  /** `AnalysisDrawer.add_caption` — a white band with the source label pasted
    * above the page. */
  private[sources] def addCaption(image: BufferedImage, caption: String): BufferedImage = {
    val capFont = font(52)
    val probe = image.createGraphics()
    val fm = try { probe.setFont(capFont); probe.getFontMetrics } finally probe.dispose()
    val textWidth = fm.stringWidth(caption)
    val textHeight = (fm.getAscent * 1.5).toInt
    val out = new BufferedImage(image.getWidth, image.getHeight + textHeight,
      BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setColor(Color.WHITE)
      g.fillRect(0, 0, out.getWidth, textHeight)
      g.setColor(Color.BLACK)
      g.setFont(capFont)
      g.drawString(caption, (image.getWidth - textWidth) / 2, 10 + fm.getAscent)
      g.drawImage(image, 0, textHeight, null)
    } finally g.dispose()
    out
  }

  private implicit class PageNum(private val p: PageLayout) extends AnyVal {
    def number: Int = p.pageNumber
  }
}
