package graft.sources

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.util.Base64

import scala.collection.mutable

import graft.model.{Element, ElementType}
import graft.operators.PdfminerGeometry.Bbox

/**
 * hi_res image-block extraction — `extract_image_block_types` /
 * `extract_image_block_to_payload` (`partition/pdf.py:1013-1043`,
 * `pdf_image/pdf_image_utils.py:117-254`).
 *
 * The reference renders each page with poppler at `pdf_image_dpi` and crops
 * the element's padded bbox from that raster. Offline, the model-free
 * equivalent is compositing the page's EMBEDDED image XObjects (the content
 * image blocks exist to capture) onto a white page canvas at the same dpi:
 * placements come from the content stream's `q`/`Q`/`cm`/`Do` graphics
 * state, pixels from [[PdfPartitioner.pageImageXObjects]]. Crops of
 * Image-typed detector regions are then pixel-faithful wherever the region
 * is an embedded raster; text-only regions crop to the white background
 * (the reference's own crops degrade the same way on pages its renderer
 * can't rasterize).
 *
 * Scale shape: pure per-document logic inside the same `flatMap` as the
 * hi_res pipeline — one task per document, no shuffle, no driver state.
 * Payload mode (`image_base64`) is the cluster-safe path; `image_path` mode
 * writes executor-local files just as the reference writes container-local
 * ones.
 */
object PdfImages {

  /** Options mirroring the `partition_pdf` signature (`pdf.py:139-142`). */
  final case class ImageBlockOptions(
      extractImagesInPdf: Boolean = false,
      types: Seq[String] = Nil,
      toPayload: Boolean = false,
      outputDir: Option[String] = None,
      /** `EXTRACT_IMAGE_BLOCK_CROP_HORIZONTAL_PAD` / `_VERTICAL_PAD`
        * (`utils/config.py`) — both default 0. */
      hPad: Double = 0.0,
      vPad: Double = 0.0) {
    def enabled: Boolean = extractImagesInPdf || types.nonEmpty
  }

  /** One image placement: top-left-origin bbox in POINTS plus the raster. */
  final case class PlacedImage(bbox: Bbox, image: BufferedImage)

  // ------------------------------------------------------------- placements

  // graphics-state operators that position XObject draws: q/Q save/restore,
  // `a b c d e f cm` concatenation, `/Name Do` paint
  private val GfxTokenRe =
    ("""(-?[0-9.]+)\s+(-?[0-9.]+)\s+(-?[0-9.]+)\s+(-?[0-9.]+)\s+""" +
      """(-?[0-9.]+)\s+(-?[0-9.]+)\s+cm(?![A-Za-z0-9])""" + // 1-6
      """|/([A-Za-z0-9.+_-]+)\s+Do(?![A-Za-z0-9])""" + // 7
      """|(?<![A-Za-z0-9])([qQ])(?![A-Za-z0-9])""").r // 8

  /** Row-vector affine `[a b 0; c d 0; e f 1]` (PDF 1.7 §8.3.3). */
  private final case class Mat(a: Double, b: Double, c: Double, d: Double,
      e: Double, f: Double) {
    def apply(x: Double, y: Double): (Double, Double) =
      (a * x + c * y + e, b * x + d * y + f)
    /** `this` applied first, then `m` — `cm` sets CTM' = cm · CTM. */
    def andThen(m: Mat): Mat = Mat(
      a * m.a + b * m.c, a * m.b + b * m.d,
      c * m.a + d * m.c, c * m.b + d * m.d,
      e * m.a + f * m.c + m.e, e * m.b + f * m.d + m.f)
  }
  private val Identity = Mat(1, 0, 0, 1, 0, 0)

  /**
   * Placed images for one page: walk the content stream's graphics state; at
   * each `Do` of an image XObject, map the image's unit square through the
   * CTM and flip to the top-left frame. Degenerate (zero-extent) placements
   * drop — nothing can crop from them.
   */
  private[sources] def placementsIn(content: String, pageHeightPts: Double,
      xobjects: Map[String, PdfPartitioner.ImageXObject]): Seq[PlacedImage] = {
    if (xobjects.isEmpty) return Nil
    val out = mutable.ArrayBuffer.empty[PlacedImage]
    var ctm = Identity
    val stack = mutable.Stack.empty[Mat]
    GfxTokenRe.findAllMatchIn(content).foreach { m =>
      if (m.group(8) != null) {
        if (m.group(8) == "q") stack.push(ctm)
        else if (stack.nonEmpty) ctm = stack.pop()
      } else if (m.group(1) != null) {
        ctm = Mat(m.group(1).toDouble, m.group(2).toDouble, m.group(3).toDouble,
          m.group(4).toDouble, m.group(5).toDouble, m.group(6).toDouble)
          .andThen(ctm)
      } else {
        xobjects.get(m.group(7)).foreach { xo =>
          xo.image.foreach { img =>
            val corners = Seq(ctm(0, 0), ctm(1, 0), ctm(0, 1), ctm(1, 1))
            val xs = corners.map(_._1); val ys = corners.map(_._2)
            val bbox: Bbox = (xs.min, pageHeightPts - ys.max,
              xs.max, pageHeightPts - ys.min)
            if (bbox._3 - bbox._1 > 0 && bbox._4 - bbox._2 > 0)
              out += PlacedImage(bbox, img)
          }
        }
      }
    }
    out.toSeq
  }

  /** All pages' placed images, page number → placements (points). */
  def placedImages(bytes: Array[Byte]): Map[Int, Seq[PlacedImage]] = {
    val streams = PdfPartitioner.pageStreams(bytes)
    val xobjs = PdfPartitioner.pageImageXObjects(bytes)
    streams.zipWithIndex.map { case (ps, i) =>
      val xo = if (i < xobjs.length) xobjs(i) else Map.empty[String, PdfPartitioner.ImageXObject]
      ps.pageNumber -> placementsIn(ps.content, ps.height, xo)
    }.toMap
  }

  // ------------------------------------------------------------ rasterizing

  /** White page canvas at `coef = dpi / 72` scale with every placed image
    * drawn into its rect — the offline stand-in for `convert_pdf_to_image`
    * (`pdf_image_utils.py:58-82`), covering exactly the content image-block
    * extraction exists to capture. */
  def rasterizePage(widthPts: Double, heightPts: Double, coef: Double,
      placed: Seq[PlacedImage]): BufferedImage = {
    val w = math.max(1, math.round(widthPts * coef).toInt)
    val h = math.max(1, math.round(heightPts * coef).toInt)
    val canvas = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = canvas.createGraphics()
    try {
      g.setColor(java.awt.Color.WHITE)
      g.fillRect(0, 0, w, h)
      placed.foreach { p =>
        val x = math.round(p.bbox._1 * coef).toInt
        val y = math.round(p.bbox._2 * coef).toInt
        val pw = math.max(1, math.round((p.bbox._3 - p.bbox._1) * coef).toInt)
        val ph = math.max(1, math.round((p.bbox._4 - p.bbox._2) * coef).toInt)
        g.drawImage(p.image, x, y, pw, ph, null)
      }
    } finally g.dispose()
    canvas
  }

  // -------------------------------------------------------- type validation

  /** `ElementType.to_dict().values()` (`documents/elements.py:657-701`) — the
    * list `check_element_types_to_extract` validates against. */
  private val AvailableElementTypes: Seq[String] = Seq(
    "Title", "Text", "UncategorizedText", "NarrativeText", "BulletedText",
    "Paragraph", "Abstract", "Threading", "Form", "Field-Name", "Value",
    "Link", "CompositeElement", "Image", "Picture", "FigureCaption", "Figure",
    "Caption", "List", "ListItem", "List-item", "Checked", "Unchecked",
    "CheckBoxChecked", "CheckBoxUnchecked", "RadioButtonChecked",
    "RadioButtonUnchecked", "Address", "EmailAddress", "PageBreak", "Formula",
    "Table", "Header", "Headline", "Subheadline", "Page-header",
    "Section-header", "Footer", "Footnote", "Page-footer", "PageNumber",
    "CodeSnippet", "FormKeysValues", "DocumentData")

  private val AvailableByLower: Map[String, String] =
    AvailableElementTypes.map(t => t.toLowerCase -> t).toMap

  /** `check_element_types_to_extract` (`pdf_image_utils.py:230-254`):
    * case-insensitive match against the known types, else Python
    * `str.capitalize()`; unknown results are kept (the reference only logs a
    * warning). */
  def checkElementTypesToExtract(types: Seq[String]): Seq[String] =
    types.map { t =>
      AvailableByLower.getOrElse(t.toLowerCase, {
        val lower = t.toLowerCase
        if (lower.isEmpty) lower else lower.substring(0, 1).toUpperCase + lower.substring(1)
      })
    }

  // ------------------------------------------------------------ save pass

  /** `save_elements` (`pdf_image_utils.py:117-227`) for one category pass:
    * per element of the category with coordinate points, crop the padded
    * bbox from the page raster (PIL semantics: int-truncated box, regions
    * outside the page fill black), JPEG-encode, then either embed
    * (`image_base64` + `image_mime_type=image/jpeg`) or write
    * `{table|figure}-{page}-{n}.jpg` under the output dir (`image_path`).
    * The figure counter spans pages and increments per coordinate-bearing
    * element of the category — including ones whose crop then fails
    * (`figure_number += 1` precedes the try) — all reference-faithful. */
  def saveElements(elements: Seq[Element], categoryToSave: String,
      rasterForPage: Int => Option[BufferedImage], opts: ImageBlockOptions)
      : Seq[Element] = {
    val outputDirPath: Option[java.nio.file.Path] =
      if (opts.toPayload) None
      else {
        val p = opts.outputDir
          .map(java.nio.file.Paths.get(_))
          .getOrElse(java.nio.file.Paths.get("").toAbsolutePath.resolve("figures"))
        java.nio.file.Files.createDirectories(p)
        Some(p)
      }
    var figureNumber = 0
    elements.map { el =>
      val points = el.metadata.coordinates.map(_.points).getOrElse(Nil)
      if (el.`type` != categoryToSave || points.length < 3) el
      else {
        // points(0) = (x1, y1), points(2) = (x2, y2) — `save_elements:180-183`
        val (x1, y1) = (points(0).x, points(0).y)
        val (x2, y2) = (points(2).x, points(2).y)
        figureNumber += 1
        val pageNumber = el.metadata.page_number.getOrElse(1)
        rasterForPage(pageNumber).flatMap { raster =>
          crop(raster, x1 - opts.hPad, y1 - opts.vPad, x2 + opts.hPad,
            y2 + opts.vPad)
        } match {
          case None => el // "Image Extraction Error: Skipping the failed image"
          case Some(cropped) =>
            if (opts.toPayload) {
              val buf = new ByteArrayOutputStream()
              javax.imageio.ImageIO.write(cropped, "jpeg", buf)
              el.copy(metadata = el.metadata.copy(
                image_base64 = Some(Base64.getEncoder.encodeToString(buf.toByteArray)),
                image_mime_type = Some("image/jpeg")))
            } else {
              val basename =
                if (el.`type` == ElementType.Table) "table" else "figure"
              val path = outputDirPath.get
                .resolve(s"$basename-$pageNumber-$figureNumber.jpg")
              javax.imageio.ImageIO.write(cropped, "jpeg", path.toFile)
              el.copy(metadata = el.metadata.copy(
                image_path = Some(path.toString)))
            }
        }
      }
    }
  }

  /** PIL `Image.crop` semantics: box int-truncated, out-of-page area black,
    * empty boxes fail (→ element skipped, like the reference's caught
    * ValueError). */
  private[sources] def crop(src: BufferedImage, x1: Double, y1: Double,
      x2: Double, y2: Double): Option[BufferedImage] = {
    val left = x1.toInt; val top = y1.toInt
    val right = x2.toInt; val bottom = y2.toInt
    val w = right - left; val h = bottom - top
    if (w <= 0 || h <= 0) return None
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB) // zero-filled = black
    val sx = math.max(0, left); val sy = math.max(0, top)
    val ex = math.min(src.getWidth, right); val ey = math.min(src.getHeight, bottom)
    if (ex > sx && ey > sy) {
      val g = out.createGraphics()
      try g.drawImage(src.getSubimage(sx, sy, ex - sx, ey - sy),
        sx - left, sy - top, null)
      finally g.dispose()
    }
    Some(out)
  }

  /** The `pdf.py:1013-1043` orchestration: the deprecated
    * `extract_images_in_pdf` runs an Image pass first, then one pass per
    * normalized requested type (skipping Image when already covered). */
  def applyImageBlocks(elements: Seq[Element], opts: ImageBlockOptions,
      rasterForPage: Int => Option[BufferedImage]): Seq[Element] = {
    if (!opts.enabled) return elements
    val types = checkElementTypesToExtract(opts.types)
    var els = elements
    if (opts.extractImagesInPdf)
      els = saveElements(els, ElementType.Image, rasterForPage, opts)
    types.foreach { t =>
      if (!(opts.extractImagesInPdf && t == ElementType.Image))
        els = saveElements(els, t, rasterForPage, opts)
    }
    els
  }
}
