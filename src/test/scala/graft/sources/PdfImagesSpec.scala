package graft.sources

import java.awt.image.BufferedImage

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Coordinates, Element, ElementMetadata, ElementType, Point}
import graft.queries.CorpusBytes
import graft.operators.PdfminerGeometry.LayoutRegion

/** Image-block extraction kernels + the `save_elements` pass
  * (`pdf_image/pdf_image_utils.py:117-254`, `pdf.py:1013-1043`) and the
  * end-to-end hi_res composition over a PDF with an embedded image XObject. */
class PdfImagesSpec extends AnyFunSuite {

  private val doc = CorpusBytes.Doc(7L, "alpha beta gamma",
    Seq("alpha beta gamma delta"), "alpha", "srcA", 100L)

  private def el(tpe: String, x1: Double, y1: Double, x2: Double, y2: Double,
      page: Int = 1): Element =
    Element("", tpe, "t", "d", 1, ElementMetadata(
      page_number = Some(page),
      coordinates = Some(Coordinates(points = Seq(
        Point(x1, y1), Point(x1, y2), Point(x2, y2), Point(x2, y1))))))

  // ---------------------------------------------------------------- placements

  test("pageImageXObjects decodes a FlateDecode DeviceRGB stream") {
    val xobjs = PdfPartitioner.pageImageXObjects(CorpusBytes.pdfWithImage(doc))
    assert(xobjs.length == 2)
    val im1 = xobjs.head("Im1")
    assert(im1.widthPx == 24 && im1.heightPx == 16)
    val img = im1.image.get
    // pixel (x, y) = ((x*10 + docId) % 256, (y*16) % 256, 100)
    assert((img.getRGB(0, 0) & 0xFFFFFF) == ((7 << 16) | (0 << 8) | 100))
    assert((img.getRGB(3, 2) & 0xFFFFFF) == ((37 << 16) | (32 << 8) | 100))
    assert(xobjs(1).isEmpty) // page 2 has no XObjects
  }

  test("placementsIn maps the unit square through nested q/cm/Q state") {
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    val xo = Map("Im1" -> PdfPartitioner.ImageXObject(2, 2, Some(img)))
    // page 200pt tall; outer cm scales 2x, inner places a 50x30 rect at (10,20)
    val content = "2 0 0 2 0 0 cm q 50 0 0 30 10 20 cm /Im1 Do Q /Im1 Do"
    val placed = PdfImages.placementsIn(content, 200.0, xo)
    assert(placed.length == 2)
    // inner: rect (10,20)-(60,50) scaled 2x -> (20,40)-(120,100), flipped:
    // y_top = 200-100 = 100, y_bot = 200-40 = 160
    assert(placed.head.bbox == ((20.0, 100.0, 120.0, 160.0)))
    // after Q the outer CTM alone applies: unit square 2x -> (0,0)-(2,2),
    // flipped to (0, 198, 2, 200)
    assert(placed(1).bbox == ((0.0, 198.0, 2.0, 200.0)))
  }

  test("placementsIn drops zero-extent placements and undecodable images") {
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    val xo = Map(
      "Ok" -> PdfPartitioner.ImageXObject(2, 2, Some(img)),
      "NoRaster" -> PdfPartitioner.ImageXObject(8, 8, None))
    val content = "0 0 0 0 5 5 cm /Ok Do 10 0 0 10 0 0 cm /NoRaster Do"
    assert(PdfImages.placementsIn(content, 100.0, xo).isEmpty)
  }

  // --------------------------------------------------------------------- crop

  test("crop truncates the box to ints and fills out-of-page area black") {
    val src = new BufferedImage(10, 10, BufferedImage.TYPE_INT_RGB)
    (0 until 10).foreach(y => (0 until 10).foreach(x => src.setRGB(x, y, 0xFFFFFF)))
    val c = PdfImages.crop(src, -2.9, 0.0, 3.9, 2.0).get // box (-2,0)-(3,2)
    assert(c.getWidth == 5 && c.getHeight == 2)
    assert((c.getRGB(0, 0) & 0xFFFFFF) == 0) // left of page: black
    assert((c.getRGB(2, 0) & 0xFFFFFF) == 0xFFFFFF) // on page: white
    assert(PdfImages.crop(src, 5, 5, 5, 9).isEmpty) // empty box skips
  }

  // ------------------------------------------------------ type normalization

  test("checkElementTypesToExtract matches case-insensitively, else capitalizes") {
    assert(PdfImages.checkElementTypesToExtract(Seq("image", "TABLE")) ==
      Seq("Image", "Table"))
    assert(PdfImages.checkElementTypesToExtract(Seq("list-item")) ==
      Seq("List-item"))
    // unknown types kept after Python str.capitalize() (warning only)
    assert(PdfImages.checkElementTypesToExtract(Seq("banner")) == Seq("Banner"))
  }

  // ------------------------------------------------------------ save pass

  private def whiteRaster(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(java.awt.Color.WHITE); g.fillRect(0, 0, w, h); g.dispose()
    img
  }

  test("saveElements payload mode stamps base64 + mime, leaves path empty") {
    val els = Seq(el(ElementType.Image, 10, 10, 60, 40),
      el(ElementType.NarrativeText, 0, 0, 5, 5))
    val raster = whiteRaster(100, 100)
    val out = PdfImages.saveElements(els, ElementType.Image, _ => Some(raster),
      PdfImages.ImageBlockOptions(types = Seq("Image"), toPayload = true))
    val img = out.head
    assert(img.metadata.image_base64.isDefined)
    assert(img.metadata.image_mime_type.contains("image/jpeg"))
    assert(img.metadata.image_path.isEmpty)
    val decoded = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      java.util.Base64.getDecoder.decode(img.metadata.image_base64.get)))
    assert(decoded.getWidth == 50 && decoded.getHeight == 30)
    // non-category element untouched
    assert(out(1).metadata.image_base64.isEmpty)
  }

  test("saveElements path mode writes {table|figure}-{page}-{n}.jpg across pages") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-imgblk").toString
    val els = Seq(
      el(ElementType.Image, 0, 0, 10, 10, page = 1),
      el(ElementType.Image, 0, 0, 0, 0, page = 1), // empty box: counted, skipped
      el(ElementType.Image, 5, 5, 25, 15, page = 2),
      el(ElementType.Table, 0, 0, 30, 20, page = 1))
    def raster(p: Int) = Some(whiteRaster(100, 100))
    val opts = PdfImages.ImageBlockOptions(types = Seq("Image", "Table"),
      outputDir = Some(tmp))
    val afterImages = PdfImages.saveElements(els, ElementType.Image, raster, opts)
    val out = PdfImages.saveElements(afterImages, ElementType.Table, raster, opts)
    // reference numbering: counter per category pass, spanning pages, and the
    // failed (empty-box) crop still consumed number 2
    assert(out(0).metadata.image_path.get.endsWith("figure-1-1.jpg"))
    assert(out(1).metadata.image_path.isEmpty)
    assert(out(2).metadata.image_path.get.endsWith("figure-2-3.jpg"))
    assert(out(3).metadata.image_path.get.endsWith("table-1-1.jpg"))
    assert(out.forall(_.metadata.image_base64.isEmpty))
    Seq("figure-1-1.jpg", "figure-2-3.jpg", "table-1-1.jpg").foreach { f =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(tmp, f)), f)
    }
  }

  // ------------------------------------------------------------- end-to-end

  private val detector: PdfHiRes.Detector = pages => pages.map { p =>
    if (p.pageNumber == 1) Seq(
      LayoutRegion((100, 192, 250, 292), None, elementType = "Picture",
        prob = Some(0.9)),
      LayoutRegion((60, 40, 600, 150), None, elementType = "Table",
        prob = Some(0.85)))
    else Nil
  }

  test("partitionHiRes + payload extraction crops the embedded image faithfully") {
    val els = PdfHiRes.partitionHiRes(CorpusBytes.pdfWithImage(doc), detector,
      imageBlocks = PdfImages.ImageBlockOptions(
        types = Seq("Image", "Table"), toPayload = true))
    val img = els.find(_.`type` == ElementType.Image).get
    val table = els.find(_.`type` == ElementType.Table).get
    assert(img.metadata.image_base64.isDefined)
    assert(table.metadata.image_base64.isDefined)
    assert(table.text.startsWith("alpha beta gamma"))
    val decoded = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      java.util.Base64.getDecoder.decode(img.metadata.image_base64.get)))
    assert(decoded.getWidth == 150 && decoded.getHeight == 100)
    // the crop lands exactly on the placed 24x16 gradient scaled to 150x100:
    // sample the pixel at source (12, 8) -> crop (~78, ~53); JPEG is lossy so
    // compare channel-wise with tolerance
    val rgb = decoded.getRGB(78, 53)
    val (r, g, b) = ((rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF)
    val (er, eg, eb) = ((12 * 10 + 7) % 256, (8 * 16) % 256, 100)
    assert(math.abs(r - er) < 32 && math.abs(g - eg) < 32 && math.abs(b - eb) < 32,
      s"got ($r,$g,$b) expected ~($er,$eg,$eb)")
    // Table region is text-only: its crop composites the white background
    val tdec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      java.util.Base64.getDecoder.decode(table.metadata.image_base64.get)))
    assert(tdec.getWidth == 540 && tdec.getHeight == 110)
    val trgb = tdec.getRGB(270, 55)
    assert(((trgb >> 16) & 0xFF) > 220) // white-ish
  }

  test("extract_images_in_pdf (deprecated flag) extracts Image blocks alone") {
    val els = PdfHiRes.partitionHiRes(CorpusBytes.pdfWithImage(doc), detector,
      imageBlocks = PdfImages.ImageBlockOptions(
        extractImagesInPdf = true, toPayload = true))
    assert(els.find(_.`type` == ElementType.Image).get.metadata.image_base64.isDefined)
    assert(els.find(_.`type` == ElementType.Table).get.metadata.image_base64.isEmpty)
  }

  test("no image-block options means no metadata changes") {
    val els = PdfHiRes.partitionHiRes(CorpusBytes.pdfWithImage(doc), detector)
    assert(els.forall(_.metadata.image_base64.isEmpty))
    assert(els.forall(_.metadata.image_path.isEmpty))
  }
}
