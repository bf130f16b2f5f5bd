package graft.sources

import graft.sources.HtmlPartitioner.RawPara

/**
 * `partition_image` — `/root/reference/unstructured/partition/image.py:17` routes
 * to `partition_pdf_or_image(is_image=True)`; the reference's hi_res path runs a
 * layout-detection model + OCR. No vision model ships offline, so here the
 * IMAGE-STRUCTURE layer is real — format identification and pixel-dimension
 * decode straight from the container headers (PNG IHDR, GIF logical screen
 * descriptor, JPEG SOF marker walk, BMP DIB header, TIFF IFD walk in either byte
 * order) — and the element emitted is the `Image` element carrying that
 * metadata, with the OCR transcript as the documented pluggable stub (empty
 * text; a provider swaps in a model call without touching the decode or
 * routing).
 *
 * All decoders are bounds-checked pure byte readers returning None on malformed
 * input — a corrupt image must never crash a task, it yields zero elements.
 * Per-file, no shuffle; at scale this runs inside the auto-router's flatMap.
 */
object ImagePartitioner {

  final case class ImageMeta(format: String, mime: String,
      width: Int, height: Int, nChannels: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) |
      (u8(b, i + 3).toLong << 24)

  /** PNG: 8-byte signature, IHDR width/height BE32 at 16/20, color type at 25
    * (0 grey=1ch, 2 rgb=3, 3 palette=1, 4 grey+alpha=2, 6 rgba=4). */
  def pngMeta(b: Array[Byte]): Option[ImageMeta] = {
    val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)
    if (b.length < 26 || !sig.indices.forall(i => u8(b, i) == sig(i))) return None
    val ch = u8(b, 25) match { case 2 => 3; case 4 => 2; case 6 => 4; case _ => 1 }
    Some(ImageMeta("png", "image/png", be32(b, 16).toInt, be32(b, 20).toInt, ch))
  }

  /** GIF: "GIF87a"/"GIF89a", then logical-screen width/height LE16. */
  def gifMeta(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 10) return None
    val hdr = new String(b, 0, 6, java.nio.charset.StandardCharsets.ISO_8859_1)
    if (hdr != "GIF87a" && hdr != "GIF89a") return None
    Some(ImageMeta("gif", "image/gif", le16(b, 6), le16(b, 8), 3))
  }

  /** JPEG: SOF marker walk via [[graft.operators.MultimodalOps.jpegDims]];
    * channel count read from the SOF component count by the same walk shape. */
  def jpegMeta(b: Array[Byte]): Option[ImageMeta] =
    graft.operators.MultimodalOps.jpegDims(b).map { case (w, h) =>
      ImageMeta("jpeg", "image/jpeg", w, h, jpegChannels(b).getOrElse(3))
    }

  private def jpegChannels(b: Array[Byte]): Option[Int] = {
    // Re-walk to the SOF segment (same structure as jpegDims); ncomp is the
    // byte after the 2-byte width, i.e. SOF payload offset 7 → absolute i+9.
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return None
      while (i + 3 < b.length && u8(b, i + 1) == 0xff) i += 1
      if (i + 3 >= b.length) return None
      val m = u8(b, i + 1)
      if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2
      else if (m == 0xd9 || m == 0xda) return None
      else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
        return if (i + 9 < b.length) Some(u8(b, i + 9)) else None
      } else {
        val len = be16(b, i + 2)
        if (len < 2) return None
        i += 2 + len
      }
    }
    None
  }

  /** BMP: "BM", DIB header at 14 (size 40/108/124 = BITMAPINFOHEADER family),
    * width/height as signed LE32 at 18/22 (negative height = top-down rows),
    * bits-per-pixel LE16 at 28. The 12-byte BITMAPCOREHEADER uses LE16 dims. */
  def bmpMeta(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 26 || b(0) != 'B'.toByte || b(1) != 'M'.toByte) return None
    val dib = le32(b, 14).toInt
    if (dib == 12) { // BITMAPCOREHEADER: u16 dims at 18/20, bpp at 24
      val bpp = if (b.length >= 26) le16(b, 24) else 24
      Some(ImageMeta("bmp", "image/bmp", le16(b, 18), le16(b, 20),
        math.max(1, bpp / 8)))
    } else if (dib == 40 || dib == 52 || dib == 56 || dib == 108 || dib == 124) {
      if (b.length < 30) return None
      val w = le32(b, 18).toInt
      val h = le32(b, 22).toInt
      val bpp = le16(b, 28)
      Some(ImageMeta("bmp", "image/bmp", math.abs(w), math.abs(h),
        math.max(1, bpp / 8)))
    } else None
  }

  /** TIFF: "II*\0" (little-endian) or "MM\0*" (big-endian), IFD offset at 4;
    * IFD entries are 12 bytes — tag(2) type(2) count(4) value(4) with SHORT
    * values left-justified in the value field. Tags: 256 ImageWidth,
    * 257 ImageLength, 277 SamplesPerPixel. */
  def tiffMeta(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 8) return None
    val little =
      if (b(0) == 'I'.toByte && b(1) == 'I'.toByte && u8(b, 2) == 42 && u8(b, 3) == 0) true
      else if (b(0) == 'M'.toByte && b(1) == 'M'.toByte && u8(b, 2) == 0 && u8(b, 3) == 42) false
      else return None
    def rd16(i: Int) = if (little) le16(b, i) else be16(b, i)
    def rd32(i: Int) = if (little) le32(b, i) else be32(b, i)
    val ifd = rd32(4)
    if (ifd < 8 || ifd + 2 > b.length) return None
    val n = rd16(ifd.toInt)
    var w, h = -1
    var spp = 3
    var e = 0
    while (e < n) {
      val off = ifd.toInt + 2 + e * 12
      if (off + 12 > b.length) return None
      val tag = rd16(off)
      val typ = rd16(off + 2)
      // SHORT(3) is left-justified in the 4-byte value field; LONG(4) fills it
      val value: Long =
        if (typ == 3) rd16(off + 8).toLong
        else if (typ == 4) rd32(off + 8)
        else -1L
      if (tag == 256 && value >= 0) w = value.toInt
      else if (tag == 257 && value >= 0) h = value.toInt
      else if (tag == 277 && value >= 0) spp = value.toInt
      e += 1
    }
    if (w < 0 || h < 0) None
    else Some(ImageMeta("tiff", "image/tiff", w, h, spp))
  }

  /** Number of pages in a TIFF: length of the IFD chain (each IFD's trailing
    * 4 bytes point at the next; 0 terminates). 1 for anything non-TIFF. */
  def tiffPageCount(b: Array[Byte]): Int = {
    if (b.length < 8) return 1
    val little =
      if (b(0) == 'I'.toByte && b(1) == 'I'.toByte && u8(b, 2) == 42 && u8(b, 3) == 0) true
      else if (b(0) == 'M'.toByte && b(1) == 'M'.toByte && u8(b, 2) == 0 && u8(b, 3) == 42) false
      else return 1
    def rd16(i: Int) = if (little) le16(b, i) else be16(b, i)
    def rd32(i: Int) = if (little) le32(b, i) else be32(b, i)
    var ifd = rd32(4)
    var pages = 0
    while (ifd >= 8 && ifd + 2 <= b.length && pages < 512) {
      pages += 1
      val n = rd16(ifd.toInt)
      val nextAt = ifd.toInt + 2 + n * 12
      ifd = if (nextAt + 4 <= b.length) rd32(nextAt) else 0
    }
    math.max(1, pages)
  }

  /** Format-dispatching metadata decode — first magic that matches wins. */
  def imageMeta(b: Array[Byte]): Option[ImageMeta] =
    if (b == null) None
    else pngMeta(b).orElse(gifMeta(b)).orElse(jpegMeta(b))
      .orElse(bmpMeta(b)).orElse(tiffMeta(b))

  /** One `Image` element per decodable payload (reference emits layout-detected
    * elements; the detection/OCR kernel is the documented stub — text empty,
    * structure metadata real). Malformed payloads yield zero elements. */
  def partitionImage(b: Array[Byte]): Seq[RawPara] =
    partitionImage(b, graft.operators.Registries.ocrAgent)

  /**
   * With an OCR agent registered the image runs the ocr_only shape
   * (`partition_pdf_or_image(is_image=True)` → OCR →
   * `ocr_data_to_elements`): the agent's line regions over the decoded pixel
   * geometry normalize, sort, and clean exactly like a scanned PDF page. The
   * OCR inference itself stays the seam; without an agent, the Image element
   * with decoded metadata is emitted as before.
   */
  def partitionImage(b: Array[Byte],
      ocr: Option[PdfHiRes.OcrSource],
      startingPageNumber: Int = 1): Seq[RawPara] =
    imageMeta(b).toSeq.flatMap { m =>
      // a multi-page TIFF partitions page by page, numbered from
      // starting_page_number (`test_image.py:163-167,667-680`); every other
      // format is a single page
      val pages = if (m.format == "tiff") tiffPageCount(b) else 1
      (0 until pages).flatMap { i =>
        val pageNum = startingPageNumber + i
        val imageEl = RawPara("", elementType = Some("Image"),
          imageMime = Some(m.mime), pageNumber = Some(pageNum), classifier = "image")
        ocr match {
          case Some(agent) =>
            val page = PdfHiRes.PageLayout(pageNum, m.width.toDouble, m.height.toDouble, Nil)
            val regions = agent(page).map(r =>
              graft.operators.PdfminerGeometry.LayoutRegion(r.bbox, r.text,
                classId = 0, elementType = "UncategorizedText",
                source = "ocr_tesseract"))
            val ocrEls = PdfHiRes.pageToElements(PdfHiRes.sortBasic(regions), page)
              .map(PdfHiRes.toRawPara)
              .map(_.copy(pageNumber = Some(pageNum)))
            if (ocrEls.nonEmpty) ocrEls else Seq(imageEl)
          case None => Seq(imageEl)
        }
      }
    }
}
