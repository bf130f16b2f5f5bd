package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CorpusBytes

/** Header decode + magic routing for the image family. The corpus builders
  * (CorpusBytes) are construction-side only — a decoder bug shows as a dim
  * mismatch here and as an oracle hash break in q_partition_image. */
class ImagePartitionerSpec extends AnyFunSuite {

  test("png dims + rgba channels") {
    val m = ImagePartitioner.imageMeta(CorpusBytes.png(640, 480)).get
    assert(m == ImagePartitioner.ImageMeta("png", "image/png", 640, 480, 4))
  }

  test("gif dims little-endian, >255 exercises the high byte") {
    val m = ImagePartitioner.imageMeta(CorpusBytes.gif(777, 300)).get
    assert((m.format, m.width, m.height) == (("gif", 777, 300)))
  }

  test("jpeg SOF walk dims + component count") {
    val m = ImagePartitioner.imageMeta(CorpusBytes.jpeg(1920, 1080)).get
    assert((m.format, m.width, m.height, m.nChannels) == (("jpeg", 1920, 1080, 3)))
  }

  test("bmp dims + bpp channels; negative (top-down) height taken absolute") {
    val m = ImagePartitioner.imageMeta(CorpusBytes.bmp(321, 123)).get
    assert((m.format, m.width, m.height, m.nChannels) == (("bmp", 321, 123, 3)))
    val topDown = CorpusBytes.bmp(321, -123)
    val m2 = ImagePartitioner.bmpMeta(topDown).get
    assert(m2.height == 123)
  }

  test("tiff IFD walk in both byte orders") {
    val ii = ImagePartitioner.imageMeta(CorpusBytes.tiff(800, 600, bigEndian = false)).get
    val mm = ImagePartitioner.imageMeta(CorpusBytes.tiff(801, 601, bigEndian = true)).get
    assert((ii.width, ii.height, ii.nChannels) == ((800, 600, 3)))
    assert((mm.width, mm.height, mm.nChannels) == ((801, 601, 3)))
  }

  test("truncated jpeg (fill bytes to buffer edge) returns None, not a crash") {
    // the exact payload from the round-7 review: FF D8 FF FF FF FF
    val b = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xFF.toByte,
      0xFF.toByte, 0xFF.toByte)
    assert(graft.operators.MultimodalOps.jpegDims(b).isEmpty)
    assert(ImagePartitioner.imageMeta(b).isEmpty)
    assert(ImagePartitioner.partitionImage(b).isEmpty)
  }

  test("malformed payloads return None across decoders") {
    assert(ImagePartitioner.imageMeta(Array.emptyByteArray).isEmpty)
    assert(ImagePartitioner.imageMeta("not an image at all".getBytes).isEmpty)
    assert(ImagePartitioner.imageMeta(null).isEmpty)
    // tiff header pointing its IFD past the buffer
    val bad = Array[Byte]('I', 'I', 42, 0, 0x40, 0, 0, 0)
    assert(ImagePartitioner.tiffMeta(bad).isEmpty)
  }

  test("magic detection routes extension-less image payloads") {
    def ft(b: Array[Byte]) = DetectFiletype.detect("img", b, None)
    assert(ft(CorpusBytes.png(2, 2)) == FileType.Png)
    assert(ft(CorpusBytes.jpeg(2, 2)) == FileType.Jpg)
    assert(ft(CorpusBytes.gif(2, 2)) == FileType.Gif)
    assert(ft(CorpusBytes.bmp(2, 2)) == FileType.Bmp)
    assert(ft(CorpusBytes.tiff(2, 2, bigEndian = false)) == FileType.Tiff)
    assert(ft(CorpusBytes.tiff(2, 2, bigEndian = true)) == FileType.Tiff)
  }

  test("auto-router emits one Image element with mime metadata") {
    val (ft, paras) = Partitioners.partitionAuto("shot", CorpusBytes.png(10, 20))
    assert(ft == FileType.Png)
    assert(paras.map(p => (p.elementType, p.imageMime)) ==
      Seq((Some("Image"), Some("image/png"))))
  }

  // -- test_partition_image_with_multipage_tiff (test_image.py:163) +
  // test_multi_page_tiff_starts_on_starting_page_number (:667)
  test("a multi-page TIFF partitions page by page from starting_page_number") {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "/root/reference/example-docs/img/layout-parser-paper-combined.tiff"))
    assert(ImagePartitioner.tiffPageCount(bytes) == 2)
    val paras = ImagePartitioner.partitionImage(bytes, None)
    assert(paras.last.pageNumber.contains(2))
    // starting_page_number=2 -> pages {2, 3} (the reference's exact pin)
    val shifted = ImagePartitioner.partitionImage(bytes, None, startingPageNumber = 2)
    assert(shifted.flatMap(_.pageNumber).toSet == Set(2, 3))
    // single-IFD tiff stays one page
    assert(ImagePartitioner.tiffPageCount(
      CorpusBytes.tiff(2, 2, bigEndian = false)) == 1)
    // OCR agent runs once per page, each with its own page number
    val ocr: PdfHiRes.OcrSource = p => Seq(
      graft.operators.PdfminerGeometry.SourceRegion(
        (10, 10, 200, 30), Some(s"page ${p.pageNumber} words"), isExtracted = false))
    val withOcr = ImagePartitioner.partitionImage(bytes, Some(ocr))
    assert(withOcr.map(p => (p.text, p.pageNumber.get)) ==
      Seq(("page 1 words", 1), ("page 2 words", 2)))
  }
}
