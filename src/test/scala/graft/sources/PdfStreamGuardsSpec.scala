package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/**
 * Adversarial-input guards on the PDF stream decoders, mirroring the
 * reference's bounded-decode rules (`pdfminer_utils.py:38-205` +
 * `test_pdfminer_utils.py` TestParseEmbeddedCmapStream/TestBoundedStreamDecode):
 * a decompression bomb is REJECTED whole before materializing, never
 * truncated; a ToUnicode CMap stacking full-codespace bfranges past the
 * mapping budget is discarded whole (no partial map with holes).
 */
class PdfStreamGuardsSpec extends AnyFunSuite {

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  test("an oversized flate stream is rejected whole, not truncated") {
    val bomb = deflate(Array.fill[Byte](200)('x'))
    assert(PdfPartitioner.inflate(bomb, maxBytes = 100).isEmpty)
    // under the limit the same payload decodes fine
    assert(PdfPartitioner.inflate(bomb, maxBytes = 200).exists(_.length == 200))
    assert(PdfPartitioner.inflate(bomb).exists(_.length == 200))
  }

  test("a normal stream decodes within the default limit") {
    val text = "BT (hello) Tj ET".getBytes("ISO-8859-1")
    assert(PdfPartitioner.inflate(deflate(text)).exists(_.sameElements(text)))
  }

  test("a ToUnicode CMap past the mapping budget is discarded whole") {
    // three full 65k ranges in DISTINCT code planes = 196k mappings > 131072
    def range(plane: Int) =
      f"beginbfrange\n<${plane}%02x0000> <${plane}%02xffff> <0041>\nendbfrange\n"
    val (map, twoByte) =
      PdfPartitioner.parseToUnicode(range(0) + range(1) + range(2))
    assert(map.isEmpty, "budget-blown CMap must be discarded, not partial")
    assert(twoByte)
    // a single full range fits the budget and parses
    val (ok, _) = PdfPartitioner.parseToUnicode(range(0))
    assert(ok.size == 65536)
  }

  test("a reversed bfrange maps nothing but does not poison the CMap") {
    val cmap = "beginbfrange\n<00ff> <0001> <0041>\nendbfrange\n" +
      "beginbfchar\n<0042> <0058>\nendbfchar\n"
    val (map, _) = PdfPartitioner.parseToUnicode(cmap)
    assert(map == Map(0x42 -> "X"))
  }
}
