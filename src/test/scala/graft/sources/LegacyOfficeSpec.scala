package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CorpusBytes
import graft.queries.CorpusBytes.Doc

/** Legacy binary Office readers over corpus-built containers. */
class LegacyOfficeSpec extends AnyFunSuite {

  private val d = Doc(7L, "Annual Report Overview",
    Seq("first body paragraph here.", "second one follows."), "Annual", "crm", 120L)

  // ------------------------------------------------------------------------ .doc

  test("doc: piece table text, cross-piece paragraph, page break") {
    val paras = LegacyOfficePartitioner.partitionDoc(CorpusBytes.doc(d))
    assert(paras.map(_.text) == Seq(
      "Annual Report Overview",
      "café first body paragraph here.",
      "second one follows.",
      "page two crm"))
    assert(paras.map(_.pageNumber.get) == Seq(1, 1, 1, 2))
    // unstyled paragraphs classify via the docx restricted cascade
    assert(paras.forall(_.classifier == "docx"))
  }

  test("doc: cell marks split paragraphs; field instructions drop; ccpText truncates") {
    // hand-build a single compressed piece exercising 0x07 / 0x13-0x15 / 0x0B
    val text = "ab\rcHYPERLINKdef\r" + "IGNORED"
    val visible = "ab\rcHYPERLINKdef\r"
    val p1b = text.getBytes("windows-1252")
    val wd = new Array[Byte](0x600 + p1b.length)
    val wb = java.nio.ByteBuffer.wrap(wd).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    wb.putShort(0, 0xA5EC.toShort)
    wb.putShort(0x0A, 0x0000.toShort) // 0Table this time
    wb.putInt(0x4C, visible.length)   // ccpText cuts the trailing "IGNORED"
    wb.putInt(0x1A2, 0)
    System.arraycopy(p1b, 0, wd, 0x600, p1b.length)
    val clx = java.nio.ByteBuffer.allocate(5 + 16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    clx.put(0x02.toByte); clx.putInt(16) // 2 CPs + 1 PCD
    clx.putInt(0); clx.putInt(text.length)
    clx.putShort(0); clx.putInt((0x600 * 2) | 0x40000000); clx.putShort(0)
    wb.putInt(0x1A6, clx.array().length)
    val bytes = CorpusBytes.cfb(Seq("WordDocument" -> wd, "0Table" -> clx.array()))
    val paras = LegacyOfficePartitioner.partitionDoc(bytes)
    assert(paras.map(_.text) == Seq("a", "b", "cde f"))
  }

  // ------------------------------------------------------------------------ .ppt

  test("ppt: record walk — titles, body paragraphs, notes dropped, cp1252") {
    val paras = LegacyOfficePartitioner.partitionPpt(CorpusBytes.ppt(d))
    assert(paras.map(_.text) == Seq(
      "Annual Report Overview",
      "first body paragraph here.",
      "second one follows.",
      "Next café Annual",
      "closing remarks crm"))
    assert(paras.map(_.pageNumber.get) == Seq(1, 1, 1, 2, 2))
    assert(paras.head.elementType.contains("Title"))
    assert(paras(3).elementType.contains("Title"))
    assert(paras(1).elementType.isEmpty && paras(1).classifier == "pptx")
    assert(!paras.exists(_.text.contains("speaker notes")))
  }

  // ------------------------------------------------------------------- detection

  test("detect: OLE stream names differentiate doc/ppt/xls without extension") {
    assert(DetectFiletype.detect("blob", CorpusBytes.doc(d)) == FileType.Doc)
    assert(DetectFiletype.detect("blob", CorpusBytes.ppt(d)) == FileType.Ppt)
    assert(DetectFiletype.detect("blob", CorpusBytes.msg(d)) == FileType.Msg)
    // extension keeps priority (attached containers can alias stream names)
    assert(DetectFiletype.detect("m.msg", CorpusBytes.doc(d)) == FileType.Msg)
  }

  test("auto router: .doc and .ppt route to the native partitioners") {
    val (ftD, parasD) = Partitioners.partitionAuto("a.doc", CorpusBytes.doc(d))
    assert(ftD == FileType.Doc && ftD.partitionerAvailable && parasD.nonEmpty)
    val (ftP, parasP) = Partitioners.partitionAuto("a.ppt", CorpusBytes.ppt(d))
    assert(ftP == FileType.Ppt && ftP.partitionerAvailable && parasP.size == 5)
  }

  // HYPERLINK fields surface as link metadata over the displayed text
  test("doc: HYPERLINK field instruction yields link text, url, and offset") {
    val text = "see \u0013HYPERLINK \"https://example.com/x\"\u0014our site\u0015 now\r"
    val p1b = text.getBytes("windows-1252")
    val wd = new Array[Byte](0x600 + p1b.length)
    val wb = java.nio.ByteBuffer.wrap(wd).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    wb.putShort(0, 0xA5EC.toShort)
    wb.putShort(0x0A, 0x0000.toShort)
    wb.putInt(0x4C, text.length)
    wb.putInt(0x1A2, 0)
    System.arraycopy(p1b, 0, wd, 0x600, p1b.length)
    val clx = java.nio.ByteBuffer.allocate(5 + 16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    clx.put(0x02.toByte); clx.putInt(16)
    clx.putInt(0); clx.putInt(text.length)
    clx.putShort(0); clx.putInt((0x600 * 2) | 0x40000000); clx.putShort(0)
    wb.putInt(0x1A6, clx.array().length)
    val bytes = CorpusBytes.cfb(Seq("WordDocument" -> wd, "0Table" -> clx.array()))
    val paras = LegacyOfficePartitioner.partitionDoc(bytes)
    assert(paras.map(_.text) == Seq("see our site now"))
    assert(paras.head.linkTexts == Seq("our site"))
    assert(paras.head.linkUrls == Seq("https://example.com/x"))
    assert(paras.head.linkStartIndexes == Seq(4))
  }
}
