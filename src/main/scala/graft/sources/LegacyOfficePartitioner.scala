package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.Charset

import scala.collection.mutable

import graft.sources.HtmlPartitioner.RawPara
import graft.sources.MsgPartitioner.Cfb

/**
 * `partition_doc` / `partition_ppt` — the legacy binary Office formats.
 *
 * The reference shells out to LibreOffice and re-partitions the conversion
 * (`/root/reference/unstructured/partition/doc.py:75-82`,
 * `partition/ppt.py:71-79`), which is unavailable on Spark executors. Instead
 * these are native readers over the public [MS-DOC] / [MS-PPT] specifications,
 * reusing the CFB (OLE2) container reader built for `.msg`
 * ([[graft.sources.MsgPartitioner.Cfb]]):
 *
 *  - `.doc`: FIB → Clx piece table in the 0Table/1Table stream → cp1252 or
 *    UTF-16LE text pieces → paragraphs on CR, page breaks on 0x0C. Without the
 *    PAPX/stylesheet subsystem there is no style info, so paragraphs classify
 *    through the text cascade (`partition/text.py` semantics) rather than
 *    carrying Word heading styles.
 *  - `.ppt`: record walk of the `PowerPoint Document` stream — containers
 *    (recVer 0xF) recursed, `TextHeaderAtom` (0x0F9F) typing the following
 *    `TextCharsAtom` (0x0FA0, UTF-16LE) / `TextBytesAtom` (0x0FA8, cp1252);
 *    title/centerTitle → `Title`, notes dropped, body paragraphs classify via
 *    the PPTX cascade (`partition/pptx.py:225-245`).
 *
 * Both run whole-file inside the router's flatMap — parallel per file, no
 * shuffle, same 100 TB shape as the other binary partitioners.
 */
object LegacyOfficePartitioner {

  private val Cp1252: Charset = Charset.forName("windows-1252")

  // -------------------------------------------------------------------- MS-DOC

  /** Raw main-document text via the piece table ([MS-DOC] 2.8.35 PlcPcd). */
  private[sources] def docText(bytes: Array[Byte]): String = {
    val cfb = new Cfb(bytes)
    val wdEntry = cfb.pathedEntries
      .find(e => e.entryType == 2 && e.path == "WordDocument")
      .getOrElse(throw new IllegalArgumentException("no WordDocument stream"))
    val wd = cfb.readStream(wdEntry)
    val wb = ByteBuffer.wrap(wd).order(ByteOrder.LITTLE_ENDIAN)
    require((wb.getShort(0) & 0xFFFF) == 0xA5EC, "not a Word binary file")
    val flags = wb.getShort(0x0A) & 0xFFFF
    val tableName = if ((flags & 0x0200) != 0) "1Table" else "0Table"
    val ccpText = wb.getInt(0x4C)
    val fcClx = wb.getInt(0x1A2)
    val lcbClx = wb.getInt(0x1A6)
    val tb = cfb.pathedEntries
      .find(e => e.entryType == 2 && e.path == tableName)
      .map(cfb.readStream)
      .getOrElse(throw new IllegalArgumentException(s"no $tableName stream"))

    // Clx = Prc* then Pcdt ([MS-DOC] 2.9.38): skip property blocks, land on 0x02.
    var off = fcClx
    val end = fcClx + lcbClx
    while (off < end && tb(off) == 0x01) {
      val cb = ((tb(off + 1) & 0xFF) | ((tb(off + 2) & 0xFF) << 8))
      off += 3 + cb
    }
    if (off >= end || tb(off) != 0x02) return ""
    val bb = ByteBuffer.wrap(tb).order(ByteOrder.LITTLE_ENDIAN)
    val lcb = bb.getInt(off + 1)
    val plc = off + 5
    val n = (lcb - 4) / 12 // n+1 CPs (4B) + n PCDs (8B)
    val sb = new StringBuilder
    var i = 0
    while (i < n && sb.length < ccpText) {
      val cpStart = bb.getInt(plc + i * 4)
      val cpEnd = bb.getInt(plc + (i + 1) * 4)
      val fcRaw = bb.getInt(plc + (n + 1) * 4 + i * 8 + 2)
      val nChars = cpEnd - cpStart
      if (nChars > 0) {
        if ((fcRaw & 0x40000000) != 0) { // fCompressed: cp1252, one byte per char
          val fc = (fcRaw & 0x3FFFFFFF) >>> 1
          sb.append(new String(wd, fc, nChars, Cp1252))
        } else {
          val fc = fcRaw & 0x3FFFFFFF
          sb.append(new String(wd, fc, nChars * 2, java.nio.charset.StandardCharsets.UTF_16LE))
        }
      }
      i += 1
    }
    sb.take(ccpText).toString
  }

  /** Word control chars in main text: CR ends a paragraph, 0x07 ends a table
    * cell/row (treated as a paragraph break), 0x0C is a page/section break,
    * 0x0B a line break; field chars 0x13/0x14/0x15 and the object markers drop. */
  def partitionDoc(bytes: Array[Byte]): Seq[RawPara] = {
    val text = docText(bytes)
    val out = mutable.ArrayBuffer.empty[RawPara]
    var page = 1
    val cur = new StringBuilder
    def flush(): Unit = {
      val t = HtmlPartitioner.normalizeWs(cur.toString)
      if (t.nonEmpty) out += RawPara(t, None, pageNumber = Some(page), classifier = "text")
      cur.clear()
    }
    var inFieldInstr = false // between field-begin 0x13 and separator 0x14
    text.foreach {
      case '\r' | '\u0007' => flush()
      case '\f' => flush(); page += 1
      case '\u0013' => inFieldInstr = true
      case '\u0014' | '\u0015' => inFieldInstr = false
      case _ if inFieldInstr => () // field instruction (e.g. HYPERLINK), not text
      case '\u000B' => cur.append(' ')
      case c if c >= ' ' || c == '\t' => cur.append(c)
      case _ => () // object markers
    }
    flush()
    out.toSeq
  }

  // -------------------------------------------------------------------- MS-PPT

  private val RtSlide = 0x03EE
  private val RtTextHeaderAtom = 0x0F9F
  private val RtTextCharsAtom = 0x0FA0
  private val RtTextBytesAtom = 0x0FA8

  // TextTypeEnum ([MS-PPT] 2.13.33)
  private val TxTitle = 0
  private val TxNotes = 2
  private val TxCenterTitle = 6

  /** One placeholder text with its TextHeaderAtom type and slide ordinal. */
  private[sources] final case class PptText(txType: Int, slide: Int, text: String)

  private[sources] def pptTexts(bytes: Array[Byte]): Seq[PptText] = {
    val cfb = new Cfb(bytes)
    val entry = cfb.pathedEntries
      .find(e => e.entryType == 2 && e.path == "PowerPoint Document")
      .getOrElse(throw new IllegalArgumentException("no PowerPoint Document stream"))
    val doc = cfb.readStream(entry)
    val bb = ByteBuffer.wrap(doc).order(ByteOrder.LITTLE_ENDIAN)
    val out = mutable.ArrayBuffer.empty[PptText]
    var slide = 0
    var pendingType = -1
    def walk(start: Int, limit: Int): Unit = {
      var off = start
      while (off + 8 <= limit) {
        val verInst = bb.getShort(off) & 0xFFFF
        val recType = bb.getShort(off + 2) & 0xFFFF
        val recLen = bb.getInt(off + 4)
        val bodyEnd = math.min(limit, off + 8 + recLen)
        if (recLen < 0 || off + 8 + recLen > limit) return // truncated record
        if ((verInst & 0x000F) == 0x000F) { // container
          if (recType == RtSlide) { slide += 1; pendingType = -1 }
          walk(off + 8, bodyEnd)
        } else recType match {
          case RtTextHeaderAtom if recLen >= 4 =>
            pendingType = bb.getInt(off + 8)
          case RtTextCharsAtom =>
            out += PptText(pendingType, slide,
              new String(doc, off + 8, recLen, java.nio.charset.StandardCharsets.UTF_16LE))
            pendingType = -1
          case RtTextBytesAtom =>
            out += PptText(pendingType, slide, new String(doc, off + 8, recLen, Cp1252))
            pendingType = -1
          case _ => ()
        }
        off = bodyEnd
      }
    }
    walk(0, doc.length)
    out.toSeq
  }

  def partitionPpt(bytes: Array[Byte]): Seq[RawPara] =
    pptTexts(bytes).flatMap { pt =>
      if (pt.txType == TxNotes) Nil
      else pt.text.split("[\r\n]").toSeq
        .map(p => HtmlPartitioner.normalizeWs(p.replace('\u000B', ' ')))
        .filter(_.nonEmpty)
        .map { p =>
          val page = Some(math.max(pt.slide, 1))
          if (pt.txType == TxTitle || pt.txType == TxCenterTitle)
            RawPara(p, Some("Title"), Some(0), pageNumber = page)
          else RawPara(p, None, Some(0), pageNumber = page, classifier = "pptx")
        }
    }
}
