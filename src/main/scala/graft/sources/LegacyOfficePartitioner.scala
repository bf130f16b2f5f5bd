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

  /** A parsed .doc: main text, per-char WordDocument-stream FC (for PAPX
    * paragraph-property lookup), and the streams + FIB pointers the style
    * subsystem needs. */
  private[sources] final case class DocFile(
      text: String,
      charFcs: Array[Int],
      wd: Array[Byte],
      tb: Array[Byte],
      fcStshf: Int, lcbStshf: Int,
      fcPlcfBtePapx: Int, lcbPlcfBtePapx: Int,
      fcPlcfBteChpx: Int = -1, lcbPlcfBteChpx: Int = 0)

  /** Raw main-document text via the piece table ([MS-DOC] 2.8.35 PlcPcd),
    * keeping each char's FC so paragraph marks can be resolved to their PAPX
    * (and so their Word style). */
  private[sources] def docFile(bytes: Array[Byte]): DocFile = {
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
    // fibRgFcLcb97: fcStshf/lcbStshf at entry 2/3, fcPlcfBteChpx/lcb at 24/25,
    // fcPlcfBtePapx/lcb at 26/27
    val fcStshf = wb.getInt(0xA2)
    val lcbStshf = wb.getInt(0xA6)
    val fcBteChpx = wb.getInt(0xFA)
    val lcbBteChpx = wb.getInt(0xFE)
    val fcBtePapx = wb.getInt(0x102)
    val lcbBtePapx = wb.getInt(0x106)

    // Clx = Prc* then Pcdt ([MS-DOC] 2.9.38): skip property blocks, land on 0x02.
    var off = fcClx
    val end = fcClx + lcbClx
    var text = ""
    val fcs = mutable.ArrayBuffer.empty[Int]
    while (off < end && tb(off) == 0x01) {
      val cb = ((tb(off + 1) & 0xFF) | ((tb(off + 2) & 0xFF) << 8))
      off += 3 + cb
    }
    if (off < end && tb(off) == 0x02) {
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
            val piece = new String(wd, fc, nChars, Cp1252)
            sb.append(piece)
            piece.indices.foreach(k => fcs += fc + k)
          } else {
            val fc = fcRaw & 0x3FFFFFFF
            val piece = new String(wd, fc, nChars * 2,
              java.nio.charset.StandardCharsets.UTF_16LE)
            sb.append(piece)
            piece.indices.foreach(k => fcs += fc + 2 * k)
          }
        }
        i += 1
      }
      text = sb.take(ccpText).toString
    }
    DocFile(text, fcs.take(text.length).toArray, wd, tb,
      fcStshf, lcbStshf, fcBtePapx, lcbBtePapx, fcBteChpx, lcbBteChpx)
  }

  /** Backwards-compatible raw text accessor. */
  private[sources] def docText(bytes: Array[Byte]): String = docFile(bytes).text

  /** Style names by istd from the STSH ([MS-DOC] 2.9.271-275): LPStd array
    * (2-byte aligned) whose index IS the istd; each STD carries its UI name as
    * an Xstz at `cbSTDBaseInFile`. */
  private[sources] def styleNames(doc: DocFile): Array[String] = {
    val tb = doc.tb
    if (doc.lcbStshf <= 0 || doc.fcStshf < 0 ||
      doc.fcStshf + 4 > tb.length) return Array.empty
    val bb = ByteBuffer.wrap(tb).order(ByteOrder.LITTLE_ENDIAN)
    val cbStshi = bb.getShort(doc.fcStshf) & 0xFFFF
    val stshi = doc.fcStshf + 2
    val cstd = bb.getShort(stshi) & 0xFFFF
    val cbStdBase = bb.getShort(stshi + 2) & 0xFFFF
    val names = Array.fill(cstd)("")
    var off = stshi + cbStshi
    var k = 0
    while (k < cstd && off + 2 <= tb.length) {
      val cbStd = bb.getShort(off) & 0xFFFF
      off += 2
      if (cbStd > 0 && off + cbStd <= tb.length) {
        val nameOff = off + cbStdBase
        if (nameOff + 2 <= off + cbStd) {
          val cch = bb.getShort(nameOff) & 0xFFFF
          if (nameOff + 2 + cch * 2 <= off + cbStd)
            names(k) = new String(tb, nameOff + 2, cch * 2,
              java.nio.charset.StandardCharsets.UTF_16LE)
        }
        off += cbStd
        if ((cbStd & 1) == 1) off += 1 // LPStd 2-byte alignment
      }
      k += 1
    }
    names
  }

  /** Paragraph istd for the paragraph containing `fc`: PlcfBtePapx bin →
    * PAPX FKP page → run lookup ([MS-DOC] 2.8.7, 2.9.175). -1 when the
    * lookup cannot resolve (damaged file) — caller falls back to Normal. */
  private[sources] def istdForFc(doc: DocFile, fc: Int): Int = {
    val bb = ByteBuffer.wrap(doc.tb).order(ByteOrder.LITTLE_ENDIAN)
    val base = doc.fcPlcfBtePapx
    val n = (doc.lcbPlcfBtePapx - 4) / 8
    if (n <= 0 || base < 0 || base + doc.lcbPlcfBtePapx > doc.tb.length) return -1
    var i = 0
    while (i < n && !(bb.getInt(base + i * 4) <= fc && fc < bb.getInt(base + (i + 1) * 4)))
      i += 1
    if (i >= n) return -1
    val pn = bb.getInt(base + (n + 1) * 4 + i * 4)
    val page = pn.toLong * 512
    if (page < 0 || page + 512 > doc.wd.length) return -1
    val pg = ByteBuffer.wrap(doc.wd, page.toInt, 512).order(ByteOrder.LITTLE_ENDIAN).slice()
      .order(ByteOrder.LITTLE_ENDIAN)
    val crun = pg.get(511) & 0xFF
    if (crun == 0 || (crun + 1) * 4 + crun * 13 > 511) return -1
    var j = 0
    while (j < crun && !(pg.getInt(j * 4) <= fc && fc < pg.getInt((j + 1) * 4))) j += 1
    if (j >= crun) return -1
    val bOffset = pg.get((crun + 1) * 4 + j * 13) & 0xFF
    if (bOffset == 0) return 0 // no PAPX: default (Normal) paragraph properties
    val papx = bOffset * 2
    val cb = pg.get(papx) & 0xFF
    if (cb == 0) pg.getShort(papx + 2) & 0xFFFF
    else pg.getShort(papx + 1) & 0xFFFF
  }

  /** HYPERLINK field instruction: quoted or bare target ([MS-DOC] flds). */
  private val HyperlinkRe = """HYPERLINK\s+(?:"([^"]+)"|(\S+))""".r

  private val SprmPFInTable = 0x2416
  private val SprmPFTtp = 0x2417

  /** Table flags from the PAPX of the paragraph containing `fc`
    * ([MS-DOC] 2.9.175 PapxInFkp): bit 0 = fInTable (paragraph is a table
    * cell), bit 1 = fTtp (the mark is a table-row terminator). 0 when no
    * PAPX resolves — plain body text. */
  private[sources] def papxFlagsForFc(doc: DocFile, fc: Int): Int = {
    val bb = ByteBuffer.wrap(doc.tb).order(ByteOrder.LITTLE_ENDIAN)
    val base = doc.fcPlcfBtePapx
    val n = (doc.lcbPlcfBtePapx - 4) / 8
    if (n <= 0 || base < 0 || base + doc.lcbPlcfBtePapx > doc.tb.length) return 0
    var i = 0
    while (i < n && !(bb.getInt(base + i * 4) <= fc && fc < bb.getInt(base + (i + 1) * 4)))
      i += 1
    if (i >= n) return 0
    val pn = bb.getInt(base + (n + 1) * 4 + i * 4)
    val page = pn.toLong * 512
    if (page < 0 || page + 512 > doc.wd.length) return 0
    val pg = ByteBuffer.wrap(doc.wd, page.toInt, 512).order(ByteOrder.LITTLE_ENDIAN).slice()
      .order(ByteOrder.LITTLE_ENDIAN)
    val crun = pg.get(511) & 0xFF
    if (crun == 0 || (crun + 1) * 4 + crun * 13 > 511) return 0
    var j = 0
    while (j < crun && !(pg.getInt(j * 4) <= fc && fc < pg.getInt((j + 1) * 4))) j += 1
    if (j >= crun) return 0
    val bOffset = pg.get((crun + 1) * 4 + j * 13) & 0xFF
    if (bOffset == 0) return 0
    val papx = bOffset * 2
    if (papx >= 512) return 0
    val cb = pg.get(papx) & 0xFF
    // PapxInFkp: cb!=0 → 2*cb-1 content bytes at papx+1; cb==0 → cb' at
    // papx+1, 2*cb' content bytes at papx+2. Content = istd (2B) + grpprl.
    val (contentAt, contentLen) =
      if (cb != 0) (papx + 1, 2 * cb - 1)
      else (papx + 2, 2 * (pg.get(papx + 1) & 0xFF))
    if (contentLen < 2 || contentAt + contentLen > 512) return 0
    val grpprl = new Array[Byte](contentLen - 2)
    pg.position(contentAt + 2)
    pg.get(grpprl)
    var k = 0
    var mask = 0
    while (k + 2 <= grpprl.length) {
      val sprm = (grpprl(k) & 0xFF) | ((grpprl(k + 1) & 0xFF) << 8)
      k += 2
      val size = sprmOperandSize(sprm, grpprl, k)
      if (k < grpprl.length) {
        val op = grpprl(k) & 0xFF
        if (sprm == SprmPFInTable && op != 0) mask |= 1
        if (sprm == SprmPFTtp && op != 0) mask |= 2
      }
      k += size
    }
    mask
  }

  /** Operand byte-size of a Word 97 sprm by its spra bits ([MS-DOC] 2.2.5.1);
    * spra 6 is variable — the first operand byte holds the size. */
  private def sprmOperandSize(sprm: Int, grpprl: Array[Byte], at: Int): Int =
    (sprm >>> 13) match {
      case 0 | 1 => 1
      case 2 | 4 | 5 => 2
      case 3 => 4
      case 7 => 3
      case _ => // 6: variable
        if (at < grpprl.length) 1 + (grpprl(at) & 0xFF) else 1
    }

  private val SprmCFBold = 0x0835
  private val SprmCFItalic = 0x0836

  /** Direct character formatting for the char at `fc`, via the PlcfBteChpx →
    * ChpxFkp chain ([MS-DOC] 2.8.3, 2.9.33): bit 0 = bold, bit 1 = italic.
    * CHPX toggles 1 (on) and 0x81 (opposite of the — assumed plain — style)
    * both read as on. Returns 0 when no CHPX covers the char. */
  private[sources] def charFormatForFc(doc: DocFile, fc: Int): Int = {
    val base = doc.fcPlcfBteChpx
    val n = (doc.lcbPlcfBteChpx - 4) / 8
    if (n <= 0 || base < 0 || base + doc.lcbPlcfBteChpx > doc.tb.length) return 0
    val bb = ByteBuffer.wrap(doc.tb).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n && !(bb.getInt(base + i * 4) <= fc && fc < bb.getInt(base + (i + 1) * 4)))
      i += 1
    if (i >= n) return 0
    val pn = bb.getInt(base + (n + 1) * 4 + i * 4)
    val page = pn.toLong * 512
    if (page < 0 || page + 512 > doc.wd.length) return 0
    val pg = ByteBuffer.wrap(doc.wd, page.toInt, 512).order(ByteOrder.LITTLE_ENDIAN).slice()
      .order(ByteOrder.LITTLE_ENDIAN)
    val crun = pg.get(511) & 0xFF
    if (crun == 0 || (crun + 1) * 4 + crun > 511) return 0
    var j = 0
    while (j < crun && !(pg.getInt(j * 4) <= fc && fc < pg.getInt((j + 1) * 4))) j += 1
    if (j >= crun) return 0
    val bOffset = pg.get((crun + 1) * 4 + j) & 0xFF
    if (bOffset == 0) return 0 // no CHPX: style-default formatting
    val chpx = bOffset * 2
    if (chpx >= 511) return 0
    val cb = pg.get(chpx) & 0xFF
    if (chpx + 1 + cb > 512) return 0
    val grpprl = new Array[Byte](cb)
    pg.position(chpx + 1)
    pg.get(grpprl)
    var k = 0
    var mask = 0
    while (k + 2 <= grpprl.length) {
      val sprm = (grpprl(k) & 0xFF) | ((grpprl(k + 1) & 0xFF) << 8)
      k += 2
      val size = sprmOperandSize(sprm, grpprl, k)
      if (k < grpprl.length) {
        val op = grpprl(k) & 0xFF
        if (sprm == SprmCFBold && (op == 1 || op == 0x81)) mask |= 1
        if (sprm == SprmCFItalic && (op == 1 || op == 0x81)) mask |= 2
      }
      k += size
    }
    mask
  }

  /** Word control chars in main text: CR ends a paragraph, 0x07 ends a table
    * cell/row (treated as a paragraph break), 0x0C is a page/section break,
    * 0x0B a line break; field chars 0x13/0x14/0x15 and the object markers drop.
    *
    * Classification mirrors `partition_docx` on the LibreOffice conversion
    * (`_classify_paragraph_to_element`, docx.py:435-482): literal-bullet text
    * → ListItem (bullet stripped, `_is_list_item` docx.py:589-594); else the
    * paragraph mark's Word style (STSH + PAPX istd) through
    * `STYLE_TO_ELEMENT_MAPPING`; else the docx RESTRICTED cascade
    * (Address/Email/Narrative/Text — no Title guess), which runs downstream
    * as `classifier = "docx"`. */
  def partitionDoc(bytes: Array[Byte]): Seq[RawPara] = {
    val doc = docFile(bytes)
    val names = styleNames(doc)
    val out = mutable.ArrayBuffer.empty[RawPara]
    var page = 1
    val cur = new StringBuilder
    val curIdx = mutable.ArrayBuffer.empty[Int] // source index per cur char
    // table assembly state: cell texts row-major + emphasis accumulated in
    // cell order (the docx `_iter_table_emphasis` walk, docx.py:786-797)
    val tableRows = mutable.ArrayBuffer.empty[Vector[String]]
    val curRowCells = mutable.ArrayBuffer.empty[String]
    val fieldInstr = new StringBuilder // the instruction text (e.g. HYPERLINK "url")
    var pendingLinkUrl: Option[String] = None
    var pendingLinkStart = 0 // cur offset where the displayed text begins
    val linkTexts = mutable.ArrayBuffer.empty[String]
    val linkUrls = mutable.ArrayBuffer.empty[String]
    val linkStarts = mutable.ArrayBuffer.empty[Int]
    val tableEmC = mutable.ArrayBuffer.empty[String]
    val tableEmT = mutable.ArrayBuffer.empty[String]

    // per-run bold/italic emphasis, the docx `runsEmphasis` analog: group
    // consecutive chars with the same direct CHPX formatting; each formatted
    // run contributes its stripped text under "b" and/or "i"
    def paraEmphasis(): (Seq[String], Seq[String]) = {
      val c = Seq.newBuilder[String]
      val tg = Seq.newBuilder[String]
      var i = 0
      while (i < curIdx.length) {
        val fmt =
          if (curIdx(i) < doc.charFcs.length) charFormatForFc(doc, doc.charFcs(curIdx(i)))
          else 0
        var j = i
        while (j < curIdx.length && (if (curIdx(j) < doc.charFcs.length)
          charFormatForFc(doc, doc.charFcs(curIdx(j))) else 0) == fmt) j += 1
        if (fmt != 0) {
          val text = cur.substring(i, j).strip
          if (text.nonEmpty) {
            if ((fmt & 1) != 0) { c += text; tg += "b" }
            if ((fmt & 2) != 0) { c += text; tg += "i" }
          }
        }
        i = j
      }
      (c.result(), tg.result())
    }

    def flushTable(): Unit = {
      if (curRowCells.nonEmpty) { tableRows += curRowCells.toVector; curRowCells.clear() }
      if (tableRows.isEmpty) return
      val width = tableRows.map(_.length).max
      val matrix = tableRows.toSeq.map(r => r.padTo(width, ""))
      tableRows.clear()
      val text = Partitioners.tableText(matrix)
      if (text.nonEmpty)
        out += RawPara(text, Some("Table"),
          textAsHtml = Some(Partitioners.htmlifyMatrix(matrix)),
          pageNumber = Some(page), classifier = "docx",
          emphasizedContents = tableEmC.toSeq, emphasizedTags = tableEmT.toSeq)
      tableEmC.clear(); tableEmT.clear()
    }

    def flush(paraMarkIdx: Int): Unit = {
      val (emC, emT) = paraEmphasis()
      val (lT, lU, lS) = (linkTexts.toSeq, linkUrls.toSeq, linkStarts.toSeq)
      linkTexts.clear(); linkUrls.clear(); linkStarts.clear()
      val t = HtmlPartitioner.normalizeWs(cur.toString)
      cur.clear()
      curIdx.clear()
      if (t.isEmpty) return
      if (graft.functions.Cleaners.isBulletedTextStr(t)) {
        val clean = graft.functions.Cleaners.cleanBulletsStr(t).strip
        if (clean.nonEmpty)
          out += RawPara(clean, Some("ListItem"), pageNumber = Some(page),
            classifier = "docx",
            emphasizedContents = emC, emphasizedTags = emT,
            linkTexts = lT, linkUrls = lU, linkStartIndexes = lS)
        return
      }
      val styleName =
        if (paraMarkIdx >= 0 && paraMarkIdx < doc.charFcs.length) {
          val istd = istdForFc(doc, doc.charFcs(paraMarkIdx))
          if (istd >= 0 && istd < names.length) names(istd) else ""
        } else ""
      DocxPartitioner.StyleTypeMap.get(styleName.toLowerCase) match {
        case Some(tpe) =>
          val depth = math.max(DocxPartitioner.depthByStyleName(styleName), 0)
          out += RawPara(t, Some(tpe), Some(depth), pageNumber = Some(page),
            classifier = "docx",
            emphasizedContents = emC, emphasizedTags = emT,
            linkTexts = lT, linkUrls = lU, linkStartIndexes = lS)
        case None =>
          out += RawPara(t, None, pageNumber = Some(page), classifier = "docx",
            emphasizedContents = emC, emphasizedTags = emT,
            linkTexts = lT, linkUrls = lU, linkStartIndexes = lS)
      }
    }
    var inFieldInstr = false // between field-begin 0x13 and separator 0x14
    var idx = 0
    doc.text.foreach { c =>
      c match {
        case '' =>
          // cell/row mark: fInTable paragraphs assemble into a Table
          // ([MS-DOC] table marks); a bare 0x07 without PAPX table flags
          // keeps the legacy split-paragraph behavior
          val flags7 =
            if (idx < doc.charFcs.length) papxFlagsForFc(doc, doc.charFcs(idx)) else 0
          if ((flags7 & 1) != 0) {
            if ((flags7 & 2) != 0) { // TTP row terminator
              cur.clear(); curIdx.clear()
              if (curRowCells.nonEmpty) { tableRows += curRowCells.toVector; curRowCells.clear() }
            } else { // cell end: bank the cell text + its emphasis runs
              val (cc, ct) = paraEmphasis()
              tableEmC ++= cc; tableEmT ++= ct
              curRowCells += HtmlPartitioner.normalizeWs(cur.toString)
              cur.clear(); curIdx.clear()
            }
          } else flush(idx)
        case '\r' =>
          // a CR inside a table cell is an intra-cell paragraph break;
          // a CR outside closes any open table, then the paragraph
          val flagsCr =
            if (idx < doc.charFcs.length) papxFlagsForFc(doc, doc.charFcs(idx)) else 0
          if ((flagsCr & 1) != 0) { cur.append(' '); curIdx += idx }
          else { flushTable(); flush(idx) }
        case '\f' => flushTable(); flush(idx); page += 1
        case '' => inFieldInstr = true; fieldInstr.clear()
        case '' =>
          inFieldInstr = false
          // HYPERLINK "url" field instruction -> link over the displayed text
          pendingLinkUrl = HyperlinkRe.findFirstMatchIn(fieldInstr.toString)
            .map(m => Option(m.group(1)).getOrElse(m.group(2)))
          pendingLinkStart = cur.length
          fieldInstr.clear()
        case '' =>
          inFieldInstr = false
          pendingLinkUrl.foreach { url =>
            val text = cur.substring(pendingLinkStart)
            if (text.nonEmpty) {
              linkTexts += text; linkUrls += url; linkStarts += pendingLinkStart
            }
          }
          pendingLinkUrl = None
        case ch if inFieldInstr => fieldInstr.append(ch) // instruction, not body text
        case '' => cur.append(' '); curIdx += idx
        case ch if ch >= ' ' || ch == '\t' => cur.append(ch); curIdx += idx
        case _ => () // object markers
      }
      idx += 1
    }
    flushTable()
    flush(doc.text.length - 1)
    out.toSeq
  }

  // -------------------------------------------------------------------- MS-PPT

  private val RtSlide = 0x03EE
  private val RtMainMaster = 0x03F8
  private val RtNotes = 0x03F0
  private val RtTextHeaderAtom = 0x0F9F
  private val RtTextCharsAtom = 0x0FA0
  private val RtStyleTextPropAtom = 0x0FA1
  private val RtTextBytesAtom = 0x0FA8

  // TextTypeEnum ([MS-PPT] 2.13.33)
  private val TxTitle = 0
  private val TxNotes = 2
  private val TxCenterTitle = 6

  /** One placeholder text with its TextHeaderAtom type, slide ordinal, and
    * per-paragraph bullet flags from the trailing StyleTextPropAtom. */
  private[sources] final case class PptText(txType: Int, slide: Int, text: String,
      paraBullets: Seq[Boolean] = Nil)

  /**
   * Per-paragraph-run `(charCount, fHasBullet)` from a StyleTextPropAtom body
   * ([MS-PPT] 2.9.43): TextPFRun* — {count u32, indentLevel u16,
   * TextPFException}. TextPFException = masks u32 + optional fields in wire
   * order; only the bullet flag is kept, the rest is skipped by size (tab
   * stops are the one variable-length field). Parsing stops at the first
   * malformed run.
   */
  private[sources] def parseParaBullets(body: Array[Byte], from: Int, len: Int,
      textLen: Int): Seq[(Int, Boolean)] = {
    val bb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
    val end = from + len
    val runs = mutable.ArrayBuffer.empty[(Int, Boolean)]
    var off = from
    var covered = 0
    while (off + 10 <= end && covered <= textLen) {
      val count = bb.getInt(off)
      val masks = bb.getInt(off + 6)
      var p = off + 10
      var bullet = false
      if ((masks & 0x000F) != 0) { // bulletFlags present
        if (p + 2 > end) return runs.toSeq
        bullet = (bb.getShort(p) & 0x0001) != 0 // fHasBullet
        p += 2
      }
      // fixed-size optional fields, in wire order
      if ((masks & 0x0080) != 0) p += 2 // bulletChar
      if ((masks & 0x0010) != 0) p += 2 // bulletFontRef
      if ((masks & 0x0040) != 0) p += 2 // bulletSize
      if ((masks & 0x0020) != 0) p += 4 // bulletColor
      if ((masks & 0x0800) != 0) p += 2 // textAlignment
      if ((masks & 0x1000) != 0) p += 2 // lineSpacing
      if ((masks & 0x2000) != 0) p += 2 // spaceBefore
      if ((masks & 0x4000) != 0) p += 2 // spaceAfter
      if ((masks & 0x0100) != 0) p += 2 // leftMargin
      if ((masks & 0x0400) != 0) p += 2 // indent
      if ((masks & 0x8000) != 0) p += 2 // defaultTabSize
      if ((masks & 0x100000) != 0) { // tabStops: count-prefixed 4-byte entries
        if (p + 2 > end) return runs.toSeq
        p += 2 + 4 * (bb.getShort(p) & 0xFFFF)
      }
      if ((masks & 0x10000) != 0) p += 2 // fontAlign
      if ((masks & 0xE0000) != 0) p += 2 // wrapFlags (charWrap|wordWrap|overflow)
      if ((masks & 0x200000) != 0) p += 2 // textDirection
      if (count <= 0 || p > end) return runs.toSeq
      runs += ((count, bullet))
      covered += count
      off = p
    }
    runs.toSeq
  }

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
          // master layouts and speaker notes carry placeholder scaffolding
          // ("Click to edit ...") the rendered deck never shows — skip them,
          // as the reference's LibreOffice pptx conversion does
          if (recType != RtMainMaster && recType != RtNotes) {
            if (recType == RtSlide) { slide += 1; pendingType = -1 }
            walk(off + 8, bodyEnd)
          }
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
          case RtStyleTextPropAtom if out.nonEmpty =>
            // applies to the immediately preceding text atom
            val last = out.last
            val runs = parseParaBullets(doc, off + 8, recLen, last.text.length + 1)
            // one flag per \r-paragraph: run j covers [sum(count_0..j-1), sum(..j))
            val runEnds = runs.scanLeft(0)(_ + _._1).drop(1)
            val paras = last.text.split("\r", -1)
            var charPos = 0
            val flags = paras.map { para =>
              val runIdx = runEnds.indexWhere(charPos < _)
              charPos += para.length + 1
              runIdx >= 0 && runs(runIdx)._2
            }.toSeq
            out(out.length - 1) = last.copy(paraBullets = flags)
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
      else pt.text.split("\r", -1).toSeq.zipWithIndex.flatMap { case (raw, i) =>
        raw.split("\n").toSeq
          .map(p => HtmlPartitioner.normalizeWs(p.replace('', ' ')))
          .filter(_.nonEmpty)
          .map { p =>
            val page = Some(math.max(pt.slide, 1))
            if (pt.txType == TxTitle || pt.txType == TxCenterTitle)
              RawPara(p, Some("Title"), Some(0), pageNumber = page)
            else if (pt.paraBullets.lift(i).contains(true))
              // bulleted outline paragraph → ListItem, as the pptx
              // conversion's buChar path classifies (pptx.py:225-245)
              RawPara(p, Some("ListItem"), Some(0), pageNumber = page)
            else RawPara(p, None, Some(0), pageNumber = page, classifier = "pptx")
          }
      }
    }
}
