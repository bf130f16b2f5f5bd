package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable

import graft.sources.HtmlPartitioner.RawPara
import graft.sources.MsgPartitioner.Cfb

/**
 * `partition_xls` — legacy binary Excel (BIFF8) workbooks.
 *
 * The reference routes `.xls` through `partition_xlsx` with pandas/xlrd doing
 * the cell extraction (`partition/auto.py` FileType.XLS → `partition/xlsx.py`;
 * pinned by `test_auto.py:842` over `example-docs/tests-example.xls`). Here the
 * BIFF8 `Workbook` stream inside the CFB container is read directly — the
 * record set a cell-value extraction needs (BOUNDSHEET, SST + CONTINUE,
 * LABELSST, NUMBER, RK, MULRK, LABEL, FORMULA + STRING, BOOLERR) — and each
 * sheet's cell grid feeds the same connected-component subtable pipeline the
 * OOXML path uses, so `.xls` and `.xlsx` have identical downstream semantics.
 */
object XlsPartitioner {

  private final case class Record(tpe: Int, data: Array[Byte], offset: Int)

  private val ContinueRecord = 0x003C

  /** Slice the workbook stream into (type, payload) records. */
  private def records(stream: Array[Byte]): Vector[Record] = {
    val out = Vector.newBuilder[Record]
    var i = 0
    while (i + 4 <= stream.length) {
      val tpe = ((stream(i) & 0xFF) | ((stream(i + 1) & 0xFF) << 8))
      val len = ((stream(i + 2) & 0xFF) | ((stream(i + 3) & 0xFF) << 8))
      if (i + 4 + len > stream.length) { i = stream.length }
      else {
        out += Record(tpe, java.util.Arrays.copyOfRange(stream, i + 4, i + 4 + len), i)
        i += 4 + len
      }
    }
    out.result()
  }

  /** A cursor over an SST record plus its CONTINUE records. BIFF8 strings may
    * split at any point; when the split lands inside a string's CHARACTER data
    * the continuation restarts with a fresh flags byte (grbit), possibly
    * switching between compressed and UTF-16 halves. */
  private final class SegmentedReader(segments: Vector[Array[Byte]]) {
    private var seg = 0
    private var off = 0

    def hasMore: Boolean = {
      while (seg < segments.length && off >= segments(seg).length) { seg += 1; off = 0 }
      seg < segments.length
    }

    def u8(): Int = { // advances across segment boundaries
      if (!hasMore) throw new IllegalStateException("SST underrun")
      val b = segments(seg)(off) & 0xFF
      off += 1
      b
    }

    def u16(): Int = u8() | (u8() << 8)
    def u32(): Long = u16().toLong | (u16().toLong << 16)

    /** Skip n bytes of non-character payload (rich runs / ext data). */
    def skip(n: Long): Unit = {
      var left = n
      while (left > 0) {
        if (!hasMore) return
        val avail = segments(seg).length - off
        val take = math.min(left, avail.toLong).toInt
        off += take
        left -= take
      }
    }

    /** Read `cch` characters honoring the per-segment compression flag.
      * `wide0` is the current flag; each boundary crossed during character
      * data re-reads a flags byte. */
    def chars(cch: Int, wide0: Boolean): String = {
      val sb = new StringBuilder(cch)
      var wide = wide0
      var remaining = cch
      while (remaining > 0) {
        if (!hasMore) return sb.toString
        if (off == 0 && sb.nonEmpty) wide = (u8() & 0x01) != 0 // continuation grbit
        val data = segments(seg)
        if (wide) {
          if (off + 2 <= data.length) {
            sb += (((data(off) & 0xFF) | ((data(off + 1) & 0xFF) << 8)).toChar)
            off += 2
          } else { off = data.length } // ragged tail; boundary re-read handles it
        } else {
          sb += ((data(off) & 0xFF).toChar)
          off += 1
        }
        remaining -= 1
      }
      sb.toString
    }
  }

  /** Parse the shared-string table (record 0x00FC + following CONTINUEs). */
  private[sources] def parseSst(segments: Vector[Array[Byte]]): Vector[String] = {
    val r = new SegmentedReader(segments)
    r.u32() // total refs
    val unique = r.u32()
    val out = Vector.newBuilder[String]
    var i = 0L
    while (i < unique && r.hasMore) {
      val cch = r.u16()
      val flags = r.u8()
      val wide = (flags & 0x01) != 0
      val rich = (flags & 0x08) != 0
      val ext = (flags & 0x04) != 0
      val cRun = if (rich) r.u16() else 0
      val cbExt = if (ext) r.u32() else 0L
      out += r.chars(cch, wide)
      r.skip(cRun.toLong * 4 + cbExt)
      i += 1
    }
    out.result()
  }

  /** A BIFF8 short/inline string (LABEL, BOUNDSHEET name, STRING record). */
  private def inlineString(data: Array[Byte], pos: Int, len8: Boolean): String = {
    if (pos >= data.length) return ""
    val cch = if (len8) data(pos) & 0xFF
      else (data(pos) & 0xFF) | ((data(pos + 1) & 0xFF) << 8)
    val fpos = pos + (if (len8) 1 else 2)
    if (fpos >= data.length) return ""
    val wide = (data(fpos) & 0x01) != 0
    val start = fpos + 1
    if (wide) {
      val n = math.min(cch * 2, data.length - start)
      new String(data, start, n, java.nio.charset.StandardCharsets.UTF_16LE)
    } else {
      val n = math.min(cch, data.length - start)
      val sb = new StringBuilder(n)
      (0 until n).foreach(k => sb += ((data(start + k) & 0xFF).toChar))
      sb.toString
    }
  }

  /** Decode an RK-encoded number (MS-XLS 2.5.122). */
  private[sources] def decodeRk(rk: Long): Double = {
    val div100 = (rk & 0x1) != 0
    val isInt = (rk & 0x2) != 0
    val v =
      if (isInt) (rk.toInt >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk & 0xFFFFFFFCL) << 32)
    if (div100) v / 100 else v
  }

  /** Number → cell text the way the xlsx XML (and pandas str-ing an inferred
    * int column) renders it: integral doubles lose the trailing ".0". */
  private[sources] def numberText(d: Double): String =
    if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString else d.toString

  private def u16(d: Array[Byte], p: Int): Int =
    (d(p) & 0xFF) | ((d(p + 1) & 0xFF) << 8)
  private def u32(d: Array[Byte], p: Int): Long =
    u16(d, p).toLong | (u16(d, p + 2).toLong << 16)
  private def f64(d: Array[Byte], p: Int): Double =
    ByteBuffer.wrap(d, p, 8).order(ByteOrder.LITTLE_ENDIAN).getDouble

  def isXls(bytes: Array[Byte]): Boolean =
    bytes.length > 8 &&
      ByteBuffer.wrap(bytes, 0, 8).order(ByteOrder.LITTLE_ENDIAN).getLong ==
        0xE11AB1A1E011CFD0L &&
      (try { workbookStream(new Cfb(bytes)).isDefined } catch { case _: Exception => false })

  private def workbookStream(cfb: Cfb): Option[Array[Byte]] =
    cfb.entries.find(e => e.entryType == 2 &&
        (e.name == "Workbook" || e.name == "Book"))
      .map(cfb.readStream)

  /** One sheet's cell grid from its BOF..EOF substream slice. */
  private def sheetGrid(recs: Vector[Record], sst: Vector[String]): Map[(Int, Int), String] = {
    val grid = mutable.Map.empty[(Int, Int), String]
    var pendingFormulaCell: Option[(Int, Int)] = None
    var depth = 0
    val it = recs.iterator
    var done = false
    while (it.hasNext && !done) {
      val rec = it.next()
      val d = rec.data
      rec.tpe match {
        case 0x0809 => depth += 1 // nested BOF (charts etc.)
        case 0x000A => depth -= 1; if (depth <= 0) done = true
        case _ if depth != 1 => () // inside an embedded substream
        case 0x00FD if d.length >= 10 => // LABELSST
          val idx = u32(d, 6).toInt
          if (idx >= 0 && idx < sst.length)
            grid((u16(d, 0), u16(d, 2))) = sst(idx)
        case 0x0203 if d.length >= 14 => // NUMBER
          grid((u16(d, 0), u16(d, 2))) = numberText(f64(d, 6))
        case 0x027E if d.length >= 10 => // RK
          grid((u16(d, 0), u16(d, 2))) = numberText(decodeRk(u32(d, 6)))
        case 0x00BD if d.length >= 6 => // MULRK
          val row = u16(d, 0)
          val colFirst = u16(d, 2)
          val n = (d.length - 6) / 6
          (0 until n).foreach { k =>
            grid((row, colFirst + k)) = numberText(decodeRk(u32(d, 4 + k * 6 + 2)))
          }
        case 0x0204 if d.length >= 8 => // LABEL (inline)
          grid((u16(d, 0), u16(d, 2))) = inlineString(d, 6, len8 = false)
        case 0x0205 if d.length >= 8 => // BOOLERR
          if (d(7) == 0) grid((u16(d, 0), u16(d, 2))) =
            (if (d(6) != 0) "True" else "False")
        case 0x0006 if d.length >= 14 => // FORMULA: cached result
          val cell = (u16(d, 0), u16(d, 2))
          val resultHigh = u16(d, 12)
          if (resultHigh == 0xFFFF) (d(6): @annotation.switch) match {
            case 0 => pendingFormulaCell = Some(cell) // string follows in STRING
            case 1 => grid(cell) = if (d(8) != 0) "True" else "False"
            case _ => () // error / empty string
          }
          else grid(cell) = numberText(f64(d, 6))
        case 0x0207 => // STRING (formula string result)
          pendingFormulaCell.foreach { cell =>
            grid(cell) = inlineString(d, 0, len8 = false)
          }
          pendingFormulaCell = None
        case _ => ()
      }
    }
    grid.toMap
  }

  def partitionXls(bytes: Array[Byte], findSubtable: Boolean = true,
      inferTableStructure: Boolean = true,
      startingPageNumber: Int = 1): Seq[RawPara] = {
    val cfb = new Cfb(bytes)
    val stream = workbookStream(cfb).getOrElse(return Nil)
    val recs = records(stream)

    // workbook globals: sheet directory + shared strings (with CONTINUEs)
    val sheets = mutable.ArrayBuffer.empty[(Long, String)] // (streamPos, name)
    var sst = Vector.empty[String]
    var i = 0
    while (i < recs.length && recs(i).tpe != 0x000A) {
      val rec = recs(i)
      rec.tpe match {
        case 0x0085 if rec.data.length >= 8 => // BOUNDSHEET
          val pos = u32(rec.data, 0)
          val visible = (rec.data(4) & 0x03) == 0
          val isWorksheet = rec.data(5) == 0
          val name = inlineString(rec.data, 6, len8 = true)
          if (visible && isWorksheet) sheets += ((pos, name))
        case 0x00FC => // SST + CONTINUEs
          val segs = Vector.newBuilder[Array[Byte]]
          segs += rec.data
          var j = i + 1
          while (j < recs.length && recs(j).tpe == ContinueRecord) {
            segs += recs(j).data
            j += 1
          }
          sst = parseSst(segs.result())
        case _ => ()
      }
      i += 1
    }

    val byOffset = recs.map(r => r.offset -> r).toMap
    sheets.toSeq.zipWithIndex.flatMap { case ((pos, name), si) =>
      val startIdx = recs.indexWhere(_.offset == pos.toInt)
      if (startIdx < 0) Nil
      else {
        val grid = sheetGrid(recs.drop(startIdx), sst)
        val paras =
          if (grid.isEmpty) Nil
          else if (findSubtable)
            OoxmlPartitioner.subtableElements(grid, si + startingPageNumber, Some(name))
          else {
            val maxR = grid.keys.map(_._1).max
            val maxC = grid.keys.map(_._2).max
            val matrix = (0 to maxR).map(r => (0 to maxC).map(c => grid.getOrElse((r, c), "")))
            val text = Partitioners.tableText(matrix)
            if (text.isEmpty) Nil
            else Seq(RawPara(text, Some("Table"),
              textAsHtml = Some(Partitioners.htmlifyMatrix(matrix)),
              pageNumber = Some(si + startingPageNumber), pageName = Some(name)))
          }
        if (inferTableStructure) paras else paras.map(_.copy(textAsHtml = None))
      }
    }
  }
}
