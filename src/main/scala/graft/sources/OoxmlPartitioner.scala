package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import scala.collection.mutable

import graft.sources.HtmlPartitioner.RawPara

/**
 * DOCX / XLSX / PPTX partitioners over raw OPC packages — `java.util.zip` +
 * lightweight XML scanning, no Apache POI.
 *
 * Semantics follow the reference partitioners:
 *  - DOCX (`partition/docx.py:136-990`): body-order `w:p` / `w:tbl` traversal;
 *    `Heading N` style → Title with depth N-1 (`:954-970`, `:892-937`); numbering
 *    (`w:numPr`) or List styles → ListItem; explicit page breaks
 *    (`<w:br w:type="page"/>`) advance `page_number`; tables → Table with
 *    `text_as_html` (`:483-543`); untyped paragraphs derive from text.
 *  - XLSX (`partition/xlsx.py:45-135`): per-sheet cell grid via `sharedStrings`;
 *    `page_name` = sheet name, `page_number` = sheet ordinal. With
 *    `findSubtable=true` (the default, matching the reference) each sheet is
 *    split into connected components of non-empty cells: single-cell components
 *    become Title/NarrativeText/Text leaves, larger ones `Table` elements with
 *    HTML; `findSubtable=false` renders the whole sheet as one `Table`.
 *  - PPTX (`partition/pptx.py:83`): slide-order shape traversal; title
 *    placeholders → Title; body paragraphs derive; `page_number` = slide number.
 */
object OoxmlPartitioner {

  /**
   * Pluggable DOCX picture sub-partitioner — the `PicturePartitionerT` protocol
   * (`partition/docx.py:97-126`): receives each picture-bearing paragraph's XML and
   * a media resolver (relationship id → image bytes) and yields `Image` paras. The
   * default extracts nothing (the reference's `_NullPicturePartitioner`). Register
   * via [[graft.operators.Registries.registerPicturePartitioner]]; registration is
   * JVM-lifetime, so on a cluster it must run in executor startup (a static
   * initializer / `--conf spark.executor.plugins`), not just on the driver.
   */
  trait DocxPicturePartitioner extends Serializable {
    def elements(paragraphXml: String, media: String => Option[Array[Byte]]): Seq[RawPara]
  }

  object NullPicturePartitioner extends DocxPicturePartitioner {
    def elements(paragraphXml: String, media: String => Option[Array[Byte]]): Seq[RawPara] = Nil
  }

  /** Ready-made picture partitioner: each `a:blip` media reference becomes an
    * `Image` element carrying the bytes base64 with a magic-sniffed MIME type. */
  object Base64PicturePartitioner extends DocxPicturePartitioner {
    private val BlipEmbedRe = "<a:blip [^>]*r:embed=\"([^\"]+)\"".r

    private def sniffMime(b: Array[Byte]): String =
      if (b.length >= 4 && b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
        "image/png"
      else if (b.length >= 2 && b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) "image/jpeg"
      else if (b.length >= 3 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') "image/gif"
      else "application/octet-stream"

    def elements(paragraphXml: String, media: String => Option[Array[Byte]]): Seq[RawPara] =
      BlipEmbedRe.findAllMatchIn(paragraphXml).flatMap(m => media(m.group(1))).map { b =>
        RawPara("", Some("Image"),
          imageBase64 = Some(java.util.Base64.getEncoder.encodeToString(b)),
          imageMime = Some(sniffMime(b)))
      }.toSeq
  }

  /** Read selected zip members as raw bytes (media entries are not text). */
  private[sources] def zipEntriesRaw(bytes: Array[Byte],
      wanted: String => Boolean): Map[String, Array[Byte]] = {
    val out = mutable.Map.empty[String, Array[Byte]]
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory && wanted(e.getName)) out(e.getName) = zin.readAllBytes()
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.toMap
  }

  /** Read all (or selected) zip members into memory. */
  private[sources] def zipEntries(bytes: Array[Byte],
      wanted: String => Boolean): Map[String, String] = {
    val out = mutable.Map.empty[String, String]
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory && wanted(e.getName)) {
          out(e.getName) = new String(zin.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8)
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.toMap
  }

  private def xmlUnescape(s: String): String = HtmlPartitioner.unescape(s)

  // ------------------------------------------------------------------------ DOCX

  /** Reference-faithful DOCX partitioning — see [[DocxPartitioner]]. */
  def partitionDocx(bytes: Array[Byte]): Seq[RawPara] =
    DocxPartitioner.partition(bytes)

  /** Variant with an explicitly injected picture sub-partitioner — the Spark-safe
    * form (no JVM-global registration needed on executors). */
  def partitionDocx(bytes: Array[Byte],
      pictures: DocxPicturePartitioner): Seq[RawPara] =
    DocxPartitioner.partition(bytes, pictures = pictures)

  // ------------------------------------------------------------------------ XLSX

  private val SiRe = "(?s)<si>(.*?)</si>".r
  private val TRe = "(?s)<t(?: [^>]*)?>(.*?)</t>|<t/>".r
  private val RowRe = "(?s)<row[ >].*?</row>".r
  private val CellRe = "(?s)<c ([^>]*)>(?:.*?)</c>|<c ([^>]*)/>".r
  private val CellVRe = "(?s)<v>(.*?)</v>".r
  private val CellRefRe = "r=\"([A-Z]+)([0-9]+)\"".r
  private val SheetNameRe = "<sheet [^>]*name=\"([^\"]+)\"[^>]*/?>".r

  /** Numeric cells stored as "1.0"/"2.0" render as whole numbers — the
    * reference reads sheets through pandas where integral floats display
    * without a decimal part (`EXPECTED_TABLE_XLSX`, test_constants.py:31-38);
    * non-integral values keep their literal text. */
  private def formatNumericCell(raw: String): String =
    if (raw.indexOf('.') >= 0 || raw.indexOf('e') >= 0 || raw.indexOf('E') >= 0)
      scala.util.Try(raw.toDouble).toOption
        .filter(d => d.isWhole && math.abs(d) < 1e15)
        .map(_.toLong.toString).getOrElse(raw)
    else raw

  private def colIndex(ref: String): Int =
    ref.foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1

  /**
   * Subtable detection — `partition/xlsx.py:273-400`: connected components over
   * the populated-cell grid (4-neighbor), row-overlapping components merged
   * (sorted by top row, merge while `next.minRow <= current.maxRow`), then each
   * component's leading/trailing single-cell rows become classified `Text`-family
   * elements and the remaining core rectangle a `Table`.
   */
  private[sources] final case class Component(cells: Set[(Int, Int)]) {
    lazy val minRow: Int = cells.map(_._1).min
    lazy val maxRow: Int = cells.map(_._1).max
    def merge(o: Component): Component = Component(cells ++ o.cells)
  }

  private[sources] def connectedComponents(populated: Set[(Int, Int)]): Seq[Component] = {
    val seen = mutable.Set.empty[(Int, Int)]
    val out = mutable.ArrayBuffer.empty[Component]
    populated.toSeq.sorted.foreach { start =>
      if (!seen.contains(start)) {
        val comp = mutable.Set.empty[(Int, Int)]
        val queue = mutable.Queue(start)
        seen += start
        while (queue.nonEmpty) {
          val (r, c) = queue.dequeue()
          comp += ((r, c))
          Seq((r - 1, c), (r + 1, c), (r, c - 1), (r, c + 1)).foreach { n =>
            if (populated.contains(n) && !seen.contains(n)) { seen += n; queue += n }
          }
        }
        out += Component(comp.toSet)
      }
    }
    // merge row-overlapping components (`:320-352`)
    val sorted = out.sortBy(_.minRow)
    val merged = mutable.ArrayBuffer.empty[Component]
    sorted.foreach { comp =>
      if (merged.nonEmpty && comp.minRow <= merged.last.maxRow)
        merged(merged.length - 1) = merged.last.merge(comp)
      else merged += comp
    }
    merged.toSeq
  }

  /** Subtable split of one sheet's populated-cell grid into element paras. */
  private[sources] def subtableElements(grid: Map[(Int, Int), String], page: Int,
      sheetName: Option[String]): Seq[RawPara] = {
    if (grid.isEmpty) return Nil
    connectedComponents(grid.keySet).flatMap { comp =>
      val rows = (comp.minRow to comp.maxRow).map { r =>
        grid.view.filterKeys(_._1 == r).toSeq.sortBy(_._1._2).map(_._2)
      }
      val singleCell = rows.map(_.size == 1)
      val leading = singleCell.takeWhile(identity).size
      val trailing =
        if (leading == rows.size) 0
        else singleCell.reverse.takeWhile(identity).size
      val out = mutable.ArrayBuffer.empty[RawPara]
      // leading single-cell rows -> classified Text-family elements via the
      // restricted spreadsheet cascade (`_create_element`, xlsx.py:441-452)
      (0 until leading).foreach { i =>
        out += RawPara(rows(i).head, None, classifier = "tabular",
          pageNumber = Some(page), pageName = sheetName)
      }
      // core rectangle -> Table with html
      val core = rows.slice(leading, rows.size - trailing)
      if (core.nonEmpty) {
        // rectangularize over the core's populated column span
        val coreRows = (comp.minRow + leading) to (comp.maxRow - trailing)
        val cols = grid.keySet.filter(k => coreRows.contains(k._1)).map(_._2)
        val matrix = coreRows.map(r =>
          (cols.min to cols.max).map(c => grid.getOrElse((r, c), "")))
        val text = Partitioners.tableText(matrix)
        if (text.nonEmpty)
          out += RawPara(text, Some("Table"),
            textAsHtml = Some(Partitioners.htmlifyMatrix(matrix)),
            pageNumber = Some(page), pageName = sheetName)
      }
      (0 until trailing).foreach { i =>
        out += RawPara(rows(rows.size - trailing + i).head, None, classifier = "tabular",
          pageNumber = Some(page), pageName = sheetName)
      }
      out.toSeq
    }
  }

  def partitionXlsx(bytes: Array[Byte]): Seq[RawPara] =
    partitionXlsx(bytes, findSubtable = true)

  def partitionXlsx(bytes: Array[Byte], findSubtable: Boolean): Seq[RawPara] =
    partitionXlsx(bytes, findSubtable, includeHeader = false)

  /** `infer_table_structure=False` keeps the Table elements but drops their
    * `text_as_html`; `starting_page_number` offsets the sheet-index page
    * numbers (`partition/xlsx.py`; `test_auto.py:899`). */
  def partitionXlsx(bytes: Array[Byte], findSubtable: Boolean,
      includeHeader: Boolean, inferTableStructure: Boolean,
      startingPageNumber: Int = 1): Seq[RawPara] = {
    val paras0 = partitionXlsx(bytes, findSubtable, includeHeader)
    val paras =
      if (startingPageNumber == 1) paras0
      else paras0.map(p => p.copy(pageNumber =
        p.pageNumber.map(_ + startingPageNumber - 1)))
    if (inferTableStructure) paras else paras.map(_.copy(textAsHtml = None))
  }

  /** `include_header=True` (`test_xlsx.py:110-118`): the first worksheet row
    * becomes the column headings — blank headings fill as pandas "Unnamed: N"
    * — prepended to the table text and rendered as a `<thead>`. Header
    * consumption precedes subtable detection, and a headed sheet reads as one
    * table (the pandas `read_excel(header=0)` shape). */
  /** `UnprocessableEntityError` (`errors.py:14`) — raised for inputs the
    * partitioner recognizes but cannot process, e.g. an encrypted workbook
    * (`test_xlsx.py:172-175`). */
  final class UnprocessableEntityError(message: String)
    extends RuntimeException(message)

  def partitionXlsx(bytes: Array[Byte], findSubtable: Boolean,
      includeHeader: Boolean): Seq[RawPara] = {
    // a password-protected workbook arrives as a CFB container wrapping an
    // EncryptedPackage stream — recognizable, not processable
    if (bytes.length >= 8 && (bytes(0) & 0xFF) == 0xD0 && (bytes(1) & 0xFF) == 0xCF)
      throw new UnprocessableEntityError(
        "File is encrypted. Please decrypt it with password.")
    val entries = zipEntries(bytes, n =>
      n == "xl/sharedStrings.xml" || n == "xl/workbook.xml" ||
        (n.startsWith("xl/worksheets/sheet") && n.endsWith(".xml")))
    val shared: Vector[String] =
      entries.get("xl/sharedStrings.xml").map { ss =>
        SiRe.findAllMatchIn(ss).map(m =>
          TRe.findAllMatchIn(m.group(1)).map(t => Option(t.group(1)).getOrElse(""))
            .map(xmlUnescape).mkString).toVector
      }.getOrElse(Vector.empty)
    val sheetNames = entries.get("xl/workbook.xml")
      .map(wb => SheetNameRe.findAllMatchIn(wb).map(_.group(1)).toVector)
      .getOrElse(Vector.empty)

    val sheets = entries.keys.filter(_.startsWith("xl/worksheets/sheet")).toSeq
      .sortBy(n => "sheet([0-9]+)".r.findFirstMatchIn(n).map(_.group(1).toInt).getOrElse(0))

    sheets.zipWithIndex.flatMap { case (name, si) =>
      val xml = entries(name)
      val grid = mutable.Map.empty[(Int, Int), String]
      var maxR = -1
      var maxC = -1
      RowRe.findAllIn(xml).foreach { row =>
        CellRe.findAllMatchIn(row).foreach { cm =>
          val attrs = Option(cm.group(1)).getOrElse(Option(cm.group(2)).getOrElse(""))
          CellRefRe.findFirstMatchIn(attrs).foreach { rm =>
            val c = colIndex(rm.group(1))
            val r = rm.group(2).toInt - 1
            val isShared = attrs.contains("t=\"s\"")
            val v = CellVRe.findFirstMatchIn(cm.matched).map(_.group(1)).getOrElse("")
            val value =
              if (isShared) scala.util.Try(shared(v.toInt)).getOrElse("")
              else if (!attrs.contains("t=\"")) formatNumericCell(xmlUnescape(v))
              else xmlUnescape(v)
            if (value.nonEmpty) {
              grid((r, c)) = value
              if (r > maxR) maxR = r
              if (c > maxC) maxC = c
            }
          }
        }
      }
      if (maxR < 0) Nil
      else if (includeHeader) {
        val matrix0 = (0 to maxR).map(r => (0 to maxC).map(c => grid.getOrElse((r, c), "")))
        val headers = matrix0.head.zipWithIndex.map { case (h, i) =>
          if (h.nonEmpty) h else s"Unnamed: $i"
        }
        val matrix = headers +: matrix0.tail
        Seq(RawPara(Partitioners.tableText(matrix), Some("Table"),
          textAsHtml = Some(Partitioners.pandasTableHtml(matrix, header = true)),
          pageNumber = Some(si + 1),
          pageName = sheetNames.lift(si)))
      } else if (findSubtable) {
        subtableElements(grid.toMap, si + 1, sheetNames.lift(si))
      } else {
        val matrix = (0 to maxR).map(r => (0 to maxC).map(c => grid.getOrElse((r, c), "")))
        val text = Partitioners.tableText(matrix)
        if (text.isEmpty) Nil
        else Seq(RawPara(text, Some("Table"),
          textAsHtml = Some(Partitioners.htmlifyMatrix(matrix)),
          pageNumber = Some(si + 1),
          pageName = sheetNames.lift(si)))
      }
    }
  }

  // ------------------------------------------------------------------------ PPTX

  /** Reference-faithful PPTX partitioning — see [[PptxPartitioner]]. */
  def partitionPptx(bytes: Array[Byte]): Seq[RawPara] =
    PptxPartitioner.partition(bytes)
}
