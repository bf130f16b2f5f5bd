package graft.queries

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_16LE, UTF_8}
import java.util.zip.{CRC32, Deflater, ZipEntry, ZipOutputStream}

import scala.collection.mutable

/**
 * Deterministic in-memory document builders for the binary-format coverage
 * queries: OPC/ODF zip packages, a minimal PDF with FlateDecode content streams,
 * and a from-scratch CFB (OLE2) container for Outlook .msg. These are
 * CONSTRUCTION-side only — independent of the parsers they feed
 * ([[graft.sources.OoxmlPartitioner]], [[graft.sources.PdfPartitioner]],
 * [[graft.sources.MsgPartitioner]]): a parser bug surfaces as a mismatch against
 * the DuckDB oracle's construction-predicted output, not a silently shared code
 * path.
 */
object CorpusBytes {

  /** The per-document fields every corpus derives from (mirrored in oracle SQL). */
  final case class Doc(docId: Long, t3: String, ps: Seq[String], w1: String,
      source: String, nChars: Long)

  def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  // -------------------------------------------------------------------- ZIP (OPC)

  /** All entries STORED (uncompressed) so member names AND contents stay
    * byte-sniffable; timestamps pinned for determinism. */
  def zip(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    entries.foreach { case (name, data) =>
      val e = new ZipEntry(name)
      e.setMethod(ZipEntry.STORED)
      e.setSize(data.length.toLong)
      e.setCompressedSize(data.length.toLong)
      val crc = new CRC32(); crc.update(data); e.setCrc(crc.getValue)
      e.setTime(315532800000L) // 1980-01-01, the zip epoch
      zos.putNextEntry(e); zos.write(data); zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  // ------------------------------------------------------------------------ DOCX

  /** Heading + prose + numPr list item + split-run escape + page break + table. */
  def docx(d: Doc): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\"?><w:document><w:body>")
    sb.append("<w:p><w:pPr><w:pStyle w:val=\"Heading1\"/></w:pPr><w:r><w:t>")
      .append(xmlEscape(d.t3)).append("</w:t></w:r></w:p>")
    d.ps.foreach { p =>
      sb.append("<w:p><w:r><w:t>").append(xmlEscape(p)).append("</w:t></w:r></w:p>")
    }
    sb.append("<w:p><w:pPr><w:numPr><w:ilvl w:val=\"1\"/><w:numId w:val=\"1\"/>")
      .append("</w:numPr></w:pPr><w:r><w:t>item ").append(d.docId % 5)
      .append("</w:t></w:r></w:p>")
    // two runs + an XML escape: joined text is "A&B <w1>"
    sb.append("<w:p><w:r><w:t xml:space=\"preserve\">A&amp;B </w:t></w:r><w:r><w:t>")
      .append(xmlEscape(d.w1)).append("</w:t></w:r></w:p>")
    // drawing-only paragraph: invisible to text partitioning (no w:t), feeds the
    // pluggable picture sub-partitioner when one is injected
    sb.append("<w:p><w:r><w:drawing><a:blip r:embed=\"rIdImg\"/></w:drawing></w:r></w:p>")
    // rendered page-break (docx.py:314-333): splits this paragraph into an empty
    // page-1 fragment, a PageBreak element, and the page-2 text
    sb.append("<w:p><w:r><w:lastRenderedPageBreak/><w:t>page two ")
      .append(xmlEscape(d.source)).append("</w:t></w:r></w:p>")
    sb.append("<w:tbl><w:tr><w:tc><w:p><w:r><w:t>k</w:t></w:r></w:p></w:tc>")
      .append("<w:tc><w:p><w:r><w:t>").append(xmlEscape(d.source))
      .append("</w:t></w:r></w:p></w:tc></w:tr></w:tbl>")
    sb.append("<w:sectPr><w:headerReference w:type=\"default\" r:id=\"rIdH\"/>")
      .append("<w:footerReference w:type=\"default\" r:id=\"rIdF\"/></w:sectPr>")
    sb.append("</w:body></w:document>")
    zip(Seq(
      "[Content_Types].xml" -> "<?xml version=\"1.0\"?><Types/>".getBytes(UTF_8),
      "word/document.xml" -> sb.toString.getBytes(UTF_8),
      "word/styles.xml" ->
        ("<?xml version=\"1.0\"?><w:styles><w:style w:type=\"paragraph\" " +
          "w:styleId=\"Heading1\"><w:name w:val=\"heading 1\"/></w:style></w:styles>")
          .getBytes(UTF_8),
      "word/header1.xml" ->
        ("<w:hdr><w:p><w:r><w:t>hdr " + xmlEscape(d.source) +
          "</w:t></w:r></w:p></w:hdr>").getBytes(UTF_8),
      "word/footer1.xml" ->
        ("<w:ftr><w:p><w:r><w:t>ftr " + xmlEscape(d.source) +
          "</w:t></w:r></w:p></w:ftr>").getBytes(UTF_8),
      "word/_rels/document.xml.rels" ->
        ("<?xml version=\"1.0\"?><Relationships><Relationship Id=\"rIdImg\" " +
          "Type=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships/image\" " +
          "Target=\"media/image1.png\"/>" +
          "<Relationship Id=\"rIdH\" Target=\"header1.xml\"/>" +
          "<Relationship Id=\"rIdF\" Target=\"footer1.xml\"/></Relationships>").getBytes(UTF_8),
      // PNG magic + source bytes: magic-sniffable, and the oracle reproduces the
      // base64 as base64(from_hex('89504E47') || source::BLOB)
      "word/media/image1.png" ->
        (Array[Byte](0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte) ++
          d.source.getBytes(UTF_8))))
  }

  // ------------------------------------------------------------------------ XLSX

  /** One sheet, two connected components: a leading single-cell title row over a
    * 2x2 core, an empty row gap, then a second 2x2 block. Strings go through
    * sharedStrings, numbers are inline `<v>`. */
  def xlsx(d: Doc): Array[Byte] = {
    val shared = Seq(s"Report ${d.source}", "k", "v", d.w1, "x", "y", "end")
    val ss = "<?xml version=\"1.0\"?><sst>" +
      shared.map(s => s"<si><t>${xmlEscape(s)}</t></si>").mkString + "</sst>"
    val wb = "<?xml version=\"1.0\"?><workbook><sheets>" +
      "<sheet name=\"S1\" sheetId=\"1\"/></sheets></workbook>"
    val sheet = "<?xml version=\"1.0\"?><worksheet><sheetData>" +
      "<row r=\"1\"><c r=\"A1\" t=\"s\"><v>0</v></c></row>" +
      "<row r=\"2\"><c r=\"A2\" t=\"s\"><v>1</v></c><c r=\"B2\" t=\"s\"><v>2</v></c></row>" +
      s"""<row r="3"><c r="A3" t="s"><v>3</v></c><c r="B3"><v>${d.nChars}</v></c></row>""" +
      "<row r=\"5\"><c r=\"A5\" t=\"s\"><v>4</v></c><c r=\"B5\" t=\"s\"><v>5</v></c></row>" +
      s"""<row r="6"><c r="A6" t="s"><v>6</v></c><c r="B6"><v>${d.docId}</v></c></row>""" +
      "</sheetData></worksheet>"
    zip(Seq(
      "xl/workbook.xml" -> wb.getBytes(UTF_8),
      "xl/sharedStrings.xml" -> ss.getBytes(UTF_8),
      "xl/worksheets/sheet1.xml" -> sheet.getBytes(UTF_8)))
  }

  /** The same worksheet as [[xlsx]], authored as a legacy BIFF8 `Workbook`
    * stream in a CFB container: globals (BOF, BOUNDSHEET, SST, EOF) + one
    * sheet substream (BOF, LABELSST/RK/NUMBER cells, EOF). Numbers exercise
    * both the RK and the IEEE-double record paths. */
  def xls(d: Doc): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Array[Byte] = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def u32(v: Long): Array[Byte] = u16((v & 0xFFFF).toInt) ++ u16(((v >> 16) & 0xFFFF).toInt)
    def rec(tpe: Int, body: Array[Byte]): Array[Byte] =
      u16(tpe) ++ u16(body.length) ++ body
    def bof(dt: Int): Array[Byte] =
      rec(0x0809, u16(0x0600) ++ u16(dt) ++ u16(0x0DBB) ++ u16(0x07CC) ++ u32(0L) ++ u32(0L))
    val eof = rec(0x000A, Array.empty)

    val shared = Seq(s"Report ${d.source}", "k", "v", d.w1, "x", "y", "end")
    def sstString(s: String): Array[Byte] = {
      val wide = s.exists(_ > 'ÿ')
      val chars =
        if (wide) s.getBytes(UTF_16LE)
        else s.map(c => (c & 0xFF).toByte).toArray
      u16(s.length) ++ Array((if (wide) 1 else 0).toByte) ++ chars
    }
    val sst = rec(0x00FC,
      u32(shared.length.toLong) ++ u32(shared.length.toLong) ++
        shared.flatMap(sstString).toArray)
    def labelSst(row: Int, col: Int, idx: Int): Array[Byte] =
      rec(0x00FD, u16(row) ++ u16(col) ++ u16(0) ++ u32(idx.toLong))
    def rk(row: Int, col: Int, v: Int): Array[Byte] =
      rec(0x027E, u16(row) ++ u16(col) ++ u16(0) ++ u32(((v.toLong << 2) | 0x2L) & 0xFFFFFFFFL))
    def number(row: Int, col: Int, v: Double): Array[Byte] = {
      val bits = java.lang.Double.doubleToLongBits(v)
      rec(0x0203, u16(row) ++ u16(col) ++ u16(0) ++
        (0 until 8).map(i => ((bits >> (8 * i)) & 0xFF).toByte).toArray)
    }

    val sheet = bof(0x0010) ++
      labelSst(0, 0, 0) ++
      labelSst(1, 0, 1) ++ labelSst(1, 1, 2) ++
      labelSst(2, 0, 3) ++ rk(2, 1, d.nChars.toInt) ++
      labelSst(4, 0, 4) ++ labelSst(4, 1, 5) ++
      labelSst(5, 0, 6) ++ number(5, 1, d.docId.toDouble) ++
      eof
    // BOUNDSHEET: u32 stream pos (globals length, patched below), visibility,
    // sheet type, then the len8 compressed name
    def boundsheet(pos: Long): Array[Byte] =
      rec(0x0085, u32(pos) ++ Array(0.toByte, 0.toByte,
        2.toByte, 0.toByte) ++ "S1".map(c => (c & 0xFF).toByte).toArray)
    val globalsLen = (bof(0x0005) ++ boundsheet(0) ++ sst ++ eof).length
    val globals = bof(0x0005) ++ boundsheet(globalsLen.toLong) ++ sst ++ eof
    out.write(globals)
    out.write(sheet)
    cfb(Seq("Workbook" -> out.toByteArray))
  }

  // ------------------------------------------------------------------------ PPTX

  /** Slide 1: title placeholder + body paragraphs + one buChar bullet;
    * slide 2: ctrTitle + one body paragraph. */
  def pptx(d: Doc): Array[Byte] = {
    def sp(body: String): String = s"<p:sp>$body</p:sp>"
    def ap(text: String): String = s"<a:p><a:r><a:t>${xmlEscape(text)}</a:t></a:r></a:p>"
    val slide1 = "<?xml version=\"1.0\"?><p:sld><p:cSld><p:spTree>" +
      sp("<p:nvSpPr><p:nvPr><p:ph type=\"title\"/></p:nvPr></p:nvSpPr><p:txBody>" +
        ap(d.t3) + "</p:txBody>") +
      sp("<p:txBody>" + d.ps.map(ap).mkString +
        s"""<a:p><a:pPr><a:buChar char="•"/></a:pPr><a:r><a:t>item ${d.docId % 5}</a:t></a:r></a:p>""" +
        "</p:txBody>") +
      "</p:spTree></p:cSld></p:sld>"
    val slide2 = "<?xml version=\"1.0\"?><p:sld><p:cSld><p:spTree>" +
      sp("<p:nvSpPr><p:nvPr><p:ph type=\"ctrTitle\"/></p:nvPr></p:nvSpPr><p:txBody>" +
        ap(s"Next ${d.w1}") + "</p:txBody>") +
      sp("<p:txBody>" + ap(s"closing remarks ${d.source}") + "</p:txBody>") +
      "</p:spTree></p:cSld></p:sld>"
    zip(Seq(
      "ppt/slides/slide1.xml" -> slide1.getBytes(UTF_8),
      "ppt/slides/slide2.xml" -> slide2.getBytes(UTF_8)))
  }

  // ------------------------------------------------------------------------- ODT

  def odt(d: Doc): Array[Byte] = {
    val content = "<?xml version=\"1.0\"?><office:document-content><office:body>" +
      "<office:text>" +
      s"""<text:h text:outline-level="1">${xmlEscape(d.t3)}</text:h>""" +
      d.ps.map(p => s"<text:p>${xmlEscape(p)}</text:p>").mkString +
      "<text:list><text:list-item><text:p>item " + (d.docId % 5) +
      "</text:p></text:list-item>" +
      "<text:list-item><text:p>second item</text:p></text:list-item></text:list>" +
      "<table:table><table:table-row>" +
      "<table:table-cell><text:p>k</text:p></table:table-cell>" +
      s"<table:table-cell><text:p>${xmlEscape(d.source)}</text:p></table:table-cell>" +
      "</table:table-row></table:table>" +
      "</office:text></office:body></office:document-content>"
    zip(Seq(
      "mimetype" -> "application/vnd.oasis.opendocument.text".getBytes(UTF_8),
      "content.xml" -> content.getBytes(UTF_8)))
  }

  // ------------------------------------------------------------------------ EPUB

  /** Two spine chapters; chapter 1's href is percent-encoded AND `../`-relative
    * to exercise href resolution. */
  def epub(d: Doc): Array[Byte] = {
    val opf = "<?xml version=\"1.0\"?><package><manifest>" +
      "<item id=\"c1\" href=\"text/../ch%201.xhtml\" media-type=\"application/xhtml+xml\"/>" +
      "<item id=\"c2\" href=\"ch2.xhtml\" media-type=\"application/xhtml+xml\"/>" +
      "</manifest><spine><itemref idref=\"c1\"/><itemref idref=\"c2\"/></spine></package>"
    val ch1 = s"<html><body><h1>${xmlEscape(d.t3)}</h1>" +
      d.ps.map(p => s"<p>${xmlEscape(p)}</p>").mkString + "</body></html>"
    val ch2 = s"<html><body><h2>The End</h2><p>closing ${xmlEscape(d.source)}</p></body></html>"
    zip(Seq(
      "mimetype" -> "application/epub+zip".getBytes(UTF_8),
      "OEBPS/content.opf" -> opf.getBytes(UTF_8),
      "OEBPS/ch 1.xhtml" -> ch1.getBytes(UTF_8),
      "OEBPS/ch2.xhtml" -> ch2.getBytes(UTF_8)))
  }

  // ------------------------------------------------------------------------- PDF

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Escape a PDF paren-string (parens + backslash). */
  private def pdfStr(s: String): String =
    s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")

  /**
   * Two-page PDF, FlateDecode content streams. Page 1: title line + paragraphs,
   * the first carrying an octal escape (`\351` = é) and escaped parens; page 2 a
   * single line. Lines break on `TD` y-motion.
   */
  def pdf(d: Doc): Array[Byte] = {
    def content(lines: Seq[String]): Array[Byte] = {
      val body = new StringBuilder("BT /F1 12 Tf 72 720 Td ")
      lines.zipWithIndex.foreach { case (l, i) =>
        if (i > 0) body.append("0 -24 TD ")
        body.append("(").append(l).append(") Tj ")
      }
      body.append("ET")
      deflate(body.toString.getBytes(ISO_8859_1))
    }
    val page1 = content(
      pdfStr(d.t3) +: d.ps.zipWithIndex.map { case (p, i) =>
        if (i == 0) "caf\\351 \\(plus\\) " + pdfStr(p) else pdfStr(p)
      })
    val page2 = content(Seq("page two " + pdfStr(d.source)))
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R /Annots [7 0 R] >> endobj\n")
    w(s"4 0 obj << /Length ${page1.length} /Filter /FlateDecode >> stream\n")
    out.write(page1); w("endstream endobj\n")
    w("5 0 obj << /Type /Page /Parent 2 0 R /Contents 6 0 R >> endobj\n")
    w(s"6 0 obj << /Length ${page2.length} /Filter /FlateDecode >> stream\n")
    out.write(page2); w("endstream endobj\n")
    // a /Link over the title line's first character cell (the 0.5em reader
    // grid puts char 0 of the 12pt line at x [72,78), glyph box y [720,732])
    // — the hyperlink path maps it to the title's first word run
    w("7 0 obj << /Type /Annot /Subtype /Link /Rect [72 720 78 732] " +
      s"/A << /S /URI /URI (https://corpus.example/doc${d.docId}) >> >> endobj\n")
    w("trailer << /Root 1 0 R >>\n%%EOF\n")
    out.toByteArray
  }

  /**
   * Two-page PDF with an EMBEDDED IMAGE XOBJECT for the image-block
   * extraction path: page 1 draws a 24×16 FlateDecode /DeviceRGB image
   * (deterministic per-doc gradient) into the 150×100 pt rect at
   * bottom-up (100,500)→(250,600) — top-left frame (100,192,250,292) —
   * plus two short text lines (the doc's first-3-words title and a fixed
   * caption) whose estimated line boxes stay strictly inside a
   * (60,40,600,150) envelope; page 2 is one text line. The fixed geometry
   * makes crop dimensions pure constants for the oracle.
   */
  def pdfWithImage(d: Doc): Array[Byte] = {
    val rgb = new Array[Byte](24 * 16 * 3)
    var i = 0
    while (i < 24 * 16) {
      val x = i % 24; val y = i / 24
      rgb(i * 3) = ((x * 10 + d.docId) % 256).toByte
      rgb(i * 3 + 1) = ((y * 16) % 256).toByte
      rgb(i * 3 + 2) = 100.toByte
      i += 1
    }
    val imgData = deflate(rgb)
    val body = "q 150 0 0 100 100 500 cm /Im1 Do Q\n" +
      "BT /F1 12 Tf 72 720 Td (" + pdfStr(d.t3) + ") Tj " +
      "0 -24 TD (figure caption line) Tj ET"
    val content = deflate(body.getBytes(ISO_8859_1))
    val page2 = deflate(("BT /F1 12 Tf 72 720 Td (page two " +
      pdfStr(d.source) + ") Tj ET").getBytes(ISO_8859_1))
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /XObject << /Im1 7 0 R >> >> >> endobj\n")
    w(s"4 0 obj << /Length ${content.length} /Filter /FlateDecode >> stream\n")
    out.write(content); w("endstream endobj\n")
    w("5 0 obj << /Type /Page /Parent 2 0 R /Contents 6 0 R >> endobj\n")
    w(s"6 0 obj << /Length ${page2.length} /Filter /FlateDecode >> stream\n")
    out.write(page2); w("endstream endobj\n")
    w(s"7 0 obj << /Type /XObject /Subtype /Image /Width 24 /Height 16 " +
      s"/BitsPerComponent 8 /ColorSpace /DeviceRGB /Filter /FlateDecode " +
      s"/Length ${imgData.length} >> stream\n")
    out.write(imgData); w("endstream endobj\n")
    w("trailer << /Root 1 0 R >>\n%%EOF\n")
    out.toByteArray
  }

  /** Minimal single-page PDF wrapper around one raw (uncompressed) content
    * stream — the strategy-probe corpora below share it. */
  private def onePagePdf(body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${body.length} >> stream\n")
    out.write(body); w("\nendstream endobj\n")
    w("trailer << /Root 1 0 R >>\n%%EOF\n")
    out.toByteArray
  }

  /**
   * CAD-style vector drawing: a ~2 KB content stream of path-paint operators
   * (`m`/`l`/`S`) and zero text operators, the shape `is_pdf_too_complex`
   * exists to catch (`partition/pdf.py:618-744`). Sized for q_pdf_strategy's
   * lowered probe thresholds — the reference's own tests lower them the same
   * way rather than shipping >1 MB fixtures.
   */
  def vectorPdf(d: Doc): Array[Byte] = {
    val ops = new StringBuilder()
    var i = 0
    while (i < 120) { ops.append(i).append(" 0 m 10 ").append(i % 7).append(" l S\n"); i += 1 }
    onePagePdf(ops.toString.getBytes(ISO_8859_1))
  }

  /** A drawing-only PDF small enough to skip the complexity probe: no text
    * operators, so fast extraction finds nothing (the scanned-PDF case that
    * routes auto → ocr_only). */
  def noTextPdf(d: Doc): Array[Byte] =
    onePagePdf("0 0 m 5 5 l S\n0 5 m 5 0 l S\n".getBytes(ISO_8859_1))

  // ------------------------------------------------------------------- DOC / PPT

  /**
   * Word 97 binary file: FIB in the `WordDocument` stream, Clx piece table in
   * `1Table`. Two pieces — cp1252 (fCompressed, carries é) then UTF-16LE — with
   * the piece boundary mid-paragraph, a leading Prc block before the Pcdt, and a
   * 0x0C page break ([MS-DOC] layout; parsed by
   * [[graft.sources.LegacyOfficePartitioner.partitionDoc]]).
   */
  def doc(d: Doc): Array[Byte] = {
    val p1 = d.t3 + "\r" + "café "
    val p2 = d.ps.mkString("\r") + "\r\fpage two " + d.source + "\r"
    val p1b = p1.getBytes("windows-1252")
    val p2b = p2.getBytes(UTF_16LE)
    val textOff = 0x600
    val wd = new Array[Byte](textOff + p1b.length + p2b.length)
    val wb = ByteBuffer.wrap(wd).order(ByteOrder.LITTLE_ENDIAN)
    wb.putShort(0, 0xA5EC.toShort) // wIdent
    wb.putShort(2, 0x00C1.toShort) // nFib (Word 97)
    wb.putShort(0x0A, 0x0200.toShort) // fWhichTblStm -> 1Table
    wb.putInt(0x4C, p1.length + p2.length) // ccpText
    wb.putInt(0x1A2, 0) // fcClx: Clx at offset 0 of 1Table
    System.arraycopy(p1b, 0, wd, textOff, p1b.length)
    System.arraycopy(p2b, 0, wd, textOff + p1b.length, p2b.length)

    val n = 2
    val lcb = (n + 1) * 4 + n * 8
    val clx = ByteBuffer.allocate(5 + 5 + lcb).order(ByteOrder.LITTLE_ENDIAN)
    clx.put(0x01.toByte); clx.putShort(2.toShort); clx.putShort(0.toShort) // Prc
    clx.put(0x02.toByte); clx.putInt(lcb) // Pcdt
    clx.putInt(0); clx.putInt(p1.length); clx.putInt(p1.length + p2.length)
    clx.putShort(0); clx.putInt((textOff * 2) | 0x40000000); clx.putShort(0)
    clx.putShort(0); clx.putInt(textOff + p1b.length); clx.putShort(0)
    val tbl = clx.array()
    wb.putInt(0x1A6, tbl.length) // lcbClx
    cfb(Seq("WordDocument" -> wd, "1Table" -> tbl))
  }

  /**
   * PowerPoint 97 file: record tree in the `PowerPoint Document` stream. Slide 1
   * carries a title, a multi-paragraph body (CR-separated TextCharsAtom) and a
   * notes text that must be dropped; slide 2 a centerTitle and body via cp1252
   * TextBytesAtoms ([MS-PPT] record layout; parsed by
   * [[graft.sources.LegacyOfficePartitioner.partitionPpt]]).
   */
  def ppt(d: Doc): Array[Byte] = {
    def rec(verInst: Int, typ: Int, body: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + body.length).order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(verInst.toShort); b.putShort(typ.toShort); b.putInt(body.length)
      b.put(body); b.array()
    }
    def atom(typ: Int, body: Array[Byte]): Array[Byte] = rec(0x0000, typ, body)
    def tha(txType: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(txType)
      atom(0x0F9F, b.array())
    }
    def chars(s: String): Array[Byte] = atom(0x0FA0, s.getBytes(UTF_16LE))
    def bytesAtom(s: String): Array[Byte] = atom(0x0FA8, s.getBytes("windows-1252"))
    val slide1 = rec(0x000F, 0x03EE,
      tha(0) ++ chars(d.t3) ++
        tha(1) ++ chars(d.ps.mkString("\r")) ++
        tha(2) ++ chars("speaker notes"))
    val slide2 = rec(0x000F, 0x03EE,
      tha(6) ++ bytesAtom(s"Next café ${d.w1}") ++
        tha(1) ++ bytesAtom(s"closing remarks ${d.source}"))
    cfb(Seq("PowerPoint Document" -> rec(0x000F, 0x03E8, slide1 ++ slide2)))
  }

  // ------------------------------------------------------------------- CFB / MSG

  private val FreeSect = 0xFFFFFFFF
  private val EndOfChain = 0xFFFFFFFE
  private val FatSect = 0xFFFFFFFD

  private final case class CfbNode(name: String, isStorage: Boolean,
      data: Array[Byte], children: mutable.ArrayBuffer[CfbNode] = mutable.ArrayBuffer())

  /**
   * Write a Compound File Binary v3 container: 512-byte sectors, 64-byte mini
   * sectors, 4096 mini cutoff. Every stream here is small, so stream data lives
   * in the root mini stream with a real miniFAT — the same layout Outlook writes
   * and the same path [[graft.sources.MsgPartitioner.Cfb]] reads.
   * Directory siblings form a rightId chain (a legal, if unbalanced, red-black
   * tree).
   */
  def cfb(streams: Seq[(String, Array[Byte])]): Array[Byte] = {
    // ---- build the storage tree
    val root = CfbNode("Root Entry", isStorage = true, Array.empty)
    streams.foreach { case (path, data) =>
      val parts = path.split("/")
      var cur = root
      parts.dropRight(1).foreach { seg =>
        cur = cur.children.find(_.name == seg).getOrElse {
          val n = CfbNode(seg, isStorage = true, Array.empty)
          cur.children += n; n
        }
      }
      cur.children += CfbNode(parts.last, isStorage = false, data)
    }

    // ---- assign directory ids (root first, then DFS)
    val order = mutable.ArrayBuffer.empty[CfbNode]
    def visit(n: CfbNode): Unit = { order += n; n.children.foreach(visit) }
    visit(root)
    // reference identity — structurally equal nodes (same name in two storages)
    // must keep distinct ids
    def idOf(n: CfbNode): Int = order.indexWhere(_ eq n)

    // ---- mini stream: each stream padded to 64B; record first mini sector
    val miniData = new ByteArrayOutputStream()
    val miniStart = mutable.Map.empty[Int, Int] // dir id -> first mini sector
    val miniChainLinks = mutable.ArrayBuffer.empty[Int]
    order.foreach { n =>
      if (!n.isStorage && n.data.nonEmpty) {
        val first = miniData.size() / 64
        miniStart(idOf(n)) = first
        val nSect = (n.data.length + 63) / 64
        miniData.write(n.data)
        val pad = nSect * 64 - n.data.length
        miniData.write(new Array[Byte](pad))
        (0 until nSect).foreach { i =>
          miniChainLinks += (if (i == nSect - 1) EndOfChain else first + i + 1)
        }
      }
    }
    val miniBytes = miniData.toByteArray

    // ---- regular sector layout: [dir][miniFAT][miniStream][FAT]
    val nDirSectors = math.max(1, (order.length * 128 + 511) / 512)
    val nMiniFatSectors = (miniChainLinks.length * 4 + 511) / 512
    val nMiniStreamSectors = (miniBytes.length + 511) / 512
    val dirStart = 0
    val miniFatStartSector = dirStart + nDirSectors
    val miniStreamStartSector = miniFatStartSector + nMiniFatSectors
    val fatStartSector = miniStreamStartSector + nMiniStreamSectors
    // one FAT sector covers 128 sectors — enough for this corpus, assert anyway
    val nFatSectors = (fatStartSector + 1 + 127) / 128
    require(nFatSectors <= 109, "corpus CFB exceeds header DIFAT")
    val totalSectors = fatStartSector + nFatSectors

    // ---- FAT
    val fat = Array.fill(nFatSectors * 128)(FreeSect)
    def chainRange(start: Int, count: Int): Unit =
      (0 until count).foreach { i =>
        fat(start + i) = if (i == count - 1) EndOfChain else start + i + 1
      }
    chainRange(dirStart, nDirSectors)
    if (nMiniFatSectors > 0) chainRange(miniFatStartSector, nMiniFatSectors)
    if (nMiniStreamSectors > 0) chainRange(miniStreamStartSector, nMiniStreamSectors)
    (0 until nFatSectors).foreach(i => fat(fatStartSector + i) = FatSect)

    // ---- directory sectors
    val dirBytes = new Array[Byte](nDirSectors * 512)
    val db = ByteBuffer.wrap(dirBytes).order(ByteOrder.LITTLE_ENDIAN)
    // empty entries: type 0, ids -1
    (0 until dirBytes.length / 128).foreach { i =>
      db.putInt(i * 128 + 68, FreeSect)
      db.putInt(i * 128 + 72, FreeSect)
      db.putInt(i * 128 + 76, FreeSect)
    }
    order.foreach { n =>
      val base = idOf(n) * 128
      val nameBytes = n.name.getBytes(UTF_16LE)
      System.arraycopy(nameBytes, 0, dirBytes, base, math.min(nameBytes.length, 62))
      db.putShort(base + 64, (math.min(nameBytes.length, 62) + 2).toShort)
      dirBytes(base + 66) = if (n eq root) 5.toByte else if (n.isStorage) 1.toByte else 2.toByte
      dirBytes(base + 67) = 1 // black
      db.putInt(base + 68, FreeSect) // leftId
      // rightId: next sibling in parent's child list
      val parent = order.find(p => p.children.exists(_ eq n))
      val right = parent.flatMap { p =>
        val i = p.children.indexWhere(_ eq n)
        if (i >= 0 && i + 1 < p.children.length) Some(idOf(p.children(i + 1))) else None
      }
      db.putInt(base + 72, right.getOrElse(FreeSect))
      val child = if (n.children.nonEmpty) idOf(n.children.head) else FreeSect
      db.putInt(base + 76, child)
      if (n eq root) {
        db.putInt(base + 116, if (nMiniStreamSectors > 0) miniStreamStartSector else EndOfChain)
        db.putLong(base + 120, miniBytes.length.toLong)
      } else if (!n.isStorage) {
        db.putInt(base + 116, if (n.data.nonEmpty) miniStart(idOf(n)) else EndOfChain)
        db.putLong(base + 120, n.data.length.toLong)
      }
    }

    // ---- assemble: header + sectors
    val out = new Array[Byte]((totalSectors + 1) * 512)
    val hb = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    hb.putLong(0, 0xE11AB1A1E011CFD0L)
    hb.putShort(24, 0x3E.toShort) // minor
    hb.putShort(26, 3.toShort) // major (v3)
    hb.putShort(28, 0xFFFE.toShort) // byte order
    hb.putShort(30, 9.toShort) // sector shift
    hb.putShort(32, 6.toShort) // mini shift
    hb.putInt(44, nFatSectors)
    hb.putInt(48, dirStart)
    hb.putInt(56, 4096) // mini cutoff
    hb.putInt(60, if (nMiniFatSectors > 0) miniFatStartSector else EndOfChain)
    hb.putInt(64, nMiniFatSectors)
    hb.putInt(68, EndOfChain) // no DIFAT chain
    hb.putInt(72, 0)
    (0 until 109).foreach(i =>
      hb.putInt(76 + i * 4, if (i < nFatSectors) fatStartSector + i else FreeSect))

    def sectorOff(s: Int): Int = (s + 1) * 512
    System.arraycopy(dirBytes, 0, out, sectorOff(dirStart), dirBytes.length)
    val mfBytes = new Array[Byte](nMiniFatSectors * 512)
    val mfb = ByteBuffer.wrap(mfBytes).order(ByteOrder.LITTLE_ENDIAN)
    java.util.Arrays.fill(mfBytes, 0xFF.toByte) // free
    miniChainLinks.zipWithIndex.foreach { case (l, i) => mfb.putInt(i * 4, l) }
    System.arraycopy(mfBytes, 0, out, sectorOff(miniFatStartSector), mfBytes.length)
    System.arraycopy(miniBytes, 0, out, sectorOff(miniStreamStartSector), miniBytes.length)
    val fatBytes = new Array[Byte](nFatSectors * 512)
    val fb = ByteBuffer.wrap(fatBytes).order(ByteOrder.LITTLE_ENDIAN)
    fat.zipWithIndex.foreach { case (v, i) => fb.putInt(i * 4, v) }
    System.arraycopy(fatBytes, 0, out, sectorOff(fatStartSector), fatBytes.length)
    out
  }

  /** Outlook message: UTF-16 subject/sender props, cp1252 PT_STRING8 text body
    * (odd doc_id — exercises the codepage property), UTF-8 PT_BINARY HTML body
    * (even doc_id), two recipient storages. */
  def msg(d: Doc): Array[Byte] = {
    def u16(s: String): Array[Byte] = s.getBytes(UTF_16LE)
    val propsStream = {
      // 32-byte header + one PT_LONG entry: PR_MESSAGE_CODEPAGE = 1252
      val b = ByteBuffer.allocate(48).order(ByteOrder.LITTLE_ENDIAN)
      b.position(32)
      b.putInt(0x3FFD0003) // tag
      b.putInt(0x00000006) // flags (readable|writable)
      b.putInt(1252); b.putInt(0)
      b.array()
    }
    val body: (String, Array[Byte]) =
      if (d.docId % 2 == 0) {
        val html = s"<html><body><h1>${xmlEscape(d.t3)}</h1>" +
          d.ps.map(p => s"<p>${xmlEscape(p)}</p>").mkString + "</body></html>"
        "__substg1.0_10130102" -> html.getBytes(UTF_8)
      } else {
        val text = "café " + d.ps.mkString("\n\n")
        "__substg1.0_1000001E" -> text.getBytes("windows-1252")
      }
    cfb(Seq(
      "__properties_version1.0" -> propsStream,
      "__substg1.0_0037001F" -> u16(s"Update ${d.t3}"),
      "__substg1.0_0C1A001F" -> u16("Alice"),
      "__substg1.0_0C1F001F" -> u16(s"${d.source}@example.com"),
      body,
      "__recip_version1.0_#00000000/__substg1.0_3001001F" -> u16("Bob"),
      "__recip_version1.0_#00000000/__substg1.0_39FE001F" -> u16("bob@example.com"),
      "__recip_version1.0_#00000001/__substg1.0_39FE001F" -> u16("carol@example.com")))
  }

  // ------------------------------------------------------------------ images

  /** Minimal real PNG header: signature + IHDR with the given dims, RGBA. */
  def png(w: Int, h: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + 4 + 4 + 13).order(ByteOrder.BIG_ENDIAN)
    b.put(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    b.putInt(13).put("IHDR".getBytes(ISO_8859_1))
    b.putInt(w).putInt(h)
    b.put(8.toByte).put(6.toByte) // bit depth 8, color type 6 (rgba)
    b.put(0.toByte).put(0.toByte).put(0.toByte)
    b.array()
  }

  /** GIF89a logical screen descriptor with LE16 dims. */
  def gif(w: Int, h: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(6 + 7).order(ByteOrder.LITTLE_ENDIAN)
    b.put("GIF89a".getBytes(ISO_8859_1))
    b.putShort(w.toShort).putShort(h.toShort)
    b.put(0.toByte).put(0.toByte).put(0.toByte)
    b.array()
  }

  /** Minimal real JPEG: SOI, APP0/JFIF, SOF0 (8-bit, 3 components) carrying the
    * dims, EOI — the exact segment walk `jpegDims` performs. */
  def jpeg(w: Int, h: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(2 + 18 + 19 + 2).order(ByteOrder.BIG_ENDIAN)
    b.put(0xFF.toByte).put(0xD8.toByte) // SOI
    b.put(0xFF.toByte).put(0xE0.toByte).putShort(16) // APP0 len 16
    b.put("JFIF".getBytes(ISO_8859_1)).put(0.toByte)
    b.put(1.toByte).put(1.toByte) // version 1.1
    b.put(0.toByte) // units
    b.putShort(1).putShort(1) // density
    b.put(0.toByte).put(0.toByte) // thumbnail
    b.put(0xFF.toByte).put(0xC0.toByte).putShort(17) // SOF0 len 8+3*3
    b.put(8.toByte) // precision
    b.putShort(h.toShort).putShort(w.toShort)
    b.put(3.toByte) // n components
    for (c <- 1 to 3) { b.put(c.toByte).put(0x11.toByte).put(0.toByte) }
    b.put(0xFF.toByte).put(0xD9.toByte) // EOI
    b.array()
  }

  /** BMP: "BM" file header + BITMAPINFOHEADER (dib size 40) with LE32 dims and
    * 24 bpp; no pixel data (header-only, like the other image payloads). */
  def bmp(w: Int, h: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(14 + 40).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
    b.putInt(54) // file size (header-only)
    b.putShort(0).putShort(0)
    b.putInt(54) // pixel-array offset
    b.putInt(40) // DIB header size
    b.putInt(w).putInt(h)
    b.putShort(1) // planes
    b.putShort(24) // bpp
    b.putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
    b.array()
  }

  /** TIFF in either byte order: header + one IFD with ImageWidth(256),
    * ImageLength(257), SamplesPerPixel(277) SHORT entries. */
  def tiff(w: Int, h: Int, bigEndian: Boolean): Array[Byte] = {
    val order = if (bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
    val b = ByteBuffer.allocate(8 + 2 + 3 * 12 + 4).order(order)
    if (bigEndian) b.put('M'.toByte).put('M'.toByte).putShort(42)
    else b.put('I'.toByte).put('I'.toByte).putShort(42)
    b.putInt(8) // IFD offset
    b.putShort(3) // entry count
    def entry(tag: Int, value: Int): Unit = {
      b.putShort(tag.toShort).putShort(3 /* SHORT */).putInt(1)
      b.putShort(value.toShort).putShort(0) // left-justified in the value field
    }
    entry(256, w); entry(257, h); entry(277, 3)
    b.putInt(0) // next-IFD terminator
    b.array()
  }
}
