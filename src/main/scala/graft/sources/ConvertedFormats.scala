package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import scala.collection.mutable

import graft.sources.HtmlPartitioner.RawPara

/**
 * Partitioners for the "converted" formats — RTF, ODT, EPUB, Org, reST — which the
 * reference routes through external converters (pandoc / LibreOffice:
 * `/root/reference/unstructured/partition/epub.py:15`, `org.py:15`, `rst.py:15`,
 * `rtf.py:15`, `odt.py:15,53-120`; converter `file_utils/file_conversion.py:60-82`).
 * Neither tool exists in this environment, so each format gets a NATIVE structural
 * parser emitting the same element shapes the converted-HTML path would produce
 * (headings -> Title with depth, bullets -> ListItem, tables -> Table with an HTML
 * render, prose -> classifier cascade). Parsing is per-file imperative work inside
 * the router's flatMap — embarrassingly parallel, no shuffle.
 */
object ConvertedFormats {

  // --------------------------------------------------------------------------- RTF

  /** Destination groups whose content is control data, not document text. */
  private val RtfSkipDests = Set(
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object", "header",
    "footer", "themedata", "colorschememapping", "listtable", "listoverridetable",
    "latentstyles", "datastore", "generator")

  /**
   * `partition_rtf` — the reference converts via pandoc then partitions the HTML
   * (`partition/rtf.py:15`). Native equivalent: a group/control-word tokenizer that
   * tracks `\outlinelevelN` (heading -> Title), `\trowd`/`\cell`/`\row` (table
   * grid -> Table + HTML), `\'hh` and `\uN` escapes, and destination skipping.
   */
  def partitionRtf(rtf: String): Seq[RawPara] = {
    val out = mutable.ArrayBuffer.empty[RawPara]
    val para = new StringBuilder
    var outlineLevel: Option[Int] = None
    var inTable = false
    val cells = mutable.ArrayBuffer.empty[String]
    val rows = mutable.ArrayBuffer.empty[Vector[String]]
    var skipDepth = 0 // >0 while inside a skipped destination group
    var depth = 0
    var skipUntilDepth = -1

    def flushPara(): Unit = {
      val text = HtmlPartitioner.normalizeWs(para.toString)
      para.clear()
      if (text.nonEmpty) {
        if (inTable) { cells += text }
        else {
          flushTable()
          val tpe = outlineLevel.map(_ => "Title")
          out += RawPara(text, tpe, outlineLevel, classifier = "text")
        }
      }
      outlineLevel = None
    }

    def flushTable(): Unit = if (rows.nonEmpty) {
      val matrix = rows.toVector
      val text = Partitioners.tableText(matrix)
      if (text.nonEmpty)
        out += RawPara(text, Some("Table"),
          textAsHtml = Some(Partitioners.htmlifyMatrix(matrix)))
      rows.clear()
    }

    val n = rtf.length
    var i = 0
    while (i < n) {
      val c = rtf.charAt(i)
      if (c == '{') { depth += 1; i += 1 }
      else if (c == '}') {
        if (skipUntilDepth >= 0 && depth == skipUntilDepth) skipUntilDepth = -1
        depth -= 1
        i += 1
      } else if (skipUntilDepth >= 0) { i += 1 }
      else if (c == '\\') {
        if (i + 1 < n && rtf.charAt(i + 1) == '\'') {
          // \'hh — ANSI byte escape
          val hex = rtf.substring(i + 2, math.min(i + 4, n))
          try para.append(Integer.parseInt(hex, 16).toChar)
          catch { case _: NumberFormatException => () }
          i += 4
        } else if (i + 1 < n && rtf.charAt(i + 1) == '*') {
          // \* — optional destination: skip the enclosing group
          skipUntilDepth = depth
          i += 2
        } else if (i + 1 < n && !rtf.charAt(i + 1).isLetter) {
          val sym = rtf.charAt(i + 1)
          if (sym == '~') para.append('\u00A0')
          else if (sym == '\\' || sym == '{' || sym == '}') para.append(sym)
          i += 2
        } else {
          // control word
          var j = i + 1
          while (j < n && rtf.charAt(j).isLetter) j += 1
          val word = rtf.substring(i + 1, j)
          var k = j
          var param = new StringBuilder
          if (k < n && (rtf.charAt(k) == '-' || rtf.charAt(k).isDigit)) {
            param.append(rtf.charAt(k)); k += 1
            while (k < n && rtf.charAt(k).isDigit) { param.append(rtf.charAt(k)); k += 1 }
          }
          if (k < n && rtf.charAt(k) == ' ') k += 1 // delimiter space is eaten
          word match {
            case _ if RtfSkipDests.contains(word) => skipUntilDepth = depth
            case "par" => flushPara()
            case "row" =>
              flushPara() // pending cell text without \cell
              rows += cells.toVector; cells.clear()
            case "cell" =>
              cells += HtmlPartitioner.normalizeWs(para.toString); para.clear()
            case "trowd" => inTable = true
            case "intbl" => inTable = true
            case "pard" => if (!rtf.substring(k, math.min(k + 40, n)).contains("\\intbl"))
              inTable = false
            case "outlinelevel" =>
              outlineLevel = Some(param.toString.toIntOption.getOrElse(0))
            case "tab" => para.append(' ')
            case "line" => para.append('\n')
            case "u" =>
              val cp = param.toString.toIntOption.getOrElse(63)
              para.append((if (cp < 0) cp + 65536 else cp).toChar)
              // RTF spec: one fallback char follows \uN; consume it. Word commonly
              // emits the fallback as a hex escape (\uNNNN followed by \'hh), so a
              // following \'hh is the fallback, not document text.
              if (k + 4 <= n && rtf.charAt(k) == '\\' && rtf.charAt(k + 1) == '\'') k += 4
              else if (k < n && rtf.charAt(k) != '\\' && rtf.charAt(k) != '{' &&
                rtf.charAt(k) != '}') k += 1
            case _ => ()
          }
          i = k
        }
      } else if (c == '\r' || c == '\n') { i += 1 }
      else { para.append(c); i += 1 }
    }
    flushPara()
    flushTable()
    out.toSeq
  }

  // --------------------------------------------------------------------------- ODT

  private def zipMembers(bytes: Array[Byte], wanted: String => Boolean): Seq[(String, String)] = {
    val out = mutable.ArrayBuffer.empty[(String, String)]
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory && wanted(e.getName))
          out += e.getName -> new String(zin.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8)
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.toSeq
  }

  private val OdtBlockRe =
    ("(?s)<text:h[^>]*/>|<text:h[ >].*?</text:h>|<text:p[^>]*/>|<text:p[ >].*?</text:p>|" +
      "<table:table[ >].*?</table:table>|<text:list[ >].*?</text:list>").r
  private val OdtRowRe = "(?s)<table:table-row[ >].*?</table:table-row>".r
  private val OdtCellRe =
    "(?s)<table:table-cell[^>]*/>|<table:table-cell[^>]*>.*?</table:table-cell>".r
  private val OdtListItemRe = "(?s)<text:list-item[ >].*?</text:list-item>".r
  private val OdtOutlineRe = "text:outline-level=\"([0-9]+)\"".r
  private val OdtTagRe = "<[^>]+>".r

  private def odtText(xml: String): String =
    HtmlPartitioner.normalizeWs(HtmlPartitioner.unescape(
      OdtTagRe.replaceAllIn(
        xml.replaceAll("<text:tab[^>]*>", " ").replaceAll("<text:line-break[^>]*>", "\n"),
        "")))

  /**
   * `partition_odt` — the reference converts to DOCX and delegates
   * (`partition/odt.py:15,53-120`); native equivalent parses `content.xml`
   * directly: `text:h` -> Title (outline level -> depth), `text:list` ->
   * ListItems, `table:table` -> Table with HTML, `text:p` -> classifier.
   */
  def partitionOdt(bytes: Array[Byte],
      inferTableStructure: Boolean = true): Seq[RawPara] = {
    val content = zipMembers(bytes, _ == "content.xml").headOption.map(_._2).getOrElse("")
    if (content.isEmpty) return Nil
    val bodyStart = content.indexOf("<office:body>")
    val body = if (bodyStart >= 0) content.substring(bodyStart) else content
    val out = mutable.ArrayBuffer.empty[RawPara]
    OdtBlockRe.findAllIn(body).foreach { block =>
      if (block.startsWith("<table:table")) {
        val rows = OdtRowRe.findAllIn(block).toVector.map { tr =>
          OdtCellRe.findAllIn(tr).toVector.map(odtText)
        }
        val text = Partitioners.tableText(rows)
        if (text.nonEmpty)
          out += RawPara(text, Some("Table"),
            // `infer_table_structure=False` suppresses text_as_html, text
            // stays (`test_odt.py:108-126`, via the docx broker)
            textAsHtml = if (inferTableStructure)
              Some(Partitioners.htmlifyMatrix(rows, escapeQuotes = true))
            else None)
      } else if (block.startsWith("<text:list")) {
        OdtListItemRe.findAllIn(block).foreach { li =>
          val text = odtText(li)
          if (text.nonEmpty) out += RawPara(text, Some("ListItem"), Some(0))
        }
      } else if (block.startsWith("<text:h")) {
        val text = odtText(block)
        val lvl = OdtOutlineRe.findFirstMatchIn(block).map(_.group(1).toInt).getOrElse(1)
        if (text.nonEmpty) out += RawPara(text, Some("Title"), Some(lvl - 1))
      } else {
        // the reference converts ODT -> DOCX and runs partition_docx
        // (_classify_paragraph_to_element, docx.py:435-482): literal-bullet
        // paragraphs become ListItems with the bullet stripped, everything
        // else takes the docx RESTRICTED cascade (no Title guess)
        val text = odtText(block)
        if (text.nonEmpty) {
          if (graft.functions.Cleaners.isBulletedTextStr(text)) {
            val clean = graft.functions.Cleaners.cleanBulletsStr(text).strip
            if (clean.nonEmpty) out += RawPara(clean, Some("ListItem"))
          } else out += RawPara(text, None, classifier = "docx")
        }
      }
    }
    out.toSeq
  }

  // -------------------------------------------------------------------------- EPUB

  private val OpfItemRe = "<item [^>]*/?>".r
  private val AttrRe = "([a-zA-Z:-]+)=\"([^\"]*)\"".r
  private val ItemrefRe = "<itemref [^>]*/?>".r

  /** Percent-decode an href (no '+'-as-space: hrefs are paths, not query strings).
    * Consecutive `%hh` escapes form ONE UTF-8 byte sequence — `ch%C3%A9.xhtml`
    * decodes to `ché.xhtml`, matching the UTF-8-decoded zip member names; a
    * per-byte `toChar` (Latin-1) would miss the lookup and drop the chapter. */
  private[sources] def percentDecode(s: String): String = {
    def hex(c: Char): Boolean =
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
    val sb = new StringBuilder(s.length)
    val bytes = new java.io.ByteArrayOutputStream(8)
    def flush(): Unit = if (bytes.size > 0) {
      sb.append(new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
      bytes.reset()
    }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 3 <= s.length && hex(s.charAt(i + 1)) && hex(s.charAt(i + 2))) {
        bytes.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else { flush(); sb.append(c); i += 1 }
    }
    flush()
    sb.toString
  }

  /** Resolve an OPF-relative href against the OPF directory: percent-decode and
    * collapse `./` / `../` segments so the zip-member lookup matches. */
  private[sources] def resolveHref(dir: String, href: String): String = {
    val segs = (dir + percentDecode(href)).split("/")
    val out = segs.foldLeft(List.empty[String]) {
      case (acc, "" | ".") => acc
      case (_ :: rest, "..") => rest
      case (acc, "..") => acc
      case (acc, seg) => seg :: acc
    }
    out.reverse.mkString("/")
  }

  /**
   * `partition_epub` — reference: pandoc -> HTML -> partition_html
   * (`partition/epub.py:15`). Native equivalent: read the OPF spine for chapter
   * order (fall back to zip order), run each XHTML chapter through the real HTML
   * partitioner, concatenate.
   */
  def partitionEpub(bytes: Array[Byte]): Seq[RawPara] = {
    val members = zipMembers(bytes,
      n => n.endsWith(".opf") || n.endsWith(".xhtml") || n.endsWith(".html") ||
        n.endsWith(".htm") || n.endsWith(".xml"))
    val byName = members.toMap
    val opf = members.find(_._1.endsWith(".opf"))
    val ordered: Seq[String] = opf match {
      case Some((opfName, opfXml)) =>
        val dir = opfName.substring(0, opfName.lastIndexOf('/') + 1)
        val hrefById = OpfItemRe.findAllIn(opfXml).map { item =>
          val attrs = AttrRe.findAllMatchIn(item).map(m => m.group(1) -> m.group(2)).toMap
          attrs.getOrElse("id", "") -> attrs.getOrElse("href", "")
        }.toMap
        val spine = ItemrefRe.findAllIn(opfXml).flatMap { ref =>
          AttrRe.findAllMatchIn(ref).collectFirst {
            case m if m.group(1) == "idref" => m.group(2)
          }
        }.toSeq
        val fromSpine = spine.flatMap(id => hrefById.get(id)).map(resolveHref(dir, _))
          .filter(byName.contains)
        if (fromSpine.nonEmpty) fromSpine
        else members.map(_._1).filter(n =>
          n.endsWith(".xhtml") || n.endsWith(".html") || n.endsWith(".htm"))
      case None =>
        members.map(_._1).filter(n =>
          n.endsWith(".xhtml") || n.endsWith(".html") || n.endsWith(".htm"))
    }
    ordered.flatMap(n => HtmlPartitioner.partition(byName(n)))
  }

  // --------------------------------------------------------------------------- Org

  private val OrgHeadingRe = "^(\\*+)\\s+(.*)$".r
  private val OrgBulletRe = "^\\s*[-+]\\s+(.*)$".r
  private val OrgKeywordRe = "^#\\+.*$".r

  /**
   * `partition_org` — reference: pandoc -> HTML (`partition/org.py:15`). Native
   * structural parser: `*` headings -> Title (depth = stars-1), `-`/`+` bullets ->
   * ListItem, `|`-tables -> Table, `#+` keywords skipped, prose -> classifier.
   */
  def partitionOrg(text: String): Seq[RawPara] = {
    val out = mutable.ArrayBuffer.empty[RawPara]
    val para = mutable.ArrayBuffer.empty[String]
    val tableRows = mutable.ArrayBuffer.empty[Vector[String]]

    def flushPara(): Unit = if (para.nonEmpty) {
      val t = HtmlPartitioner.normalizeWs(para.mkString(" "))
      if (t.nonEmpty) out += RawPara(t, None, classifier = "text")
      para.clear()
    }
    def flushTable(): Unit = if (tableRows.nonEmpty) {
      val matrix = tableRows.toVector
      val t = Partitioners.tableText(matrix)
      if (t.nonEmpty) out += RawPara(t, Some("Table"),
        textAsHtml = Some(Partitioners.htmlifyMatrix(matrix)))
      tableRows.clear()
    }

    text.linesIterator.foreach { line =>
      line match {
        case OrgHeadingRe(stars, title) =>
          flushPara(); flushTable()
          out += RawPara(HtmlPartitioner.normalizeWs(title), Some("Title"),
            Some(stars.length - 1))
        case OrgBulletRe(item) =>
          flushPara(); flushTable()
          out += RawPara(HtmlPartitioner.normalizeWs(item), Some("ListItem"), Some(0))
        case l if l.trim.startsWith("|") =>
          flushPara()
          val cells = l.trim.stripPrefix("|").stripSuffix("|").split("\\|")
            .toVector.map(_.trim)
          if (!cells.forall(c => c.isEmpty || c.forall(ch => ch == '-' || ch == '+')))
            tableRows += cells
        case OrgKeywordRe() => flushPara(); flushTable()
        case l if l.trim.isEmpty => flushPara(); flushTable()
        case l => flushTable(); para += l.trim
      }
    }
    flushPara(); flushTable()
    out.toSeq
  }

  // -------------------------------------------------------------------------- reST

  private val RstAdornmentRe = "^([=\\-`:'\"~^_*+#])\\1*\\s*$".r
  private val RstBulletRe = "^\\s*[-*+]\\s+(.*)$".r
  private val RstNumberedRe = "^\\s*(?:#\\.|[0-9]+[.)])\\s+(.*)$".r
  private val RstDirectiveRe = "^\\.\\..*$".r

  /**
   * `partition_rst` — reference: pandoc -> HTML (`partition/rst.py:15`). Native
   * structural parser: adornment-underlined lines -> Title (depth by first-seen
   * adornment char), bullets/enumerations -> ListItem, `..` directives skipped,
   * prose -> classifier.
   */
  def partitionRst(text: String): Seq[RawPara] = {
    val lines = text.linesIterator.toVector
    val out = mutable.ArrayBuffer.empty[RawPara]
    val para = mutable.ArrayBuffer.empty[String]
    val adornmentDepth = mutable.LinkedHashMap.empty[Char, Int]

    def flushPara(): Unit = if (para.nonEmpty) {
      val t = HtmlPartitioner.normalizeWs(para.mkString(" "))
      if (t.nonEmpty) out += RawPara(t, None, classifier = "text")
      para.clear()
    }

    var i = 0
    while (i < lines.length) {
      val line = lines(i)
      val next = if (i + 1 < lines.length) lines(i + 1) else ""
      line match {
        case _ if line.trim.nonEmpty && !RstAdornmentRe.matches(line) &&
          RstAdornmentRe.matches(next) && next.trim.length >= line.trim.length =>
          flushPara()
          val ch = next.trim.head
          val depth = adornmentDepth.getOrElseUpdate(ch, adornmentDepth.size)
          out += RawPara(HtmlPartitioner.normalizeWs(line), Some("Title"), Some(depth))
          i += 2
        case RstAdornmentRe() => i += 1 // overline / stray rule
        case RstDirectiveRe() => flushPara(); i += 1
        case RstBulletRe(item) =>
          flushPara()
          out += RawPara(HtmlPartitioner.normalizeWs(item), Some("ListItem"), Some(0))
          i += 1
        case RstNumberedRe(item) =>
          flushPara()
          out += RawPara(HtmlPartitioner.normalizeWs(item), Some("ListItem"), Some(0))
          i += 1
        case l if l.trim.isEmpty => flushPara(); i += 1
        case l => para += l.trim; i += 1
      }
    }
    flushPara()
    out.toSeq
  }
}
