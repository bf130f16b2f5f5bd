package graft.sources

import scala.collection.mutable

import graft.sources.HtmlPartitioner.RawPara

/**
 * The light-weight per-format parsers sharing the [[RawPara]] output shape:
 * CSV/TSV (`partition/csv.py:23-138`, `tsv.py`), RFC-822 email
 * (`partition/email.py:31-441`), Markdown (`partition/md.py` — md → HTML →
 * HTML partitioner), XML leaf text (`partition/xml.py:25`), plus the
 * `partition()` auto-router (`partition/auto.py:30-300`).
 *
 * Each is a pure `bytes/str -> Seq[RawPara]` function — executed per file inside a
 * `flatMap` over a `binaryFile` scan; no shuffle, embarrassingly parallel.
 */
object Partitioners {

  // ------------------------------------------------------------------- CSV / TSV

  /** Sniff delimiter among `,;|` (`csv.py:119-138`): the candidate with a
    * consistent positive per-line count across sample lines wins. */
  def sniffDelimiter(text: String): Option[Char] = {
    val lines = text.linesIterator.filter(_.nonEmpty).take(10).toVector
    if (lines.size < 1) return Some(',')
    Seq(',', ';', '|').find { d =>
      val counts = lines.map(countUnquoted(_, d))
      counts.head > 0 && counts.distinct.size == 1
    }
  }

  private def countUnquoted(line: String, d: Char): Int = {
    var n = 0; var inQ = false
    line.foreach {
      case '"' => inQ = !inQ
      case c if c == d && !inQ => n += 1
      case _ => ()
    }
    n
  }

  /** RFC-4180-ish line parse honoring quotes and escaped quotes. */
  def parseCsvLine(line: String, d: Char): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { cur.append('"'); i += 1 }
          else inQ = false
        } else cur.append(c)
      } else c match {
        case '"' => inQ = true
        case `d` => out += cur.toString; cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    out += cur.toString
    out.result()
  }

  /** `HtmlTable.text` — `common/html_table.py:139-146`: the clean concatenated
    * table text, every non-empty whitespace-normalized cell joined by one space
    * (rows are NOT newline-separated). */
  def tableText(matrix: Seq[Seq[String]]): String =
    matrix.flatten.map(HtmlPartitioner.normalizeWs).filter(_.nonEmpty).mkString(" ")

  /**
   * Legacy pandas-style table render — byte-compatible with
   * `DataFrame.to_html(index=False, header=header, na_rep="")`, the form older
   * reference versions stored in `text_as_html` (e.g. the Sharepoint
   * `stanley-cups.xlsx.json` ingest golden) before `HtmlTable` compactification
   * (`common/html_table.py:83-96`) became the default. Offered as an optional
   * render style for wire-compat with archives written by those versions.
   */
  def pandasTableHtml(matrix: Seq[Seq[String]], header: Boolean = false): String = {
    def esc(s: String) =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val sb = new StringBuilder("<table border=\"1\" class=\"dataframe\">\n")
    val (head, body) = if (header && matrix.nonEmpty) (matrix.take(1), matrix.drop(1))
      else (Nil, matrix)
    head.foreach { row =>
      sb.append("  <thead>\n    <tr style=\"text-align: right;\">\n")
      row.foreach(c => sb.append("      <th>").append(esc(c)).append("</th>\n"))
      sb.append("    </tr>\n  </thead>\n")
    }
    sb.append("  <tbody>\n")
    body.foreach { row =>
      sb.append("    <tr>\n")
      row.foreach(c => sb.append("      <td>").append(esc(c)).append("</td>\n"))
      sb.append("    </tr>\n")
    }
    sb.append("  </tbody>\n</table>")
    sb.toString
  }

  /** `htmlify_matrix_of_cell_texts` — `common/html_table.py:19-48`. `escapeQuotes`
    * mirrors the DOCX/PPTX matrix path (Python `html.escape`, quote=True); the
    * CSV/TSV/XLSX path re-serializes through lxml, which leaves quotes raw. */
  def htmlifyMatrix(matrix: Seq[Seq[String]], escapeQuotes: Boolean = false): String = {
    if (matrix.isEmpty) return ""
    val trs = matrix.filter(_.nonEmpty).map { row =>
      "<tr>" + row.map { s =>
        val esc0 = graft.operators.Chunker.TableChunker.escapeHtml(s)
        val esc = if (escapeQuotes) esc0.replace("\"", "&quot;").replace("'", "&#x27;") else esc0
        // limit -1: Python's split keeps trailing empties, so "x\n" -> "x<br/>"
        val cell = HtmlPartitioner.normalizeWs(esc.split("\n", -1).mkString("<br/>"))
        if (cell.isEmpty) "<td/>" else s"<td>$cell</td>"
      }.mkString + "</tr>"
    }
    s"<table>${trs.mkString}</table>"
  }

  /** Whole CSV/TSV file → one `Table` element with `text_as_html`
    * (`csv.py:23-78`); text is the `HtmlTable.text` space-join. `pandasHtml`
    * selects the legacy pandas render for wire-compat with old archives. */
  def partitionCsv(text: String, delimiter: Option[Char] = None,
      pandasHtml: Boolean = false,
      inferTableStructure: Boolean = true,
      includeHeader: Boolean = false): Seq[RawPara] = {
    val d = delimiter.orElse(sniffDelimiter(text)).getOrElse(',')
    val raw = text.linesIterator.filter(_.nonEmpty).map(parseCsvLine(_, d)).toVector
    if (raw.isEmpty) return Nil
    // `include_header=True` reads the first line as pandas column labels —
    // an EMPTY label becomes `Unnamed: <positional index>` — and the labels
    // participate in text and text_as_html (`csv.py:28-68`,
    // `test_csv.py:204-211`); the default drops nothing but treats every
    // line as data (pandas `header=None`)
    val rows =
      if (!includeHeader) raw
      else raw.head.zipWithIndex.map { case (c, i) =>
        if (c.trim.isEmpty) s"Unnamed: $i" else c
      } +: raw.tail
    // `infer_table_structure=False` drops text_as_html (`partition/csv.py:64-99`)
    val html =
      if (!inferTableStructure) None
      else Some(if (pandasHtml) pandasTableHtml(rows) else htmlifyMatrix(rows))
    val txt = tableText(rows)
    if (txt.isEmpty) Nil
    else Seq(RawPara(txt, Some("Table"), textAsHtml = html))
  }

  def partitionTsv(text: String, inferTableStructure: Boolean = true): Seq[RawPara] =
    partitionCsv(text, Some('\t'), inferTableStructure = inferTableStructure)

  // ------------------------------------------------------------------- email (EML)

  final case class EmailMeta(
      sentFrom: Seq[String], sentTo: Seq[String], cc: Seq[String], bcc: Seq[String],
      subject: Option[String], messageId: Option[String], date: Option[String])

  /** Unfold RFC-5322 headers (continuation lines start with whitespace). */
  private def parseHeaders(head: String): Seq[(String, String)] = {
    val out = mutable.ArrayBuffer.empty[(String, String)]
    head.linesIterator.foreach { line =>
      if (line.nonEmpty && (line.head == ' ' || line.head == '\t') && out.nonEmpty) {
        val (k, v) = out.last
        out(out.length - 1) = (k, v + " " + line.trim)
      } else {
        val i = line.indexOf(':')
        if (i > 0) out += ((line.substring(0, i).trim, line.substring(i + 1).trim))
      }
    }
    out.toSeq
  }

  /** Resolve a MIME `charset=` parameter, falling back to UTF-8 — a base64 or
    * quoted-printable part in e.g. windows-1255 or iso-8859-1 garbles when
    * decoded blindly as UTF-8 (`email.py` honors the part charset). */
  private def partCharset(name: Option[String]): java.nio.charset.Charset =
    name.flatMap(n => scala.util.Try(java.nio.charset.Charset.forName(n.trim)).toOption)
      .getOrElse(java.nio.charset.StandardCharsets.UTF_8)

  private def decodeBody(body: String, encoding: String,
      charset: Option[String] = None): String = {
    val cs = partCharset(charset)
    encoding.toLowerCase match {
      case "base64" =>
        scala.util.Try(new String(
          java.util.Base64.getMimeDecoder.decode(body.replaceAll("\\s", "")), cs))
          .getOrElse(body)
      case "quoted-printable" => new String(decodeQuotedPrintableBytes(body), cs)
      case _ => body
    }
  }

  def decodeQuotedPrintableBytes(s: String): Array[Byte] =
    quopriDecode(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** RFC-2047 Q-run decode — `email._encoded_words.decode_q`, which is a
    * DIFFERENT kernel from the body's a2b_qp: a plain regex substitution of
    * `=HH` (exactly two hex digits) with the byte. Everything else — a
    * trailing `=`, `==`, invalid escapes — stays literal (`'==41'` is
    * `'=A'` here but `'=41'` under a2b_qp; a trailing `'='` survives here
    * but is dropped there). Headers and bodies must not share a decoder. */
  def decodeQHeader(s: String): Array[Byte] = {
    @inline def isHex(c: Char): Boolean =
      (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F') || (c >= 'a' && c <= 'f')
    @inline def hexVal(c: Char): Int =
      if (c <= '9') c - '0' else (c | 0x20) - 'a' + 10
    val out = mutable.ArrayBuffer.empty[Byte]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '=' && i + 3 <= s.length && isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        out += ((hexVal(s.charAt(i + 1)) << 4) | hexVal(s.charAt(i + 2))).toByte
        i += 3
      } else {
        out ++= c.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        i += 1
      }
    }
    out.toArray
  }

  /** `binascii.a2b_qp(data, header=False)` — the kernel under Python's
    * `quopri.decodestring` and the email package's QP body decode. The edge
    * semantics matter: a trailing `=` is DROPPED, `==` emits one `=` without
    * consuming what follows (so `==AB` is `=AB`, not `=\xAB`), `=` before
    * CR/LF swallows the soft line break through the next LF, and `=` before
    * anything that is not two hex digits emits `=` and re-examines the next
    * byte. */
  def quopriDecode(data: Array[Byte]): Array[Byte] = {
    @inline def isHex(b: Byte): Boolean =
      (b >= '0' && b <= '9') || (b >= 'A' && b <= 'F') || (b >= 'a' && b <= 'f')
    @inline def hexVal(b: Byte): Int =
      if (b <= '9') b - '0' else (b | 0x20) - 'a' + 10
    val out = mutable.ArrayBuffer.empty[Byte]
    var i = 0
    val n = data.length
    while (i < n) {
      val c = data(i)
      if (c == '=') {
        i += 1
        if (i >= n) ()                       // trailing '=' dropped
        else if (data(i) == '\n') i += 1     // soft break
        else if (data(i) == '\r') {          // soft break, CRLF or bare CR+junk
          while (i < n && data(i) != '\n') i += 1
          if (i < n) i += 1
        } else if (data(i) == '=') { out += '='.toByte; i += 1 }
        else if (i + 1 < n && isHex(data(i)) && isHex(data(i + 1))) {
          out += ((hexVal(data(i)) << 4) | hexVal(data(i + 1))).toByte
          i += 2
        } else out += '='.toByte             // invalid escape: '=' only, re-examine next
      } else { out += c; i += 1 }
    }
    out.toArray
  }

  def decodeQuotedPrintable(s: String): String =
    new String(decodeQuotedPrintableBytes(s), java.nio.charset.StandardCharsets.UTF_8)

  private final case class MimePart(headers: Seq[(String, String)], body: String) {
    def header(name: String): Option[String] =
      headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
    def contentType: String =
      header("Content-Type").map(_.split(";").head.trim.toLowerCase).getOrElse("text/plain")
    def boundary: Option[String] =
      header("Content-Type").flatMap { ct =>
        "boundary=\"?([^\";]+)\"?".r.findFirstMatchIn(ct).map(_.group(1))
      }
    def charsetParam: Option[String] =
      header("Content-Type").flatMap { ct =>
        "(?i)charset=\"?([^\";]+)\"?".r.findFirstMatchIn(ct).map(_.group(1))
      }
    def decoded: String =
      decodeBody(body, header("Content-Transfer-Encoding").getOrElse("7bit"),
        charsetParam)
  }

  private def parsePart(raw: String): MimePart = {
    val sep = if (raw.contains("\r\n\r\n")) "\r\n\r\n" else "\n\n"
    val i = raw.indexOf(sep)
    if (i < 0) MimePart(parseHeaders(raw), "")
    else MimePart(parseHeaders(raw.substring(0, i)), raw.substring(i + sep.length))
  }

  private def flattenParts(p: MimePart): Seq[MimePart] =
    p.boundary match {
      case Some(b) =>
        p.body.split(java.util.regex.Pattern.quote("--" + b)).toSeq
          .drop(1).filter(s => !s.trim.startsWith("--") || s.trim.length > 2)
          .map(_.dropWhile(c => c == '\r' || c == '\n'))
          .filter(_.trim.nonEmpty)
          .filterNot(_.trim == "--")
          .map(parsePart)
          .map { child =>
            // RFC 2046 §5.1.5: within multipart/digest the DEFAULT part
            // content type is message/rfc822, not text/plain — a digest
            // part without an explicit Content-Type is a message
            if (p.contentType == "multipart/digest" &&
                child.header("Content-Type").isEmpty)
              child.copy(headers =
                child.headers :+ ("Content-Type" -> "message/rfc822"))
            else child
          }
          .flatMap(flattenParts)
      case None => Seq(p)
    }

  private val EncodedWordRe = """=\?([^?]+)\?([BbQq])\?([^?]*)\?=""".r

  /** RFC-2047 encoded-word decoding for header values (`email.header` does
    * this inside Python's stdlib parser): `=?charset?B?...?=` base64 and
    * `=?charset?Q?...?=` quoted-printable runs decode through the named
    * charset; whitespace BETWEEN adjacent encoded words is dropped (RFC 2047
    * §6.2); undecodable runs stay verbatim. */
  def decodeEncodedWords(value: String): String = {
    // collapse whitespace between adjacent encoded words first
    val joined = """\?=\s+=\?""".r.replaceAllIn(value, "?==?")
    @inline def isHex(c: Char): Boolean =
      (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F') || (c >= 'a' && c <= 'f')
    EncodedWordRe.replaceAllIn(joined, m => {
      val cs = partCharset(Some(m.group(1)))
      val content = m.group(3)
      // stdlib parser quirk (email/_header_value_parser.py get_encoded_word):
      // the raw header is split at the FIRST "?=", so content STARTING with
      // '=' splits inside "?q?=" and fails with a 4-field ValueError — the
      // word stays VERBATIM — unless the '=' opens a "=HH" escape (the
      // parser's hexdigit fixup re-joins exactly that case). '=?utf-8?q?==41?='
      // is verbatim; '=?utf-8?q?=41=?=' decodes to 'A='.
      val verbatim = content.startsWith("=") &&
        !(content.length >= 3 && isHex(content(1)) && isHex(content(2)))
      val decoded =
        if (verbatim) m.matched
        else m.group(2).toUpperCase match {
          case "B" => scala.util.Try(new String(
            java.util.Base64.getMimeDecoder.decode(content), cs)).getOrElse(m.matched)
          case _ => new String(decodeQHeader(content.replace('_', ' ')), cs)
        }
      java.util.regex.Matcher.quoteReplacement(decoded)
    })
  }

  /** `EmailPartitioningContext._sent_date` (`email.py:280-290`): the Date
    * header parsed (RFC-2822 or ISO-8601, the formats that occur in the
    * wild), converted to UTC, ISO-8601 seconds precision; None when absent
    * or unparseable. */
  def sentDateIso(dateHeader: String): Option[String] = {
    import java.time._
    import java.time.format.DateTimeFormatter
    val s = dateHeader.trim
    val parsed: Option[OffsetDateTime] =
      scala.util.Try(OffsetDateTime.parse(s, DateTimeFormatter.RFC_1123_DATE_TIME))
        .orElse(scala.util.Try(OffsetDateTime.parse(s)))
        .orElse(scala.util.Try(Instant.parse(s).atOffset(ZoneOffset.UTC)))
        .orElse(scala.util.Try(
          LocalDateTime.parse(s).atOffset(ZoneOffset.UTC)))
        .toOption
    parsed.map(_.withOffsetSameInstant(ZoneOffset.UTC)
      .truncatedTo(temporal.ChronoUnit.SECONDS)
      .format(DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ssxxx")))
  }

  /**
   * `email.utils.getaddresses` over one decoded header value: split the
   * address list on top-level commas (quoted strings and angle-addrs are
   * atomic), then separate each mailbox into (display name, addr-spec).
   * Display-name outer quotes are removed and `\"`/`\\` unescaped — exactly
   * the state Python's parser hands to `formataddr`.
   */
  private[sources] def parseAddressList(value: String): Seq[(String, String)] = {
    val parts = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQ = false
    var depth = 0
    var i = 0
    while (i < value.length) {
      val c = value.charAt(i)
      c match {
        case '\\' if inQ && i + 1 < value.length =>
          cur.append(c).append(value.charAt(i + 1)); i += 1
        case '"' => inQ = !inQ; cur.append(c)
        case '<' if !inQ => depth += 1; cur.append(c)
        case '>' if !inQ && depth > 0 => depth -= 1; cur.append(c)
        case ',' if !inQ && depth == 0 => parts += cur.toString; cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    parts += cur.toString
    parts.toSeq.map(_.trim).filter(_.nonEmpty).map { mb =>
      val lt = {
        // angle bracket outside any quoted string
        var q = false; var idx = -1; var j = 0
        while (j < mb.length && idx < 0) {
          mb.charAt(j) match {
            case '\\' if q => j += 1
            case '"' => q = !q
            case '<' if !q => idx = j
            case _ => ()
          }
          j += 1
        }
        idx
      }
      if (lt >= 0) {
        val gt = mb.lastIndexOf('>')
        val addr = mb.substring(lt + 1, if (gt > lt) gt else mb.length).trim
        var name = mb.substring(0, lt).trim
        if (name.length >= 2 && name.head == '"' && name.last == '"')
          name = name.substring(1, name.length - 1)
            .replace("\\\"", "\"").replace("\\\\", "\\")
        (name, addr)
      } else ("", mb.trim)
    }
  }

  /** `email.utils.formataddr` — quote ASCII names containing specials
    * (escaping `\` and `"`); RFC-2047-encode non-ASCII names choosing the
    * SHORTER of q/b forms exactly like `Charset('utf-8').header_encode`
    * (quoprimime safe set `-!*+/` + alphanumerics, space as `_`, 3 chars per
    * escaped byte vs `4*ceil(n/3)` for base64; ties go to q). */
  private[sources] def formatAddr(name: String, addr: String): String = {
    if (name.isEmpty) return addr
    if (name.exists(_ > 127)) {
      val bytes = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      def qpSafe(b: Int): Boolean =
        (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || (b >= '0' && b <= '9') ||
          b == '-' || b == '!' || b == '*' || b == '+' || b == '/'
      val qpLen = bytes.map(b => if (qpSafe(b & 0xff) || b == ' ') 1 else 3).sum
      val b64Len = 4 * ((bytes.length + 2) / 3)
      val encoded =
        if (b64Len < qpLen)
          "=?utf-8?b?" + java.util.Base64.getEncoder.encodeToString(bytes) + "?="
        else {
          val sb = new StringBuilder("=?utf-8?q?")
          bytes.foreach { b =>
            val ub = b & 0xff
            if (ub == ' ') sb.append('_')
            else if (qpSafe(ub)) sb.append(ub.toChar)
            else sb.append(f"=$ub%02X")
          }
          sb.append("?=").toString
        }
      return s"$encoded <$addr>"
    }
    val escaped = name.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case c => c.toString
    }
    val needsQuotes = name.exists("[]\\()<>@,:;\".".contains(_))
    if (needsQuotes) s""""$escaped" <$addr>""" else s"$escaped <$addr>"
  }

  /** Parse the RFC-822 message: headers → [[EmailMeta]], body part preference
    * html > plain (`email.py:152-160`), delegate body to the HTML or text path. */
  def partitionEmail(raw: String,
      contentSource: String = "text/html"): (EmailMeta, Seq[RawPara]) = {
    val msg = parsePart(raw)
    // `policy.default` decodes encoded words on access; `getaddresses` +
    // `formataddr` then re-parse and re-render each mailbox (email.py:125-147,
    // 177-182, 268-272)
    def addrs(name: String): Seq[String] =
      msg.header(name).toSeq
        .flatMap(v => parseAddressList(decodeEncodedWords(v)))
        .map { case (n, a) => formatAddr(n, a) }
    val meta = EmailMeta(
      sentFrom = addrs("From"),
      sentTo = addrs("To"),
      cc = addrs("Cc"),
      bcc = addrs("Bcc"),
      // `if not subject: return None` (email.py:258-263) — an empty
      // Subject: header yields None, not the empty string
      subject = msg.header("Subject").map(decodeEncodedWords).filter(_.nonEmpty),
      messageId = msg.header("Message-ID").map(_.strip.stripPrefix("<").stripSuffix(">")),
      date = msg.header("Date"))

    val parts = flattenParts(msg)
    val pref =
      if (contentSource == "text/plain") Seq("text/plain", "text/html")
      else Seq("text/html", "text/plain")
    val bodyPart = pref.iterator
      .flatMap(ct => parts.find(p => p.contentType == ct &&
        !p.header("Content-Disposition").exists(_.toLowerCase.startsWith("attachment"))))
      .nextOption()

    val paras = bodyPart match {
      case Some(p) if p.contentType == "text/html" =>
        HtmlPartitioner.partition(p.decoded)
      case Some(p) =>
        // plain body routes through partition_text -> TEXT cascade (email.py:152-160)
        TextSource.splitParagraphs(p.decoded).map(t => RawPara(t, None, classifier = "text"))
      case None => Nil
    }
    (meta, paras)
  }

  /** Attachment parts (filename + decoded content) for the recursion union
    * (`email.py:372-441`). Besides Content-Disposition:attachment parts,
    * `message/rfc822` parts count as attachments even WITHOUT a disposition —
    * Python's `iter_attachments()` yields every part of a multipart/digest
    * (none is a text/html|plain body candidate), and the reference partitions
    * each digest message recursively; filenames are synthesized positionally
    * since digest parts carry none. */
  def emailAttachments(raw: String): Seq[(String, String)] = {
    var nMessages = 0 // numbered over the rfc822 parts, not all MIME parts
    flattenParts(parsePart(raw)).flatMap { p =>
      val declared = p.header("Content-Disposition")
        .filter(_.toLowerCase.startsWith("attachment")).flatMap { cd =>
          "filename=\"?([^\";]+)\"?".r.findFirstMatchIn(cd).map(_.group(1))
        }
      val embeddedMessage =
        if (declared.isEmpty && p.contentType == "message/rfc822") {
          nMessages += 1
          Some(s"embedded-message-$nMessages.eml")
        } else None
      declared.orElse(embeddedMessage).map(fn => (fn, p.decoded))
    }
  }

  // ------------------------------------------------------------------- markdown

  /** Markdown → HTML (commonmark subset) → HTML partitioner (`partition/md.py:48`). */
  def markdownToHtml(md: String): String = {
    val out = new StringBuilder("<html><body>")
    val lines = md.split("\r?\n", -1)
    var i = 0
    var inCode = false
    val code = new StringBuilder
    val para = mutable.ArrayBuffer.empty[String]
    var listOpen = false
    def esc(s: String) = graft.operators.Chunker.TableChunker.escapeHtml(s)
    def inline(s: String): String = {
      var t = esc(s)
      t = "\\*\\*([^*]+)\\*\\*".r.replaceAllIn(t, m => s"<b>${m.group(1)}</b>")
      t = "(?<!\\*)\\*([^*]+)\\*(?!\\*)".r.replaceAllIn(t, m => s"<i>${m.group(1)}</i>")
      t = "`([^`]+)`".r.replaceAllIn(t, m => s"<code>${m.group(1)}</code>")
      t = "\\[([^\\]]+)\\]\\(([^)]+)\\)".r.replaceAllIn(t,
        m => s"""<a href="${m.group(2)}">${m.group(1)}</a>""")
      t
    }
    def flushPara(): Unit = if (para.nonEmpty) {
      out.append("<p>").append(inline(para.mkString(" "))).append("</p>")
      para.clear()
    }
    def closeList(): Unit = if (listOpen) { out.append("</ul>"); listOpen = false }
    // pipe tables (the `tables` extension, on by default — `partition/md.py`):
    // a header row with `|`, a `---|---` separator of equal arity, body rows
    def splitRow(s: String): Seq[String] = {
      var t = s.trim
      if (t.startsWith("|")) t = t.substring(1)
      if (t.endsWith("|")) t = t.dropRight(1)
      t.split("\\|", -1).map(_.trim).toSeq
    }
    def isTableSep(s: String): Boolean = s.contains("-") && {
      val cells = splitRow(s)
      cells.nonEmpty && cells.forall(_.matches(":?-+:?"))
    }
    val h = "^(#{1,6})\\s+(.*)$".r
    while (i < lines.length) {
      val line = lines(i)
      if (inCode) {
        if (line.trim.startsWith("```")) {
          out.append("<pre>").append(esc(code.toString)).append("</pre>")
          code.clear(); inCode = false
        } else code.append(line).append("\n")
      } else if (line.trim.startsWith("```")) {
        flushPara(); closeList(); inCode = true
      } else line match {
        case h(hashes, rest) =>
          flushPara(); closeList()
          val n = hashes.length
          out.append(s"<h$n>").append(inline(rest.trim)).append(s"</h$n>")
        case l if l.matches("^\\s*[-*+]\\s+.*") =>
          flushPara()
          if (!listOpen) { out.append("<ul>"); listOpen = true }
          out.append("<li>").append(inline(l.replaceFirst("^\\s*[-*+]\\s+", ""))).append("</li>")
        case l if l.matches("^\\s*\\d+\\.\\s+.*") =>
          flushPara()
          if (!listOpen) { out.append("<ul>"); listOpen = true }
          out.append("<li>").append(inline(l.replaceFirst("^\\s*\\d+\\.\\s+", ""))).append("</li>")
        case l if l.contains("|") && i + 1 < lines.length && isTableSep(lines(i + 1)) &&
          splitRow(l).size == splitRow(lines(i + 1)).size =>
          flushPara(); closeList()
          out.append("<table><thead><tr>")
          splitRow(l).foreach(c => out.append("<th>").append(inline(c)).append("</th>"))
          out.append("</tr></thead><tbody>")
          i += 1 // the separator line
          while (i + 1 < lines.length && lines(i + 1).contains("|") &&
            lines(i + 1).trim.nonEmpty) {
            i += 1
            out.append("<tr>")
            splitRow(lines(i)).foreach(c =>
              out.append("<td>").append(inline(c)).append("</td>"))
            out.append("</tr>")
          }
          out.append("</tbody></table>")
        case l if l.trim.isEmpty => flushPara(); closeList()
        case l => closeList(); para += l.trim
      }
      i += 1
    }
    if (inCode) out.append("<pre>").append(esc(code.toString)).append("</pre>")
    flushPara(); closeList()
    out.append("</body></html>").toString
  }

  def partitionMd(md: String): Seq[RawPara] =
    HtmlPartitioner.partition(markdownToHtml(md))

  // ------------------------------------------------------------------- xml

  /**
   * `partition_xml(xml_keep_tags=False)` — `partition/xml.py:25-129`. The
   * reference iterparses with end events and yields each element's LEADING
   * text (`element.text` — text before the first child element) when
   * non-blank, RAW (no whitespace normalization); tails after child elements
   * are never emitted, and an element's children all end (and so yield)
   * before the element itself. Each yielded string classifies via
   * `element_from_text` = the text cascade (`xml.py:82-84`).
   */
  def partitionXml(xml: String): Seq[RawPara] = {
    val texts = mutable.ArrayBuffer.empty[String]
    def walk(e: HtmlPartitioner.HElem): Unit = {
      e.children.foreach { case c: HtmlPartitioner.HElem => walk(c); case _ => () }
      val leading = e.children.iterator
        .takeWhile(_.isInstanceOf[HtmlPartitioner.HText])
        .collect { case HtmlPartitioner.HText(s) => s }
        .mkString
      if (leading.trim.nonEmpty) texts += leading
    }
    walk(HtmlPartitioner.parse(xml))
    texts.toSeq.map(t => RawPara(t, None, classifier = "text"))
  }

  /** `partition_xml(xml_keep_tags=True)` — `xml.py:62-71`: the whole decoded
    * document as ONE untyped `Text` element, markup intact. */
  def partitionXmlKeepTags(xml: String): Seq[RawPara] =
    Seq(RawPara(xml, Some("UncategorizedText"), classifier = "text"))

  // ------------------------------------------------------------------- auto router

  /** `decide_table_extraction` (`auto.py:323-338`): infer table structure for
    * a filetype unless its name is listed in `skip_infer_table_types` (pdf
    * additionally honors the deprecated `pdf_infer_table_structure=True`
    * override). */
  def decideTableExtraction(filetype: FileType,
      skipInferTableTypes: Seq[String],
      pdfInferTableStructure: Boolean = false): Boolean = {
    val docType = filetype.name.toLowerCase
    if (docType == "pdf")
      pdfInferTableStructure || !skipInferTableTypes.contains(docType)
    else !skipInferTableTypes.contains(docType)
  }

  /** The `partition()` default (`auto.py:41`). */
  val DefaultSkipInferTableTypes: Seq[String] = Seq("pdf", "jpg", "png", "heic")

  /** `partition()` — detect + route (`partition/auto.py:30-300`). Formats whose
    * parsers need external tools report `partitionerAvailable=false` upstream. */
  /** `UnsupportedFileFormatError` (`partition/common/__init__.py`, raised
    * `auto.py:364-366`) — the strict router's unpartitionable-type signal. */
  final class UnsupportedFileFormatError(message: String)
    extends IllegalArgumentException(message)

  /**
   * The `metadata.filetype` value `partition()` records (`auto.py:204-208`),
   * applied AFTER the file-specific partitioner ran — it unconditionally
   * overwrites anything that partitioner set: a caller-supplied content type
   * wins when it maps to a known type (recorded as that type's CANONICAL
   * mime, not the alias as supplied), an unrecognized content type records
   * NULL, and only an absent one defers to the detected type's mime.
   */
  def recordedFiletype(contentType: Option[String],
      detected: FileType): Option[String] = contentType match {
    case Some(ct) => FileType.fromMimeType(ct).map(_.mimeType)
    case None => Some(detected.mimeType)
  }

  def partitionAuto(filename: String, content: Array[Byte],
      contentType: Option[String] = None,
      skipInferTableTypes: Seq[String] = DefaultSkipInferTableTypes,
      pdfInferTableStructure: Boolean = false,
      startingPageNumber: Int = 1,
      strict: Boolean = false,
      encoding: Option[String] = None): (FileType, Seq[RawPara]) = {
    val ft = DetectFiletype.detect(filename, content, contentType)
    // the reference raises for unpartitionable types (auto.py:364-366); a
    // distributed sweep usually prefers skip-and-continue, so raising is
    // opt-in via `strict` (an EMPTY file partitions to zero elements either
    // way, matching partition() on an empty file)
    if (strict && ft != FileType.Empty && !graft.Doctor.isPartitionable(ft))
      throw new UnsupportedFileFormatError(
        s"Partitioning is not supported for the FileType.${ft.name.toUpperCase} file type.")
    val inferTables = decideTableExtraction(ft, skipInferTableTypes, pdfInferTableStructure)
    graft.operators.Registries.partitioner(ft) match {
      case Some(custom) => return (ft, custom(content))
      case None => ()
    }
    // encoding-aware decode (BOM / UTF-16 / Latin-1 fallback) — a blind UTF-8
    // read garbles wide text (`file_utils/encoding.py`); a caller-supplied
    // encoding decodes STRICTLY and raises on mismatch, the `read_txt_file`
    // filename branch (`encoding.py:118-133`)
    val text = encoding match {
      case Some(e) => Encodings.decodeTextStrict(content, e)
      case None => Encodings.decodeText(content)
    }
    val paras = try { ft match {
      case FileType.Txt =>
        TextSource.splitParagraphs(text).map(t => RawPara(t, None, classifier = "text"))
      case FileType.Html => HtmlPartitioner.partition(text)
      case FileType.Csv => partitionCsv(text, inferTableStructure = inferTables)
      case FileType.Tsv => partitionTsv(text, inferTableStructure = inferTables)
      case FileType.Md => partitionMd(text)
      case FileType.Xml => partitionXml(text)
      case FileType.Eml => partitionEmail(text)._2
      case FileType.Docx => DocxPartitioner.partition(content,
        DocxPartitioner.DocxOptions(inferTableStructure = inferTables,
          startingPageNumber = startingPageNumber))
      case FileType.Xlsx => OoxmlPartitioner.partitionXlsx(content,
        findSubtable = true, includeHeader = false, inferTableStructure = inferTables,
        startingPageNumber = startingPageNumber)
      case FileType.Xls => XlsPartitioner.partitionXls(content,
        inferTableStructure = inferTables, startingPageNumber = startingPageNumber)
      case FileType.Pptx => PptxPartitioner.partition(content,
        PptxPartitioner.PptxOptions(inferTableStructure = inferTables,
          startingPageNumber = startingPageNumber))
      case FileType.Pdf =>
        // per-file strategy resolution (`partition/pdf.py:300-338`): probe
        // complexity, reuse the fast extraction from the extractability probe,
        // then resolve against the REGISTERED model seams — a layout detector
        // makes hi_res real, an OCR agent makes ocr_only real; with neither,
        // fast is the only available path and the router falls back to it.
        import graft.operators.Registries
        val tooComplex = PdfStrategy.isPdfTooComplex(content)
        val extracted =
          if (tooComplex) Nil else PdfPartitioner.partitionPdf(content)
        val deps = PdfStrategy.Deps(
          inference = Registries.layoutDetector.isDefined,
          ocr = Registries.ocrAgent.isDefined)
        PdfStrategy.determineStrategy(PdfStrategy.Auto,
            pdfTextExtractable = extracted.exists(_.text.trim.nonEmpty),
            deps = deps) match {
          case Right(PdfStrategy.Fast) => extracted
          case Right(PdfStrategy.HiRes) =>
            Registries.layoutDetector.toSeq.flatMap(det =>
              PdfHiRes.partitionHiRes(content, det).map(PdfHiRes.toRawPara))
          case Right(PdfStrategy.OcrOnly) =>
            Registries.ocrAgent.toSeq.flatMap(a =>
              PdfHiRes.partitionOcrOnly(content, a).map(PdfHiRes.toRawPara))
          case _ => Nil
        }
      case FileType.Rtf => ConvertedFormats.partitionRtf(text)
      case FileType.Odt => ConvertedFormats.partitionOdt(content)
      case FileType.Epub => ConvertedFormats.partitionEpub(content)
      case FileType.Org => ConvertedFormats.partitionOrg(text)
      case FileType.Rst => ConvertedFormats.partitionRst(text)
      case FileType.Msg => MsgPartitioner.partitionMsg(content)._2
      case FileType.Doc => LegacyOfficePartitioner.partitionDoc(content)
      case FileType.Ppt => LegacyOfficePartitioner.partitionPpt(content)
      case FileType.Json | FileType.Ndjson => Nil // rehydrate path (ElementSink.readNdjson)
      case FileType.Png | FileType.Jpg | FileType.Bmp | FileType.Tiff | FileType.Gif =>
        // header-decode real, OCR kernel stubbed; multipage TIFF numbers
        // pages from starting_page_number
        ImagePartitioner.partitionImage(content,
          graft.operators.Registries.ocrAgent, startingPageNumber)
      case _ => Nil // external-tool formats (pdf hi_res/ocr, heic, audio): pluggable stubs
    } } catch {
      // recognized-but-unprocessable inputs (e.g. an encrypted workbook):
      // partition() propagates the error; a distributed sweep prefers
      // skip-and-continue unless strict
      case e: OoxmlPartitioner.UnprocessableEntityError if !strict => Nil
    }
    (ft, paras)
  }
}
