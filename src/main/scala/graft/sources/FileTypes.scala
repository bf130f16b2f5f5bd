package graft.sources

/**
 * `FileType` registry + `detect_filetype` —
 * `/root/reference/unstructured/file_utils/model.py:45-556` and
 * `file_utils/filetype.py:67-231`: canonical MIME type, extensions, and the
 * 4-strategy detection chain — (1) binary magic (OLE / ZIP member sniff),
 * (2) asserted content-type, (3) content sniff with text differentiators
 * (JSON/NDJSON/CSV/EML/HTML), (4) extension.
 *
 * Runs per file over the first bytes of a `binaryFile` row — a pure function, no
 * shuffle; at scale the router groups files by detected type so each parser runs
 * over a homogeneous partition.
 */
sealed abstract class FileType(
    val name: String,
    val mimeType: String,
    val extensions: Seq[String],
    val partitionerAvailable: Boolean = true)

object FileType {
  case object Csv extends FileType("csv", "text/csv", Seq(".csv"))
  case object Doc extends FileType("doc", "application/msword", Seq(".doc"))
  case object Docx extends FileType("docx",
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document", Seq(".docx"))
  case object Eml extends FileType("eml", "message/rfc822", Seq(".eml", ".p7s"))
  // canonical mime "application/epub" matches what the reference RECORDS in
  // metadata.filetype (model.py FileType.EPUB's primary mime); the container
  // mimetype member inside the zip stays "application/epub+zip" (EPUB OCF)
  case object Epub extends FileType("epub", "application/epub", Seq(".epub"))
  case object Html extends FileType("html", "text/html", Seq(".html", ".htm"))
  case object Json extends FileType("json", "application/json", Seq(".json"))
  case object Md extends FileType("md", "text/markdown", Seq(".md", ".markdown"))
  case object Msg extends FileType("msg", "application/vnd.ms-outlook", Seq(".msg"))
  case object Ndjson extends FileType("ndjson", "application/x-ndjson", Seq(".ndjson", ".jsonl"))
  case object Odt extends FileType("odt", "application/vnd.oasis.opendocument.text", Seq(".odt"))
  case object Org extends FileType("org", "text/org", Seq(".org"))
  case object Pdf extends FileType("pdf", "application/pdf", Seq(".pdf"), false)
  case object Ppt extends FileType("ppt", "application/vnd.ms-powerpoint", Seq(".ppt"))
  case object Pptx extends FileType("pptx",
    "application/vnd.openxmlformats-officedocument.presentationml.presentation", Seq(".pptx"))
  case object Rst extends FileType("rst", "text/x-rst", Seq(".rst"))
  case object Rtf extends FileType("rtf", "text/rtf", Seq(".rtf"))
  case object Tsv extends FileType("tsv", "text/tsv", Seq(".tsv"))
  case object Txt extends FileType("txt", "text/plain", Seq(".txt", ".text", ".log"))
  // audio family (`file_utils/model.py:296-521`): detection + routing are
  // real; the STT kernel stays a registered-agent seam, hence `false`
  case object Wav extends FileType("wav", "audio/wav", Seq(".wav"), false)
  case object Flac extends FileType("flac", "audio/flac", Seq(".flac"), false)
  case object Mp3 extends FileType("mp3", "audio/mpeg", Seq(".mp3"), false)
  case object M4a extends FileType("m4a", "audio/mp4", Seq(".m4a"), false)
  case object Ogg extends FileType("ogg", "audio/ogg", Seq(".ogg", ".oga"), false)
  case object Opus extends FileType("opus", "audio/opus", Seq(".opus"), false)
  case object Webm extends FileType("webm", "audio/webm", Seq(".webm"), false)
  // image family (`file_utils/model.py:247-450`: BMP/HEIC/JPG/PNG/TIFF; GIF
  // added — same decode path, common in document corpora)
  case object Png extends FileType("png", "image/png", Seq(".png"))
  case object Jpg extends FileType("jpg", "image/jpeg", Seq(".jpg", ".jpeg"))
  case object Bmp extends FileType("bmp", "image/bmp", Seq(".bmp"))
  case object Tiff extends FileType("tiff", "image/tiff", Seq(".tiff", ".tif"))
  case object Gif extends FileType("gif", "image/gif", Seq(".gif"))
  case object Heic extends FileType("heic", "image/heic", Seq(".heic"), false)
  case object Xls extends FileType("xls", "application/vnd.ms-excel", Seq(".xls"))
  case object Xlsx extends FileType("xlsx",
    "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet", Seq(".xlsx"))
  case object Xml extends FileType("xml", "application/xml", Seq(".xml"))
  case object Zip extends FileType("zip", "application/zip", Seq(".zip"), false)
  /** Zero-byte input (`file_utils/model.py` `FileType.EMPTY`). */
  case object Empty extends FileType("empty", "inode/x-empty", Nil, false)
  case object Unknown extends FileType("unknown", "application/octet-stream", Nil, false)

  /** A runtime-registered type — `create_file_type`
    * (`file_utils/model.py:559-585`): external formats (proprietary logs, a
    * team's internal container) join extension/mime resolution and, once a
    * partitioner is registered for them
    * (`graft.operators.Registries.registerPartitioner`, the reference's
    * `register_partitioner` decorator), the `partition()` router. */
  final class Custom private[FileType] (name: String, mimeType: String,
    extensions: Seq[String]) extends FileType(name, mimeType, extensions)

  private val customTypes =
    scala.collection.concurrent.TrieMap.empty[String, Custom]

  /** `create_file_type(name, canonical_mime_type, extensions)` — registers
    * and returns a [[Custom]] type; re-registration under the same name
    * replaces (module-lifetime registry, like the reference's). Built-in
    * names are protected: detection for the 36 shipped formats must stay
    * deterministic. */
  def createFileType(name: String, canonicalMimeType: String,
      extensions: Seq[String]): FileType = {
    val n = name.toLowerCase
    require(builtin.forall(_.name != n),
      s"create_file_type: '$n' is a built-in FileType")
    val ft = new Custom(n,
      canonicalMimeType.toLowerCase,
      extensions.map(e => if (e.startsWith(".")) e.toLowerCase else "." + e.toLowerCase))
    customTypes(n) = ft
    ft
  }

  private lazy val builtin: Seq[FileType] = Seq(Csv, Doc, Docx, Eml, Epub, Html,
    Json, Md, Msg, Ndjson,
    Odt, Org, Pdf, Ppt, Pptx, Rst, Rtf, Tsv, Txt, Wav, Xls, Xlsx, Xml, Zip,
    Png, Jpg, Bmp, Tiff, Gif, Heic, Flac, Mp3, M4a, Ogg, Opus, Webm)

  /** Built-ins first, then runtime-registered customs — custom types extend
    * resolution, never shadow a shipped format. */
  def all: Seq[FileType] = builtin ++ customTypes.values

  def fromExtension(ext: String): Option[FileType] = {
    val e = if (ext.startsWith(".")) ext.toLowerCase else "." + ext.toLowerCase
    all.find(_.extensions.contains(e))
  }

  /** `GOOGLE_DRIVE_EXPORT_TYPES` (`file_utils/google_filetype.py`): the native
    * Google-Apps MIME types resolve to the format Drive exports them as. */
  val GoogleDriveExportTypes: Map[String, String] = Map(
    "application/vnd.google-apps.document" ->
      "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "application/vnd.google-apps.spreadsheet" ->
      "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    "application/vnd.google-apps.presentation" ->
      "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    "application/vnd.google-apps.photo" -> "image/jpeg")

  def fromMimeType(mime: String): Option[FileType] = {
    val m0 = mime.split(";").head.trim.toLowerCase
    val m = GoogleDriveExportTypes.getOrElse(m0, m0)
    val aliases: Map[String, FileType] = Map(
      "text/plain" -> Txt, "text/html" -> Html, "application/xhtml+xml" -> Html,
      "text/csv" -> Csv, "application/csv" -> Csv, "text/tsv" -> Tsv,
      "text/markdown" -> Md, "text/x-markdown" -> Md,
      "application/json" -> Json, "application/x-ndjson" -> Ndjson,
      "application/ld+json" -> Json,
      "message/rfc822" -> Eml, "application/pdf" -> Pdf,
      "text/xml" -> Xml, "application/xml" -> Xml, "application/rtf" -> Rtf,
      "text/rtf" -> Rtf, "application/epub+zip" -> Epub)
    aliases.get(m).orElse(all.find(_.mimeType == m))
  }
}

object DetectFiletype {

  private val OleMagic = Array[Byte](0xD0.toByte, 0xCF.toByte, 0x11, 0xE0.toByte)
  private val ZipMagic = Array[Byte]('P', 'K', 0x03, 0x04)

  private def startsWith(bytes: Array[Byte], magic: Array[Byte]): Boolean =
    bytes.length >= magic.length && magic.indices.forall(i => bytes(i) == magic(i))

  private def ascii(bytes: Array[Byte], n: Int): String =
    new String(bytes.take(n), java.nio.charset.StandardCharsets.ISO_8859_1)

  /** ZIP member sniff: OPC packages identify themselves by their member paths
    * (`filetype.py:845-895`). Scans local-file-header names in the head bytes. */
  private def zipFamily(bytes: Array[Byte], filename: String): FileType = {
    val s = ascii(bytes, math.min(bytes.length, 65536))
    if (s.contains("word/")) FileType.Docx
    else if (s.contains("xl/")) FileType.Xlsx
    else if (s.contains("ppt/")) FileType.Pptx
    else if (s.contains("mimetypeapplication/epub+zip")) FileType.Epub
    else if (s.contains("mimetypeapplication/vnd.oasis.opendocument.text")) FileType.Odt
    else extOf(filename).flatMap(FileType.fromExtension).getOrElse(FileType.Zip)
  }

  /** OLE container: DOC/PPT/XLS/MSG share the magic. The directory stream's
    * UTF-16LE entry names differentiate — `WordDocument`, `PowerPoint Document`,
    * `Workbook` — like the reference's root-storage walk (`filetype.py:667-726`);
    * extension breaks remaining ties. */
  private def oleFamily(bytes: Array[Byte], filename: String): FileType = {
    def hasU16(name: String): Boolean = {
      val pat = name.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      var i = 0
      while (i + pat.length <= bytes.length) {
        var j = 0
        while (j < pat.length && bytes(i + j) == pat(j)) j += 1
        if (j == pat.length) return true
        i += 1
      }
      false
    }
    // a password-protected OOXML document is a CFB container holding
    // EncryptedPackage/EncryptionInfo streams, NOT a legacy Office file —
    // resolve by extension (reference: the OLE detector abstains and the
    // extension strategy answers; partitioning then fails as unprocessable)
    if (hasU16("EncryptedPackage"))
      return extOf(filename).flatMap(FileType.fromExtension)
        .getOrElse(FileType.Unknown)
    extOf(filename).flatMap(FileType.fromExtension) match {
      case Some(t @ (FileType.Doc | FileType.Ppt | FileType.Xls | FileType.Msg)) => t
      // extension-less: sniff stream names; a whole-file scan could also hit an
      // ATTACHED container's directory, so the extension keeps priority above
      case _ if hasU16("WordDocument") => FileType.Doc
      case _ if hasU16("PowerPoint Document") => FileType.Ppt
      case _ if hasU16("Workbook") => FileType.Xls
      case _ => FileType.Msg
    }
  }

  private def extOf(filename: String): Option[String] = {
    val base = filename.substring(filename.lastIndexOf('/') + 1)
    val i = base.lastIndexOf('.')
    if (i <= 0) None else Some(base.substring(i).toLowerCase)
  }

  private val EmlHeaderRe =
    "(?m)^(?:From|To|Subject|Received|Date|Message-ID|Return-Path|MIME-Version):".r

  /** Text differentiator for extension-less / ambiguous text (`filetype.py:728-843`). */
  private def sniffText(text: String, filename: String): FileType = {
    // Python `lstrip()` strips NBSP/NEL etc. where Java `stripLeading` does not
    val t = { import graft.operators.Chunker.PyStringOps; text.pyStripLeading }
    val firstLines = text.linesIterator.take(5).toVector
    if (t.startsWith("<!DOCTYPE html") || t.startsWith("<html") ||
      t.take(2048).contains("<html")) FileType.Html
    else if (EmlHeaderRe.findFirstIn(text.take(4096)).isDefined &&
      firstLines.headOption.exists(_.matches("^[!-9;-~]+:.*"))) FileType.Eml
    // JSON route on either signature the reference accepts: the strict NDJSON
    // first-line probe (magic-mime disambiguation path) or a fully-parsing
    // JSON collection (_is_json, json.load over the whole file) — truncated
    // JSON matches neither and falls through to TXT (filetype.py:821-841)
    else if ((t.startsWith("{") || t.startsWith("[")) &&
      (isNdjsonProcessable(text) || parsesAsJsonCollection(text)))
      disambiguateJson(text)
    else if (t.startsWith("<?xml")) FileType.Xml
    // extension fallback honors only textual extensions — a binary-format
    // extension (.pdf, .png, …) on sniffable text was already disproved upstream
    else extOf(filename).flatMap(FileType.fromExtension)
      .filter(TextExtTypes.contains) match {
      case Some(t2) => t2
      // the reference's `_is_csv` sees only `text_head` — the first 4096
      // chars — so a divergence past the head must not change the verdict
      case None => if (looksLikeCsv(text.take(4096))) FileType.Csv else FileType.Txt
    }
  }

  /** `_disambiguate_json_file_type` (`filetype.py:260-276`): NDJSON has the
    * strictest signature, so it's checked first; everything else JSON-shaped is
    * JSON (the JSON partitioner re-validates downstream). */
  private def disambiguateJson(text: String): FileType =
    if (isNdjsonProcessable(text)) FileType.Ndjson else FileType.Json

  /** `is_ndjson_processable` (`filetype.py:137-186`): text must open with `{`;
    * a complete single-line object is 1-record NDJSON; multi-line requires the
    * FIRST line alone to parse as a JSON object (a pretty-printed object's first
    * line is a bare `{` fragment, which doesn't). */
  private[sources] def isNdjsonProcessable(text: String): Boolean = {
    val t = text.stripLeading()
    if (t.isEmpty || t.charAt(0) != '{') false
    else {
      val nl = t.indexOf('\n')
      if (nl == -1) parsesAsJsonObject(t)
      else {
        val first = t.substring(0, nl).stripTrailing()
        first.nonEmpty && parsesAsJsonObject(first)
      }
    }
  }

  /** True when `s` is exactly one complete, valid JSON object. */
  private[sources] def parsesAsJsonObject(s: String): Boolean =
    parsesAsJson(s, allowArray = false)

  /** `_TextFileDifferentiator._is_json` (`filetype.py:821-841`): a COMPLETE
    * top-level JSON collection (object or array) — the reference runs
    * `json.load` over the whole file, so truncated/malformed JSON falls
    * through to the TXT route instead of dead-ending in the rehydrator. */
  private[sources] def parsesAsJsonCollection(s: String): Boolean =
    parsesAsJson(s, allowArray = true)

  private def parsesAsJson(s: String, allowArray: Boolean): Boolean = {
    val n = s.length
    var i = 0
    def ws(): Unit = while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
    def lit(w: String): Boolean =
      s.startsWith(w, i) && { i += w.length; true }
    def num(): Boolean = {
      if (i < n && s.charAt(i) == '-') i += 1
      var d = 0
      while (i < n && s.charAt(i).isDigit) { i += 1; d += 1 }
      if (d == 0) return false
      if (i < n && s.charAt(i) == '.') {
        i += 1; var d2 = 0
        while (i < n && s.charAt(i).isDigit) { i += 1; d2 += 1 }
        if (d2 == 0) return false
      }
      if (i < n && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
        i += 1
        if (i < n && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
        var d3 = 0
        while (i < n && s.charAt(i).isDigit) { i += 1; d3 += 1 }
        if (d3 == 0) return false
      }
      true
    }
    def str(): Boolean = {
      i += 1 // opening quote
      while (i < n) {
        s.charAt(i) match {
          case '\\' => i += 2
          case '"' => i += 1; return true
          case _ => i += 1
        }
      }
      false
    }
    def value(): Boolean = {
      ws()
      if (i >= n) false
      else s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true")
        case 'f' => lit("false")
        case 'n' => lit("null")
        case c if c == '-' || c.isDigit => num()
        case _ => false
      }
    }
    def obj(): Boolean = {
      i += 1; ws()
      if (i < n && s.charAt(i) == '}') { i += 1; return true }
      var ok = true
      var done = false
      while (ok && !done) {
        ws()
        if (i >= n || s.charAt(i) != '"' || !str()) ok = false
        else {
          ws()
          if (i >= n || s.charAt(i) != ':') ok = false
          else {
            i += 1
            if (!value()) ok = false
            else {
              ws()
              if (i < n && s.charAt(i) == ',') i += 1
              else if (i < n && s.charAt(i) == '}') { i += 1; done = true }
              else ok = false
            }
          }
        }
      }
      ok
    }
    def arr(): Boolean = {
      i += 1; ws()
      if (i < n && s.charAt(i) == ']') { i += 1; return true }
      var ok = true
      var done = false
      while (ok && !done) {
        if (!value()) ok = false
        else {
          ws()
          if (i < n && s.charAt(i) == ',') i += 1
          else if (i < n && s.charAt(i) == ']') { i += 1; done = true }
          else ok = false
        }
      }
      ok
    }
    ws()
    if (i >= n) return false
    val ok = s.charAt(i) match {
      case '{' => obj()
      case '[' if allowArray => arr()
      case _ => false
    }
    ws()
    ok && i == n
  }

  /** `_TextFileDifferentiator._is_csv` (`filetype.py:790-809`): >= 2 lines (first
    * 10 checked), every line holds at least one comma, and every line's
    * outside-quotes comma count equals the header's. */
  private[sources] def looksLikeCsv(text: String): Boolean = {
    // the reference's lookahead regex `(?=(?:[^"]*"[^"]*")*[^"]*$),` counts a
    // comma only when an EVEN number of quotes follows it to end-of-line — on
    // a line with unbalanced quotes that is NOT the same as "outside quotes
    // so far" (e.g. `a,b"` counts 0, `"a,b` counts 1). Scan from the right,
    // tracking suffix quote parity.
    def countCommas(line: String): Int = {
      var quotesAfter = 0
      var count = 0
      var i = line.length - 1
      while (i >= 0) {
        line.charAt(i) match {
          case '"' => quotesAfter += 1
          case ',' if quotesAfter % 2 == 0 => count += 1
          case _ => ()
        }
        i -= 1
      }
      count
    }
    val lines = pySplitLines(pyStripString(text)).take(10)
    if (lines.size < 2) false
    else if (lines.exists(!_.contains(','))) false
    else {
      val header = countCommas(lines.head)
      lines.tail.forall(countCommas(_) == header)
    }
  }

  /** Python `str.strip()` (the four extra no-break/NEL spaces included). */
  private def pyStripString(s: String): String = {
    import graft.operators.Chunker.PyStringOps
    s.pyStrip
  }

  /** Python `str.splitlines()`: besides `\n`/`\r`/`\r\n`, Python breaks on
    * VT, FF, FS, GS, RS, NEL, LS and PS — `linesIterator` does not. */
  private[sources] def pySplitLines(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val sb = new StringBuilder
    var i = 0
    def isBreak(c: Char): Boolean = c match {
      case '\n' | '\r' | '\u000B' | '\u000C' | '\u001C' | '\u001D' |
        '\u001E' | '\u0085' | '\u2028' | '\u2029' => true
      case _ => false
    }
    while (i < s.length) {
      val c = s.charAt(i)
      if (isBreak(c)) {
        out += sb.toString; sb.clear()
        if (c == '\r' && i + 1 < s.length && s.charAt(i + 1) == '\n') i += 1
      } else sb.append(c)
      i += 1
    }
    if (sb.nonEmpty) out += sb.toString
    out.result()
  }

  /** Types whose extensions the text differentiator honors directly
    * (`filetype.py:752-766` extension list). */
  private val TextExtTypes: Set[FileType] = Set(FileType.Csv, FileType.Eml,
    FileType.Html, FileType.Json, FileType.Ndjson, FileType.Md, FileType.Org,
    FileType.Rst, FileType.Rtf, FileType.Tsv, FileType.Txt, FileType.Xml)

  /** True when decoded "text" is control-character soup — i.e. the bytes were
    * binary and the latin-1 fallback decoded garbage. Mirrors the reference,
    * where `text_head` raising `UnicodeDecodeError` skips the text strategy. */
  private def looksBinaryText(text: String): Boolean = {
    val n = math.min(text.length, 4096)
    if (n == 0) return false
    var ctrl = 0
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (c == '\u0000') return true
      if (c < '\t' || (c > '\r' && c < ' ')) ctrl += 1
      i += 1
    }
    ctrl.toDouble / n > 0.05
  }

  /** Content-types invalidated when the file turns out not to be an OLE
    * container (`filetype.py:536-549` `rule_out_cfb_content_types`). */
  private val CfbTypes: Set[FileType] =
    Set(FileType.Doc, FileType.Msg, FileType.Ppt, FileType.Xls)

  /** Content-types invalidated when the file turns out not to be a ZIP archive
    * (`filetype.py:551-566` `rule_out_zip_content_types`). */
  private val ZipTypes: Set[FileType] = Set(FileType.Docx, FileType.Epub,
    FileType.Odt, FileType.Pptx, FileType.Xlsx, FileType.Zip)

  /**
   * The 4-strategy chain (`filetype.py:200-231`): binary magic first, then the
   * asserted content-type, then text sniffing, then extension. Mirrors the
   * reference's refinements: a zero-byte input is `Empty`; an asserted
   * MS-Office type is ruled out when the container magic disproves it (so an
   * XLS-asserted CSV still sniffs as CSV); an XML content-type with an
   * .html/.htm extension is HTML; and any JSON result is re-disambiguated
   * against NDJSON's stricter signature.
   */
  def detect(filename: String, head: Array[Byte],
      contentType: Option[String] = None): FileType = {
    if (head.isEmpty) FileType.Empty
    else if (startsWith(head, ZipMagic)) zipFamily(head, filename)
    else if (startsWith(head, OleMagic)) oleFamily(head, filename)
    else if (startsWith(head, "%PDF".getBytes)) FileType.Pdf
    else if (startsWith(head, "{\\rtf".getBytes)) FileType.Rtf
    else if (startsWith(head, Array[Byte](0x89.toByte, 'P', 'N', 'G'))) FileType.Png
    else if (startsWith(head, Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte)))
      FileType.Jpg
    else if (startsWith(head, "GIF8".getBytes)) FileType.Gif
    else if (startsWith(head, Array[Byte]('I', 'I', 42, 0)) ||
      startsWith(head, Array[Byte]('M', 'M', 0, 42))) FileType.Tiff
    else if (head.length >= 12 && ascii(head.drop(4), 4) == "ftyp" &&
      Seq("heic", "heix", "heif").contains(ascii(head.drop(8), 4))) FileType.Heic
    else if (head.length >= 26 && startsWith(head, "BM".getBytes) &&
      Seq(12L, 40L, 52L, 56L, 108L, 124L).contains(
        (head(14) & 0xffL) | ((head(15) & 0xffL) << 8) |
          ((head(16) & 0xffL) << 16) | ((head(17) & 0xffL) << 24))) FileType.Bmp
    else if (startsWith(head, "RIFF".getBytes)) {
      // RIFF heads WAV but also AVI/WebP — the form type at offset 8 decides.
      val form = if (head.length >= 12) ascii(head.drop(8), 4) else ""
      if (form == "WAVE") FileType.Wav else FileType.Unknown
    } else if (startsWith(head, "fLaC".getBytes)) FileType.Flac
    else if (startsWith(head, "OggS".getBytes)) {
      // an Opus stream is an Ogg container whose first page opens with OpusHead
      if (head.length >= 36 && ascii(head.drop(28), 8) == "OpusHead") FileType.Opus
      else FileType.Ogg
    } else if (startsWith(head, Array(0x1A.toByte, 0x45.toByte, 0xDF.toByte, 0xA3.toByte)))
      FileType.Webm // EBML header (Matroska/WebM)
    else if (head.length >= 8 && ascii(head.drop(4), 4) == "ftyp" &&
      (head.length >= 12 && ascii(head.drop(8), 3) == "M4A"))
      FileType.M4a
    else if (startsWith(head, "ID3".getBytes)) FileType.Mp3
    // NB: no bare MPEG frame-sync (0xFFEx) probe — it collides with UTF-16/32
    // BOMs (0xFF 0xFE); headerless MP3 falls back to the .mp3 extension
    else {
      // magic disproved any asserted container type — rule it out rather than
      // letting a wrong asserted type (e.g. XLS on a CSV) win below
      val asserted = contentType.flatMap(FileType.fromMimeType)
        .filterNot(t => CfbTypes.contains(t) || ZipTypes.contains(t))
      val ext = extOf(filename)
      val resolved = asserted match {
        case Some(FileType.Xml) if ext.exists(e => e == ".html" || e == ".htm") =>
          FileType.Html // filetype.py:296-298
        case Some(t) => t
        case None =>
          // encoding-aware decode so BOM'd / UTF-16 text sniffs on real
          // characters rather than UTF-8 mojibake
          val text = Encodings.decodeText(head)
          val extType = ext.flatMap(FileType.fromExtension)
          if (looksBinaryText(text))
            // undecodable content: the text differentiator is not applicable
            // (reference: UnicodeDecodeError skips strategy 3) — extension decides
            extType.getOrElse(FileType.Unknown)
          else extType match {
            // a textual extension the reference's differentiator honors directly
            // (filetype.py:752-766); .txt itself still sniffs (JSON/CSV/EML
            // checks run before the .txt fallback there)
            case Some(t) if TextExtTypes.contains(t) && t != FileType.Txt => t
            // texty content with a binary-format extension: the content already
            // disproved the extension (no magic matched), so sniff — a JSON
            // payload named `filename.pdf` is JSON (test_filetype.py:1069-1092)
            case _ => sniffText(text, filename)
          }
      }
      // a JSON result from ANY strategy is re-checked against NDJSON's stricter
      // signature (filetype.py:225-229); an NDJSON result is trusted as-is
      if (resolved == FileType.Json) disambiguateJson(Encodings.decodeText(head))
      else resolved
    }
  }
}
