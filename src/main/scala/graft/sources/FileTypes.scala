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
  case object Epub extends FileType("epub", "application/epub+zip", Seq(".epub"))
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
  case object Wav extends FileType("wav", "audio/wav",
    Seq(".wav", ".mp3", ".m4a", ".flac", ".ogg"), false)
  // image family (`file_utils/model.py:247-450`: BMP/HEIC/JPG/PNG/TIFF; GIF
  // added — same decode path, common in document corpora)
  case object Png extends FileType("png", "image/png", Seq(".png"))
  case object Jpg extends FileType("jpg", "image/jpeg", Seq(".jpg", ".jpeg"))
  case object Bmp extends FileType("bmp", "image/bmp", Seq(".bmp"))
  case object Tiff extends FileType("tiff", "image/tiff", Seq(".tiff", ".tif"))
  case object Gif extends FileType("gif", "image/gif", Seq(".gif"))
  case object Heic extends FileType("heic", "image/heic", Seq(".heic"), false)
  case object Xls extends FileType("xls", "application/vnd.ms-excel", Seq(".xls"), false)
  case object Xlsx extends FileType("xlsx",
    "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet", Seq(".xlsx"))
  case object Xml extends FileType("xml", "application/xml", Seq(".xml"))
  case object Zip extends FileType("zip", "application/zip", Seq(".zip"), false)
  case object Unknown extends FileType("unknown", "application/octet-stream", Nil, false)

  lazy val all: Seq[FileType] = Seq(Csv, Doc, Docx, Eml, Epub, Html, Json, Md, Msg, Ndjson,
    Odt, Org, Pdf, Ppt, Pptx, Rst, Rtf, Tsv, Txt, Wav, Xls, Xlsx, Xml, Zip,
    Png, Jpg, Bmp, Tiff, Gif, Heic)

  def fromExtension(ext: String): Option[FileType] = {
    val e = if (ext.startsWith(".")) ext.toLowerCase else "." + ext.toLowerCase
    all.find(_.extensions.contains(e))
  }

  def fromMimeType(mime: String): Option[FileType] = {
    val m = mime.split(";").head.trim.toLowerCase
    val aliases: Map[String, FileType] = Map(
      "text/plain" -> Txt, "text/html" -> Html, "application/xhtml+xml" -> Html,
      "text/csv" -> Csv, "application/csv" -> Csv, "text/tsv" -> Tsv,
      "text/markdown" -> Md, "text/x-markdown" -> Md,
      "application/json" -> Json, "application/x-ndjson" -> Ndjson,
      "application/ld+json" -> Json,
      "message/rfc822" -> Eml, "application/pdf" -> Pdf,
      "text/xml" -> Xml, "application/xml" -> Xml, "application/rtf" -> Rtf,
      "text/rtf" -> Rtf)
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
    val t = text.stripLeading()
    val firstLines = text.linesIterator.take(5).toVector
    if (t.startsWith("<!DOCTYPE html") || t.startsWith("<html") ||
      t.take(2048).contains("<html")) FileType.Html
    else if (EmlHeaderRe.findFirstIn(text.take(4096)).isDefined &&
      firstLines.headOption.exists(_.matches("^[!-9;-~]+:.*"))) FileType.Eml
    else if ((t.startsWith("{") || t.startsWith("[")) && looksLikeJson(t)) {
      if (text.linesIterator.filter(_.trim.nonEmpty).drop(1).nonEmpty &&
        text.linesIterator.filter(_.trim.nonEmpty).forall(l => l.trim.startsWith("{")))
        FileType.Ndjson
      else FileType.Json
    } else if (t.startsWith("<?xml")) FileType.Xml
    else extOf(filename).flatMap(FileType.fromExtension) match {
      case Some(t2) => t2
      case None =>
        // CSV heuristic: >= 2 lines with a consistent non-zero comma count
        val counts = firstLines.filter(_.nonEmpty).map(_.count(_ == ','))
        if (counts.size >= 2 && counts.distinct.size == 1 && counts.head > 0) FileType.Csv
        else FileType.Txt
    }
  }

  private def looksLikeJson(t: String): Boolean = {
    val head = t.take(1000).trim
    head.startsWith("{") && head.drop(1).trim.headOption.exists(c => c == '"' || c == '}') ||
      head.startsWith("[")
  }

  /**
   * The 4-strategy chain (`filetype.py:200-231`): binary magic first, then the
   * asserted content-type, then text sniffing, then extension.
   */
  def detect(filename: String, head: Array[Byte],
      contentType: Option[String] = None): FileType = {
    if (startsWith(head, ZipMagic)) zipFamily(head, filename)
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
    } else if (startsWith(head, "ID3".getBytes)) FileType.Wav
    else contentType.flatMap(FileType.fromMimeType) match {
      case Some(t) => t
      case None =>
        // encoding-aware decode so BOM'd / UTF-16 text sniffs on real
        // characters rather than UTF-8 mojibake
        val text = Encodings.decodeText(head)
        val byExt = extOf(filename).flatMap(FileType.fromExtension)
        byExt match {
          case Some(FileType.Txt) | None => sniffText(text, filename)
          case Some(t) => t
        }
    }
  }
}
