package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable

import graft.sources.HtmlPartitioner.RawPara
import graft.sources.Partitioners.EmailMeta

/**
 * `partition_msg` — Outlook `.msg` parsing
 * (`/root/reference/unstructured/partition/msg.py:22`; the reference delegates to
 * the `oxmsg` library). Native implementation: a Compound File Binary (OLE2)
 * reader — header, FAT/miniFAT chains, directory tree — plus the MAPI property
 * streams (`__substg1.0_TTTTYYYY`): subject 0037, sender 0C1A/0C1F/5D01,
 * recipients `__recip...`/3001/39FE, text body 1000, HTML body 1013, transport
 * headers 007D. The HTML body routes through the real HTML partitioner, the text
 * body through the text splitter — the same body-preference order as EML
 * (`partition/email.py:79-313`).
 *
 * Whole-file parse per message inside the router's flatMap — parallel per file,
 * no shuffle.
 */
object MsgPartitioner {

  // ------------------------------------------------------------------ CFB reader

  final case class DirEntry(name: String, entryType: Int, startSector: Long,
      size: Long, childId: Int, leftId: Int, rightId: Int, path: String = "")

  final class Cfb(bytes: Array[Byte]) {
    /** Message codepage, computed once per container (consulted from the top-level
      * props, recipients and attachments passes). */
    lazy val charset: java.nio.charset.Charset = MsgPartitioner.computeCharset(this)

    private val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

    require(bytes.length >= 512 &&
      (buf.getLong(0) == 0xE11AB1A1E011CFD0L), "not a CFB container")

    private val sectorShift = buf.getShort(30).toInt // usually 9 -> 512
    private val miniShift = buf.getShort(32).toInt // usually 6 -> 64
    private val sectorSize = 1 << sectorShift
    private val miniSize = 1 << miniShift
    private val firstDirSector = buf.getInt(48).toLong & 0xFFFFFFFFL
    private val miniCutoff = buf.getInt(56).toLong & 0xFFFFFFFFL
    private val firstMiniFatSector = buf.getInt(60).toLong & 0xFFFFFFFFL
    private val numMiniFat = buf.getInt(64)

    private val EndOfChain = 0xFFFFFFFEL
    private val FreeSect = 0xFFFFFFFFL

    private def sectorOffset(sector: Long): Int = ((sector + 1) * sectorSize).toInt

    /** FAT from the 109 header DIFAT slots plus any DIFAT chain sectors. */
    private val fat: Array[Long] = {
      val fatSectors = mutable.ArrayBuffer.empty[Long]
      var i = 0
      while (i < 109) {
        val s = buf.getInt(76 + i * 4).toLong & 0xFFFFFFFFL
        if (s != FreeSect && s != EndOfChain) fatSectors += s
        i += 1
      }
      var difat = buf.getInt(68).toLong & 0xFFFFFFFFL // first DIFAT sector
      val perSector = sectorSize / 4 - 1
      var guard = 0
      while (difat != EndOfChain && difat != FreeSect && guard < 4096) {
        val off = sectorOffset(difat)
        var j = 0
        while (j < perSector) {
          val s = buf.getInt(off + j * 4).toLong & 0xFFFFFFFFL
          if (s != FreeSect && s != EndOfChain) fatSectors += s
          j += 1
        }
        difat = buf.getInt(off + perSector * 4).toLong & 0xFFFFFFFFL
        guard += 1
      }
      val entries = mutable.ArrayBuffer.empty[Long]
      fatSectors.foreach { s =>
        val off = sectorOffset(s)
        var j = 0
        while (j < sectorSize / 4) {
          entries += (buf.getInt(off + j * 4).toLong & 0xFFFFFFFFL)
          j += 1
        }
      }
      entries.toArray
    }

    private def chain(start: Long, table: Array[Long]): Seq[Long] = {
      val out = mutable.ArrayBuffer.empty[Long]
      var s = start
      var guard = 0
      while (s != EndOfChain && s != FreeSect && s < table.length && guard < (1 << 22)) {
        out += s
        s = table(s.toInt)
        guard += 1
      }
      out.toSeq
    }

    private def readChain(start: Long, size: Long): Array[Byte] = {
      val out = new Array[Byte](size.toInt)
      var written = 0
      chain(start, fat).foreach { s =>
        if (written < size) {
          val n = math.min(sectorSize.toLong, size - written).toInt
          System.arraycopy(bytes, sectorOffset(s), out, written, n)
          written += n
        }
      }
      out
    }

    /** Directory entries in stream order. */
    val entries: Vector[DirEntry] = {
      val dirBytes = {
        val sectors = chain(firstDirSector, fat)
        val out = new Array[Byte](sectors.length * sectorSize)
        sectors.zipWithIndex.foreach { case (s, i) =>
          System.arraycopy(bytes, sectorOffset(s), out, i * sectorSize, sectorSize)
        }
        out
      }
      val db = ByteBuffer.wrap(dirBytes).order(ByteOrder.LITTLE_ENDIAN)
      (0 until dirBytes.length / 128).map { i =>
        val base = i * 128
        val nameLen = db.getShort(base + 64).toInt
        val name =
          if (nameLen >= 2)
            new String(dirBytes, base, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
          else ""
        DirEntry(name,
          dirBytes(base + 66).toInt,
          db.getInt(base + 116).toLong & 0xFFFFFFFFL,
          db.getLong(base + 120),
          db.getInt(base + 76), db.getInt(base + 68), db.getInt(base + 72))
      }.toVector
    }

    /** MiniFAT table and the root mini-stream bytes. */
    private val miniFat: Array[Long] = {
      val raw = {
        val sectors = chain(firstMiniFatSector, fat).take(math.max(numMiniFat, 0))
        val out = new Array[Byte](sectors.length * sectorSize)
        sectors.zipWithIndex.foreach { case (s, i) =>
          System.arraycopy(bytes, sectorOffset(s), out, i * sectorSize, sectorSize)
        }
        out
      }
      val mb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
      (0 until raw.length / 4).map(i => mb.getInt(i * 4).toLong & 0xFFFFFFFFL).toArray
    }

    private lazy val miniStream: Array[Byte] =
      entries.headOption.map(root => readChain(root.startSector, root.size)).getOrElse(Array.empty)

    def readStream(e: DirEntry): Array[Byte] =
      if (e.size < miniCutoff && e.entryType == 2) {
        val out = new Array[Byte](e.size.toInt)
        var written = 0
        chain(e.startSector, miniFat).foreach { s =>
          if (written < e.size) {
            val n = math.min(miniSize.toLong, e.size - written).toInt
            val off = (s * miniSize).toInt
            if (off + n <= miniStream.length) {
              System.arraycopy(miniStream, off, out, written, n)
              written += n
            }
          }
        }
        out
      } else readChain(e.startSector, e.size)

    /** Entries with storage-qualified paths (red-black sibling walk from root).
      * A visited set guards against sibling/child cycles in corrupt directories
      * (which would otherwise recurse unboundedly and kill the task). */
    lazy val pathedEntries: Vector[DirEntry] = {
      val out = mutable.ArrayBuffer.empty[DirEntry]
      val visited = mutable.Set.empty[Int]
      def walkSiblings(id: Int, prefix: String): Unit = {
        if (id >= 0 && id < entries.length && id != 0xFFFFFFFF && visited.add(id)) {
          val e = entries(id)
          if (e.entryType == 1 || e.entryType == 2) {
            walkSiblings(e.leftId, prefix)
            val pathed = e.copy(path = prefix + e.name)
            out += pathed
            if (e.entryType == 1) walkSiblings(e.childId, prefix + e.name + "/")
            walkSiblings(e.rightId, prefix)
          }
        }
      }
      entries.headOption.foreach(root => walkSiblings(root.childId, ""))
      out.toVector
    }
  }

  // ------------------------------------------------------------- MAPI properties

  private def substgTag(name: String): Option[(String, String)] =
    if (name.startsWith("__substg1.0_") && name.length >= 20)
      Some((name.substring(12, 16), name.substring(16, 20)))
    else None

  private def decode(bytes: Array[Byte], typ: String,
      cs: java.nio.charset.Charset = java.nio.charset.StandardCharsets.ISO_8859_1): String =
    typ match {
      case "001F" => new String(bytes, java.nio.charset.StandardCharsets.UTF_16LE)
      case "001E" => new String(bytes, cs)
      case "0102" => new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      case _ => ""
    }

  /** Fixed-width top-level properties from `__properties_version1.0` — 32-byte
    * header then 16-byte entries tag(4) flags(4) value(8); PT_LONG/PT_SHORT/
    * PT_BOOLEAN values surface as the low dword ([MS-OXMSG] 2.4; the reference's
    * oxmsg reads the codepage this way). Keyed by 4-hex-digit property id. */
  def fixedProps(cfb: Cfb): Map[String, Long] =
    cfb.pathedEntries.find(e => e.entryType == 2 && !e.path.contains("/") &&
        e.name == "__properties_version1.0").map { e =>
      val b = cfb.readStream(e)
      val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      val out = mutable.Map.empty[String, Long]
      var off = 32
      while (off + 16 <= b.length) {
        val tag = bb.getInt(off).toLong & 0xFFFFFFFFL
        val typ = (tag & 0xFFFFL).toInt
        if (typ == 0x0003 || typ == 0x0002 || typ == 0x000B)
          out(f"${(tag >> 16).toInt}%04X") = bb.getInt(off + 8).toLong & 0xFFFFFFFFL
        // PT_SYSTIME (FILETIME): full 64-bit tick count
        else if (typ == 0x0040)
          out(f"${(tag >> 16).toInt}%04X") = bb.getLong(off + 8)
        off += 16
      }
      out.toMap
    }.getOrElse(Map.empty)

  /** PR_MESSAGE_CODEPAGE (3FFD) / PR_INTERNET_CPID (3FDE) → Java charset;
    * ISO-8859-1 when absent or unmappable. Legacy non-Latin messages store
    * PT_STRING8 bodies in this codepage. Memoized per Cfb — partitioning one
    * message consults it from three places (top-level props, recipients,
    * attachments), each of which would otherwise re-walk the property stream. */
  def messageCharset(cfb: Cfb): java.nio.charset.Charset = cfb.charset

  private[sources] def computeCharset(cfb: Cfb): java.nio.charset.Charset = {
    val props = fixedProps(cfb)
    props.get("3FFD").orElse(props.get("3FDE")).flatMap { cp =>
      val name = cp match {
        case 65001 => "UTF-8"
        case 1200 => "UTF-16LE"
        case 932 => "windows-31j"
        case 936 => "GBK"
        case 949 => "x-windows-949"
        case 950 => "Big5"
        case 20127 => "US-ASCII"
        case 28591 => "ISO-8859-1"
        case n => "windows-" + n
      }
      scala.util.Try(java.nio.charset.Charset.forName(name)).toOption
    }.getOrElse(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  /** Top-level (non-storage) MAPI string properties, keyed by 4-hex-digit tag. */
  def topLevelProps(cfb: Cfb): Map[String, String] = {
    val cs = messageCharset(cfb)
    cfb.pathedEntries.iterator
      .filter(e => e.entryType == 2 && !e.path.contains("/"))
      .flatMap { e =>
        substgTag(e.name).map { case (tag, typ) => tag -> decode(cfb.readStream(e), typ, cs) }
      }.toMap
  }

  /** Recipient display names / addresses from `__recip_version1.0_#N` storages. */
  def recipients(cfb: Cfb): Seq[String] = {
    val cs = messageCharset(cfb)
    val byStorage = cfb.pathedEntries
      .filter(e => e.entryType == 2 && e.path.startsWith("__recip_version1.0_"))
      .groupBy(_.path.takeWhile(_ != '/'))
    byStorage.toSeq.sortBy(_._1).map { case (_, es) =>
      val props = es.flatMap(e => substgTag(e.name).map { case (tag, typ) =>
        tag -> decode(cfb.readStream(e), typ, cs)
      }).toMap
      props.get("39FE").orElse(props.get("3003")).orElse(props.get("3001")).getOrElse("")
    }.filter(_.nonEmpty)
  }

  /** `_AttachmentPartitioner._attachment_file_name` (`partition/msg.py:286-306`):
    * strip path components (both separator conventions) to block traversal,
    * drop null bytes, and fall back to "unknown" for empty/dot results. */
  def sanitizeAttachmentFileName(raw: Option[String]): String = {
    val base = raw.getOrElse("unknown").replace("\\", "/").split("/").lastOption.getOrElse("")
    val safe = base.replace("\u0000", "")
    if (safe.isEmpty || safe == "." || safe == "..") "unknown" else safe
  }

  /** Attachments: (filename, bytes) from `__attach_version1.0_#N` storages. */
  def msgAttachments(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val cfb = new Cfb(bytes)
    val cs = messageCharset(cfb)
    val byStorage = cfb.pathedEntries
      .filter(e => e.entryType == 2 && e.path.startsWith("__attach_version1.0_"))
      .groupBy(_.path.takeWhile(_ != '/'))
    byStorage.toSeq.sortBy(_._1).flatMap { case (_, es) =>
      val named = es.flatMap(e => substgTag(e.name).map { case (tag, typ) => (tag, typ, e) })
      val fn = named.collectFirst { case ("3707", typ, e) => decode(cfb.readStream(e), typ, cs) }
        .orElse(named.collectFirst { case ("3704", typ, e) => decode(cfb.readStream(e), typ, cs) })
      val data = named.collectFirst { case ("3701", "0102", e) => cfb.readStream(e) }
      data.map(d => sanitizeAttachmentFileName(fn.filter(_.nonEmpty)) -> d)
    }
  }

  /** RFC-5322 headers from the transport-headers property text (unfolded,
    * lower-cased keys, first occurrence wins — python `email` semantics). */
  private def parseTransportHeaders(text: String): Map[String, String] = {
    val out = mutable.LinkedHashMap.empty[String, String]
    var current: String = null
    text.linesIterator.takeWhile(_.nonEmpty).foreach { line =>
      if ((line.startsWith(" ") || line.startsWith("\t")) && current != null)
        out(current) = out(current) + " " + line.trim
      else {
        val i = line.indexOf(':')
        if (i > 0) {
          val k = line.substring(0, i).toLowerCase
          if (!out.contains(k)) { out(k) = line.substring(i + 1).trim; current = k }
          else current = null
        }
      }
    }
    out.toMap
  }

  /** PT_SYSTIME property (FILETIME, 100 ns ticks since 1601) → ISO-8601 UTC in
    * python `datetime.isoformat()` shape ("...+00:00"). */
  private def sysTimeIso(ticks: Long): String = {
    val secs = ticks / 10000000L - 11644473600L
    val dt = java.time.LocalDateTime.ofEpochSecond(secs, 0, java.time.ZoneOffset.UTC)
    dt.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")) + "+00:00"
  }

  /** Parse an Outlook message into (metadata, element paragraphs).
    *
    * Reference semantics (`partition/msg.py`): cc/bcc/Message-Id come from the
    * transport message headers (:92-103), the sent date (PR_CLIENT_SUBMIT_TIME)
    * feeds `last_modified` (:135-138), and a Content-Type containing
    * "encrypted" short-circuits to zero elements (:114-123,186-190). */
  def partitionMsg(bytes: Array[Byte]): (EmailMeta, Seq[RawPara]) = {
    val cfb = new Cfb(bytes)
    val props = topLevelProps(cfb)
    val subject = props.get("0037").orElse(props.get("0E1D")).getOrElse("")
    val senderName = props.getOrElse("0C1A", "")
    val senderAddr = props.get("5D01").orElse(props.get("0C1F")).getOrElse("")
    val from =
      if (senderName.nonEmpty && senderAddr.nonEmpty) Seq(s""""$senderName" <$senderAddr>""")
      else if (senderAddr.nonEmpty) Seq(senderAddr)
      else if (senderName.nonEmpty) Seq(senderName)
      else Nil
    val to = recipients(cfb)
    // transport headers (PR_TRANSPORT_MESSAGE_HEADERS, 007D)
    val headers = props.get("007D").map(parseTransportHeaders).getOrElse(Map.empty)
    def splitAddrs(h: String): Seq[String] =
      h.split(",").map(_.strip).filter(_.nonEmpty).toSeq
    val date = fixedProps(cfb).get("0039").map(sysTimeIso)
    val meta = EmailMeta(sentFrom = from, sentTo = to,
      cc = headers.get("cc").map(splitAddrs).getOrElse(Nil),
      bcc = headers.get("bcc").map(splitAddrs).getOrElse(Nil),
      subject = Option(subject).filter(_.nonEmpty),
      messageId = headers.get("message-id")
        .map(_.strip.stripPrefix("<").stripSuffix(">")).filter(_.nonEmpty),
      date = date)

    // PGP/SMIME: "encrypted" Content-Type partitions to nothing (msg.py:114-123)
    if (headers.get("content-type").exists(_.contains("encrypted")))
      return (meta, Nil)

    val htmlBody = props.get("1013").filter(_.nonEmpty)
    val textBody = props.get("1000").filter(_.nonEmpty)
    val paras = htmlBody match {
      case Some(h) => HtmlPartitioner.partition(h)
      case None => textBody match {
        case Some(t) =>
          TextSource.splitParagraphs(t).map(p => RawPara(p, None, classifier = "text"))
        case None => Nil
      }
    }
    (meta, paras)
  }
}
