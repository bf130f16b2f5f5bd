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

    /** Entries with storage-qualified paths (red-black sibling walk from root). */
    lazy val pathedEntries: Vector[DirEntry] = {
      val out = mutable.ArrayBuffer.empty[DirEntry]
      def walkSiblings(id: Int, prefix: String): Unit = {
        if (id >= 0 && id < entries.length && id != 0xFFFFFFFF) {
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

  private def decode(bytes: Array[Byte], typ: String): String = typ match {
    case "001F" => new String(bytes, java.nio.charset.StandardCharsets.UTF_16LE)
    case "001E" => new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    case "0102" => new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    case _ => ""
  }

  /** Top-level (non-storage) MAPI string properties, keyed by 4-hex-digit tag. */
  def topLevelProps(cfb: Cfb): Map[String, String] =
    cfb.pathedEntries.iterator
      .filter(e => e.entryType == 2 && !e.path.contains("/"))
      .flatMap { e =>
        substgTag(e.name).map { case (tag, typ) => tag -> decode(cfb.readStream(e), typ) }
      }.toMap

  /** Recipient display names / addresses from `__recip_version1.0_#N` storages. */
  def recipients(cfb: Cfb): Seq[String] = {
    val byStorage = cfb.pathedEntries
      .filter(e => e.entryType == 2 && e.path.startsWith("__recip_version1.0_"))
      .groupBy(_.path.takeWhile(_ != '/'))
    byStorage.toSeq.sortBy(_._1).map { case (_, es) =>
      val props = es.flatMap(e => substgTag(e.name).map { case (tag, typ) =>
        tag -> decode(cfb.readStream(e), typ)
      }).toMap
      props.get("39FE").orElse(props.get("3003")).orElse(props.get("3001")).getOrElse("")
    }.filter(_.nonEmpty)
  }

  /** Attachments: (filename, bytes) from `__attach_version1.0_#N` storages. */
  def msgAttachments(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val cfb = new Cfb(bytes)
    val byStorage = cfb.pathedEntries
      .filter(e => e.entryType == 2 && e.path.startsWith("__attach_version1.0_"))
      .groupBy(_.path.takeWhile(_ != '/'))
    byStorage.toSeq.sortBy(_._1).flatMap { case (_, es) =>
      val named = es.flatMap(e => substgTag(e.name).map { case (tag, typ) => (tag, typ, e) })
      val fn = named.collectFirst { case ("3707", typ, e) => decode(cfb.readStream(e), typ) }
        .orElse(named.collectFirst { case ("3704", typ, e) => decode(cfb.readStream(e), typ) })
      val data = named.collectFirst { case ("3701", "0102", e) => cfb.readStream(e) }
      (fn, data) match {
        case (Some(f), Some(d)) if f.nonEmpty => Some(f -> d)
        case _ => None
      }
    }
  }

  /** Parse an Outlook message into (metadata, element paragraphs). */
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
    val meta = EmailMeta(sentFrom = from, sentTo = to, cc = Nil, bcc = Nil,
      subject = Option(subject).filter(_.nonEmpty), messageId = None, date = None)

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
