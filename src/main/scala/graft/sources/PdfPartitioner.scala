package graft.sources

import java.util.zip.Inflater

import scala.collection.mutable

import graft.sources.HtmlPartitioner.RawPara

/**
 * `partition_pdf` FAST strategy (`/root/reference/unstructured/partition/pdf.py:430-588`
 * — pdfminer text extraction) re-implemented as a native PDF reader:
 *
 *  - **Object model**: the cross-reference-free scan collects `N G obj … endobj`
 *    bodies (streams delimited by `/Length` when available), the page tree is
 *    walked from the catalog (`/Pages` → `/Kids`), and `/Contents` streams are
 *    concatenated per page — so image-only pages (e.g. a scanned page rendering
 *    one JPEG) correctly produce no text instead of leaking compressed bytes.
 *  - **Filters**: `/FlateDecode` and `/ASCII85Decode`, alone or chained.
 *  - **Encryption**: the standard security handler with an empty user password —
 *    RC4 (V≤2) and AES-128-CBC (`/CFM /AESV2`, V4) object keys per
 *    PDF-1.7 §7.6.2, so "copy-protected" documents extract like the reference.
 *  - **Fonts**: per-page `/Resources` → `/Font` maps; `Tf` switches the active
 *    font during content interpretation. Glyph codes decode through the font's
 *    embedded `/ToUnicode` CMap (bfchar/bfrange, 1- and 2-byte codespaces — how
 *    subset fonts and ligatures like ﬁ recover their Unicode), then simple-font
 *    `/Encoding /Differences` glyph names via an Adobe-glyph-list subset, then
 *    WinAnsi fallbacks.
 *  - **Layout**: line breaks derive from `Td`/`TD`/`Tm`/`T*` y-motion and large
 *    `TJ` kerns, and the per-page text flows through the same paragraph-split +
 *    classifier cascade as `partition_text`.
 *
 * Scope (documented): text-bearing PDFs — the reference's FAST path. Scanned
 * pages and layout models remain hi_res/OCR strategies behind pluggable seams
 * (the reference also delegates those to external models).
 */
object PdfPartitioner {

  private[sources] val StreamRe = "(?s)stream\r?\n(.*?)endstream".r

  def isPdf(bytes: Array[Byte]): Boolean =
    bytes.length > 4 && bytes(0) == '%' && bytes(1) == 'P' && bytes(2) == 'D' && bytes(3) == 'F'

  // ------------------------------------------------------------------ filters

  /** Decompression-bomb ceiling for a single Flate stream. Real content
    * streams top out in the tens of MB; a crafted stream expanding past this
    * is REJECTED whole (None), never truncated — a silently-truncated stream
    * would corrupt downstream parsing (the reference's
    * `_decode_pdfstream_with_limit` makes the same reject-don't-mutate
    * choice, pdfminer_utils.py:155-205). */
  private[sources] val MaxInflatedBytes: Int = 256 << 20

  private[sources] def inflate(data: Array[Byte],
      maxBytes: Int = MaxInflatedBytes): Option[Array[Byte]] = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(math.min(data.length * 4, 1 << 20))
      val buf = new Array[Byte](8192)
      var n = inf.inflate(buf)
      while (n > 0 && out.size() <= maxBytes) { out.write(buf, 0, n); n = inf.inflate(buf) }
      if (out.size() > maxBytes) None // bomb: reject before materializing more
      else if (out.size() == 0) None
      else Some(out.toByteArray)
    } catch { case _: Exception => None } finally inf.end()
  }

  /** Reverse the PNG row predictor (filter byte + Columns data bytes per
    * row, 1 byte/pixel — the shape xref streams use, ISO 32000-1 §7.4.4.4):
    * None/Sub/Up/Average/Paeth. Malformed tails (short rows) are dropped. */
  private[sources] def unpredictPng(data: Array[Byte], columns: Int): Array[Byte] = {
    if (columns <= 0) return data
    val rowLen = columns + 1
    val out = new java.io.ByteArrayOutputStream(data.length)
    var prev = new Array[Byte](columns)
    data.grouped(rowLen).filter(_.length == rowLen).foreach { row =>
      val cur = java.util.Arrays.copyOfRange(row, 1, rowLen)
      (row(0) & 0xFF) match {
        case 0 => ()
        case 1 => // Sub: left neighbor (bpp = 1)
          for (i <- 1 until columns) cur(i) = (cur(i) + cur(i - 1)).toByte
        case 2 => // Up
          for (i <- 0 until columns) cur(i) = (cur(i) + prev(i)).toByte
        case 3 => // Average
          for (i <- 0 until columns) {
            val left = if (i > 0) cur(i - 1) & 0xFF else 0
            cur(i) = (cur(i) + ((left + (prev(i) & 0xFF)) >> 1)).toByte
          }
        case 4 => // Paeth
          for (i <- 0 until columns) {
            val a = if (i > 0) cur(i - 1) & 0xFF else 0
            val b = prev(i) & 0xFF
            val c = if (i > 0) prev(i - 1) & 0xFF else 0
            val p = a + b - c
            val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            cur(i) = (cur(i) + pred).toByte
          }
        case _ => ()
      }
      out.write(cur, 0, columns)
      prev = cur
    }
    out.toByteArray
  }

  /** ASCII85 (base-85) decode, `z` shorthand and `~>` terminator handled. */
  private[sources] def ascii85(data: Array[Byte]): Option[Array[Byte]] = {
    try {
      val out = new java.io.ByteArrayOutputStream(data.length)
      var tuple = 0L
      var count = 0
      var i = 0
      var done = false
      while (i < data.length && !done) {
        val c = data(i).toChar
        if (c == '~') done = true
        else if (c == 'z' && count == 0) out.write(Array[Byte](0, 0, 0, 0))
        else if (c >= '!' && c <= 'u') {
          tuple = tuple * 85 + (c - '!')
          count += 1
          if (count == 5) {
            out.write(((tuple >> 24) & 0xFF).toInt); out.write(((tuple >> 16) & 0xFF).toInt)
            out.write(((tuple >> 8) & 0xFF).toInt); out.write((tuple & 0xFF).toInt)
            tuple = 0; count = 0
          }
        }
        i += 1
      }
      if (count > 0) {
        // partial group: pad with 'u', emit count-1 bytes
        var t = tuple
        (count until 5).foreach(_ => t = t * 85 + 84)
        val bs = Array(((t >> 24) & 0xFF).toByte, ((t >> 16) & 0xFF).toByte,
          ((t >> 8) & 0xFF).toByte, (t & 0xFF).toByte)
        out.write(bs, 0, count - 1)
      }
      Some(out.toByteArray)
    } catch { case _: Exception => None }
  }

  // ------------------------------------------------------------------ strings

  /** Decode a PDF paren-string body: escapes `\\ \( \) \n \r \t` + octal `\ddd`.
    * The result is a byte-string (one char per byte) awaiting font decoding. */
  private[sources] def decodePdfString(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        val n = s.charAt(i + 1)
        n match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' | 'f' => i += 2
          case '(' | ')' | '\\' => sb.append(n); i += 2
          case d if d >= '0' && d <= '7' =>
            val end = math.min(i + 4, s.length)
            val oct = s.substring(i + 1, end).takeWhile(ch => ch >= '0' && ch <= '7').take(3)
            sb.append(Integer.parseInt(oct, 8).toChar)
            i += 1 + oct.length
          case '\n' => i += 2 // line continuation
          case _ => i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private[sources] def decodeHexString(h: String): String = {
    val clean = h.replaceAll("\\s", "")
    val sb = new StringBuilder
    var i = 0
    while (i + 1 < clean.length) {
      sb.append(Integer.parseInt(clean.substring(i, i + 2), 16).toChar)
      i += 2
    }
    sb.toString
  }

  private def hexToBytes(h: String): Array[Byte] = {
    val clean = h.replaceAll("\\s", "")
    val out = new Array[Byte](clean.length / 2)
    var i = 0
    while (i + 1 < clean.length) {
      out(i / 2) = Integer.parseInt(clean.substring(i, i + 2), 16).toByte
      i += 2
    }
    out
  }

  // ------------------------------------------------------------------ objects

  private final case class PdfObj(num: Int, gen: Int, dict: String,
      dataStart: Int, dataEnd: Int,
      /** byte offset of the `N G obj` header in the raw file (-1 for ObjStm
        * members) — how an xref entry's offset maps back to a parsed object */
      objStart: Int = -1) {
    def hasStream: Boolean = dataEnd > dataStart
  }

  private val ObjHeadRe = """(\d+)\s+(\d+)\s+obj\b""".r
  private val LengthRe = """/Length\s+(\d+)(?![\d\s]+R)""".r
  private val RefRe = """(\d+)\s+\d+\s+R""".r

  private def parseObjects(raw: String): Vector[PdfObj] = {
    val out = Vector.newBuilder[PdfObj]
    ObjHeadRe.findAllMatchIn(raw).foreach { m =>
      val start = m.end
      val streamKw = raw.indexOf("stream", start)
      val endObj = raw.indexOf("endobj", start)
      // "stream" must belong to this object and be the keyword (followed by EOL)
      val isStream = streamKw >= 0 && (endObj < 0 || streamKw < endObj) &&
        streamKw + 6 < raw.length &&
        (raw.charAt(streamKw + 6) == '\r' || raw.charAt(streamKw + 6) == '\n')
      if (isStream) {
        val dict = raw.substring(start, streamKw)
        var dataStart = streamKw + 6
        if (raw.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < raw.length && raw.charAt(dataStart) == '\n') dataStart += 1
        // prefer the declared /Length when it checks out (binary data can
        // contain the bytes of "endstream")
        val byLength = LengthRe.findFirstMatchIn(dict).map(_.group(1).toInt)
          .filter { len =>
            val p = dataStart + len
            p <= raw.length && raw.indexOf("endstream", p) >= 0 &&
              raw.indexOf("endstream", p) - p < 4
          }
        val dataEnd = byLength.map(dataStart + _).getOrElse {
          val e = raw.indexOf("endstream", dataStart)
          if (e < 0) dataStart else e
        }
        out += PdfObj(m.group(1).toInt, m.group(2).toInt, dict, dataStart,
          dataEnd, m.start)
      } else {
        val end = if (endObj < 0) raw.length else endObj
        out += PdfObj(m.group(1).toInt, m.group(2).toInt,
          raw.substring(start, end), 0, 0, m.start)
      }
    }
    out.result()
  }

  /** Naive dict-value extraction: the token(s) following `/key`. Handles refs,
    * names, numbers, balanced arrays and dicts. */
  private def dictValue(dict: String, key: String): Option[String] = {
    val k = "/" + key
    var i = dict.indexOf(k)
    while (i >= 0) {
      val after = i + k.length
      // must be a full name token (next char not alphanumeric)
      if (after >= dict.length || !dict.charAt(after).isLetterOrDigit) {
        var j = after
        while (j < dict.length && (dict.charAt(j) == ' ' || dict.charAt(j) == '\n' ||
          dict.charAt(j) == '\r' || dict.charAt(j) == '\t')) j += 1
        if (j < dict.length) {
          dict.charAt(j) match {
            case '[' =>
              var depth = 0; var e = j
              while (e < dict.length && { val c = dict.charAt(e)
                if (c == '[') depth += 1 else if (c == ']') depth -= 1; depth > 0 || c != ']' }) e += 1
              return Some(dict.substring(j, math.min(e + 1, dict.length)))
            case '<' if j + 1 < dict.length && dict.charAt(j + 1) == '<' =>
              var depth = 0; var e = j
              while (e + 1 < dict.length && {
                if (dict.charAt(e) == '<' && dict.charAt(e + 1) == '<') { depth += 1; true }
                else if (dict.charAt(e) == '>' && dict.charAt(e + 1) == '>') {
                  depth -= 1; depth > 0
                } else true
              }) e += 1
              return Some(dict.substring(j, math.min(e + 2, dict.length)))
            case '<' =>
              val e = dict.indexOf('>', j)
              return Some(dict.substring(j, if (e < 0) dict.length else e + 1))
            case '(' =>
              var e = j + 1; var depth = 1
              while (e < dict.length && depth > 0) {
                val c = dict.charAt(e)
                if (c == '\\') e += 1
                else if (c == '(') depth += 1
                else if (c == ')') depth -= 1
                e += 1
              }
              return Some(dict.substring(j, e))
            case _ =>
              // ref "12 0 R", name "/X", or number
              val refM = RefRe.findPrefixMatchOf(dict.substring(j))
              if (refM.isDefined) return Some(refM.get.matched)
              var e = j
              if (dict.charAt(e) == '/') e += 1
              while (e < dict.length && !" \t\r\n/<>[]()".contains(dict.charAt(e))) e += 1
              return Some(dict.substring(j, e))
          }
        }
      }
      i = dict.indexOf(k, i + 1)
    }
    None
  }

  // ------------------------------------------------------------------ crypto

  private val PadBytes: Array[Byte] = Array(0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68,
    0x3E, 0x80, 0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  /** Standard security handler with the empty user password (PDF-1.7 §7.6.3). */
  /** `v5` = AES-256 (R5/R6): objects encrypt with the 32-byte file key
    * directly — no per-object MD5 derivation (ISO 32000-2 §7.6.3.3). */
  private final class Decryptor(fileKey: Array[Byte], aes: Boolean,
      v5: Boolean = false) {
    private def md5(parts: Array[Byte]*): Array[Byte] = {
      val d = java.security.MessageDigest.getInstance("MD5")
      parts.foreach(d.update)
      d.digest()
    }

    def decrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte] = {
      val ext = Array[Byte]((num & 0xFF).toByte, ((num >> 8) & 0xFF).toByte,
        ((num >> 16) & 0xFF).toByte, (gen & 0xFF).toByte, ((gen >> 8) & 0xFF).toByte)
      val salt = if (aes) Array[Byte](0x73, 0x41, 0x6C, 0x54) else Array.emptyByteArray
      val objKey =
        if (v5) fileKey
        else md5(fileKey, ext, salt).take(math.min(fileKey.length + 5, 16))
      try {
        if (aes) {
          if (data.length < 16) return Array.emptyByteArray
          val cipher = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
          cipher.init(javax.crypto.Cipher.DECRYPT_MODE,
            new javax.crypto.spec.SecretKeySpec(objKey, "AES"),
            new javax.crypto.spec.IvParameterSpec(data.take(16)))
          val out = cipher.doFinal(data.drop(16))
          // strip PKCS#5 padding
          if (out.nonEmpty) {
            val pad = out.last & 0xFF
            if (pad >= 1 && pad <= 16 && pad <= out.length) out.dropRight(pad) else out
          } else out
        } else {
          val cipher = javax.crypto.Cipher.getInstance("RC4")
          cipher.init(javax.crypto.Cipher.DECRYPT_MODE,
            new javax.crypto.spec.SecretKeySpec(objKey, "RC4"))
          cipher.doFinal(data)
        }
      } catch { case _: Exception => Array.emptyByteArray }
    }
  }

  /** Raw RC4 (PDF-1.7 §7.6.2) — used for the /U verification round, where
    * javax.crypto's provider-dependent minimum key sizes get in the way. */
  private def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    for (i <- 0 until 256) {
      j = (j + s(i) + key(i % key.length)) & 0xFF
      val t = s(i); s(i) = s(j); s(j) = t
    }
    var i = 0; j = 0
    data.map { b =>
      i = (i + 1) & 0xFF
      j = (j + s(i)) & 0xFF
      val t = s(i); s(i) = s(j); s(j) = t
      (b ^ s((s(i) + s(j)) & 0xFF)).toByte
    }
  }

  private def setupDecryptor(raw: String, objs: Map[Int, PdfObj],
      password: String = ""): Option[Decryptor] = {
    val encRef = """/Encrypt\s+(\d+)\s+\d+\s+R""".r.findAllMatchIn(raw).toSeq.lastOption
      .map(_.group(1).toInt)
    val enc = encRef.flatMap(objs.get).map(_.dict).getOrElse {
      val i = raw.lastIndexOf("/Encrypt")
      if (i < 0) return None else return None
    }
    if (!enc.contains("/Standard")) return None
    val v = dictValue(enc, "V").flatMap(s => s.toIntOption).getOrElse(0)
    val r = dictValue(enc, "R").flatMap(_.toIntOption).getOrElse(2)
    val lengthBits = dictValue(enc, "Length").flatMap(_.toIntOption).getOrElse(40)
    val p = dictValue(enc, "P").flatMap(_.toLongOption).getOrElse(-1L)
    val aes = enc.contains("AESV2")
    def encString(k: String): Option[Array[Byte]] = dictValue(enc, k).map { s =>
      if (s.startsWith("<")) hexToBytes(s.stripPrefix("<").stripSuffix(">"))
      else decodePdfString(s.stripPrefix("(").stripSuffix(")")).map(_.toByte).toArray
    }
    val oBytes = encString("O").getOrElse(return None)
    val uBytes = encString("U").getOrElse(Array.emptyByteArray)
    // R5 (deprecated AESV3 extension) / R6 (PDF 2.0): SHA-2 password
    // verification + AES-256, a different world from the MD5/RC4 algorithms
    // below — handled whole in [[setupDecryptorV5]] (pdfminer likewise
    // branches in `pdfdocument.py` PDFStandardSecurityHandlerV5)
    if (r >= 5) return setupDecryptorV5(enc, r, oBytes, uBytes, password,
      encString)
    // first file identifier from the last /ID entry
    val idHex = """/ID\s*\[\s*<([0-9A-Fa-f]+)>""".r.findAllMatchIn(raw).toSeq.lastOption
      .map(_.group(1)).getOrElse("")
    val idBytes = hexToBytes(idHex)
    val keyLen = if (v <= 1) 5 else lengthBits / 8
    // Algorithm 2: the file key from a (padded) user password
    def fileKey(pw: String): Array[Byte] = {
      val pwBytes = pw.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      val d = java.security.MessageDigest.getInstance("MD5")
      d.update((pwBytes ++ PadBytes).take(32))
      d.update(oBytes.take(32))
      val pLe = Array[Byte]((p & 0xFF).toByte, ((p >> 8) & 0xFF).toByte,
        ((p >> 16) & 0xFF).toByte, ((p >> 24) & 0xFF).toByte)
      d.update(pLe)
      d.update(idBytes)
      if (r >= 4 && !enc.contains("/EncryptMetadata true") && enc.contains("/EncryptMetadata"))
        d.update(Array[Byte](-1, -1, -1, -1))
      var key = d.digest().take(keyLen)
      if (r >= 3) (0 until 50).foreach { _ =>
        key = java.security.MessageDigest.getInstance("MD5").digest(key).take(keyLen)
      }
      key
    }
    // Algorithms 4/5: does this key reproduce /U?
    def userMatches(key: Array[Byte]): Boolean =
      if (r <= 2) java.util.Arrays.equals(rc4(key, PadBytes), uBytes.take(32))
      else {
        val h = java.security.MessageDigest.getInstance("MD5")
        h.update(PadBytes); h.update(idBytes)
        var u = rc4(key, h.digest())
        for (i <- 1 to 19) u = rc4(key.map(b => (b ^ i).toByte), u)
        java.util.Arrays.equals(u, uBytes.take(16))
      }
    // try the supplied user password, then the empty one (owner-restricted
    // files open with an empty user password); a file whose password is
    // wrong yields NO decryptor — streams stay opaque and extraction is
    // empty, never mojibake. When /U is absent or short (minimal synthetic
    // files) the key is UNVERIFIABLE: only the empty-password key is
    // accepted (the pre-verification behavior) — accepting an unverifiable
    // caller-supplied password would decrypt to mojibake on a wrong guess.
    if (uBytes.length < 16) Some(new Decryptor(fileKey(""), aes))
    else Seq(password, "").distinct
      .map(fileKey)
      .find(userMatches)
      .map(new Decryptor(_, aes))
  }

  /**
   * R5/R6 (AES-256) password verification and file-key recovery — ISO
   * 32000-2 §7.6.4.3.3/.4 (Algorithms 2.A/2.B) and §7.6.4.4.9/.10/.11/.12;
   * pdfminer's `PDFStandardSecurityHandlerV5` is the behavioral spec. `/U`
   * and `/O` are 48 bytes: hash(32) ‖ validation salt(8) ‖ key salt(8); the
   * file key is AES-256-CBC-decrypted out of `/UE` (user) or `/OE` (owner,
   * with the whole 48-byte `/U` as extra hash input). R5 hashes once with
   * SHA-256; R6 runs the hardened Algorithm 2.B iteration. V5 objects
   * encrypt with the file key DIRECTLY (no per-object MD5 derivation).
   * A password that verifies as neither user nor owner yields no decryptor —
   * opaque extraction, never mojibake, same contract as R2-R4.
   */
  private def setupDecryptorV5(enc: String, r: Int, oBytes: Array[Byte],
      uBytes: Array[Byte], password: String,
      encString: String => Option[Array[Byte]]): Option[Decryptor] = {
    if (uBytes.length < 48 || oBytes.length < 48) return None
    val ueBytes = encString("UE").getOrElse(return None)
    val oeBytes = encString("OE").getOrElse(Array.emptyByteArray)
    val u48 = uBytes.take(48)
    def sha(bits: Int, data: Array[Byte]): Array[Byte] =
      java.security.MessageDigest.getInstance(s"SHA-$bits").digest(data)
    def aesCbc(mode: Int, key: Array[Byte], iv: Array[Byte],
        data: Array[Byte]): Array[Byte] = {
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(mode, new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.IvParameterSpec(iv))
      c.doFinal(data)
    }
    // Algorithm 2.B (R6 hardened hash); for R5 a single SHA-256 round.
    // `udata` is the 48-byte /U string when verifying the OWNER password,
    // empty otherwise.
    def hash2(pw: Array[Byte], salt: Array[Byte],
        udata: Array[Byte]): Array[Byte] = {
      var k = sha(256, pw ++ salt ++ udata)
      if (r == 5) return k
      var i = 0
      var e = Array.emptyByteArray
      while (i < 64 || (e.last & 0xFF) > i - 32) {
        val k1Unit = pw ++ k ++ udata
        val k1 = Array.fill(64)(k1Unit).flatten
        e = aesCbc(javax.crypto.Cipher.ENCRYPT_MODE,
          k.take(16), k.slice(16, 32), k1)
        (e.take(16).map(_ & 0xFF).sum % 3) match {
          case 0 => k = sha(256, e)
          case 1 => k = sha(384, e)
          case 2 => k = sha(512, e)
        }
        i += 1
      }
      k.take(32)
    }
    // UTF-8, truncated to 127 bytes (§7.6.4.3.2; SASLprep is a no-op for
    // the ASCII passwords this path sees)
    def pwBytes(pw: String): Array[Byte] =
      pw.getBytes(java.nio.charset.StandardCharsets.UTF_8).take(127)
    def tryPassword(pw: String): Option[Array[Byte]] = {
      val p = pwBytes(pw)
      val zeroIv = new Array[Byte](16)
      if (java.util.Arrays.equals(
          hash2(p, uBytes.slice(32, 40), Array.emptyByteArray),
          uBytes.take(32))) {
        // user password: intermediate key from the key salt unlocks /UE
        Some(aesCbc(javax.crypto.Cipher.DECRYPT_MODE,
          hash2(p, uBytes.slice(40, 48), Array.emptyByteArray),
          zeroIv, ueBytes.take(32)))
      } else if (oeBytes.length >= 32 && java.util.Arrays.equals(
          hash2(p, oBytes.slice(32, 40), u48), oBytes.take(32))) {
        Some(aesCbc(javax.crypto.Cipher.DECRYPT_MODE,
          hash2(p, oBytes.slice(40, 48), u48), zeroIv, oeBytes.take(32)))
      } else None
    }
    try Seq(password, "").distinct.iterator.flatMap(tryPassword(_)).nextOption()
      .map(new Decryptor(_, aes = true, v5 = true))
    catch { case _: java.security.GeneralSecurityException => None }
  }

  // ------------------------------------------------------------------ fonts

  /** A content-stream font: ToUnicode CMap + simple-encoding fallbacks. */
  private[sources] final case class PdfFont(
      toUnicode: Map[Int, String],
      twoByte: Boolean,
      differences: Map[Int, String],
      /** code → glyph advance in 1/1000 text-space units: simple-font
        * `/FirstChar`+`/Widths`, or the CID descendant's `/W` array. */
      widths: Map[Int, Double] = Map.empty,
      /** `/DW` (CID) or `/MissingWidth` fallback advance. */
      defaultWidth: Double = 500.0,
      /** `/Encoding /MacRomanEncoding` (direct or as `/BaseEncoding`): high
        * bytes decode through the Mac OS Roman table instead of cp1252 —
        * 0xDE/0xDF are the fi/fl ligatures there, not Þ/ß (PDF 32000-1
        * Annex D.2; the layout-parser-paper PDFs ship MacRoman fonts). */
      macRoman: Boolean = false)

  // compact Adobe-glyph-list subset: ligatures, punctuation, and the common
  // named glyphs that appear in /Differences arrays
  private val GlyphNames: Map[String, String] = Map(
    "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"", "numbersign" -> "#",
    "dollar" -> "$", "percent" -> "%", "ampersand" -> "&", "quotesingle" -> "'",
    "parenleft" -> "(", "parenright" -> ")", "asterisk" -> "*", "plus" -> "+",
    "comma" -> ",", "hyphen" -> "-", "period" -> ".", "slash" -> "/",
    "zero" -> "0", "one" -> "1", "two" -> "2", "three" -> "3", "four" -> "4",
    "five" -> "5", "six" -> "6", "seven" -> "7", "eight" -> "8", "nine" -> "9",
    "colon" -> ":", "semicolon" -> ";", "less" -> "<", "equal" -> "=",
    "greater" -> ">", "question" -> "?", "at" -> "@", "bracketleft" -> "[",
    "backslash" -> "\\", "bracketright" -> "]", "asciicircum" -> "^",
    "underscore" -> "_", "grave" -> "`", "braceleft" -> "{", "bar" -> "|",
    "braceright" -> "}", "asciitilde" -> "~",
    "fi" -> "ﬁ", "fl" -> "ﬂ", "ffi" -> "ﬃ", "ffl" -> "ﬄ", "ff" -> "ﬀ",
    "quoteleft" -> "‘", "quoteright" -> "’",
    "quotedblleft" -> "“", "quotedblright" -> "”",
    "endash" -> "–", "emdash" -> "—", "bullet" -> "•",
    "ellipsis" -> "…", "dagger" -> "†", "daggerdbl" -> "‡",
    "trademark" -> "™", "copyright" -> "©", "registered" -> "®",
    "degree" -> "°", "eacute" -> "é", "egrave" -> "è", "agrave" -> "à",
    "ccedilla" -> "ç", "adieresis" -> "ä", "odieresis" -> "ö",
    "udieresis" -> "ü", "ntilde" -> "ñ",
    // spacing accents (TeX/Nimbus /Differences use the modifier forms)
    "breve" -> "˘", "ring" -> "˚", "caron" -> "ˇ", "circumflex" -> "ˆ",
    "dieresis" -> "¨", "acute" -> "´", "cedilla" -> "¸", "tilde" -> "˜",
    "macron" -> "¯", "dotaccent" -> "˙", "hungarumlaut" -> "˝",
    "ogonek" -> "˛", "dotlessi" -> "ı",
    // TeX math/symbol glyphs (CMSY/CMMI builtin encodings carry these at
    // ASCII code points — without the names a dagger decodes as 'y')
    "asteriskmath" -> "∗", "minus" -> "−", "multiply" -> "×",
    "plusminus" -> "±", "arrowright" -> "→", "arrowleft" -> "←",
    "arrowup" -> "↑", "arrowdown" -> "↓", "angbracketleft" -> "⟨",
    "angbracketright" -> "⟩", "element" -> "∈", "lambda" -> "λ",
    "infinity" -> "∞", "lessequal" -> "≤", "greaterequal" -> "≥",
    "approxequal" -> "≈", "equivalence" -> "≡", "periodcentered" -> "·",
    "section" -> "§", "paragraph" -> "¶", "sterling" -> "£",
    "germandbls" -> "ß", "oslash" -> "ø", "ae" -> "æ", "oe" -> "œ",
    "AE" -> "Æ", "OE" -> "Œ", "aring" -> "å", "exclamdown" -> "¡",
    "questiondown" -> "¿", "cent" -> "¢", "florin" -> "ƒ")

  private def glyphToText(name: String): Option[String] = {
    if (name.length == 1) return Some(name)
    GlyphNames.get(name).orElse {
      // uniXXXX AGL form
      if (name.startsWith("uni") && name.length >= 7)
        scala.util.Try(Integer.parseInt(name.substring(3, 7), 16).toChar.toString).toOption
      else None
    }
  }

  private val BfCharRe = "(?s)beginbfchar(.*?)endbfchar".r
  private val BfRangeRe = "(?s)beginbfrange(.*?)endbfrange".r
  private val CodespaceRe = "(?s)begincodespacerange(.*?)endcodespacerange".r
  private val HexTokRe = "<([0-9A-Fa-f]+)>".r
  private val BfRangeEntryRe =
    "(?s)<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>\\s*(<[0-9A-Fa-f]+>|\\[(?:\\s*<[0-9A-Fa-f]*>)*\\s*\\])".r

  private def utf16Hex(h: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i + 3 < h.length + 1 && i + 4 <= h.length) {
      sb.append(Integer.parseInt(h.substring(i, i + 4), 16).toChar)
      i += 4
    }
    sb.toString
  }

  /** Parse a ToUnicode CMap stream into (code→text, twoByte).
    *
    * The code width comes from the WIDTH OF THE SOURCE CODES in the
    * bfchar/bfrange entries, not the codespacerange: subset-font ToUnicode
    * streams routinely declare `<0000> <FFFF>` while mapping 1-byte codes
    * (pdfminer keys on the font type the same way). */
  /** Total-mapping budget for one ToUnicode CMap: a crafted stream stacking
    * full-codespace bfranges would otherwise allocate without bound. When
    * exceeded the WHOLE map is discarded (no partial map with holes) —
    * mirroring the reference's `_MAX_CODE2CID_MAPPINGS` budget semantics. */
  private[sources] val MaxToUnicodeMappings: Int = 131072

  /** Bounded hex-code parse: ToUnicode source codes are at most 3 bytes in
    * any real font; a crafted token like `<FFFFFFFF>` must be SKIPPED, not
    * crash the task with NumberFormatException (the budget below guards
    * allocation; this guards the parse itself). */
  private def hexCode(s: String): Option[Int] =
    if (s.isEmpty || s.length > 6) None else Some(Integer.parseInt(s, 16))

  private[sources] def parseToUnicode(cmap: String): (Map[Int, String], Boolean) = {
    val map = mutable.Map.empty[Int, String]
    var twoByte = false
    var over = false // budget blown: stop allocating, discard at the end
    def put(c: Int, text: String): Unit =
      if (map.size >= MaxToUnicodeMappings) over = true
      else map(c) = text
    BfCharRe.findAllMatchIn(cmap).foreach { m =>
      val toks = HexTokRe.findAllMatchIn(m.group(1)).map(_.group(1)).toVector
      toks.grouped(2).foreach {
        case Vector(src, dst) if !over =>
          hexCode(src).foreach { code =>
            if (src.length > 2) twoByte = true
            put(code, utf16Hex(dst))
          }
        case _ => ()
      }
    }
    BfRangeRe.findAllMatchIn(cmap).foreach { m =>
      BfRangeEntryRe.findAllMatchIn(m.group(1)).foreach { e =>
        for (lo <- hexCode(e.group(1)); hi <- hexCode(e.group(2)); if !over) {
          if (e.group(1).length > 2) twoByte = true
          val dst = e.group(3)
          if (dst.startsWith("[")) {
            val dsts = HexTokRe.findAllMatchIn(dst).map(_.group(1)).toVector
            dsts.zipWithIndex.foreach { case (d, i) =>
              if (lo + i <= hi && !over) put(lo + i, utf16Hex(d))
            }
          } else {
            val base = dst.stripPrefix("<").stripSuffix(">")
            val baseText = utf16Hex(base)
            if (baseText.nonEmpty) {
              val baseLast = baseText.last
              (lo to math.min(hi, lo + 65535)).foreach { c =>
                if (!over)
                  put(c, baseText.dropRight(1) + (baseLast + (c - lo)).toChar)
              }
            }
          }
        }
      }
    }
    if (over) (Map.empty, twoByte) else (map.toMap, twoByte)
  }

  private val DiffNameRe = "(\\d+)|/([A-Za-z0-9.]+)".r

  /** `dup 121 /dagger put` entries in a Type1 program's cleartext header. */
  private val Type1EncodingPutRe =
    """dup\s+(\d+)\s*/([A-Za-z0-9._]+)\s+put""".r

  private def parseDifferences(arr: String): Map[Int, String] = {
    val out = mutable.Map.empty[Int, String]
    var code = 0
    DiffNameRe.findAllMatchIn(arr).foreach { m =>
      if (m.group(1) != null) code = m.group(1).toInt
      else {
        glyphToText(m.group(2)).foreach(t => out(code) = t)
        code += 1
      }
    }
    out.toMap
  }

  // WinAnsi (cp1252) 0x80-0x9F differences from Latin-1
  private val WinAnsiHigh: Map[Int, Char] = Map(
    0x80 -> '€', 0x82 -> '‚', 0x83 -> 'ƒ', 0x84 -> '„',
    0x85 -> '…', 0x86 -> '†', 0x87 -> '‡', 0x88 -> 'ˆ',
    0x89 -> '‰', 0x8A -> 'Š', 0x8B -> '‹', 0x8C -> 'Œ',
    0x8E -> 'Ž', 0x91 -> '‘', 0x92 -> '’', 0x93 -> '“',
    0x94 -> '”', 0x95 -> '•', 0x96 -> '–', 0x97 -> '—',
    0x98 -> '˜', 0x99 -> '™', 0x9A -> 'š', 0x9B -> '›',
    0x9C -> 'œ', 0x9E -> 'ž', 0x9F -> 'Ÿ')

  // Mac OS Roman 0x80-0xFF (PDF 32000-1 Annex D.2 MacRomanEncoding high range)
  private val MacRomanHigh: Map[Int, Char] = (
    "\u00c4\u00c5\u00c7\u00c9\u00d1\u00d6\u00dc\u00e1\u00e0\u00e2\u00e4\u00e3" +
    "\u00e5\u00e7\u00e9\u00e8\u00ea\u00eb\u00ed\u00ec\u00ee\u00ef\u00f1\u00f3" +
    "\u00f2\u00f4\u00f6\u00f5\u00fa\u00f9\u00fb\u00fc\u2020\u00b0\u00a2\u00a3" +
    "\u00a7\u2022\u00b6\u00df\u00ae\u00a9\u2122\u00b4\u00a8\u2260\u00c6\u00d8" +
    "\u221e\u00b1\u2264\u2265\u00a5\u00b5\u2202\u2211\u220f\u03c0\u222b\u00aa" +
    "\u00ba\u03a9\u00e6\u00f8\u00bf\u00a1\u00ac\u221a\u0192\u2248\u2206\u00ab" +
    "\u00bb\u2026\u00a0\u00c0\u00c3\u00d5\u0152\u0153\u2013\u2014\u201c\u201d" +
    "\u2018\u2019\u00f7\u25ca\u00ff\u0178\u2044\u20ac\u2039\u203a\ufb01\ufb02" +
    "\u2021\u00b7\u201a\u201e\u2030\u00c2\u00ca\u00c1\u00cb\u00c8\u00cd\u00ce" +
    "\u00cf\u00cc\u00d3\u00d4\uf8ff\u00d2\u00da\u00db\u00d9\u0131\u02c6\u02dc" +
    "\u00af\u02d8\u02d9\u02da\u00b8\u02dd\u02db\u02c7")
    .zipWithIndex.map { case (c, i) => (0x80 + i) -> c }.toMap ++ Map(
    // PDF Annex D.2 diverges from the modern Mac OS Roman charset on two
    // codes (pdfminer's latin_enc agrees): 0xCA is the glyph `space`, not
    // NBSP, and 0xDB is `currency` (¤), not the euro Apple later assigned
    0xCA -> ' ', 0xDB -> '¤')

  /** Decode a byte-string through `font` (None → identity Latin-1). */
  private[sources] def decodeWithFont(s: String, font: Option[PdfFont]): String =
    font match {
      case None => s
      case Some(f) if f.twoByte =>
        val sb = new StringBuilder
        var i = 0
        while (i + 1 < s.length) {
          val code = (s.charAt(i) << 8) | (s.charAt(i + 1) & 0xFF)
          f.toUnicode.get(code).foreach(sb.append)
          i += 2
        }
        sb.toString
      case Some(f) =>
        val sb = new StringBuilder
        s.foreach { c =>
          val code = c & 0xFF
          val high = if (f.macRoman) MacRomanHigh else WinAnsiHigh
          f.toUnicode.get(code)
            .orElse(f.differences.get(code))
            .orElse(high.get(code).map(_.toString)) match {
            case Some(t) => sb.append(t)
            case None => sb.append(c)
          }
        }
        sb.toString
    }

  /** Advance of a raw (undecoded) shown string in 1/1000 text-space units. */
  private[sources] def textAdvance(s: String, font: Option[PdfFont]): Double =
    font match {
      case None => s.length * 500.0
      case Some(f) if f.twoByte =>
        var i = 0
        var a = 0.0
        while (i + 1 < s.length) {
          val code = (s.charAt(i) << 8) | (s.charAt(i + 1) & 0xFF)
          a += f.widths.getOrElse(code, f.defaultWidth)
          i += 2
        }
        a
      case Some(f) =>
        s.foldLeft(0.0)((a, c) => a + f.widths.getOrElse(c & 0xFF, f.defaultWidth))
    }

  // ------------------------------------------------------------------ content

  // text-showing / positioning / font operator scan within content
  private val TokenRe =
    ("""\(((?:[^()\\]|\\.)*)\)\s*(Tj|'|")""" + // (s) Tj / ' / "
      """|<([0-9A-Fa-f\s]+)>\s*Tj""" + // <hex> Tj
      """|\[((?:\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>|[-0-9.\s])*)\]\s*TJ""" + // [..] TJ
      """|/([A-Za-z0-9.+_-]+)\s+(-?[0-9.]+)\s+Tf""" + // 5 font, 6 size
      """|(-?[0-9.]+)\s+(-?[0-9.]+)\s+(Td|TD)""" + // 7 tx, 8 ty, 9 op
      """|(-?[0-9.]+)\s+(-?[0-9.]+)\s+(-?[0-9.]+)\s+(-?[0-9.]+)\s+(-?[0-9.]+)\s+(-?[0-9.]+)\s+Tm""" + // 10-15 a b c d e f
      """|(-?[0-9.]+)\s+(-?[0-9.]+)\s+(-?[0-9.]+)\s+(-?[0-9.]+)\s+(-?[0-9.]+)\s+(-?[0-9.]+)\s+cm""" + // 16-21 a b c d e f
      """|(?<![A-Za-z])([qQ])(?![A-Za-z0-9*])""" + // 22 gsave/grestore
      """|(-?[0-9.]+)\s+TL""" + // 23 leading
      """|T\*""" +
      // CONSUME strings bound to other operators (BDC /ActualText, TJ-less
      // arrays, …) so a literal "q"/"Q"/number run inside them can't corrupt
      // the CTM state (non-capturing — group numbers above stay stable)
      """|\((?:[^()\\]|\\.)*\)""" +
      """|<[0-9A-Fa-f\s]*>""").r

  private val TjPartRe = """\(((?:[^()\\]|\\.)*)\)|<([0-9A-Fa-f\s]*)>|(-?[0-9.]+)""".r

  /**
   * Extract reading text from one decompressed content stream: lines split on
   * y-motion, strings decoded through the active font.
   *
   * Two assembly models, chosen per stream:
   *  - **width-aware** (any page font carries real glyph advances): the text
   *    matrix is tracked as an absolute (lineX, lineY) + pen position, a show
   *    starts a new line only when the EFFECTIVE y moved (so per-glyph
   *    `BT … Tm Td Tj ET` layouts — one text object per glyph, common from
   *    Skia/Chromium printing — reassemble into words), and an x-gap beyond
   *    0.18 em inserts the word space the layout implied;
   *  - **legacy** (no width data, e.g. minimal synthetic PDFs): y-delta
   *    heuristics only, exactly the pre-width behavior.
   */
  private[sources] def extractText(content: String,
      fonts: Map[String, PdfFont] = Map.empty): String = {
    val widthAware = fonts.valuesIterator.exists(_.widths.nonEmpty)
    // (line-text, separator-AFTER) pairs: "\n" within a text block, "\n\n"
    // between blocks (a y-gap beyond normal leading — pdfminer's textbox cut);
    // the separator is decided when the FOLLOWING line's position is known
    val lines = mutable.ArrayBuffer.empty[(StringBuilder, String)]
    var cur = new StringBuilder
    var fontSize = 12.0
    var tmA, tmD = 1.0 // text-matrix scale (e.g. `11 0 0 11 x y Tm` at Tf 1)
    var tmB, tmC = 0.0 // rotation/skew components — tracked for detection
    var ctmA, ctmD = 1.0
    var ctmB, ctmC = 0.0
    var ctmE, ctmF = 0.0
    def emScale: Double = fontSize * math.abs(tmA) * math.abs(ctmA)
    // rotation-shaped effective text→device 2x2 (Tm · CTM, row-vector
    // convention): both diagonal terms vanish while the off-diagonals carry
    // the run. Width-aware pen geometry is meaningless for such runs — the
    // baseline advances along b/c, not x — so shows drop to the legacy
    // stream-order line logic, mirroring hi_res's geometry skip
    // (PdfHiRes ctmRotated). pdfminer composes the full matrix and gets
    // rotated positions right (pdf.py:430-588); stream-order assembly is the
    // honest fast-path equivalent — never silently-unrotated pen positions.
    def effRotated: Boolean = {
      val ea = tmA * ctmA + tmB * ctmC
      val eb = tmA * ctmB + tmB * ctmD
      val ec = tmC * ctmA + tmD * ctmC
      val ed = tmC * ctmB + tmD * ctmD
      math.abs(ea) < 1e-9 && math.abs(ed) < 1e-9 &&
        (math.abs(eb) > 1e-9 || math.abs(ec) > 1e-9)
    }
    // width-aware mode collects per-line SEGMENTS (device x-extents + text):
    // a show that jumps x starts a new segment, and the line assembles
    // x-SORTED — sub/superscript runs and out-of-order emission land at
    // their visual position, not at the end of the stream order (pdfminer's
    // within-line x sort)
    final class Seg(val startX: Double) {
      var endX: Double = startX
      val sb = new StringBuilder
    }
    val segs = mutable.ArrayBuffer.empty[Seg]
    var curSeg: Seg = null
    def startSeg(atX: Double): Unit = { curSeg = new Seg(atX); segs += curSeg }
    // fake-bold dedup state — see the comment at show(); line-scoped
    var lastCh: String = null
    var lastChX0, lastChX1, lastChY = 0.0
    // synthetic word separators (TJ kern gaps, zero-ty Td) must never double
    // a REAL space glyph on either side: the append helper skips when one
    // already trails, and the absorb helper retracts the synthetic space
    // when the NEXT shown string turns out to lead with whitespace
    var synthSpaceIn: StringBuilder = null
    def appendSynthSpace(sb: StringBuilder): Unit =
      if (sb.isEmpty || !sb.last.isWhitespace) { sb.append(' '); synthSpaceIn = sb }
    def absorbSynth(sb: StringBuilder, decoded: String): Unit = {
      if ((synthSpaceIn eq sb) && decoded.nonEmpty && decoded.head.isWhitespace &&
          sb.nonEmpty && sb.last == ' ')
        sb.deleteCharAt(sb.length - 1)
      synthSpaceIn = null
    }
    def lineEndsPara(sb: StringBuilder): Boolean =
      sb.reverseIterator.takeWhile(_.isWhitespace).contains('\n')
    def newLine(sep: String = "\n"): Unit = {
      lastCh = null // fake-bold dedup never crosses a line
      if (widthAware) {
        if (segs.nonEmpty) {
          // a newline GLYPH at the STREAM end of the line (ToUnicode-mapped
          // paragraph mark, e.g. TextEdit/Pages exports) is an authoritative
          // block break — the trim below would otherwise silently eat it
          val endsPara = curSeg != null && lineEndsPara(curSeg.sb)
          val joined = new StringBuilder
          val sorted = segs.sortBy(_.startX)
          sorted.zipWithIndex.foreach { case (s, i) =>
            if (i > 0) {
              // direct-join only a true continuation; anything displaced in
              // either direction gets the separating space it visually has —
              // unless a SPACE GLYPH already sits on the boundary (a shown
              // trailing space plus the word gap it produces is ONE space)
              val gap = s.startX - sorted(i - 1).endX
              val glyphSpace =
                (joined.nonEmpty && joined.last.isWhitespace) ||
                  (s.sb.nonEmpty && s.sb.charAt(0).isWhitespace)
              if (math.abs(gap) > 0.18 * emScale && !glyphSpace)
                joined.append(' ')
            }
            joined.append(s.sb)
          }
          lines += ((joined, if (endsPara) "\n\n" else sep))
        }
        segs.clear()
        curSeg = null
      } else {
        if (cur.nonEmpty) {
          val endsPara = lineEndsPara(cur)
          lines += ((cur, if (endsPara) "\n\n" else sep))
        }
        cur = new StringBuilder
      }
    }
    var font: Option[PdfFont] = None
    // width-aware state: text-space line origin, DEVICE-space pen x and the
    // device y of the last show; the full CTM (q/Q-stacked) is composed, pen
    // geometry uses its diagonal terms and is skipped for rotated runs
    var lineX, lineY, penX = 0.0
    var shownY = Double.NaN
    var rotLastX = Double.NaN // device-x line key while a run is rotated
    var leading = 0.0 // /TL text leading (TD sets it to -ty), consumed by T*
    var pendingMove = false
    // legacy (no-widths) mode: positions are tracked at Tm/Td granularity
    // and the line-break decision is DEFERRED to the next show — a per-glyph
    // `Tm (c) Tj T* ET` layout emits position churn between shows that an
    // eager break would shatter into one-char lines. The pending (x, y) also
    // feeds the same fake-bold dedup the width-aware path runs, with a
    // 0.5 em/char width approximation standing in for real advances.
    var legacyPendX, legacyPendY = Double.NaN
    var legacyLineY = Double.NaN
    var legacyFreshTm = false
    var ctmStack = List.empty[(Double, Double, Double, Double, Double, Double)]

    // width-aware: place the pen for the next show, deciding between same
    // line (small x-gap → same segment; displaced → new segment, x-sorted at
    // flush), baseline wiggle (super/subscripts join the line as their own
    // segment), a line break inside a text block, or a block break (y-gap
    // beyond normal leading — pdfminer's textbox cut, which the paragraph
    // splitter consumes as a blank line)
    def place(): Unit = {
      if (pendingMove) {
        val devX = ctmA * lineX + ctmE
        val devY = ctmD * lineY + ctmF
        val yGap = if (shownY.isNaN) 0.0 else math.abs(devY - shownY)
        if (!shownY.isNaN && yGap <= math.max(0.5, 0.45 * emScale)) {
          val gap = devX - penX
          if (gap > 0.18 * emScale || gap < -1.5 * emScale) startSeg(devX)
        } else {
          newLine(if (yGap > 1.5 * emScale) "\n\n" else "\n")
        }
        penX = devX
        shownY = devY
        pendingMove = false
      }
    }
    // fake-bold char dedup (`_is_duplicate_char`/`deduplicate_chars_in_text_
    // line`, pdfminer_utils.py:370-458): some generators embolden by drawing
    // every char twice at a ~0.3 pt offset. A char identical to the LAST
    // emitted one, with both origin deltas under 2 pt AND >50% horizontal
    // bbox overlap, is dropped — origins of legitimate doubles ("ll") sit a
    // full advance apart, and thin glyphs that squeak under 2 pt fail the
    // overlap test. Line-scoped, like the reference's per-LTTextLine pass.
    def show(raw: String, decode: String => String): Unit = {
      val bytes = decode(raw) // raw code string — widths key codes, not unicode
      if (widthAware && effRotated) {
        // rotated run: append in stream order, no pen/x-gap geometry (the
        // line splits come from the legacy Tm/Td handling below)
        if (curSeg == null) startSeg(penX)
        val decoded = decodeWithFont(bytes, font)
        absorbSynth(curSeg.sb, decoded)
        curSeg.sb.append(decoded)
        pendingMove = false
      } else if (widthAware) {
        place()
        if (curSeg == null) startSeg(penX)
        val step = if (font.exists(_.twoByte)) 2 else 1
        var i = 0
        while (i + step <= bytes.length) {
          val codeStr = bytes.substring(i, i + step)
          val decoded = decodeWithFont(codeStr, font)
          val w = textAdvance(codeStr, font) / 1000.0 * emScale
          val x0 = penX
          val x1 = penX + w
          val dup = decoded.nonEmpty && decoded == lastCh &&
            math.abs(x0 - lastChX0) < 2.0 && math.abs(shownY - lastChY) < 2.0 && {
              val overlap = math.max(0.0,
                math.min(x1, lastChX1) - math.max(x0, lastChX0))
              val avgW = ((x1 - x0) + (lastChX1 - lastChX0)) / 2
              avgW > 0 && overlap / avgW > 0.5
            }
          if (!dup) {
            absorbSynth(curSeg.sb, decoded)
            curSeg.sb.append(decoded)
            if (decoded.nonEmpty) {
              lastCh = decoded; lastChX0 = x0; lastChX1 = x1; lastChY = shownY
            }
          }
          penX = x1
          i += step
        }
        curSeg.endX = penX
      } else {
        val decoded = decodeWithFont(bytes, font)
        // deferred line break: does this show land beyond the wiggle band?
        if (!legacyPendY.isNaN) {
          if (legacyLineY.isNaN) legacyLineY = legacyPendY
          else {
            val yGap = math.abs(legacyPendY - legacyLineY)
            if (yGap > math.max(0.5, 0.45 * fontSize)) {
              // same block-cut rule as the width-aware path: a y jump beyond
              // normal leading is a textbox boundary (the "\n\n" the
              // block-level elementization consumes), a normal advance is a
              // line break within the box
              newLine(if (yGap > 1.5 * fontSize) "\n\n" else "\n")
              legacyLineY = legacyPendY
            }
          }
        }
        // fake-bold dedup at show granularity: an identical show re-placed
        // by a fresh Tm within the duplicate band on both axes is the
        // double-draw pattern (consecutive Tjs with no repositioning are
        // genuine repeats). Without real advances the overlap test uses an
        // em-fraction band: a doubled draw offsets by a few percent of an
        // em, while even the thinnest legitimate glyph advances ~0.22 em —
        // so the x band is a tenth-em per char (capped at the reference's
        // 2 pt), keeping small-font "ll"/"ii" intact.
        val dupBandX = math.min(2.0, 0.1 * fontSize * math.max(1, decoded.length))
        val dup = legacyFreshTm && decoded.nonEmpty && lastCh != null &&
          decoded == lastCh && !legacyPendX.isNaN &&
          math.abs(legacyPendX - lastChX0) < dupBandX &&
          math.abs(legacyPendY - lastChY) < 2.0
        if (!dup) { absorbSynth(cur, decoded); cur.append(decoded) }
        if (decoded.nonEmpty) {
          lastCh = decoded; lastChX0 = legacyPendX; lastChY = legacyPendY
        }
        legacyFreshTm = false
      }
    }

    // T* moves the pen to the next line per the tracked /TL leading; in the
    // width-aware model place() then decides from the EFFECTIVE y whether the
    // line actually broke — per-glyph `Tm (c) Tj T* ET` layouts emit a T*
    // after every glyph that the following Tm immediately overrides, so a
    // hard newLine() here would shatter such lines into one-char fragments
    // (legacy mode keeps the hard break: it has no pen to re-place)
    def nextLine(): Unit =
      if (widthAware && !effRotated) {
        lineY -= leading * tmD
        pendingMove = true
      } else if (!widthAware && leading != 0) {
        // legacy: a T* with a real leading is a pen move; the next show's
        // y-tolerance check decides whether the line actually broke
        if (legacyPendY.isNaN) legacyPendY = 0
        legacyPendY -= leading
      } else { newLine(); pendingMove = false; shownY = Double.NaN
               legacyLineY = Double.NaN }
    TokenRe.findAllMatchIn(content).foreach { m =>
      if (m.matched == "T*") nextLine()
      else if (m.group(1) != null) { // (s) Tj / ' / "
        if (m.group(2) != "Tj") nextLine()
        show(m.group(1), decodePdfString)
      } else if (m.group(3) != null) { // <hex> Tj
        show(m.group(3), decodeHexString)
      } else if (m.group(4) != null) { // [..] TJ — strings + kern numbers
        TjPartRe.findAllMatchIn(m.group(4)).foreach { p =>
          if (p.group(1) != null) show(p.group(1), decodePdfString)
          else if (p.group(2) != null) show(p.group(2), decodeHexString)
          else if (p.group(3) != null) {
            val n = p.group(3).toDouble
            if (widthAware && !effRotated) {
              // a kern BEFORE the first show of a moved line must adjust the
              // PLACED pen — applying it to the stale penX and letting the
              // later place() overwrite it would silently discard the
              // displacement (and mis-decide the word-space x-gap)
              place()
              penX -= n / 1000.0 * emScale
            }
            if (math.abs(n) > 180) { // inter-word kern gap
              // synthetic separator — skip when a space glyph is already there
              if (widthAware) { if (curSeg != null) appendSynthSpace(curSeg.sb) }
              else appendSynthSpace(cur)
            }
          }
        }
      } else if (m.group(5) != null) { // Tf
        font = fonts.get(m.group(5))
        m.group(6).toDoubleOption.filter(_ > 0).foreach(fontSize = _)
      } else if (m.group(9) != null) { // Td/TD — translate the line matrix
        val tx = m.group(7).toDouble
        val ty = m.group(8).toDouble
        if (m.group(9) == "TD") leading = -ty // TD = -ty TL + Td (§9.4.2)
        if (widthAware && effRotated) {
          if (ty != 0.0) newLine()
          else if (curSeg != null) appendSynthSpace(curSeg.sb)
        } else if (widthAware) {
          lineX += tx * tmA; lineY += ty * tmD; pendingMove = true
        } else if (ty != 0.0) {
          if (legacyPendY.isNaN) legacyPendY = 0
          legacyPendY += ty
          if (!legacyPendX.isNaN) legacyPendX += tx
        } else appendSynthSpace(cur)
      } else if (m.group(10) != null) { // Tm — absolute reposition (+ scale)
        val x = m.group(14).toDouble
        val y = m.group(15).toDouble
        if (widthAware) {
          val a = m.group(10).toDouble
          val b = m.group(11).toDouble
          val c = m.group(12).toDouble
          val d = m.group(13).toDouble
          tmB = b; tmC = c
          // degenerate (not rotation-shaped) zero scale still substitutes
          // 1.0; a rotation keeps its true zeros so effRotated can see it
          tmA = if (a == 0 && b == 0) 1.0 else a
          tmD = if (d == 0 && c == 0) 1.0 else d
          if (effRotated) {
            // rotated run: a rotation-shaped matrix maps the baseline onto
            // the device y-axis, so consecutive rotated LINES differ in
            // device x — that's the line-split key (legacy-style heuristic,
            // no pen geometry)
            val rotKey = x * ctmA + y * ctmC + ctmE
            if (rotLastX.isNaN || rotKey != rotLastX) newLine()
            rotLastX = rotKey
            pendingMove = false
          } else {
            lineX = x; lineY = y; pendingMove = true
            rotLastX = Double.NaN
          }
        } else {
          legacyPendX = x; legacyPendY = y; legacyFreshTm = true
        }
      } else if (m.group(16) != null) { // cm — compose the full CTM
        if (widthAware) {
          val a0 = m.group(16).toDouble
          val b = m.group(17).toDouble
          val c = m.group(18).toDouble
          val d0 = m.group(19).toDouble
          val e = m.group(20).toDouble
          val f = m.group(21).toDouble
          val a = if (a0 == 0 && b == 0) 1.0 else a0
          val d = if (d0 == 0 && c == 0) 1.0 else d0
          val nA = a * ctmA + b * ctmC
          val nB = a * ctmB + b * ctmD
          val nC = c * ctmA + d * ctmC
          val nD = c * ctmB + d * ctmD
          val nE = e * ctmA + f * ctmC + ctmE
          val nF = e * ctmB + f * ctmD + ctmF
          ctmA = nA; ctmB = nB; ctmC = nC; ctmD = nD; ctmE = nE; ctmF = nF
        }
      } else if (m.group(22) != null) { // q / Q
        if (widthAware) {
          if (m.group(22) == "q")
            ctmStack = (ctmA, ctmB, ctmC, ctmD, ctmE, ctmF) :: ctmStack
          else ctmStack match {
            case (a, b, c, d, e, f) :: rest =>
              ctmA = a; ctmB = b; ctmC = c; ctmD = d; ctmE = e; ctmF = f
              ctmStack = rest
            case Nil => ()
          }
        }
      } else if (m.group(23) != null) { // TL — set the text leading
        m.group(23).toDoubleOption.foreach(leading = _)
      }
    }
    newLine()
    val kept = lines.map { case (sb, sep) => (sb.toString.trim, sep) }
      .filter(_._1.nonEmpty)
    kept.zipWithIndex.map { case ((text, sep), i) =>
      if (i + 1 < kept.length) text + sep else text
    }.mkString
  }

  // ------------------------------------------------------------------ document

  private final class PdfDoc(raw: String, password: String = "") {
    private val topObjs: Vector[PdfObj] = parseObjects(raw)
    val decryptor: Option[Decryptor] =
      setupDecryptor(raw, topObjs.map(o => o.num -> o).toMap, password)

    /** PDF 1.5 compressed object streams (`/Type /ObjStm`): the stream body
      * leads with `N` (objnum, offset) integer pairs, then the member objects
      * themselves from byte `/First` on. Members (page tree, catalog, fonts —
      * anything without a stream) are lifted into ordinary stream-less
      * [[PdfObj]]s so references resolve like in an uncompressed file. An
      * encrypted ObjStm is decrypted whole by [[streamData]], so member
      * strings need no per-object pass (PDF 32000-1 §7.5.7). */
    private def objStmMembers: Vector[(Int, PdfObj)] =
      topObjs.filter(_.dict.contains("/ObjStm")).flatMap { o =>
        streamData(o).toVector.flatMap { bytes =>
          val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
          // adversarial-input rule: oversized /N, /First, or pair-table
          // numbers skip the stream instead of overflowing or throwing
          def bounded(v: String): Option[Int] =
            v.toLongOption.filter(x => x >= 0 && x <= s.length.toLong.max(65536))
              .map(_.toInt)
          val n = dictValue(o.dict, "N").flatMap(v =>
            "\\d+".r.findFirstIn(v)).flatMap(bounded).getOrElse(0)
          val first = dictValue(o.dict, "First").flatMap(v =>
            "\\d+".r.findFirstIn(v)).flatMap(bounded).getOrElse(0)
          if (first <= 0 || first > s.length) Vector.empty
          else {
            val pairs = "\\d+".r.findAllIn(s.substring(0, first))
              .flatMap(_.toLongOption).grouped(2)
              .collect { case Seq(num, off)
                if num >= 0 && num <= Int.MaxValue &&
                  off >= 0 && off <= s.length - first =>
                (num.toInt, off.toInt)
              }.toVector.take(n)
            pairs.zipWithIndex.map { case ((num, off), i) =>
              val start = math.min(first + off, s.length)
              val end =
                if (i + 1 < pairs.length) math.min(first + pairs(i + 1)._2, s.length)
                else s.length
              o.num -> PdfObj(num, 0, s.substring(start, math.max(end, start)), 0, 0)
            }
          }
        }
      }

    /**
     * Authoritative definition site per object number, from the NEWEST xref
     * in the startxref → /Prev chain that mentions it (pdfminer's
     * `pdfdocument.py` xref walk): `Right(stmNum)` = compressed member of
     * ObjStm `stmNum` (type-2 entry), `Left(offset)` = ordinary top-level
     * object (type-1 / classic-table entry). The walk starts at the LAST
     * `startxref`, follows `/Prev` (and hybrid `/XRefStm`) links, and keeps
     * the first definition seen per number — newest revision wins. Empty for
     * files whose xref is missing/corrupt; resolution then falls back to the
     * file-order default below.
     */
    private def xrefAuthority: Map[Int, Either[Long, Int]] = {
      val auth = mutable.Map.empty[Int, Either[Long, Int]]
      def add(num: Int, v: Either[Long, Int]): Unit =
        if (!auth.contains(num)) auth(num) = v
      val queue = mutable.Queue.empty[Long]
      """startxref\s+(\d+)""".r.findAllMatchIn(raw).toSeq.lastOption
        .foreach(m => queue.enqueue(m.group(1).toLong))
      val visited = mutable.Set.empty[Long]
      var guard = 0
      while (queue.nonEmpty && guard < 64) {
        guard += 1
        val off = queue.dequeue()
        if (!visited(off) && off >= 0 && off < raw.length) {
          visited += off
          var i = off.toInt
          while (i < raw.length && raw.charAt(i).isWhitespace) i += 1
          if (raw.startsWith("xref", i)) {
            // classic cross-reference table: sections of "start count" then
            // 20-byte entries; 'n' entries are top-level definitions
            i += 4
            val tail = raw.substring(i, math.min(raw.length, i + (1 << 20)))
            val section = """(?s)\A(\s*\d+\s+\d+\s*[\r\n]+(?:\d{10} \d{5} [nf][ \r\n]{2})+)+""".r
              .findFirstIn(tail).getOrElse("")
            """(\d+)\s+(\d+)\s*[\r\n]+((?:\d{10} \d{5} [nf][ \r\n]{2})+)""".r
              .findAllMatchIn(section).foreach { sec =>
                val start = sec.group(1).toInt
                """(\d{10}) (\d{5}) ([nf])""".r.findAllMatchIn(sec.group(3))
                  .zipWithIndex.foreach { case (e, k) =>
                    if (e.group(3) == "n")
                      add(start + k, Left(e.group(1).toLong))
                  }
              }
            val trailerAt = raw.indexOf("trailer", i)
            if (trailerAt >= 0) {
              val tdict = raw.substring(trailerAt,
                math.min(raw.length, trailerAt + 4096))
              // hybrid files: the /XRefStm supplements THIS revision, so it
              // is consulted before the previous revision's table
              dictValue(tdict, "XRefStm").flatMap(_.trim.toLongOption)
                .foreach(queue.enqueue)
              dictValue(tdict, "Prev").flatMap(_.trim.toLongOption)
                .foreach(queue.enqueue)
            }
          } else {
            // cross-reference STREAM (/Type /XRef) at this offset
            topObjs.find(o => o.objStart >= i - 1 && o.objStart <= i + 16 &&
                o.dict.contains("/XRef"))
              .foreach { o =>
                decodeXrefStream(o).foreach { case (num, site) => add(num, site) }
                dictValue(o.dict, "Prev").flatMap(_.trim.toLongOption)
                  .foreach(queue.enqueue)
              }
          }
        }
      }
      auth.toMap
    }

    /** Decode a /Type /XRef stream's (objnum → definition site) entries:
      * `/W`-wide big-endian fields, `/Index` subsections, optional PNG
      * predictor (ISO 32000-1 §7.5.8). Xref streams are never encrypted. */
    private def decodeXrefStream(o: PdfObj): Seq[(Int, Either[Long, Int])] = {
      val data0 = streamData(o, decrypt = false).getOrElse(return Nil)
      val parms = dictValue(o.dict, "DecodeParms")
        .orElse(dictValue(o.dict, "DP")).getOrElse("")
      val predictor = """/Predictor\s+(\d+)""".r.findFirstMatchIn(parms)
        .map(_.group(1).toInt).getOrElse(1)
      val columns = """/Columns\s+(\d+)""".r.findFirstMatchIn(parms)
        .map(_.group(1).toInt).getOrElse(1)
      val data = if (predictor >= 10) unpredictPng(data0, columns) else data0
      val w = dictValue(o.dict, "W").toSeq
        .flatMap(v => """\d+""".r.findAllIn(v).map(_.toInt))
      if (w.length < 3 || w.exists(x => x < 0 || x > 8)) return Nil
      val rowLen = w.sum
      if (rowLen <= 0) return Nil
      val size = dictValue(o.dict, "Size")
        .flatMap(v => """\d+""".r.findFirstIn(v)).map(_.toInt).getOrElse(0)
      val index = {
        val nums = dictValue(o.dict, "Index").toSeq
          .flatMap(v => """\d+""".r.findAllIn(v).map(_.toInt))
        if (nums.length >= 2) nums.grouped(2).collect {
          case Seq(a, b) => (a, b) }.toSeq
        else Seq((0, size))
      }
      def field(row: Array[Byte], skip: Int, len: Int): Long =
        (0 until len).foldLeft(0L)((acc, k) => (acc << 8) | (row(skip + k) & 0xFF))
      val rows = data.grouped(rowLen).filter(_.length == rowLen).toVector
      val out = Vector.newBuilder[(Int, Either[Long, Int])]
      var rowIdx = 0
      index.foreach { case (start, count) =>
        (0 until count).foreach { k =>
          if (rowIdx < rows.length) {
            val row = rows(rowIdx); rowIdx += 1
            val typ = if (w(0) == 0) 1L else field(row, 0, w(0))
            val f2 = field(row, w(0), w(1))
            typ match {
              case 1 => out += ((start + k, Left(f2)))
              case 2 if f2 <= Int.MaxValue => out += ((start + k, Right(f2.toInt)))
              case _ => () // type 0 (free) and unknown types define nothing
            }
          }
        }
      }
      out.result()
    }

    // Same-numbered definitions resolve through the xref when it speaks:
    // incremental updates normally append replacements at the TOP level
    // (file-order default: top-level wins — members precede topObjs in
    // objList, later map entries overwrite), but the converse update — a
    // save that moves the current definition INTO an object stream while a
    // stale top-level copy remains — is only visible through the newest
    // xref's type-2 entry, which here promotes the member over the stale
    // top-level copy (pdfminer resolves identically through its xref walk).
    private val memberPairs = objStmMembers
    val objList: Vector[PdfObj] = memberPairs.map(_._2) ++ topObjs
    val objs: Map[Int, PdfObj] = {
      val base = objList.map(o => o.num -> o).toMap
      val topNums = topObjs.iterator.map(_.num).toSet
      val auth: Map[Int, Either[Long, Int]] =
        if (memberPairs.exists(p => topNums.contains(p._2.num)))
          try xrefAuthority
          catch { case _: Exception => Map.empty[Int, Either[Long, Int]] }
        else Map.empty // no collisions — skip the walk
      if (auth.isEmpty) base
      else base ++ memberPairs.collect {
        case (stm, m) if topNums.contains(m.num) &&
          auth.get(m.num).contains(Right(stm): Either[Long, Int]) => m.num -> m
      }
    }

    def refTarget(v: String): Option[PdfObj] =
      RefRe.findPrefixMatchOf(v.trim).flatMap(m => objs.get(m.group(1).toInt))

    /** Value for `key`, following one level of indirection. */
    def resolved(dict: String, key: String): Option[String] =
      dictValue(dict, key).map { v =>
        refTarget(v).map(_.dict).getOrElse(v)
      }

    def streamData(o: PdfObj, decrypt: Boolean = true): Option[Array[Byte]] = {
      if (!o.hasStream) return None
      var data = raw.substring(o.dataStart, o.dataEnd)
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      if (decrypt) decryptor.foreach(d => data = d.decrypt(o.num, o.gen, data))
      val filters = dictValue(o.dict, "Filter").toSeq.flatMap { f =>
        "/([A-Za-z0-9]+)".r.findAllMatchIn(f).map(_.group(1)).toSeq
      }
      if (filters.isEmpty) Some(data)
      else {
        var cur = data
        filters.foreach {
          case "ASCII85Decode" => cur = ascii85(cur).getOrElse(cur)
          case "FlateDecode" => cur = inflate(cur).getOrElse(Array.emptyByteArray)
          case _ => () // unsupported (DCT etc.) — leave as-is, text scan finds nothing
        }
        Some(cur).filter(_.nonEmpty)
      }
    }

    /** Page objects in page-tree order (catalog → Pages → Kids), falling back
      * to file order of `/Type /Page` objects. */
    def pages: Vector[PdfObj] = {
      val rootDict = """/Root\s+(\d+)\s+\d+\s+R""".r.findAllMatchIn(raw).toSeq.lastOption
        .flatMap(m => objs.get(m.group(1).toInt)).map(_.dict)
      val out = Vector.newBuilder[PdfObj]
      val seen = mutable.Set.empty[Int]
      def walk(node: PdfObj): Unit = {
        if (node.dict.contains("/Kids")) {
          // cycle guard applies to interior nodes only: a LEAF page listed
          // twice in /Kids is a real duplicated page and must emit twice
          if (seen.add(node.num)) {
            dictValue(node.dict, "Kids").foreach { kids =>
              RefRe.findAllMatchIn(kids).foreach { k =>
                objs.get(k.group(1).toInt).foreach(walk)
              }
            }
          }
        } else if (node.dict.contains("/Page") || node.dict.contains("/Contents")) {
          out += node
        }
      }
      rootDict.flatMap(d => dictValue(d, "Pages")).flatMap(refTarget) match {
        case Some(pagesRoot) => walk(pagesRoot)
        case None => ()
      }
      val walked = out.result()
      if (walked.nonEmpty) walked
      else objList.filter(o => "/Type\\s*/Page[^s]".r.findFirstIn(o.dict + " ").isDefined)
    }

    def pageContent(page: PdfObj): String = {
      val base = dictValue(page.dict, "Contents").toSeq.flatMap { v =>
        RefRe.findAllMatchIn(v).map(_.group(1).toInt).toSeq
      }.flatMap(objs.get).flatMap { o =>
        if (o.hasStream) streamData(o).toSeq
        else // `/Contents 73 0 R` where 73 is an array object `[ 18 0 R ]`
          RefRe.findAllMatchIn(o.dict).map(_.group(1).toInt).toSeq
            .flatMap(objs.get).flatMap(streamData(_))
      }.map(new String(_, java.nio.charset.StandardCharsets.ISO_8859_1))
        .mkString("\n")
      spliceForms(base, resourcesOf(page), 0)
    }

    /** Replace each `/Name Do` whose XObject is a Form with that form's content
      * stream, in place — form text (e.g. letterheads, chart labels) then flows
      * through extraction in paint order like pdfminer's interpreter. */
    private def spliceForms(content: String, resources: Option[String], depth: Int): String = {
      if (depth > 3) return content
      val xobjDict = resources.flatMap(r => resolved(r, "XObject")).getOrElse(return content)
      var cur = content
      """/([A-Za-z0-9.+_-]+)\s+(\d+)\s+\d+\s+R""".r.findAllMatchIn(xobjDict).foreach { m =>
        val name = m.group(1)
        objs.get(m.group(2).toInt).foreach { xo =>
          if (xo.dict.contains("/Form") && cur.contains("/" + name + " Do")) {
            val inner = streamData(xo)
              .map(new String(_, java.nio.charset.StandardCharsets.ISO_8859_1))
              .getOrElse("")
            val spliced = spliceForms(inner, dictValue(xo.dict, "Resources")
              .map(v => refTarget(v).map(_.dict).getOrElse(v)).orElse(resources), depth + 1)
            cur = cur.replace("/" + name + " Do", "\n" + spliced + "\n")
          }
        }
      }
      cur
    }

    /**
     * Filled AcroForm widget values with top-left-frame bboxes for one page —
     * `get_widget_text_from_annots` (`pdfminer_processing.py:1109-1168`):
     * `/Annots` entries with `/Subtype /Widget` whose field type resolves to
     * `/Tx` or `/Ch` (walking the `/Parent` chain for inherited FT/V), value
     * decoded from literal/hex/name forms (UTF-16BE BOM honored), empty
     * values skipped, `/Rect` flipped to the top-left frame.
     */
    def widgetTexts(page: PdfObj, height: Double): Seq[(String, (Double, Double, Double, Double))] = {
      val annots = resolved(page.dict, "Annots").getOrElse(return Nil)
      RefRe.findAllMatchIn(annots).flatMap(m => objs.get(m.group(1).toInt)).flatMap { a =>
        if (!a.dict.contains("/Widget")) None
        else {
          // FT and V may be inherited from a parent field node (bounded walk)
          var ft = dictValue(a.dict, "FT")
          var v = dictValue(a.dict, "V")
          var parent = dictValue(a.dict, "Parent").flatMap(refTarget)
          var seen = 0
          while ((ft.isEmpty || v.isEmpty) && parent.isDefined && seen < 32) {
            val pd = parent.get.dict
            ft = ft.orElse(dictValue(pd, "FT"))
            v = v.orElse(dictValue(pd, "V"))
            parent = dictValue(pd, "Parent").flatMap(refTarget)
            seen += 1
          }
          val isField = ft.exists(t => t.trim == "/Tx" || t.trim == "/Ch")
          val text = if (isField) v.map(decodeFieldValue).getOrElse("") else ""
          val rect = dictValue(a.dict, "Rect").toSeq.flatMap(r =>
            """-?[0-9.]+""".r.findAllIn(r).toSeq.flatMap(s =>
              scala.util.Try(s.toDouble).toOption))
          if (text.trim.nonEmpty && rect.length == 4)
            Some((text.trim, (rect(0), height - rect(3), rect(2), height - rect(1))))
          else None
        }
      }.toSeq
    }

    /**
     * `get_uris` / `get_uris_from_annots` (`pdfminer_processing.py:965-1064`):
     * `/Annots` entries with `/Subtype /Link`, the `/Rect` flipped to the
     * top-left frame, and the action dict's target — `/URI` string for
     * S=/URI, destination name `/D` for S=/GoTo (how LaTeX cite links ship).
     */
    def linkAnnots(page: PdfObj, height: Double): Seq[((Double, Double, Double, Double), String)] = {
      val annots = resolved(page.dict, "Annots").getOrElse(return Nil)
      RefRe.findAllMatchIn(annots).flatMap(m => objs.get(m.group(1).toInt)).flatMap { a =>
        val d = a.dict
        if (!dictValue(d, "Subtype").exists(_.trim.startsWith("/Link"))) None
        else {
          val rect = dictValue(d, "Rect").toSeq.flatMap(r =>
            """-?[0-9.]+""".r.findAllIn(r).toSeq.flatMap(s =>
              scala.util.Try(s.toDouble).toOption))
          def actionString(raw: String): String = {
            val t = raw.trim
            if (t.startsWith("(") && t.endsWith(")"))
              utf16IfBom(decodePdfString(t.substring(1, t.length - 1)))
            else if (t.startsWith("<") && t.endsWith(">"))
              utf16IfBom(decodeHexString(t.substring(1, t.length - 1)))
            else t.stripPrefix("/")
          }
          // the /URI KEY must be matched by its string (or indirect-ref)
          // value following it — a bare name scan would hit the /S /URI
          // action TYPE first; a ref value resolves to a string object
          // (try_resolve twice, `pdfminer_processing.py:1049`)
          val UriValRe =
            """(?s)/URI\s*(\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>|\d+\s+\d+\s+R)""".r
          def resolveToken(tok: String): String =
            if (tok.trim.endsWith("R"))
              refTarget(tok.trim).map(_.dict.trim).getOrElse(tok)
            else tok
          val uri = dictValue(d, "A")
            .map(v => refTarget(v).map(_.dict).getOrElse(v))
            .flatMap { ad =>
              val s = dictValue(ad, "S").map(_.trim)
              if (s.exists(_.startsWith("/URI")))
                UriValRe.findFirstMatchIn(ad)
                  .map(m => actionString(resolveToken(m.group(1))))
              else if (s.exists(_.startsWith("/GoTo")))
                dictValue(ad, "D").map(v => actionString(resolveToken(v)))
              else None
            }
          if (rect.length == 4 && uri.exists(_.nonEmpty))
            Some(((rect(0), height - rect(3), rect(2), height - rect(1)), uri.get))
          else None
        }
      }.toSeq
    }

    /** `_decode_field_value` (`pdfminer_processing.py:1078-1106`): literal
      * strings, hex strings, name objects (choice export values), and arrays
      * of those (multi-select choice fields, newline-joined). */
    private def decodeFieldValue(raw: String): String = {
      val v = raw.trim
      def scalar(s: String): Option[String] = {
        val t = s.trim
        if (t.startsWith("(") && t.endsWith(")"))
          Some(utf16IfBom(decodePdfString(t.substring(1, t.length - 1))))
        else if (t.startsWith("<") && t.endsWith(">"))
          Some(utf16IfBom(decodeHexString(t.substring(1, t.length - 1))))
        else if (t.startsWith("/")) Some(t.stripPrefix("/"))
        else None
      }
      if (v.startsWith("[")) {
        """\(((?:[^()\\]|\\.)*)\)|<([0-9A-Fa-f\s]*)>|/([A-Za-z0-9.+_-]+)""".r
          .findAllMatchIn(v).flatMap { m =>
            if (m.group(1) != null) scalar("(" + m.group(1) + ")")
            else if (m.group(2) != null) scalar("<" + m.group(2) + ">")
            else Some(m.group(3))
          }.map(_.trim).filter(_.nonEmpty).mkString("\n")
      } else scalar(v).getOrElse("")
    }

    /** pdfminer `decode_text`: UTF-16BE when the BOM leads, verbatim otherwise. */
    private def utf16IfBom(s: String): String =
      if (s.length >= 2 && s.charAt(0) == 0xFE.toChar && s.charAt(1) == 0xFF.toChar) {
        val sb = new StringBuilder
        var i = 2
        while (i + 1 < s.length) {
          sb.append((((s.charAt(i) & 0xFF) << 8) | (s.charAt(i + 1) & 0xFF)).toChar)
          i += 2
        }
        sb.toString
      } else s

    /** `/MediaBox [x0 y0 x1 y1]` walking up the /Parent chain (inheritable);
      * pdfminer's default letter box (612x792 pt) when absent. */
    def mediaBox(page: PdfObj): (Double, Double) = {
      var cur: Option[PdfObj] = Some(page)
      var depth = 0
      while (cur.isDefined && depth < 32) {
        val d = cur.get.dict
        dictValue(d, "MediaBox").foreach { v =>
          val nums = """-?[0-9.]+""".r.findAllIn(v).toSeq.flatMap(s =>
            scala.util.Try(s.toDouble).toOption)
          if (nums.length == 4) return (nums(2) - nums(0), nums(3) - nums(1))
        }
        cur = dictValue(d, "Parent").flatMap(refTarget)
        depth += 1
      }
      (612.0, 792.0)
    }

    /** Resources walk up the /Parent chain (inheritable attribute). */
    private def resourcesOf(page: PdfObj): Option[String] = {
      var cur: Option[PdfObj] = Some(page)
      var depth = 0
      while (cur.isDefined && depth < 32) {
        val d = cur.get.dict
        if (d.contains("/Resources")) return resolved(d, "Resources")
        cur = dictValue(d, "Parent").flatMap(refTarget)
        depth += 1
      }
      None
    }

    def pageFonts(page: PdfObj): Map[String, PdfFont] = {
      val pageRes = resourcesOf(page)
      // spliced form XObjects resolve font names against their own resources;
      // collect those too (page-level names win on collision)
      val formRes = pageRes.flatMap(r => resolved(r, "XObject")).toSeq.flatMap { xd =>
        RefRe.findAllMatchIn(xd).map(_.group(1).toInt).toSeq
          .flatMap(objs.get).filter(_.dict.contains("/Form"))
          .flatMap(xo => dictValue(xo.dict, "Resources")
            .map(v => refTarget(v).map(_.dict).getOrElse(v)))
      }
      (formRes ++ pageRes.toSeq).flatMap { res =>
        val fontDict = resolved(res, "Font").getOrElse("")
        """/([A-Za-z0-9.+_-]+)\s+(\d+)\s+\d+\s+R""".r.findAllMatchIn(fontDict).flatMap { m =>
          objs.get(m.group(2).toInt).map(fo => m.group(1) -> parseFont(fo))
        }
      }.toMap
    }

    /** Image XObjects reachable from this page's resources, name → decoded
      * raster where the codec is offline-decodable: DCTDecode streams are raw
      * JFIF bytes (`ImageIO.read`), Flate/uncompressed 8-bit DeviceGray /
      * DeviceRGB samples build directly. Unsupported codecs (CCITT, JBIG2,
      * JPX, indexed, predictors) keep their declared pixel dims with no
      * raster, exactly the cases the reference's renderer also degrades on. */
    def imageXObjects(page: PdfObj): Map[String, ImageXObject] = {
      val xobjDict = resourcesOf(page).flatMap(r => resolved(r, "XObject"))
        .getOrElse(return Map.empty)
      """/([A-Za-z0-9.+_-]+)\s+(\d+)\s+\d+\s+R""".r.findAllMatchIn(xobjDict)
        .flatMap { m =>
          objs.get(m.group(2).toInt)
            .filter(xo => dictValue(xo.dict, "Subtype").exists(_.trim == "/Image"))
            .flatMap { xo =>
              def intOf(key: String): Option[Int] =
                dictValue(xo.dict, key).flatMap(v =>
                  """\d+""".r.findFirstIn(v)).flatMap(_.toIntOption)
              for { w <- intOf("Width"); h <- intOf("Height") if w > 0 && h > 0 }
                yield m.group(1) -> ImageXObject(w, h, decodeImageStream(xo, w, h))
            }
        }.toMap
    }

    private def decodeImageStream(xo: PdfObj, w: Int, h: Int)
        : Option[java.awt.image.BufferedImage] = {
      val filters = dictValue(xo.dict, "Filter").toSeq.flatMap { f =>
        "/([A-Za-z0-9]+)".r.findAllMatchIn(f).map(_.group(1)).toSeq
      }
      val data = streamData(xo).getOrElse(return None)
      if (filters.contains("DCTDecode")) {
        // streamData leaves DCT payloads untouched — they are complete JFIF files
        scala.util.Try(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(data))).toOption.flatMap(Option(_))
      } else if (filters.forall(f => f == "FlateDecode" || f == "ASCII85Decode")) {
        val bpc = dictValue(xo.dict, "BitsPerComponent")
          .flatMap(v => """\d+""".r.findFirstIn(v)).flatMap(_.toIntOption).getOrElse(8)
        val predictored = dictValue(xo.dict, "DecodeParms")
          .orElse(dictValue(xo.dict, "DP")).exists(_.contains("/Predictor"))
        if (bpc != 8 || predictored) return None
        val cs = resolved(xo.dict, "ColorSpace").getOrElse("")
        val comps =
          if (cs.contains("DeviceRGB")) 3
          else if (cs.contains("DeviceGray")) 1
          else return None
        if (data.length < w.toLong * h * comps) return None
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val base = (y * w + x) * comps
            val rgb =
              if (comps == 3)
                ((data(base) & 0xFF) << 16) | ((data(base + 1) & 0xFF) << 8) |
                  (data(base + 2) & 0xFF)
              else { val g = data(base) & 0xFF; (g << 16) | (g << 8) | g }
            img.setRGB(x, y, rgb)
            x += 1
          }
          y += 1
        }
        Some(img)
      } else None
    }

    private val fontCache = mutable.Map.empty[Int, PdfFont]

    private def parseFont(fo: PdfObj): PdfFont = fontCache.getOrElseUpdate(fo.num, {
      val (toUni, two) = dictValue(fo.dict, "ToUnicode").flatMap(refTarget)
        .flatMap(streamData(_))
        .map(b => parseToUnicode(new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)))
        .getOrElse((Map.empty[Int, String], false))
      val isType0 = fo.dict.contains("/Type0")
      val dictDiffs = resolved(fo.dict, "Encoding")
        .flatMap(enc => dictValue(enc, "Differences"))
        .map(parseDifferences).getOrElse(Map.empty[Int, String])
      // a simple font with NO /Encoding and NO ToUnicode (TeX CMSY/CMMI
      // subsets) keeps its encoding only inside the embedded Type1 program:
      // the CLEARTEXT header (before eexec) builds it with `dup <code>
      // /<glyph> put` — pdfminer reads the same table (its T1 font parser),
      // so a dagger at code 0x79 decodes as †, not 'y'
      val diffs =
        if (dictDiffs.nonEmpty || toUni.nonEmpty || isType0) dictDiffs
        else resolved(fo.dict, "FontDescriptor")
          .flatMap(fd => dictValue(fd, "FontFile"))
          .flatMap(refTarget).flatMap(streamData(_))
          .map { b =>
            val s = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
            val clear = s.indexOf("eexec") match {
              case -1 => s
              case i => s.substring(0, i)
            }
            if (!clear.contains("/Encoding")) Map.empty[Int, String]
            else Type1EncodingPutRe.findAllMatchIn(clear).flatMap { m =>
              m.group(1).toIntOption.filter(c => c >= 0 && c < 256).flatMap(c =>
                glyphToText(m.group(2)).map(c -> _))
            }.toMap
          }.getOrElse(Map.empty)
      // /Encoding /MacRomanEncoding directly, or /BaseEncoding inside an
      // encoding dict (Differences then override individual codes)
      val macRoman =
        dictValue(fo.dict, "Encoding").exists(_.contains("/MacRomanEncoding")) ||
        resolved(fo.dict, "Encoding")
          .flatMap(enc => dictValue(enc, "BaseEncoding"))
          .exists(_.contains("MacRomanEncoding"))
      // a ToUnicode codespace authoritatively fixes the code width (an embedded
      // 1-byte Encoding CMap makes even a Type0 font single-byte); only default
      // to 2-byte (Identity-H) when the font gives no codespace at all
      val twoByte = if (toUni.nonEmpty) two else isType0
      // glyph advances: simple fonts carry /FirstChar + /Widths; Type0 fonts
      // delegate to the descendant CIDFont's /W (+ /DW default)
      val simpleWidths: Map[Int, Double] = (for {
        fc <- dictValue(fo.dict, "FirstChar")
          .flatMap(v => "\\d+".r.findFirstIn(v)).map(_.toInt)
        ws <- resolved(fo.dict, "Widths")
      } yield "-?[0-9.]+".r.findAllIn(ws).toVector.flatMap(_.toDoubleOption)
        .zipWithIndex.map { case (w, i) => (fc + i) -> w }.toMap)
        .getOrElse(Map.empty)
      val descendant = dictValue(fo.dict, "DescendantFonts")
        .flatMap(v => RefRe.findFirstMatchIn(v))
        .flatMap(m => objs.get(m.group(1).toInt))
      val cidWidths = descendant.flatMap(d => dictValue(d.dict, "W"))
        .map(parseCidWidths).getOrElse(Map.empty[Int, Double])
      val dw = descendant.flatMap(d => dictValue(d.dict, "DW"))
        .flatMap(v => "[0-9.]+".r.findFirstIn(v)).flatMap(_.toDoubleOption)
        .orElse(resolved(fo.dict, "FontDescriptor")
          .flatMap(fd => dictValue(fd, "MissingWidth"))
          .flatMap(v => "[0-9.]+".r.findFirstIn(v)).flatMap(_.toDoubleOption))
        .getOrElse(if (descendant.isDefined) 1000.0 else 500.0)
      PdfFont(toUni, twoByte, diffs,
        if (cidWidths.nonEmpty) cidWidths else simpleWidths, dw, macRoman)
    })
  }

  /** CID `/W` array (PDF 32000-1 §9.7.4.3): entries are either
    * `c [w1 w2 …]` (consecutive codes from c) or `cFirst cLast w`. */
  private[sources] def parseCidWidths(w: String): Map[Int, Double] = {
    val out = Map.newBuilder[Int, Double]
    val toks = """\[|\]|-?[0-9.]+""".r.findAllIn(w).toVector
    // strip ONE outer bracket pair when present
    val inner =
      if (toks.headOption.contains("[") && toks.lastOption.contains("]"))
        toks.slice(1, toks.length - 1)
      else toks
    var i = 0
    while (i < inner.length) {
      // `-?[0-9.]+` admits unparseable runs ("." / "1.2.3") in a malformed
      // /W — skip them rather than killing the task (adversarial-input rule)
      val cOpt = if (inner(i) == "[" || inner(i) == "]") None
        else inner(i).toDoubleOption.map(_.toInt)
      cOpt match {
        case None => i += 1
        case Some(c) =>
          if (i + 1 < inner.length && inner(i + 1) == "[") {
            var j = i + 2
            var k = c
            while (j < inner.length && inner(j) != "]") {
              inner(j).toDoubleOption.foreach { v => out += k -> v; k += 1 }
              j += 1
            }
            i = j + 1
          } else if (i + 2 < inner.length) {
            (for {
              cLast <- inner(i + 1).toDoubleOption.map(_.toInt)
              v <- inner(i + 2).toDoubleOption
            } yield (c to math.min(cLast, c + 65535)).foreach(k => out += k -> v))
              .getOrElse(())
            i += 3
          } else i = inner.length
      }
    }
    out.result()
  }

  // ------------------------------------------------------------------ main

  /** One page's raw material for region-level consumers (the hi_res pipeline):
    * decompressed content stream, resolved fonts, media-box extent in points,
    * and filled AcroForm widget values (text + top-left bbox). */
  final case class PageStream(pageNumber: Int, content: String,
      fonts: Map[String, PdfFont], width: Double, height: Double,
      widgets: Seq[(String, (Double, Double, Double, Double))] = Nil)

  /** One image XObject in a page's resource dict: declared pixel dims plus the
    * decoded raster when the stream codec is decodable offline. */
  final case class ImageXObject(widthPx: Int, heightPx: Int,
      image: Option[java.awt.image.BufferedImage])

  /** Per page (page-tree order, aligned with [[pageStreams]]): image-XObject
    * name → decoded image — the raw material for [[PdfImages]]' page
    * compositing and the image-block extraction path. */
  def pageImageXObjects(bytes: Array[Byte]): Seq[Map[String, ImageXObject]] = {
    if (!isPdf(bytes)) return Nil
    val doc = new PdfDoc(new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1))
    doc.pages.map(doc.imageXObjects)
  }

  /** Per-page content + fonts + page size, page-tree order — the input
    * [[PdfHiRes]] builds its extracted layout from. Empty for non-PDF bytes or
    * documents with no parseable page tree (hi_res falls back to the
    * whole-file fast scan upstream of this call). */
  def pageStreams(bytes: Array[Byte]): Seq[PageStream] = {
    if (!isPdf(bytes)) return Nil
    val doc = new PdfDoc(new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1))
    doc.pages.zipWithIndex.map { case (page, i) =>
      val (w, h) = doc.mediaBox(page)
      PageStream(i + 1, doc.pageContent(page), doc.pageFonts(page), w, h,
        doc.widgetTexts(page, h))
    }
  }

  /** One word of a text line: text, estimated top-left-frame bbox (the line's
    * span distributed uniformly over its characters — the object-model reader
    * has no per-glyph widths), and the word's char offset within the line.
    * Word boundaries follow `get_words_from_obj` (`pdfminer_processing
    * .py:1234-1312`): whitespace separates, and a flip of the
    * alphanumeric/punctuation class starts a new word. */
  private[sources] def lineWords(lineText: String,
      bbox: (Double, Double, Double, Double)): Seq[(String, (Double, Double, Double, Double), Int)] = {
    val span = bbox._3 - bbox._1
    val n = math.max(1, lineText.length)
    def xAt(i: Int): Double = bbox._1 + span * i / n
    val out = Seq.newBuilder[(String, (Double, Double, Double, Double), Int)]
    var i = 0
    while (i < lineText.length) {
      if (lineText.charAt(i).isWhitespace) i += 1
      else {
        val start = i
        val alnum = lineText.charAt(i).isLetterOrDigit
        while (i < lineText.length && !lineText.charAt(i).isWhitespace &&
            lineText.charAt(i).isLetterOrDigit == alnum) i += 1
        out += ((lineText.substring(start, i), (xAt(start), bbox._2, xAt(i), bbox._4), start))
      }
    }
    out.result()
  }

  /** `map_bbox_and_index` (`pdfminer_processing.py:1315-1356`): the annot maps
    * to the span from the word whose start corner is nearest the annot's
    * start corner through the word whose end corner is nearest its end. */
  private[sources] def mapAnnotToWords(
      words: Seq[(String, (Double, Double, Double, Double), Int)],
      annot: (Double, Double, Double, Double)): Option[(String, Int)] = {
    if (words.isEmpty) return None
    def d(ax: Double, ay: Double, wx: Double, wy: Double): Double =
      math.sqrt((ax - wx) * (ax - wx) + (ay - wy) * (ay - wy))
    val start = words.indices.minBy(i => d(annot._1, annot._2, words(i)._2._1, words(i)._2._2))
    val end = words.indices.minBy(i => d(annot._3, annot._4, words(i)._2._3, words(i)._2._4))
    val text =
      if (end >= start) words.slice(start, end + 1).map(_._1).mkString(" ")
      else words(start)._1
    Some((text.trim, words(start)._3))
  }

  /** `check_annotations_within_element` (`:1171-1204`) adapted to line
    * regions: the overlap fraction of the annot's own area with the region.
    * The reference tests annots against whole TEXTBOX bboxes at threshold
    * 0.9; a link rect typically overhangs its single LINE by a point or two
    * of leading, so line-level association takes the best-overlapping line
    * above a majority floor instead. */
  private def annotOverlap(annot: (Double, Double, Double, Double),
      region: (Double, Double, Double, Double)): Double = {
    val area = math.max(0, annot._3 - annot._1) * math.max(0, annot._4 - annot._2)
    if (area <= 0) return 0.0
    val ix = math.max(0, math.min(annot._3, region._3) - math.max(annot._1, region._1))
    val iy = math.max(0, math.min(annot._4, region._4) - math.max(annot._2, region._2))
    ix * iy / area
  }

  /** One element per extracted TEXT BLOCK, the reference's fast-path
    * elementization (`pdf.py:480-560`): each pdfminer LTTextBox becomes one
    * element via `clean_extra_whitespace_with_index_run` (newlines → spaces,
    * runs collapsed) — never a paragraph re-grouper over the page text. Our
    * block cuts are [[extractText]]'s "\n\n" separators (y-gap beyond normal
    * leading — the textbox-boundary signal), so a multi-column paper yields
    * column/paragraph boxes, not shattered lines. */
  private def blockElements(text: String): Seq[String] =
    text.split("\n{2,}").toSeq
      .map(b => graft.functions.Cleaners.cleanExtraWhitespaceWithIndexRun(b)._1)
      .filter(_.nonEmpty)

  /** The fast-strategy partitioner: page tree → per-page content + fonts →
    * text → per-textbox elements ([[blockElements]]) → classifier cascade
    * (classifier="text").
    * `password` opens user-password-protected files (`partition_pdf`'s
    * `password=` parameter, `pdf.py` + `test_pdf.py::
    * test_partition_pdf_with_password`); a wrong password extracts nothing. */
  def partitionPdf(bytes: Array[Byte], password: String = ""): Seq[RawPara] = {
    if (!isPdf(bytes)) return Nil
    val raw = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val doc = new PdfDoc(raw, password)
    val out = mutable.ArrayBuffer.empty[RawPara]
    val pages = doc.pages
    if (pages.nonEmpty) {
      pages.zipWithIndex.foreach { case (page, i) =>
        val content = doc.pageContent(page)
        val (_, hgt) = doc.mediaBox(page)
        if (content.contains("BT")) {
          val text = extractText(content, doc.pageFonts(page))
          if (text.nonEmpty) {
            val paras = blockElements(text)
            // hyperlink annotations -> per-paragraph links metadata
            // (`pdf.py:508-550`): each /Link rect maps to the overlapping
            // text line's words, then to the paragraph containing that line
            val annots = doc.linkAnnots(page, hgt)
            val paraLinks = Array.fill(paras.length)(
              mutable.ArrayBuffer.empty[(String, String, Int)])
            if (annots.nonEmpty) {
              val regions = PdfHiRes.extractLineRegions(
                content, doc.pageFonts(page), hgt, 1.0)
              annots.foreach { case (abox, uri) =>
                val best = regions
                  .map(r => (r, annotOverlap(abox, r.bbox)))
                  .filter(_._2 > 0.5)
                  .sortBy(-_._2).headOption.map(_._1)
                best.foreach { line =>
                  val lt = line.text.getOrElse("")
                  mapAnnotToWords(lineWords(lt, line.bbox), abox).foreach {
                    case (linkText, startInLine) =>
                      val pi = paras.indexWhere(_.contains(lt))
                      val target =
                        if (pi >= 0) Some((pi, paras(pi).indexOf(lt) + startInLine))
                        else {
                          val fi = paras.indexWhere(_.contains(linkText))
                          if (fi >= 0) Some((fi, paras(fi).indexOf(linkText))) else None
                        }
                      target.foreach { case (idx, si) =>
                        paraLinks(idx) += ((linkText, uri, si))
                      }
                  }
                }
              }
            }
            paras.zipWithIndex.foreach { case (p, pi) =>
              val ls = paraLinks(pi)
              out += RawPara(p, None, classifier = "text", pageNumber = Some(i + 1),
                linkTexts = ls.map(_._1).toSeq, linkUrls = ls.map(_._2).toSeq,
                linkStartIndexes = ls.map(_._3).toSeq)
            }
          }
        }
        // filled AcroForm field values live in widget annotations, not the
        // content stream — the fast strategy emits them as elements too
        // (`test_pdfminer_processing.py:512-525`)
        val (_, h) = doc.mediaBox(page)
        doc.widgetTexts(page, h).foreach { case (t, _) =>
          out += RawPara(t, None, classifier = "text", pageNumber = Some(i + 1))
        }
      }
    } else {
      // no parseable page tree (e.g. truncated file): legacy whole-file scan
      var page = 0
      StreamRe.findAllMatchIn(raw).foreach { m =>
        val body = m.group(1).getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        val content = inflate(body) match {
          case Some(d) => new String(d, java.nio.charset.StandardCharsets.ISO_8859_1)
          case None => m.group(1)
        }
        if (content.contains("BT") && (content.contains("Tj") || content.contains("TJ"))) {
          val text = extractText(content)
          if (text.nonEmpty) {
            page += 1
            blockElements(text).foreach { p =>
              out += RawPara(p, None, classifier = "text", pageNumber = Some(page))
            }
          }
        }
      }
    }
    out.toSeq
  }
}
