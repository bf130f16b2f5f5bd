package graft.sources

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

/**
 * Text-encoding detection — `file_utils/encoding.py:1-150`. The reference
 * calls charset_normalizer's statistical `detect` and falls back through
 * `COMMON_ENCODINGS` in order when confidence is low; offline we use the
 * deterministic subset that covers real corpora: BOM identification
 * (UTF-8/16/32 in both orders), NUL-pattern detection for BOM-less UTF-16 of
 * ASCII-dominant text, strict UTF-8 validation, and the reference's own
 * first-successful-fallback (`iso-8859-1`, the first non-UTF-8 entry of
 * `COMMON_ENCODINGS` that always decodes). `format_encoding_str` /
 * `validate_encoding` are ported as-is (`encoding.py:35-60`).
 *
 * Used by the auto router and filetype sniffer so UTF-16/Latin-1 payloads
 * route and decode correctly instead of garbling through a blind UTF-8 read.
 */
object Encodings {

  /** `format_encoding_str`: lower-case, underscores to dashes, directional
    * annotations stripped. */
  def formatEncodingStr(encoding: String): String = {
    val f = encoding.toLowerCase.replace("_", "-")
    val annotated = Set("iso-8859-6-i", "iso-8859-6-e", "iso-8859-8-i", "iso-8859-8-e")
    if (annotated.contains(f)) f.dropRight(2) else f
  }

  /** `COMMON_ENCODINGS` (`encoding.py:11-31`). */
  val CommonEncodings: Seq[String] = Seq(
    "utf_8", "iso_8859_1", "iso_8859_6", "iso_8859_8", "ascii", "big5",
    "utf_16", "utf_16_be", "utf_16_le", "utf_32", "utf_32_be", "utf_32_le",
    "euc_jis_2004", "euc_jisx0213", "euc_jp", "euc_kr", "gb18030",
    "shift_jis", "shift_jis_2004", "shift_jisx0213")

  /** `validate_encoding`: membership in the common list, format-insensitive. */
  def validateEncoding(encoding: String): Boolean =
    CommonEncodings.exists(c => formatEncodingStr(c) == formatEncodingStr(encoding))

  private def isValidUtf8(bytes: Array[Byte], from: Int): Boolean = {
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try { dec.decode(java.nio.ByteBuffer.wrap(bytes, from, bytes.length - from)); true }
    catch { case _: java.nio.charset.CharacterCodingException => false }
  }

  /** Detected (normalized encoding name, payload offset past any BOM). */
  def detect(bytes: Array[Byte]): (String, Int) = {
    val n = bytes.length
    def b(i: Int) = bytes(i) & 0xff
    if (n >= 4 && b(0) == 0xff && b(1) == 0xfe && b(2) == 0 && b(3) == 0)
      return ("utf-32-le", 4)
    if (n >= 4 && b(0) == 0 && b(1) == 0 && b(2) == 0xfe && b(3) == 0xff)
      return ("utf-32-be", 4)
    if (n >= 3 && b(0) == 0xef && b(1) == 0xbb && b(2) == 0xbf) return ("utf-8", 3)
    if (n >= 2 && b(0) == 0xff && b(1) == 0xfe) return ("utf-16-le", 2)
    if (n >= 2 && b(0) == 0xfe && b(1) == 0xff) return ("utf-16-be", 2)
    if (n >= 4 && n % 2 == 0) {
      // BOM-less UTF-16 of ASCII-dominant text: one side of byte pairs ~NUL
      var zeroOdd = 0; var zeroEven = 0
      var i = 0
      while (i < n) { if (b(i) == 0) { if (i % 2 == 1) zeroOdd += 1 else zeroEven += 1 }; i += 1 }
      val half = n / 2
      if (zeroOdd > 0.6 * half && zeroEven < 0.1 * half) return ("utf-16-le", 0)
      if (zeroEven > 0.6 * half && zeroOdd < 0.1 * half) return ("utf-16-be", 0)
    }
    if (isValidUtf8(bytes, 0)) ("utf-8", 0)
    else {
      // 0x80-0x9F are C1 controls in true latin-1 — never intentional text.
      // charset_normalizer (the reference's statistical detector) resolves
      // such content to cp1252, whose only difference from latin-1 is mapping
      // that range to printable characters (Euro sign, smart quotes, ...)
      var i = 0
      var hasC1 = false
      while (i < n && !hasC1) { if (b(i) >= 0x80 && b(i) <= 0x9f) hasC1 = true; i += 1 }
      if (hasC1) ("windows-1252", 0)
      // first always-decoding fallback in COMMON_ENCODINGS order
      else ("iso-8859-1", 0)
    }
  }

  private def charsetOf(name: String): Charset = name match {
    case "utf-8" => StandardCharsets.UTF_8
    case "utf-16-le" => StandardCharsets.UTF_16LE
    case "utf-16-be" => StandardCharsets.UTF_16BE
    case "utf-32-le" => Charset.forName("UTF-32LE")
    case "utf-32-be" => Charset.forName("UTF-32BE")
    case "windows-1252" => Charset.forName("windows-1252")
    case _ => StandardCharsets.ISO_8859_1
  }

  /** Detect + decode, BOM stripped. */
  def decodeText(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.isEmpty) return ""
    val (enc, off) = detect(bytes)
    new String(bytes, off, bytes.length - off, charsetOf(enc))
  }

  /**
   * Explicit-encoding decode for `partition(..., encoding=...)` — the
   * reference's `read_txt_file` filename branch
   * (`file_utils/encoding.py:118-133`): the caller's encoding is applied
   * STRICTLY, surfacing decode failures (Python `UnicodeDecodeError`) as
   * [[java.nio.charset.CharacterCodingException]] instead of silently
   * replacing bytes, and Python's text-mode `utf-16`/`utf-32` codecs demand
   * a BOM ("UTF-16 stream does not start with BOM", a `UnicodeError`) —
   * mirrored as IllegalArgumentException with that message. The unmarked
   * codecs consume a present BOM; the suffixed (-le/-be) and utf-8 codecs
   * keep it as content U+FEFF, exactly as Python does — all pinned by the
   * 2,210-vector `EncodingDifferentialSpec` corpus generated from Python's
   * own text-mode decode machinery.
   */
  def decodeTextStrict(bytes: Array[Byte], encoding: String): String = {
    if (bytes == null || bytes.isEmpty) return ""
    val fe = formatEncodingStr(encoding)
    def b(i: Int) = bytes(i) & 0xff
    def strict(cs: Charset): String = {
      val dec = cs.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    }
    // CPython's unmarked utf-16/utf-32 codec (encodings/utf_16.py
    // _buffer_decode): without a BOM it first ATTEMPTS a native-order (LE)
    // decode — a malformed LE stream raises UnicodeDecodeError — and only a
    // stream that decodes cleanly yet carries no BOM raises the
    // "does not start with BOM" UnicodeError.
    val out = fe match {
      case "utf-16" =>
        val hasBom = bytes.length >= 2 && ((b(0) == 0xff && b(1) == 0xfe) ||
          (b(0) == 0xfe && b(1) == 0xff))
        if (hasBom) strict(StandardCharsets.UTF_16)
        else {
          strict(StandardCharsets.UTF_16LE)
          throw new IllegalArgumentException(
            "UTF-16 stream does not start with BOM")
        }
      case "utf-32" =>
        val hasBom = bytes.length >= 4 &&
          ((b(0) == 0xff && b(1) == 0xfe && b(2) == 0 && b(3) == 0) ||
            (b(0) == 0 && b(1) == 0 && b(2) == 0xfe && b(3) == 0xff))
        if (hasBom) strict(Charset.forName("UTF-32"))
        else {
          strict(Charset.forName("UTF-32LE"))
          throw new IllegalArgumentException(
            "UTF-32 stream does not start with BOM")
        }
      case "utf-32-le" | "utf-32-be" =>
        // JDK quirk: the suffixed UTF-32 decoders CONSUME a leading BOM,
        // where Python (and the suffixed UTF-16 decoders) keep it as
        // content U+FEFF — reinstate it
        val bomLen =
          if (fe == "utf-32-le" && bytes.length >= 4 && b(0) == 0xff &&
            b(1) == 0xfe && b(2) == 0 && b(3) == 0) 4
          else if (fe == "utf-32-be" && bytes.length >= 4 && b(0) == 0 &&
            b(1) == 0 && b(2) == 0xfe && b(3) == 0xff) 4
          else 0
        val dec = strict(charsetOf(fe))
        if (bomLen > 0 && (dec.isEmpty || dec.charAt(0) != '\uFEFF'))
          "\uFEFF" + dec
        else dec
      case other =>
        strict(try Charset.forName(other)
          catch { case _: Exception => charsetOf(other) })
    }
    // NO post-hoc BOM stripping: Python consumes the BOM only in the
    // unmarked utf-16/utf-32 codecs (which Java's UTF-16/UTF-32 charsets
    // mirror); a BOM under an explicit -le/-be/utf-8 decode is CONTENT
    // (U+FEFF), exactly as b"\xef\xbb\xbfx".decode("utf-8") keeps it \u2014
    // pinned by the 2,210-vector EncodingDifferentialSpec corpus
    out
  }
}
