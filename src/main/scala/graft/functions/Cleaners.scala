package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * The engine's scalar string-function library: text cleaners, expressed as Catalyst
 * column expressions (codegen'd built-ins — `regexp_replace`, `translate`, `trim` — no UDFs
 * in the hot path).
 *
 * Semantics follow the reference cleaners (`/root/reference/unstructured/cleaners/core.py`);
 * each function cites its counterpart. String-level (parser-side) twins live in
 * [[CleanersImpl]] for use inside format partitioners.
 *
 * Source is kept pure-ASCII: all non-ASCII characters appear as \\uXXXX escapes.
 */
object Cleaners {

  /**
   * Python whitespace as a Java regex character class: everything `str.isspace`
   * accepts — ASCII controls (incl. the \\x1C-\\x1F file/group separators),
   * NEL, NBSP, Ogham space, the Zs block, line/paragraph separators, narrow
   * NBSP, math space, ideographic space. Java's bare `\\s` is ASCII-only and
   * `(?U)\\s` (White_Space property) misses \\x1C-\\x1F, so the class is
   * spelled out. Used wherever the reference strips or splits on `\\s`.
   */
  val PySpaceClass: String =
    "[\\t\\n\\x0B\\f\\r\\x1C-\\x1F \\x{85}\\x{A0}\\x{1680}\\x{2000}-\\x{200A}" +
      "\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}]"

  /** Python `str.isspace` for one UTF-16 unit (see [[PySpaceClass]]). */
  @inline def pyIsSpaceChar(c: Char): Boolean =
    Character.isWhitespace(c) ||
      c == '\u0085' || c == '\u00A0' || c == '\u2007' || c == '\u202F'

  /** String-level Python `str.lstrip()` / `rstrip()` / `strip()`. */
  def pyStripLeadingStr(s: String): String = {
    var i = 0
    while (i < s.length && pyIsSpaceChar(s.charAt(i))) i += 1
    if (i == 0) s else s.substring(i)
  }

  def pyStripTrailingStr(s: String): String = {
    var j = s.length
    while (j > 0 && pyIsSpaceChar(s.charAt(j - 1))) j -= 1
    if (j == s.length) s else s.substring(0, j)
  }

  def pyStripStr(s: String): String = pyStripLeadingStr(pyStripTrailingStr(s))

  /**
   * Unicode bullet alternation — `nlp/patterns.py:29-55`. Includes the PUA bullet
   * (U+F0B7) emitted by some PDF extractors, `-`, en-dash and `*`.
   */
  val BulletsPattern: String = Seq(
    "\u0095", "\u2022", "\u2023", "\u2043", "\u3164", "\u204C",
    "\u204D", "\u2219", "\u25CB", "\u25CF", "\u25D8", "\u25E6",
    "\u2619", "\u2765", "\u2767", "\u29BE", "\u29BF", "\u002D",
    "\u2013", "\uF0B7", "\\*", "\u00B7").mkString("|")

  /** One bullet not followed by another — `UNICODE_BULLETS_RE`, `patterns.py:55`. */
  val UnicodeBulletsRegex: String = s"(?:$BulletsPattern)(?!$BulletsPattern)"

  private lazy val BulletAnchorRe = ("^" + UnicodeBulletsRegex).r

  /** String-level `is_bulleted_text` for per-file parsers (`text_type.py:165-167`). */
  def isBulletedTextStr(s: String): Boolean =
    BulletAnchorRe.findFirstIn(s.strip).isDefined

  /** String-level `clean_bullets` (`core.py:37-49`). */
  def cleanBulletsStr(s: String): String =
    if (!BulletAnchorRe.findFirstIn(s).isDefined) s
    else BulletAnchorRe.replaceFirstIn(s, "").strip

  /**
   * Python-`str.strip()` equivalent: trims ALL leading/trailing whitespace (Spark's `trim`
   * only removes spaces).
   */
  def pyStrip(c: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.functions.expr.PyStrip(
        org.apache.spark.sql.graft.bridge.expression(c)))

  /** Python `str.lstrip()` as a column. */
  def pyStripLeadingCol(c: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.functions.expr.PyStrip(
        org.apache.spark.sql.graft.bridge.expression(c), trailing = false))

  /** Python `str.rstrip()` as a column. */
  def pyStripTrailingCol(c: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.functions.expr.PyStrip(
        org.apache.spark.sql.graft.bridge.expression(c), leading = false))

  /** `clean_extra_whitespace` — `core.py:325-334`: NBSP/newline -> space, collapse runs, strip. */
  def cleanExtraWhitespace(c: Column): Column =
    pyStrip(regexp_replace(regexp_replace(c, "[\u00A0\n]", " "), " {2,}", " "))

  /** `clean_bullets` — `core.py:37-49`: strip ONE leading unicode bullet, then strip ws. */
  def cleanBullets(c: Column): Column = {
    val anchored = s"^(?:$BulletsPattern)(?!$BulletsPattern)"
    when(regexp_like(c, lit(anchored)), pyStrip(regexp_replace(c, anchored, "")))
      .otherwise(c)
  }

  /**
   * `clean_ordered_bullets` — `core.py:52-73`: drop a leading `1.1.x` / `a.b`-style ordered
   * bullet token (first whitespace token containing ".", no "..", head segment of at most
   * 2 chars).
   */
  def cleanOrderedBullets(c: Column): Column = {
    val parts = split(pyStrip(c), PySpaceClass + "+")
    val t0 = element_at(parts, 1)
    val head = element_at(split(t0, "\\."), 1)
    val isBullet = t0.contains(".") && !t0.contains("..") && (length(head) <= 2)
    when(isBullet && size(parts) > 1, array_join(slice(parts, 2, 100000), " "))
      .when(isBullet, lit(""))
      .otherwise(c)
  }

  /** Ligature map — `core.py:76-104`. */
  val LigaturesMap: Seq[(String, String)] = Seq(
    "\u00E6" -> "ae", "\u00C6" -> "AE", "\uFB00" -> "ff", "\uFB01" -> "fi",
    "\uFB02" -> "fl", "\uFB03" -> "ffi", "\uFB04" -> "ffl", "\uFB05" -> "ft",
    "\u02AA" -> "ls", "\u0153" -> "oe", "\u0152" -> "OE", "\u0239" -> "qp",
    "\uFB06" -> "st", "\u02A6" -> "ts")

  /** `clean_ligatures` — `core.py:76-104`: 14-entry ligature expansion. */
  def cleanLigatures(c: Column): Column =
    LigaturesMap.foldLeft(c) { case (acc, (k, v)) => replace(acc, lit(k), lit(v)) }

  /** `clean_dashes` — `core.py:337-345`: `-` and en-dash -> space, strip. */
  def cleanDashes(c: Column): Column =
    pyStrip(regexp_replace(c, "[-\u2013]", " "))

  /** `clean_trailing_punctuation` — `core.py:348-355`: strip, then rstrip `.,:;`. */
  def cleanTrailingPunctuation(c: Column): Column =
    regexp_replace(pyStrip(c), "[.,:;]+$", "")

  /** `clean_non_ascii_chars` — `core.py:25-34`: drop all non-ASCII code points. */
  def cleanNonAsciiChars(c: Column): Column =
    regexp_replace(c, "[^\\x00-\\x7F]", "")

  /**
   * Mojibake / smart-quote repair table — `core.py:271-303` (order preserved; the
   * reference table's `\x91..\x94` C1 controls and UTF-8-as-latin-1 `\xe2\x80..`
   * sequences are spelled with explicit escapes).
   */
  val UnicodeQuotesMap: Seq[(String, String)] = Seq(
    "\u0091" -> "\u2018", "\u0092" -> "\u2019",
    "\u0093" -> "\u201C", "\u0094" -> "\u201D",
    "&apos;" -> "'", "\u00E2\u0080\u0099" -> "'",
    "\u00E2\u0080\u201C" -> "\u2014", "\u00E2\u0080\u201D" -> "\u2013",
    "\u00E2\u0080\u02DC" -> "\u2018", "\u00E2\u0080\u00A6" -> "\u2026",
    "\u00E2\u0080\u2122" -> "\u2019", "\u00E2\u0080\u0153" -> "\u201C",
    "\u00E2\u0080?" -> "\u201D", "\u00E2\u0080\u0165" -> "\u201D",
    "\u00E2\u0080\u015B" -> "\u201C", "\u00E2\u0080\u00A8" -> "\u2014",
    "\u00E2\u0080\u0142" -> "\u2033", "\u00E2\u0080\u017D" -> "",
    "\u00E2\u0080\u201A" -> "", "\u00E2\u0080\u2030" -> "",
    "\u00E2\u0080\u200B" -> "", "\u00E2\u0080" -> "",
    "\u00E2\u0080s'" -> "")

  /** `replace_unicode_quotes` — `core.py:271-303`: sequential literal replacements. */
  def replaceUnicodeQuotes(c: Column): Column =
    UnicodeQuotesMap.foldLeft(c) { case (acc, (k, v)) =>
      if (v.isEmpty) regexp_replace(acc, java.util.regex.Pattern.quote(k), "")
      else replace(acc, lit(k), lit(v))
    }

  /** The 19 double- and 20 single-quote codepoints the reference's
    * `standardize_quotes` folds to ASCII (`metrics/text_extraction.py:7-54`) —
    * includes the three supplementary sans-serif ornament quotes (U+1F676-78),
    * so lengths below are CODEPOINT counts, not char counts. */
  val DoubleQuoteCodepoints: String =
    "\"“”„‟«»❝❞⹂" +
      new String(Character.toChars(0x1F676)) +
      new String(Character.toChars(0x1F677)) +
      new String(Character.toChars(0x1F678)) +
      "⠦⠴〝〞〟＂"
  val SingleQuoteCodepoints: String =
    "'‘’‚‛‹›❛❜" +
      "「」『』﹁﹂﹃﹄＇｢｣"

  /** `standardize_quotes` — `metrics/text_extraction.py:214-224` (the
    * reference's own pytest micro-benchmark target): one codepoint-level
    * `translate`, no regex. */
  def standardizeQuotes(c: Column): Column =
    translate(c, DoubleQuoteCodepoints + SingleQuoteCodepoints,
      "\"" * 19 + "'" * 20)

  /** `remove_punctuation` — `core.py:311-313`: drop all Unicode-category-P chars. */
  def removePunctuation(c: Column): Column =
    regexp_replace(c, "\\p{P}", "")

  /** `remove_sentence_punctuation` — `core.py:316-322`: drop punctuation except exclusions. */
  def removeSentencePunctuation(c: Column, exclude: Seq[String]): Column =
    if (exclude.isEmpty) removePunctuation(c)
    else {
      val excl = exclude.map(java.util.regex.Pattern.quote).mkString("|")
      regexp_replace(c, s"(?!$excl)\\p{P}", "")
    }

  /** `clean_prefix` — `core.py:369-383`: strip a regex prefix; optional lstrip. */
  def cleanPrefix(c: Column, pattern: String, ignoreCase: Boolean = false,
      strip: Boolean = true): Column = {
    val p = (if (ignoreCase) "(?i)" else "") + "^(?:" + pattern + ")"
    val stripped = regexp_replace(c, p, "")
    if (strip) pyStripLeadingCol(stripped) else stripped
  }

  /** `clean_postfix` — `core.py:386-400`: strip a regex suffix; optional rstrip. */
  def cleanPostfix(c: Column, pattern: String, ignoreCase: Boolean = false,
      strip: Boolean = true): Column = {
    val p = (if (ignoreCase) "(?i)" else "") + "(?:" + pattern + ")$"
    val stripped = regexp_replace(c, p, "")
    if (strip) pyStripTrailingCol(stripped) else stripped
  }

  /**
   * `clean` — `core.py:403-429` composite, reference application order:
   * lowercase -> trailing punctuation -> dashes -> extra whitespace -> bullets -> final strip.
   */
  def clean(c: Column, extraWhitespace: Boolean = false, dashes: Boolean = false,
      bullets: Boolean = false, trailingPunctuation: Boolean = false,
      lowercase: Boolean = false): Column = {
    var x = if (lowercase) lower(c) else c
    if (trailingPunctuation) x = cleanTrailingPunctuation(x)
    if (dashes) x = cleanDashes(x)
    if (extraWhitespace) x = cleanExtraWhitespace(x)
    if (bullets) x = cleanBullets(x)
    pyStrip(x)
  }

  /**
   * `replace_mime_encodings` — quoted-printable decode in the given charset
   * (`core.py:358-366`). Per-row imperative decode (no column-expression
   * equivalent): use inside parser flatMaps or via `Registries.registerCleaner`.
   */
  /**
   * `format_encoding_str` — `file_utils/encoding.py:35-50`: lowercase, underscores to
   * dashes, strip iso-8859 directional annotations; plus the Python codec aliases
   * (`latin-1`) Java's `Charset` doesn't know.
   */
  def formatEncodingStr(encoding: String): java.nio.charset.Charset = {
    var e = encoding.toLowerCase.replace('_', '-')
    if (Seq("iso-8859-6-i", "iso-8859-6-e", "iso-8859-8-i", "iso-8859-8-e").contains(e))
      e = e.dropRight(2)
    if (e == "latin-1" || e == "latin1") e = "ISO-8859-1"
    // python codec names "utf-16-le"/"utf-32-be" → Java "UTF-16LE"/"UTF-32BE"
    val m = "^(utf-(?:16|32))-(le|be)$".r.findFirstMatchIn(e)
    m.foreach(x => e = x.group(1) + x.group(2))
    java.nio.charset.Charset.forName(e)
  }

  /** Python `str.encode(cs)` / `bytes.decode(cs)` are STRICT — Java's
    * `getBytes(cs)` silently writes `?` for unencodable chars and
    * `new String(bytes, cs)` writes U+FFFD for malformed input, so both
    * round-trip legs go through REPORT-mode coders (UnicodeEncodeError /
    * UnicodeDecodeError surface as CharacterCodingException). */
  private def encodeStrict(text: String, cs: java.nio.charset.Charset): Array[Byte] = {
    val buf = cs.newEncoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      .encode(java.nio.CharBuffer.wrap(text))
    val out = new Array[Byte](buf.remaining())
    buf.get(out)
    out
  }

  private def decodeStrict(bytes: Array[Byte], cs: java.nio.charset.Charset): String =
    cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      .decode(java.nio.ByteBuffer.wrap(bytes)).toString

  /** `replace_mime_encodings` — `core.py:358-366`:
    * `quopri.decodestring(text.encode(enc)).decode(enc)` — the text is
    * re-encoded in the TARGET encoding before QP decode (a latin-1 literal
    * 'é' must contribute the byte E9, not its UTF-8 pair), and both legs are
    * strict. */
  def replaceMimeEncodings(text: String, encoding: String = "utf-8"): String = {
    val cs = formatEncodingStr(encoding)
    decodeStrict(
      graft.sources.Partitioners.quopriDecode(encodeStrict(text, cs)), cs)
  }

  /** `bytes_string_to_string` — mojibake repair: chars reinterpreted as raw bytes
    * then decoded with `encoding` (`core.py:432-437`). `bytes([ord(c) ...])`
    * raises ValueError for any char above U+00FF — truncating would decode
    * garbage where the reference errors. */
  def bytesStringToString(text: String, encoding: String = "utf-8"): String = {
    val bytes = new Array[Byte](text.length)
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c > 0xFF)
        throw new IllegalArgumentException(
          s"bytes must be in range(0, 256): ${c.toInt}")
      bytes(i) = c.toByte
      i += 1
    }
    decodeStrict(bytes, formatEncodingStr(encoding))
  }

  /**
   * `clean_extra_whitespace_with_index_run` — `core.py:440-497`: NBSP/newline -> space,
   * collapse space runs, strip; also returns, for every position of the CLEANED text,
   * how many characters were dropped before it (the "moved index"), so downstream
   * link/annotation offsets can be remapped. `moved` has `text.length` slots; positions
   * past the cleaned length carry the final distance (mirrors the numpy tail-fill).
   */
  def cleanExtraWhitespaceWithIndexRun(text: String): (String, Array[Long]) = {
    // CODE-POINT indexed throughout: the reference's moved array has one slot
    // per Python character, and downstream link offsets are code-point indices
    val cps = text.codePoints.toArray
    val translated = new String(
      cps.map(c => if (c == 0xA0 || c == '\n') ' '.toInt else c), 0, cps.length)
    // Python str.strip(): also trims NEL/figure-space/narrow-NBSP etc.
    val cleaned = pyStripStr(translated.replaceAll(" {2,}", " "))
    val cleanedCps = cleaned.codePoints.toArray
    val moved = new Array[Long](cps.length)
    var distance = 0L
    var oi = 0
    var ci = 0
    while (ci < cleanedCps.length) {
      val cOrig = cps(oi)
      val cClean = cleanedCps(ci)
      if (cOrig == cClean || ((cOrig == 0xA0 || cOrig == '\n') && cClean == ' ')) {
        moved(ci) = distance
        oi += 1
        ci += 1
      } else {
        distance += 1
        moved(ci) = distance
        oi += 1
      }
    }
    java.util.Arrays.fill(moved, ci, cps.length, distance)
    (cleaned, moved)
  }

  /** `index_adjustment_after_clean_extra_whitespace` — `core.py:500-507`. */
  def indexAdjustmentAfterCleanExtraWhitespace(index: Int, moved: Array[Long]): Long =
    index - moved(index)

  /**
   * `translate_text` — `cleaners/translate.py:24-72`. The reference shells out to a
   * Helsinki-NLP opus-mt model; no MT model is available in this environment, so the
   * model call is STUBBED with a deterministic fake (text tagged with the language
   * pair) while the plumbing — source-language detection via [[TextAnalysis]],
   * same-language short-circuit, empty-input passthrough — is real.
   */
  def translateText(text: String, sourceLang: String, targetLang: String = "en"): String = {
    if (text == null || text.strip.isEmpty) return text
    if (sourceLang == targetLang) text
    else s"[mt-stub $sourceLang->$targetLang] $text"
  }
}
