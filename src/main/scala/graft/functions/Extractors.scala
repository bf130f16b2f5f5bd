package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text extractors — `str -> str | array | struct` column expressions.
 *
 * Semantics follow `/root/reference/unstructured/cleaners/extract.py` and the regexes in
 * `/root/reference/unstructured/nlp/patterns.py`.
 */
object Extractors {

  /** `IP_ADDRESS_PATTERN` — `patterns.py:90-94` (IPv4 + loose IPv6 alternation). */
  val IpAddressPattern: String =
    "(?:25[0-5]|2[0-4]\\d|1\\d{2}|[1-9]?\\d)(?:\\.(?:25[0-5]|2[0-4]\\d|1\\d{2}|[1-9]?\\d)){3}" +
      "|[a-z0-9]{4}::[a-z0-9]{4}:[a-z0-9]{4}:[a-z0-9]{4}:[a-z0-9]{4}%?[0-9]*"

  /** `IP_ADDRESS_NAME_PATTERN` — `patterns.py:96`. */
  val IpAddressNamePattern = "[a-zA-Z0-9-]*\\.[a-zA-Z]*\\.[a-zA-Z]*"

  /** `MAPI_ID_PATTERN` — `patterns.py:99`. */
  val MapiIdPattern = "[0-9]*\\.[0-9]*\\.[0-9]*\\.[0-9]*;"

  /** `EMAIL_DATETIMETZ_PATTERN` — `patterns.py:102-104` (RFC-2822 date). */
  val EmailDatetimeTzPattern =
    "[A-Za-z]{3},\\s\\d{1,2}\\s[A-Za-z]{3}\\s\\d{4}\\s\\d{2}:\\d{2}:\\d{2}\\s[+-]\\d{4}"

  /** `IMAGE_URL_PATTERN` — `patterns.py:133-138`. */
  val ImageUrlPattern: String =
    "(?i)https?://(?:[a-z0-9$_@.&+!*\\(\\),%-])+(?:/[a-z0-9$_@.&+!*\\(\\),%-]*)*" +
      "\\.(?:jpg|jpeg|png|gif|bmp|heic)"

  /** `extract_email_address` — `extract.py:61-63`: all emails, lowercased input. */
  def extractEmailAddress(c: Column): Column =
    regexp_extract_all(lower(c), lit(Predicates.EmailAddressPattern), lit(0))

  /** `extract_ip_address` — `extract.py:65-67`. */
  def extractIpAddress(c: Column): Column =
    regexp_extract_all(c, lit(IpAddressPattern), lit(0))

  /** `extract_ip_address_name` — `extract.py:69-70`. */
  def extractIpAddressName(c: Column): Column =
    regexp_extract_all(c, lit(IpAddressNamePattern), lit(0))

  /** `extract_mapi_id` — `extract.py:73-76`: matches then drops the trailing `;`. */
  def extractMapiId(c: Column): Column =
    transform(regexp_extract_all(c, lit(MapiIdPattern), lit(0)),
      m => regexp_replace(m, ";", ""))

  /** `extract_us_phone_number` — `extract.py:87-101`: first match, stripped; "" if none. */
  def extractUsPhoneNumber(c: Column): Column =
    Cleaners.pyStrip(regexp_extract(c, Predicates.UsPhonePattern, 0))

  /**
   * `extract_datetimetz` — `extract.py:79-84`: first RFC-2822 date in the text as a
   * timestamp (null when absent).
   */
  def extractDatetimeTz(c: Column): Column = {
    val m = regexp_extract(c, EmailDatetimeTzPattern, 0)
    // Spark >= 3.0's datetime parser rejects day-of-week patterns (EEE); the weekday
    // is redundant in RFC-2822 dates, so strip it before parsing.
    val noDow = regexp_replace(m, "^[A-Za-z]{3},\\s", "")
    when(m =!= "", to_timestamp(noDow, "d MMM yyyy HH:mm:ss Z"))
      .otherwise(lit(null).cast("timestamp"))
  }

  private def nthMatchSpan(c: Column, pattern: String, index: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.functions.expr.NthMatch(
        org.apache.spark.sql.graft.bridge.expression(c), pattern, index))

  /** `extract_text_before` — `extract.py:31-43`: prefix before the `index`-th
    * match (0-based, `_get_indexed_match`); null when absent. */
  def extractTextBefore(c: Column, pattern: String, strip: Boolean = true,
      index: Int = 0): Column = {
    // always via NthMatch: regexp_instr counts UTF-16 units while substring
    // counts code points, so they drift apart after astral characters
    val span = nthMatchSpan(c, pattern, index)
    val before = when(span.isNotNull,
      substring(c, lit(1), element_at(span, 1) - 1)).otherwise(lit(null))
    if (strip) Cleaners.pyStripTrailingCol(before) else before
  }

  /** `extract_text_after` — `extract.py:46-58`: suffix after the `index`-th
    * match (0-based); null when absent. */
  def extractTextAfter(c: Column, pattern: String, strip: Boolean = true,
      index: Int = 0): Column = {
    val span = nthMatchSpan(c, pattern, index)
    val after = when(span.isNotNull,
      substring(c, element_at(span, 2) + 1, lit(1000000))).otherwise(lit(null))
    if (strip) Cleaners.pyStripLeadingCol(after) else after
  }

  /**
   * `extract_ordered_bullets` — `extract.py:104-139`: leading `1.1.2`-style bullet split
   * into `(section, sub_section, sub_sub_section)` (nulls when not a bullet).
   */
  def extractOrderedBullets(c: Column): Column = {
    val t0 = get(split(Cleaners.pyStrip(c), Cleaners.PySpaceClass + "+"), lit(0))
    // `re.split(r"[\.]", t0)`, then drop ONLY a trailing empty segment
    // (`if not bullet[-1]: del bullet[-1]` — extract.py:126-128); the head-length
    // gate reads the post-delete head, and an empty head (".x") still qualifies,
    // so "." yields section="" — exactly the reference's tuple
    val rawParts = split(t0, "\\.")
    val parts =
      when(element_at(rawParts, -1) === "", slice(rawParts, lit(1), size(rawParts) - 1))
        .otherwise(rawParts)
    val isBullet = t0.isNotNull && t0.contains(".") && !t0.contains("..") &&
      (length(get(parts, lit(0))) <= 2)
    val a = when(isBullet, get(parts, lit(0))).otherwise(lit(null))
    val b = when(isBullet && size(parts) >= 2, get(parts, lit(1))).otherwise(lit(null))
    val cc = when(isBullet && size(parts) >= 3, get(parts, lit(2))).otherwise(lit(null))
    struct(a.as("section"), b.as("sub_section"), cc.as("sub_sub_section"))
  }

  /** `extract_image_urls_from_html` — `extract.py:142-143`. */
  def extractImageUrlsFromHtml(c: Column): Column =
    regexp_extract_all(c, lit(ImageUrlPattern), lit(0))
}
