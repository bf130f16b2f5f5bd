package graft.queries

/**
 * DuckDB SQL snippet builders mirroring the Spark column functions in
 * `graft.functions.*` formula-for-formula. Each builder takes a SQL expression string
 * and returns the equivalent DuckDB expression — the oracle side of the driver's
 * correctness compare. Sentence segmentation uses the literally identical extraction
 * pattern (`[^.!?]+[.!?]+|[^.!?]+$`) on both engines (`Predicates.sentenceCount` uses
 * `regexp_extract_all`, not a lookbehind split), so counts agree on every input,
 * including periods not followed by whitespace.
 */
object OracleSql {

  /** Python-strip: trim all leading/trailing whitespace. */
  def strip(x: String): String = s"regexp_replace($x, '^\\s+|\\s+$$', '', 'g')"

  def lstrip(x: String): String = s"regexp_replace($x, '^\\s+', '')"
  def rstrip(x: String): String = s"regexp_replace($x, '\\s+$$', '')"

  /** Whitespace word tokens, empties dropped. */
  def words(x: String): String =
    s"list_filter(string_split_regex($x, '\\s+'), w -> w <> '')"

  def wordCount(x: String): String = s"len(${words(x)})"

  /** clean_extra_whitespace mirror. */
  def cleanExtraWhitespace(x: String): String =
    strip(s"regexp_replace(regexp_replace($x, '[\\x{00A0}\\n]', ' ', 'g'), ' {2,}', ' ', 'g')")

  /** Bullet alternation WITHOUT the trailing negative lookahead (RE2 has none); callers
    * must only use it where the double-bullet case cannot occur. */
  val bulletsAlt: String =
    "\\x{0095}|\\x{2022}|\\x{2023}|\\x{2043}|\\x{3164}|\\x{204C}|\\x{204D}|\\x{2219}" +
      "|\\x{25CB}|\\x{25CF}|\\x{25D8}|\\x{25E6}|\\x{2619}|\\x{2765}|\\x{2767}" +
      "|\\x{29BE}|\\x{29BF}|\\x{002D}|\\x{2013}|\\x{F0B7}|\\*|\\x{00B7}"

  def isBulleted(x: String): String =
    s"regexp_matches(${strip(x)}, '^(?:$bulletsAlt)')"

  /** Sentence segments — same extraction pattern as the Spark side. */
  def sentences(x: String): String =
    s"list_filter(regexp_extract_all(${strip(x)}, '[^.!?]+[.!?]+|[^.!?]+$$'), " +
      s"s -> ${strip("s")} <> '')"

  def removePunct(x: String): String = s"regexp_replace($x, '\\p{P}', '', 'g')"

  /** sentence_count with min word length. */
  def sentenceCount(x: String, minLength: Int): String =
    if (minLength <= 0) s"len(${sentences(x)})"
    else s"len(list_filter(${sentences(x)}, s -> " +
      s"len(list_filter(${words(removePunct("s"))}, w -> w <> '' AND w <> '.')) >= $minLength))"

  def isUpperText(x: String): String = s"(upper($x) = $x AND lower($x) <> $x)"
  def isNumericText(x: String): String = s"regexp_matches($x, '^[0-9]+$$')"

  def underNonAlphaRatio(x: String, thr: Double = 0.5): String = {
    val total = s"length(regexp_replace($x, '\\s', '', 'g'))"
    val alpha = s"length(regexp_replace($x, '[^\\p{L}]', '', 'g'))"
    s"(CASE WHEN $total > 0 THEN ($alpha::DOUBLE / $total::DOUBLE) < $thr ELSE false END)"
  }

  def exceedsCapRatio(x: String, thr: Double = 0.5): String = {
    val tokens = s"list_filter(string_split_regex($x, '[^\\p{L}]+'), w -> w <> '')"
    // Unicode istitle/isupper, mirroring Predicates.exceedsCapRatio
    val capped =
      s"list_filter($tokens, w -> regexp_matches(w, '^\\p{Lu}\\p{Ll}*$$|^\\p{Lu}+$$'))"
    s"(CASE WHEN ${sentenceCount(x, 3)} > 1 THEN false " +
      s"WHEN ${isUpperText(x)} THEN true " +
      s"WHEN len($tokens) = 0 THEN true " +
      s"ELSE (len($capped)::DOUBLE / len($tokens)::DOUBLE) > $thr END)"
  }

  def containsVerb(x: String): String = {
    val verbs = graft.functions.Predicates.CommonVerbs.map(v => s"'$v'").mkString(", ")
    val ws = s"list_filter(string_split_regex(lower($x), '[^a-z]+'), w -> w <> '')"
    s"(len(list_filter($ws, w -> w IN ($verbs))) > 0 " +
      s"OR len(list_filter($ws, w -> regexp_matches(w, '^[a-z]{3,}(ing|ed)$$'))) > 0)"
  }

  def isPossibleNarrative(x: String): String =
    s"(length($x) > 0 AND NOT ${isNumericText(x)} AND NOT ${exceedsCapRatio(x)} " +
      s"AND NOT ${underNonAlphaRatio(x)} " +
      s"AND (${sentenceCount(x, 3)} >= 2 OR ${containsVerb(x)}))"

  def isPossibleTitle(x: String): String =
    s"(length($x) > 0 " +
      s"AND NOT (${isUpperText(x)} AND regexp_matches($x, '[^\\w\\s]$$')) " +
      s"AND len(string_split($x, ' ')) <= 12 " +
      s"AND NOT ${underNonAlphaRatio(x)} " +
      s"AND NOT regexp_matches($x, ',$$') " +
      s"AND NOT ${isNumericText(x)} " +
      s"AND ${sentenceCount(x, 5)} <= 1)"

  def isEmailAddr(x: String): String =
    s"regexp_matches(${strip(x)}, '^${graft.functions.Predicates.EmailAddressPattern}')"

  def isUsCityStateZip(x: String): String = {
    // Same alternation as Predicates.UsCityStateZipPattern (RE2-compatible already).
    val p = graft.functions.Predicates.UsCityStateZipPattern
      .replace("\\", "\\").replace("'", "''")
    s"regexp_matches(${strip(x)}, '^(?:$p)')"
  }

  def isNumberedList(x: String): String =
    s"regexp_matches(${strip(x)}, '^\\d+(\\.|\\))\\s(.+)')"

  /** The classification cascade — mirrors `Predicates.classifyText` order exactly. */
  def classify(x: String): String =
    s"(CASE WHEN ${strip(x)} = '' THEN 'UncategorizedText' " +
      s"WHEN ${isBulleted(x)} THEN 'ListItem' " +
      s"WHEN ${isEmailAddr(x)} THEN 'EmailAddress' " +
      s"WHEN ${isUsCityStateZip(x)} THEN 'Address' " +
      s"WHEN ${isNumberedList(x)} THEN 'ListItem' " +
      s"WHEN ${isPossibleNarrative(x)} THEN 'NarrativeText' " +
      s"WHEN ${isPossibleTitle(x)} THEN 'Title' " +
      s"ELSE 'UncategorizedText' END)"

  /** `derive_element_type_from_text` mirror (the HTML parser's cascade,
    * `parser.py:921-936`); NULL = paragraph skipped. */
  def deriveHtml(x: String): String =
    s"(CASE WHEN ${isBulleted(x)} THEN 'ListItem' " +
      s"WHEN ${isUsCityStateZip(x)} THEN 'Address' " +
      s"WHEN ${isEmailAddr(x)} THEN 'EmailAddress' " +
      s"WHEN length($x) < 2 THEN NULL " +
      s"WHEN ${isPossibleNarrative(x)} THEN 'NarrativeText' " +
      s"ELSE 'UncategorizedText' END)"

  /** DOCX untyped-paragraph cascade mirror (`docx.py:938-951`): never NULL. */
  def deriveDocx(x: String): String =
    s"(CASE WHEN ${isUsCityStateZip(x)} THEN 'Address' " +
      s"WHEN ${isEmailAddr(x)} THEN 'EmailAddress' " +
      s"WHEN ${isPossibleNarrative(x)} THEN 'NarrativeText' " +
      s"ELSE 'UncategorizedText' END)"

  /** PPTX body-paragraph cascade mirror (`pptx.py:225-245`): never NULL. */
  def derivePptx(x: String): String =
    s"(CASE WHEN ${isEmailAddr(x)} THEN 'EmailAddress' " +
      s"WHEN ${isPossibleNarrative(x)} THEN 'NarrativeText' " +
      s"WHEN ${isPossibleTitle(x)} THEN 'Title' " +
      s"ELSE 'UncategorizedText' END)"

  /** Polynomial rolling hash mod 1e9+7 — mirrors `TextAnalysis.polyHash`. */
  def polyHash(x: String): String =
    s"list_reduce(list_prepend(0::BIGINT, " +
      s"list_transform(range(1, length($x) + 1), i -> ascii(substring($x, i, 1)))), " +
      s"(acc, ch) -> (acc * 31 + ch) % 1000000007)"

  /** 3-word shingles — mirrors `TextAnalysis.wordShingles(c, 3)`. */
  def shingles3(ws: String): String =
    s"(CASE WHEN len($ws) >= 3 THEN " +
      s"list_transform(range(1, len($ws) - 1), i -> " +
      s"$ws[i] || ' ' || $ws[i+1] || ' ' || $ws[i+2]) " +
      s"ELSE [array_to_string($ws, ' ')] END)"

  /** General n-word shingles (mirrors `TextAnalysis.wordShingles`: fewer than
    * n words yields the single space-joined gram). */
  def shinglesN(ws: String, n: Int): String = {
    val terms = (0 until n).map(k => s"$ws[i+$k]").mkString(" || ' ' || ")
    s"(CASE WHEN len($ws) >= $n THEN " +
      s"list_transform(range(1, len($ws) - ${n - 2}), i -> $terms) " +
      s"ELSE [array_to_string($ws, ' ')] END)"
  }

  /** 2-word shingles. */
  def shingles2(ws: String): String =
    s"(CASE WHEN len($ws) >= 2 THEN " +
      s"list_transform(range(1, len($ws)), i -> $ws[i] || ' ' || $ws[i+1]) " +
      s"ELSE [array_to_string($ws, ' ')] END)"

  def stopwordCount(x: String, stopwords: Seq[String]): String = {
    val set = stopwords.map(s => s"'$s'").mkString(", ")
    s"len(list_filter(${words(s"lower($x)")}, w -> w IN ($set)))"
  }

  /** A string literal as a chr()-concatenation — safe for any unicode/quote content. */
  def chrLit(s: String): String =
    if (s.isEmpty) "''"
    else s.map(ch => s"chr(${ch.toInt})").mkString(" || ")

  /** Full 14-entry ligature expansion — mirrors `Cleaners.cleanLigatures` order. */
  def cleanLigatures(x: String): String =
    graft.functions.Cleaners.LigaturesMap.foldLeft(x) { case (acc, (k, v)) =>
      s"replace($acc, ${chrLit(k)}, '$v')"
    }

  /** Full mojibake/smart-quote table — mirrors `Cleaners.replaceUnicodeQuotes` order. */
  def replaceUnicodeQuotes(x: String): String =
    graft.functions.Cleaners.UnicodeQuotesMap.foldLeft(x) { case (acc, (k, v)) =>
      s"replace($acc, ${chrLit(k)}, ${chrLit(v)})"
    }

  /** Whitespace tokens of the stripped input (mirrors `split(pyStrip(c), "\\s+")`). */
  private def bulletToks(x: String): String =
    s"string_split_regex(${strip(x)}, '\\s+')"

  /** First-token ordered-bullet test — mirrors `Cleaners.cleanOrderedBullets` guards. */
  private def isOrderedBullet(t0: String): String =
    s"(contains($t0, '.') AND NOT contains($t0, '..') " +
      s"AND length(string_split($t0, '.')[1]) <= 2)"

  /** `clean_ordered_bullets` mirror — drop the bullet token, else identity. */
  def cleanOrderedBullets(x: String): String = {
    val toks = bulletToks(x)
    val isB = isOrderedBullet(s"($toks)[1]")
    s"(CASE WHEN $isB AND len($toks) > 1 " +
      s"THEN array_to_string(list_slice($toks, 2, len($toks)), ' ') " +
      s"WHEN $isB THEN '' ELSE $x END)"
  }

  /** `extract_ordered_bullets` mirror: (section, sub_section, sub_sub_section) fields. */
  def orderedBulletField(x: String, idx: Int): String = {
    val t0 = s"(${bulletToks(x)})[1]"
    val parts = s"list_filter(string_split($t0, '.'), p -> p <> '')"
    s"(CASE WHEN ${isOrderedBullet(t0)} AND len($parts) >= $idx " +
      s"THEN ($parts)[$idx] ELSE NULL END)"
  }
}
