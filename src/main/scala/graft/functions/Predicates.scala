package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-classification predicates, as boolean column expressions.
 *
 * Semantics follow `/root/reference/unstructured/partition/text_type.py` and the regexes in
 * `/root/reference/unstructured/nlp/patterns.py`. The reference's NLTK-based helpers
 * (`sent_tokenize`, `word_tokenize`, `pos_tag`) are re-expressed as deterministic
 * regex/arithmetic expressions: a sentence boundary is `[.!?]+` followed by whitespace, a
 * word token is a maximal run of letters, and the verb check is a suffix + wordlist
 * heuristic. This keeps every predicate pure-SQL (codegen'd, shuffle-free) and
 * deterministic across retries.
 */
object Predicates {

  /** `US_PHONE_NUMBERS_PATTERN` — `patterns.py:7-9`. */
  val UsPhonePattern =
    "(?:\\+?(\\d{1,3}))?[-. (]*(\\d{3})?[-. )]*(\\d{3})[-. ]*(\\d{4})(?: *x(\\d+))?\\s*$"

  /** `EMAIL_ADDRESS_PATTERN` — `patterns.py:107`. */
  val EmailAddressPattern = "[a-z0-9\\.\\-+_]+@[a-z0-9\\.\\-+_]+\\.[a-z]+"

  /** `NUMBERED_LIST_PATTERN` — `patterns.py:142`. */
  val NumberedListPattern = "^\\d+(\\.|\\))\\s(.+)"

  /** `US_CITY_STATE_ZIP_PATTERN` — `patterns.py:15-26` (verbatim alternation). */
  val UsCityStateZipPattern: String =
    "(?i)\\b(?:[A-Z][a-z.-]{1,15}[ ]?){1,5},\\s?" +
      "(?:\\{Alabama|Alaska|Arizona|Arkansas|California|Colorado|Connecticut|Delaware|Florida" +
      "|Georgia|Hawaii|Idaho|Illinois|Indiana|Iowa|Kansas|Kentucky|Louisiana|Maine|Maryland" +
      "|Massachusetts|Michigan|Minnesota|Mississippi|Missouri|Montana|Nebraska|Nevada|" +
      "New[ ]Hampshire|New[ ]Jersey|New[ ]Mexico|New[ ]York|North[ ]Carolina|North[ ]Dakota" +
      "|Ohio|Oklahoma|Oregon|Pennsylvania|Rhode[ ]Island|South[ ]Carolina|South[ ]Dakota" +
      "|Tennessee|Texas|Utah|Vermont|Virginia|Washington|West[ ]Virginia|Wisconsin|Wyoming\\}" +
      "|\\{AL|AK|AS|AZ|AR|CA|CO|CT|DE|DC|FM|FL|GA|GU|HI|ID|IL|IN|IA|KS|KY|LA|ME|MH|MD|MA|MI|MN" +
      "|MS|MO|MT|NE|NV|NH|NJ|NM|NY|NC|ND|MP|OH|OK|OR|PW|PA|PR|RI|SC|SD|TN|TX|UT|VT|VI|VA|" +
      "WA|WV|WI|WY\\})(, |\\s)?(?:\\b\\d{5}(?:-\\d{4})?\\b)"

  /** `ENDS_IN_PUNCT_PATTERN` — `patterns.py:110`. */
  val EndsInPunctPattern = "[^\\w\\s]$"

  import Cleaners.pyStrip

  /** Python `str.isupper()`: at least one cased char, no lowercase cased chars. */
  def isUpperText(c: Column): Column = (upper(c) === c) && (lower(c) =!= c)

  /** Python `str.isnumeric()` (ASCII approximation): non-empty, all digits. */
  def isNumericText(c: Column): Column = regexp_like(c, lit("^[0-9]+$"))

  /** `is_bulleted_text` — `text_type.py:165-167`. */
  def isBulletedText(c: Column): Column =
    regexp_like(pyStrip(c), lit("^" + Cleaners.UnicodeBulletsRegex))

  /** `is_email_address` — `text_type.py:318-320` (anchored match on stripped text). */
  def isEmailAddress(c: Column): Column =
    regexp_like(pyStrip(c), lit("^" + EmailAddressPattern))

  /** `is_us_city_state_zip` — `text_type.py:306-315`. */
  def isUsCityStateZip(c: Column): Column =
    regexp_like(pyStrip(c), lit("^(?:" + UsCityStateZipPattern + ")"))

  /** `is_possible_numbered_list` — `text_type.py:323-325`. */
  def isPossibleNumberedList(c: Column): Column =
    regexp_like(pyStrip(c), lit(NumberedListPattern))

  /** `contains_us_phone_number` — `text_type.py:170-177` (search, not match). */
  def containsUsPhoneNumber(c: Column): Column =
    regexp_like(pyStrip(c), lit(UsPhonePattern))

  /**
   * `sentence_count` — `text_type.py:208-238`. Sentences = maximal segments matching
   * `[^.!?]+[.!?]+` plus a trailing unterminated segment — the IDENTICAL extraction
   * pattern the DuckDB oracle uses (`OracleSql.sentences`), so the two engines agree on
   * every input, including periods not followed by whitespace ("3.14", "e.g.").
   * With `minLength`, a sentence only counts when it has at least that many word tokens
   * after punctuation removal.
   */
  def sentenceCount(c: Column, minLength: Int = 0): Column = {
    val sentences = filter(
      regexp_extract_all(pyStrip(c), lit("[^.!?]+[.!?]+|[^.!?]+$"), lit(0)),
      s => pyStrip(s) =!= "")
    if (minLength <= 0) size(sentences)
    else
      size(filter(sentences, s =>
        size(filter(split(Cleaners.removePunctuation(s), "\\s+"),
          w => w =!= "" && w =!= ".")) >= minLength))
  }

  /**
   * `under_non_alpha_ratio` — `text_type.py:241-265`: true when, over non-space chars,
   * the alpha fraction is below `threshold`.
   */
  def underNonAlphaRatio(c: Column, threshold: Double = 0.5): Column = {
    val total = length(regexp_replace(c, "\\s", ""))
    val alpha = length(regexp_replace(c, "[^\\p{L}]", ""))
    when(total > 0, alpha.cast("double") / total.cast("double") < threshold)
      .otherwise(lit(false))
  }

  /**
   * `exceeds_cap_ratio` — `text_type.py:268-303`: multi-sentence text never exceeds;
   * all-caps always does; otherwise the fraction of capitalized alpha tokens must
   * exceed `threshold` (empty token list counts as exceeding).
   */
  def exceedsCapRatio(c: Column, threshold: Double = 0.5): Column = {
    val tokens = filter(split(c, "[^\\p{L}]+"), w => w =!= "")
    val capped = filter(tokens, w => regexp_like(w, lit("^[A-Z][a-z]*$|^[A-Z]+$")))
    when(sentenceCount(c, 3) > 1, lit(false))
      .when(isUpperText(c), lit(true))
      .when(size(tokens) === 0, lit(true))
      .otherwise(size(capped).cast("double") / size(tokens).cast("double") > threshold)
  }

  /**
   * Verb heuristic standing in for the reference's POS-tag check
   * (`contains_verb`, `text_type.py:180-187`): a token in a small closed verb list or a
   * token with a clearly verbal suffix.
   */
  val CommonVerbs: Seq[String] = Seq(
    "is", "are", "was", "were", "be", "been", "being", "am",
    "has", "have", "had", "do", "does", "did", "will", "would",
    "can", "could", "shall", "should", "may", "might", "must",
    "go", "goes", "went", "get", "gets", "got", "make", "makes",
    "made", "see", "sees", "saw", "run", "runs", "ran", "contains",
    "met", "walk", "walking", "said", "says")

  def containsVerb(c: Column): Column = {
    val words = split(lower(c), "[^a-z]+")
    val inList = size(array_intersect(words, lit(CommonVerbs.toArray))) > 0
    val suffix = exists(words, w => regexp_like(w, lit("^[a-z]{3,}(ing|ed)$")))
    inList || suffix
  }

  /**
   * `contains_english_word` — `text_type.py:193-205`: any lowercased token of
   * length > 1 present in the English wordlist. The reference ships a 25k-word
   * list (`nlp/english_words.py`); this deterministic built-in subset covers the
   * high-frequency head (callers can pass their own list). The membership test
   * is `arrays_overlap` against a literal array — codegen'd, no shuffle, no UDF.
   */
  val EnglishWords: Seq[String] = Seq(
    "the", "and", "for", "that", "this", "with", "from", "have", "has", "had",
    "not", "but", "you", "all", "can", "her", "was", "one", "our", "out",
    "are", "his", "they", "she", "will", "there", "their", "what", "when",
    "which", "who", "how", "were", "been", "more", "some", "than", "then",
    "them", "these", "two", "may", "first", "any", "its", "only", "other",
    "new", "into", "time", "data", "table", "order", "line", "part", "value",
    "key", "row", "group", "join", "sort", "merge", "filter", "query", "batch",
    "stream", "window", "small", "big", "fast", "slow", "hash", "scan",
    "column", "vector", "customer")

  def containsEnglishWord(c: Column, words: Seq[String] = EnglishWords): Column =
    arrays_overlap(
      filter(split(lower(c), "[^a-z]+"), w => length(w) > 1),
      lit(words.toArray))

  /**
   * `is_possible_narrative_text` — `text_type.py:27-88` (default thresholds, no
   * language-specific checks): non-empty, not numeric, cap-ratio and non-alpha-ratio in
   * bounds, and at least 2 sentences or a verb.
   */
  def isPossibleNarrativeText(c: Column, capThreshold: Double = 0.5,
      nonAlphaThreshold: Double = 0.5): Column =
    (length(c) > 0) &&
      !isNumericText(c) &&
      !exceedsCapRatio(c, capThreshold) &&
      !underNonAlphaRatio(c, nonAlphaThreshold) &&
      ((sentenceCount(c, 3) >= 2) || containsVerb(c))

  /**
   * `is_possible_title` — `text_type.py:91-162` (default thresholds): non-empty, not
   * (all-caps and punct-terminated), at most 12 space-words, alpha-ratio in bounds, no
   * trailing comma, not numeric, at most one (>=5-word) sentence.
   */
  def isPossibleTitle(c: Column, sentenceMinLength: Int = 5,
      titleMaxWordLength: Int = 12, nonAlphaThreshold: Double = 0.5): Column =
    (length(c) > 0) &&
      !(isUpperText(c) && regexp_like(c, lit(EndsInPunctPattern))) &&
      (size(split(c, " ")) <= titleMaxWordLength) &&
      !underNonAlphaRatio(c, nonAlphaThreshold) &&
      !c.endsWith(",") &&
      !isNumericText(c) &&
      (sentenceCount(c, sentenceMinLength) <= 1)

  /**
   * The element-type classification cascade — `partition/text.py:111-166`, first match
   * wins, in the reference's normative order: bullet, email, US city/state/zip,
   * numbered list, narrative, title, fallback UncategorizedText.
   * (Positional header/footer checks apply only when coordinates exist —
   * [[classifyTextPositional]].)
   */
  def classifyText(c: Column): Column =
    when(pyStrip(c) === "", "UncategorizedText")
      .when(isBulletedText(c), "ListItem")
      .when(isEmailAddress(c), "EmailAddress")
      .when(isUsCityStateZip(c), "Address")
      .when(isPossibleNumberedList(c), "ListItem")
      .when(isPossibleNarrativeText(c), "NarrativeText")
      .when(isPossibleTitle(c), "Title")
      .otherwise("UncategorizedText")

  /**
   * `element_from_text` with coordinates — the positional branches come FIRST in the
   * cascade (`partition/text.py:111-127`): mean point y as a fraction of the layout
   * height below 0.07 classifies Header, above 0.93 Footer
   * (`_is_in_header_position`/`_is_in_footer_position`, `text.py:174-211`); rows
   * without coordinates fall through to the text cascade.
   */
  def classifyTextPositional(c: Column, avgY: Column, layoutHeight: Column): Column = {
    val pct = avgY / layoutHeight
    when(avgY.isNotNull && layoutHeight.isNotNull && pct < 0.07, "Header")
      .when(avgY.isNotNull && layoutHeight.isNotNull && pct > 0.93, "Footer")
      .otherwise(classifyText(c))
  }
}
