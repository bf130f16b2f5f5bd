package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Cleaners, Extractors, Predicates}
import graft.queries.{OracleSql => O}

/**
 * Scalar-function operator coverage (SURVEY §2.2-§2.3): every cleaner, predicate and
 * extractor declared as a query over the `documents` table with a DuckDB oracle.
 *
 * Inputs are constructed (bullets/punctuation/mojibake wrapped around `text`) so each
 * function's interesting path actually executes; the same construction is mirrored in
 * the oracle SQL. All queries are narrow projections over one parquet scan — no
 * shuffle, fully codegen'd, trivially scalable.
 */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.Tables.read(s, dir, "documents")

  private def one(s: SparkSession, dir: String)(c: Column, name: String): DataFrame =
    docs(s, dir).select(col("doc_id"), c.as(name)).orderBy("doc_id")

  /** Fan-out variant for per-row CPU-heavy expressions (classifier cascade,
    * sentence extraction, HOF token passes) — see [[graft.Tables.readFanout]];
    * cheap single-regex cleaners keep the shuffle-free [[one]] plan. */
  private def oneF(s: SparkSession, dir: String)(c: Column, name: String): DataFrame =
    graft.Tables.readFanout(s, dir, "documents")
      .select(col("doc_id"), c.as(name)).orderBy("doc_id")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_clean_extra_whitespace" -> ((s, dir) => one(s, dir)(
      Cleaners.cleanExtraWhitespace(concat(lit("  "), col("text"), lit("  end"))),
      "cleaned")),

    "q_clean_bullets" -> ((s, dir) => one(s, dir)(
      Cleaners.cleanBullets(concat(lit("\u2022  "), col("text"))), "cleaned")),

    // Adversarial rows included: doc_id%4==0 gets a double-dot token (NOT a bullet),
    // %4==1 a long head token (NOT a bullet) — the oracle runs the full token logic.
    "q_clean_ordered_bullets" -> ((s, dir) => one(s, dir)(
      Cleaners.cleanOrderedBullets(
        when(col("doc_id") % 4 === 0, concat(lit("1..2 "), col("text")))
          .when(col("doc_id") % 4 === 1, concat(lit("abc.def "), col("text")))
          .otherwise(concat((col("doc_id") % 3 + 1).cast("string"), lit("."),
            (col("doc_id") % 5 + 1).cast("string"), lit(" "), col("text")))), "cleaned")),

    "q_clean_dashes" -> ((s, dir) => one(s, dir)(
      Cleaners.cleanDashes(regexp_replace(col("text"), " ", "-")), "cleaned")),

    "q_clean_trailing_punctuation" -> ((s, dir) => one(s, dir)(
      Cleaners.cleanTrailingPunctuation(concat(col("text"), lit(" .,;:"))), "cleaned")),

    "q_clean_non_ascii" -> ((s, dir) => one(s, dir)(
      Cleaners.cleanNonAsciiChars(concat(col("text"), lit("\u00E9\u4E2D"))), "cleaned")),

    // Exercises C1 controls, &apos;, and a 3-byte mojibake sequence; oracle mirrors the
    // full 23-entry table.
    "q_replace_unicode_quotes" -> ((s, dir) => one(s, dir)(
      Cleaners.replaceUnicodeQuotes(
        concat(lit("\u0091"), col("text"),
          lit("\u0092 &apos; \u00e2\u0080\u0099 \u0093q\u0094"))), "cleaned")),

    // standardize_quotes (metrics/text_extraction.py:214-224): smart doubles,
    // corner brackets, ornament quotes, and a supplementary sans-serif ornament
    // (U+1F676) all fold to ASCII around the document text
    "q_standardize_quotes" -> ((s, dir) => one(s, dir)(
      Cleaners.standardizeQuotes(
        concat(lit("\u201c"), col("text"),
          lit("\u201d \u2018tis \u300cch 1\u300d \u275dq\u275e " +
            new String(Character.toChars(0x1F676)) + "deep" +
            new String(Character.toChars(0x1F677)) + " \u00abfin\u00bb"))),
      "cleaned")),

    "q_remove_punctuation" -> ((s, dir) => one(s, dir)(
      Cleaners.removePunctuation(concat(col("text"), lit(".,!?;:"))), "cleaned")),

    // Input carries an injected fi-ligature plus ae/ffl ligatures appended; the oracle
    // applies the full 14-entry expansion (not identity).
    "q_clean_ligatures" -> ((s, dir) => one(s, dir)(
      Cleaners.cleanLigatures(
        concat(regexp_replace(col("text"), "fi", "\uFB01"),
          lit(" \u00E6x\uFB04"))), "cleaned")),

    "q_clean_prefix_postfix" -> ((s, dir) => one(s, dir)(
      Cleaners.cleanPostfix(
        Cleaners.cleanPrefix(concat(lit("PRE: "), col("text"), lit(" :POST")), "PRE:"),
        ":POST"), "cleaned")),

    "q_clean_composite" -> ((s, dir) => one(s, dir)(
      Cleaners.clean(concat(lit("\u2022 "), upper(col("text")), lit(" .")),
        extraWhitespace = true, dashes = true, bullets = true,
        trailingPunctuation = true, lowercase = true), "cleaned")),

    "q_classify_text" -> ((s, dir) => oneF(s, dir)(
      Predicates.classifyText(col("text")), "element_type")),

    "q_element_type_frequency" -> ((s, dir) =>
      graft.Tables.readFanout(s, dir, "documents")
        .select(Predicates.classifyText(col("text")).as("element_type"))
        .groupBy("element_type").agg(count(lit(1)).as("n"))
        .orderBy("element_type")),

    "q_is_possible_title" -> ((s, dir) => oneF(s, dir)(
      Predicates.isPossibleTitle(col("text")), "flag")),

    "q_is_possible_narrative" -> ((s, dir) => oneF(s, dir)(
      Predicates.isPossibleNarrativeText(col("text")), "flag")),

    "q_under_non_alpha_ratio" -> ((s, dir) => oneF(s, dir)(
      Predicates.underNonAlphaRatio(concat(col("text"), lit(" 123!!"))), "flag")),

    "q_exceeds_cap_ratio" -> ((s, dir) => oneF(s, dir)(
      Predicates.exceedsCapRatio(initcap(col("text"))), "flag")),

    "q_sentence_count" -> ((s, dir) => oneF(s, dir)(
      Predicates.sentenceCount(replace(col("text"), lit(" the "), lit(". ")), 3),
      "n_sentences")),

    "q_is_bulleted_text" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        Predicates.isBulletedText(col("text")).as("raw_flag"),
        Predicates.isBulletedText(concat(lit("\u2023 "), col("text"))).as("bulleted_flag"))
        .orderBy("doc_id")),

    "q_is_email_address" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        Predicates.isEmailAddress(col("text")).as("raw_flag"),
        Predicates.isEmailAddress(concat(col("source"), lit("@example.com")))
          .as("addr_flag"))
        .orderBy("doc_id")),

    "q_is_numbered_list" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        Predicates.isPossibleNumberedList(col("text")).as("raw_flag"),
        Predicates.isPossibleNumberedList(
          concat((col("doc_id") % 9 + 1).cast("string"), lit(". "), col("text")))
          .as("listy_flag"))
        .orderBy("doc_id")),

    "q_contains_us_phone" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        Predicates.containsUsPhoneNumber(
          concat(lit("call 215-867-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .as("phone_flag"),
        Extractors.extractUsPhoneNumber(
          concat(lit("call 215-867-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .as("phone"))
        .orderBy("doc_id")),

    "q_extract_email_address" -> ((s, dir) => one(s, dir)(
      array_join(Extractors.extractEmailAddress(
        concat(lit("a "), col("source"), lit("@test.com b "), col("source"),
          lit("@mail.org"))), ","), "emails")),

    "q_extract_ip_address" -> ((s, dir) => one(s, dir)(
      array_join(Extractors.extractIpAddress(
        concat(lit("from 10.0."), (col("doc_id") % 256).cast("string"), lit("."),
          ((col("doc_id") * 7) % 256).cast("string"), lit(" via proxy"))), ","), "ips")),

    "q_extract_ip_address_name" -> ((s, dir) => one(s, dir)(
      array_join(Extractors.extractIpAddressName(
        concat(lit("host "), col("source"), lit(".example.com down"))), ","), "names")),

    "q_extract_mapi_id" -> ((s, dir) => one(s, dir)(
      array_join(Extractors.extractMapiId(
        concat(lit("id 1.2.3."), col("doc_id").cast("string"), lit("; end"))), ","),
      "mapi_ids")),

    "q_extract_datetimetz" -> ((s, dir) => one(s, dir)(
      unix_seconds(Extractors.extractDatetimeTz(
        when(col("doc_id") % 2 === 0,
          concat(lit("Date: Fri, 26 Mar 2021 11:04:09 +1200 x"), col("source")))
          .otherwise(col("text")))), "epoch_s")),

    "q_extract_text_before_after" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        Extractors.extractTextBefore(col("text"), "merge").as("before_txt"),
        Extractors.extractTextAfter(col("text"), "merge").as("after_txt"))
        .orderBy("doc_id")),

    "q_extract_ordered_bullets" -> ((s, dir) => {
      // doc_id%7==0 rows carry a double-dot first token (NOT a bullet -> all nulls);
      // the oracle runs the same extraction logic, not the construction formula.
      val in = when(col("doc_id") % 7 === 0, concat(lit("x..y "), col("text")))
        .otherwise(concat((col("doc_id") % 3 + 1).cast("string"), lit("."),
          (col("doc_id") % 5 + 1).cast("string"),
          when(col("doc_id") % 2 === 0, lit(".2")).otherwise(lit("")),
          lit(" "), col("text")))
      val b = Extractors.extractOrderedBullets(in)
      docs(s, dir).select(
        col("doc_id"),
        b.getField("section").as("section"),
        b.getField("sub_section").as("sub_section"),
        b.getField("sub_sub_section").as("sub_sub_section"))
        .orderBy("doc_id")
    }),

    "q_extract_image_urls" -> ((s, dir) => one(s, dir)(
      array_join(Extractors.extractImageUrlsFromHtml(
        concat(lit("<img src=\"https://img.example.com/pic"),
          (col("doc_id") % 9).cast("string"), lit(".png\"> and more"))), ","), "urls")),

    // -- string-level cleaners (imperative decode paths, run in a Dataset map like the
    // -- format parsers; the column construction stays codegen'd) ---------------------

    // quoted-printable decode incl. a multi-byte UTF-8 escape (=E2=80=99 -> U+2019).
    "q_mime_encodings" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir).select(col("doc_id"),
          concat(regexp_replace(
            Cleaners.cleanExtraWhitespace(regexp_replace(col("text"), "=", "")),
            " ", "=20"), lit("=E2=80=99")).as("enc"))
        .as[(Long, String)]
        .map { case (d, t) => (d, Cleaners.replaceMimeEncodings(t)) }
        .toDF("doc_id", "decoded").orderBy("doc_id")
    }),

    // latin-1-misdecoded UTF-8 repair: C3 A9 -> e-acute, E6 AF 8F -> U+6BCF.
    "q_bytes_to_string" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir).select(col("doc_id"),
          concat(Cleaners.cleanNonAsciiChars(col("text")),
            lit(" \u00C3\u00A9 \u00E6\u00AF\u008F")).as("moji"))
        .as[(Long, String)]
        .map { case (d, t) => (d, Cleaners.bytesStringToString(t)) }
        .toDF("doc_id", "fixed").orderBy("doc_id")
    }),

    // Three-paragraph input: a line-broken paragraph (merged iff any line has >= 5
    // words -- the oracle computes the rule from the word count), an all-short-lines
    // block kept split, and a bullet paragraph with a wrapped line.
    "q_group_broken_paragraphs" -> ((s, dir) => {
      import s.implicits._
      val base = Cleaners.cleanExtraWhitespace(concat(lit("w "), col("text")))
      val input = concat(base,
        lit("\naa bb cc\n\nApache License\nVersion 2.0\nhttp example\n\n" +
          "\u2022 first bullet line\nwrapped tail\n\u2022 second bullet"))
      docs(s, dir).select(col("doc_id"), input.as("raw"))
        .as[(Long, String)]
        .map { case (d, t) => (d, graft.sources.TextSource.groupBrokenParagraphs(t)) }
        .toDF("doc_id", "grouped").orderBy("doc_id")
    }),

    // Newline-ratio routing (threshold 0.1): even docs have no blank lines (new-line
    // grouper), odd docs one blank line in four (broken-paragraph grouper) -- the two
    // routes produce observably different joins.
    "q_paragraph_grouper_auto" -> ((s, dir) => {
      import s.implicits._
      val base = Cleaners.cleanExtraWhitespace(concat(lit("w "), col("text")))
      val input = when(col("doc_id") % 2 === 0,
        concat(lit("aa bb cc dd ee ff\n"), base, lit("\ngg hh ii")))
        .otherwise(concat(lit("aa bb cc dd ee ff\n"), base, lit("\n\ngg hh ii")))
      docs(s, dir).select(col("doc_id"), input.as("raw"))
        .as[(Long, String)]
        .map { case (d, t) => (d, graft.sources.TextSource.autoParagraphGrouper(t)) }
        .toDF("doc_id", "grouped").orderBy("doc_id")
    }),

    // Whitespace collapse with index mapping: every space inflated to three, so the
    // moved-index at the last cleaned position is exactly 2x the space count.
    "q_whitespace_index_run" -> ((s, dir) => {
      import s.implicits._
      val base = Cleaners.cleanExtraWhitespace(concat(lit("w "), col("text")))
      docs(s, dir).select(col("doc_id"), regexp_replace(base, " ", "   ").as("raw"))
        .as[(Long, String)]
        .map { case (d, t) =>
          val (cleaned, moved) = Cleaners.cleanExtraWhitespaceWithIndexRun(t)
          val last = cleaned.length - 1
          val movedLast = if (last >= 0) moved(last) else 0L
          val adjLast = if (last >= 0)
            Cleaners.indexAdjustmentAfterCleanExtraWhitespace(last, moved) else 0L
          (d, cleaned, movedLast, adjLast)
        }
        .toDF("doc_id", "cleaned", "moved_last", "adj_last").orderBy("doc_id")
    }),

    // remove_sentence_punctuation (core.py:316-322): all punctuation except the
    // sentence-structural exclusions.
    "q_remove_sentence_punctuation" -> ((s, dir) => one(s, dir)(
      Cleaners.removeSentencePunctuation(
        concat(col("text"), lit(" End: (test), ok.")), Seq(".", ",")),
      "cleaned")),

    // contains_english_word (text_type.py:193-205): every 3rd doc replaced with
    // gibberish so both branches appear.
    "q_contains_english_word" -> ((s, dir) => one(s, dir)(
      Predicates.containsEnglishWord(
        when(col("doc_id") % 3 === 0, lit("zzqxx kjvvw qqptt x"))
          .otherwise(col("text"))),
      "has_english")),

    // group_bullet_paragraph (core.py:107-134): a constructed bullet paragraph per
    // doc — OCR'd `e`-bullet first line, a wrapped bullet line, a trailing bullet —
    // split at bullets with wrapped lines rejoined. The document slice is
    // sanitized to [a-z0-9 ] first: the engine splits on the FULL bullet
    // alternation (which includes '-' and '*'), while the oracle marks only the
    // two bullets the construction injects — a stray bullet char inside raw
    // text would make the sides diverge on a regenerated corpus.
    "q_group_bullet_paragraph" -> ((s, dir) => {
      import s.implicits._
      val input = concat(lit("e wrapped OCR\n\u2022 alpha "),
        substring(regexp_replace(col("text"), "[^a-z0-9 ]", ""), 1, 30),
        lit("\nwrapped tail\n\u2022 beta"))
      docs(s, dir).select(col("doc_id"), input.as("p"))
        .as[(Long, String)]
        .flatMap { case (d, p) =>
          graft.sources.TextSource.groupBulletParagraph(p).zipWithIndex.map {
            case (piece, i) => (d, i + 1L, piece)
          }
        }
        .toDF("doc_id", "piece_idx", "piece")
        .orderBy("doc_id", "piece_idx")
    }))

  private def docSel(expr: String, name: String): String =
    s"SELECT doc_id, $expr AS $name FROM documents ORDER BY doc_id"

  def oracles: Map[String, String] = Map(
    "q_clean_extra_whitespace" ->
      docSel(O.cleanExtraWhitespace("'  ' || text || '  end'"), "cleaned"),

    "q_clean_bullets" ->
      docSel(O.strip(s"regexp_replace(chr(8226) || '  ' || text, '^(?:${O.bulletsAlt})', '')"),
        "cleaned"),

    "q_clean_ordered_bullets" -> docSel(
      O.cleanOrderedBullets(
        "(CASE WHEN doc_id % 4 = 0 THEN '1..2 ' || text " +
          "WHEN doc_id % 4 = 1 THEN 'abc.def ' || text " +
          "ELSE (doc_id % 3 + 1) || '.' || (doc_id % 5 + 1) || ' ' || text END)"),
      "cleaned"),

    "q_clean_dashes" ->
      docSel(O.strip("regexp_replace(regexp_replace(text, ' ', '-', 'g'), " +
        "'[-\\x{2013}]', ' ', 'g')"), "cleaned"),

    "q_clean_trailing_punctuation" ->
      docSel(s"regexp_replace(${O.strip("text || ' .,;:'")}, '[.,:;]+$$', '')", "cleaned"),

    "q_clean_non_ascii" ->
      docSel("regexp_replace(text || chr(233) || chr(20013), '[^\\x00-\\x7F]', '', 'g')",
        "cleaned"),

    "q_replace_unicode_quotes" ->
      docSel(O.replaceUnicodeQuotes(
        "(chr(145) || text || chr(146) || ' &apos; ' || " +
          "chr(226) || chr(128) || chr(153) || ' ' || chr(147) || 'q' || chr(148))"),
        "cleaned"),

    // from/to are generated from the SAME codepoint constants the engine
    // translates with, so a table edit can never silently diverge
    "q_standardize_quotes" -> {
      val allFrom = (graft.functions.Cleaners.DoubleQuoteCodepoints +
        graft.functions.Cleaners.SingleQuoteCodepoints)
        .codePoints.toArray.map(cp => s"chr($cp)").mkString(" || ")
      val input = "chr(8220) || text || chr(8221) || ' ' || chr(8216) || 'tis ' || " +
        "chr(12300) || 'ch 1' || chr(12301) || ' ' || chr(10077) || 'q' || " +
        "chr(10078) || ' ' || chr(128630) || 'deep' || chr(128631) || ' ' || " +
        "chr(171) || 'fin' || chr(187)"
      docSel(
        s"""translate($input, $allFrom, repeat('"', 19) || repeat(chr(39), 20))""",
        "cleaned")
    },

    "q_remove_punctuation" ->
      docSel("regexp_replace(text || '.,!?;:', '\\p{P}', '', 'g')", "cleaned"),

    "q_clean_ligatures" -> docSel(
      O.cleanLigatures(
        "(regexp_replace(text, 'fi', chr(64257), 'g') || ' ' || chr(230) || 'x' || chr(64260))"),
      "cleaned"),

    "q_clean_prefix_postfix" ->
      docSel(O.rstrip(s"regexp_replace(${O.lstrip("regexp_replace('PRE: ' || text || ' :POST', '^(?:PRE:)', '')")}, '(?::POST)$$', '')"),
        "cleaned"),

    "q_clean_composite" -> {
      // Mirror Cleaners.clean application order: lowercase -> trailing punct ->
      // dashes -> extra ws -> bullets -> final strip.
      val lowered = "lower(chr(8226) || ' ' || upper(text) || ' .')"
      val noTrail = s"regexp_replace(${O.strip(lowered)}, '[.,:;]+$$', '')"
      val noDash = O.strip(s"regexp_replace($noTrail, '[-\\x{2013}]', ' ', 'g')")
      val noWs = O.cleanExtraWhitespace(noDash)
      val noBullet = O.strip(s"regexp_replace($noWs, '^(?:${O.bulletsAlt})', '')")
      docSel(O.strip(noBullet), "cleaned")
    },

    "q_classify_text" -> docSel(O.classify("text"), "element_type"),

    "q_element_type_frequency" ->
      s"""SELECT ${O.classify("text")} AS element_type, count(*) AS n
         |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_is_possible_title" -> docSel(O.isPossibleTitle("text"), "flag"),

    "q_is_possible_narrative" -> docSel(O.isPossibleNarrative("text"), "flag"),

    "q_under_non_alpha_ratio" ->
      docSel(O.underNonAlphaRatio("(text || ' 123!!')"), "flag"),

    "q_exceeds_cap_ratio" ->
      // DuckDB has no initcap; mirror Spark's semantics exactly: word-initial uppercase
      // AND lowercase remainder of each space-separated word.
      docSel(O.exceedsCapRatio(
        "array_to_string(list_transform(string_split(text, ' '), " +
          "w -> upper(substring(w, 1, 1)) || lower(substring(w, 2))), ' ')"), "flag"),

    "q_sentence_count" ->
      docSel(O.sentenceCount("replace(text, ' the ', '. ')", 3), "n_sentences"),

    "q_is_bulleted_text" ->
      s"""SELECT doc_id, ${O.isBulleted("text")} AS raw_flag,
         |  ${O.isBulleted("chr(8227) || ' ' || text")} AS bulleted_flag
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_is_email_address" ->
      s"""SELECT doc_id, ${O.isEmailAddr("text")} AS raw_flag,
         |  ${O.isEmailAddr("source || '@example.com'")} AS addr_flag
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_is_numbered_list" ->
      s"""SELECT doc_id, ${O.isNumberedList("text")} AS raw_flag,
         |  ${O.isNumberedList("(doc_id % 9 + 1) || '. ' || text")} AS listy_flag
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_contains_us_phone" ->
      s"""SELECT doc_id,
         |  regexp_matches(${O.strip("'call 215-867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')")},
         |    '${Predicates.UsPhonePattern.stripPrefix("(?d)")}') AS phone_flag,
         |  ${O.strip(s"regexp_extract('call 215-867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'), '${Predicates.UsPhonePattern.stripPrefix("(?d)")}')")}
         |    AS phone
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_extract_email_address" ->
      docSel("array_to_string(regexp_extract_all(lower('a ' || source || '@test.com b ' " +
        s"|| source || '@mail.org'), '${Predicates.EmailAddressPattern}'), ',')", "emails"),

    "q_extract_ip_address" ->
      docSel("array_to_string(regexp_extract_all('from 10.0.' || (doc_id % 256) || '.' " +
        s"|| ((doc_id * 7) % 256) || ' via proxy', '${graft.functions.Extractors.IpAddressPattern}'), ',')",
        "ips"),

    "q_extract_ip_address_name" ->
      docSel("array_to_string(regexp_extract_all('host ' || source || '.example.com down', " +
        s"'${graft.functions.Extractors.IpAddressNamePattern}'), ',')", "names"),

    "q_extract_mapi_id" ->
      docSel("array_to_string(list_transform(regexp_extract_all('id 1.2.3.' || doc_id " +
        s"|| '; end', '${graft.functions.Extractors.MapiIdPattern}'), m -> replace(m, ';', '')), ',')",
        "mapi_ids"),

    "q_extract_datetimetz" ->
      s"""SELECT doc_id,
         |  CASE WHEN doc_id % 2 = 0 THEN
         |    CAST(epoch(strptime(regexp_extract(
         |      'Date: Fri, 26 Mar 2021 11:04:09 +1200 x' || source,
         |      '${graft.functions.Extractors.EmailDatetimeTzPattern}'),
         |      '%a, %d %b %Y %H:%M:%S %z')) AS BIGINT)
         |  ELSE NULL END AS epoch_s
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_extract_text_before_after" ->
      s"""SELECT doc_id,
         |  CASE WHEN strpos(text, 'merge') > 0
         |    THEN ${O.rstrip("substring(text, 1, strpos(text, 'merge') - 1)")}
         |    ELSE NULL END AS before_txt,
         |  CASE WHEN strpos(text, 'merge') > 0
         |    THEN ${O.lstrip("substring(text, strpos(text, 'merge') + 5)")}
         |    ELSE NULL END AS after_txt
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_extract_ordered_bullets" -> {
      val in = "(CASE WHEN doc_id % 7 = 0 THEN 'x..y ' || text " +
        "ELSE (doc_id % 3 + 1) || '.' || (doc_id % 5 + 1) || " +
        "(CASE WHEN doc_id % 2 = 0 THEN '.2' ELSE '' END) || ' ' || text END)"
      s"""SELECT doc_id,
         |  ${O.orderedBulletField(in, 1)} AS section,
         |  ${O.orderedBulletField(in, 2)} AS sub_section,
         |  ${O.orderedBulletField(in, 3)} AS sub_sub_section
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "q_extract_image_urls" ->
      docSel("array_to_string(regexp_extract_all('<img src=\"https://img.example.com/pic' " +
        s"|| (doc_id % 9) || '.png\"> and more', '${graft.functions.Extractors.ImageUrlPattern}'), ',')",
        "urls"),

    // quoted-printable decode: every space round-trips through =20, plus the
    // appended =E2=80=99 decodes to U+2019.
    "q_mime_encodings" ->
      docSel(O.cleanExtraWhitespace("regexp_replace(text, '=', '', 'g')") + " || chr(8217)",
        "decoded"),

    // latin-1-misdecoded UTF-8 repair: appended (U+00C3,U+00A9) -> e-acute and
    // (U+00E6,U+00AF,U+008F) -> U+6BCF.
    "q_bytes_to_string" ->
      docSel("regexp_replace(text, '[^\\x00-\\x7F]', '', 'g') || ' ' || chr(233) || ' ' || chr(27599)",
        "fixed"),

    "q_group_broken_paragraphs" -> {
      val base = O.cleanExtraWhitespace("('w ' || text)")
      val nn = "chr(10) || chr(10)"
      s"""WITH b AS (
         |  SELECT doc_id, $base AS base FROM documents)
         |SELECT doc_id,
         |  (CASE WHEN len(string_split(base, ' ')) < 5
         |     THEN base || $nn || 'aa bb cc'
         |     ELSE base || ' aa bb cc' END)
         |  || $nn || 'Apache License' || $nn || 'Version 2.0' || $nn || 'http example'
         |  || $nn || chr(8226) || ' first bullet line wrapped tail '
         |  || $nn || chr(8226) || ' second bullet' AS grouped
         |FROM b ORDER BY doc_id""".stripMargin
    },

    "q_paragraph_grouper_auto" -> {
      val base = O.cleanExtraWhitespace("('w ' || text)")
      val nn = "chr(10) || chr(10)"
      // new-line grouper pieces keep their trailing \n (LINE_BREAK_RE is a
      // lookbehind split), so the even-doc branch joins with THREE newlines
      val nn3 = "chr(10) || chr(10) || chr(10)"
      s"""WITH b AS (
         |  SELECT doc_id, $base AS base FROM documents)
         |SELECT doc_id,
         |  CASE WHEN doc_id % 2 = 0
         |    THEN 'aa bb cc dd ee ff' || $nn3 || base || $nn3 || 'gg hh ii'
         |    ELSE 'aa bb cc dd ee ff ' || base || $nn || 'gg hh ii' END AS grouped
         |FROM b ORDER BY doc_id""".stripMargin
    },

    "q_whitespace_index_run" -> {
      val base = O.cleanExtraWhitespace("('w ' || text)")
      s"""WITH b AS (
         |  SELECT doc_id, $base AS base FROM documents)
         |SELECT doc_id, base AS cleaned,
         |  CAST(2 * (length(base) - length(replace(base, ' ', ''))) AS BIGINT) AS moved_last,
         |  CAST(length(base) - 1 - 2 * (length(base) - length(replace(base, ' ', ''))) AS BIGINT)
         |    AS adj_last
         |FROM b ORDER BY doc_id""".stripMargin
    },

    // RE2 has no lookahead; punctuation-except-exclusions is the negated class of
    // (non-punctuation or excluded chars) — same set as the engine's
    // (?!excl)\p{P}.
    "q_remove_sentence_punctuation" ->
      docSel("regexp_replace(text || ' End: (test), ok.', '[^\\P{P}.,]', '', 'g')",
        "cleaned"),

    "q_contains_english_word" -> {
      val wordsArr = graft.functions.Predicates.EnglishWords
        .map(w => s"'$w'").mkString("[", ", ", "]")
      // two-stage tokenization (text_type.py:24,191-205): split on the word
      // separators, then strip residual non-[a-z] chars per token
      docSel("list_has_any(list_filter(list_transform(string_split_regex(lower(" +
        "CASE WHEN doc_id % 3 = 0 THEN 'zzqxx kjvvw qqptt x' ELSE text END), " +
        "'[\\s\\-,.!?_/]+'), t -> regexp_replace(t, '[^a-z]', '', 'g')), " +
        s"w -> len(w) > 1), $wordsArr)", "has_english")
    },

    "q_group_bullet_paragraph" ->
      s"""WITH inp AS (
         |  SELECT doc_id,
         |    'e wrapped OCR' || chr(10) || chr(8226) || ' alpha ' ||
         |    substring(regexp_replace(text, '[^a-z0-9 ]', '', 'g'), 1, 30) ||
         |    chr(10) || 'wrapped tail' || chr(10) ||
         |    chr(8226) || ' beta' AS p0
         |  FROM documents),
         |prep AS (
         |  SELECT doc_id, regexp_replace(regexp_replace(
         |    regexp_replace(p0, '(?m)^e(\\s)', chr(183) || '\\1', 'g'),
         |    '^\\s+', ''), '\\s+$$', '') AS p
         |  FROM inp),
         |pieces AS (
         |  SELECT doc_id, list_filter(string_split(
         |    replace(replace(p, chr(8226), chr(1) || chr(8226)),
         |            chr(183), chr(1) || chr(183)), chr(1)), x -> x <> '') AS ps
         |  FROM prep)
         |SELECT doc_id, piece_idx,
         |  regexp_replace(piece, '\\s*\\n\\s*', ' ', 'g') AS piece
         |FROM (
         |  SELECT doc_id, unnest(list_transform(range(1, len(ps) + 1), i ->
         |    {'piece_idx': i, 'piece': ps[i]}), recursive := true)
         |  FROM pieces)
         |ORDER BY doc_id, piece_idx""".stripMargin)
}
