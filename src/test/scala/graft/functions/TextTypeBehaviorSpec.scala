package graft.functions

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

/**
 * Behavior port of `test_unstructured/partition/test_text_type.py` — the
 * classification predicates evaluated over the same parametrized vectors the
 * reference pins. Cases requiring the reference's nltk POS tagger are covered
 * by the documented closed-verb-list approximation (`Predicates.CommonVerbs`);
 * non-English `languages=[...]` routing gates the vocabulary and
 * sentence/verb checks exactly as `text_type.py:66,83,146` do.
 */
class TextTypeBehaviorSpec extends SparkSuiteBase {

  /** Evaluate a one-column predicate over literal strings. */
  private def eval(texts: Seq[String])(p: Column => Column): Seq[Boolean] = {
    val sp = spark
    import sp.implicits._
    texts.toDF("t").select(p(col("t")).as("r")).collect().map(_.getBoolean(0)).toSeq
  }

  private def checkVectors(vectors: Seq[(String, Boolean)])(p: Column => Column): Unit = {
    val got = eval(vectors.map(_._1))(p)
    vectors.zip(got).foreach { case ((text, expected), actual) =>
      assert(actual == expected, s"'$text' expected $expected got $actual")
    }
  }

  test("headings are not narrative text (test_headings_are_not_narrative_text)") {
    checkVectors(Seq(
      ("ITEM 5(a).: MARKET FOR REGISTRANT’S COMMON EQUITY, RELATED STOCKHOLDER " +
        "MATTERS AND ISSUER PURCHASES OF EQUITY SECURITIES") -> false,
      ("Item 5(a).: Market For Registrant’s Common Equity, Related Stockholder " +
        "Matters and Issuer Purchases of Equity Securities") -> false,
      ("There is a market for registrant’s common equity, related stockholder " +
        "matters and issuer purchases of equity securities.") -> true,
    ))(Predicates.isPossibleNarrativeText(_))
  }

  test("is_possible_narrative_text vectors (cap_threshold=0.3, language checks on)") {
    checkVectors(Seq(
      "Ask the teacher for an apple." -> true,
      "Ask Me About Intellectual Property" -> false, // exceeds the cap threshold
      "7" -> false, // numeric
      "intellectual property" -> false, // no verb
      "Dal;kdjfal adawels adfjwalsdf. Addad jaja fjawlek" -> false, // no English words
      "---------------Aske the teacher for an apple----------" -> false, // non-alpha
      "" -> false, // empty
    ))(Predicates.isPossibleNarrativeText(_, capThreshold = 0.3, languageChecks = true))
  }

  test("narrative language check rejects gibberish when enabled, admits it when off") {
    // text_type.py:66-67 — English vocab only consulted under language_checks
    val text = "Dal;kdjfal adawels adfjwalsdf. Addad jaja fjawlek"
    assert(eval(Seq(text))(Predicates.isPossibleNarrativeText(_, languageChecks = true))
      == Seq(false))
    assert(eval(Seq(text))(Predicates.isPossibleNarrativeText(_)) == Seq(true))
  }

  test("is_possible_title vectors (language checks on)") {
    checkVectors(Seq(
      "Intellectual Property" -> true,
      "Ask the teacher for an apple. You might a gold star." -> false, // two sentences
      "7" -> false, // numeric
      "" -> false, // empty
      "ITEM 1A. RISK FACTORS" -> true, // two "sentences", both short
      "To My Dearest Friends," -> false, // ends with a comma
      "BTAR ADFJA L" -> false, // no English words
      ("ITEM 1A. RISK FACTORS " * 15) -> false, // too long
      "/--------BREAK-------/" -> false, // too many non-alpha chars
      "1.A.RISKS" -> true, // "RISKS" is an English word
      "1. Unstructured Technologies" -> true,
      "Big/Brown/Sheet" -> true,
      "LOOK AT THIS IT IS CAPS BUT NOT A TITLE." -> false,
    ))(Predicates.isPossibleTitle(_, languageChecks = true))
  }

  test("contains_us_phone_number vectors") {
    checkVectors(Seq(
      "8675309" -> true,
      "+1 867-5309" -> true,
      "2158675309" -> true,
      "+12158675309" -> true,
      "867.5309" -> true,
      "1-800-867-5309" -> true,
      "1(800)-867-5309" -> true,
      "Tel: 1(800)-867-5309" -> true,
    ))(Predicates.containsUsPhoneNumber)
  }

  test("is_bulleted_text vectors") {
    checkVectors(Seq(
      "• This is a fine point!" -> true,
      " • This is a fine point!" -> true, // leading space
      "‣ This is a fine point!" -> true,
      "⁃ This is a fine point!" -> true,
      "⁌ This is a fine point!" -> true,
      "⁍ This is a fine point!" -> true,
      "∙ This is a fine point!" -> true,
      "○ This is a fine point!" -> true,
      "● This is a fine point!" -> true,
      "◘ This is a fine point!" -> true,
      "◦  This is a fine point!" -> true,
      "☙ This is a fine point!" -> true,
      "❥ This is a fine point!" -> true,
      "❧ This is a fine point!" -> true,
      "⦾ This is a fine point!" -> true,
      "⦿ This is a fine point!" -> true,
      "  This is a fine point!" -> true,
      "* This is a fine point!" -> true,
      "- This is a fine point!" -> true,
      "This is NOT a fine point!" -> false, // no bullet
      "I love morse code! ● ● ● --- ● ● ●" -> false, // not at start
      "----------------------------" -> false, // too long
    ))(Predicates.isBulletedText)
  }

  test("contains_verb vectors (closed-list approximation of the POS tagger)") {
    checkVectors(Seq(
      "Ask the teacher for an apple" -> true,
      "Intellectual property" -> false,
      "THIS MESSAGE WAS APPROVED" -> true,
    ))(Predicates.containsVerb)
  }

  test("contains_english_word vectors") {
    checkVectors(Seq(
      "PARROT BEAK" -> true,
      "Parrot Beak" -> true,
      "parrot beak" -> true,
      "parrot!" -> true,
      "?parrot" -> true,
      "zombie?parrot" -> true,
      "notaWordHa 'parrot'" -> true,
      "notaWordHa'parrot'" -> false, // apostrophe does not split tokens
      "notaWordHa \"parrot,\"" -> true,
      "daljdf adlfajldj ajadfa" -> false,
      "BTAR ADFJA L" -> false,
      "Unstructured Technologies" -> true,
      "1.A.RISKS" -> true, // crammed-together words get picked up
      "Big/Brown/Sheep" -> true,
    ))(Predicates.containsEnglishWord(_))
  }

  test("exceeds_cap_ratio vectors") {
    checkVectors(Seq(
      "Intellectual Property in the United States" -> true,
      "Intellectual property helps incentivize innovation." -> false,
      "THIS IS ALL CAPS. BUT IT IS TWO SENTENCES." -> false,
      "LOOK AT THIS IT IS CAPS BUT NOT A TITLE." -> true,
      "This Has All Caps. It's Weird But Two Sentences" -> false,
      "The Business Report is expected within 6 hours of closing" -> false,
      "" -> true,
    ))(Predicates.exceedsCapRatio(_))
  }

  test("narrative/title threshold parameters rewire the same checks (env-var tests)") {
    // the reference's UNSTRUCTURED_*_THRESHOLD env vars map to plain parameters here
    val horses = "/--------------- All the king's horses----------------/"
    // default non-alpha threshold rejects; 0.0 disables the ratio check
    assert(eval(Seq(horses))(Predicates.isPossibleTitle(_)) == Seq(false))
    assert(eval(Seq(horses))(Predicates.isPossibleTitle(_, nonAlphaThreshold = 0.0))
      == Seq(true))
    // UNSTRUCTURED_TITLE_MAX_WORD_LENGTH=5 rejects a 6-word title
    val sixWords = "Intellectual Property in the United States"
    assert(eval(Seq(sixWords))(Predicates.isPossibleTitle(_)) == Seq(true))
    assert(eval(Seq(sixWords))(Predicates.isPossibleTitle(_, titleMaxWordLength = 5))
      == Seq(false))
  }

  test("sentence_count vectors") {
    val sp = spark
    import sp.implicits._
    val Row(c1: Int, c2: Int) = Seq("x").toDF("t").select(
      Predicates.sentenceCount(lit("Hi my name is Matt. I work with Crag.")).as("c1"),
      Predicates.sentenceCount(lit("ITEM 1(A). THIS IS A TITLE"), 3).as("c2"),
    ).head()
    assert(c1 == 2)
    assert(c2 < 2) // item titles: short "sentences" don't count
  }

  test("is_us_city_state_zip vectors") {
    checkVectors(Seq(
      "Doylestown, PA 18901" -> true,
      "DOYLESTOWN, PENNSYLVANIA, 18901" -> true,
      "DOYLESTOWN, PENNSYLVANIA 18901" -> true,
      "Doylestown, Pennsylvania 18901" -> true,
      "     Doylestown, Pennsylvania 18901" -> true,
      "The Business Report is expected within 6 hours of closing" -> false,
      "" -> false,
    ))(Predicates.isUsCityStateZip)
  }

  test("is_email_address vectors") {
    checkVectors(Seq(
      "fake@gmail.com" -> true,
      "Fake@gmail.com" -> false,
      "fake.gmail.@gmail.com" -> true,
      "fake.gmail@.@gmail.com" -> false,
      "     fake@gmail.com" -> true,
      "fak!/$e@gmail.com" -> false,
      "" -> false,
    ))(Predicates.isEmailAddress)
  }

  test("under_non_alpha_ratio on whitespace-only text does not divide by zero") {
    assert(eval(Seq(" "))(Predicates.underNonAlphaRatio(_)) == Seq(false))
  }

  // -- test_text_type_handles_non_english_examples (language checks on) --
  test("non-english text: eng-gated checks skip when eng is absent") {
    val narrative = "Я говорю по-русски. Вы тоже?"
    val title = "Риски"
    assert(eval(Seq(narrative))(
      Predicates.isPossibleNarrativeText(_, languageChecks = true,
        languages = Seq("eng"))) == Seq(false))
    assert(eval(Seq(narrative))(
      Predicates.isPossibleNarrativeText(_, languageChecks = true,
        languages = Nil)) == Seq(true))
    assert(eval(Seq(title))(
      Predicates.isPossibleNarrativeText(_, languageChecks = true,
        languages = Seq("eng"))) == Seq(false))
    assert(eval(Seq(title))(
      Predicates.isPossibleNarrativeText(_, languageChecks = true,
        languages = Nil)) == Seq(false))
    assert(eval(Seq(title))(
      Predicates.isPossibleTitle(_, languageChecks = true,
        languages = Seq("eng"))) == Seq(false))
    assert(eval(Seq(title))(
      Predicates.isPossibleTitle(_, languageChecks = true,
        languages = Nil)) == Seq(true))
  }

  // -- test_text_type_handles_multi_language_examples --
  test("multi-language text: checks gate on eng membership, not emptiness") {
    val narrative = "Я говорю по-русски. Вы тоже? 不，我不会说俄语。"
    val title = "Риски (Riesgos)"
    assert(eval(Seq(narrative))(
      Predicates.isPossibleNarrativeText(_, languageChecks = true,
        languages = Seq("eng"))) == Seq(false))
    assert(eval(Seq(narrative))(
      Predicates.isPossibleNarrativeText(_, languageChecks = true,
        languages = Seq("chi", "rus"))) == Seq(true))
    assert(eval(Seq(narrative))(
      Predicates.isPossibleNarrativeText(_, languageChecks = true,
        languages = Nil)) == Seq(true))
    assert(eval(Seq(title))(
      Predicates.isPossibleNarrativeText(_, languageChecks = true,
        languages = Seq("spa", "rus"))) == Seq(false))
    assert(eval(Seq(title))(
      Predicates.isPossibleTitle(_, languageChecks = true,
        languages = Seq("eng"))) == Seq(false))
    assert(eval(Seq(title))(
      Predicates.isPossibleTitle(_, languageChecks = true,
        languages = Seq("spa", "rus"))) == Seq(true))
    assert(eval(Seq(title))(
      Predicates.isPossibleTitle(_, languageChecks = true,
        languages = Nil)) == Seq(true))
  }

  // -- test_item_titles: "ITEM 1(A). THIS IS A TITLE" tokenizes under 2 sentences --
  test("item titles: short dotted headings count below two sentences") {
    val sp = spark
    import sp.implicits._
    val n = Seq("ITEM 1(A). THIS IS A TITLE").toDF("t")
      .select(Predicates.sentenceCount(col("t"), 3).as("n"))
      .collect().head.getInt(0)
    assert(n < 2)
  }
}
