package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSuiteBase
import graft.functions.expr.ContainsEnglishWord

/** `contains_english_word` (`text_type.py:193-205`) over the shipped lexicon. */
class PredicatesSpec extends SparkSuiteBase {

  test("lexicon loads from the resource, merged with the curated head") {
    val words = Predicates.EnglishWords
    assert(words.size > 11000, s"expected >11k words, got ${words.size}")
    assert(words == words.sorted && words == words.distinct)
    // curated technical vocabulary the 19th-century corpus lacks
    assert(words.contains("cache") && words.contains("software"))
    // corpus-derived literary vocabulary the old 1.3k head lacked
    assert(words.contains("battlefield") && words.contains("regiment") &&
      words.contains("abandonment"))
  }

  private def check(s: String): Boolean =
    ContainsEnglishWord.containsWord(UTF8String.fromString(s))

  test("membership kernel: tokens, case, and the len>1 rule") {
    assert(check("The regiment advanced"))
    assert(check("UPPERCASE THE WORDS")) // lowercased before probing
    assert(check("punctuation,separated words"))
    assert(!check("zzqxx kjvvw qqptt")) // gibberish
    assert(!check("")) // empty
    assert(!check("a I x 9")) // single-letter tokens never match
    assert(!check("BLAH BLAHBLAH 123")) // reference test: not words
  }

  test("two-stage tokenization: strip inside tokens, split only on separators") {
    // NON_LOWERCASE_ALPHA_RE.sub after ENGLISH_WORD_SPLIT_RE (text_type.py:24,200)
    assert(check("beggar's feast")) // "beggar's" strips to "beggars"
    assert(check("zombie?parrot")) // '?' is a split char
    assert(!check("notaWordHa'parrot'")) // apostrophe does NOT split
    assert(check("Big/Brown/Sheet")) // '/' is a split char
    assert(check("1.A.RISKS")) // '.' is a split char; "risks" qualifies
    assert(!check("sem;colon;only")) // ';' neither splits nor survives the strip
  }

  test("native kernel is bit-identical to the columnar HOF formulation") {
    val sp = spark
    import sp.implicits._
    val samples = Seq("The regiment advanced", "zzqxx kjvvw", "Tab\tand\nnewline",
      "café au lait", "mixedCASE Words-with-dashes", "", "  ", "a b c",
      "Élève STRAßE weiter", "it's a test", "zombie?parrot", "notaWordHa'parrot'")
    val df = samples.toDF("t")
    val words = Predicates.EnglishWords
    val hof = arrays_overlap(
      filter(
        transform(split(lower(col("t")), Predicates.EnglishWordSplitPattern),
          t => regexp_replace(t, "[^a-z]", "")),
        w => length(w) > 1),
      lit(words.toArray))
    val rows = df.select(Predicates.containsEnglishWord(col("t")).as("native"),
      hof.as("columnar")).collect()
    rows.zip(samples).foreach { case (r, s) =>
      assert(r.getBoolean(0) == r.getBoolean(1), s"diverged on: '$s'")
    }
  }

  test("a custom wordlist still takes the literal-array path") {
    val sp = spark
    import sp.implicits._
    val got = Seq("alpha beta", "gamma").toDF("t")
      .select(Predicates.containsEnglishWord(col("t"), Seq("beta")).as("b"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got == Seq(true, false))
  }
}
