package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

/** Gopher repetition signals + C4 line filter, pinned on hand-computed
  * vectors (Rae et al. 2021 A1.1; Raffel et al. 2020 2.2). */
class QualityFiltersSpec extends SparkSuiteBase {

  private def signals(rows: (String, String)*): Map[String, Row] = {
    val sp = spark
    import sp.implicits._
    val d = rows.toSeq.toDF("doc_id", "text")
    QualityFilters.repetitionSignals(d, col("text"), "\n")
      .collect().map(r => r.getString(0) -> r).toMap
  }

  test("duplicate-line fractions count every occurrence of a repeated line") {
    // 4 lines, "same line" appears 3 times: dup_line_frac = 3/4; chars
    // 3*9 dup / (3*9 + 6) total
    val r = signals("a" -> "same line\nsame line\nsame line\nunique")("a")
    assert(r.getAs[Long]("n_lines") == 4L)
    assert(r.getAs[Double]("dup_line_frac") == 0.75)
    assert(r.getAs[Double]("dup_line_char_frac") ==
      math.rint(10000.0 * 27.0 / 33.0) / 10000.0)
  }

  test("a document with no repeated lines scores zero") {
    val r = signals("a" -> "first line\nsecond line\nthird line")("a")
    assert(r.getAs[Double]("dup_line_frac") == 0.0)
    assert(r.getAs[Double]("dup_line_char_frac") == 0.0)
  }

  test("top-2gram fraction finds the dominant bigram deterministically") {
    // words: the cat the cat sat -> bigrams: "the cat"(2) "cat the" "cat sat"
    // top = "the cat": 2*7 = 14 chars of 7+7+7+7 = 28 total
    val r = signals("a" -> "the cat the cat sat")("a")
    assert(r.getAs[Double]("top_2gram_frac") == 0.5)
  }

  test("dup-5gram fraction is zero without repetition, positive with it") {
    val clean = signals("a" -> "one two three four five six seven eight")("a")
    assert(clean.getAs[Double]("dup_5gram_frac") == 0.0)
    // "a b c d e" repeated: every 5-gram window that recurs counts each time
    val loop = signals("a" -> "a b c d e a b c d e a b c d e")("a")
    assert(loop.getAs[Double]("dup_5gram_frac") > 0.5)
  }

  test("grams lowercase before counting; lines do not") {
    val r = signals("a" -> "The Cat\nthe cat")("a")
    // lines differ (case-sensitive) but the bigram "the cat" repeats; grams
    // span the line break, so "cat the" joins the denominator: 14/21
    assert(r.getAs[Double]("dup_line_frac") == 0.0)
    assert(r.getAs[Double]("top_2gram_frac") ==
      math.rint(10000.0 * 14.0 / 21.0) / 10000.0)
  }

  test("a doc with no lines and no words reports nulls, not failures") {
    val r = signals("a" -> "   ")("a")
    assert(r.isNullAt(r.fieldIndex("n_lines")))
    assert(r.isNullAt(r.fieldIndex("top_2gram_frac")))
  }

  private def c4(text: String): Row = {
    val sp = spark
    import sp.implicits._
    Seq(("a", text)).toDF("doc_id", "text")
      .select(QualityFilters.c4LineFilter(col("text"), "\n").as("f"))
      .select("f.*").collect().head
  }

  test("C4 keeps only terminal-punctuation lines with at least 3 words") {
    val r = c4("This sentence is fine.\nno punct here\nShort one.\n" +
      "Is this a question?\nShouting works too!")
    assert(r.getAs[Int]("n_lines") == 5)
    assert(r.getAs[Int]("n_kept") == 3)
    assert(r.getAs[String]("kept_text") ==
      "This sentence is fine.\nIs this a question?\nShouting works too!")
  }

  test("a closing quote after the terminal punctuation still counts") {
    assert(c4("He said \"stop now.\"").getAs[Int]("n_kept") == 1)
    assert(c4("He said stop now.”").getAs[Int]("n_kept") == 1)
  }

  test("javascript mentions drop the line; lorem ipsum and braces flag the doc") {
    val r = c4("Please enable JavaScript to continue.\nA real sentence here.")
    assert(r.getAs[Int]("n_kept") == 1)
    assert(!r.getAs[Boolean]("has_lorem") && !r.getAs[Boolean]("has_brace"))
    val flagged = c4("Lorem Ipsum dolor sit amet.\nfunction f() { return 1; }")
    assert(flagged.getAs[Boolean]("has_lorem"))
    assert(flagged.getAs[Boolean]("has_brace"))
  }

  test("blank and whitespace-only lines are not counted") {
    val r = c4("First real sentence.\n\n   \nSecond real sentence.")
    assert(r.getAs[Int]("n_lines") == 2)
    assert(r.getAs[Int]("n_kept") == 2)
  }

  test("pruneDecision composes the gates: repetition, flags, no-clean-lines") {
    val sp = spark
    import sp.implicits._
    val d = Seq(
      ("clean", "This is a perfectly ordinary sentence of prose.\nAnd here is another one for good measure."),
      ("repet", Seq.fill(6)("The same line repeats verbatim every time here.").mkString("\n")),
      ("flagd", "Lorem ipsum dolor sit amet is flagged here.\nA real closing sentence follows anyway."),
      ("nokep", "no terminal punctuation here\nnor here either")
    ).toDF("doc_id", "text")
    val r = QualityFilters.pruneDecision(d, col("text"), "\n")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("clean").getAs[Boolean]("keep"))
    assert(r("repet").getAs[Boolean]("repetitive") && !r("repet").getAs[Boolean]("keep"))
    assert(r("flagd").getAs[Boolean]("flagged") && !r("flagd").getAs[Boolean]("keep"))
    assert(r("nokep").getAs[Boolean]("no_clean_lines") && !r("nokep").getAs[Boolean]("keep"))
  }

  test("pruneDecision lets tiny docs pass the repetition gates via null coalesce") {
    val sp = spark
    import sp.implicits._
    val d = Seq(("tiny", "")).toDF("doc_id", "text")
    val r = QualityFilters.pruneDecision(d, col("text"), "\n").collect()(0)
    // empty doc: every fraction is null — the coalesce keeps the repetition
    // gates quiet so the doc is pruned by no_clean_lines, not a null-trip
    assert(!r.getAs[Boolean]("repetitive"))
    assert(r.getAs[Boolean]("no_clean_lines") && !r.getAs[Boolean]("keep"))
  }

  test("the whole gram family computes from one explode pass") {
    val sp = spark
    import sp.implicits._
    val d = Seq(("a", "x y z x y z")).toDF("doc_id", "text")
    val plan = QualityFilters.repetitionSignals(d, col("text"), "\n")
      .queryExecution.executedPlan.toString
    // one generator for lines AND all six n-gram orders, not seven scans
    val generates = "Generate explode".r.findAllIn(plan).length
    assert(generates == 1, s"expected ONE tagged explode:\n$plan")
    // 4 shuffles: token counts, per-n stats, per-doc pivot, the id join
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 4, s"expected <= 4 exchanges:\n$plan")
  }

  test("gopherRules fires each document-level rule on its trigger") {
    val sp = spark
    import sp.implicits._
    val clean = "the quick brown fox jumps over and over with steady prose " +
      "that would be entirely ordinary in any corpus of real документы text " +
      "and keeps going long enough to clear the word floor set for the test"
    val d = Seq(
      (1L, clean),
      (2L, "too short to pass"),
      (3L, clean + "\n### ## # " + ("... " * 12).trim),          // symbols
      // >90% of lines bullet-started (Gopher removes docs with MORE than 90%
      // bullet lines, so the trigger needs 30/31, not a mere trio)
      (4L, (1 to 30).map(_ => "•item number four").mkString("\n") +
        "\n" + clean),
      (5L, clean + "\nfirst...\nsecond...\nthird...\nmore..."), // ellipses
      (6L, clean + " " + (1 to 40).map(_.toString).mkString(" ")), // non-alpha
      (7L, "zz qq ww ee rr tt yy uu ii oo pp aa ss dd ff gg hh " * 3)) // no stopwords
      .toDF("doc_id", "text")
    val r = d.select(col("doc_id"),
        QualityFilters.gopherRules(col("text"), minWords = 20).as("g"))
      .select(col("doc_id"), col("g.*"))
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Boolean]("keep"))
    assert(!r(2L).getAs[Boolean]("keep") && r(2L).getAs[Int]("n_words") < 20)
    assert(!r(3L).getAs[Boolean]("keep") &&
      r(3L).getAs[Double]("symbol_ratio") > 0.1)
    assert(!r(4L).getAs[Boolean]("keep") &&
      r(4L).getAs[Double]("bullet_line_frac") > 0.9)
    assert(!r(5L).getAs[Boolean]("keep") &&
      r(5L).getAs[Double]("ellipsis_line_frac") > 0.3)
    assert(!r(6L).getAs[Boolean]("keep") &&
      r(6L).getAs[Double]("alpha_word_frac") < 0.8)
    assert(!r(7L).getAs[Boolean]("keep") && r(7L).getAs[Int]("n_stop_hits") < 2)
  }
}
