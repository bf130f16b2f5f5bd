package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** `calculate_edit_distance` scoring ports
  * (`test_unstructured/metrics/test_text_extraction.py:15-240`). */
class TextExtractionMetricsSpec extends AnyFunSuite {

  private def score(output: String, source: String): Double =
    BigDecimal(TextExtractionMetrics.calculateEditDistance(output, source,
      returnAs = "score")).setScale(2, BigDecimal.RoundingMode.HALF_EVEN).toDouble

  private val source = "I like pizza. I like bagels."

  // -- test_calculate_edit_distance (:15-105) — the reference's exact scores
  test("edit distance score vectors match the reference") {
    assert(score(source, source) == 1.0)
    assert(score("I like p i z z a . I like bagles.", source) == 0.75)
    assert(score("\\s+".r.replaceAllIn(source.mkString(" "), " "), source) == 0.39)
    assert(score(source.replace(" ", ""), source) == 0.64)
    assert(score("I like pizza.", source) == 0.0)
    assert(score("I like pizza. I like .", source) == 0.57)
    assert(score("I like pizza. I like beagles.", source) == 0.89)
    assert(score("I like pizza pizza. I like bagels.", source) == 0.79)
  }

  test("invalid return_as raises") {
    intercept[IllegalArgumentException] {
      TextExtractionMetrics.calculateEditDistance("a", "b", returnAs = "nope")
    }
  }

  // -- test_calculate_edit_distance_with_various_whitespace_1 (:187-240)
  test("whitespace standardization makes layout-only differences free") {
    val pairs = Seq(
      ("The  dog\rloved the cat, but\t\n    the cat\tloved the\n cow",
        "The dog loved the cat, but the cat loved the cow"),
      ("Hello    my\tname\tis H a r p e r, \nwhat's your\u000Bname?",
        "Hello my name is H a r p e r, what's your name?"),
      ("I have a\t\n\tdog and a\tcat,\fI love my\n\n\n\ndog.",
        "I have a dog and a cat, I love my dog."),
      // the two table-shaped rows: space-aligned vs tab-separated, and
      // tab-separated vs the same rows with a blank-line gap
      ("\n  Name    Age City           Occupation\n" +
        "  Alice   30  New York       Engineer\n" +
        "  Bob     25  Los Angeles    Designer\n" +
        "  Charlie 35  Chicago        Teacher\n" +
        "  David   40  San Francisco  Developer\n  ",
        "\n  Name\tAge\tCity\tOccupation\n  Alice\t30\tNew York\tEngineer\n" +
        "  Bob\t25\tLos Angeles\tDesigner\n  Charlie\t35\tChicago\tTeacher\n" +
        "  David\t40\tSan Francisco\tDeveloper\n  "),
      ("\n  Name\tAge\tCity\tOccupation\n  Alice\t30\tNew York\tEngineer\n" +
        "  Bob\t25\tLos Angeles\tDesigner\n  Charlie\t35\tChicago\tTeacher\n" +
        "  David\t40\tSan Francisco\tDeveloper\n  ",
        "Name\tAge\tCity\tOccupation\n\n \nAlice\t30\tNew York\tEngineer\n" +
        "Bob\t25\tLos Angeles\tDesigner\nCharlie\t35\tChicago\tTeacher\n" +
        "David\t40\tSan Francisco\tDeveloper"))
    pairs.foreach { case (a, b) =>
      assert(TextExtractionMetrics.calculateEditDistance(a, b,
        returnAs = "score", standardizeWhitespaces = true) == 1.0)
      assert(TextExtractionMetrics.calculateEditDistance(a, b,
        returnAs = "distance", standardizeWhitespaces = true) == 0.0)
      assert(TextExtractionMetrics.calculateEditDistance(a, b,
        returnAs = "score", standardizeWhitespaces = false) < 1.0)
      assert(TextExtractionMetrics.calculateEditDistance(a, b,
        returnAs = "distance", standardizeWhitespaces = false) > 0.0)
    }
  }

  // -- test_calculate_edit_distance_with_various_whitespace_2 (:210-240)
  test("standardized whitespace improves the tab-vs-border table score") {
    val tabs = "\n  Name\tAge\tCity\tOccupation\n  Alice\t30\tNew York\tEngineer\n" +
      "  Bob\t25\tLos Angeles\tDesigner\n  Charlie\t35\tChicago\tTeacher\n" +
      "  David\t40\tSan Francisco\tDeveloper\n  "
    val borders = "\n\n  | Name    | Age | City         | Occupation     |\n" +
      "  |---------|-----|--------------|----------------|\n" +
      "  | Alice   | 30  | New York     | Engineer       |\n" +
      "  | Bob     | 25  | Los Angeles  | Designer       |\n" +
      "  | Charlie | 35  | Chicago      | Teacher        |\n" +
      "  | David   | 40  | San Francisco| Developer      |\n\n  "
    def s(std: Boolean) = TextExtractionMetrics.calculateEditDistance(
      tabs, borders, returnAs = "score", standardizeWhitespaces = std)
    def d(std: Boolean) = TextExtractionMetrics.calculateEditDistance(
      tabs, borders, returnAs = "distance", standardizeWhitespaces = std)
    assert(s(std = true) > s(std = false))
    assert(d(std = true) < d(std = false))
  }

  // -- smart quotes cost nothing (standardize_quotes in the pipeline)
  test("smart-quoted output matches ascii-quoted source exactly") {
    assert(TextExtractionMetrics.calculateEditDistance(
      "“I like pizza.”", "\"I like pizza.\"", returnAs = "distance") == 0.0)
    assert(TextExtractionMetrics.calculateAccuracy(
      "It’s fine", "It's fine") == 1.0)
  }

  // -- empty source is floored at length 1 (division-by-zero guard)
  test("empty source yields score 0 for non-empty output") {
    assert(TextExtractionMetrics.calculateEditDistance("abc", "",
      returnAs = "score") == 0.0)
    assert(TextExtractionMetrics.calculateEditDistance("", "",
      returnAs = "score") == 1.0)
  }

  // -- test_standardize_quotes_every_codepoint (test_text_extraction.py:427):
  // -- every codepoint in both translation tables maps to its ASCII form --
  test("standardize_quotes maps every table codepoint to its ASCII quote") {
    def cps(s: String): Seq[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        out += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      out.result()
    }
    val doubles = cps(graft.functions.Cleaners.DoubleQuoteCodepoints)
    val singles = cps(graft.functions.Cleaners.SingleQuoteCodepoints)
    // the reference tables hold 19 double and 20 single codepoints
    assert(doubles.size == 19 && singles.size == 20)
    doubles.foreach(cp =>
      assert(TextExtractionMetrics.standardizeQuotes(cp) == "\"",
        f"U+${cp.codePointAt(0)}%04X did not map to a double quote"))
    singles.foreach(cp =>
      assert(TextExtractionMetrics.standardizeQuotes(cp) == "'",
        f"U+${cp.codePointAt(0)}%04X did not map to a single quote"))
  }


  // -- test_prepare_string (test_text_extraction.py:303-341): the 5-row
  // -- whitespace-standardization matrix; without the flag the string
  // -- passes through untouched --
  test("prepare_str standardization matches the reference's five vectors") {
    val rows = Seq(
      ("The  dog\rloved the cat, but\t\n    the cat\tloved the\n cow\n\n",
        "The dog loved the cat, but the cat loved the cow"),
      ("\n\nHello    my\tname\tis H a r p e r, \nwhat's your\u000Bname?",
        "Hello my name is H a r p e r, what's your name?"),
      ("I have a\t\n\tdog and a\tcat,\fI love my\n\n\n\ndog.",
        "I have a dog and a cat, I love my dog."),
      ("L     is for the way you look at me\n" +
        "            O    is for the only one I see\n" +
        "            V    is very, very extraordinary\n" +
        "            E    is even more than anyone that you adore can",
        "L is for the way you look at me O is for the only one I see " +
        "V is very, very extraordinary " +
        "E is even more than anyone that you adore can"),
      ("\n            | Name    | Age | City         | Occupation     |\n" +
        "            |---------|-----|--------------|----------------|\n" +
        "            | Alice   | 30  | New York     | Engineer       |\n" +
        "            | Bob     | 25  | Los Angeles  | Designer       |\n" +
        "            | Charlie | 35  | Chicago      | Teacher        |\n" +
        "            | David   | 40  | San Francisco| Developer      |\n            ",
        "| Name | Age | City | Occupation | " +
        "|---------|-----|--------------|----------------| " +
        "| Alice | 30 | New York | Engineer | | Bob | 25 | Los Angeles | Designer | " +
        "| Charlie | 35 | Chicago | Teacher | | David | 40 | San Francisco| Developer |"))
    rows.foreach { case (text, expected) =>
      assert(TextExtractionMetrics.prepareStr(text,
        standardizeWhitespaces = true) == expected)
      assert(TextExtractionMetrics.prepareStr(text) == text)
    }
  }
}
