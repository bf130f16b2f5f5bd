package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

/** `standardize_quotes` vectors
  * (`test_unstructured/metrics/test_text_extraction.py:340-440`). */
class StandardizeQuotesSpec extends SparkSuiteBase {

  private def std(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(Cleaners.standardizeQuotes(col("t")).as("out"))
      .collect().head.getString(0)
  }

  test("ornament quotes and corner brackets fold to ASCII") {
    assert(std("❛First sentence. Second sentence. Third sentence.❜") ==
      "'First sentence. Second sentence. Third sentence.'")
    assert(std("「Chapter 1」: ❝The Beginning❞ - " +
      "„A new story“ begins «today».") ==
      "'Chapter 1': \"The Beginning\" - \"A new story\" begins \"today\".")
  }

  test("U+201C / U+2018 regression: left smart quotes are not dropped") {
    assert(std("“") == "\"")
    assert(std("‘") == "'")
    assert(std("“Hello”") == "\"Hello\"")
    assert(std("‘world’") == "'world'")
    assert(std("She said “Hello” and then whispered ‘Goodbye’") ==
      "She said \"Hello\" and then whispered 'Goodbye'")
    assert(std("‘tis the season") == "'tis the season")
  }

  test("every translation-table codepoint maps to its ASCII equivalent") {
    // 19 double + 20 single codepoints, incl. the supplementary U+1F676-78
    val doubles = Cleaners.DoubleQuoteCodepoints.codePoints().toArray
    val singles = Cleaners.SingleQuoteCodepoints.codePoints().toArray
    assert(doubles.length == 19 && singles.length == 20)
    doubles.foreach { cp =>
      assert(std(new String(Character.toChars(cp))) == "\"", f"U+$cp%04X")
    }
    singles.foreach { cp =>
      assert(std(new String(Character.toChars(cp))) == "'", f"U+$cp%04X")
    }
  }

  test("text without any quotes passes through untouched") {
    assert(std("plain text, no quotes at all") == "plain text, no quotes at all")
  }
}
