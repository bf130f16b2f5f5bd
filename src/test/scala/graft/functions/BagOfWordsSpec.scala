package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expr.BagOfWordsTokens

/** `bag_of_words` / `calculate_percent_missing_text` vectors
  * (`test_unstructured/metrics/test_text_extraction.py:244-301,470-500`). */
class BagOfWordsSpec extends AnyFunSuite {

  private def bow(s: String): Map[String, Int] =
    BagOfWordsTokens.tokenSeq(s).groupBy(identity).view.mapValues(_.size).toMap

  test("bag_of_words: repeated words and isolated singles") {
    assert(bow("The dog loved the cat, but the cat loved the cow") ==
      Map("the" -> 4, "cat" -> 2, "loved" -> 2, "dog" -> 1, "but" -> 1, "cow" -> 1))
  }

  test("bag_of_words: spaced-out word drops, apostrophe words survive") {
    assert(bow("Hello my name is H a r p e r, what's your name?") ==
      Map("hello" -> 1, "my" -> 1, "name" -> 2, "is" -> 1, "what's" -> 1, "your" -> 1))
  }

  test("bag_of_words: isolated single letters count when alphanumeric") {
    assert(bow("I have a dog and a cat, I love my dog.") ==
      Map("i" -> 2, "have" -> 1, "a" -> 2, "dog" -> 2, "and" -> 1, "cat" -> 1,
        "love" -> 1, "my" -> 1))
  }

  test("bag_of_words: possessives keep their apostrophes") {
    assert(bow("My dog's hair is red, but the dogs' houses are blue.") ==
      Map("my" -> 1, "dog's" -> 1, "hair" -> 1, "is" -> 1, "red" -> 1, "but" -> 1,
        "the" -> 1, "dogs'" -> 1, "houses" -> 1, "are" -> 1, "blue" -> 1))
  }

  test("bag_of_words: hyphenated words survive, a lone dash does not") {
    assert(bow("Sometimes sentences have a dash - like this one!\n" +
      "            A hyphen connects 2 words with no gap: easy-peasy.") ==
      Map("sometimes" -> 1, "sentences" -> 1, "have" -> 1, "a" -> 2, "dash" -> 1,
        "like" -> 1, "this" -> 1, "one" -> 1, "hyphen" -> 1, "connects" -> 1,
        "2" -> 1, "words" -> 1, "with" -> 1, "no" -> 1, "gap" -> 1,
        "easy-peasy" -> 1))
  }

  // -- calculate_percent_missing_text (:470): 1 − shared mass / source mass --
  private def pctMissing(output: String, source: String): Double = {
    val src = bow(source)
    val out = bow(output)
    val total = src.values.sum
    if (total == 0) 0.0
    else {
      val shared = src.map { case (w, n) => math.min(n, out.getOrElse(w, 0)) }.sum
      // 4-dp round, as the corpus query declares
      math.rint((1.0 - shared.toDouble / total) * 1e4) / 1e4
    }
  }

  test("percent_missing_text vectors") {
    assert(pctMissing("extra", "") == 0.0)
    assert(pctMissing("", "Source text has a sentence.") == 1.0)
    assert(pctMissing("The original s e n t e n c e is normal.",
      "The original sentence is normal...") == 0.2)
    assert(pctMissing("We saw 23% improvement in this quarter.",
      "We saw 23% improvement in sales this quarter.") == 0.125)
    assert(pctMissing("no",
      "Is it possible to have more than everything missing?") == 1.0)
  }
}
