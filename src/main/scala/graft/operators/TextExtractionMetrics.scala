package graft.operators

import graft.functions.Cleaners
import graft.functions.expr.WeightedLevenshtein

/**
 * Driver-side `calculate_edit_distance` / `calculate_accuracy`
 * (`metrics/text_extraction.py:69-130`) — the same pipeline the distributed
 * `q_edit_distance_accuracy` query runs column-wise: prepare (whitespace
 * collapse), quote standardization, weighted Levenshtein (ins=2, del=1,
 * sub=1), then the division-safe bounded score.
 */
object TextExtractionMetrics {

  /** `prepare_str` (`text_extraction.py:206-211`): null-safe; optionally
    * collapses all whitespace runs to single spaces and trims. The collapse is
    * Python `str.split()` — its whitespace set ([[Cleaners.PySpaceClass]]:
    * \x1C-\x1F, NEL, NBSP, U+2028/29, …) is wider than Java regex `\s`. */
  def prepareStr(s: String, standardizeWhitespaces: Boolean = false): String =
    if (s == null || s.isEmpty) ""
    else if (standardizeWhitespaces)
      s.split(Cleaners.PySpaceClass + "+").filter(_.nonEmpty).mkString(" ")
    else s

  /** `standardize_quotes` (`text_extraction.py:214-224`) at the string level —
    * same codepoint table as the column-wise `Cleaners.standardizeQuotes`. */
  def standardizeQuotes(s: String): String = {
    val doubles = Cleaners.DoubleQuoteCodepoints.codePoints().toArray.toSet
    val singles = Cleaners.SingleQuoteCodepoints.codePoints().toArray.toSet
    val sb = new java.lang.StringBuilder(s.length)
    s.codePoints().forEach { cp =>
      if (doubles.contains(cp)) sb.append('"')
      else if (singles.contains(cp)) sb.append('\'')
      else sb.appendCodePoint(cp)
    }
    sb.toString
  }

  /** `calculate_edit_distance` (`text_extraction.py:69-120`). `returnAs` is
    * one of `"distance"` (raw weighted distance) or `"score"` (1 - bounded
    * percentage distance, with the source length floored at 1 so an empty
    * source scores 0 rather than dividing by zero). */
  def calculateEditDistance(output: String, source: String,
      returnAs: String = "distance",
      standardizeWhitespaces: Boolean = true,
      weights: (Int, Int, Int) = (2, 1, 1)): Double = {
    require(returnAs == "score" || returnAs == "distance",
      s"Invalid return value type. Expected one of: score, distance; got $returnAs")
    val o = standardizeQuotes(prepareStr(output, standardizeWhitespaces))
    val s = standardizeQuotes(prepareStr(source, standardizeWhitespaces))
    val distance = WeightedLevenshtein
      .distance(o, s, weights._1, weights._2, weights._3).toDouble
    if (returnAs == "distance") distance
    else {
      // len(source) is CODE POINTS in Python — codePointCount, not length
      val srcLen = s.codePointCount(0, s.length)
      val bounded = math.min(math.max(distance / math.max(srcLen, 1.0), 0.0), 1.0)
      1.0 - bounded
    }
  }

  /** `calculate_accuracy` (`text_extraction.py:123-130`): the score form.
    * `weights` = (insertion, deletion, substitution), reference default
    * (2, 1, 1); the evaluation calculator passes (1, 1, 1). */
  def calculateAccuracy(output: String, source: String,
      standardizeWhitespaces: Boolean = true,
      weights: (Int, Int, Int) = (2, 1, 1)): Double =
    calculateEditDistance(output, source, "score", standardizeWhitespaces, weights)

  /**
   * `calculate_percent_missing_text` (`text_extraction.py:160-203`): bag of
   * words on both sides ([[graft.functions.expr.BagOfWordsTokens]] — the one
   * tokenizer, so the scalar and the q_percent_missing_text DataFrame path
   * cannot drift), missing = Σ max(source_count − output_count, 0), fraction
   * rounded to 3 (banker's, matching Python `round`), clamped to 1; empty
   * source → 0 (nothing to miss). Duplication in the output is never
   * penalized.
   */
  def calculatePercentMissingText(output: String, source: String): Double = {
    def bow(s: String): Map[String, Int] =
      graft.functions.expr.BagOfWordsTokens.tokenSeq(prepareStr(s))
        .groupBy(identity).map { case (w, g) => w -> g.size }
    val ob = bow(output)
    val sb = bow(source)
    val totalSource = sb.values.sum
    if (totalSource == 0) 0.0
    else {
      val missing = sb.iterator
        .map { case (w, c) => math.max(c - ob.getOrElse(w, 0), 0) }.sum
      val frac = BigDecimal(missing.toDouble / totalSource)
        .setScale(3, BigDecimal.RoundingMode.HALF_EVEN).toDouble
      math.min(frac, 1.0)
    }
  }
}
