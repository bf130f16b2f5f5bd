package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `bag_of_words` tokenization (`metrics/text_extraction.py:123-156`), faithful
 * to the reference:
 *
 *  - lowercase, then remove sentence punctuation EXCEPT `-` and `'` (in-word
 *    hyphens/apostrophes survive: "easy-peasy", "dog's"), then `clean_bullets`;
 *  - whitespace-split;
 *  - a run of two or more single-character tokens is OCR debris from a
 *    spaced-out word ("H a r p e r") and is dropped entirely; an ISOLATED
 *    single character is kept only when alphanumeric ("a", "2" — not "-").
 *
 * One compiled pass per row; the array feeds explode → groupBy word counts.
 */
case class BagOfWordsTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bag_of_words_tokens"

  override protected def nullSafeEval(input: Any): Any =
    BagOfWordsTokens.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.BagOfWordsTokens.tokens($c)")

  override protected def withNewChildInternal(newChild: Expression): BagOfWordsTokens =
    copy(child = newChild)
}

object BagOfWordsTokens {

  private def isPunct(cp: Int): Boolean = Character.getType(cp) match {
    case Character.CONNECTOR_PUNCTUATION | Character.DASH_PUNCTUATION |
        Character.START_PUNCTUATION | Character.END_PUNCTUATION |
        Character.INITIAL_QUOTE_PUNCTUATION | Character.FINAL_QUOTE_PUNCTUATION |
        Character.OTHER_PUNCTUATION => true
    case _ => false
  }

  /** Python `str.isalnum()` for one code point: `isalpha` (category L*) or
    * any of the numeric predicates (categories Nd/Nl/No — `isdecimal`,
    * `isdigit`, `isnumeric`). Java's `isLetterOrDigit` is narrower (it drops
    * Nl/No: '²', 'Ⅲ', …) and char-based (astral digits like
    * U+1D7D8 would misreport as non-alnum). */
  private def pyIsAlnum(cp: Int): Boolean =
    Character.isLetter(cp) || (Character.getType(cp) match {
      case Character.DECIMAL_DIGIT_NUMBER | Character.LETTER_NUMBER |
          Character.OTHER_NUMBER => true
      case _ => false
    })

  def tokenSeq(s: String): Seq[String] = {
    // the reference works on Python code-point strings throughout: lower(),
    // category-P removal, str.split() whitespace, and len(word) all count
    // code points — surrogate pairs must never be split or double-counted
    val lowered = s.toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(lowered.length)
    var k = 0
    while (k < lowered.length) {
      val cp = lowered.codePointAt(k)
      if (cp == '-' || cp == '\'' || !isPunct(cp)) sb.appendCodePoint(cp)
      k += Character.charCount(cp)
    }
    val cleaned = graft.functions.Cleaners.cleanBulletsStr(sb.toString)
    val words = cleaned.split(graft.functions.Cleaners.PySpaceClass + "+")
      .filter(_.nonEmpty)
    def cpLen(w: String): Int = w.codePointCount(0, w.length)
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < words.length) {
      if (cpLen(words(i)) > 1) { out += words(i); i += 1 }
      else {
        var j = i
        while (j < words.length && cpLen(words(j)) == 1) j += 1
        if (j - i == 1 && pyIsAlnum(words(i).codePointAt(0)))
          out += words(i)
        i = j
      }
    }
    out.result()
  }

  def tokens(input: UTF8String): GenericArrayData =
    new GenericArrayData(
      tokenSeq(input.toString).map(UTF8String.fromString).toArray[Any])

  def column(c: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      BagOfWordsTokens(org.apache.spark.sql.graft.bridge.expression(c)))
}
