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

  private def isPunct(c: Char): Boolean = Character.getType(c) match {
    case Character.CONNECTOR_PUNCTUATION | Character.DASH_PUNCTUATION |
        Character.START_PUNCTUATION | Character.END_PUNCTUATION |
        Character.INITIAL_QUOTE_PUNCTUATION | Character.FINAL_QUOTE_PUNCTUATION |
        Character.OTHER_PUNCTUATION => true
    case _ => false
  }

  def tokenSeq(s: String): Seq[String] = {
    val lowered = s.toLowerCase(java.util.Locale.ROOT)
    val sb = new StringBuilder(lowered.length)
    lowered.foreach { c =>
      if (c == '-' || c == '\'' || !isPunct(c)) sb.append(c)
    }
    val cleaned = graft.functions.Cleaners.cleanBulletsStr(sb.toString)
    val words = cleaned.split("\\s+").filter(_.nonEmpty)
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < words.length) {
      if (words(i).length > 1) { out += words(i); i += 1 }
      else {
        var j = i
        while (j < words.length && words(j).length == 1) j += 1
        if (j - i == 1 && Character.isLetterOrDigit(words(i).charAt(0)))
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
