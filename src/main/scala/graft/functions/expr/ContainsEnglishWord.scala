package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `contains_english_word` (`text_type.py:191-205`) membership kernel, with the
 * reference's exact two-stage tokenization: the lowercased text splits on
 * `ENGLISH_WORD_SPLIT_RE = [\s\-,.!?_/]+`, then every remaining non-`[a-z]`
 * char is DROPPED from each token (`NON_LOWERCASE_ALPHA_RE`) — so
 * `"beggar's"` probes as `beggars` and `notaWordHa'parrot'` stays ONE token
 * (`notawordhaparrot`, no match), while `zombie?parrot` splits at the `?`.
 * A token survives if its stripped form has length > 1 and is in
 * [[graft.functions.Predicates.EnglishWords]].
 *
 * Bit-identical to the columnar HOF formulation (split + per-token strip +
 * `arrays_overlap`), but probes ONE shared static hash set and exits on the
 * first hit — O(tokens) per row, while `arrays_overlap` walks the full
 * 11.5k-element literal per row (its hash fast path builds a set from the
 * SMALLER side each evaluation, then probes every lexicon entry against it).
 */
case class ContainsEnglishWord(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "contains_english_word"

  override protected def nullSafeEval(input: Any): Any =
    ContainsEnglishWord.containsWord(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.ContainsEnglishWord.containsWord($c)")

  override protected def withNewChildInternal(newChild: Expression): ContainsEnglishWord =
    copy(child = newChild)
}

object ContainsEnglishWord {

  /** Shared across all tasks in the executor JVM — built once per process. */
  private lazy val lexicon: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](32768)
    graft.functions.Predicates.EnglishWords.foreach(s.add)
    s
  }

  /** `ENGLISH_WORD_SPLIT_RE` membership (`text_type.py:24`): token boundaries.
    * Python's `\s` is unicode-aware, so NBSP/NEL count alongside
    * `Character.isWhitespace`. */
  private def isSplit(ch: Char): Boolean =
    Character.isWhitespace(ch) || ch == '\u00a0' || ch == '\u0085' ||
      ch == '-' || ch == ',' || ch == '.' || ch == '!' || ch == '?' ||
      ch == '_' || ch == '/'

  def containsWord(input: UTF8String): Boolean = {
    val s = input.toLowerCase.toString
    val n = s.length
    val tok = new java.lang.StringBuilder(24)
    var i = 0
    while (i <= n) {
      if (i == n || isSplit(s.charAt(i))) {
        if (tok.length > 1 && lexicon.contains(tok.toString)) return true
        tok.setLength(0)
      } else {
        val c = s.charAt(i)
        // non-split, non-[a-z] chars (apostrophes, digits, accents) are dropped
        // WITHOUT ending the token — NON_LOWERCASE_ALPHA_RE.sub (text_type.py:200)
        if (c >= 'a' && c <= 'z') tok.append(c)
      }
      i += 1
    }
    false
  }
}

/** Column-side constructors for the native predicate kernels. */
object Exprs {
  import org.apache.spark.sql.graft.bridge

  def containsEnglishWord(c: Column): Column =
    bridge.column(ContainsEnglishWord(bridge.expression(c)))
}
