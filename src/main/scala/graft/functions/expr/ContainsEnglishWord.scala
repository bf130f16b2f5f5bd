package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `contains_english_word` (`text_type.py:193-205`) membership kernel: any
 * `[a-z]` run of length > 1 in the lowercased text present in
 * [[graft.functions.Predicates.EnglishWords]].
 *
 * Bit-identical to the columnar
 * `arrays_overlap(filter(split(lower(c), "[^a-z]+"), len > 1), lit(words))`
 * (lowercasing goes through the same `UTF8String.toLowerCase` the `lower()`
 * function uses), but probes ONE shared static hash set and exits on the first
 * hit — O(tokens) per row, while `arrays_overlap` walks the full 11.5k-element
 * literal per row (its hash fast path builds a set from the SMALLER side each
 * evaluation, then probes every lexicon entry against it).
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

  def containsWord(input: UTF8String): Boolean = {
    val s = input.toLowerCase.toString
    val n = s.length
    var i = 0
    while (i < n) {
      while (i < n && (s.charAt(i) < 'a' || s.charAt(i) > 'z')) i += 1
      val start = i
      while (i < n && s.charAt(i) >= 'a' && s.charAt(i) <= 'z') i += 1
      if (i - start > 1 && lexicon.contains(s.substring(start, i))) return true
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
