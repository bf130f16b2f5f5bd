package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Weighted Levenshtein distance (insert=2, delete=1, substitute=1 by default) —
 * the metric under `calculate_edit_distance` / `calculate_accuracy`
 * (`/root/reference/unstructured/metrics/text_extraction.py:57-121`, which uses
 * python-Levenshtein's weighted variant). Spark's built-in `levenshtein` is
 * unweighted, so this is a native codegen'd expression: one O(|a|·|b|) DP with two
 * rolling rows plus the two O(n) code-point arrays.
 *
 * Weights are fixed at plan time (the reference's default `(2, 1, 1)` tuple).
 * BMP-only inputs (the overwhelmingly common case) run the DP directly over
 * the char array; a surrogate anywhere switches to code-point arrays so
 * astral chars count as one position like Python strings.
 */
case class WeightedLevenshtein(left: Expression, right: Expression,
    insWeight: Int = 2, delWeight: Int = 1, subWeight: Int = 1)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "weighted_levenshtein"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    WeightedLevenshtein.distance(
      l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString,
      insWeight, delWeight, subWeight)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expr.WeightedLevenshtein.distance($a.toString(), $b.toString(), " +
        s"$insWeight, $delWeight, $subWeight)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): WeightedLevenshtein =
    copy(left = newLeft, right = newRight)
}

object WeightedLevenshtein {

  /** Transform `a` INTO `b`: inserting a char of `b` costs `ins`, deleting a char
    * of `a` costs `del`, substitution costs `sub` (python-Levenshtein semantics).
    *
    * Computed over CODE POINTS, not UTF-16 units — Python strings are
    * code-point sequences, so a surrogate pair (emoji, the U+1F676..78 quote
    * ornaments `standardize_quotes` itself translates) must count as ONE
    * position or every astral char inflates the distance and the
    * `len(source)` score denominator. */
  def distance(a: String, b: String, ins: Int, del: Int, sub: Int): Long = {
    // fast path: no surrogates anywhere → UTF-16 units ARE the code points,
    // skip the per-row array conversion in the codegen'd hot path
    val aa = toCodePoints(a)
    val bb = toCodePoints(b)
    val n = aa.length
    val m = bb.length
    if (n == 0) return ins.toLong * m
    if (m == 0) return del.toLong * n
    var prev = new Array[Long](m + 1)
    var cur = new Array[Long](m + 1)
    var j = 0
    while (j <= m) { prev(j) = ins.toLong * j; j += 1 }
    var i = 1
    while (i <= n) {
      cur(0) = del.toLong * i
      val ca = aa(i - 1)
      j = 1
      while (j <= m) {
        val costSub = prev(j - 1) + (if (ca == bb(j - 1)) 0L else sub.toLong)
        val costDel = prev(j) + del
        val costIns = cur(j - 1) + ins
        cur(j) = math.min(costSub, math.min(costDel, costIns))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }

  private def toCodePoints(s: String): Array[Int] = {
    var hasSurrogate = false
    var i = 0
    while (i < s.length && !hasSurrogate) {
      if (Character.isSurrogate(s.charAt(i))) hasSurrogate = true
      i += 1
    }
    if (!hasSurrogate) {
      val out = new Array[Int](s.length)
      var j = 0
      while (j < s.length) { out(j) = s.charAt(j); j += 1 }
      out
    } else s.codePoints().toArray
  }
}
