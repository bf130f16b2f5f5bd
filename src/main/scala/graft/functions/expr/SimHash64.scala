package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native 64-bit SimHash over whitespace-delimited words: each word's rolling hash
 * (same codepoint polynomial as [[PolyHash]]) spawns 64 keyed variants
 * `h_j = (h·(2j+1) + 7919j) mod 1e9+7`; the parity of `h_j` votes ±1 on bit j, and
 * bit j of the result is set when the vote total is positive. Near-duplicate
 * documents differ in few bits (Hamming distance).
 *
 * One compiled pass over the string — no word-array allocation, no per-bit
 * re-evaluation — replacing the 16-bit higher-order-function formulation that ran
 * 6.8× slower than its columnar mirror. The keyed-parity construction keeps every
 * intermediate below 2^63 so the DuckDB oracle reproduces it with plain BIGINT
 * arithmetic.
 */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.SimHash64.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  final val Mod = 1000000007L

  def hash(s: String): Long = {
    val votes = new Array[Int](64)
    val n = s.length
    var i = 0
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      if (i < n) {
        var h = 0L
        while (i < n && !Character.isWhitespace(s.charAt(i))) {
          val cp = s.codePointAt(i)
          h = (h * 31L + cp) % Mod
          i += Character.charCount(cp)
        }
        var j = 0
        while (j < 64) {
          val hj = (h * (2L * j + 1L) + 7919L * j) % Mod
          votes(j) += (if ((hj & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}
