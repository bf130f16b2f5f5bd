package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression for the 31-base polynomial rolling hash mod 1e9+7 —
 * the hot primitive under `docFingerprint` / `minHashSignature` / `simHash16`
 * (`graft.functions.TextAnalysis`).
 *
 * Replaces the interpreted `aggregate(split(c, ""), …)` higher-order pipeline
 * (per-character array allocation + per-element interpreted eval) with one
 * compiled loop — same values, two orders of magnitude less work per row. Iterates
 * unicode CODEPOINTS (not UTF-16 units) to match the DuckDB oracle mirror
 * (`OracleSql.polyHash`: `ascii(substring(x, i, 1))`) on non-BMP input as well.
 *
 * Codegen emits a static call, so the expression participates in whole-stage
 * codegen; inside higher-order lambdas (e.g. `transform(shingles, s => polyHash(s))`)
 * the interpreted path still runs this compiled loop per element.
 */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.PolyHash.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  final val Mod = 1000000007L

  /** `h = fold(h * 31 + codepoint) mod 1e9+7` over the string's codepoints. */
  def hash(s: String): Long = {
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}
