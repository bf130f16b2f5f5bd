package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Python `str.strip()` / `lstrip()` / `rstrip()` as a single character scan.
 *
 * The semantics need the full Python whitespace set (Java's `\s` misses the
 * unicode spaces; a spelled-out regex character class with supplementary
 * ranges drops Java's optimized Ctype path and benches ~5x slower than `\s`) —
 * a direct scan with `Character.isWhitespace` + the four extra code points is
 * both exact and faster than either regex. Hot path: every classifier
 * predicate strips its input.
 */
case class PyStrip(child: Expression, leading: Boolean = true, trailing: Boolean = true)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "py_strip"

  def strip(input: UTF8String): UTF8String = {
    val s = input.toString
    var i = 0
    var j = s.length
    if (leading)
      while (i < j && PyStrip.isPySpace(s.charAt(i))) i += 1
    if (trailing)
      while (j > i && PyStrip.isPySpace(s.charAt(j - 1))) j -= 1
    if (i == 0 && j == s.length) input
    else UTF8String.fromString(s.substring(i, j))
  }

  override protected def nullSafeEval(input: Any): Any =
    strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pyStrip", this, classOf[PyStrip].getName)
    defineCodeGen(ctx, ev, c => s"$ref.strip($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PyStrip =
    copy(child = newChild)
}

object PyStrip {
  /** Python `str.isspace` per UTF-16 unit: Java whitespace plus NEL, NBSP,
    * figure space, narrow NBSP. */
  @inline def isPySpace(c: Char): Boolean =
    Character.isWhitespace(c) ||
      c == '\u0085' || c == '\u00A0' || c == '\u2007' || c == '\u202F'
}
