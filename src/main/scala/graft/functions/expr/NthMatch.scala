package graft.functions.expr

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `_get_indexed_match` (`cleaners/extract.py:10-28`): the character span of the
 * n-th (0-based) regex match, as `[start1Based, endExclusive]`, or null when
 * `n` is negative or the text has fewer than `n+1` matches (the reference
 * raises ValueError; a column yields null). Backs the `index` parameter of
 * `extract_text_before/after`.
 */
case class NthMatch(child: Expression, pattern: String, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "nth_match"

  @transient private lazy val compiled = Pattern.compile(pattern)

  def matchSpan(input: UTF8String): Any = {
    if (n < 0) return null
    val s = input.toString
    val m = compiled.matcher(s)
    var i = 0
    while (m.find()) {
      if (i == n) {
        // CODE-POINT offsets: Spark's `substring` counts code points, and the
        // reference's spans are Python string indices — Java's UTF-16 m.start
        // would drift by one per preceding astral character
        return new GenericArrayData(Array[Any](
          s.codePointCount(0, m.start) + 1, s.codePointCount(0, m.end)))
      }
      i += 1
    }
    null
  }

  override protected def nullSafeEval(input: Any): Any =
    matchSpan(input.asInstanceOf[UTF8String])

  // eval via the expression instance: the compiled Pattern lives on `this`, so
  // codegen references the bound expression object
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nthMatch", this, classOf[NthMatch].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      Object r = $ref.matchSpan($c);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) r; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): NthMatch =
    copy(child = newChild)
}
