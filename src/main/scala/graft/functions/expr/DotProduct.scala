package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native Σ aᵢ·bᵢ over two numeric-array columns, accumulated as DOUBLE —
 * the hot primitive under every cosine similarity (ANN top-k, SemDeDup,
 * margin bitext, embedding near-dup) and vector norm (`sqrt(dot(x, x))`).
 *
 * Replaces the interpreted `aggregate(zip_with(a, b, x·y), 0.0, +)` pipeline
 * (per-pair product-array allocation + per-element interpreted eval) with one
 * compiled loop. Arithmetic is BIT-IDENTICAL to the fold it replaces: each
 * element widens to double exactly as `Cast` does, products accumulate
 * left-to-right in a double — so every oracle hash over cosine columns is
 * unchanged. Null semantics also mirror the fold: a NULL array, a NULL
 * element, or mismatched lengths (zip_with pads with NULL, and `null · x`
 * poisons the sum) all yield NULL.
 */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  // fail at ANALYSIS time for element types the accessors below don't
  // handle (array<short>, array<byte>, array<decimal> — the replaced fold
  // Cast-widened those; this expression would otherwise throw
  // IllegalStateException from `accessor` only at eval/codegen time)
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def supported(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
      case _ => false
    }
    if (supported(left.dataType) && supported(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "dot_product requires array<float|double|int|bigint> inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def accessor(e: Expression): Int = e.dataType match {
    case ArrayType(FloatType, _) => 0
    case ArrayType(DoubleType, _) => 1
    case ArrayType(IntegerType, _) => 2
    case ArrayType(LongType, _) => 3
    case other => throw new IllegalStateException(
      s"dot_product over unsupported type $other")
  }
  @transient private lazy val leftAcc = accessor(left)
  @transient private lazy val rightAcc = accessor(right)

  override protected def nullSafeEval(l: Any, r: Any): Any =
    DotProduct.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      leftAcc, rightAcc)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotResult")
      s"""
      java.lang.Double $tmp =
        graft.functions.expr.DotProduct.dot($a, $b, $leftAcc, $rightAcc);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp.doubleValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** One compiled pass; `acc` identical to the interpreted fold's. Returns
    * null (instead of a partial sum) exactly where the fold it replaces
    * summed a null product. */
  def dot(a: ArrayData, b: ArrayData, aAcc: Int, bAcc: Int): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = aAcc match {
        case 0 => a.getFloat(i).toDouble
        case 1 => a.getDouble(i)
        case 2 => a.getInt(i).toDouble
        case _ => a.getLong(i).toDouble
      }
      val y = bAcc match {
        case 0 => b.getFloat(i).toDouble
        case 1 => b.getDouble(i)
        case 2 => b.getInt(i).toDouble
        case _ => b.getLong(i).toDouble
      }
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  import org.apache.spark.sql.graft.bridge

  def dotProduct(a: Column, b: Column): Column =
    bridge.column(DotProduct(bridge.expression(a), bridge.expression(b)))
}
