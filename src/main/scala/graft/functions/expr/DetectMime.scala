package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `detect_filetype(...).mime_type` as a native column expression
 * (`file_utils/filetype.py` detection chain: binary magic, zip-member sniff,
 * OLE + extension, text differentiators, extension fallback).
 *
 * Exists so the `GraftPartitionDocs` pushdown rule
 * (`org.apache.spark.sql.graft.PartitionPlan`) can rewrite a `filetype`
 * predicate above the parse into this head-sniff below it: detection reads a
 * bounded prefix of the payload, so excluded documents are never parsed —
 * the 100 TB win is skipping whole-file parsing, not the scan itself.
 */
case class DetectMime(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "detect_mime"

  def detect(path: UTF8String, content: Array[Byte]): UTF8String =
    UTF8String.fromString(
      graft.sources.DetectFiletype.detect(path.toString, content, None).mimeType)

  override protected def nullSafeEval(path: Any, content: Any): Any =
    detect(path.asInstanceOf[UTF8String], content.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("detectMime", this, classOf[DetectMime].getName)
    defineCodeGen(ctx, ev, (p, c) => s"$ref.detect($p, $c)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DetectMime =
    copy(left = newLeft, right = newRight)
}
