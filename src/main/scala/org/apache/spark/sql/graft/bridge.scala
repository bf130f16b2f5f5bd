package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column ⇄ Catalyst-Expression bridge for the engine's native expressions
 * (Spark 4 made `Column` a connect-compatible facade; the classic conversion
 * lives in the `sql`-private `ExpressionUtils`). This is the standard escape
 * hatch for libraries contributing codegen'd expressions.
 */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
