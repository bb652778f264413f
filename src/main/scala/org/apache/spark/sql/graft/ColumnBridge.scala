package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark 4's `private[sql]` Column ↔ Expression conversions —
  * the supported seam for libraries contributing custom Catalyst
  * expressions (the public `Column.expr` accessor was removed when the
  * Column API went connect-agnostic in 4.0).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
