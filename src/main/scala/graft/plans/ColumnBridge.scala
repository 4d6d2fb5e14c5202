package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression adapters for this library's custom
  * expressions. Spark 4 moved these behind `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils), so the adapter lives in
  * an org.apache.spark.sql subpackage — the standard extension-library
  * escape hatch; no Spark internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
