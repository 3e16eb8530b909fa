package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 made `Column.expr` / `new Column(expr)` private[sql]
  * (columnNodeSupport.scala); third-party expression libraries bridge via a
  * shim in this package. Contains no Spark logic — just visibility.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
