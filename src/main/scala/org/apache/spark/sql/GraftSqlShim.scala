package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the package-private Column <-> Expression converters —
  * the standard technique third-party Spark libraries use to register
  * native Catalyst expressions (Spark 4 hides the Column(expr)
  * constructor behind `private[sql]` classic.ExpressionUtils).
  */
object GraftSqlShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
