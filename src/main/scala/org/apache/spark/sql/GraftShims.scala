package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Column <-> Expression bridge. Spark 4 made this conversion
 * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`); custom
 * native expressions still need it to be exposed as `Column`s, so this
 * shim re-exports the two functions from inside the package.
 */
object GraftShims {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
