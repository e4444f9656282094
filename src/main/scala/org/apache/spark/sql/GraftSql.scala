package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column <-> Expression conversions, so graft's
  * native Catalyst expressions (codegen'd kernels) can be exposed through
  * the public Column API. Standard pattern for Spark extension libraries:
  * one tiny object in the `org.apache.spark.sql` package, nothing else.
  */
object GraftSql {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
