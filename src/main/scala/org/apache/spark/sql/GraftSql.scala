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

  /** Register a function builder into a LIVE session's registry (the
    * extensions path only applies at session construction). */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")

  /** An injectFunction-shaped description for [[SparkSessionExtensions]]. */
  def functionDescription(name: String, builder: Seq[Expression] => Expression)
      : (org.apache.spark.sql.catalyst.FunctionIdentifier,
         org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
         Seq[Expression] => Expression) =
    (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft.expr", name),
      builder)
}
