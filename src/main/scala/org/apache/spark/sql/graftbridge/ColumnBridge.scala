package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal visibility bridge: `ExpressionUtils` is `private[sql]`, so the
  * Column ⇄ catalyst-Expression conversions needed to expose custom expressions
  * through the public Column API are re-exported from inside the sql package
  * tree. No behavior of Spark is modified. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Runtime function registration on an EXISTING session (the
    * `spark.sql.extensions` config path only applies at session creation). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
                       name: String,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
