package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge for custom Catalyst expressions.
  * `classic.ExpressionUtils` and `SparkSession.sessionState` are
  * `private[sql]` in Spark 4; the conventional extension-library pattern
  * (used by public projects such as frameless/deequ) is a small adapter
  * object inside the `org.apache.spark.sql` package. Nothing here
  * touches internals beyond those two accessors.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def functionRegistry(spark: SparkSession): FunctionRegistry =
    spark.sessionState.functionRegistry
}
