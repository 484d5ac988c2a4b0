package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Catalyst Expression bridge.
  *
  * Spark 4 scoped the classic `Column(expr)` constructors `private[sql]`
  * behind the connect/classic split; third-party native expressions still
  * need the hop, so this shim lives in the sql package — the standard
  * pattern for Spark-native extension libraries.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
