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

  /** DataFrame over an analyzed/analyzable logical plan — the hop a custom
    * physical command needs to run its child relation (classic
    * `Dataset.ofRows` is `private[sql]`). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Register graft's SQL functions on an ALREADY-BUILT session (e.g. one
    * handed over by a driver that did not pass spark.sql.extensions). */
  def registerFunctions(
      spark: SparkSession,
      fns: Seq[(org.apache.spark.sql.catalyst.FunctionIdentifier,
                org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                Seq[Expression] => Expression)]): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    fns.foreach { case (id, info, builder) => registry.registerFunction(id, info, builder) }
  }
}
