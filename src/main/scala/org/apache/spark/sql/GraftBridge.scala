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

  /** StructType ↔ DSv2 Column conversions for a custom `TableCatalog`
    * (`CatalogV2Util` is `private[sql]` — same shim rationale as above). */
  def structTypeToV2Columns(schema: org.apache.spark.sql.types.StructType)
      : Array[org.apache.spark.sql.connector.catalog.Column] =
    org.apache.spark.sql.connector.catalog.CatalogV2Util.structTypeToV2Columns(schema)
  def v2ColumnsToStructType(cols: Array[org.apache.spark.sql.connector.catalog.Column])
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.connector.catalog.CatalogV2Util.v2ColumnsToStructType(cols)

  /** A DSv2 connector `Literal` holding a Catalyst-internal value — the
    * shape `ColumnDefaultValue` wants (the `LiteralValue` companion is
    * `private[sql]`). */
  def v2Literal(value: Any, dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.connector.expressions.Literal[_] =
    org.apache.spark.sql.connector.expressions.LiteralValue(value, dt)

  /** DataFrame over an analyzed/analyzable logical plan — the hop a custom
    * physical command needs to run its child relation (classic
    * `Dataset.ofRows` is `private[sql]`). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Re-tag a batch frame's rows as a STREAMING batch — the hop a
    * DataSource-V1 streaming [[org.apache.spark.sql.execution.streaming.Source]]
    * needs: `MicroBatchExecution` asserts `getBatch`'s result is streaming,
    * and the blessed spelling (`internalCreateDataFrame(…, isStreaming =
    * true)`, what MemoryStream/FileStreamSource do) is `private[sql]`. */
  def asStreaming(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    spark.internalCreateDataFrame(df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse hop for a DataSource-V1 streaming
    * [[org.apache.spark.sql.execution.streaming.Sink]]: `addBatch` receives
    * a frame whose logical plan still carries streaming-tagged leaves, so
    * any new action on it trips the streaming-query checker. Re-plan the
    * already-executed rows as a plain batch frame — exactly what Spark's
    * own `ForeachBatchSink` does before handing the user their batch. */
  def asBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    spark.internalCreateDataFrame(df.queryExecution.toRdd, df.schema, isStreaming = false)
  }

  /** The resolved checkpoint root of the streaming query executing on the
    * CURRENT thread (a v1 `Sink.addBatch` runs on its query's execution
    * thread). This is the seam a v1 fallback sink needs when the
    * checkpoint came from the session-wide
    * `spark.sql.streaming.checkpointLocation` conf: Spark resolves the
    * final checkpoint AFTER `createSink`, so it never appears in the sink
    * options map — but the running `StreamExecution` knows it. */
  def currentStreamCheckpoint(spark: SparkSession): Option[String] = {
    val t = Thread.currentThread()
    spark.streams.active.collectFirst {
      case w: org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper
          if w.streamingQuery.queryExecutionThread eq t =>
        w.streamingQuery.resolvedCheckpointRoot
    }
  }

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

/** Public re-export of the `private[sql]`
  * [[org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback]] seam —
  * the hook `DataStreamWriter.toTable` uses to route a catalog table
  * without `STREAMING_WRITE` onto its provider's v1 streaming sink
  * (`format(provider).option("path", location)`). Same shim rationale as
  * [[GraftBridge]]: a Spark-native extension library implementing the
  * catalog surface needs the hop. */
trait GraftV1FallbackTable
    extends org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback
