package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** G15: WAREHOUSE IO over JDBC — the engine-side analog of the reference's
  * warehouse round-trip (gcp_getbigquery.py `read_gbq` /
  * gcp_savebigquery.py `to_gbq`): load a warehouse table into the engine,
  * push results back, with the warehouse doing what warehouses are good at
  * (serving filtered slices) and Spark doing the rest.
  *
  * Spark-first shape:
  *   - [[load]]/[[save]] are thin `spark.read.jdbc` / `df.write.jdbc`
  *     declarations — the scan is a real DataSource relation, so Catalyst
  *     PUSHES filters and column pruning into the warehouse's SQL (the
  *     spec asserts `PushedFilters` on the physical scan), exactly what
  *     `read_gbq(query=...)` does by hand;
  *   - [[loadPartitioned]] is the 100 TB extraction pattern: N executors
  *     each issue a bounded-range query (`partitionColumn` + stride), so a
  *     big table arrives as N parallel streams instead of one driver-bound
  *     cursor — the reason warehouse connectors beat single-connection
  *     dumps at scale.
  *
  * Verified offline against embedded Apache Derby (the one JDBC engine on
  * this container's classpath — /opt/spark/jars/derby-10.16.1.1.jar); the
  * API takes any JDBC URL, and in deployment the same calls address a
  * network warehouse endpoint (embedded Derby lives in the driver JVM, so
  * executor-side reads only work in local mode — a test-harness property,
  * not a component one).
  */
object JdbcWarehouse {

  /** Column-type overrides for engines whose default string mapping is
    * unqueryable (Derby maps StringType to CLOB, which its own `=` and
    * GROUP BY reject) — the `createTableColumnTypes` writer option. */
  def save(df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.Overwrite,
      columnTypes: Option[String] = None): Unit = {
    val w = df.write.mode(mode)
    columnTypes.foldLeft(w)((w, t) => w.option("createTableColumnTypes", t))
      .jdbc(url, table, new Properties)
  }

  /** One-connection load: right for dimension-sized tables; filters and
    * projections still push down into the warehouse query. */
  def load(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.jdbc(url, table, new Properties)

  /** N-connection parallel load over a numeric partition column: each task
    * issues `WHERE partCol BETWEEN lo AND hi` for its stride — the scan
    * arrives pre-partitioned, no post-read repartition needed. */
  def loadPartitioned(spark: SparkSession, url: String, table: String,
      partCol: String, lower: Long, upper: Long, numPartitions: Int): DataFrame =
    spark.read.jdbc(url, table, partCol, lower, upper, numPartitions, new Properties)
}
