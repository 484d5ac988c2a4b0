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

  // ---- config-object entry points: endpoint + credentials arrive through
  // ---- ONE injected seam instead of bare strings at every call site.

  def save(df: DataFrame, cfg: WarehouseConfig, table: String): Unit =
    save(df, cfg, table, SaveMode.Overwrite)

  def save(df: DataFrame, cfg: WarehouseConfig, table: String, mode: SaveMode): Unit = {
    val w = df.write.mode(mode)
    cfg.columnTypes.foldLeft(w)((w, t) => w.option("createTableColumnTypes", t))
      .jdbc(cfg.url, table, cfg.connectionProperties)
  }

  def load(spark: SparkSession, cfg: WarehouseConfig, table: String): DataFrame =
    spark.read.jdbc(cfg.url, table, cfg.connectionProperties)

  def loadPartitioned(spark: SparkSession, cfg: WarehouseConfig, table: String,
      partCol: String, lower: Long, upper: Long, numPartitions: Int): DataFrame =
    spark.read.jdbc(cfg.url, table, partCol, lower, upper, numPartitions,
      cfg.connectionProperties)
}

/** Warehouse endpoint configuration — the engine-side analog of the
  * reference's centralized secret fetch (gcp_getsecrets.py: every notebook
  * calls one helper that returns credentials by name; none embeds them).
  * Here the names come from the process environment or a Properties bag —
  * standard JVM configuration surfaces, no proprietary secret-manager API —
  * and the rest of G15 takes the config OBJECT, so a deployment swaps
  * endpoints/credentials without touching any call site.
  *
  * @param url         JDBC URL of the warehouse endpoint
  * @param props       connection properties (user, password, ssl, …)
  * @param columnTypes `createTableColumnTypes` writer override (engine
  *                    dialect quirks — see [[JdbcWarehouse.save]])
  */
final case class WarehouseConfig(
    url: String,
    props: Map[String, String] = Map.empty,
    columnTypes: Option[String] = None) {
  def connectionProperties: Properties = {
    val p = new Properties
    props.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }
}

/** The pluggable CREDENTIAL-PROVIDER seam — the public-knowledge analog of
  * the reference's secret-manager pull (gcp_getsecrets.py: one
  * `get_gcp_secret(name)` helper every notebook calls; no credential ever
  * appears in code, and dw2_wc_increment.py:24 fetches its API key through
  * it). Implementations wrap a real secret manager (Vault, cloud secret
  * stores, a keystore file); the engine only ever sees the returned
  * property map. Must have a public zero-arg constructor —
  * [[WarehouseConfig.fromSparkConf]] instantiates it reflectively from a
  * Spark conf key, so a deployment swaps secret backends by configuration
  * alone, never by touching a call site. */
trait CredentialProvider {
  /** Connection properties (user, password, ssl, …) for a named endpoint. */
  def credentials(endpoint: String): Map[String, String]
}

object WarehouseConfig {

  /** The conf key naming the [[CredentialProvider]] implementation class. */
  val ProviderConfKey = "spark.graft.warehouse.credentialProvider"

  /** Spark-conf-driven assembly — the deployment surface where NOTHING
    * secret lives in code or plain conf: non-secret endpoint facts come
    * from `spark.graft.warehouse.<endpoint>.url` / `.columnTypes`, and the
    * credentials come from the [[CredentialProvider]] named by
    * [[ProviderConfKey]] (instantiated reflectively, called with the
    * endpoint name). With no provider configured the config carries only
    * the non-secret conf — right for auth-less endpoints (embedded test
    * engines), loud the moment a real warehouse rejects the connection. */
  def fromSparkConf(spark: SparkSession, endpoint: String): WarehouseConfig = {
    val url = spark.conf.getOption(s"spark.graft.warehouse.$endpoint.url")
      .getOrElse(throw new IllegalArgumentException(
        s"spark.graft.warehouse.$endpoint.url is not set"))
    val secrets = spark.conf.getOption(ProviderConfKey).map { cls =>
      Class.forName(cls).getDeclaredConstructor().newInstance() match {
        case p: CredentialProvider => p.credentials(endpoint)
        case other => throw new IllegalArgumentException(
          s"$ProviderConfKey: ${other.getClass.getName} does not implement " +
            "graft.sources.CredentialProvider")
      }
    }.getOrElse(Map.empty)
    WarehouseConfig(url, secrets,
      spark.conf.getOption(s"spark.graft.warehouse.$endpoint.columnTypes"))
  }

  /** Environment-variable names (the container-orchestration surface):
    * `GRAFT_WAREHOUSE_URL` (required), `GRAFT_WAREHOUSE_COLUMN_TYPES`
    * (optional), and `GRAFT_WAREHOUSE_PROP_<NAME>` for each connection
    * property — `<NAME>` is lowercased (JDBC property names `user`,
    * `password`, …). Pass a map in tests; defaults to the real env. */
  def fromEnv(env: Map[String, String] = sys.env): WarehouseConfig = {
    val url = env.getOrElse("GRAFT_WAREHOUSE_URL",
      throw new IllegalArgumentException("GRAFT_WAREHOUSE_URL is not set"))
    val propPrefix = "GRAFT_WAREHOUSE_PROP_"
    val props = env.collect {
      case (k, v) if k.startsWith(propPrefix) =>
        k.stripPrefix(propPrefix).toLowerCase -> v
    }
    WarehouseConfig(url, props, env.get("GRAFT_WAREHOUSE_COLUMN_TYPES"))
  }

  /** Properties-file surface (`-D`/`.properties` deployments): keys
    * `warehouse.url`, `warehouse.columnTypes`, `warehouse.prop.<name>`. */
  def fromProperties(p: Properties): WarehouseConfig = {
    val url = Option(p.getProperty("warehouse.url")).getOrElse(
      throw new IllegalArgumentException("warehouse.url is not set"))
    import scala.jdk.CollectionConverters._
    val propPrefix = "warehouse.prop."
    val props = p.stringPropertyNames.asScala.collect {
      case k if k.startsWith(propPrefix) =>
        k.stripPrefix(propPrefix) -> p.getProperty(k)
    }.toMap
    WarehouseConfig(url, props, Option(p.getProperty("warehouse.columnTypes")))
  }
}
