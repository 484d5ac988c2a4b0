package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.sources.{JdbcWarehouse, WarehouseConfig}

/** G15: warehouse IO over JDBC, verified against embedded Derby (the one
  * JDBC engine available offline). Round-trip fidelity, parallel bounded
  * reads, filter pushdown into the warehouse scan, and append semantics.
  */
class JdbcWarehouseSpec extends SparkSpec {

  private lazy val url = {
    val dir = Files.createTempDirectory("graft-derby").toString
    s"jdbc:derby:$dir/wh;create=true"
  }

  // Derby: StringType defaults to CLOB, which Derby's own equality/grouping
  // reject — override to VARCHAR at create time (the documented seam).
  private val orderTypes =
    "o_orderstatus VARCHAR(8), o_orderpriority VARCHAR(24)"

  private lazy val orders = Tables.orders(spark, sfDir).localCheckpoint()

  test("G15 save + load round-trips rows and schema exactly") {
    JdbcWarehouse.save(orders, url, "orders_rt", columnTypes = Some(orderTypes))
    val back = JdbcWarehouse.load(spark, url, "orders_rt")
    assert(back.columns.sorted.sameElements(orders.columns.sorted))
    assert(back.count() == orders.count())
    val a = back.select(orders.columns.map(col).toSeq: _*)
    assert(a.exceptAll(orders).isEmpty && orders.exceptAll(a).isEmpty)
  }

  test("G15 partitioned load arrives as N parallel bounded scans") {
    JdbcWarehouse.save(orders, url, "orders_part", columnTypes = Some(orderTypes))
    val r = orders.agg(min("o_orderkey"), max("o_orderkey")).head()
    val part = JdbcWarehouse.loadPartitioned(spark, url, "orders_part",
      "o_orderkey", r.getLong(0), r.getLong(1), numPartitions = 4)
    assert(part.rdd.getNumPartitions == 4, "extraction must be 4 parallel streams")
    assert(part.count() == orders.count())
    // strides are disjoint and complete: no row lost or duplicated
    assert(part.groupBy("o_orderkey").count().filter(col("count") > 1).isEmpty)
  }

  test("G15 filters and projection push into the warehouse query") {
    JdbcWarehouse.save(orders, url, "orders_push", columnTypes = Some(orderTypes))
    val q = JdbcWarehouse.load(spark, url, "orders_push")
      .filter(col("o_totalprice") > 100000.0)
      .select("o_orderkey", "o_totalprice")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_totalprice"),
      s"filter must reach the JDBC scan:\n$plan")
    // and the pushed scan returns exactly what an in-engine filter would
    val want = orders.filter(col("o_totalprice") > 100000.0)
      .select("o_orderkey", "o_totalprice")
    assert(q.exceptAll(want).isEmpty && want.exceptAll(q).isEmpty)
  }

  test("G15 WarehouseConfig from env/Properties drives the same round-trip") {
    // the gcp_getsecrets.py analog: endpoint + credentials arrive by NAME
    // through standard surfaces; no call site embeds a bare URL.
    val env = Map(
      "GRAFT_WAREHOUSE_URL" -> url,
      "GRAFT_WAREHOUSE_COLUMN_TYPES" -> orderTypes,
      "GRAFT_WAREHOUSE_PROP_USER" -> "app",
      "UNRELATED" -> "ignored")
    val cfg = WarehouseConfig.fromEnv(env)
    assert(cfg.url == url && cfg.columnTypes.contains(orderTypes))
    assert(cfg.props == Map("user" -> "app"))
    assert(cfg.connectionProperties.getProperty("user") == "app")
    // Derby's embedded driver accepts any user — what matters is that the
    // property OBJECT flows through to the connector on both paths.
    JdbcWarehouse.save(orders, cfg, "orders_cfg")
    val back = JdbcWarehouse.load(spark, cfg, "orders_cfg")
    assert(back.count() == orders.count())
    val a = back.select(orders.columns.map(col).toSeq: _*)
    assert(a.exceptAll(orders).isEmpty && orders.exceptAll(a).isEmpty)

    // the .properties surface builds the identical config
    val p = new java.util.Properties
    p.setProperty("warehouse.url", url)
    p.setProperty("warehouse.columnTypes", orderTypes)
    p.setProperty("warehouse.prop.user", "app")
    assert(WarehouseConfig.fromProperties(p) == cfg)

    // a missing endpoint fails loudly, naming the variable
    val ex = intercept[IllegalArgumentException] { WarehouseConfig.fromEnv(Map.empty) }
    assert(ex.getMessage.contains("GRAFT_WAREHOUSE_URL"))
  }

  test("G15 partitioned load through the config object") {
    val cfg = WarehouseConfig(url, columnTypes = Some(orderTypes))
    JdbcWarehouse.save(orders, cfg, "orders_cfg_part")
    val r = orders.agg(min("o_orderkey"), max("o_orderkey")).head()
    val part = JdbcWarehouse.loadPartitioned(spark, cfg, "orders_cfg_part",
      "o_orderkey", r.getLong(0), r.getLong(1), numPartitions = 4)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == orders.count())
  }

  test("G15 append mode accumulates increments warehouse-side") {
    val first = orders.filter(col("o_orderkey") % 2 === 0)
    val second = orders.filter(col("o_orderkey") % 2 === 1)
    JdbcWarehouse.save(first, url, "orders_inc", columnTypes = Some(orderTypes))
    JdbcWarehouse.save(second, url, "orders_inc", mode = SaveMode.Append)
    assert(JdbcWarehouse.load(spark, url, "orders_inc").count() == orders.count())
  }
}
