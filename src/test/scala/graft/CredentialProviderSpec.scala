package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{CredentialProvider, JdbcWarehouse, WarehouseConfig}

/** A stub secret backend: what a deployment's Vault/cloud-secret wrapper
  * looks like from the engine's side. Public zero-arg constructor — the
  * reflective instantiation contract. Records the endpoints it served so
  * the spec can prove the engine asked the PROVIDER, not a plaintext
  * source. */
class StubCredentialProvider extends CredentialProvider {
  override def credentials(endpoint: String): Map[String, String] = {
    StubCredentialProvider.served.add(endpoint)
    Map("user" -> s"svc_$endpoint", "password" -> "s3cret")
  }
}
object StubCredentialProvider {
  val served = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
}

/** G15's credential seam (VERDICT r10 #7): the reference pulls warehouse
  * credentials through one secret-manager helper (gcp_getsecrets.py;
  * dw2_wc_increment.py:24) — the engine's analog is a conf-named
  * [[CredentialProvider]]: non-secret endpoint facts in Spark conf,
  * secrets only ever in the provider's return value, call sites unchanged.
  */
class CredentialProviderSpec extends SparkSpec {

  test("conf-named provider supplies credentials; no secret in conf or code") {
    val dir = Files.createTempDirectory("graft-derby-cred").toString
    val url = s"jdbc:derby:$dir/wh;create=true"
    spark.conf.set("spark.graft.warehouse.sales.url", url)
    spark.conf.set(WarehouseConfig.ProviderConfKey,
      classOf[StubCredentialProvider].getName)
    try {
      val cfg = WarehouseConfig.fromSparkConf(spark, "sales")
      assert(cfg.url == url)
      assert(cfg.props == Map("user" -> "svc_sales", "password" -> "s3cret"),
        "credentials come from the provider, keyed by endpoint name")
      assert(StubCredentialProvider.served.contains("sales"))
      assert(!cfg.url.contains("s3cret"), "the URL carries no secret")

      // the config drives real IO (embedded Derby accepts any credentials
      // without auth config — the properties ride the connection untouched)
      val df = spark.range(1, 11).select(col("id").as("k"),
        (col("id") * 2).as("v"))
      JdbcWarehouse.save(df, cfg, "cred_rt")
      val back = JdbcWarehouse.load(spark, cfg, "cred_rt")
      assert(back.count() == 10L)
    } finally {
      spark.conf.unset("spark.graft.warehouse.sales.url")
      spark.conf.unset(WarehouseConfig.ProviderConfKey)
    }
  }

  test("a missing url and a non-provider class fail loudly") {
    val e = intercept[IllegalArgumentException] {
      WarehouseConfig.fromSparkConf(spark, "absent")
    }
    assert(e.getMessage.contains("spark.graft.warehouse.absent.url"))

    spark.conf.set("spark.graft.warehouse.bad.url", "jdbc:derby:memory:x")
    spark.conf.set(WarehouseConfig.ProviderConfKey, "java.lang.String")
    try {
      val e2 = intercept[IllegalArgumentException] {
        WarehouseConfig.fromSparkConf(spark, "bad")
      }
      assert(e2.getMessage.contains("does not implement"))
    } finally {
      spark.conf.unset("spark.graft.warehouse.bad.url")
      spark.conf.unset(WarehouseConfig.ProviderConfKey)
    }
  }
}
