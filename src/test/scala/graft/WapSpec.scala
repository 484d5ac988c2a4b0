package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.Wap

/** G8: write–audit–publish — failed audits must leave the live table
  * byte-untouched; successful publishes must be complete swaps.
  */
class WapSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").resolve("t").toString

  private def readIds(dir: String): Set[Long] =
    spark.read.parquet(dir).select("o_orderkey").collect().map(_.getLong(0)).toSet

  test("G8 publishes audited data and replaces the previous version completely") {
    val dir = tmp("wap")
    val orders = Tables.orders(spark, sfDir)
    val v1 = orders.filter(col("o_orderkey") % 2 === 0)
    Wap.writeAuditPublish(v1, dir,
      invariants = Seq("positive_price" -> (col("o_totalprice") > 0)))
    assert(readIds(dir) == v1.select("o_orderkey").collect().map(_.getLong(0)).toSet)

    // second publish fully replaces the first (no stale files linger)
    val v2 = orders.filter(col("o_orderkey") % 2 === 1)
    Wap.writeAuditPublish(v2, dir, expectRows = Some(v2.count()))
    assert(readIds(dir) == v2.select("o_orderkey").collect().map(_.getLong(0)).toSet)
    // no staging/retired leftovers
    val parent = Paths.get(dir).getParent
    assert(!Files.list(parent).iterator().hasNext == false &&
      Files.list(parent).filter(p => p.getFileName.toString.contains("staging")
        || p.getFileName.toString.contains("retired")).count() == 0)
  }

  test("G8 failed audit leaves the live table untouched and cleans staging") {
    val dir = tmp("wap_fail")
    val orders = Tables.orders(spark, sfDir)
    Wap.writeAuditPublish(orders, dir)
    val before = readIds(dir)

    // an invariant violation: totalprice > 1e9 holds for no row
    val bad = intercept[Wap.AuditFailure] {
      Wap.writeAuditPublish(orders, dir,
        invariants = Seq("impossible" -> (col("o_totalprice") > 1e9)))
    }
    assert(bad.getMessage.contains("impossible"))
    assert(readIds(dir) == before, "live table must be untouched after a failed audit")

    // a row-count mismatch is also rejected
    intercept[Wap.AuditFailure] {
      Wap.writeAuditPublish(orders, dir, expectRows = Some(1L))
    }
    assert(readIds(dir) == before)
    // staging cleaned up both times
    val parent = Paths.get(dir).getParent
    assert(Files.list(parent).filter(p => p.getFileName.toString.contains("staging")).count() == 0)

    // NULL predicate results count as violations, not silent passes
    intercept[Wap.AuditFailure] {
      Wap.writeAuditPublish(
        orders.withColumn("maybe", when(col("o_orderkey") % 10 === 0, col("o_totalprice"))),
        dir, invariants = Seq("maybe_set" -> col("maybe").isNotNull))
    }
    assert(readIds(dir) == before)
  }
}
