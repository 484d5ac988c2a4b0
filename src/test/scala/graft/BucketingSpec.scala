package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Bucketing

/** Bucketed co-located join: result-identical to the plain join and planned
  * with zero shuffle exchanges. */
class BucketingSpec extends SparkSpec {

  test("same-bucketed fact join plans without exchanges and matches plain join") {
    val base = Files.createTempDirectory("graft-bucket").toString
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("order_key"), col("l_linenumber"), col("l_quantity"))
    val ords = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("order_key"), col("o_orderstatus"))

    spark.sql("DROP TABLE IF EXISTS graft_li_b")
    spark.sql("DROP TABLE IF EXISTS graft_ord_b")
    Bucketing.writeBucketed(li, "graft_li_b", "order_key", 8, s"$base/li")
    Bucketing.writeBucketed(ords, "graft_ord_b", "order_key", 8, s"$base/ord")
    try {
      // Force the shuffle-sensitive join path (no broadcast) to prove the
      // bucket layout alone satisfies the join's distribution requirement.
      val joined = spark.table("graft_li_b")
        .join(spark.table("graft_ord_b").hint("merge"), "order_key")

      val planStr = joined.queryExecution.executedPlan.toString
      assert(!planStr.contains("Exchange"),
        s"bucketed join must not shuffle; plan:\n$planStr")

      val expected = li.join(ords, "order_key")
        .agg(count(lit(1)), sum("l_quantity")).head
      val got = joined.agg(count(lit(1)), sum("l_quantity")).head
      assert(got.getLong(0) == expected.getLong(0))
      assert(math.abs(got.getDouble(1) - expected.getDouble(1)) < 1e-6)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_li_b")
      spark.sql("DROP TABLE IF EXISTS graft_ord_b")
    }
  }
}
