package graft

import org.apache.spark.sql.functions._
import graft.functions.Exact._

/** Conservation proof for q26: within every multi-line order ("bundle"), the
  * component shares sum to 1 and the attributed amounts sum back to the
  * bundle row's net total (within the 6-dp share / 4-dp money rounding the
  * query applies per row). */
class BundleConservationSpec extends SparkSpec {

  test("q26 attributed revenue conserves the bundle total per order") {
    val out = SparkEntry.queries("q26_bundle_attribution")(spark, sfDir)

    val attributed = out.filter(col("category") =!= "bundle")
      .groupBy("order_key")
      .agg(sum("attributed").as("attr_sum"),
        sum("share").as("share_sum"),
        count(lit(1)).as("n_components"))

    // Same dedup as the operator: the synthetic lineitem repeats
    // (orderkey, linenumber) pairs, so the parent row is MIN-deduped.
    val bundleTotals = Tables.lineitem(spark, sfDir)
      .filter(col("l_linenumber") === 1)
      .groupBy(col("l_orderkey").as("order_key"))
      .agg((min(micros(col("l_extendedprice") * (lit(1) - col("l_discount")))) / 1e6).as("bundle_total"))

    val joined = attributed.join(bundleTotals, Seq("order_key"))
      .select(col("order_key"), col("share_sum"), col("n_components"),
        abs(col("attr_sum") - col("bundle_total")).as("err"))
      .collect()

    assert(joined.nonEmpty, "test data must contain multi-line orders")
    joined.foreach { r =>
      val n = r.getAs[Long]("n_components")
      // Each of the n components rounds share to 6 dp and money to 4 dp:
      // worst-case drift is n * (5e-5 + total*5e-7) — bound generously.
      assert(math.abs(r.getAs[Double]("share_sum") - 1.0) <= n * 1e-6 + 1e-9,
        s"shares must sum to 1 for order ${r.getAs[Long]("order_key")}")
      assert(r.getAs[Double]("err") <= n * 0.01,
        s"attributed sum drifts from bundle total for order ${r.getAs[Long]("order_key")}: ${r.getAs[Double]("err")}")
    }

    // Bundle rows themselves must receive zero (the np.select guard).
    val bundleRows = out.filter(col("category") === "bundle")
      .agg(sum(abs(col("attributed"))).as("s")).head.getDouble(0)
    assert(bundleRows == 0.0)
  }
}
