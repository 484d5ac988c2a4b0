package graft

import graft.operators.BroadcastGuard
import org.apache.spark.sql.DataFrame

/** The size-guarded dim broadcast (VERDICT r7 item 2): the hint must attach
  * when the dim fits the session's auto-broadcast threshold and must YIELD to
  * the planner when it does not — a forced broadcast of a scale-grown dim is
  * an executor OOM, not a plan choice. */
class BroadcastGuardSpec extends SparkSpec {

  private def withThreshold[A](v: String)(f: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    spark.conf.set(key, v)
    try f finally spark.conf.set(key, saved)
  }

  private def hinted(df: DataFrame): Boolean =
    df.queryExecution.analyzed.toString.contains("ResolvedHint")

  test("dim under the threshold gets the broadcast hint") {
    val part = Tables.part(spark, sfDir) // sf0.001: a few hundred rows
    assert(BroadcastGuard.estimatedBytes(part) > 0)
    assert(hinted(BroadcastGuard.dimBroadcast(part)))
  }

  test("dim over the threshold is returned unhinted — planner/AQE decide") {
    // Simulate the 100×-grown dim by dropping the threshold below the dim's
    // size instead of inflating data: the guard only compares the two.
    withThreshold("1KB") {
      val part = Tables.part(spark, sfDir)
      assert(BroadcastGuard.estimatedBytes(part) > 1024)
      assert(!hinted(BroadcastGuard.dimBroadcast(part)))
    }
  }

  test("auto-broadcast disabled (-1) never forces a broadcast") {
    withThreshold("-1") {
      assert(!hinted(BroadcastGuard.dimBroadcast(Tables.part(spark, sfDir))))
    }
  }

  test("q03 keeps its BroadcastHashJoin on partkey at test scale") {
    spark.sharedState.cacheManager.clearCache()
    val p = SparkEntry.queries("q03_fact_royalty")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"plan:\n$p")
  }

  test("q03 under a tiny threshold plans the part join without a forced broadcast") {
    withThreshold("1KB") {
      spark.sharedState.cacheManager.clearCache()
      val p = SparkEntry.queries("q03_fact_royalty")(spark, sfDir)
        .queryExecution.executedPlan.toString
      // The guard is per-dim: the partkey join must now come in through a
      // shuffle join (truly fixed dims elsewhere may still broadcast).
      assert(p.linesIterator.exists(l =>
          (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")) && l.contains("p_partkey")),
        s"partkey join must shuffle under a 1KB threshold; plan:\n$p")
      assert(!p.linesIterator.exists(l =>
          l.contains("BroadcastHashJoin") && l.contains("p_partkey")),
        s"partkey join must not be a forced broadcast; plan:\n$p")
    }
  }
}
