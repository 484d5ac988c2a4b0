package graft.operators

import org.apache.spark.network.util.JavaUtils
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-guarded broadcast hint for scale-coupled dimension tables.
  *
  * A bare `broadcast(dim)` pins the plan intent ("this is a dim, hash it to
  * every executor") but OVERRIDES the planner's size check uncondition-
  * ally — part/supplier grow with scale factor, and at 100× a forced
  * broadcast of a no-longer-small dim is an executor OOM, not a plan choice.
  * This helper keeps the intent where it is safe and defers to the planner
  * (including AQE's runtime re-plan) where it is not:
  *
  *  - dim's estimated size ≤ `spark.sql.autoBroadcastJoinThreshold` → attach
  *    the broadcast hint (deterministic plan, no dependence on the stats the
  *    planner happens to derive for the join input);
  *  - estimated size above the threshold, or auto-broadcast disabled
  *    (threshold ≤ 0) → return the frame unhinted, so the planner picks a
  *    sort-merge / shuffled-hash join, and AQE may still convert to
  *    broadcast at runtime if the REAL size turns out small.
  *
  * The estimate is the optimizer's own (`optimizedPlan.stats.sizeInBytes`,
  * file-size based for parquet scans), i.e. the same signal the planner
  * would use — the guard never claims better information, it only refuses
  * to overrule the threshold. Truly fixed-cardinality dims (region: 5 rows,
  * nation: 25) keep their bare `broadcast()` — they cannot scale-couple.
  */
object BroadcastGuard {

  /** `broadcast(dim)` iff the optimizer's size estimate is within the
    * session's auto-broadcast threshold; otherwise `dim` unhinted. */
  def dimBroadcast(dim: DataFrame): DataFrame = {
    val threshold = thresholdBytes(dim)
    if (threshold > 0 && estimatedBytes(dim) <= BigInt(threshold)) broadcast(dim)
    else dim
  }

  /** Session auto-broadcast threshold in bytes; ≤ 0 means disabled. */
  private[graft] def thresholdBytes(df: DataFrame): Long = {
    val raw = df.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    // conf accepts both byte-suffixed strings ("10MB") and plain longs
    // (including the -1 disable sentinel, which the suffix parser rejects).
    try JavaUtils.byteStringAsBytes(raw)
    catch { case _: NumberFormatException => raw.trim.toLong }
  }

  /** Optimizer size estimate for the frame (driver-side, metadata only). */
  private[graft] def estimatedBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes
}
