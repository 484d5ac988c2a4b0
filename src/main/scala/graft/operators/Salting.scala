package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Skew-salted equi-join (SURVEY §5).
  *
  * AQE's skew-join split handles most sort-merge skew at runtime, but it
  * cannot split a single hot KEY GROUP that must land in one task of a
  * shuffled hash aggregation or shuffled join build. Salting can: the fact
  * side spreads each key's rows across `buckets` sub-keys with a
  * deterministic hash of a discriminator column, and the other side is
  * replicated once per bucket — turning one straggler task into `buckets`
  * even ones at the cost of a bounded (`buckets`×) duplication of the small
  * side. Exact same join result, re-balanced shuffle.
  *
  * Reference analog: the reference merges its increment into the archive on
  * a synthetic order-item key (dw3_merge_inc.py); at warehouse scale a
  * campaign day makes single order keys hot — exactly this shape.
  */
object Salting {

  /** Inner equi-join of `big` (skewed) with `small` on `key`, spreading each
    * of big's key groups over `buckets` salt values derived from
    * `discriminator` (any roughly-uniform column of the big side, e.g. a line
    * number or row id). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 discriminator: String, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val salted = big.withColumn("__salt", pmod(hash(col(discriminator)), lit(buckets)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    // Salting exists to rebalance a SHUFFLE: pin the shuffle-hash path so
    // the planner cannot "helpfully" broadcast the buckets×-replicated side
    // (measured: it did, turning the demonstration into a buckets×-bigger
    // broadcast with no shuffle left to rebalance — and at real scale the
    // replicated side wouldn't fit a broadcast anyway).
    salted.join(replicated.hint("shuffle_hash"), Seq(key, "__salt")).drop("__salt")
  }

  /** Salted aggregation: two-phase groupBy for a skewed grouping key. Phase 1
    * aggregates (key, salt) partials; phase 2 combines per key. Caller
    * supplies partial and final aggregate expression builders that must
    * compose (sum/sum, count/sum, min/min, ...). */
  def saltedSum(df: DataFrame, key: String, discriminator: String,
                valueCol: String, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    df.withColumn("__salt", pmod(hash(col(discriminator)), lit(buckets)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }

  // ---------------------------------------------------------------- A39
  /** Skew-salted join, RESULT-PROVED: revenue by order priority computed
    * through [[saltedJoin]] (8 salt buckets on the line number), oracled
    * against the plain join — the driver's hash compare is the cross-engine
    * proof that salting changes the shuffle layout and nothing else. The
    * money sum goes through integer cents ([[graft.functions.Exact]]) so
    * the 8-way re-bucketing cannot perturb a float total.
    *
    * Scale: this is the de-skew tool for the one case AQE cannot fix — a
    * single hot key group that must co-locate in one task. Cost model in
    * the [[saltedJoin]] scaladoc; SaltingSpec holds the plan-level
    * equivalence and the salt-distribution properties. */
  val q39 = Q(
    "q39_salted_join",
    s"""SELECT o.o_orderpriority,
      |  CAST(COUNT(*) AS BIGINT) AS n_lines,
      |  ${graft.functions.Exact.sqlSumCents("l.l_extendedprice")} AS revenue
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |GROUP BY o.o_orderpriority""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val ords = Tables.orders(s, d)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    saltedJoin(li, ords, "l_orderkey", "l_linenumber", buckets = 8)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        graft.functions.Exact.sumCents(col("l_extendedprice")).as("revenue"))
  }

  /** Key-skew profile of a relation — the measurement HALF of the salting
    * decision (q39 is the mechanism): per key, its row count, integer-ppm
    * share, and whether a `nPart`-way shuffle would make it a straggler
    * (cnt·nPart > 4·total — the key's single task carrying over 4× the
    * average partition's rows; integer spelling, no float). Top-N by count
    * via orderBy+limit, which Spark plans as TakeOrderedAndProject — a
    * per-partition top-N plus one driver merge, NEVER a global sort of
    * the key distribution (|keys|-sized at 100 TB); the rank window runs
    * over the N surviving rows only. */
  private[graft] def skewProfile(rows: DataFrame, key: String,
      nPart: Int, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = rows.groupBy(col(key).as("key")).agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).as("total"))
    val top = counts.orderBy(col("cnt").desc, col("key")).limit(topN)
    top.crossJoin(broadcast(tot))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("key"))).cast("long"))
      .select(col("key"), col("cnt"),
        expr("cnt * 1000000 div total").as("share_ppm"),
        (col("cnt") * nPart > col("total") * 4).as("needs_salting"),
        col("rank"))
  }

  // ---------------------------------------------------------------- A55
  /** Join-key SKEW profiler — the operational table that decides when q39's
    * salting is worth its replication cost, before a straggler decides it
    * for you: the 20 heaviest customer keys in orders with count, ppm
    * share, and the integer straggler test at the engine's 32-partition
    * shuffle width. In deployment this runs over yesterday's fact keys and
    * feeds the salting allow-list; the brief's "campaign day makes single
    * keys hot" is exactly what this table surfaces the morning it starts. */
  val q55 = Q(
    "q55_skew_profile",
    """WITH c AS (SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
      |           FROM orders GROUP BY o_custkey),
      |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM c),
      |r AS (SELECT key, cnt, CAST(row_number() OVER (ORDER BY cnt DESC, key) AS BIGINT) AS rank FROM c)
      |SELECT r.key, r.cnt,
      |  CAST(r.cnt * 1000000 // t.total AS BIGINT) AS share_ppm,
      |  r.cnt * 32 > t.total * 4 AS needs_salting,
      |  r.rank
      |FROM r CROSS JOIN t WHERE r.rank <= 20""".stripMargin) { (s, d) =>
    skewProfile(Tables.orders(s, d), "o_custkey", nPart = 32, topN = 20)
  }

  val queries: Seq[Q] = Seq(q39, q55)
}
