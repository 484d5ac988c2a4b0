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

  val queries: Seq[Q] = Seq(q39)
}
