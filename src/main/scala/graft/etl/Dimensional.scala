package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Dimensional-modeling operators beyond the reference's Type-1 dims
  * (SURVEY §2 A36/A37).
  *
  * The reference rebuilds its dimensions from scratch every run and keeps
  * only the latest attribute value per key (dw4_book_dim.py's Book_Dim /
  * Bundle_Dim are Type-1 overwrites). A warehouse that must answer "what was
  * this customer's segment WHEN the order was placed" needs the Type-2
  * history table instead — the standard Kimball SCD2 shape: one row per
  * (key, consecutive attribute state) with a validity interval and a
  * current-row flag. q36 is the from-scratch build; q37 is the production
  * path — applying an increment to an existing dimension without touching
  * unchanged keys — oracled against the full rebuild, so hash equality IS
  * the proof that the incremental merge loses nothing.
  */
object Dimensional {

  /** The SQL of the full SCD2 rebuild over the whole observation log —
    * q36's oracle, and (deliberately) q37's too. */
  private val rebuildSql =
    """WITH obs0 AS (
      |  SELECT o_custkey AS custkey, CAST(o_orderdate AS DATE) AS obs_date,
      |         o_orderpriority AS attr,
      |         row_number() OVER (PARTITION BY o_custkey, CAST(o_orderdate AS DATE)
      |                            ORDER BY o_orderkey DESC) AS rn
      |  FROM orders),
      |obs AS (SELECT custkey, obs_date, attr FROM obs0 WHERE rn = 1),
      |chg AS (SELECT custkey, obs_date, attr,
      |  CASE WHEN lag(attr) OVER (PARTITION BY custkey ORDER BY obs_date) IS NULL
      |         OR lag(attr) OVER (PARTITION BY custkey ORDER BY obs_date) <> attr
      |       THEN 1 ELSE 0 END AS is_chg
      |  FROM obs),
      |ver AS (SELECT custkey, obs_date, attr,
      |  SUM(is_chg) OVER (PARTITION BY custkey ORDER BY obs_date
      |                    ROWS UNBOUNDED PRECEDING) AS version
      |  FROM chg),
      |seg AS (SELECT custkey, attr, CAST(version AS BIGINT) AS version,
      |               MIN(obs_date) AS valid_from
      |        FROM ver GROUP BY custkey, attr, version),
      |fin AS (SELECT custkey, attr, version, valid_from,
      |  lead(valid_from) OVER (PARTITION BY custkey ORDER BY valid_from) AS valid_to
      |  FROM seg)
      |SELECT custkey, attr, version, valid_from, valid_to,
      |       valid_to IS NULL AS is_current
      |FROM fin""".stripMargin

  /** Day-level observation extract: the latest order of the day wins,
    * deterministically (max o_orderkey) — one row per (custkey, day). */
  private def dayObs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_custkey").as("custkey"), to_date(col("o_orderdate")).as("obs_date"))
      .agg(max_by(col("o_orderpriority"), col("o_orderkey")).as("attr"))

  /** The SCD2 core: (custkey, obs_date, attr) observations → versioned
    * validity intervals. All windows partition on the dimension key (high
    * cardinality, never a global sort); the run-collapse is a hash aggregate.
    * Shared verbatim by the full rebuild (q36) and the tail rebuild inside
    * the incremental apply (q37). */
  private[graft] def scd2(obs: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("custkey")).orderBy(col("obs_date"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wSeg = Window.partitionBy(col("custkey")).orderBy(col("valid_from"))
    // A run's valid_from IS its change-detection row's date, so keeping only
    // is_chg rows replaces the run-collapse groupBy (the oracle's `seg` CTE)
    // — one fewer shuffle, and every window stays on the custkey exchange.
    obs
      .withColumn("prev", lag(col("attr"), 1).over(wOrd))
      .withColumn("is_chg", when(col("prev").isNull || col("prev") =!= col("attr"), 1).otherwise(0))
      .withColumn("version", sum(col("is_chg")).over(wRun).cast("long"))
      .filter(col("is_chg") === 1)
      .withColumn("valid_from", col("obs_date"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wSeg))
      .select(col("custkey"), col("attr"), col("version"), col("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"))
  }

  // ---------------------------------------------------------------- A36
  /** SCD Type-2 dimension build from an observation log.
    *
    * Input: every order is an observation of its customer's priority class
    * on that date (latest order of the day wins, deterministically — max
    * o_orderkey). Output: one row per consecutive run of equal attribute
    * values per customer, with [valid_from, valid_to) date intervals,
    * a 1-based version number, and is_current on the open interval — the
    * table a point-in-time dimension join consumes.
    *
    * Scale: see [[scd2]]; at 100 TB the observation extract is the only
    * full-fact scan — everything after runs on the (much smaller)
    * one-row-per-(key, day) relation. */
  val q36 = Q("q36_scd2_dim", rebuildSql) { (s, d) => scd2(dayObs(s, d)) }

  // ---------------------------------------------------------------- A37
  /** INCREMENTAL SCD2 apply — the production upsert the reference's
    * anti-join merge (dw3_merge_inc.py:109-118) grows into once the
    * dimension keeps history: given the existing dimension table and a batch
    * of new observations, close the affected open intervals, append the new
    * runs, and leave every untouched key's rows byte-identical — WITHOUT
    * re-deriving history for unchanged keys.
    *
    * Mechanics: keys present in the increment are "touched". Each touched
    * key's open row is replayed as a pseudo-observation (its valid_from +
    * attr carry the whole collapsed run — only the run's min date matters),
    * unioned with the increment, and pushed through the SAME [[scd2]] core;
    * the resulting tail versions are offset by the key's prior version count
    * so numbering continues seamlessly. Closed rows of touched keys and all
    * rows of untouched keys pass through untouched.
    *
    * The ORACLE is the full rebuild over the complete log (q36's SQL,
    * verbatim): the driver's hash compare proves incremental == rebuild,
    * which is exactly the invariant an incremental dimension pipeline must
    * hold. Scale: every join is equi-keyed on custkey; the tail rebuild runs
    * only on touched keys (increment-sized, not history-sized); in
    * deployment the pass-through is a partition-pruned no-op of the stored
    * table, so the nightly cost tracks the increment. */
  val q37 = Q("q37_scd2_apply", rebuildSql) { (s, d) =>
    val all = dayObs(s, d)
    val cut = to_date(lit("1997-01-01"))
    // The "existing table" (history before the cut) and tonight's batch.
    val base = scd2(all.filter(col("obs_date") < cut)).localCheckpoint()
    applyIncrement(base, all.filter(col("obs_date") >= cut))
  }

  /** The incremental SCD2 merge (q37's core, factored so the streaming
    * dimension-maintenance sink reuses it batch by batch): touched keys get
    * a tail rebuild through [[scd2]] with version continuation, untouched
    * keys pass through byte-identical. `base` must be an scd2-shaped table;
    * `inc` a (custkey, obs_date, attr) batch with obs_date strictly after
    * the key's open valid_from. */
  private[graft] def applyIncrement(base: DataFrame, inc: DataFrame): DataFrame = {
    val touched = inc.select("custkey").distinct()
    val open = base.filter(col("is_current"))
      .join(touched, Seq("custkey"), "left_semi")
    val pseudo = open.select(col("custkey"), col("valid_from").as("obs_date"), col("attr"))
    // An increment row dated exactly at the open run's valid_from REPLACES
    // the replayed pseudo-observation (same-day re-observation / batch
    // replay); otherwise the two coexist at distinct dates and this dedup is
    // a no-op. Keyed hash aggregate over an increment-sized relation.
    val obs = pseudo.withColumn("pri", lit(0))
      .unionByName(inc.withColumn("pri", lit(1)))
      .groupBy("custkey", "obs_date")
      .agg(max_by(col("attr"), col("pri")).as("attr"))
    val tail = scd2(obs)
      .join(open.select(col("custkey"), (col("version") - 1).as("voff")), Seq("custkey"), "left")
      .withColumn("version", col("version") + coalesce(col("voff"), lit(0L)))
      .drop("voff")
      .select("custkey", "attr", "version", "valid_from", "valid_to", "is_current")
    val untouched = base.join(touched, Seq("custkey"), "left_anti")
    val closedTouched = base.filter(!col("is_current"))
      .join(touched, Seq("custkey"), "left_semi")
    untouched.unionByName(closedTouched).unionByName(tail)
  }

  // ---------------------------------------------------------------- A38
  /** POINT-IN-TIME dimension join — the query the SCD2 table exists to
    * answer: every fact row picks up the dimension attributes that were
    * valid WHEN the fact happened, not the latest ones. Each order joins
    * its customer's priority-class run whose [valid_from, valid_to)
    * interval covers the order date.
    *
    * Plan shape: equi-join on the dimension key with the interval bounds as
    * a residual condition — a hash join, never a range/cross join, because
    * custkey carries all the join selectivity and each key has few versions
    * (the per-key interval list is the small side of the residual scan). At
    * 100 TB the fact side shuffles once on custkey (or the dim broadcasts —
    * it is run-collapsed, orders of magnitude smaller than the fact); an
    * interval-covering match is guaranteed by construction since version 1
    * starts at the key's first observation. */
  val q38 = Q(
    "q38_pit_join",
    s"""WITH dim AS ($rebuildSql)
      |SELECT o.o_orderkey AS order_key, o.o_custkey AS custkey,
      |  CAST(o.o_orderdate AS DATE) AS order_date,
      |  d.attr AS priority_at_order, d.version, o.o_totalprice AS total_price
      |FROM orders o
      |JOIN dim d ON o.o_custkey = d.custkey
      |  AND CAST(o.o_orderdate AS DATE) >= d.valid_from
      |  AND (d.valid_to IS NULL OR CAST(o.o_orderdate AS DATE) < d.valid_to)""".stripMargin) { (s, d) =>
    val dim = scd2(dayObs(s, d))
    val facts = Tables.orders(s, d).select(
      col("o_orderkey").as("order_key"), col("o_custkey").as("custkey"),
      to_date(col("o_orderdate")).as("order_date"), col("o_totalprice").as("total_price"))
    facts.join(dim,
        facts("custkey") === dim("custkey") &&
          col("order_date") >= col("valid_from") &&
          (col("valid_to").isNull || col("order_date") < col("valid_to")))
      .select(col("order_key"), facts("custkey"), col("order_date"),
        col("attr").as("priority_at_order"), col("version"), col("total_price"))
  }

  // ---------------------------------------------------------------- A59
  /** HIERARCHY CLOSURE by path doubling — the recursive-CTE workload
    * (BOM explosion, org-chart rollup, category trees) Spark cannot spell
    * as SQL (no WITH RECURSIVE), re-expressed as a LOG-DEPTH sequence of
    * self-joins: C₂ₙ = Cₙ ∪ (rows at exactly n steps) ∘ Cₙ. Because every
    * node has at most ONE parent, path composition is unique — the
    * exactly-n prefix join emits lengths n+1..2n with no overlap against
    * Cₙ's 1..n, so NO distinct/dedup shuffle is ever needed.
    *
    * The hierarchy is synthesized deterministically from the part table
    * (parent(k) = k div 10, roots below 10): ~3 levels at sf0.01, and the
    * SAME three doublings cover depth ≤ 8, i.e. 10⁸ keys — the doubling
    * count grows with log(depth), not depth, which is the 100 TB argument:
    * a step-at-a-time loop over a 20-deep corporate BOM is 20 shuffle
    * rounds; doubling is 5. Each round is one equi-join on the frontier
    * node id + a union; intermediate size is bounded by the closure itself
    * (Σ depth(k), the output's own size).
    *
    * Oracle: DuckDB's native WITH RECURSIVE — cross-engine equality proves
    * the doubling rewrite IS the recursion. */
  val q61 = Q(
    "q61_hierarchy_closure",
    """WITH RECURSIVE anc(part_key, ancestor_key, steps) AS (
      |  SELECT p_partkey, p_partkey // 10, CAST(1 AS BIGINT) FROM part WHERE p_partkey >= 10
      |  UNION ALL
      |  SELECT a.part_key, a.ancestor_key // 10, a.steps + 1
      |  FROM anc a WHERE a.ancestor_key >= 10
      |)
      |SELECT part_key, ancestor_key, steps FROM anc""".stripMargin) { (s, d) =>
    val edges = Tables.part(s, d).select(col("p_partkey").as("part_key"))
      .filter(col("part_key") >= 10)
      .select(col("part_key"), expr("part_key div 10").as("ancestor_key"),
        lit(1L).as("steps"))
    def double(c: DataFrame, n: Int): DataFrame = {
      val prefix = c.filter(col("steps") === n)
        .select(col("part_key"), col("ancestor_key").as("mid"), col("steps").as("s1"))
      val suffix = c.select(col("part_key").as("mid"), col("ancestor_key"),
        col("steps").as("s2"))
      c.unionByName(prefix.join(suffix, "mid")
        .select(col("part_key"), col("ancestor_key"), (col("s1") + col("s2")).as("steps")))
    }
    double(double(double(edges, 1), 2), 4) // depth ≤ 8 ⇔ 10⁸ keys
  }

  val queries: Seq[Q] = Seq(q36, q37, q38, q61)
}
