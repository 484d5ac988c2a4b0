package graft.etl

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.Exact._

/** Date-dimension and report-shaping surface (SURVEY §2 A12/A15/A16/A17). */
object Reporting {

  // ---------------------------------------------------------------- A12
  /** Date dimension derivation with the reference's quarter keys and the
    * SCB 3-month forward shift (dw5_order_royalty_fact.py:733-743:
    * Combined_Month_SCB_fwd = MKEY_Date + DateOffset(months=3)). */
  val q12 = Q(
    "q12_date_dim",
    """WITH dates AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)
      |SELECT strftime(d, '%Y-%m-%d') AS date_key,
      |  CAST(year(d) AS BIGINT) AS year,
      |  strftime(d, '%B') AS month_name,
      |  strftime(d, '%B') || CAST(year(d) AS VARCHAR) AS monthyear,
      |  CAST(year(d) AS VARCHAR) || 'Q' || CAST(quarter(d) AS VARCHAR) AS quarter_key,
      |  CAST(year(d + INTERVAL 3 MONTH) AS VARCHAR) || 'Q' || CAST(quarter(d + INTERVAL 3 MONTH) AS VARCHAR) AS sales_qtr_fwd
      |FROM dates""".stripMargin) { (s, d) =>
    val fwd = add_months(col("d"), 3)
    Tables.orders(s, d)
      .select(col("o_orderdate").cast("date").as("d")).distinct()
      .select(
        date_format(col("d"), "yyyy-MM-dd").as("date_key"),
        year(col("d")).cast("long").as("year"),
        date_format(col("d"), "MMMM").as("month_name"),
        concat(date_format(col("d"), "MMMM"), year(col("d")).cast("string")).as("monthyear"),
        concat(year(col("d")).cast("string"), lit("Q"), quarter(col("d")).cast("string")).as("quarter_key"),
        concat(year(fwd).cast("string"), lit("Q"), quarter(fwd).cast("string")).as("sales_qtr_fwd"))
  }

  // ---------------------------------------------------------------- A15
  /** Rollup subtotals: revenue by (region, nation) with ALL-level totals —
    * the reference ships separate summary + printable reports at different
    * grains (dw5_order_royalty_fact.py:750-806); grouping sets produce all
    * grains in one shuffle. */
  val q15 = Q(
    "q15_rollup",
    """SELECT COALESCE(r.r_name, 'ALL') AS region, COALESCE(n.n_name, 'ALL') AS nation,
      |  CAST(GROUPING(r.r_name) AS BIGINT) AS g_region,
      |  CAST(GROUPING(n.n_name) AS BIGINT) AS g_nation,
      |  CAST(SUM(CAST(ROUND((l_extendedprice*(1-l_discount))*1000000) AS BIGINT)) AS BIGINT)/1000000.0 AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_lines
      |FROM lineitem l
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY ROLLUP(r.r_name, n.n_name)""".stripMargin) { (s, d) =>
    val net = col("l_extendedprice") * (lit(1) - col("l_discount"))
    Tables.lineitem(s, d)
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        grouping(col("r_name")).cast("long").as("g_region"),
        grouping(col("n_name")).cast("long").as("g_nation"),
        (sum(micros(net)) / 1e6).as("revenue"),
        count(lit(1)).as("n_lines"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("g_region"), col("g_nation"), col("revenue"), col("n_lines"))
  }

  // ---------------------------------------------------------------- A16
  /** Pivot-style wide aggregation: return-flag rows × line-status columns.
    * Expressed as conditional aggregates so the output schema is static —
    * at 100 TB a dynamic pivot would need a distinct-values pre-pass. */
  val q16 = Q(
    "q16_pivot",
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
      |  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_fulfilled,
      |  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(ROUND((l_extendedprice*(1-l_discount))*1000000) AS BIGINT) ELSE 0 END) AS BIGINT)/1000000.0 AS rev_open,
      |  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(ROUND((l_extendedprice*(1-l_discount))*1000000) AS BIGINT) ELSE 0 END) AS BIGINT)/1000000.0 AS rev_fulfilled
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
    val net = col("l_extendedprice") * (lit(1) - col("l_discount"))
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("l_linestatus") === "O", 1L).otherwise(0L)).as("n_open"),
        sum(when(col("l_linestatus") === "F", 1L).otherwise(0L)).as("n_fulfilled"),
        (sum(when(col("l_linestatus") === "O", micros(net)).otherwise(0L)) / 1e6).as("rev_open"),
        (sum(when(col("l_linestatus") === "F", micros(net)).otherwise(0L)) / 1e6).as("rev_fulfilled"))
  }

  // ---------------------------------------------------------------- A17
  /** Exact interpolated percentiles per group (Spark `percentile` ==
    * DuckDB `quantile_cont`), rounded to 4 dp for cross-engine stability. */
  val q17 = Q(
    "q17_percentiles",
    """SELECT p_brand,
      |  ROUND(quantile_cont(p_retailprice, 0.25), 4) AS p25,
      |  ROUND(quantile_cont(p_retailprice, 0.5), 4) AS median,
      |  ROUND(quantile_cont(p_retailprice, 0.95), 4) AS p95,
      |  CAST(COUNT(*) AS BIGINT) AS n_parts
      |FROM part GROUP BY p_brand""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .groupBy(col("p_brand"))
      .agg(
        round(expr("percentile(p_retailprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(p_retailprice, 0.5)"), 4).as("median"),
        round(expr("percentile(p_retailprice, 0.95)"), 4).as("p95"),
        count(lit(1)).as("n_parts"))
  }

  // ---------------------------------------------------------------- A27
  /** Approximate-percentile companion to q17 — the 100 TB default path.
    * Exact per-group `percentile()` buffers every value of a group in one
    * aggregation buffer (OOM-shaped for a hot group); `percentile_approx`
    * is a bounded-memory Greenwald-Khanna summary that partial-aggregates
    * map-side. Contract: q17 stays the oracle-checked EXACT variant; this
    * query is tolerance-gated — it emits the exact median (hash-compared
    * cross-engine) plus a within-tolerance flag for the sketch, computed on
    * the Spark side and asserted true by the oracle: a drifting sketch flips
    * the flag and fails the hash compare. */
  val q27 = Q(
    "q27_approx_percentiles",
    """SELECT p_brand,
      |  ROUND(quantile_cont(p_retailprice, 0.5), 4) AS p50_exact,
      |  CAST(COUNT(*) AS BIGINT) AS n_parts,
      |  TRUE AS p50_within_tol
      |FROM part GROUP BY p_brand""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .groupBy(col("p_brand"))
      .agg(
        round(expr("percentile(p_retailprice, 0.5)"), 4).as("p50_exact"),
        count(lit(1)).as("n_parts"),
        expr("percentile_approx(p_retailprice, 0.5, 10000)").as("p50_approx"),
        (max(col("p_retailprice")) - min(col("p_retailprice"))).as("rng"))
      .select(col("p_brand"), col("p50_exact"), col("n_parts"),
        (abs(col("p50_approx") - col("p50_exact")) <= col("rng") * 0.05 + lit(1e-6))
          .as("p50_within_tol"))
  }

  // ---------------------------------------------------------------- A28
  /** Approximate-distinct companion to q08/q20's countDistinct — HyperLogLog++
    * partial-aggregates in O(1) memory per group where COUNT(DISTINCT) must
    * shuffle every distinct key. Same tolerance-oracle contract as q27: the
    * exact count is hash-compared, the sketch is gated by a Spark-side flag
    * the oracle asserts true (rsd 2%, gate at 15%+5 — generous but a real
    * failure detector for a broken sketch). */
  val q28 = Q(
    "q28_approx_distinct",
    """SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust_exact,
      |  TRUE AS within_tol
      |FROM orders GROUP BY 1""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(
        countDistinct(col("o_custkey")).as("n_cust_exact"),
        approx_count_distinct(col("o_custkey"), 0.02).as("n_approx"))
      .select(col("month"), col("n_cust_exact"),
        (abs(col("n_approx") - col("n_cust_exact")) <= col("n_cust_exact") * 0.15 + lit(5))
          .as("within_tol"))
  }

  // ---------------------------------------------------------------- A40
  /** CUBE over (return flag, line status) with an explicit GROUPING_ID —
    * q15's rollup covers the hierarchical subtotal ladder; a cross-tab
    * report needs the full lattice (every flag×status combination PLUS
    * per-flag totals, per-status totals, and the grand total — 2ᵏ grouping
    * sets). GROUPING_ID disambiguates a real NULL-keyed group from a
    * subtotal row, which COALESCE alone cannot.
    *
    * Scale: Spark expands CUBE into one Expand + one hash aggregate — 2ᵏ
    * rows per input row pre-aggregation, all collapsing map-side (partial
    * agg), so the shuffle carries only group cells. k stays tiny (2 here)
    * by design; a wide-k cube is a modeling error, not an engine gap. */
  val q40 = Q(
    "q40_cube",
    s"""SELECT COALESCE(l_returnflag, 'ALL') AS flag,
      |  COALESCE(l_linestatus, 'ALL') AS status,
      |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
      |  ${sqlSumMicros("l_extendedprice*(1-l_discount)")} AS revenue,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
      |  CAST(COUNT(*) AS BIGINT) AS n_lines
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin) { (s, d) =>
    val net = col("l_extendedprice") * (lit(1) - col("l_discount"))
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
          .cast("long").as("gid"),
        sumMicros(net).as("revenue"),
        sum(col("l_quantity").cast("long")).as("qty"),
        count(lit(1)).as("n_lines"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("gid"), col("revenue"), col("qty"), col("n_lines"))
  }

  // ---------------------------------------------------------------- A42
  /** Exact distributed second-moment statistics per brand: Pearson
    * correlation, population covariance and stddevs of (quantity, net
    * revenue). The price-analysis companion to q17's percentiles — and a
    * statement about HOW moments are computed at scale: never a two-pass
    * mean-then-residual (a second corpus scan), never a naive
    * float-accumulator (non-associative, shuffle-order-dependent). Each
    * row contributes integer-scaled (x, y, xy, x², y²); the ONLY
    * aggregation is exact integer sums — associative, partial-agg
    * friendly, reproducible under any partitioning/AQE re-plan — and the
    * closed forms n·Σxy−ΣxΣy etc. turn them into the statistics with ONE
    * float op chain per group, identical in both engines.
    *
    * Widths: y in cents (≤1e7), y² ≤ 1e14 per row fits BIGINT; group sums
    * accumulate in decimal(30+,0) (Spark) / HUGEINT (DuckDB), so Σy² and
    * n·Σy² stay exact far past 1e9 rows per group — the overflow headroom
    * a 100 TB fact needs. */
  val q42 = Q(
    "q42_group_stats",
    """WITH j AS (SELECT p.p_brand AS brand,
      |    CAST(ROUND(l.l_quantity) AS BIGINT) AS x,
      |    CAST(ROUND((l.l_extendedprice*(1-l.l_discount))*100) AS BIGINT) AS y
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
      |s AS (SELECT brand, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
      |    SUM(x*y) AS sxy, SUM(x*x) AS sxx, SUM(y*y) AS syy
      |  FROM j GROUP BY brand)
      |SELECT brand, CAST(n AS BIGINT) AS n_lines,
      |  ROUND(CAST(n*sxy - sx*sy AS DOUBLE)
      |    / sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)), 6) + 0.0 AS corr_qty_rev,
      |  ROUND(CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 6) + 0.0 AS covar_pop,
      |  ROUND(sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS stddev_qty,
      |  ROUND(sqrt(CAST(n*syy - sy*sy AS DOUBLE)) / CAST(n AS DOUBLE) / 100.0, 6) AS stddev_rev
      |FROM s""".stripMargin) { (s, d) =>
    val x = round(col("l_quantity")).cast("long")
    val y = cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
    val sums = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"), x.as("x"), y.as("y"))
      .groupBy("brand")
      .agg(count(lit(1)).as("n"),
        // decimal sums throughout: Σy alone fits a long, but the closed
        // forms square it (ΣyΣy), which wraps 2^63 already at sf0.01
        sum(col("x").cast("decimal(20,0)")).as("sx"),
        sum(col("y").cast("decimal(20,0)")).as("sy"),
        // per-row products fit BIGINT (x<=2^6, y<=2^24-ish); the SUMS go
        // through decimal so group totals never wrap at fact scale
        sum((col("x") * col("y")).cast("decimal(30,0)")).as("sxy"),
        sum((col("x") * col("x")).cast("decimal(30,0)")).as("sxx"),
        sum((col("y") * col("y")).cast("decimal(30,0)")).as("syy"))
    val nD = col("n").cast("double")
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val denx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val deny = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    sums.select(col("brand"), col("n").as("n_lines"),
      (round(num / sqrt(denx * deny), 6) + lit(0.0)).as("corr_qty_rev"),
      (round(num / nD / nD / 100.0, 6) + lit(0.0)).as("covar_pop"),
      round(sqrt(denx) / nD, 6).as("stddev_qty"),
      round(sqrt(deny) / nD / 100.0, 6).as("stddev_rev"))
  }

  // ---------------------------------------------------------------- A48
  /** UNPIVOT / melt — q16's inverse, the report-ingestion direction: a wide
    * layout (one column per priority class) folds back to the long
    * (status, class, measure) relation analytics actually joins against.
    * Spark-first this is `stack` inside the projection — a row GENERATOR,
    * not a shuffle: the wide relation is already grouped, so melting is a
    * fixed 3× fan-out of a tiny aggregate. Every (status, class) cell is
    * emitted, including zeros — melt must preserve the grid, not just the
    * populated cells (the oracle builds the same grid from a VALUES list
    * so absent combinations stay visible as 0). Money in integer micros. */
  val q48 = Q(
    "q48_unpivot",
    """WITH wide AS (SELECT o_orderstatus,
      |    SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |        THEN CAST(ROUND(o_totalprice*1000000) AS BIGINT) ELSE 0 END) AS hi_u,
      |    SUM(CASE WHEN o_orderpriority = '3-MEDIUM'
      |        THEN CAST(ROUND(o_totalprice*1000000) AS BIGINT) ELSE 0 END) AS med_u,
      |    SUM(CASE WHEN o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
      |        THEN CAST(ROUND(o_totalprice*1000000) AS BIGINT) ELSE 0 END) AS lo_u
      |  FROM orders GROUP BY o_orderstatus)
      |SELECT o_orderstatus, c.prio_class,
      |  CAST(CASE c.prio_class WHEN 'hi' THEN hi_u WHEN 'med' THEN med_u ELSE lo_u END AS BIGINT)/1000000.0 AS revenue
      |FROM wide CROSS JOIN (VALUES ('hi'), ('med'), ('lo')) AS c(prio_class)""".stripMargin) { (s, d) =>
    val u = micros(col("o_totalprice"))
    val wide = Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), u).otherwise(0L)).as("hi_u"),
        sum(when(col("o_orderpriority") === "3-MEDIUM", u).otherwise(0L)).as("med_u"),
        sum(when(col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW"), u).otherwise(0L)).as("lo_u"))
    wide.select(col("o_orderstatus"),
      expr("stack(3, 'hi', hi_u, 'med', med_u, 'lo', lo_u) AS (prio_class, rev_u)"))
      .select(col("o_orderstatus"), col("prio_class"), (col("rev_u") / 1e6).as("revenue"))
  }

  // ---------------------------------------------------------------- A49
  /** Distribution-rank windows — percent_rank, cume_dist and quartile
    * (ntile) of each part's price WITHIN its brand: the "where does this
    * row sit in its group's distribution" family, the third window species
    * after running frames (q13/q46) and top-k (q14). Deterministic because
    * the ordering key is the unique (price, partkey) composite — no peer
    * groups, so both engines' rank arithmetic agrees exactly. Windows
    * partition on the brand key; nothing global. */
  val q49 = Q(
    "q49_distribution_ranks",
    """SELECT p_brand, p_partkey, p_retailprice,
      |  ROUND(percent_rank() OVER w, 6) AS pct_rank,
      |  ROUND(cume_dist() OVER w, 6) AS cume,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
      |FROM part
      |WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice"), col("p_partkey"))
    Tables.part(s, d).select(
      col("p_brand"), col("p_partkey"), col("p_retailprice"),
      round(percent_rank().over(w), 6).as("pct_rank"),
      round(cume_dist().over(w), 6).as("cume"),
      ntile(4).over(w).cast("long").as("quartile"))
  }

  // ---------------------------------------------------------------- A50
  /** Fixed-width histogram of order values — the binning report behind
    * every pricing dashboard: integer-cents bucket arithmetic (never float
    * edges), top bucket clamped open-ended. One hash aggregate over the
    * scan; the bucket key is derived map-side, so the shuffle carries 10
    * rows per partition. */
  val q50 = Q(
    "q50_histogram",
    """WITH b AS (SELECT
      |    LEAST(CAST(ROUND(o_totalprice*100) AS BIGINT) // 6000000, 9) AS bucket,
      |    CAST(ROUND(o_totalprice*1000000) AS BIGINT) AS u
      |  FROM orders)
      |SELECT CAST(bucket AS BIGINT) AS bucket,
      |  CAST(bucket * 60000 AS BIGINT) AS lo,
      |  CAST(CASE WHEN bucket = 9 THEN NULL ELSE (bucket+1) * 60000 END AS BIGINT) AS hi,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(u) AS BIGINT)/1000000.0 AS revenue
      |FROM b GROUP BY bucket""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(least(expr("CAST(ROUND(o_totalprice*100) AS BIGINT) div 6000000"), lit(9L)).as("bucket"),
        micros(col("o_totalprice")).as("u"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_orders"), (sum(col("u")) / 1e6).as("revenue"))
      .select(col("bucket"), (col("bucket") * 60000).as("lo"),
        when(col("bucket") === 9, lit(null).cast("long")).otherwise((col("bucket") + 1) * 60000).as("hi"),
        col("n_orders"), col("revenue"))
  }

  // ---------------------------------------------------------------- A56
  /** GROUPING SETS with an ARBITRARY set list — the third member of the
    * multi-level-aggregate family: q15's ROLLUP is the prefix chain,
    * q40's CUBE is every subset, and this is the hand-picked list a
    * report actually wants ((priority, status), each margin, grand total
    * — but NOT every other subset a CUBE would waste a pass on). Spark
    * plans all three through the same Expand node, so partial aggregation
    * still collapses map-side; the grouping-id disambiguator is spelled
    * 2·grouping(a) + grouping(b) EXPLICITLY in both engines (their
    * grouping_id() bit conventions are not worth trusting to agree).
    * Declared via spark.sql — the one A-family query exercising the SQL
    * entry path over a registered view, which a reference user migrating
    * raw SQL would hit first. */
  val q56 = Q(
    "q56_grouping_sets",
    s"""SELECT o_orderpriority, o_orderstatus,
      |  CAST(2*GROUPING(o_orderpriority) + GROUPING(o_orderstatus) AS BIGINT) AS gid,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  ${graft.functions.Exact.sqlSumCents("o_totalprice")} AS revenue
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
      |  (o_orderpriority), (o_orderstatus), ())""".stripMargin) { (s, d) =>
    Tables.orders(s, d).createOrReplaceTempView("orders_q56")
    s.sql(
      """SELECT o_orderpriority, o_orderstatus,
        |  CAST(2*grouping(o_orderpriority) + grouping(o_orderstatus) AS BIGINT) AS gid,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS revenue
        |FROM orders_q56
        |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
        |  (o_orderpriority), (o_orderstatus), ())""".stripMargin)
  }

  // ---------------------------------------------------------------- A58
  /** EXISTS correlated subquery — the first shape a SQL migrator writes
    * (TPC-H Q4's skeleton: orders with any late-shipped line, counted by
    * priority) declared EXACTLY as the user would type it, through
    * spark.sql over registered views. The point is the PLAN: Catalyst
    * decorrelates the EXISTS into one LEFT SEMI hash join on l_orderkey
    * with the date comparison as a residual condition — never a per-row
    * subquery execution, never a nested loop (PlanShape-asserted in the
    * spec). The oracle runs the identical correlated spelling in DuckDB.
    *
    * Scale: semi join shuffles both sides on the order key once;
    * the date filter on orders pushes to the scan. */
  val q58 = Q(
    "q58_exists_subquery",
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_late
      |FROM orders o
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
    Tables.orders(s, d).createOrReplaceTempView("orders_q58")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_q58")
    s.sql(
      """SELECT o_orderpriority, COUNT(*) AS n_late
        |FROM orders_q58 o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem_q58 l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority""".stripMargin)
  }

  // ---------------------------------------------------------------- A59
  /** Scalar CORRELATED subquery (TPC-H Q17's skeleton: lines under 20% of
    * their part's average quantity — the "small orders" revenue screen),
    * again typed as the migrating user would. Catalyst decorrelates the
    * per-part average into ONE grouped aggregate over lineitem joined back
    * on l_partkey — the manual rewrite, derived automatically; the spec
    * asserts no nested-loop join survives in the physical plan.
    *
    * Cross-engine float note: l_quantity is integer-valued, so SUM as
    * double is EXACT below 2^53 in any partition order and AVG = sum/count
    * is the same IEEE division in both engines — the 0.2·avg comparison is
    * deterministic, no rounding quantum needed. Money still flows as
    * integer cents.
    *
    * Scale: one extra aggregate pass over lineitem keyed on l_partkey
    * (partial-agg friendly), then two hash joins; nothing per-row. */
  val q59 = Q(
    "q59_scalar_subquery",
    """SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS n_small,
      |  CAST(SUM(CAST(ROUND(l1.l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev_cents
      |FROM lineitem l1 JOIN part p ON p.p_partkey = l1.l_partkey
      |WHERE l1.l_quantity < (SELECT 0.2*AVG(l2.l_quantity) FROM lineitem l2
      |                       WHERE l2.l_partkey = l1.l_partkey)
      |GROUP BY p.p_brand""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_q59")
    Tables.part(s, d).createOrReplaceTempView("part_q59")
    s.sql(
      """SELECT p.p_brand, COUNT(*) AS n_small,
        |  SUM(CAST(ROUND(l1.l_extendedprice*100) AS BIGINT)) AS rev_cents
        |FROM lineitem_q59 l1 JOIN part_q59 p ON p.p_partkey = l1.l_partkey
        |WHERE l1.l_quantity < (SELECT 0.2*AVG(l2.l_quantity) FROM lineitem_q59 l2
        |                       WHERE l2.l_partkey = l1.l_partkey)
        |GROUP BY p.p_brand""".stripMargin)
  }

  val queries: Seq[Q] = Seq(q12, q15, q16, q17, q27, q28, q40, q42, q48, q49, q50, q56,
    q58, q59)
}
