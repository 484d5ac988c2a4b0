package graft.etl

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.Exact._

/** Window-function surface: running aggregates, top-k, as-of join,
  * sessionization, tumbling windows, keep-first dedup (SURVEY §2
  * A13/A14/A18/A19/A20/A22).
  *
  * Scale rule: every window partitions on a high-cardinality key
  * (customer/user/brand); there is no global ORDER BY anywhere.
  * Events timestamps are nanosecond longs (see Tables.load); all temporal
  * logic happens on epoch SECONDS so Spark (µs) and DuckDB (ns) agree.
  */
object Windowing {

  /** events normalized to epoch seconds — `ts div 1000000000` is integer
    * division on the raw ns long (a double division would round, not floor). */
  private def ev(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.events(s, d).select(
      col("event_id"), col("user_id"), col("event_type"), col("value"),
      expr("ts div 1000000000").as("sec"))
  private val evSql =
    "SELECT event_id, user_id, event_type, value, epoch_ns(ts)//1000000000 AS sec FROM events"

  // ---------------------------------------------------------------- A13
  /** Running spend, order sequence, days since previous order per customer.
    * Reference analog: the sort_values + cumulative idioms in the fact build
    * (dw5_order_royalty_fact.py:531, 655). */
  val q13 = Q(
    "q13_window_running",
    """SELECT o_orderkey, o_custkey,
      |  CAST(row_number() OVER w AS BIGINT) AS order_seq,
      |  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) OVER w AS BIGINT)/100.0 AS running_spend,
      |  CAST(COALESCE(date_diff('day', lag(CAST(o_orderdate AS DATE)) OVER w, CAST(o_orderdate AS DATE)), -1) AS BIGINT) AS days_since_prev
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d).select(
      col("o_orderkey"), col("o_custkey"),
      row_number().over(w).cast("long").as("order_seq"),
      (sum(cents(col("o_totalprice"))).over(wr) / 100.0).as("running_spend"),
      coalesce(
        datediff(col("o_orderdate").cast("date"), lag(col("o_orderdate").cast("date"), 1).over(w)),
        lit(-1)).cast("long").as("days_since_prev"))
  }

  // ---------------------------------------------------------------- A14
  /** Top-3 parts by revenue within each brand (row_number <= k). */
  val q14 = Q(
    "q14_topk_per_group",
    """WITH rev AS (
      |  SELECT p.p_brand AS brand, l.l_partkey AS part_key,
      |         CAST(SUM(CAST(ROUND((l_extendedprice*(1-l_discount))*1000000) AS BIGINT)) AS BIGINT) AS rev_u
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY p.p_brand, l.l_partkey),
      |ranked AS (
      |  SELECT brand, part_key, rev_u,
      |         CAST(row_number() OVER (PARTITION BY brand ORDER BY rev_u DESC, part_key) AS BIGINT) AS rank
      |  FROM rev)
      |SELECT brand, part_key, rev_u/1000000.0 AS revenue, rank FROM ranked WHERE rank <= 3""".stripMargin) { (s, d) =>
    val net = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val rev = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"), col("l_partkey").as("part_key"))
      .agg(sum(micros(net)).as("rev_u"))
    val w = Window.partitionBy(col("brand")).orderBy(col("rev_u").desc, col("part_key"))
    rev.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("brand"), col("part_key"), (col("rev_u") / 1e6).as("revenue"), col("rank"))
  }

  // ---------------------------------------------------------------- A18
  /** As-of join: each purchase event matched to the user's latest strictly
    * earlier click. Spark-first: a single pass — union the two event roles,
    * sort within user, carry the last click forward with an exclusive-frame
    * window. No pairwise join, so skewed users cannot blow up candidates;
    * the DuckDB oracle is the naive pair join + row_number. */
  val q18 = Q(
    "q18_asof_join",
    s"""WITH ev AS ($evSql),
      |p AS (SELECT * FROM ev WHERE event_type = 'purchase'),
      |c AS (SELECT * FROM ev WHERE event_type = 'click'),
      |j AS (
      |  SELECT p.event_id AS purchase_id, p.user_id, p.sec AS purchase_sec, p.value AS purchase_value,
      |         c.event_id AS click_id, c.sec AS click_sec,
      |         row_number() OVER (PARTITION BY p.event_id ORDER BY c.sec DESC, c.event_id DESC) AS rn
      |  FROM p JOIN c ON p.user_id = c.user_id AND c.sec < p.sec)
      |SELECT purchase_id, user_id, purchase_sec, purchase_value, click_id, click_sec
      |FROM j WHERE rn = 1""".stripMargin) { (s, d) =>
    val base = ev(s, d).filter(col("event_type").isin("click", "purchase"))
      // at equal seconds a purchase sorts BEFORE clicks so the exclusive
      // frame below enforces strictly-earlier clicks
      .withColumn("type_rank", when(col("event_type") === "purchase", 0).otherwise(1))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("type_rank"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("last_click",
        last(when(col("event_type") === "click",
          struct(col("sec").as("click_sec"), col("event_id").as("click_id"))), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("last_click").isNotNull)
      .select(
        col("event_id").as("purchase_id"), col("user_id"),
        col("sec").as("purchase_sec"), col("value").as("purchase_value"),
        col("last_click.click_id").as("click_id"), col("last_click.click_sec").as("click_sec"))
  }

  // ---------------------------------------------------------------- A19
  /** Gap-based sessionization: a >30-min silence starts a new session.
    * lag → new-session flag → running sum = session number → session rollup. */
  val q19 = Q(
    "q19_sessionize",
    s"""WITH ev AS ($evSql),
      |flagged AS (
      |  SELECT user_id, event_id, sec, value,
      |         CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_sess
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
      |numbered AS (
      |  SELECT user_id, event_id, sec, value,
      |         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS BIGINT) AS session_num
      |  FROM flagged)
      |SELECT user_id, session_num,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(MIN(sec) AS BIGINT) AS start_sec,
      |  CAST(MAX(sec) AS BIGINT) AS end_sec,
      |  CAST(SUM(CAST(ROUND(value*1000000) AS BIGINT)) AS BIGINT)/1000000.0 AS total_value
      |FROM numbered GROUP BY user_id, session_num""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    val wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev(s, d)
      .withColumn("new_sess",
        when(lag(col("sec"), 1).over(w).isNull || col("sec") - lag(col("sec"), 1).over(w) > 1800, 1).otherwise(0))
      .withColumn("session_num", sum(col("new_sess")).over(wr).cast("long"))
      .groupBy(col("user_id"), col("session_num"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("sec")).as("start_sec"),
        max(col("sec")).as("end_sec"),
        sumMicros(col("value")).as("total_value"))
  }

  // ---------------------------------------------------------------- A20
  /** Tumbling one-hour window aggregation — the batch mirror of the
    * Structured Streaming pipeline in graft.streaming. */
  val q20 = Q(
    "q20_events_window",
    s"""WITH ev AS ($evSql)
      |SELECT strftime(make_timestamp((sec//3600)*3600*1000000), '%Y-%m-%d %H:00') AS window_start,
      |  event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(SUM(CAST(ROUND(value*1000000) AS BIGINT)) AS BIGINT)/1000000.0 AS total_value
      |FROM ev GROUP BY 1, 2""".stripMargin) { (s, d) =>
    ev(s, d)
      .groupBy(
        date_format(timestamp_seconds((col("sec") / 3600).cast("long") * 3600), "yyyy-MM-dd HH:00").as("window_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sumMicros(col("value")).as("total_value"))
  }

  // ---------------------------------------------------------------- A22
  /** Keep-first-per-key dedup: earliest event per (user, type).
    * Reference: drop_duplicates(subset=OrderItemIndex) (dw3_merge_inc.py:110-113). */
  val q22 = Q(
    "q22_dedup_semantic_key",
    s"""WITH ev AS ($evSql),
      |ranked AS (
      |  SELECT event_id, user_id, event_type, sec,
      |         row_number() OVER (PARTITION BY user_id, event_type ORDER BY sec, event_id) AS rn
      |  FROM ev)
      |SELECT event_id, user_id, event_type, sec FROM ranked WHERE rn = 1""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id"), col("event_type")).orderBy(col("sec"), col("event_id"))
    ev(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("event_id", "user_id", "event_type", "sec")
  }

  // ---------------------------------------------------------------- A30
  /** Range (point-in-interval) join, bin-bucketized. High-value purchases
    * open a one-hour window [sec, sec+3600); every event whose timestamp
    * falls inside any window is attributed to it — and there is NO shared
    * equi-key between the two sides, the shape Spark's planner can only
    * execute as a broadcast-nested-loop (every point × every window).
    *
    * The Spark-first re-expression bins time at the window length: an
    * interval of length L overlaps at most 2 bins of width L, so windows
    * explode to ≤2 (distinct) bin keys, points map to exactly 1, and the
    * candidate build becomes a plain shuffle equi-join on the bin — at most
    * 2× duplication of the (small) window side, zero duplication of the
    * point side, exact containment re-checked per candidate. A point's bin
    * can hold both copies of no window (the two bins differ), so no pair
    * dedup is needed. RangeJoinSpec proves the binned plan equals the
    * naive cross-join formulation, which the DuckDB oracle keeps (its
    * IEJoin handles inequality joins natively — single-node luxury). */
  val q30 = Q(
    "q30_range_join",
    s"""WITH ev AS ($evSql),
      |w AS (SELECT event_id AS window_id, sec AS wstart FROM ev
      |      WHERE event_type = 'purchase' AND value > 150),
      |j AS (SELECT w.window_id, w.wstart, p.value FROM w JOIN ev p
      |      ON p.sec >= w.wstart AND p.sec < w.wstart + 3600 AND p.event_id <> w.window_id)
      |SELECT window_id, CAST(wstart AS BIGINT) AS window_start,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(ROUND(value*1000000) AS BIGINT)) AS BIGINT)/1000000.0 AS total_value
      |FROM j GROUP BY window_id, wstart""".stripMargin)(
    (s, d) => rangeJoinCounts(s, d, binned = true))

  /** Both q30 plans — `binned = false` is the naive nested-loop baseline
    * RangeJoinSpec checks the bucketized plan against. */
  private[graft] def rangeJoinCounts(s: org.apache.spark.sql.SparkSession, d: String,
      binned: Boolean): org.apache.spark.sql.DataFrame = {
    val base = ev(s, d)
    val win = base.filter(col("event_type") === "purchase" && col("value") > 150)
      .select(col("event_id").as("window_id"), col("sec").as("wstart"))
    val pts = base.select(col("event_id").as("pid"), col("sec").as("psec"), col("value"))
    val contained = col("psec") >= col("wstart") &&
      col("psec") < col("wstart") + 3600 && col("pid") =!= col("window_id")
    val cand =
      if (binned) {
        val wb = win.withColumn("bin", explode(array_distinct(array(
          expr("wstart div 3600"), expr("(wstart + 3599) div 3600")))))
        wb.join(pts.withColumn("bin", expr("psec div 3600")), Seq("bin"))
      } else win.crossJoin(pts)
    cand.filter(contained)
      .groupBy(col("window_id"), col("wstart").as("window_start"))
      .agg(count(lit(1)).as("n_events"), sumMicros(col("value")).as("total_value"))
  }

  // ---------------------------------------------------------------- A41
  /** Peak-concurrency sweep line: how many user sessions are active at
    * once, per day — the capacity-planning query every event warehouse
    * eventually runs. Sessions are q19's gap-based intervals; a session is
    * active on [start_sec, end_sec], and the day's answer is the maximum
    * of the +1/−1 boundary-event running sum.
    *
    * The naive formulation is ONE global ORDER BY over every boundary
    * event — a single-partition sort that dies at 100 TB. The scale shape
    * here: intervals are SPLIT at day boundaries (a session touching d
    * days contributes d single-day segments, each clamped to its day), so
    * the sweep's running sum partitions on the day key — bounded windows,
    * no global sort, and day boundaries are exact because a segment never
    * crosses one. Ties at the same second process −1 before +1 (an
    * interval ending as another starts does not overlap it); intermediate
    * prefixes among equal-(t,delta) rows only ever undershoot the final
    * value at that instant, so max() over the row-frame running sum is
    * exact. peak_sec is the FIRST second the day's maximum is reached
    * (max_by on the (running, −t) struct — a hash aggregate, not a second
    * window). */
  val q41 = Q(
    "q41_max_concurrent",
    s"""WITH ev AS ($evSql),
      |flagged AS (
      |  SELECT user_id, sec, event_id,
      |         CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_sess
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
      |numbered AS (
      |  SELECT user_id, sec,
      |         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS session_num
      |  FROM flagged),
      |sess AS (SELECT user_id, session_num, MIN(sec) AS start_sec, MAX(sec) AS end_sec
      |         FROM numbered GROUP BY user_id, session_num),
      |seg AS (
      |  SELECT user_id, session_num, unnest(range(start_sec//86400, end_sec//86400 + 1)) AS day,
      |         start_sec, end_sec FROM sess),
      |clamped AS (
      |  SELECT day, GREATEST(start_sec, day*86400) AS seg_start,
      |         LEAST(end_sec, (day+1)*86400 - 1) AS seg_end FROM seg),
      |deltas AS (
      |  SELECT day, seg_start AS t, 1 AS delta FROM clamped
      |  UNION ALL SELECT day, seg_end + 1, -1 FROM clamped),
      |swept AS (
      |  SELECT day, t, delta,
      |         SUM(delta) OVER (PARTITION BY day ORDER BY t, delta ROWS UNBOUNDED PRECEDING) AS running
      |  FROM deltas),
      |ranked AS (
      |  SELECT day, t, running,
      |         row_number() OVER (PARTITION BY day ORDER BY running DESC, t) AS rn,
      |         SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) OVER (PARTITION BY day) AS n_sessions
      |  FROM swept)
      |SELECT strftime(make_timestamp(day*86400*1000000), '%Y-%m-%d') AS day_date,
      |  CAST(n_sessions AS BIGINT) AS n_sessions,
      |  CAST(running AS BIGINT) AS max_concurrent,
      |  CAST(t AS BIGINT) AS peak_sec
      |FROM ranked WHERE rn = 1""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    val wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = ev(s, d)
      .withColumn("new_sess",
        when(lag(col("sec"), 1).over(w).isNull || col("sec") - lag(col("sec"), 1).over(w) > 1800, 1)
          .otherwise(0))
      .withColumn("session_num", sum(col("new_sess")).over(wr))
      .groupBy(col("user_id"), col("session_num"))
      .agg(min(col("sec")).as("start_sec"), max(col("sec")).as("end_sec"))
    val clamped = sess
      .select(explode(sequence(expr("start_sec div 86400"), expr("end_sec div 86400"))).as("day"),
        col("start_sec"), col("end_sec"))
      .select(col("day"),
        greatest(col("start_sec"), col("day") * 86400).as("seg_start"),
        least(col("end_sec"), (col("day") + 1) * 86400 - 1).as("seg_end"))
    val deltas = clamped.select(col("day"), col("seg_start").as("t"), lit(1).as("delta"))
      .unionAll(clamped.select(col("day"), (col("seg_end") + 1).as("t"), lit(-1).as("delta")))
    val wSweep = Window.partitionBy(col("day")).orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("running", sum(col("delta")).over(wSweep))
      .groupBy(col("day"))
      .agg(
        sum(when(col("delta") === 1, 1).otherwise(0)).as("n_sessions"),
        max(col("running")).as("max_concurrent"),
        max_by(col("t"), struct(col("running"), (-col("t")).as("tie"))).as("peak_sec"))
      .select(
        date_format(timestamp_seconds(col("day") * 86400), "yyyy-MM-dd").as("day_date"),
        col("n_sessions"), col("max_concurrent"), col("peak_sec"))
  }

  // ---------------------------------------------------------------- A43
  /** Cohort retention matrix: users grouped by their first-seen epoch week,
    * tracked across subsequent weeks — the activation/retention report every
    * event warehouse runs weekly.
    *
    * Scale shape: events collapse FIRST to the (user, week) activity grid
    * (one hash aggregate — partial agg eats the per-user event fan-in
    * map-side), then the cohort key is a window min over that bounded grid
    * (users × weeks, not events), and the matrix rollup needs NO distinct:
    * (user, week) rows are unique by construction, so active_users is a
    * plain count. One shuffle on user_id, one on the (cohort, offset) key. */
  val q43 = Q(
    "q43_cohort_retention",
    s"""WITH ev AS ($evSql),
      |uw AS (SELECT user_id, sec//604800 AS week, COUNT(*) AS n_events
      |       FROM ev GROUP BY user_id, sec//604800),
      |fw AS (SELECT user_id, week, n_events,
      |       MIN(week) OVER (PARTITION BY user_id) AS cohort_week FROM uw)
      |SELECT strftime(make_timestamp(cohort_week*604800*1000000), '%Y-%m-%d') AS cohort_start,
      |  CAST(week - cohort_week AS BIGINT) AS week_offset,
      |  CAST(COUNT(*) AS BIGINT) AS active_users,
      |  CAST(SUM(n_events) AS BIGINT) AS n_events
      |FROM fw GROUP BY cohort_week, week - cohort_week""".stripMargin) { (s, d) =>
    val uw = ev(s, d)
      .groupBy(col("user_id"), expr("sec div 604800").as("week"))
      .agg(count(lit(1)).as("n_events"))
    val wU = Window.partitionBy(col("user_id"))
    uw.withColumn("cohort_week", min(col("week")).over(wU))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("active_users"), sum(col("n_events")).as("n_events"))
      .select(
        date_format(timestamp_seconds(col("cohort_week") * 604800), "yyyy-MM-dd").as("cohort_start"),
        col("week_offset"), col("active_users"), col("n_events"))
  }

  // ---------------------------------------------------------------- A44
  /** Ordered conversion funnel: first view → first later click → first
    * later purchase, strictly increasing timestamps per user (an event at
    * the same second as the previous stage does NOT advance the funnel).
    *
    * Spark-first: NO self-joins — one shuffle on user_id, then a cascade of
    * three unbounded-frame window minimums over the SAME partitioning
    * (each stage's entry time is a per-user constant the next stage's
    * conditional min reads), one row per user via hash aggregate, and the
    * three-row funnel table is an explode of a single-row aggregate. The
    * DuckDB oracle keeps the naive three-join spelling, so hash equality
    * proves the window cascade == the join cascade. */
  val q44 = Q(
    "q44_funnel",
    s"""WITH ev AS ($evSql),
      |s1 AS (SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN sec END) AS v
      |       FROM ev GROUP BY user_id),
      |s2 AS (SELECT ev.user_id, MIN(ev.sec) AS c FROM ev
      |       JOIN s1 ON ev.user_id = s1.user_id AND ev.event_type = 'click' AND ev.sec > s1.v
      |       GROUP BY ev.user_id),
      |s3 AS (SELECT ev.user_id, MIN(ev.sec) AS p FROM ev
      |       JOIN s2 ON ev.user_id = s2.user_id AND ev.event_type = 'purchase' AND ev.sec > s2.c
      |       GROUP BY ev.user_id),
      |agg AS (SELECT (SELECT COUNT(v) FROM s1) AS rv,
      |               (SELECT COUNT(*) FROM s2) AS rc,
      |               (SELECT COUNT(*) FROM s3) AS rp)
      |SELECT stage, n_users, frac_of_first, conv_from_prev FROM (
      |  SELECT '1_view' AS stage, CAST(rv AS BIGINT) AS n_users,
      |    CAST(1.0 AS DOUBLE) AS frac_of_first, CAST(1.0 AS DOUBLE) AS conv_from_prev FROM agg
      |  UNION ALL SELECT '2_click', CAST(rc AS BIGINT),
      |    ROUND(CAST(rc AS DOUBLE) / CAST(rv AS DOUBLE), 6),
      |    ROUND(CAST(rc AS DOUBLE) / CAST(rv AS DOUBLE), 6) FROM agg
      |  UNION ALL SELECT '3_purchase', CAST(rp AS BIGINT),
      |    ROUND(CAST(rp AS DOUBLE) / CAST(rv AS DOUBLE), 6),
      |    ROUND(CAST(rp AS DOUBLE) / CAST(rc AS DOUBLE), 6) FROM agg)""".stripMargin) { (s, d) =>
    val wU = Window.partitionBy(col("user_id"))
    val perUser = ev(s, d)
      .withColumn("v", min(when(col("event_type") === "view", col("sec"))).over(wU))
      .withColumn("c", min(when(col("event_type") === "click" && col("sec") > col("v"), col("sec"))).over(wU))
      .withColumn("p", min(when(col("event_type") === "purchase" && col("sec") > col("c"), col("sec"))).over(wU))
      .groupBy(col("user_id"))
      .agg(min(col("v")).as("v"), min(col("c")).as("c"), min(col("p")).as("p"))
    val totals = perUser.agg(
      count(col("v")).as("rv"), count(col("c")).as("rc"), count(col("p")).as("rp"))
    totals.select(explode(array(
        struct(lit("1_view").as("stage"), col("rv").as("n_users"),
          lit(1.0).as("frac_of_first"), lit(1.0).as("conv_from_prev")),
        struct(lit("2_click").as("stage"), col("rc").as("n_users"),
          round(col("rc").cast("double") / col("rv").cast("double"), 6).as("frac_of_first"),
          round(col("rc").cast("double") / col("rv").cast("double"), 6).as("conv_from_prev")),
        struct(lit("3_purchase").as("stage"), col("rp").as("n_users"),
          round(col("rp").cast("double") / col("rv").cast("double"), 6).as("frac_of_first"),
          round(col("rp").cast("double") / col("rc").cast("double"), 6).as("conv_from_prev"))
      )).as("row"))
      .select(col("row.stage").as("stage"), col("row.n_users").as("n_users"),
        col("row.frac_of_first").as("frac_of_first"), col("row.conv_from_prev").as("conv_from_prev"))
  }

  // ---------------------------------------------------------------- A45
  /** SLIDING-window aggregation (1 h length, 15 min slide) — the batch
    * mirror of `window(ts, '1 hour', '15 minutes')`, q20's tumbling
    * companion. Spark-first: each event explodes to the BOUNDED set of
    * windows covering it (length/slide = 4 ids, a fixed fan-out the
    * partial aggregation collapses map-side) and the rest is one hash
    * aggregate on the window key — the same assign-then-reduce plan
    * Structured Streaming compiles sliding windows to, spelled portably so
    * the DuckDB oracle states identical semantics. No window function, no
    * sort; survives any corpus size because the fan-out is length/slide,
    * never data-dependent. */
  val q45 = Q(
    "q45_sliding_window",
    s"""WITH ev AS ($evSql),
      |assigned AS (
      |  SELECT unnest(range(sec//900 - 3, sec//900 + 1)) * 900 AS window_start,
      |         event_type, user_id, value
      |  FROM ev)
      |SELECT CAST(window_start AS BIGINT) AS window_start, event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(SUM(CAST(ROUND(value*1000000) AS BIGINT)) AS BIGINT)/1000000.0 AS total_value
      |FROM assigned GROUP BY window_start, event_type""".stripMargin) { (s, d) =>
    ev(s, d)
      .select(
        explode(sequence(expr("sec div 900 - 3"), expr("sec div 900"))).as("win_id"),
        col("event_type"), col("user_id"), col("value"))
      .withColumn("window_start", col("win_id") * 900)
      .groupBy(col("window_start"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sumMicros(col("value")).as("total_value"))
  }

  // ---------------------------------------------------------------- A46
  /** Value-RANGE window frame: trailing-30-day spend per customer at each
    * order — the frame family q13's ROWS frames don't exercise (peers at
    * the same date aggregate together, and the frame edge is a VALUE
    * distance, not a row count). The reference's pandas analog is the
    * rolling('30D') idiom. Window partitions on the customer key, orders
    * within a customer are bounded — no global sort; money in integer
    * cents so the trailing sums are exact cross-engine. */
  val q46 = Q(
    "q46_trailing_window",
    """WITH o AS (SELECT o_orderkey, o_custkey,
      |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS od,
      |    CAST(ROUND(o_totalprice*100) AS BIGINT) AS cents
      |  FROM orders)
      |SELECT o_orderkey, o_custkey, CAST(od AS BIGINT) AS order_day,
      |  CAST(SUM(cents) OVER w AS BIGINT)/100.0 AS spend_30d,
      |  CAST(COUNT(*) OVER w AS BIGINT) AS n_orders_30d
      |FROM o
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY od RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d).select(
      col("o_orderkey"), col("o_custkey"),
      datediff(col("o_orderdate").cast("date"), to_date(lit("1970-01-01"))).cast("long").as("od"),
      cents(col("o_totalprice")).as("cents"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("od")).rangeBetween(-29, 0)
    o.select(
      col("o_orderkey"), col("o_custkey"), col("od").as("order_day"),
      (sum(col("cents")).over(w) / 100.0).as("spend_30d"),
      count(lit(1)).over(w).as("n_orders_30d"))
  }

  // ---------------------------------------------------------------- A51
  /** Gaps-and-islands: per-user ACTIVITY STREAKS (runs of consecutive
    * active days) — the classic sequence-reconstruction idiom (island id =
    * day − row_number over the per-user distinct-day grid) that no single
    * window function expresses directly, and the engagement metric
    * (current/longest streak) every product warehouse reports. Events
    * collapse FIRST to the (user, day) grid (one hash aggregate), so the
    * window sorts at most days-per-user rows per partition; the island key
    * is a scalar; streak rollup is a second hash aggregate. Nothing
    * global, nothing pairwise. */
  val q51 = Q(
    "q51_streaks",
    s"""WITH ev AS ($evSql),
      |grid AS (SELECT DISTINCT user_id, sec//86400 AS day FROM ev),
      |isl AS (SELECT user_id, day,
      |    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
      |  FROM grid),
      |streaks AS (SELECT user_id, island,
      |    MIN(day) AS start_day, MAX(day) AS end_day,
      |    COUNT(*) AS len
      |  FROM isl GROUP BY user_id, island)
      |SELECT user_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_streaks,
      |  CAST(MAX(len) AS BIGINT) AS longest_streak,
      |  CAST(SUM(len) AS BIGINT) AS active_days,
      |  CAST(max_by(start_day, end_day) AS BIGINT) AS last_streak_start,
      |  CAST(MAX(end_day) AS BIGINT) AS last_active_day
      |FROM streaks GROUP BY user_id""".stripMargin) { (s, d) =>
    val grid = ev(s, d).select(col("user_id"), expr("sec div 86400").as("day")).distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val streaks = grid
      .withColumn("island", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("day")).as("start_day"), max(col("day")).as("end_day"),
        count(lit(1)).as("len"))
    streaks.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_streaks"),
        max(col("len")).as("longest_streak"),
        sum(col("len")).as("active_days"),
        max_by(col("start_day"), col("end_day")).as("last_streak_start"),
        max(col("end_day")).as("last_active_day"))
  }

  val queries: Seq[Q] = Seq(q13, q14, q18, q19, q20, q22, q30, q41, q43, q44, q45, q46, q51)
}
