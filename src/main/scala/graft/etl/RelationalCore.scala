package graft.etl

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.operators.BroadcastGuard.dimBroadcast
import graft.functions.Exact._

/** A-series §2: the reference's relational surface re-expressed Spark-first
  * on the TPC-H-ish test tables.
  *
  * Reference analogs are cited per query (file:line in /root/reference).
  * Design rules: declarative DataFrame plans only, dims broadcast explicitly,
  * money aggregated in exact integer cents/micros (see [[graft.functions.Exact]]),
  * no collect() anywhere.
  */
object RelationalCore {

  /** Royalty-rate analog: the reference derives a per-book-type royalty rate
    * (dw4_book_dim.py:233-242). Here the "book type" is p_type. */
  private val rateSql =
    "CASE p_type WHEN 'PROMO' THEN CAST(0.25 AS DOUBLE) WHEN 'ECONOMY' THEN CAST(0.15 AS DOUBLE) WHEN 'STANDARD' THEN CAST(0.10 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END"
  private def rateCol = when(col("p_type") === "PROMO", 0.25)
    .when(col("p_type") === "ECONOMY", 0.15)
    .when(col("p_type") === "STANDARD", 0.10)
    .otherwise(0.0)

  // ---------------------------------------------------------------- A1
  /** Filter + groupBy + multi-aggregate. Reference: the fact scripts'
    * groupby-agg blocks (dw5_order_royalty_fact.py:170-186, 497-530). */
  val q01 = Q(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT)/100.0 AS sum_qty,
      |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT)/100.0 AS sum_base_price,
      |  CAST(SUM(CAST(ROUND((l_extendedprice*(1-l_discount))*1000000) AS BIGINT)) AS BIGINT)/1000000.0 AS sum_disc_price,
      |  CAST(SUM(CAST(ROUND(((l_extendedprice*(1-l_discount))*(1+l_tax))*1000000) AS BIGINT)) AS BIGINT)/1000000.0 AS sum_charge,
      |  COUNT(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumCents(col("l_quantity")).as("sum_qty"),
        sumCents(col("l_extendedprice")).as("sum_base_price"),
        sumMicros(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        sumMicros((col("l_extendedprice") * (lit(1) - col("l_discount"))) * (lit(1) + col("l_tax"))).as("sum_charge"),
        count(lit(1)).as("count_order"))
  }

  // ---------------------------------------------------------------- A2
  /** Order-line fact: multi-way dim join + per-row derived columns.
    * Reference: FACT_Order (dw5_order_royalty_fact.py:886-1294) — line-item
    * grain, dims merged in, conditional derived columns.
    * Scale: nation/region are bounded dims → broadcast; lineitem⋈orders is a
    * fact-fact equi-join on the natural key (shuffle, AQE-managed). */
  val q02 = Q(
    "q02_fact_order",
    """SELECT l.l_orderkey AS order_key, l.l_linenumber AS line_number,
      |  strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
      |  n.n_name AS nation, r.r_name AS region, c.c_mktsegment AS segment,
      |  CAST(ROUND(l_quantity) AS BIGINT) AS quantity,
      |  CAST(ROUND((l_extendedprice*(1-l_discount))*1000000) AS BIGINT)/1000000.0 AS net_revenue,
      |  CAST(ROUND((l_extendedprice*l_discount)*1000000) AS BIGINT)/1000000.0 AS discount_amount,
      |  CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS is_wholesale,
      |  CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS is_return,
      |  CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'expedite'
      |       WHEN o.o_orderpriority = '3-MEDIUM' THEN 'standard' ELSE 'deferred' END AS priority_class
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select(
        col("l_orderkey").as("order_key"),
        col("l_linenumber").as("line_number"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("n_name").as("nation"),
        col("r_name").as("region"),
        col("c_mktsegment").as("segment"),
        round(col("l_quantity")).cast("long").as("quantity"),
        (micros(col("l_extendedprice") * (lit(1) - col("l_discount"))) / 1e6).as("net_revenue"),
        (micros(col("l_extendedprice") * col("l_discount")) / 1e6).as("discount_amount"),
        when(col("c_mktsegment") === "BUILDING", 1).otherwise(0).as("is_wholesale"),
        when(col("l_returnflag") === "R", 1).otherwise(0).as("is_return"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "expedite")
          .when(col("o_orderpriority") === "3-MEDIUM", "standard")
          .otherwise("deferred").as("priority_class"))
  }

  // ---------------------------------------------------------------- A3
  /** Royalty fact: conditional revenue splits, wholesale/returns exclusion,
    * rate × qualified revenue. Reference: FACT_Royalty
    * (dw5_order_royalty_fact.py:653-722) — Royalty_Qualified_Revenue excludes
    * wholesale revenue and returns; Royalty_Paid = qualified × rate.
    * "Wholesale customer" analog: c_mktsegment = 'BUILDING'; "return" analog:
    * l_returnflag = 'R'; "book type"/rate analog: p_type (see rateCol). */
  val q03 = Q(
    "q03_fact_royalty",
    s"""SELECT p.p_brand AS brand, p.p_type AS book_type,
      |  strftime(o.o_orderdate, '%Y-%m') AS month,
      |  $rateSql AS royalty_rate,
      |  CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS qty_shipped,
      |  CAST(SUM(CASE WHEN c.c_mktsegment='BUILDING' THEN CAST(ROUND(l_quantity) AS BIGINT) ELSE 0 END) AS BIGINT) AS qty_wholesale,
      |  CAST(SUM(CASE WHEN l.l_returnflag='R' THEN CAST(ROUND(l_quantity) AS BIGINT) ELSE 0 END) AS BIGINT) AS qty_returned,
      |  CAST(SUM(CAST(ROUND((l_extendedprice*(1-l_discount))*1000000) AS BIGINT)) AS BIGINT)/1000000.0 AS revenue_gross,
      |  CAST(SUM(CASE WHEN c.c_mktsegment='BUILDING' THEN CAST(ROUND((l_extendedprice*(1-l_discount))*1000000) AS BIGINT) ELSE 0 END) AS BIGINT)/1000000.0 AS revenue_wholesale,
      |  CAST(SUM(CASE WHEN l.l_returnflag='R' THEN CAST(ROUND((l_extendedprice*(1-l_discount))*1000000) AS BIGINT) ELSE 0 END) AS BIGINT)/1000000.0 AS returns_in_revenue,
      |  CAST(SUM(CASE WHEN ($rateSql) > 0 AND c.c_mktsegment<>'BUILDING' AND l.l_returnflag<>'R' THEN CAST(ROUND((l_extendedprice*(1-l_discount))*1000000) AS BIGINT) ELSE 0 END) AS BIGINT)/1000000.0 AS royalty_qualified_revenue,
      |  CAST(SUM(CASE WHEN ($rateSql) > 0 AND c.c_mktsegment<>'BUILDING' AND l.l_returnflag<>'R' THEN CAST(ROUND(((l_extendedprice*(1-l_discount))*($rateSql))*1000000) AS BIGINT) ELSE 0 END) AS BIGINT)/1000000.0 AS royalty_paid
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN part p ON l.l_partkey = p.p_partkey
      |GROUP BY p.p_brand, p.p_type, strftime(o.o_orderdate, '%Y-%m'), $rateSql""".stripMargin) { (s, d) =>
    val net = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val qty = round(col("l_quantity")).cast("long")
    val qualified = rateCol > 0 && col("c_mktsegment") =!= "BUILDING" && col("l_returnflag") =!= "R"
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      // part grows with SF: size-guarded hint, not an unconditional override
      .join(dimBroadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .groupBy(
        col("p_brand").as("brand"),
        col("p_type").as("book_type"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        rateCol.as("royalty_rate"))
      .agg(
        sum(qty).as("qty_shipped"),
        sum(when(col("c_mktsegment") === "BUILDING", qty).otherwise(0L)).as("qty_wholesale"),
        sum(when(col("l_returnflag") === "R", qty).otherwise(0L)).as("qty_returned"),
        (sum(micros(net)) / 1e6).as("revenue_gross"),
        (sum(when(col("c_mktsegment") === "BUILDING", micros(net)).otherwise(0L)) / 1e6).as("revenue_wholesale"),
        (sum(when(col("l_returnflag") === "R", micros(net)).otherwise(0L)) / 1e6).as("returns_in_revenue"),
        (sum(when(qualified, micros(net)).otherwise(0L)) / 1e6).as("royalty_qualified_revenue"),
        (sum(when(qualified, micros(net * rateCol)).otherwise(0L)) / 1e6).as("royalty_paid"))
  }

  // ---------------------------------------------------------------- A4
  /** Summary report over the royalty fact: quarter × payee rollup.
    * Reference: fr2 Royalty_Summary_Report (dw5_order_royalty_fact.py:750-772).
    * "Royalty author" analog: the customer's nation. */
  val q04 = Q(
    "q04_summary_report",
    s"""SELECT CAST(year(o.o_orderdate) AS BIGINT) AS year,
      |  'Q' || CAST(quarter(o.o_orderdate) AS VARCHAR) AS quarter,
      |  n.n_name AS payee,
      |  CAST(SUM(CASE WHEN ($rateSql) > 0 AND c.c_mktsegment<>'BUILDING' AND l.l_returnflag<>'R' THEN CAST(ROUND(l_quantity) AS BIGINT) ELSE 0 END) AS BIGINT) AS total_qty,
      |  CAST(SUM(CASE WHEN ($rateSql) > 0 AND c.c_mktsegment<>'BUILDING' AND l.l_returnflag<>'R' THEN CAST(ROUND((l_extendedprice*(1-l_discount))*1000000) AS BIGINT) ELSE 0 END) AS BIGINT)/1000000.0 AS total_item_usd,
      |  CAST(SUM(CASE WHEN ($rateSql) > 0 AND c.c_mktsegment<>'BUILDING' AND l.l_returnflag<>'R' THEN CAST(ROUND(((l_extendedprice*(1-l_discount))*($rateSql))*1000000) AS BIGINT) ELSE 0 END) AS BIGINT)/1000000.0 AS payout
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN part p ON l.l_partkey = p.p_partkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY 1, 2, 3""".stripMargin) { (s, d) =>
    val net = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val qty = round(col("l_quantity")).cast("long")
    val qualified = rateCol > 0 && col("c_mktsegment") =!= "BUILDING" && col("l_returnflag") =!= "R"
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(dimBroadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(
        year(col("o_orderdate")).cast("long").as("year"),
        concat(lit("Q"), quarter(col("o_orderdate")).cast("string")).as("quarter"),
        col("n_name").as("payee"))
      .agg(
        sum(when(qualified, qty).otherwise(0L)).as("total_qty"),
        (sum(when(qualified, micros(net)).otherwise(0L)) / 1e6).as("total_item_usd"),
        (sum(when(qualified, micros(net * rateCol)).otherwise(0L)) / 1e6).as("payout"))
  }

  // ---------------------------------------------------------------- A5
  /** Split allocation: co-payee rows are duplicated, one per payee.
    * Reference: split royalties fr7–fr10 (dw5_order_royalty_fact.py:808-838)
    * duplicate co-author rows with per-author names. Spark-first: build the
    * payee array and explode — one pass, no N dataframe copies + union. */
  val q05 = Q(
    "q05_split_allocation",
    """SELECT s_suppkey AS supp_key,
      |  unnest(CASE WHEN s_suppkey % 2 = 0
      |              THEN [s_name || ' & partner A', s_name || ' & partner B']
      |              ELSE [s_name] END) AS split_payee,
      |  CAST(SUM(CAST(ROUND((l_extendedprice*(1-l_discount))*1000000) AS BIGINT)) AS BIGINT)/1000000.0 AS revenue
      |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |GROUP BY s_suppkey, s_name""".stripMargin) { (s, d) =>
    val net = col("l_extendedprice") * (lit(1) - col("l_discount"))
    Tables.lineitem(s, d)
      .join(dimBroadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey").as("supp_key"), col("s_name"))
      .agg((sum(micros(net)) / 1e6).as("revenue"))
      .withColumn("split_payee",
        explode(when(col("supp_key") % 2 === 0,
            array(concat(col("s_name"), lit(" & partner A")), concat(col("s_name"), lit(" & partner B"))))
          .otherwise(array(col("s_name")))))
      .select(col("supp_key"), col("split_payee"), col("revenue"))
  }

  // ---------------------------------------------------------------- A6
  /** Incremental merge: new increment replaces matching archive rows.
    * Reference: dw3_merge_inc.py:109-118 — `~archive.key.isin(increment.key)`
    * then concat. Spark-first: left_anti join + unionByName (no IN-list
    * collect; scales as a shuffle join). The "increment" is simulated as a
    * re-pull of recent orders whose status got lower-cased upstream. */
  val q06 = Q(
    "q06_incremental_merge",
    """WITH inc AS (
      |  SELECT o_orderkey, lower(o_orderstatus) AS status,
      |         strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      |         CAST(ROUND(o_totalprice*100) AS BIGINT)/100.0 AS total_price,
      |         o_orderpriority AS priority
      |  FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01')
      |SELECT o_orderkey, o_orderstatus AS status,
      |       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      |       CAST(ROUND(o_totalprice*100) AS BIGINT)/100.0 AS total_price,
      |       o_orderpriority AS priority
      |FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM inc)
      |UNION ALL SELECT * FROM inc""".stripMargin) { (s, d) =>
    val ord = Tables.orders(s, d).select(
      col("o_orderkey"),
      col("o_orderstatus").as("status"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
      (cents(col("o_totalprice")) / 100.0).as("total_price"),
      col("o_orderpriority").as("priority"))
    val inc = Tables.orders(s, d).filter(col("o_orderdate") >= lit("2001-01-01")).select(
      col("o_orderkey"),
      lower(col("o_orderstatus")).as("status"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
      (cents(col("o_totalprice")) / 100.0).as("total_price"),
      col("o_orderpriority").as("priority"))
    ord.join(inc.select("o_orderkey"), Seq("o_orderkey"), "left_anti").unionByName(inc)
  }

  // ---------------------------------------------------------------- A7
  /** Rule-based categorization: ordered first-match CASE cascade.
    * Reference: Products_Dim np.select (dw2_wc_increment.py:88-109) — ordered
    * conditions over category/shipping-class/name → product category. */
  val q07 = Q(
    "q07_dim_product",
    """SELECT p_partkey, p_name, p_brand, p_type, p_size,
      |  CASE WHEN p_type = 'PROMO' THEN 'Promotional'
      |       WHEN p_size >= 40 THEN 'Oversize'
      |       WHEN p_type IN ('STANDARD','MEDIUM') THEN 'Core'
      |       WHEN p_brand = 'Brand#1' THEN 'House'
      |       ELSE 'Other' END AS category,
      |  CASE WHEN p_retailprice < 500 THEN 'budget'
      |       WHEN p_retailprice < 1200 THEN 'mid'
      |       ELSE 'premium' END AS price_band
      |FROM part""".stripMargin) { (s, d) =>
    Tables.part(s, d).select(
      col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
      when(col("p_type") === "PROMO", "Promotional")
        .when(col("p_size") >= 40, "Oversize")
        .when(col("p_type").isin("STANDARD", "MEDIUM"), "Core")
        .when(col("p_brand") === "Brand#1", "House")
        .otherwise("Other").as("category"),
      when(col("p_retailprice") < 500, "budget")
        .when(col("p_retailprice") < 1200, "mid")
        .otherwise("premium").as("price_band"))
  }

  // ---------------------------------------------------------------- A8
  /** Per-key summary re-joined to detail rows.
    * Reference: pd_sum per-order totals merged back to line items
    * (dw2_wc_increment.py:457-479). Spark-first: partial-agg-friendly groupBy
    * then equi-join back (both sides share the l_orderkey shuffle key, so AQE
    * can reuse the exchange). */
  val q08 = Q(
    "q08_per_group_summary_join",
    """WITH order_summary AS (
      |  SELECT l_orderkey,
      |    CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS order_items,
      |    CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS order_products,
      |    CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT)/100.0 AS order_subtotal
      |  FROM lineitem GROUP BY l_orderkey)
      |SELECT l.l_orderkey, l.l_linenumber, l.l_partkey,
      |       s.order_items, s.order_products, s.order_subtotal
      |FROM lineitem l JOIN order_summary s ON l.l_orderkey = s.l_orderkey""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val summary = li.groupBy(col("l_orderkey"))
      .agg(
        sum(round(col("l_quantity")).cast("long")).as("order_items"),
        countDistinct(col("l_partkey")).as("order_products"),
        sumCents(col("l_extendedprice")).as("order_subtotal"))
    li.select("l_orderkey", "l_linenumber", "l_partkey")
      .join(summary, Seq("l_orderkey"))
  }

  // ---------------------------------------------------------------- A9
  /** Typed null-repair cascade after an enriching left join.
    * Reference: the wc5 fillna matrix (dw5_order_royalty_fact.py:430-483) —
    * numeric→0, strings→'NA'/'Error - Missing', keys→sentinels. */
  val q09 = Q(
    "q09_fillna_cascade",
    """SELECT o.o_orderkey,
      |  COALESCE(c.c_mktsegment, 'Error - Missing') AS segment,
      |  COALESCE(c.c_acctbal, 0.0) AS acctbal,
      |  COALESCE(c.c_name, 'Missing - ' || CAST(o.o_orderkey AS VARCHAR)) AS cust_name,
      |  CASE WHEN c.c_custkey IS NULL THEN '9999Q99'
      |       ELSE CAST(year(o.o_orderdate) AS VARCHAR) || 'Q' || CAST(quarter(o.o_orderdate) AS VARCHAR) END AS quarter_key,
      |  COALESCE(CAST(c.c_nationkey AS BIGINT), -1) AS nation_key
      |FROM orders o
      |LEFT JOIN (SELECT * FROM customer WHERE c_custkey % 3 = 0) c
      |  ON o.o_custkey = c.c_custkey""".stripMargin) { (s, d) =>
    val cust = Tables.customer(s, d).filter(col("c_custkey") % 3 === 0)
    Tables.orders(s, d)
      .join(cust, col("o_custkey") === col("c_custkey"), "left")
      .select(
        col("o_orderkey"),
        coalesce(col("c_mktsegment"), lit("Error - Missing")).as("segment"),
        coalesce(col("c_acctbal"), lit(0.0)).as("acctbal"),
        coalesce(col("c_name"), concat(lit("Missing - "), col("o_orderkey").cast("string"))).as("cust_name"),
        when(col("c_custkey").isNull, "9999Q99")
          .otherwise(concat(year(col("o_orderdate")).cast("string"), lit("Q"), quarter(col("o_orderdate")).cast("string")))
          .as("quarter_key"),
        coalesce(col("c_nationkey").cast("long"), lit(-1L)).as("nation_key"))
  }

  // ---------------------------------------------------------------- A26
  /** Bundle revenue-share attribution. Reference: dw5_order_royalty_fact.py:
    * 375-408 — each line item is joined to its PARENT bundle row ("Bundled
    * By" → unique bundle totals) and `Revenue_Share_Book/NonBook × Order Line
    * Total_y` is attributed under an np.select guard (bundle rows themselves
    * get 0). Here each multi-line order plays the bundle: line 1 is the
    * bundle row, the other lines are its components ("book" when l_partkey is
    * even, else "merch"); books carry weight 2, merch weight 1, and each
    * component receives share = weight/Σweights of the bundle row's net
    * total — so the bundle's revenue is conserved across its components
    * (proved by BundleConservationSpec).
    *
    * Scale: the parent lookup and the weight sum are both equi-keyed on
    * l_orderkey — the same shuffle key as the detail rows, so AQE reuses one
    * exchange; the weight aggregation is partial-agg friendly; no windows,
    * no collect. */
  val q26 = Q(
    "q26_bundle_attribution",
    """WITH li AS (
      |  SELECT l_orderkey, l_linenumber, l_partkey,
      |    CAST(ROUND((l_extendedprice*(1-l_discount))*1000000) AS BIGINT) AS net_micros,
      |    CASE WHEN l_linenumber = 1 THEN 'bundle'
      |         WHEN l_partkey % 2 = 0 THEN 'book' ELSE 'merch' END AS category
      |  FROM lineitem),
      |parent AS (SELECT l_orderkey, MIN(net_micros) AS total_micros
      |           FROM li WHERE l_linenumber = 1 GROUP BY l_orderkey),
      |wsum AS (SELECT l_orderkey,
      |    CAST(SUM(CASE WHEN l_partkey % 2 = 0 THEN 2 ELSE 1 END) AS BIGINT) AS total_weight
      |  FROM li WHERE l_linenumber > 1 GROUP BY l_orderkey)
      |SELECT li.l_orderkey AS order_key, li.l_linenumber AS line_number, li.category,
      |  CASE WHEN li.category = 'bundle' THEN CAST(0 AS DOUBLE)
      |       ELSE ROUND((CASE WHEN li.category = 'book' THEN CAST(2 AS DOUBLE) ELSE CAST(1 AS DOUBLE) END) / w.total_weight, 6) END AS share,
      |  CASE WHEN li.category = 'bundle' OR p.l_orderkey IS NULL THEN CAST(0 AS DOUBLE)
      |       ELSE CAST((p.total_micros * (CASE WHEN li.category = 'book' THEN 2 ELSE 1 END)) // (w.total_weight * 100) AS BIGINT)/10000.0 END AS attributed
      |FROM li
      |LEFT JOIN parent p ON li.l_orderkey = p.l_orderkey
      |LEFT JOIN wsum w ON li.l_orderkey = w.l_orderkey""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
      micros(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_micros"),
      when(col("l_linenumber") === 1, "bundle")
        .when(col("l_partkey") % 2 === 0, "book")
        .otherwise("merch").as("category"))
    // The reference dedups its bundle lookup before joining
    // (unique_bundles = drop_duplicates(subset=['Bundle ID'])) — and the
    // synthetic lineitem does repeat (orderkey, linenumber) pairs, so the
    // parent table must be unique per order or the join fans out. MIN makes
    // the survivor deterministic (content-addressed keep-first).
    val parent = li.filter(col("l_linenumber") === 1)
      .groupBy("l_orderkey")
      .agg(min(col("net_micros")).as("total_micros"))
    val wsum = li.filter(col("l_linenumber") > 1)
      .groupBy("l_orderkey")
      .agg(sum(when(col("l_partkey") % 2 === 0, 2L).otherwise(1L)).as("total_weight"))
    val weight = when(col("category") === "book", 2L).otherwise(1L)
    // Attribution stays in integer micro-units with floor division — the
    // numerator (micros × weight) is far below 2^53, and the quotient's
    // distance to any wrong integer is >= 1/divisor >> one ulp, so
    // floor(double-division) is bit-exact in both engines. A double
    // `round(share*total, 4)` lands on 4-dp midpoints where engine rounding
    // modes disagree.
    val attributed = floor((col("total_micros") * weight).cast("double") /
      (col("total_weight") * 100)).cast("long") / 10000.0
    val share = round(weight.cast("double") / col("total_weight"), 6)
    li.join(parent, Seq("l_orderkey"), "left")
      .join(wsum, Seq("l_orderkey"), "left")
      .select(
        col("l_orderkey").as("order_key"),
        col("l_linenumber").as("line_number"),
        col("category"),
        when(col("category") === "bundle", 0.0).otherwise(share).as("share"),
        when(col("category") === "bundle" || col("total_micros").isNull, 0.0)
          .otherwise(attributed).as("attributed"))
  }

  // ---------------------------------------------------------------- A47
  /** Two-sided RECONCILIATION report — the integrity check every warehouse
    * runs between a header table and its detail rollup: orders FULL OUTER
    * JOIN the per-order lineitem revenue rollup, every key classified
    * (`matched` / `drift` / `left_only` / `right_only`) with the signed
    * difference. On this data the classes are genuinely informative: 257
    * orders carry no lineitems (left_only), no lineitem is orphaned
    * (right_only = 0 — referential integrity PROVEN by the output, not
    * assumed), and header totals systematically drift from the detail
    * rollup. All money in integer micro-units end-to-end, so `matched`
    * means bit-equal, not within-epsilon.
    *
    * Scale: one equi-keyed full outer shuffle join on the order key after a
    * partial-agg rollup of the detail side — both inputs arrive at the join
    * already reduced to one row per key; classification is a scalar
    * projection. */
  val q47 = Q(
    "q47_reconcile",
    """WITH o AS (SELECT o_orderkey, CAST(ROUND(o_totalprice*1000000) AS BIGINT) AS order_micros
      |          FROM orders),
      |r AS (SELECT l_orderkey,
      |        CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*(1+l_tax)*1000000) AS BIGINT)) AS BIGINT) AS line_micros,
      |        CAST(COUNT(*) AS BIGINT) AS n_lines
      |      FROM lineitem GROUP BY l_orderkey)
      |SELECT COALESCE(o.o_orderkey, r.l_orderkey) AS order_key,
      |  CASE WHEN r.l_orderkey IS NULL THEN 'left_only'
      |       WHEN o.o_orderkey IS NULL THEN 'right_only'
      |       WHEN o.order_micros = r.line_micros THEN 'matched'
      |       ELSE 'drift' END AS status,
      |  o.order_micros, r.line_micros,
      |  COALESCE(o.order_micros, 0) - COALESCE(r.line_micros, 0) AS diff_micros,
      |  COALESCE(r.n_lines, 0) AS n_lines
      |FROM o FULL OUTER JOIN r ON o.o_orderkey = r.l_orderkey""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), micros(col("o_totalprice")).as("order_micros"))
    val r = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(micros(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax")))).as("line_micros"),
        count(lit(1)).as("n_lines"))
    o.join(r, col("o_orderkey") === col("l_orderkey"), "full_outer")
      .select(
        coalesce(col("o_orderkey"), col("l_orderkey")).as("order_key"),
        when(col("l_orderkey").isNull, "left_only")
          .when(col("o_orderkey").isNull, "right_only")
          .when(col("order_micros") === col("line_micros"), "matched")
          .otherwise("drift").as("status"),
        col("order_micros"), col("line_micros"),
        (coalesce(col("order_micros"), lit(0L)) - coalesce(col("line_micros"), lit(0L)))
          .as("diff_micros"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"))
  }

  // ---------------------------------------------------------------- A54
  /** INCREMENTAL summary maintenance — the algebraic heart of every
    * nightly-refresh warehouse (the reference's whole pipeline is an
    * incremental merge; this is the same idea applied to the AGGREGATE
    * layer): the standing summary of the archive is combined with the
    * increment's partial aggregate — sums and counts merge by addition,
    * min/max by min/max, avg is derived from merged sum/count — so the
    * refresh costs O(increment), never an archive rescan. Split: increment
    * = l_orderkey % 10 = 7 (the archive summary is itself computed here,
    * standing in for the stored artifact).
    *
    * The oracle is the POINT: it computes the summary with one full-table
    * GROUP BY — the hash compare therefore PROVES the merge is exactly
    * lossless (mergeable-aggregate algebra, not an approximation). Money
    * flows through integer cents (Exact) on both paths so the merged sums
    * are bit-equal, not merely close.
    *
    * Scale: two grouped partial aggregates (the increment one tiny) and a
    * |groups|-sized merge — the plan a 100 TB nightly refresh wants. */
  val q54 = Q(
    "q54_incremental_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(MIN(CAST(l_quantity AS BIGINT)) AS BIGINT) AS min_qty,
      |  CAST(MAX(CAST(l_quantity AS BIGINT)) AS BIGINT) AS max_qty,
      |  ROUND(CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*), 4) AS avg_qty
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    def partial(rows: org.apache.spark.sql.DataFrame) = rows
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast("long").as("qty"),
        cents(col("l_extendedprice")).as("price_c"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("qty")).as("sum_qty"), sum(col("price_c")).as("sum_price_cents"),
        count(lit(1)).as("n_rows"),
        min(col("qty")).as("min_qty"), max(col("qty")).as("max_qty"))
    val archive = partial(li.filter(col("l_orderkey") % 10 =!= 7))
    val increment = partial(li.filter(col("l_orderkey") % 10 === 7))
    archive.unionByName(increment) // the stored summary + the delta's partial
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("sum_qty")).as("sum_qty"),
        sum(col("sum_price_cents")).as("sum_price_cents"),
        sum(col("n_rows")).as("n_rows"),
        min(col("min_qty")).as("min_qty"), max(col("max_qty")).as("max_qty"))
      .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
        col("sum_price_cents"), col("n_rows"), col("min_qty"), col("max_qty"),
        round(col("sum_qty").cast("double") / col("n_rows"), 4).as("avg_qty"))
  }

  // ---------------------------------------------------------------- A57
  /** Declarative data-quality EXPECTATIONS audit — the contract gate in
    * front of every load (the reference enforces dtypes via its dtype_spec
    * dict at read time; this is the row-content half of that contract,
    * Deequ/Great-Expectations shape): each check is a named rule
    * (completeness, key uniqueness, value range, domain membership,
    * referential integrity) and the output is one row per check with rows
    * scanned, violation count, and pass/fail — the relation a CI gate or
    * G8's write-audit-publish audit step consumes.
    *
    * The corpus makes the audit honest: the naive (l_orderkey,
    * l_linenumber) PK expectation FAILS (14k dup pairs at sf0.01 — the
    * composite is genuinely not a key in this generator) and 257 orders
    * have no lineitems, while the other seven checks pass — both findings
    * q47's reconcile surfaced are now pinned as named expectations.
    *
    * Scale: ALL single-table checks per table fold into ONE aggregate pass
    * (conditional sums + count-distinct share the scan — Deequ's core
    * trick), then fan out to check rows via an explode of a literal struct
    * array over the 1-row aggregate (no re-scan per check). The two
    * referential checks are each one left join onto the DISTINCT key set
    * of the other side (broadcast-sized after the distinct) + the same
    * shared-scan aggregate. Nothing is ever row-materialized. */
  val q57 = Q(
    "q57_expectations",
    """WITH o AS (SELECT
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS v_uniq,
      |    CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null,
      |    CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
      |    CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS v_dom
      |  FROM orders),
      |l AS (SELECT
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS v_pk,
      |    CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
      |    CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS v_disc
      |  FROM lineitem),
      |orph AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v
      |  FROM lineitem li LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
      |    ON li.l_orderkey = o.o_orderkey),
      |chl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN lk.l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v
      |  FROM orders o LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem) lk
      |    ON o.o_orderkey = lk.l_orderkey)
      |SELECT check_name, scanned, violations,
      |  CASE WHEN violations = 0 THEN 'pass' ELSE 'fail' END AS status
      |FROM (
      |  SELECT 'orders.o_orderkey.unique' AS check_name, n AS scanned, v_uniq AS violations FROM o
      |  UNION ALL SELECT 'orders.o_custkey.complete', n, v_null FROM o
      |  UNION ALL SELECT 'orders.o_totalprice.positive', n, v_price FROM o
      |  UNION ALL SELECT 'orders.o_orderstatus.domain', n, v_dom FROM o
      |  UNION ALL SELECT 'lineitem.pk.unique', n, v_pk FROM l
      |  UNION ALL SELECT 'lineitem.l_quantity.range', n, v_qty FROM l
      |  UNION ALL SELECT 'lineitem.l_discount.range', n, v_disc FROM l
      |  UNION ALL SELECT 'lineitem.l_orderkey.ref_orders', n, v FROM orph
      |  UNION ALL SELECT 'orders.has_lineitems', n, v FROM chl)""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
    // single-table checks: the shared one-scan audit core (also the
    // streaming gate's spelling — see streaming.AuditStream)
    val oChecks = Expectations.audit(o,
      predicates = Seq(
        "orders.o_custkey.complete" -> col("o_custkey").isNull,
        "orders.o_totalprice.positive" -> (col("o_totalprice") <= 0),
        "orders.o_orderstatus.domain" -> !col("o_orderstatus").isin("O", "F", "P")),
      uniqueKeys = Seq("orders.o_orderkey.unique" -> Seq("o_orderkey")))
    val lChecks = Expectations.audit(li,
      predicates = Seq(
        "lineitem.l_quantity.range" -> (col("l_quantity") < 1 || col("l_quantity") > 50),
        "lineitem.l_discount.range" -> (col("l_discount") < 0 || col("l_discount") > 0.1)),
      uniqueKeys = Seq("lineitem.pk.unique" -> Seq("l_orderkey", "l_linenumber")))
    // referential checks: one left join each onto the other side's distinct
    // key set; scanned and violations come from the same joined aggregate
    def refCheck(name: String, left: org.apache.spark.sql.DataFrame, leftKey: String,
        right: org.apache.spark.sql.DataFrame, rightKey: String) =
      left.select(col(leftKey))
        .join(right.select(col(rightKey)).distinct(), col(leftKey) === col(rightKey), "left")
        .agg(count(lit(1)).as("scanned"),
          sum(when(col(rightKey).isNull, 1L).otherwise(0L)).as("violations"))
        .select(lit(name).as("check_name"), col("scanned"), col("violations"),
          when(col("violations") === 0, "pass").otherwise("fail").as("status"))
    oChecks.unionByName(lChecks)
      .unionByName(refCheck("lineitem.l_orderkey.ref_orders", li, "l_orderkey", o, "o_orderkey"))
      .unionByName(refCheck("orders.has_lineitems", o, "o_orderkey", li, "l_orderkey"))
  }

  // ---------------------------------------------------------------- A60
  /** PRINTABLE royalty report — the reference's presentation layer, the one
    * reference workflow stage q04 reproduced numerically but not visually.
    * fr4 (dw5_order_royalty_fact.py:779-810) regroups the royalty fact at
    * payee × quarter × month × title × type × rate grain and RENAMES the
    * measure columns to the human report vocabulary (Total_Qty,
    * Total_Item_USD, …, Payout), sorted by the payee name
    * (`.sort_values('Royalty_Author_Name')`, :800). Same here: finer grain
    * than q04's summary, human-cased presentation names, deterministic
    * payee-first ordering. [[graft.sources.ReportExport.writeCsv]] is the
    * `save_bucket(fr4, …)` analog (dw5_order_royalty_fact.py:845-859) that
    * delivers it as a single ordered CSV.
    *
    * Scale: the aggregate is the same partial-agg join tree as q03/q04; the
    * ORDER BY is one extra shuffle over REPORT-grain rows (bounded by the
    * dimension cross product, not the fact), which is what makes a global
    * sort admissible here and nowhere else. */
  val q60 = Q(
    "q60_printable_report",
    s"""SELECT CAST(year(o.o_orderdate) AS VARCHAR) || 'Q' || CAST(quarter(o.o_orderdate) AS VARCHAR) AS "Quarter",
      |  n.n_name AS "Payee",
      |  strftime(o.o_orderdate, '%Y-%m') AS "Month",
      |  p.p_brand AS "Title",
      |  p.p_type AS "Book_Type",
      |  $rateSql AS "Royalty_Rate",
      |  CAST(SUM(CASE WHEN ($rateSql) > 0 AND c.c_mktsegment<>'BUILDING' AND l.l_returnflag<>'R' THEN CAST(ROUND(l_quantity) AS BIGINT) ELSE 0 END) AS BIGINT) AS "Total_Qty",
      |  CAST(SUM(CASE WHEN ($rateSql) > 0 AND c.c_mktsegment<>'BUILDING' AND l.l_returnflag<>'R' THEN CAST(ROUND((l_extendedprice*(1-l_discount))*1000000) AS BIGINT) ELSE 0 END) AS BIGINT)/1000000.0 AS "Total_Item_USD",
      |  CAST(SUM(CASE WHEN c.c_mktsegment<>'BUILDING' AND l.l_returnflag<>'R' THEN CAST(ROUND((l_extendedprice*(1-l_discount))*1000000) AS BIGINT) ELSE 0 END) AS BIGINT)/1000000.0 AS "Retail_Sales_USD",
      |  CAST(SUM(CASE WHEN l.l_returnflag='R' THEN CAST(ROUND((l_extendedprice*(1-l_discount))*1000000) AS BIGINT) ELSE 0 END) AS BIGINT)/1000000.0 AS "Returns_USD",
      |  CAST(SUM(CASE WHEN c.c_mktsegment='BUILDING' THEN CAST(ROUND(l_quantity) AS BIGINT) ELSE 0 END) AS BIGINT) AS "Wholesale_Quantity",
      |  CAST(SUM(CASE WHEN c.c_mktsegment<>'BUILDING' AND l.l_returnflag<>'R' THEN CAST(ROUND(l_quantity) AS BIGINT) ELSE 0 END) AS BIGINT) AS "Retail_Quantity",
      |  CAST(SUM(CASE WHEN ($rateSql) > 0 AND c.c_mktsegment<>'BUILDING' AND l.l_returnflag<>'R' THEN CAST(ROUND(((l_extendedprice*(1-l_discount))*($rateSql))*1000000) AS BIGINT) ELSE 0 END) AS BIGINT)/1000000.0 AS "Payout"
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN part p ON l.l_partkey = p.p_partkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY 1, 2, 3, 4, 5, 6""".stripMargin) { (s, d) =>
    val net = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val qty = round(col("l_quantity")).cast("long")
    val retail = col("c_mktsegment") =!= "BUILDING" && col("l_returnflag") =!= "R"
    val qualified = rateCol > 0 && retail
    // Scan-parallelism rescue opt-in (see Tables.rescueKey): this query's
    // fused scan+4-join+7-sum map stage measured 1.3 s on one core against
    // the single-row-group lineitem file; the rescue exchange parallelizes
    // it for one input-sized shuffle (full-suite: 3.20 s → 1.92 s).
    Tables.rescued(s, d, "lineitem", "l_orderkey")
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(dimBroadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(
        concat(year(col("o_orderdate")).cast("string"), lit("Q"),
          quarter(col("o_orderdate")).cast("string")).as("Quarter"),
        col("n_name").as("Payee"),
        date_format(col("o_orderdate"), "yyyy-MM").as("Month"),
        col("p_brand").as("Title"),
        col("p_type").as("Book_Type"),
        rateCol.as("Royalty_Rate"))
      .agg(
        sum(when(qualified, qty).otherwise(0L)).as("Total_Qty"),
        (sum(when(qualified, micros(net)).otherwise(0L)) / 1e6).as("Total_Item_USD"),
        (sum(when(retail, micros(net)).otherwise(0L)) / 1e6).as("Retail_Sales_USD"),
        (sum(when(col("l_returnflag") === "R", micros(net)).otherwise(0L)) / 1e6).as("Returns_USD"),
        sum(when(col("c_mktsegment") === "BUILDING", qty).otherwise(0L)).as("Wholesale_Quantity"),
        sum(when(retail, qty).otherwise(0L)).as("Retail_Quantity"),
        (sum(when(qualified, micros(net * rateCol)).otherwise(0L)) / 1e6).as("Payout"))
      .orderBy(col("Payee"), col("Quarter"), col("Month"), col("Title"), col("Book_Type"))
  }

  val queries: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q26, q47, q54,
    q57, q60)
}
