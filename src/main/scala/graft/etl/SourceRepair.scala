package graft.etl

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Messy-source repair surface (SURVEY §2 A31/A32): the reference's
  * string-typed dimension inputs arrive dirty — product names carry the book
  * type as a free-text suffix, royalty rates arrive as strings mixing '25%',
  * '0.25', '15' and NULL — and the pipeline repairs them with ordered
  * contains/regex cascades and dtype coercion before anything joins.
  *
  * The TPC-H-ish test tables have no such dirt, so each query SYNTHESIZES the
  * messy column deterministically from the key (identical expression in the
  * Spark plan and the DuckDB oracle) and then runs the repair — the synthesis
  * is test scaffolding; the repair cascade is the operator under test.
  *
  * Scale: both are pure per-row projection chains — single-pass, codegen'd,
  * no shuffle, no UDF; they pipeline into whatever scan feeds them.
  */
object SourceRepair {

  // ---------------------------------------------------------------- A31
  /** Book-type classification from product-name substrings — the reference's
    * ordered np.select cascade (dw3_merge_inc.py:148-157): split
    * 'Title - TypeString' on the first ' - ', fillna TypeString with 'Print',
    * then FIRST match wins: contains 'hardcover' → Hardcover; contains
    * 'audiobook' → Audiobook; `e-?book` regex on TypeString OR Title →
    * E-Book; 'paperback|print' regex → Print; default Print. All matching is
    * case-insensitive, and order matters ("Hardcover e-book sampler" is
    * Hardcover, not E-Book).
    *
    * The synthesized product_name cycles every classifier branch, including
    * a no-suffix case (null TypeString → fillna), a Title-side 'Ebook'
    * (matched only by the e-?book Title disjunct), and an unmatched suffix
    * (default branch, distinct from the 'print' contains branch). */
  val q31 = Q(
    "q31_book_type",
    """WITH named AS (
      |  SELECT p_partkey AS part_key,
      |    (CASE WHEN p_partkey % 14 = 5 THEN 'Ebook of ' || p_name ELSE p_name END)
      |    || (CASE p_partkey % 7
      |          WHEN 0 THEN ' - Hardcover Edition'
      |          WHEN 1 THEN ' - Audiobook (unabridged)'
      |          WHEN 2 THEN ' - E-book'
      |          WHEN 3 THEN ' - ebook bundle'
      |          WHEN 4 THEN ' - paperback'
      |          WHEN 6 THEN ' - Special Signed Edition'
      |          ELSE '' END) AS product_name
      |  FROM part),
      |pos AS (SELECT part_key, product_name,
      |  strpos(product_name, ' - ') AS p FROM named),
      |split AS (
      |  SELECT part_key, product_name,
      |    CASE WHEN p > 0 THEN substr(product_name, 1, p - 1)
      |         ELSE product_name END AS title,
      |    CASE WHEN p > 0 THEN substr(product_name, p + 3)
      |         ELSE 'Print' END AS type_string
      |  FROM pos)
      |SELECT part_key, product_name, title, type_string,
      |  CASE
      |    WHEN contains(lower(type_string), 'hardcover') THEN 'Hardcover'
      |    WHEN contains(lower(type_string), 'audiobook') THEN 'Audiobook'
      |    WHEN regexp_matches(type_string, 'e-?book', 'i')
      |      OR regexp_matches(title, 'e-?book', 'i') THEN 'E-Book'
      |    WHEN regexp_matches(type_string, 'paperback|print', 'i') THEN 'Print'
      |    ELSE 'Print' END AS book_type
      |FROM split""".stripMargin) { (s, d) =>
    val productName = concat(
      when(col("p_partkey") % 14 === 5, concat(lit("Ebook of "), col("p_name")))
        .otherwise(col("p_name")),
      when(col("p_partkey") % 7 === 0, " - Hardcover Edition")
        .when(col("p_partkey") % 7 === 1, " - Audiobook (unabridged)")
        .when(col("p_partkey") % 7 === 2, " - E-book")
        .when(col("p_partkey") % 7 === 3, " - ebook bundle")
        .when(col("p_partkey") % 7 === 4, " - paperback")
        .when(col("p_partkey") % 7 === 6, " - Special Signed Edition")
        .otherwise(""))
    val parts = split(col("product_name"), " - ", 2)
    Tables.part(s, d)
      .select(col("p_partkey").as("part_key"), productName.as("product_name"))
      .withColumn("title", get(parts, lit(0)))
      .withColumn("type_string", coalesce(get(parts, lit(1)), lit("Print")))
      .withColumn("book_type",
        when(lower(col("type_string")).contains("hardcover"), "Hardcover")
          .when(lower(col("type_string")).contains("audiobook"), "Audiobook")
          .when(col("type_string").rlike("(?i)e-?book")
            || col("title").rlike("(?i)e-?book"), "E-Book")
          .when(col("type_string").rlike("(?i)paperback|print"), "Print")
          .otherwise("Print"))
  }

  // ---------------------------------------------------------------- A32
  /** Rate-string normalization — the reference's royalty rates are STRINGS
    * ('25%', '0.15', '15', NULL…) repaired by: string fillna with a per-column
    * default (dw4_book_dim.py:66-68), strip '%', cast to double, then a
    * single `> 1 ⇒ /100` pass (dw4_book_dim.py:248-264 and :323). Faithful
    * quirks preserved: '0.5%' → 0.5 (the % is stripped, 0.5 isn't > 1, so
    * no /100 — percent SIGNS don't imply percent UNITS here), and '150%' →
    * 1.5 (the >1 rule applies once, not to fixpoint).
    *
    * Two columns with the reference's two defaults ('0.15' print, '0.25'
    * ebook) exercise the cascade on offset style cycles. */
  val q32 = Q(
    "q32_rate_repair",
    """WITH messy AS (
      |  SELECT p_partkey AS part_key,
      |    CASE p_partkey % 8
      |      WHEN 0 THEN '25%' WHEN 1 THEN '0.15' WHEN 2 THEN '15'
      |      WHEN 4 THEN '100%' WHEN 5 THEN '0.5%' WHEN 6 THEN '150%'
      |      WHEN 7 THEN '1' ELSE NULL END AS print_rate_raw,
      |    CASE (p_partkey + 3) % 8
      |      WHEN 0 THEN '25%' WHEN 1 THEN '0.25' WHEN 2 THEN '40'
      |      WHEN 4 THEN '100%' WHEN 5 THEN '2.5%' WHEN 6 THEN '120%'
      |      WHEN 7 THEN '1' ELSE NULL END AS ebook_rate_raw
      |  FROM part),
      |cast_ AS (
      |  SELECT part_key, print_rate_raw, ebook_rate_raw,
      |    CAST(replace(coalesce(print_rate_raw, '0.15'), '%', '') AS DOUBLE) AS p,
      |    CAST(replace(coalesce(ebook_rate_raw, '0.25'), '%', '') AS DOUBLE) AS e
      |  FROM messy)
      |SELECT part_key, print_rate_raw, ebook_rate_raw,
      |  CASE WHEN p > 1.0 THEN p / CAST(100 AS DOUBLE) ELSE p END AS print_rate,
      |  CASE WHEN e > 1.0 THEN e / CAST(100 AS DOUBLE) ELSE e END AS ebook_rate
      |FROM cast_""".stripMargin) { (s, d) =>
    def messy(shift: Int, styles: Map[Int, String]) = {
      val m = (col("p_partkey") + shift) % 8
      styles.foldLeft(lit(null).cast("string")) { case (acc, (k, v)) =>
        when(m === k, v).otherwise(acc)
      }
    }
    def repair(raw: org.apache.spark.sql.Column, default: String) = {
      val v = translate(coalesce(raw, lit(default)), "%", "").cast("double")
      when(v > 1.0, v / 100.0).otherwise(v)
    }
    Tables.part(s, d)
      .select(col("p_partkey"),
        messy(0, Map(0 -> "25%", 1 -> "0.15", 2 -> "15", 4 -> "100%",
          5 -> "0.5%", 6 -> "150%", 7 -> "1")).as("print_rate_raw"),
        messy(3, Map(0 -> "25%", 1 -> "0.25", 2 -> "40", 4 -> "100%",
          5 -> "2.5%", 6 -> "120%", 7 -> "1")).as("ebook_rate_raw"))
      .select(col("p_partkey").as("part_key"),
        col("print_rate_raw"), col("ebook_rate_raw"),
        repair(col("print_rate_raw"), "0.15").as("print_rate"),
        repair(col("ebook_rate_raw"), "0.25").as("ebook_rate"))
  }

  // ---------------------------------------------------------------- A34
  /** Multi-source flag derivation — the reference's Wholesale/Giftwrapped
    * pattern (dw2_wc_increment.py:301-302, 468-471): a flag becomes 'Yes'
    * when ANY of several alternative evidence columns fires (two meta-style
    * columns OR membership in a hardcoded coupon-code list), then a role
    * string is derived with the where-isnull/fillna idiom — the flag column
    * itself stays the reference's quirky 'Yes'/NULL string, not a boolean,
    * and the role is 'Wholesale Customer' where the flag is set else
    * 'Customer'. Evidence analogs on the test tables: market segment
    * (meta column 1), order priority (meta column 2), and a clerk-style
    * membership list over the order status+priority pair.
    *
    * Scale: one broadcast dim join (customer) + per-row conditionals —
    * the membership list is a literal IN, never a join. */
  val q34 = Q(
    "q34_flag_derivation",
    """SELECT o.o_orderkey AS order_key,
      |  CASE WHEN c.c_mktsegment = 'BUILDING'
      |         OR o.o_orderpriority IN ('1-URGENT', '2-HIGH')
      |         OR (o.o_orderstatus || ':' || o.o_orderpriority) IN ('F:3-MEDIUM', 'O:5-LOW')
      |       THEN 'Yes' ELSE NULL END AS wholesale,
      |  CASE WHEN c.c_mktsegment = 'BUILDING'
      |         OR o.o_orderpriority IN ('1-URGENT', '2-HIGH')
      |         OR (o.o_orderstatus || ':' || o.o_orderpriority) IN ('F:3-MEDIUM', 'O:5-LOW')
      |       THEN 'Wholesale Customer' ELSE 'Customer' END AS customer_role,
      |  CASE WHEN c.c_acctbal < 0 THEN 'Yes' ELSE NULL END AS giftwrapped
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin) { (s, d) =>
    val isWholesale = col("c_mktsegment") === "BUILDING" ||
      col("o_orderpriority").isin("1-URGENT", "2-HIGH") ||
      concat(col("o_orderstatus"), lit(":"), col("o_orderpriority"))
        .isin("F:3-MEDIUM", "O:5-LOW")
    Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey").as("order_key"),
        when(isWholesale, "Yes").otherwise(lit(null).cast("string")).as("wholesale"),
        when(isWholesale, "Wholesale Customer").otherwise("Customer").as("customer_role"),
        when(col("c_acctbal") < 0, "Yes").otherwise(lit(null).cast("string")).as("giftwrapped"))
  }

  // ---------------------------------------------------------------- A35
  /** Two-channel harmonized fact union — dw5's core shape: the WC retail
    * channel (order-line grain, has quantities) and the SCB distributor
    * channel (statement grain, no per-line quantity, months shifted +3 by
    * the royalty calendar) are concatenated into ONE fact, each channel
    * contributing only the columns it has, then per-row channel-conditional
    * "Combined_*" keys pick whichever side is present
    * (dw5_order_royalty_fact.py:731,743 np.select defaulting to the other
    * channel; the concat at :649-657). Spark-first: `unionByName` with
    * allowMissingColumns (schema harmonization without hand-written NULL
    * padding), `coalesce` for the combined keys, and the missing measure
    * stays NULL through the aggregate — SCB months report NULL total_qty,
    * not a fake 0.
    *
    * Scale: the union is a zero-shuffle concatenation of two scans; the
    * only exchange is the final report aggregate. Money sums in exact
    * integer micros ([[graft.functions.Exact]]). */
  val q35 = Q(
    "q35_channel_union",
    s"""WITH wc AS (
      |  SELECT 'WC' AS channel, strftime(o.o_orderdate, '%Y-%m') AS wc_month,
      |    CAST(NULL AS VARCHAR) AS scb_month,
      |    CAST(ROUND(l.l_quantity) AS BIGINT) AS qty, l.l_extendedprice AS rev
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |scb AS (
      |  SELECT 'SCB' AS channel, CAST(NULL AS VARCHAR) AS wc_month,
      |    strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m') AS scb_month,
      |    CAST(NULL AS BIGINT) AS qty, o_totalprice AS rev
      |  FROM orders WHERE o_orderkey % 3 = 0),
      |u AS (SELECT * FROM wc UNION ALL SELECT * FROM scb)
      |SELECT coalesce(scb_month, wc_month) AS combined_month, channel,
      |  CAST(SUM(qty) AS BIGINT) AS total_qty,
      |  ${graft.functions.Exact.sqlSumMicros("rev")} AS total_rev,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows
      |FROM u GROUP BY 1, 2""".stripMargin) { (s, d) =>
    import graft.functions.Exact.sumMicros
    val wc = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(lit("WC").as("channel"),
        date_format(col("o_orderdate"), "yyyy-MM").as("wc_month"),
        round(col("l_quantity")).cast("long").as("qty"),
        col("l_extendedprice").as("rev"))
    val scb = Tables.orders(s, d).filter(col("o_orderkey") % 3 === 0)
      .select(lit("SCB").as("channel"),
        date_format(add_months(col("o_orderdate"), 3), "yyyy-MM").as("scb_month"),
        col("o_totalprice").as("rev"))
    wc.unionByName(scb, allowMissingColumns = true)
      .groupBy(coalesce(col("scb_month"), col("wc_month")).as("combined_month"),
        col("channel"))
      .agg(sum(col("qty")).as("total_qty"),
        sumMicros(col("rev")).as("total_rev"),
        count(lit(1)).as("n_rows"))
  }

  val queries: Seq[Q] = Seq(q31, q32, q34, q35)
}
