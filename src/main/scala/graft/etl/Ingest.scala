package graft.etl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{Q, Tables}

/** Ingest-stage surface: nested-JSON flattening (SURVEY §2 A23).
  *
  * The reference's ingest pulls order documents whose `line_items` is a
  * nested JSON array, flattens one row per line item, and keeps the
  * positional `OrderItemIndex` (dw2_wc_increment.py, wc_block2_helpers.py:
  * flattened-JSON column-index discovery; dw3_merge_inc.py:96-113 builds the
  * OrderItemIndex key from that position). Spark-first this is
  * `from_json` with an explicit array<struct> schema + `posexplode` — schema
  * declared, never inferred (inference is an extra full pass at 100 TB).
  *
  * The JSON document is constructed from `lineitem` on the fly (this
  * container has no REST source), sorted by line number so the positional
  * index is deterministic; the DuckDB oracle specifies the same semantics
  * directly with a window — flattening must exactly recover the relational
  * rows, JSON being a transport detail.
  */
object Ingest {

  private val itemSchema = ArrayType(StructType(Seq(
    StructField("ln", IntegerType),
    StructField("pk", LongType),
    StructField("qty", DoubleType))))

  // ---------------------------------------------------------------- A23
  val q23 = Q(
    "q23_json_flatten",
    """SELECT l_orderkey AS order_key,
      |  CAST(row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_quantity) - 1 AS BIGINT) AS item_index,
      |  CAST(l_linenumber AS INT) AS line_number,
      |  l_partkey AS part_key, l_quantity AS quantity
      |FROM lineitem""".stripMargin) { (s, d) =>
    // Stage 1 — the "source system" document: one JSON string per order
    // with its line_items array (sorted for a stable positional index).
    val docs = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey").as("order_key"))
      .agg(to_json(array_sort(collect_list(struct(
        col("l_linenumber").cast("int").as("ln"),
        col("l_partkey").as("pk"),
        col("l_quantity").as("qty"))))).as("payload"))
    // Stage 2 — ingest: parse with the declared schema, flatten with index.
    docs
      .select(col("order_key"),
        posexplode(from_json(col("payload"), itemSchema)).as(Seq("item_index", "item")))
      .select(col("order_key"), col("item_index").cast("long").as("item_index"),
        col("item.ln").as("line_number"), col("item.pk").as("part_key"),
        col("item.qty").as("quantity"))
  }

  // ---------------------------------------------------------------- A24
  /** Typed extraction from a semi-structured JSON column: the reference
    * reads meta fields out of flattened WooCommerce JSON by discovered
    * column index (wc_block2_helpers.py); Spark-first it's a JSON-path
    * extraction with an explicit cast, aggregated per event type. */
  val q24 = Q(
    "q24_props_extract",
    """SELECT event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
      |  CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
      |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
  }

  private val orderDocSchema = StructType(Seq(
    StructField("line_items", ArrayType(StructType(Seq(
      StructField("ln", IntegerType),
      StructField("pk", LongType),
      StructField("qty", DoubleType))))),
    StructField("refunds", ArrayType(StructType(Seq(
      StructField("ln", IntegerType),
      StructField("amt", DoubleType)))))))

  // ---------------------------------------------------------------- A33
  /** Sibling-array flatten: ONE source document carries SEVERAL parallel
    * child arrays (the reference's order documents hold `line_items_*`,
    * `refunds_*` and `coupon_lines_*` column families, each flattened into
    * its own child relation — dw2_wc_increment.py:195-197), and ingest must
    * split them into separate child tables with independent positional
    * indices. Spark-first: parse the document ONCE with a declared
    * two-array schema, then a single explode over the concat of the two
    * `transform`-tagged arrays — one pass, one fan-out, no join-back and no
    * double parse; the child table name rides along as a tag column so the
    * result ships as one relation (a per-tag partitioned write splits it
    * into physical child tables at the sink).
    *
    * Document synthesis mirrors q23 (no REST source in this container):
    * line_items = the order's lines; refunds = its returned (`R`) lines. */
  val q33 = Q(
    "q33_sibling_flatten",
    """SELECT l_orderkey AS order_key, 'line_item' AS child,
      |  CAST(row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_quantity) - 1 AS BIGINT) AS item_index,
      |  CAST(l_linenumber AS INT) AS line_number,
      |  l_partkey AS part_key, l_quantity AS value
      |FROM lineitem
      |UNION ALL
      |SELECT l_orderkey, 'refund',
      |  CAST(row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice) - 1 AS BIGINT),
      |  CAST(l_linenumber AS INT),
      |  CAST(NULL AS BIGINT), l_extendedprice
      |FROM lineitem WHERE l_returnflag = 'R'""".stripMargin) { (s, d) =>
    // Stage 1 — the "source system" document: one JSON string per order with
    // BOTH sibling arrays (sorted for stable positional indices; collect_list
    // skips the nulls the `when` leaves on non-refund lines).
    val docs = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey").as("order_key"))
      .agg(to_json(struct(
        array_sort(collect_list(struct(
          col("l_linenumber").cast("int").as("ln"),
          col("l_partkey").as("pk"),
          col("l_quantity").as("qty")))).as("line_items"),
        array_sort(collect_list(when(col("l_returnflag") === "R", struct(
          col("l_linenumber").cast("int").as("ln"),
          col("l_extendedprice").as("amt"))))).as("refunds"))).as("payload"))
    // Stage 2 — ingest: one parse, one explode of the tagged concat. The
    // parse gets ITS OWN projection: both transform() branches read the
    // parsed doc, and inlining from_json into the explode argument would
    // run the parse twice per order (transform is interpreted — no
    // subexpression elimination; measured 2× from_json in the Generate
    // node). CollapseProject keeps the split because the doc reference
    // count is 2 and from_json is non-cheap.
    val tagged = concat(
      transform(col("doc").getField("line_items"), (x, i) => struct(
        lit("line_item").as("child"), i.cast("long").as("item_index"),
        x.getField("ln").as("line_number"), x.getField("pk").as("part_key"),
        x.getField("qty").as("value"))),
      transform(col("doc").getField("refunds"), (x, i) => struct(
        lit("refund").as("child"), i.cast("long").as("item_index"),
        x.getField("ln").as("line_number"), lit(null).cast("long").as("part_key"),
        x.getField("amt").as("value"))))
    docs.select(col("order_key"), from_json(col("payload"), orderDocSchema).as("doc"))
      .select(col("order_key"), explode(tagged).as("c"))
      .select(col("order_key"), col("c.child").as("child"),
        col("c.item_index").as("item_index"), col("c.line_number").as("line_number"),
        col("c.part_key").as("part_key"), col("c.value").as("value"))
  }

  val queries: Seq[Q] = Seq(q23, q24, q33)
}
