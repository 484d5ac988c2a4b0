package graft.etl

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Dimensional-modeling operators beyond the reference's Type-1 dims
  * (SURVEY §2 A36).
  *
  * The reference rebuilds its dimensions from scratch every run and keeps
  * only the latest attribute value per key (dw4_book_dim.py's Book_Dim /
  * Bundle_Dim are Type-1 overwrites). A warehouse that must answer "what was
  * this customer's segment WHEN the order was placed" needs the Type-2
  * history table instead — the standard Kimball SCD2 shape: one row per
  * (key, consecutive attribute state) with a validity interval and a
  * current-row flag.
  */
object Dimensional {

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
    * Scale: every window partitions on o_custkey (high cardinality, never a
    * global sort); the run-collapse is a hash aggregate on
    * (custkey, version). Change detection is lag(), interval close is
    * lead() — both single-pass within the partition. At 100 TB the
    * observation extract is the only full-fact scan; everything after runs
    * on the (much smaller) one-row-per-(key, day) relation. */
  val q36 = Q(
    "q36_scd2_dim",
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
      |FROM fin""".stripMargin) { (s, d) =>
    val wOrd = Window.partitionBy(col("custkey")).orderBy(col("obs_date"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wSeg = Window.partitionBy(col("custkey")).orderBy(col("valid_from"))
    // Latest observation per (customer, day): max_by collapses map-side —
    // same day-winner the oracle's row_number DESC picks (o_orderkey unique).
    val obs = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("custkey"), to_date(col("o_orderdate")).as("obs_date"))
      .agg(max_by(col("o_orderpriority"), col("o_orderkey")).as("attr"))
    obs
      .withColumn("prev", lag(col("attr"), 1).over(wOrd))
      .withColumn("is_chg", when(col("prev").isNull || col("prev") =!= col("attr"), 1).otherwise(0))
      .withColumn("version", sum(col("is_chg")).over(wRun).cast("long"))
      .groupBy(col("custkey"), col("attr"), col("version"))
      .agg(min(col("obs_date")).as("valid_from"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wSeg))
      .select(col("custkey"), col("attr"), col("version"), col("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"))
  }

  val queries: Seq[Q] = Seq(q36)
}
