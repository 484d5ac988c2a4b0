package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-exact arithmetic helpers.
  *
  * The driver verifies every query against a DuckDB oracle by hashing result
  * values. Floating-point SUMs are not associative, so `sum(double)` over a
  * shuffled dataset is not reproducible across engines (or even across runs).
  * The fix is the classic money-in-integer-cents trick: scale each row to an
  * integer BEFORE aggregating, sum exactly in Long, and divide once at the
  * end. Both engines then perform the identical single float op on identical
  * integers.
  *
  * This is also the right call at 100 TB: integer partial aggregation is
  * cheaper than double and makes results run-to-run stable regardless of
  * partitioning, AQE re-planning, or speculative retries.
  */
object Exact {
  /** Row value scaled to integer cents (2 dp). */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Row value scaled to integer micro-units (6 dp) for products of money
    * and fractional rates. */
  def micros(c: Column): Column = round(c * 1000000L).cast("long")

  /** Exact sum in cents, surfaced as a 2-dp double. */
  def sumCents(c: Column): Column = sum(cents(c)) / 100.0

  /** Exact sum in micro-units, surfaced as a 6-dp double. */
  def sumMicros(c: Column): Column = sum(micros(c)) / 1e6

  /** SQL fragments for the DuckDB oracle side of the same computations. */
  def sqlSumCents(expr: String): String =
    s"CAST(SUM(CAST(ROUND(($expr)*100) AS BIGINT)) AS BIGINT)/100.0"
  def sqlSumMicros(expr: String): String =
    s"CAST(SUM(CAST(ROUND(($expr)*1000000) AS BIGINT)) AS BIGINT)/1000000.0"
  def sqlCents(expr: String): String =
    s"CAST(ROUND(($expr)*100) AS BIGINT)/100.0"
}
