package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Styled report delivery — the reference's `save_bucket(fr2/fr4/frs, …)`
  * stage (dw5_order_royalty_fact.py:845-859): a finished report leaves the
  * engine as ONE CSV file with a header row, the columns in the report's
  * declared presentation order, and rows in the report's declared sort.
  *
  * This is the single place in the engine where a one-file collapse is
  * legitimate: a printable report's row count is bounded by its dimension
  * grain (payee × quarter × …), not by the fact table, so `coalesce(1)` is
  * report-sized by contract. Fact-sized data never comes through here —
  * that's what the partitioned/bucketed writers in [[Sources]] are for.
  */
object ReportExport {

  /** Hard ceiling on report rows: the `coalesce(1)` below funnels the whole
    * result through one task, which is only admissible for dimension-grain
    * report frames. A fact table pointed here must fail loudly, not quietly
    * produce a one-task multi-gigabyte write. */
  val MaxReportRows: Long = 1000000L

  /** Writes `df` as a single headered CSV under `path` (Spark directory
    * convention: one `part-*.csv` inside), columns in `columns` order, rows
    * ordered by `sortCols`. `coalesce(1)` merges the sorted partitions in
    * partition order, so the global sort survives the collapse.
    *
    * Refuses frames over `maxRows` (default [[MaxReportRows]]) — the guard
    * costs one `limit(max+1).count()` pass, which is report-sized by the
    * same contract that makes the collapse legitimate. */
  def writeCsv(df: DataFrame, path: String,
               columns: Seq[String], sortCols: Seq[String],
               maxRows: Long = MaxReportRows): Unit = {
    // clamp: limit() takes an Int, and a caller-raised Long ceiling near or
    // above Int.MaxValue must not overflow into a negative/neutered probe
    val probe = df.limit(math.min(maxRows + 1, Int.MaxValue.toLong).toInt).count()
    require(probe <= maxRows,
      s"ReportExport.writeCsv: frame exceeds $maxRows rows — this writer " +
        "single-files dimension-grain reports; use the partitioned writers " +
        "in Sources for fact-sized data")
    df.select(columns.map(col): _*)
      .orderBy(sortCols.map(col): _*)
      .coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .csv(path)
  }
}
