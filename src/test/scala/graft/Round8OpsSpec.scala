package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

/** Properties of the round-8 additions: q60 printable report (the reference's
  * presentation layer) and the ReportExport single-file CSV delivery. The
  * DuckDB hash-compare pins q60's exact values; these pin the presentation
  * contract — grain, conservation against q04's summary, header/order of the
  * exported file.
  */
class Round8OpsSpec extends SparkSpec {

  private val presentationCols = Seq(
    "Quarter", "Payee", "Month", "Title", "Book_Type", "Royalty_Rate",
    "Total_Qty", "Total_Item_USD", "Retail_Sales_USD", "Returns_USD",
    "Wholesale_Quantity", "Retail_Quantity", "Payout")

  test("q60: presentation columns, one row per grain tuple, measures consistent") {
    val r = etl.RelationalCore.q60.build(spark, sfDir).cache()
    assert(r.columns.toSeq == presentationCols) // order IS the contract here
    // grain: the six dimension columns identify a row
    val grain = Seq("Quarter", "Payee", "Month", "Title", "Book_Type", "Royalty_Rate")
    assert(r.select(grain.map(col): _*).distinct().count() == r.count())
    // internal consistency: qualified measures never exceed their retail superset
    assert(r.filter(col("Total_Qty") > col("Retail_Quantity")).isEmpty)
    assert(r.filter(col("Total_Item_USD") > col("Retail_Sales_USD") + 1e-6).isEmpty)
    assert(r.filter(col("Payout") < 0 || col("Total_Qty") < 0).isEmpty)
    // a zero rate can earn no payout
    assert(r.filter(col("Royalty_Rate") === 0.0 &&
      (col("Payout") =!= 0.0 || col("Total_Qty") =!= 0L)).isEmpty)
    r.unpersist()
  }

  test("q60: rolls up to q04's summary — same totals, payee by payee") {
    // q04 groups (year, quarter, payee); q60's Quarter key is year||'Q'||q,
    // so summing q60 over the finer grain must reproduce q04 exactly
    // (both sides aggregate the same integer-micros contributions).
    val fine = etl.RelationalCore.q60.build(spark, sfDir)
      .groupBy(col("Quarter"), col("Payee"))
      .agg(sum(col("Total_Qty")).as("fine_qty"),
        sum(round(col("Payout") * 1e6)).cast("long").as("fine_payout_micros"))
    val coarse = etl.RelationalCore.q04.build(spark, sfDir)
      .select(concat(col("year").cast("string"), lit(""), col("quarter")).as("Quarter"),
        col("payee").as("Payee"), col("total_qty"),
        round(col("payout") * 1e6).cast("long").as("payout_micros"))
    val j = fine.join(coarse, Seq("Quarter", "Payee"), "full_outer").cache()
    assert(j.filter(col("fine_qty").isNull || col("total_qty").isNull).isEmpty)
    assert(j.filter(col("fine_qty") =!= col("total_qty")).isEmpty)
    assert(j.filter(col("fine_payout_micros") =!= col("payout_micros")).isEmpty)
    j.unpersist()
  }

  test("ReportExport.writeCsv: one file, exact header, payee-sorted rows") {
    val out = Files.createTempDirectory("graft-report").toString
    val r = etl.RelationalCore.q60.build(spark, sfDir)
    sources.ReportExport.writeCsv(r, out, presentationCols,
      sortCols = Seq("Payee", "Quarter", "Month", "Title", "Book_Type"))
    val files = Files.list(Paths.get(out)).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".csv")).toSeq
    assert(files.size == 1) // the one-file delivery contract
    val lines = Files.readAllLines(Paths.get(out, files.head)).asScala.toSeq
    assert(lines.head == presentationCols.mkString(","))
    // rows arrive payee-major (the reference's sort_values order)
    val payees = lines.tail.map(_.split(",")(1))
    assert(payees == payees.sorted)
    // and the file carries every report row
    assert(lines.size.toLong == r.count() + 1)
  }
}
