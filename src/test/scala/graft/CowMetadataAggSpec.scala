package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._

import graft.plans.GraftTables
import graft.sources.FileCow

/** [[graft.plans.CowMetadataAggRule]]: global COUNT(*)/MIN/MAX over an
  * unfiltered cow-table scan answer from the MANIFEST (per-file row counts
  * and [min, max] stats) — the optimized plan is a [[LocalRelation]], no
  * file scan — while anything outside the soundness bounds (filters,
  * grouping, COUNT(col), DISTINCT, non-stats columns) still scans and
  * still answers correctly.
  */
class CowMetadataAggSpec extends SparkSpec {
  import spark.implicits._

  private def isMetadataOnly(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case _: LogicalRelation => ()
    }.isEmpty && df.queryExecution.optimizedPlan.exists(_.isInstanceOf[LocalRelation])

  private def mkTable(): String = {
    val root = Files.createTempDirectory("graft-metaagg").toString
    // v is a stats column WITH nulls (one file all-null); s is a string
    // stats column; p carries no stats (not in statsCols)
    val df = spark.range(1, 1001).select(
      col("id").as("k"),
      when(col("id") <= 100, lit(null).cast("long")).otherwise(col("id") * 2).as("v"),
      concat(lit("s"), lpad(col("id").cast("string"), 4, "0")).as("s"),
      lit("payload").as("p"))
    FileCow.create(spark, root, df.repartitionByRange(8, col("k")),
      statsCols = Seq("k", "v", "s"))
    root
  }

  test("COUNT(*), MIN, MAX over the bare table fold to a LocalRelation and match the scan") {
    val root = mkTable()
    val meta = FileCow.read(spark, root)
      .agg(count(lit(1)).as("n"), min("k").as("mn"), max("k").as("mx"),
        min("v").as("vmn"), max("v").as("vmx"), min("s").as("smn"), max("s").as("smx"))
    assert(isMetadataOnly(meta), s"expected metadata-only plan:\n${meta.queryExecution.optimizedPlan}")
    val r = meta.collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (1000L, 1L, 1000L))
    assert((r.getLong(3), r.getLong(4)) == (202L, 2000L), "null stats rows skipped")
    assert((r.getString(5), r.getString(6)) == ("s0001", "s1000"))
    // df.count() takes the same path
    assert(FileCow.read(spark, root).count() == 1000L)
  }

  test("the rewrite tracks DML and time travel through each version's manifest") {
    val root = mkTable()                                     // v1: 1000 rows
    FileCow.delete(spark, root, col("k") <= 300)             // v2: 700 rows
    val now = FileCow.read(spark, root).agg(count(lit(1)).as("n"), min("k").as("mn"))
    assert(isMetadataOnly(now))
    assert(now.as[(Long, Long)].head() == ((700L, 301L)))
    val old = FileCow.readVersion(spark, root, 1L).agg(count(lit(1)).as("n"))
    assert(isMetadataOnly(old))
    assert(old.as[Long].head() == 1000L)
  }

  test("out-of-bounds shapes still scan and still answer right") {
    val root = mkTable()
    val scan = FileCow.read(spark, root)
    // a filter changes counts: not rewritten
    val filtered = scan.filter(col("k") > 500).agg(count(lit(1)).as("n"))
    assert(!isMetadataOnly(filtered))
    assert(filtered.as[Long].head() == 500L)
    // COUNT(col) skips nulls the manifest cannot see: not rewritten
    val countCol = scan.agg(count(col("v")).as("n"))
    assert(!isMetadataOnly(countCol))
    assert(countCol.as[Long].head() == 900L)
    // grouping: not rewritten
    val grouped = scan.groupBy((col("k") % 2).as("g")).agg(count(lit(1)).as("n"))
    assert(!isMetadataOnly(grouped))
    // DISTINCT: not rewritten
    val distinctN = scan.agg(countDistinct(col("s")).as("n"))
    assert(!isMetadataOnly(distinctN))
    assert(distinctN.as[Long].head() == 1000L)
    // min over a column with NO manifest stats: not rewritten
    val noStats = scan.agg(min("p").as("m"))
    assert(!isMetadataOnly(noStats))
    assert(noStats.as[String].head() == "payload")
  }

  test("SQL COUNT(*) on a registered cow table is metadata-only") {
    val root = Files.createTempDirectory("graft-metaagg-sql").toString
    GraftTables.registerCow("meta_sql", root)
    spark.range(1, 501).select(col("id").as("k"), (col("id") * 3).as("v"))
      .createOrReplaceTempView("meta_sql_src")
    spark.sql("CREATE TABLE meta_sql AS SELECT * FROM meta_sql_src")
    val q = spark.sql("SELECT count(*) AS n, min(k) AS mn, max(v) AS mx FROM meta_sql")
    assert(isMetadataOnly(q), s"expected metadata-only:\n${q.queryExecution.optimizedPlan}")
    assert(q.as[(Long, Long, Long)].head() == ((500L, 1L, 1500L)))
    GraftTables.unregister("meta_sql")
  }
}
