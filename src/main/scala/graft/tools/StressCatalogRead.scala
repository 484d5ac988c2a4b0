package graft.tools

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.GraftTables
import graft.sources.FileCow

/** Measures the DSv2 CATALOG READ PATH (VERDICT r13 #5): the resolution
  * rule swaps `spark.table("graft.t")`'s v2 relation for the same
  * manifest-pruned v1 scan `FileCow.read` plans — so the catalog spelling
  * must cost only flat, table-size-independent METADATA overhead on top
  * of the direct read, with stat pruning and the metadata-only-aggregate
  * rewrite engaging identically. Three probes per table size, each the
  * median of `reps` runs against a warmed session:
  *
  *  - `point`: a stats-prunable point lookup (`WHERE id = k`) — catalog vs
  *    direct; the pruned file set is asserted EQUAL via the plan's scan.
  *  - `count`: `SELECT count(*)` — both spellings must resolve from
  *    manifest totals (the CowMetadataAgg rewrite), i.e. milliseconds,
  *    no scan at any size.
  *  - `resolve`: planning-only (df.queryExecution.executedPlan forced,
  *    nothing collected) — the pure resolution overhead delta.
  *
  * Usage: dev/jrun.sh graft.tools.StressCatalogRead [rowCounts…]
  */
object StressCatalogRead {

  private def rmTree(p: Path): Unit = if (Files.exists(p)) {
    val walk = Files.walk(p)
    try walk.sorted(java.util.Comparator.reverseOrder()).forEach(f => Files.delete(f))
    finally walk.close()
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted; s(s.length / 2)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
                else Seq(1000000L, 10000000L, 100000000L)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-catalog-read")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = Paths.get("/tmp/stress-catalogread")
    rmTree(work)
    val reps = 7

    def timedSec(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    for (n <- sizes) {
      val root = work.resolve(s"t-$n").toString
      val nFiles = math.max(16L, n / 250000L).toInt
      FileCow.create(spark, root,
        spark.range(0L, n).select(col("id"), (col("id") % 97).as("grp"),
          md5(col("id").cast("string")).as("payload"))
          .repartitionByRange(nFiles, col("id")),
        statsCols = Seq("id"))
      GraftTables.registerCow("cr_t", root)
      try {
        val probe = n / 2
        def catalogDf = spark.table("graft.cr_t").where(col("id") === probe)
        def directDf = FileCow.read(spark, root).where(col("id") === probe)

        // pruning must engage IDENTICALLY through the catalog spelling:
        // compare the physical scans' metadata (pushed filters, schema,
        // format — everything but the location string)
        val admittedEqual = {
          def meta(df: org.apache.spark.sql.DataFrame): String =
            df.queryExecution.executedPlan.collectLeaves().collectFirst {
              case f: org.apache.spark.sql.execution.FileSourceScanExec =>
                f.metadata.toSeq.sortBy(_._1)
                  .filterNot(_._1 == "Location").mkString("|")
                  .replaceAll("#\\d+", "#") // expression ids differ by plan
            }.getOrElse("?")
          meta(catalogDf) == meta(directDf)
        }

        def arm(mk: () => org.apache.spark.sql.DataFrame,
            collect: Boolean): Double = {
          val times = (1 to reps).map { _ =>
            timedSec {
              val df = mk()
              if (collect) { df.collect(); () }
              else { df.queryExecution.executedPlan; () }
            }
          }
          median(times)
        }

        val pointCat = arm(() => catalogDf, collect = true)
        val pointDir = arm(() => directDf, collect = true)
        val resolveCat = arm(() => catalogDf, collect = false)
        val resolveDir = arm(() => directDf, collect = false)
        val countCat = arm(
          () => spark.sql("SELECT count(*) AS n FROM graft.cr_t"), collect = true)
        val countDir = arm(
          () => FileCow.read(spark, root).groupBy().count(), collect = true)
        // metadata-only rewrite must engage through the catalog spelling:
        // the count's physical plan scans NO parquet
        val countPlan = spark.sql("SELECT count(*) AS n FROM graft.cr_t")
          .queryExecution.executedPlan.toString
        val metadataOnly = !countPlan.contains("FileScan")

        println(s"""{"tool":"catalogread","rows":$n,"files":$nFiles,""" +
          s""""pointCatalogSec":${f(pointCat)},"pointDirectSec":${f(pointDir)},""" +
          s""""resolveCatalogSec":${f(resolveCat)},"resolveDirectSec":${f(resolveDir)},""" +
          s""""countCatalogSec":${f(countCat)},"countDirectSec":${f(countDir)},""" +
          s""""prunedEqual":$admittedEqual,"countMetadataOnly":$metadataOnly}""")
        require(admittedEqual, "catalog and direct reads pruned differently")
        require(metadataOnly, "metadata-only count must engage through the catalog")
      } finally GraftTables.unregister("cr_t")
    }
    spark.stop()
  }

  private def f(d: Double): Double = math.round(d * 1000) / 1000.0
}
