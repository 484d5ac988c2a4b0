package graft.tools

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.sources.FileCow

/** The ADR-002 measurement: HIVE-STYLE PARTITION COLUMNS vs the cow
  * table's RANGE LAYOUT + PER-FILE STATS, head to head at 10⁴ files on
  * identical rows — the four operations operators reason about in
  * partition units:
  *
  *   1. equality scan on the partition key (`day = D`),
  *   2. range scan (`day BETWEEN a AND b`, a 7-day window),
  *   3. one-day replacement (hive dynamic-partition overwrite vs cow
  *      DELETE day = D + append),
  *   4. retention drop (`day < cutoff`: hive directory deletes vs cow
  *      predicate DELETE).
  *
  * For each: files OPENED by the scan (the pruning power — counted from
  * the executed relation's own listing, not estimated) and wall time.
  * The honest deltas both ways are the point: stats pruning matches
  * directory pruning file-for-file on 1–2, needs no directory tree, no
  * partition-count ceiling, and keeps working for NON-LEAD predicates
  * (Z-order/Bloom) where hive has nothing; hive's dir-level retention
  * drop (4) is O(1) filesystem metadata while the cow DELETE reads the
  * dropped rows once to prove emptiness — the one structural advantage
  * partitions keep, priced here.
  *
  * Usage: `dev/jrun.sh graft.tools.StressPartitionPrune [days filesPerDay rowsPerFile]`
  * (defaults 200 × 50 × 200 = 10⁴ files, 2×10⁶ rows per layout).
  */
object StressPartitionPrune {

  private def opened(df: DataFrame): Long = {
    val scans = df.queryExecution.sparkPlan.collectLeaves()
      .collect { case s: FileSourceScanExec => s }
    scans.map(s => s.relation.location.listFiles(
      s.partitionFilters, s.dataFilters).flatMap(_.files).length.toLong).sum
  }

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def deleteTree(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f =>
        Files.deleteIfExists(f))

  def main(args: Array[String]): Unit = {
    val days = args.headOption.map(_.toInt).getOrElse(200)
    val filesPerDay = args.drop(1).headOption.map(_.toInt).getOrElse(50)
    val rowsPerFile = args.drop(2).headOption.map(_.toInt).getOrElse(200)
    val rows = days.toLong * filesPerDay * rowsPerFile

    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-partition-prune")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Files.createTempDirectory("graft-ppr")
    val hiveDir = base.resolve("hive").toString
    val cowRoot = base.resolve("cow").toString

    // identical rows in both layouts: day (the partition unit), id
    // (unique), amount (the measure the probe query aggregates)
    def data(fromId: Long, untilId: Long): DataFrame =
      spark.range(fromId, untilId).select(
        (col("id") / (filesPerDay.toLong * rowsPerFile)).cast("int").as("day"),
        col("id"),
        (col("id") % 997).cast("double").as("amount"),
        ((col("id") % filesPerDay)).as("slot"))

    // hive: day=<d>/ dirs, ~filesPerDay files each
    val (_, hiveWriteSec) = timed {
      data(0, rows).repartition(days * filesPerDay, col("day"), col("slot"))
        .write.partitionBy("day").mode("overwrite").parquet(hiveDir)
    }
    // cow: one flat _data dir, range layout on (day, id), stats on both;
    // the retention key is declared NOT NULL (the real table's contract —
    // and the soundness precondition for whole-file retention drops:
    // min/max stats are null-blind, so the enforced constraint is what
    // proves a covered file holds no NULL-cond survivor)
    val (_, cowWriteSec) = timed {
      FileCow.create(spark, cowRoot,
        data(0, rows).drop("slot")
          .repartitionByRange(days * filesPerDay, col("day"), col("id")),
        statsCols = Seq("day", "id"))
    }
    // outside the timed write (its standing-row validation scan would
    // skew the write comparison): the retention key's NOT NULL contract
    FileCow.addConstraint(spark, cowRoot, "nn_day", "day IS NOT NULL")
    val hiveFiles = {
      val s = Files.walk(Paths.get(hiveDir))
      try s.filter(p => p.getFileName.toString.endsWith(".parquet")).count()
      finally s.close()
    }
    val cowFiles = FileCow.manifest(spark, cowRoot, FileCow.currentVersion(cowRoot)).count()

    def hive(): DataFrame = spark.read.parquet(hiveDir)
    def cow(): DataFrame = FileCow.read(spark, cowRoot)
    def probe(df: DataFrame, cond: org.apache.spark.sql.Column): (Long, Double, Double) = {
      val q = df.filter(cond).agg(sum("amount"))
      val (v, sec) = timed(q.collect()(0).getDouble(0))
      (opened(q), sec, v)
    }

    // 1. equality on the partition key
    val d = days / 2
    val (hEqFiles, hEqSec, hEqV) = probe(hive(), col("day") === d)
    val (cEqFiles, cEqSec, cEqV) = probe(cow(), col("day") === d)
    require(hEqV == cEqV, s"equality probe drifted: $hEqV vs $cEqV")

    // 2. a 7-day range
    val (hRgFiles, hRgSec, hRgV) = probe(hive(), col("day").between(d, d + 6))
    val (cRgFiles, cRgSec, cRgV) = probe(cow(), col("day").between(d, d + 6))
    require(hRgV == cRgV, s"range probe drifted: $hRgV vs $cRgV")

    // 3. replace one day — hive dynamic overwrite vs cow DELETE + append
    val replacement = data(0, rows).filter(col("day") === d)
      .withColumn("amount", col("amount") + 1)
    val (_, hOwSec) = timed {
      replacement.repartition(filesPerDay, col("slot"))
        .write.partitionBy("day").mode("overwrite").parquet(hiveDir)
    }
    val (cowRewrite, cOwSec) = timed {
      val del = FileCow.delete(spark, cowRoot, col("day") === d)
      FileCow.append(spark, cowRoot,
        replacement.drop("slot").repartitionByRange(filesPerDay, col("id")))
      del
    }
    val hAfter = probe(hive(), col("day") === d)._3
    val cAfter = probe(cow(), col("day") === d)._3
    require(hAfter == cAfter && hAfter == hEqV + rowsPerFile.toLong * filesPerDay,
      s"one-day replace drifted: hive $hAfter, cow $cAfter")

    // 4. retention: drop the oldest 10% of days
    val cutoff = days / 10
    val (_, hDropSec) = timed {
      (0 until cutoff).foreach(day =>
        deleteTree(Paths.get(hiveDir).resolve(s"day=$day")))
    }
    val (cowDrop, cDropSec) = timed {
      FileCow.delete(spark, cowRoot, col("day") < cutoff)
    }
    val (hLeft, _, _) = probe(hive(), col("day") >= 0)
    val (cLeft, _, _) = probe(cow(), col("day") >= 0)

    println(s"""{"tool":"partition-prune","days":$days,"files":{"hive":$hiveFiles,"cow":$cowFiles},""" +
      s""""writeSec":{"hive":${f"$hiveWriteSec%.1f"},"cow":${f"$cowWriteSec%.1f"}},""" +
      s""""eqOpened":{"hive":$hEqFiles,"cow":$cEqFiles},""" +
      s""""eqSec":{"hive":${f"$hEqSec%.2f"},"cow":${f"$cEqSec%.2f"}},""" +
      s""""rangeOpened":{"hive":$hRgFiles,"cow":$cRgFiles},""" +
      s""""rangeSec":{"hive":${f"$hRgSec%.2f"},"cow":${f"$cRgSec%.2f"}},""" +
      s""""overwriteDaySec":{"hive":${f"$hOwSec%.1f"},"cow":${f"$cOwSec%.1f"}},""" +
      s""""cowOverwriteFilesTouched":${cowRewrite.filesRewritten},""" +
      s""""retentionSec":{"hive":${f"$hDropSec%.2f"},"cow":${f"$cDropSec%.2f"}},""" +
      s""""cowRetentionFilesDropped":${cowDrop.filesRewritten},"cowRetentionFilesAdded":${cowDrop.filesAdded},""" +
      s""""filesAfterRetention":{"hive":$hLeft,"cow":$cLeft}}""")
    spark.stop()
  }
}
