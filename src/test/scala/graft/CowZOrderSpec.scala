package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.plans.GraftTables
import graft.sources.FileCow

/** `OPTIMIZE … ZORDER BY` on a cow table (Delta's OPTIMIZE ZORDER): one
  * layout-only commit that re-clusters the rows in Morton order so the
  * manifest's EXISTING per-file stats become tight in both dimensions.
  * Claims:
  *
  *   1. identical rows before/after (empty change feed — layout-only);
  *   2. a secondary-dimension predicate that admitted EVERY file under the
  *      linear layout admits a strict subset after Z-ordering — the
  *      pruning G12 proves for plain parquet, now through the cow
  *      manifest + CowFileIndex with zero new metadata;
  *   3. ZORDER BY a non-stats column fails loudly (clustering without
  *      stats cannot prune — misuse, not a silent no-op);
  *   4. `DESCRIBE DETAIL` exposes the per-file layout the decision reads.
  */
class CowZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def openedFiles(q: DataFrame): Int = {
    val scan = q.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case s: FileSourceScanExec => s }.get
    scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters).map(_.files.length).sum
  }

  test("ZORDER compaction: same rows, empty feed, secondary-dimension pruning appears") {
    val root = Files.createTempDirectory("graft-zorder").toString
    GraftTables.registerCow("zorder_t", root)
    // 64x64 grid laid out LINEARLY on a: per file a is tight, b spans 0..63
    val grid = spark.range(0, 4096).select(
      (col("id") / 64).cast("long").as("a"),
      (col("id") % 64).as("b"),
      col("id").as("payload"))
      .repartitionByRange(16, col("a"))
    FileCow.create(spark, root, grid, statsCols = Seq("a", "b"))

    def bSlice: DataFrame =
      spark.sql("SELECT a, b, payload FROM zorder_t WHERE b BETWEEN 0 AND 7")
    val before = bSlice.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(before.size == 64 * 8)
    assert(openedFiles(bSlice) == 16, "linear layout: b-slice admits every file")

    spark.sql("OPTIMIZE zorder_t INTO 16 FILES ZORDER BY (a, b)")
    assert(FileCow.commitInfo(root, 2L).get.kind == "zorder")
    // layout-only: identical rows, empty change feed across the commit
    assert(FileCow.changesBetween(spark, root, Seq("a", "b"), 1L, 2L).isEmpty)
    val after = bSlice.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(after == before)
    val openedAfter = openedFiles(bSlice)
    assert(openedAfter < 16,
      s"z-ordered regions must prune the b-slice, opened $openedAfter of 16")
    // and the lead dimension still prunes too
    val aSlice = spark.sql("SELECT a FROM zorder_t WHERE a BETWEEN 0 AND 7")
    assert(openedFiles(aSlice) < 16)
    GraftTables.unregister("zorder_t")
  }

  test("OPTIMIZE WHERE heals only the files the predicate admits") {
    val root = Files.createTempDirectory("opt-where").resolve("t").toString
    GraftTables.registerCow("optw_t", root)
    // stats on k only, so `v` is a genuine non-stats column below
    FileCow.create(spark, root,
      spark.range(1, 1001).select(col("id").as("k"), (col("id") * 2).as("v"))
        .repartitionByRange(8, col("k")), Seq("k")) // v1: 8 files

    spark.sql("OPTIMIZE optw_t INTO 1 FILES WHERE k <= 250") // v2
    val before = FileCow.manifest(spark, root, 1L).select("file")
      .collect().map(_.getString(0)).toSet
    val after = FileCow.manifest(spark, root, 2L).select("file")
      .collect().map(_.getString(0)).toSet
    val shared = before intersect after
    assert(shared.size == 6, s"the 2 files covering k<=250 rewrite; 6 shared, got ${shared.size}")
    assert(after.size == 7, "2 admitted files collapsed into 1")
    assert(spark.sql("SELECT count(*) c, sum(v) s FROM optw_t").as[(Long, Long)]
      .head() == ((1000L, (1L to 1000L).map(_ * 2).sum)), "rows identical — layout-only")
    assert(FileCow.commitInfo(root, 2L).get.kind == "compact")

    // WHERE over a non-stats column would degrade to rewrite-everything
    val e = intercept[Exception] {
      spark.sql("OPTIMIZE optw_t INTO 1 FILES WHERE v > 0")
    }
    assert(e.getMessage.contains("non-stats"))
    // ZORDER + WHERE cannot combine
    val z = intercept[Exception] {
      spark.sql("OPTIMIZE optw_t INTO 2 FILES ZORDER BY (k, v) WHERE k < 10")
    }
    assert(z.getMessage.contains("cannot combine"))
    GraftTables.unregister("optw_t")
  }

  test("RESTORE TABLE rewinds in one shared-files commit; the feed undoes the mistake") {
    val root = Files.createTempDirectory("graft-restore").toString
    GraftTables.registerCow("restore_t", root)
    spark.sql("CREATE TABLE restore_t AS SELECT id AS k, id AS v FROM range(1, 101)")
    spark.sql("DELETE FROM restore_t WHERE k <= 90") // the mistake
    spark.sql("INSERT INTO restore_t SELECT 500, 500")
    assert(spark.sql("SELECT count(*) c FROM restore_t").as[Long].head() == 11L)

    spark.sql("RESTORE TABLE restore_t TO VERSION AS OF 1")
    assert(FileCow.currentVersion(root) == 4L, "restore moves FORWARD")
    assert(spark.sql("SELECT count(*) c FROM restore_t").as[Long].head() == 100L)
    // shared files: the restored manifest IS version 1's (no data written)
    def files(v: Long) = FileCow.manifest(spark, root, v).select("file")
      .collect().map(_.getString(0)).toSet
    assert(files(4L) == files(1L))
    assert(FileCow.commitInfo(root, 4L).get.kind == "restore")
    // the feed across the restore is exactly the rows the rewind undoes:
    // the 90 deleted keys come back, the inserted 500 goes away
    val feed = FileCow.changesBetween(spark, root, Seq("k"), 3L, 4L)
      .groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(feed == Map("insert" -> 90L, "delete" -> 1L), s"got $feed")
    // the mistake window is still auditable via time travel
    assert(spark.sql("SELECT count(*) c FROM restore_t VERSION AS OF 2")
      .as[Long].head() == 10L)
    // restoring the current version is refused
    val e = intercept[Exception] {
      spark.sql("RESTORE TABLE restore_t TO VERSION AS OF 4")
    }
    assert(e.getMessage.contains("already the current version"))
    GraftTables.unregister("restore_t")
  }

  test("CONVERT TO GRAFT adopts a plain-parquet dir without rewriting a byte") {
    val s = spark
    import s.implicits._
    val landing = Files.createTempDirectory("graft-convert-src").toString
    spark.range(1, 501).select(col("id").as("k"), (col("id") % 9).as("g"))
      .repartitionByRange(4, col("k"))
      .write.mode("overwrite").parquet(landing)
    val srcBytes = java.nio.file.Files.list(java.nio.file.Paths.get(landing))
      .iterator()
    var partBytes = 0L
    while (srcBytes.hasNext) {
      val p = srcBytes.next()
      if (p.getFileName.toString.endsWith(".parquet")) partBytes += java.nio.file.Files.size(p)
    }

    val root = Files.createTempDirectory("graft-convert").resolve("t").toString
    GraftTables.registerCow("conv_t", root)
    spark.sql(s"CONVERT TO GRAFT conv_t FROM '$landing' STATS (k, g)")
    assert(FileCow.currentVersion(root) == 1L)
    assert(FileCow.commitInfo(root, 1L).get.kind == "convert")
    // adopted, not rewritten: byte-total identical, source parts moved out
    val man = FileCow.manifest(spark, root, 1L)
    assert(man.agg(sum("bytes")).as[Long].head() == partBytes)
    val leftover = {
      val it = java.nio.file.Files.list(java.nio.file.Paths.get(landing)).iterator()
      var parts = 0
      while (it.hasNext) {
        val n = it.next().getFileName.toString
        if (n.endsWith(".parquet") && !n.startsWith(".")) parts += 1
      }
      parts
    }
    assert(leftover == 0, "conversion takes ownership: parquet parts moved out")
    // a first-class cow table afterwards: pruned reads + DML + history
    assert(spark.sql("SELECT sum(k) s FROM conv_t").as[Long].head() ==
      (1L to 500L).sum)
    spark.sql("DELETE FROM conv_t WHERE k <= 125")
    assert(spark.sql("SELECT count(*) c FROM conv_t").as[Long].head() == 375L)
    assert(FileCow.commitInfo(root, 2L).get.removed.size == 1,
      "stats from the conversion scan prune the delete to 1 of 4 files")
    GraftTables.unregister("conv_t")
  }

  test("ALTER TABLE DROP COLUMNS: metadata-only; old versions keep the column") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-dropcol").toString
    GraftTables.registerCow("dropcol_t", root)
    spark.sql("CREATE TABLE dropcol_t AS SELECT id AS k, id % 7 AS g, " +
      "concat('p', id) AS note FROM range(1, 101)")
    def files(v: Long) = FileCow.manifest(spark, root, v).select("file")
      .collect().map(_.getString(0)).toSet

    spark.sql("ALTER TABLE dropcol_t DROP COLUMNS (note, g)")
    assert(FileCow.currentVersion(root) == 2L)
    assert(files(2L) == files(1L), "metadata-only: same data files")
    assert(spark.sql("SELECT * FROM dropcol_t").schema.map(_.name) == Seq("k"))
    // pre-drop version still time-travels WITH the columns
    assert(spark.sql("SELECT note FROM dropcol_t VERSION AS OF 1 WHERE k = 3")
      .as[String].head() == "p3")
    // dropped stats columns leave the manifest too
    assert(!FileCow.manifest(spark, root, 2L).columns.exists(_.endsWith("_g")))
    // later DML works against the narrowed schema and writes narrow files
    spark.sql("INSERT INTO dropcol_t SELECT 500")
    assert(spark.sql("SELECT count(*) c FROM dropcol_t").as[Long].head() == 101L)
    // dropping the last stats column is refused
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE dropcol_t DROP COLUMNS (k)")
    }
    assert(e.getMessage.contains("no stats column") ||
      e.getMessage.contains("cannot drop every column"))
    GraftTables.unregister("dropcol_t")
  }

  test("ZORDER BY a non-stats column is refused; DESCRIBE DETAIL shows the layout") {
    val root = Files.createTempDirectory("graft-zorder2").toString
    GraftTables.registerCow("zorder_u", root)
    spark.sql("CREATE TABLE zorder_u AS SELECT id AS a, id % 7 AS b, " +
      "concat('p', id) AS payload FROM range(0, 100)")
    val e = intercept[Exception] {
      spark.sql("OPTIMIZE zorder_u INTO 4 FILES ZORDER BY (a, payload)")
    }
    assert(e.getMessage.contains("ZORDER BY payload"))
    // DESCRIBE DETAIL: one row per data file, stats columns present, composable
    val d = spark.sql("DESCRIBE DETAIL zorder_u")
    assert(d.columns.contains("min_a") && d.columns.contains("max_b"))
    assert(d.count() == FileCow.manifest(spark, root, 1L).count())
    assert(spark.sql("DESCRIBE DETAIL zorder_u").agg(sum("rows"))
      .as[Long].head() == 100L)
    GraftTables.unregister("zorder_u")
  }
}
