package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.plans.GraftTables
import graft.sources.FileCow

/** DELETION VECTORS (Delta's DV feature) on cow tables: with
  * `graft.dv.enabled=true`, DELETE records the deleted rows' (file, row
  * index) pairs in a `_dv/` sidecar instead of rewriting files — O(deleted
  * rows), zero files rewritten — and every reader anti-joins them out.
  * The spec pins the whole lifecycle: reads/time travel, SQL parity,
  * repeated deletes folding per-file vectors, the change feed seeing DV
  * deletes on an UNCHANGED file set, merge/compaction materializing,
  * overflow falling back to the rewrite path, restore rewinding the DV
  * state, the append stream refusing to silently pass a DV commit, and
  * the metadata-only COUNT rewrite declining.
  */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private def mkDvTable(name: String): String = {
    val root = Files.createTempDirectory(s"graft-dv-$name").toString
    FileCow.create(spark, root,
      spark.range(1, 1001).select(col("id").as("k"), (col("id") % 7).as("g"),
        concat(lit("v"), col("id")).as("p")).repartitionByRange(8, col("k")),
      statsCols = Seq("k"))                                    // v1
    FileCow.setTableProperties(spark, root,
      Map("graft.dv.enabled" -> "true"))                       // v2
    root
  }

  private def files(root: String, v: Long): Set[String] =
    FileCow.manifest(spark, root, v).select("file")
      .collect().map(_.getString(0)).toSet

  test("DV delete rewrites nothing; reads, time travel and repeat deletes are exact") {
    val root = mkDvTable("core")
    val c = FileCow.delete(spark, root, col("k") % 100 === 0)  // v3: 10 rows
    assert(c.filesRewritten == 0L, "a DV delete must rewrite no file")
    assert(files(root, 2L) == files(root, 3L), "file set unchanged")
    assert(FileCow.dvRegistryOf(root, 3L).nonEmpty)

    val got = FileCow.read(spark, root)
    assert(got.count() == 990L)
    assert(got.filter(col("k") % 100 === 0).isEmpty)
    // time travel BEFORE the delete still sees the rows
    assert(FileCow.readVersion(spark, root, 2L).count() == 1000L)

    // a second delete on overlapping files folds per-file vectors
    FileCow.delete(spark, root, col("k") % 100 === 50)         // v4: 10 more
    assert(FileCow.read(spark, root).count() == 980L)
    assert(FileCow.readVersion(spark, root, 3L).count() == 990L,
      "each version keeps its exact deleted-row set")
    // pushed filters still prune files through the DV anti-join
    val q = FileCow.read(spark, root).filter(col("k").between(1, 100))
    assert(q.count() == 98L)
    val scan = q.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case s: FileSourceScanExec => s }.get
    val opened = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters).flatMap(_.files).length
    assert(opened == 1, s"stat pruning must survive the DV join, opened $opened")
  }

  test("SQL DELETE routes through DVs; count(*) declines metadata-only and is right") {
    val root = mkDvTable("sql")
    GraftTables.registerCow("dv_sql", root)
    spark.sql("DELETE FROM dv_sql WHERE k <= 20")
    assert(FileCow.dvRegistryOf(root, FileCow.currentVersion(root)).nonEmpty)
    val n = spark.sql("SELECT count(*) AS n FROM dv_sql")
    assert(!n.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]),
      "metadata-only COUNT must decline on a DV table")
    assert(n.as[Long].head() == 980L)
    assert(spark.sql("SELECT min(k) AS m FROM dv_sql").as[Long].head() == 21L)
    GraftTables.unregister("dv_sql")
  }

  test("the change feed sees DV deletes on an unchanged file set; restore rewinds them") {
    val root = mkDvTable("cdf")                                 // v2 = full
    FileCow.delete(spark, root, col("k") <= 5)                  // v3: DV delete
    val feed = FileCow.changesBetween(spark, root, Seq("k"), 2L, 3L)
    assert(feed.filter(col("_change_type") === "delete")
      .select("k").as[Long].collect().toSet == Set(1L, 2L, 3L, 4L, 5L))
    assert(feed.count() == 5L, "exactly the DV-deleted rows feed")

    FileCow.restore(spark, root, 2L)                            // v4: un-delete
    assert(FileCow.read(spark, root).count() == 1000L,
      "restore rewinds the DV state with the file state")
    val back = FileCow.changesBetween(spark, root, Seq("k"), 3L, 4L)
    assert(back.filter(col("_change_type") === "insert")
      .select("k").as[Long].collect().toSet == Set(1L, 2L, 3L, 4L, 5L),
      "the undo delta is the re-appeared rows")
    // and across the whole interval the table is unchanged
    assert(FileCow.changesBetween(spark, root, Seq("k"), 2L, 4L).isEmpty)
  }

  test("merge and compaction read through DVs and materialize them") {
    val root = mkDvTable("mat")
    FileCow.delete(spark, root, col("k") === 100L)              // v3: DV
    // merge on the file holding k=100: base must EXCLUDE the deleted row,
    // and the rewrite retires the file -> its vector drops
    FileCow.merge(spark, root,
      Seq((101L, 0L, "upd")).toDF("k", "g", "p"), keys = Seq("k"))
    val reg = FileCow.dvRegistryOf(root, FileCow.currentVersion(root))
    assert(reg.isEmpty, s"rewrite must materialize the touched file's vector, got $reg")
    val got = FileCow.read(spark, root)
    assert(got.filter(col("k") === 100L).isEmpty, "deleted row must not resurrect")
    assert(got.filter(col("k") === 101L).select("p").as[String].head() == "upd")
    assert(got.count() == 999L)

    // compaction materializes everything
    FileCow.delete(spark, root, col("k") === 200L)
    assert(FileCow.dvRegistryOf(root, FileCow.currentVersion(root)).nonEmpty)
    FileCow.compact(spark, root, targetFiles = 2)
    assert(FileCow.dvRegistryOf(root, FileCow.currentVersion(root)).isEmpty)
    assert(FileCow.read(spark, root).count() == 998L)
  }

  test("overflow falls back to the rewrite path; format reads and clones refuse loudly") {
    val root = mkDvTable("cap")
    FileCow.setTableProperties(spark, root, Map("graft.dv.maxRows" -> "3"))
    val c = FileCow.delete(spark, root, col("k") <= 10)         // 10 > cap
    assert(c.filesRewritten >= 1L, "over-cap delete must rewrite, not vector")
    assert(FileCow.dvRegistryOf(root, FileCow.currentVersion(root)).isEmpty)
    assert(FileCow.read(spark, root).count() == 990L)

    // under the cap: vectors; then the format reader and clones refuse
    val c2 = FileCow.delete(spark, root, col("k") === 500L)
    assert(c2.filesRewritten == 0L)
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-cow").option("root", root).load().count()
    }
    assert(e.getMessage.contains("deletion vectors"))
    val e2 = intercept[IllegalArgumentException] {
      FileCow.shallowClone(spark, root,
        Files.createTempDirectory("graft-dv-clone").toString)
    }
    assert(e2.getMessage.contains("deletion vectors"))
  }

  test("DESCRIBE DETAIL surfaces per-file dv_rows; RESTORE TIMESTAMP AS OF rewinds") {
    val root = mkDvTable("detail")
    GraftTables.registerCow("dv_detail", root)
    val tsBefore = new java.sql.Timestamp(System.currentTimeMillis()).toString
    Thread.sleep(20)
    spark.sql("DELETE FROM dv_detail WHERE k <= 3")
    val det = spark.sql("DESCRIBE DETAIL dv_detail")
    assert(det.columns.contains("dv_rows"))
    assert(det.agg(sum("dv_rows")).as[Long].head() == 3L,
      "the standing vector rows show per file")
    assert(det.filter(col("dv_rows") === 3L).count() == 1L,
      "all three deleted keys live in the one k-range file")

    spark.sql(s"RESTORE TABLE dv_detail TO TIMESTAMP AS OF '$tsBefore'")
    assert(spark.sql("SELECT count(*) c FROM dv_detail").as[Long].head() == 1000L,
      "timestamp restore rewinds the DV state too")
    GraftTables.unregister("dv_detail")
  }

  test("the CDF STREAM delivers a DV delete's rows as deletes (F19 across vectors)") {
    val root = mkDvTable("cdf-stream")
    val got = scala.collection.mutable.Set.empty[(Long, String, Long)]
    val q = spark.readStream.format("graft-cdf").option("root", root)
      .option("keys", "k").load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        got.synchronized {
          got ++= b.select("k", "_change_type", "_commit_version").collect()
            .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        }
        ()
      }
      .option("checkpointLocation", Files.createTempDirectory("dv-cdf-ck").toString)
      .start()
    try {
      // drain first: the source pins its start version when it is CREATED
      // (async after start()); deleting before that could pin past v3
      q.processAllAvailable()
      FileCow.delete(spark, root, col("k").isin(11L, 12L))   // v3: DV delete
      q.processAllAvailable()
      assert(got.toSet == Set((11L, "delete", 3L), (12L, "delete", 3L)),
        s"the stream must carry the DV-deleted rows, got $got")
    } finally q.stop()
  }

  test("a data column named 'file' keeps meaning the DATA column in a DV delete") {
    val root = Files.createTempDirectory("graft-dv-filecol").toString
    FileCow.create(spark, root,
      spark.range(1, 101).select(col("id").as("k"),
        concat(lit("doc"), col("id"), lit(".csv")).as("file"),
        col("id").as("row_idx")).repartitionByRange(4, col("k")),
      statsCols = Seq("k"))
    FileCow.setTableProperties(spark, root, Map("graft.dv.enabled" -> "true"))
    FileCow.delete(spark, root, col("file") === "doc7.csv")
    val got = FileCow.read(spark, root)
    assert(got.count() == 99L)
    assert(got.filter(col("file") === "doc7.csv").isEmpty,
      "the condition must bind the user's 'file' column, not the metadata basename")
    assert(got.filter(col("k") === 8L).count() == 1L)
  }

  test("a DV-only restore never passes the append stream as metadata-only") {
    val root = mkDvTable("rst-stream")
    FileCow.delete(spark, root, col("k") === 9L)              // v3: DV delete
    val startAt = FileCow.currentVersion(root)
    val q = spark.readStream.format("graft-cow").option("root", root)
      .option("startingVersion", startAt.toString).load()
      .writeStream
      .foreachBatch { (_: DataFrame, _: Long) => () }
      .option("checkpointLocation", Files.createTempDirectory("dv-rst-ck").toString)
      .start()
    try {
      FileCow.restore(spark, root, 2L) // v4: SAME file set, vectors rewound
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("deletion vectors") ||
        e.getCause.getMessage.contains("deletion vectors"),
        "rows re-appeared with no file change: the stream must not skip it")
    } finally q.stop()
  }

  test("the append stream never silently passes a DV commit; vacuum sweeps dead sidecars") {
    val root = mkDvTable("stream")
    FileCow.delete(spark, root, col("k") === 7L)                // DV commit
    val got = scala.collection.mutable.Set.empty[Long]
    val ckpt = Files.createTempDirectory("dv-ck")
    val q = spark.readStream.format("graft-cow").option("root", root)
      .option("startingVersion", "0").load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        got.synchronized { got ++= b.select("k").collect().map(_.getLong(0)) }; ()
      }
      .option("checkpointLocation", ckpt.toString)
      .start()
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("deletion vectors") ||
        e.getCause.getMessage.contains("deletion vectors"))
    } finally q.stop()
    // the DEAD stream is abandoned: drop its checkpoint, deregistering it
    // from vacuum protection (r13 G30 — a live checkpoint would rightly
    // floor retention at its delivered version and keep the sidecar)
    locally {
      val w = Files.walk(ckpt)
      try w.sorted(java.util.Comparator.reverseOrder()).forEach(f => Files.delete(f))
      finally w.close()
    }

    // compaction materializes; vacuum then reclaims the orphaned sidecar
    FileCow.compact(spark, root, targetFiles = 2)
    assert(Files.list(Paths.get(root, "_dv")).count() > 0)
    FileCow.vacuum(spark, root, keep = 1, minAgeMs = 0L)
    assert(Files.list(Paths.get(root, "_dv")).count() == 0,
      "no retained registry names the sidecar: swept")
    assert(FileCow.read(spark, root).count() == 999L)
  }
}
