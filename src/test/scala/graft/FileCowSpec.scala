package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.FileCow

/** G19: file-level copy-on-write tables — manifest snapshots, COW DML,
  * stat-pruned reads, incremental CDF, reference-counted vacuum, and the
  * optimistic-concurrency commit race. The central claims under test:
  *
  *   1. every DML result equals its whole-table reference computation;
  *   2. the new manifest SHARES (by path) every file the DML did not touch
  *      — commit cost is touched-files-sized, the COW property itself;
  *   3. reads prune files through the manifest's per-file stats;
  *   4. the change feed between versions never needs the shared files.
  */
class FileCowSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-filecow").toString

  /** 1000 keyed rows in 8 range-partitioned files (disjoint id ranges). */
  private def baseDf: DataFrame =
    spark.range(1, 1001).select(
      col("id"),
      (col("id") % 7).as("grp"),
      concat(lit("v"), col("id")).as("payload"))
      .repartitionByRange(8, col("id"))

  private def createBase(root: String): Unit = {
    val c = FileCow.create(spark, root, baseDf, statsCols = Seq("id"))
    assert(c.version == 1L && c.filesAdded == 8L)
  }

  private def fileSet(root: String, v: Long): Set[String] =
    FileCow.manifest(spark, root, v).select("file").collect().map(_.getString(0)).toSet

  private def asMap(df: DataFrame): Map[Long, (Long, String)] =
    df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

  test("create / read round trip, manifest carries per-file stats") {
    val root = freshRoot()
    createBase(root)
    assert(FileCow.versions(root) == Seq(1L))
    val got = FileCow.read(spark, root)
    assert(got.schema.map(_.name) == Seq("id", "grp", "payload"))
    assert(asMap(got.select("id", "grp", "payload")) == asMap(baseDf))
    val man = FileCow.manifest(spark, root, 1L)
    assert(man.columns.toSeq == Seq("file", "bytes", "mtime", "rows", "min_id", "max_id"))
    // range partitioning ⇒ disjoint per-file id intervals covering 1..1000
    val rows = man.select("rows", "min_id", "max_id").collect()
    assert(rows.map(_.getLong(0)).sum == 1000L)
    val ivs = rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ivs.head._1 == 1L && ivs.last._2 == 1000L)
    ivs.sliding(2).foreach { case Array((_, hi), (lo, _)) => assert(hi < lo); case _ => }
  }

  test("merge rewrites only the files whose stats admit a source key; result == reference upsert") {
    val root = freshRoot()
    createBase(root)
    val v1Files = fileSet(root, 1L)
    // updates confined to ids 10..19 (one range file) + fresh inserts
    val source = spark.range(10, 20).select(col("id"), lit(99L).as("grp"),
        lit("UPD").as("payload"))
      .unionByName(spark.range(2001, 2011).select(col("id"), lit(0L).as("grp"),
        lit("NEW").as("payload")))
    val c = FileCow.merge(spark, root, source, keys = Seq("id"))
    assert(c.version == 2L)
    assert(c.filesRewritten == 1L, s"expected 1 touched file, got ${c.filesRewritten}")
    assert(c.filesKept == 7L)
    // COW sharing: v2's manifest carries v1's untouched files BY PATH
    val v2Files = fileSet(root, 2L)
    assert((v1Files intersect v2Files).size == 7)
    // reference upsert: base overwritten by source, inserts appended
    assert(asMap(FileCow.read(spark, root)) == asMap(baseDf) ++ asMap(source))
    // time travel: v1 still reads the original
    assert(asMap(FileCow.readVersion(spark, root, 1L)) == asMap(baseDf))
  }

  test("reads prune data files through manifest stats (planner-side)") {
    val root = freshRoot()
    createBase(root)
    val q = FileCow.read(spark, root).filter(col("id").between(1, 100))
    assert(q.count() == 100L)
    import org.apache.spark.sql.execution.FileSourceScanExec
    val scan = q.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case s: FileSourceScanExec => s }.get
    val opened = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters).flatMap(_.files).length
    assert(opened == 1, s"id<=100 lives in 1 of 8 range files, scan opened $opened")
  }

  test("delete rewrites only admitted files; result == reference filter") {
    val root = freshRoot()
    createBase(root)
    val c = FileCow.delete(spark, root, col("id").between(100, 150))
    assert(c.version == 2L && c.filesRewritten <= 2L,
      s"a 51-key range spans ≤2 range files, rewrote ${c.filesRewritten}")
    assert(c.filesKept + c.filesRewritten == 8L)
    val got = asMap(FileCow.read(spark, root))
    val want = asMap(baseDf).filterNot { case (k, _) => k >= 100L && k <= 150L }
    assert(got == want)
    assert(fileSet(root, 2L).intersect(fileSet(root, 1L)).size == (8 - c.filesRewritten).toInt)
  }

  test("update casts assignments and touches only admitted files") {
    val root = freshRoot()
    createBase(root)
    val c = FileCow.update(spark, root,
      set = Seq("payload" -> concat(lit("X"), col("payload")), "grp" -> lit(42)),
      cond = col("id") <= 10)
    assert(c.filesRewritten == 1L)
    val got = asMap(FileCow.read(spark, root))
    assert(got(5L) == (42L, "Xv5"), s"got ${got(5L)}")
    assert(got(11L) == (11L % 7, "v11"))
    // grp assignment was an Int literal → cast to the declared LongType
    assert(FileCow.read(spark, root).schema("grp").dataType.typeName == "long")
  }

  test("change feed diffs ONLY unshared files, equals the reference diff, applies v1→v2") {
    val root = freshRoot()
    createBase(root)
    val source = spark.range(10, 20).select(col("id"), lit(99L).as("grp"),
        lit("UPD").as("payload"))
      .unionByName(spark.range(2001, 2011).select(col("id"), lit(0L).as("grp"),
        lit("NEW").as("payload")))
    FileCow.merge(spark, root, source, keys = Seq("id"))
    FileCow.delete(spark, root, col("id").between(500, 520))
    val feed = FileCow.changesBetween(spark, root, Seq("id"), 1L, 3L).cache()
    // shape: updates both-imaged, inserts, deletes — and nothing else
    val byType = feed.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("insert" -> 10L, "delete" -> 21L,
      "update_pre" -> 10L, "update_post" -> 10L), s"got $byType")
    // applying the feed to v1 reproduces v3 exactly (G17's contract)
    val v1 = FileCow.readVersion(spark, root, 1L)
    val out = feed.filter(col("_change_type").isin("delete", "update_pre")).select("id")
    val in = feed.filter(col("_change_type").isin("insert", "update_post"))
      .select("id", "grp", "payload")
    val applied = v1.join(out, Seq("id"), "left_anti").unionByName(in)
    assert(asMap(applied) == asMap(FileCow.readVersion(spark, root, 3L)))
    // incrementality: v1 and v3 still share untouched files — the diff
    // above cannot have scanned them (they are excluded by construction)
    assert(fileSet(root, 1L).intersect(fileSet(root, 3L)).nonEmpty)
    feed.unpersist()
  }

  test("merge rejects duplicate source keys and drifted schemas") {
    val root = freshRoot()
    createBase(root)
    val dup = spark.range(1, 3).select(lit(7L).as("id"), col("id").as("grp"),
      lit("d").as("payload"))
    intercept[IllegalArgumentException] {
      FileCow.merge(spark, root, dup, keys = Seq("id"))
    }
    val drifted = spark.range(1, 3).select(col("id"), col("id").as("grp"))
    // r13: the drift guard throws the TYPED race exception so
    // GraftCommit.retryingSchema classifies by type, not message shape
    intercept[graft.sources.GraftConcurrentSchemaChange] {
      FileCow.merge(spark, root, drifted, keys = Seq("id"))
    }
  }

  test("delete-to-empty keeps the schema; merge into an empty table re-seeds it") {
    val root = freshRoot()
    createBase(root)
    FileCow.delete(spark, root, lit(true))
    val empty = FileCow.read(spark, root)
    assert(empty.count() == 0L)
    assert(empty.schema.map(_.name) == Seq("id", "grp", "payload"))
    val c = FileCow.merge(spark, root,
      spark.range(1, 6).select(col("id"), col("id").as("grp"), lit("re").as("payload")),
      keys = Seq("id"))
    assert(c.version == 3L)
    assert(FileCow.read(spark, root).count() == 5L)
  }

  test("vacuum drops old manifests, reclaims unreferenced data files AND race orphans") {
    val root = freshRoot()
    createBase(root)
    FileCow.delete(spark, root, col("id") <= 500)   // v2 rewrites ~half the files
    FileCow.update(spark, root, Seq("grp" -> lit(0L)), col("id") > 990) // v3
    // plant an orphan: a lost commit race leaves data files no manifest names
    val orphan = Paths.get(root, "_data", "f-orphan-test.parquet")
    Files.write(orphan, Array[Byte](1, 2, 3))
    val liveFiles = fileSet(root, FileCow.currentVersion(root))
    val removed = FileCow.vacuum(spark, root, keep = 1)
    assert(removed.contains(orphan.toString))
    assert(FileCow.versions(root) == Seq(3L))
    intercept[IllegalArgumentException] { FileCow.readVersion(spark, root, 1L) }
    // the current version is byte-undisturbed
    assert(fileSet(root, 3L) == liveFiles)
    val got = FileCow.read(spark, root)
    assert(got.count() == 500L)
    // _data now holds exactly the live manifest's files
    val onDisk = {
      val s = Files.list(Paths.get(root, "_data"))
      try {
        val b = scala.collection.mutable.ArrayBuffer.empty[String]
        s.iterator().forEachRemaining(p => b += p.toString)
        b.toSet
      } finally s.close()
    }
    assert(onDisk == liveFiles)
    // retention age: a FRESH unreferenced file (an in-flight commit's data,
    // from vacuum's point of view) survives an aged vacuum
    val fresh = Paths.get(root, "_data", "f-inflight-test.parquet")
    Files.write(fresh, Array[Byte](9))
    assert(FileCow.vacuum(spark, root, keep = 1, minAgeMs = 3600000L).isEmpty)
    assert(Files.exists(fresh))
    assert(FileCow.vacuum(spark, root, keep = 1).contains(fresh.toString))
  }

  test("compact is layout-only: fewer files, identical rows, EMPTY change feed") {
    val root = freshRoot()
    createBase(root)
    // grow the file count the way a stream does: two insert batches
    FileCow.merge(spark, root, spark.range(2001, 2101).select(col("id"),
      lit(0L).as("grp"), lit("a").as("payload")), Seq("id"))
    FileCow.merge(spark, root, spark.range(3001, 3101).select(col("id"),
      lit(0L).as("grp"), lit("b").as("payload")), Seq("id"))
    val vPre = FileCow.currentVersion(root)
    val before = asMap(FileCow.read(spark, root))
    val nPre = fileSet(root, vPre).size
    val c = FileCow.compact(spark, root, targetFiles = 4)
    assert(c.filesAdded == 4L && c.filesRewritten == nPre.toLong)
    assert(fileSet(root, c.version).size == 4)
    assert(asMap(FileCow.read(spark, root)) == before)
    // layout-only: the row-level feed across the compact commit is EMPTY
    assert(FileCow.changesBetween(spark, root, Seq("id"), vPre, c.version).isEmpty)
  }

  test("addColumn is metadata-only; old files read the column as NULL; DML then writes it") {
    val root = freshRoot()
    createBase(root)
    val c = FileCow.addColumn(spark, root,
      org.apache.spark.sql.types.StructField("note",
        org.apache.spark.sql.types.StringType, nullable = true))
    assert(c.filesKept == 8L && c.filesRewritten == 0L && c.filesAdded == 0L)
    assert(fileSet(root, 1L) == fileSet(root, 2L), "no data file was touched")
    val got = FileCow.read(spark, root)
    assert(got.schema.map(_.name) == Seq("id", "grp", "payload", "note"))
    assert(got.filter(col("note").isNotNull).count() == 0L)
    // a later UPDATE fills the column for the files it rewrites
    FileCow.update(spark, root, Seq("note" -> lit("tagged")), col("id") <= 10)
    assert(FileCow.read(spark, root).filter(col("note") === "tagged").count() == 10L)
    assert(FileCow.read(spark, root).count() == 1000L)
    // duplicates and non-nullable additions are refused
    intercept[IllegalArgumentException] {
      FileCow.addColumn(spark, root, org.apache.spark.sql.types.StructField(
        "NOTE", org.apache.spark.sql.types.StringType, nullable = true))
    }
    intercept[IllegalArgumentException] {
      FileCow.addColumn(spark, root, org.apache.spark.sql.types.StructField(
        "strict", org.apache.spark.sql.types.LongType, nullable = false))
    }
  }

  test("two concurrent merges on disjoint keys: both land exactly once (CAS + retry)") {
    val root = freshRoot()
    createBase(root)
    val srcA = spark.range(1, 6).select(col("id"), lit(-1L).as("grp"), lit("A").as("payload"))
    val srcB = spark.range(995, 1000).select(col("id"), lit(-2L).as("grp"), lit("B").as("payload"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fa = Future(FileCow.merge(spark, root, srcA, Seq("id")))
    val fb = Future(FileCow.merge(spark, root, srcB, Seq("id")))
    val (ca, cb) = (Await.result(fa, 120.seconds), Await.result(fb, 120.seconds))
    assert(Set(ca.version, cb.version) == Set(2L, 3L))
    assert(FileCow.currentVersion(root) == 3L)
    val got = asMap(FileCow.read(spark, root))
    assert((1L until 6L).forall(k => got(k) == (-1L, "A")))
    assert((995L until 1000L).forall(k => got(k) == (-2L, "B")))
    assert(got.size == 1000)
  }
}
