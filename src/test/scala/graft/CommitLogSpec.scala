package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{CowManifestCache, FileCow}

/** Round 9: the cow table's per-commit ACTION LOG (ADR-001's named
  * optimization — Delta's JSON commit log analog) and the planning-time
  * manifest cache. Claims under test:
  *
  *   1. every DML writes a commit record whose added/removed file deltas
  *      and totals match what the commit actually did;
  *   2. the change feed derived by FOLDING the log over (from, to] is
  *      bit-identical to the full state diff of the two snapshots — across
  *      a merge/append/delete/update/compact mix, including multi-commit
  *      intervals where intermediate files cancel out;
  *   3. a missing record (pre-log table) falls back to the manifest diff
  *      with the same answer;
  *   4. DESCRIBE HISTORY totals come from the log and match the manifests;
  *   5. published manifests load ONCE per JVM — repeated reads and plans of
  *      the same version hit the driver-local cache.
  */
class CommitLogSpec extends SparkSpec {
  import spark.implicits._

  /** The INDEPENDENT reference: a full state diff of the two versions,
    * computed in plain Scala over the collected rows (test-sized data) —
    * no shared code with the implementation under test. */
  private def fullDiff(root: String, from: Long, to: Long): Set[(Long, Long, String)] = {
    def state(v: Long): Map[Long, Long] =
      FileCow.readVersion(spark, root, v).select("k", "v")
        .as[(Long, Long)].collect().toMap
    val a = state(from); val b = state(to)
    val inserts = (b.keySet -- a.keySet).map(k => (k, b(k), "insert"))
    val deletes = (a.keySet -- b.keySet).map(k => (k, a(k), "delete"))
    val updates = (a.keySet intersect b.keySet).filter(k => a(k) != b(k))
      .flatMap(k => Seq((k, a(k), "update_pre"), (k, b(k), "update_post")))
    (inserts ++ deletes ++ updates).toSet
  }

  private def asSet(df: DataFrame): Set[(Long, Long, String)] =
    df.select("k", "v", "_change_type").as[(Long, Long, String)].collect().toSet

  private def buildMixedHistory(): String = {
    val root = Files.createTempDirectory("graft-cmtlog").toString
    FileCow.create(spark, root,
      spark.range(1, 401).select(col("id").as("k"), col("id").as("v"))
        .repartitionByRange(4, col("k")), statsCols = Seq("k"))             // v1
    FileCow.merge(spark, root,
      Seq((5L, -5L), (500L, 500L)).toDF("k", "v"), keys = Seq("k"))         // v2
    FileCow.append(spark, root, Seq((600L, 600L), (601L, 601L)).toDF("k", "v")) // v3
    FileCow.delete(spark, root, col("k") <= 50)                             // v4
    FileCow.update(spark, root, set = Seq("v" -> lit(0L)), cond = col("k") === 300L) // v5
    FileCow.compact(spark, root, targetFiles = 2)                           // v6
    root
  }

  test("every commit writes an action record matching what it did") {
    val root = buildMixedHistory()
    val kinds = (1L to 6L).map(v => FileCow.commitInfo(root, v).get.kind)
    assert(kinds == Seq("create", "merge", "append", "delete", "update", "compact"))
    val c2 = FileCow.commitInfo(root, 2L).get
    assert(c2.removed.size == 1 && c2.added.nonEmpty, "merge touched 1 of 4 files")
    val c3 = FileCow.commitInfo(root, 3L).get
    assert(c3.removed.isEmpty, "append removes nothing")
    val c6 = FileCow.commitInfo(root, 6L).get
    assert(c6.nFiles == 2L, "compact's record carries the new layout totals")
    // record totals equal the manifest's actual totals at every version
    (1L to 6L).foreach { v =>
      val ci = FileCow.commitInfo(root, v).get
      val agg = FileCow.manifest(spark, root, v)
        .agg(count(lit(1)), coalesce(sum("rows"), lit(0L)), coalesce(sum("bytes"), lit(0L)))
        .as[(Long, Long, Long)].head()
      assert((ci.nFiles, ci.nRows, ci.bytes) == agg, s"v$v totals drift")
    }
  }

  test("log-derived change feed == full state diff, single and multi-commit intervals") {
    val root = buildMixedHistory()
    for ((from, to) <- Seq((1L, 2L), (2L, 4L), (1L, 5L), (3L, 6L), (1L, 6L))) {
      val logFeed = asSet(FileCow.changesBetween(spark, root, Seq("k"), from, to))
      val reference = fullDiff(root, from, to)
      assert(logFeed == reference, s"feed drift on v$from -> v$to")
    }
    // compact alone is layout-only: empty feed from the log path too
    assert(FileCow.changesBetween(spark, root, Seq("k"), 5L, 6L).isEmpty)
  }

  test("append-only interval: the feed is a scan + tag — no join, no shuffle") {
    val root = Files.createTempDirectory("graft-cmtapp").toString
    FileCow.create(spark, root,
      spark.range(1, 101).select(col("id").as("k"), col("id").as("v"))
        .repartitionByRange(2, col("k")), statsCols = Seq("k"))
    FileCow.append(spark, root, Seq((500L, 500L)).toDF("k", "v"))
    FileCow.append(spark, root, Seq((600L, 600L), (601L, 601L)).toDF("k", "v"))
    val feed = FileCow.changesBetween(spark, root, Seq("k"), 1L, 3L)
    assert(asSet(feed) == fullDiff(root, 1L, 3L))
    assert(asSet(feed).forall(_._3 == "insert"))
    // the one-sided short-circuit: the physical plan carries no exchange
    // and no join — the feed cost is exactly the new files' scan
    val plan = feed.queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(exchanges.isEmpty && joins.isEmpty,
      s"append-only feed must be join/shuffle-free, got ${plan.treeString.take(400)}")
  }

  test("a missing commit record falls back to the manifest diff, same answer") {
    val root = buildMixedHistory()
    Files.delete(Paths.get(root, "_manifests", "m4.commit.json"))
    assert(FileCow.commitInfo(root, 4L).isEmpty)
    val feed = asSet(FileCow.changesBetween(spark, root, Seq("k"), 2L, 5L))
    assert(feed == fullDiff(root, 2L, 5L))
  }

  test("DESCRIBE HISTORY serves totals from the log and matches the manifests") {
    val root = buildMixedHistory()
    val h = FileCow.history(spark, root).orderBy("version")
      .select("version", "n_files", "n_rows").as[(Long, Long, Long)].collect().toSeq
    assert(h.map(_._1) == (1L to 6L))
    assert(h.head._3 == 400L)            // create
    assert(h(1)._3 == 401L)              // merge added key 500
    assert(h(2)._3 == 403L)              // append added 2
    assert(h(3)._3 == 353L)              // delete k<=50
    assert(h(4)._3 == 353L)              // update: same row count
    assert(h(5) == ((6L, 2L, 353L)))     // compact: 2 files, same rows
  }

  test("published manifests load once per JVM: repeated reads hit the cache") {
    val root = buildMixedHistory()
    FileCow.read(spark, root).count() // warm the current version's entry
    val before = CowManifestCache.loads
    // three query plans + a manifest inspection of the SAME version
    // v6 state: 51..400 plus 500, 600, 601 → k>390 is 10 + 3 keys
    assert(FileCow.read(spark, root).filter(col("k") > 390).count() == 13L)
    assert(FileCow.read(spark, root).filter(col("k") === 300).select("v")
      .as[Long].head() == 0L)
    FileCow.manifest(spark, root, FileCow.currentVersion(root)).count()
    assert(CowManifestCache.loads == before,
      "same-version plans must not reload the manifest parquet")
    // historical versions were cached while the DML mix ran: still no load
    FileCow.readVersion(spark, root, 2L).count()
    assert(CowManifestCache.loads == before)
    // a fresh create SEEDS the cache at commit time (round 10: a commit
    // resolves its manifest driver-side and hands it straight over) — the
    // first read does ZERO manifest loads
    val root2 = Files.createTempDirectory("graft-cmtlog2").toString
    FileCow.create(spark, root2,
      Seq((1L, 1L)).toDF("k", "v").repartition(1), statsCols = Seq("k"))
    val base = CowManifestCache.loads
    FileCow.read(spark, root2).count()
    assert(CowManifestCache.loads == base, "commit-seeded version must not reload")
    // a genuinely COLD table (fresh JVM simulated by invalidation) is a
    // miss — exactly once, then hits
    CowManifestCache.invalidate(root2)
    FileCow.read(spark, root2).count()
    assert(CowManifestCache.loads == base + 1)
    FileCow.read(spark, root2).count()
    assert(CowManifestCache.loads == base + 1)
  }
}
