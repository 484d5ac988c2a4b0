package graft

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.DataFrame

import graft.sources.{FileCow, GraftTransactions}

/** CDC semantics of cross-table transactions (round 16): what a
  * DOWNSTREAM REPLICA consuming the change feed sees across a txn's
  * lifecycle. The dangerous window is an ABORTED txn: its gated versions
  * are durable commits that were never visible, and the `txn_revert`
  * heal removes their files — a version-granular feed that emitted them
  * would hand a replica the aborted rows as real inserts one trigger
  * before their reverting deletes (transiently wrong), and an
  * append-only table stream would either fail on the revert or, under
  * skipChangeCommits, keep the aborted rows FOREVER. The whole span must
  * feed as NOTHING; a committed txn's changes must feed exactly once, at
  * the visibility flip. */
class TxnChangeFeedSpec extends SparkSpec {

  private def mkTable(tag: String, rows: Long = 10L): String = {
    val root = Files.createTempDirectory(s"graft-txncdf-$tag").resolve("t").toString
    val s = spark
    import s.implicits._
    FileCow.create(spark, root,
      (0L until rows).map(k => (k, "seed", 0L)).toDF("k", "val", "u"),
      statsCols = Seq("k"))
    root
  }

  private def appendOne(root: String, k: Long): Unit = {
    val s = spark
    import s.implicits._
    FileCow.append(spark, root, Seq((k, "new", 1L)).toDF("k", "val", "u"))
    ()
  }

  private def abortedTxn(root: String, k: Long): Unit = {
    val dir = Files.createTempDirectory("graft-txncdf-m").toString
    val e = intercept[RuntimeException] {
      GraftTransactions.run(spark, dir) { appendOne(root, k); sys.error("boom") }
    }
    assert(e.getMessage.contains("boom"))
  }

  test("batch change feed across an aborted txn + its heal is NET EMPTY") {
    val t = mkTable("batch")
    abortedTxn(t, 600L) // v2 gated-aborted append, v3 txn_revert
    assert(FileCow.currentVersion(t) == 3L)
    assert(FileCow.changesBetween(spark, t, Seq("k"), 1L, 3L).count() == 0L,
      "the whole aborted span must fold to no changes")
  }

  test("CDF stream: an aborted txn feeds a replica NOTHING even at maxVersionsPerTrigger=1; a committed txn feeds at the flip") {
    val t = mkTable("cdf")
    val got = mutable.Set.empty[(Long, String, Long)]
    val q = spark.readStream.format("graft-cow").option("root", t)
      .option("readChangeFeed", "true").option("keys", "k")
      .option("maxVersionsPerTrigger", "1") // version-granular batches:
      // the exact shape that would expose aborted rows one trigger early
      .load().writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        got.synchronized {
          got ++= b.select("k", "_change_type", "_commit_version").collect()
            .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft-txncdf-ck").toString)
      .start()
    try {
      q.processAllAvailable()
      abortedTxn(t, 600L) // v2 aborted, v3 txn_revert
      q.processAllAvailable()
      assert(got.isEmpty, s"the replica saw never-visible changes: $got")

      val dir = Files.createTempDirectory("graft-txncdf-cm").toString
      GraftTransactions.run(spark, dir) { appendOne(t, 601L) } // v4, committed
      appendOne(t, 602L) // v5, clean
      q.processAllAvailable()
      assert(got.toSet == Set((601L, "insert", 4L), (602L, "insert", 5L)),
        s"committed changes must feed exactly once, at their versions: $got")
    } finally q.stop()
  }

  test("feed classification survives marker retention: a FRESH consumer replaying after vacuumMarkers still skips the aborted span via the sealed ledger") {
    val t = mkTable("sealed")
    val dir = Files.createTempDirectory("graft-txncdf-sm").toString
    val e = intercept[RuntimeException] {
      GraftTransactions.run(spark, dir) { appendOne(t, 800L); sys.error("boom") }
    }
    assert(e.getMessage.contains("boom"))
    val cm = Files.createTempDirectory("graft-txncdf-sc").toString
    GraftTransactions.run(spark, cm) { appendOne(t, 801L) }
    // seal BOTH decided markers into their ledgers, drop the files, and
    // drop every in-JVM memo — the consumer below classifies like a
    // process that never saw the live markers
    assert(GraftTransactions.vacuumMarkers(dir, retainMs = 0L) == 1)
    assert(GraftTransactions.vacuumMarkers(cm, retainMs = 0L) == 1)
    GraftTransactions.resetCachesForTest()
    val got = mutable.Set.empty[(Long, String)]
    val q = spark.readStream.format("graft-cow").option("root", t)
      .option("readChangeFeed", "true").option("keys", "k")
      .option("maxVersionsPerTrigger", "1")
      .option("startingVersion", "1") // REPLAY the whole history
      .load().writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        got.synchronized {
          got ++= b.select("k", "_change_type").collect()
            .map(r => (r.getLong(0), r.getString(1)))
        }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft-txncdf-sck").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(got.toSet == Set((801L, "insert")),
        s"ledger-classified replay must skip the aborted span only: $got")
    } finally q.stop()
  }

  test("append-only table stream sails through an aborted span WITHOUT skipChangeCommits; committed txn appends flow") {
    val t = mkTable("ts")
    val got = mutable.Set.empty[Long]
    val q = spark.readStream.format("graft-cow").option("root", t)
      .load().writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        got.synchronized { got ++= b.select("k").collect().map(_.getLong(0)) }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft-txncdf-ck2").toString)
      .start()
    try {
      q.processAllAvailable()
      abortedTxn(t, 700L) // pre-fix: the txn_revert failed this stream
      q.processAllAvailable()
      assert(q.exception.isEmpty,
        s"the heal must not kill an append-only stream: ${q.exception}")
      assert(got.isEmpty, s"aborted appends must never reach the sink: $got")
      appendOne(t, 701L)
      val dir = Files.createTempDirectory("graft-txncdf-tm").toString
      GraftTransactions.run(spark, dir) { appendOne(t, 702L) }
      q.processAllAvailable()
      assert(got.toSet == Set(701L, 702L), got.toString)
    } finally q.stop()
  }
}
