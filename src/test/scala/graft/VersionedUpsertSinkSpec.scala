package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{Event, UpsertSink, VersionedUpsertSink}
import graft.sources.Versioned

/** F17: streaming upsert into a versioned graft table — per-batch snapshot
  * commits through the shared optimistic-concurrency loop, the batch-id
  * transaction marker skipping replays, and twin parity with F7's
  * latest-per-key semantics.
  */
class VersionedUpsertSinkSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private def readRows(root: String): Set[(Long, Long, Double)] =
    Versioned.read(spark, root).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"), r.getAs[Double]("value")))
      .toSet

  test("F17 streamed upsert: one snapshot per batch, twin parity with F7 core") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val root = Files.createTempDirectory("f17").resolve("t").toString
    val ckpt = Files.createTempDirectory("f17-ck").toString

    val b1 = Seq(Event(10L, ts(1), 1L, "view", 1.0), Event(11L, ts(2), 2L, "view", 2.0))
    val b2 = Seq(Event(12L, ts(5), 1L, "purchase", 5.0), Event(13L, ts(4), 3L, "view", 3.0))

    val input = MemoryStream[Event]
    val q = VersionedUpsertSink.sink(input.toDF(), root, "spec-app", ckpt)
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
    } finally q.stop()

    assert(readRows(root) == Set((1L, 12L, 5.0), (2L, 11L, 2.0), (3L, 13L, 3.0)))
    assert(Versioned.versions(root) == Seq(1L, 2L)) // one commit per batch
    // time travel to the first batch's state
    assert(Versioned.readVersion(spark, root, 1L).count() == 2L)
    // twin parity: the same rows through F7's reduction
    val all = (b1 ++ b2).toDF()
    val twin = UpsertSink.latestPerKey(all).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"), r.getAs[Double]("value")))
      .toSet
    assert(readRows(root) == twin)
  }

  test("F17 replayed batch id is skipped: no duplicate version") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("f17b").resolve("t").toString
    val batch = Seq(Event(20L, ts(1), 5L, "view", 1.0)).toDF()
    VersionedUpsertSink.commitBatch(batch, root, "app-a", 0L)
    assert(Versioned.versions(root) == Seq(1L))
    VersionedUpsertSink.commitBatch(batch, root, "app-a", 0L) // replay
    assert(Versioned.versions(root) == Seq(1L)) // skipped, no new version
    assert(VersionedUpsertSink.lastCommitted(root, "app-a") == 0L)
  }

  test("F17 crash in the marker window degrades to an identical extra version") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("f17c").resolve("t").toString
    val batch = Seq(Event(30L, ts(1), 7L, "view", 1.0)).toDF()
    VersionedUpsertSink.commitBatch(batch, root, "app-b", 0L)
    val before = readRows(root)
    // simulate the crash: committed snapshot, lost marker
    java.nio.file.Files.delete(java.nio.file.Paths.get(root, "_txn", "app-b"))
    VersionedUpsertSink.commitBatch(batch, root, "app-b", 0L)
    assert(Versioned.versions(root) == Seq(1L, 2L)) // redundant version...
    assert(readRows(root) == before)                // ...but identical rows
  }

  test("F17 empty batch advances the marker without publishing") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("f17d").resolve("t").toString
    val empty = Seq.empty[Event].toDF()
    VersionedUpsertSink.commitBatch(empty, root, "app-c", 0L)
    assert(Versioned.versions(root).isEmpty)
    assert(VersionedUpsertSink.lastCommitted(root, "app-c") == 0L)
  }
}
