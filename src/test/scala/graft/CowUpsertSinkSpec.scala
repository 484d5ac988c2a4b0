package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{CowUpsertSink, Event, UpsertSink}
import graft.sources.FileCow

/** F18: streaming upsert into a file-level COW table — F17's exactly-once
  * layering (latest-wins reduction + txn marker) plus the claim that makes
  * F18 exist: a small batch rewrites a small number of data files, the rest
  * are carried by reference.
  */
class CowUpsertSinkSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private def readRows(root: String): Set[(Long, Long, Double)] =
    FileCow.read(spark, root).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"), r.getAs[Double]("value")))
      .toSet

  private def fileSet(root: String, v: Long): Set[String] =
    FileCow.manifest(spark, root, v).select("file").collect().map(_.getString(0)).toSet

  test("F18 streamed upsert: one COW version per batch, twin parity with F7 core") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val root = Files.createTempDirectory("f18").resolve("t").toString
    val ckpt = Files.createTempDirectory("f18-ck").toString

    val b1 = Seq(Event(10L, ts(1), 1L, "view", 1.0), Event(11L, ts(2), 2L, "view", 2.0))
    val b2 = Seq(Event(12L, ts(5), 1L, "purchase", 5.0), Event(13L, ts(4), 3L, "view", 3.0))

    val input = MemoryStream[Event]
    val q = CowUpsertSink.sink(input.toDF(), root, "spec-app", ckpt)
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
    } finally q.stop()

    assert(readRows(root) == Set((1L, 12L, 5.0), (2L, 11L, 2.0), (3L, 13L, 3.0)))
    assert(FileCow.versions(root) == Seq(1L, 2L)) // one commit per batch
    assert(FileCow.readVersion(spark, root, 1L).count() == 2L) // time travel
    // twin parity: the same rows through F7's reduction
    val twin = UpsertSink.latestPerKey((b1 ++ b2).toDF()).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"), r.getAs[Double]("value")))
      .toSet
    assert(readRows(root) == twin)
  }

  test("F18 a small batch rewrites few files; the rest are shared by reference") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("f18cow").resolve("t").toString
    // wide base: 400 users in 4 range files
    val base = (1 to 400).map(u => Event(u.toLong, ts(u % 300), u.toLong, "view", u.toDouble))
    CowUpsertSink.commitBatch(base.toDF(), root, "app-cow", 0L, filesHint = 4)
    assert(fileSet(root, 1L).size == 4)
    // narrow batch: one user
    CowUpsertSink.commitBatch(
      Seq(Event(9001L, ts(500), 5L, "purchase", 99.0)).toDF(), root, "app-cow", 1L,
      filesHint = 4)
    val shared = fileSet(root, 1L) intersect fileSet(root, 2L)
    assert(shared.size == 3, s"expected 3 of 4 base files shared, got ${shared.size}")
    val got = readRows(root)
    // user 5 updated, neighbors untouched
    assert(got.contains((5L, 9001L, 99.0)) && got.contains((6L, 6L, 6.0)))
    assert(got.size == 400)
  }

  test("F18 stale arrival cannot regress the stored row (latest-wins at file scope)") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("f18stale").resolve("t").toString
    CowUpsertSink.commitBatch(
      Seq(Event(50L, ts(100), 7L, "view", 7.0)).toDF(), root, "app-s", 0L)
    // a LATER batch carrying an OLDER event for the same user
    CowUpsertSink.commitBatch(
      Seq(Event(49L, ts(1), 7L, "view", 1.0)).toDF(), root, "app-s", 1L)
    assert(readRows(root) == Set((7L, 50L, 7.0)))
  }

  test("F18 replayed batch id is skipped: no duplicate version") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("f18b").resolve("t").toString
    val batch = Seq(Event(20L, ts(1), 5L, "view", 1.0)).toDF()
    CowUpsertSink.commitBatch(batch, root, "app-a", 0L)
    assert(FileCow.versions(root) == Seq(1L))
    CowUpsertSink.commitBatch(batch, root, "app-a", 0L) // replay
    assert(FileCow.versions(root) == Seq(1L))
    assert(CowUpsertSink.lastCommitted(root, "app-a") == 0L)
  }

  test("F18 crash in the marker window degrades to an identical extra version") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("f18c").resolve("t").toString
    val batch = Seq(Event(30L, ts(1), 7L, "view", 1.0)).toDF()
    CowUpsertSink.commitBatch(batch, root, "app-b", 0L)
    val before = readRows(root)
    java.nio.file.Files.delete(java.nio.file.Paths.get(root, "_txn", "app-b"))
    CowUpsertSink.commitBatch(batch, root, "app-b", 0L)
    assert(FileCow.versions(root) == Seq(1L, 2L)) // redundant version...
    assert(readRows(root) == before)              // ...but identical rows
  }

  test("F18 empty batch advances the marker without committing") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("f18d").resolve("t").toString
    CowUpsertSink.commitBatch(Seq.empty[Event].toDF(), root, "app-c", 0L)
    assert(FileCow.versions(root).isEmpty)
    assert(CowUpsertSink.lastCommitted(root, "app-c") == 0L)
  }
}
