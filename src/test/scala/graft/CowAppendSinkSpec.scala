package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.FileCow
import graft.streaming.{CowAppendSink, Event}

/** F20: exactly-once streaming append. The claims:
  *
  *   1. each batch is ONE append commit — every prior file shared by
  *      reference, no rewrite (the insert-only cost model);
  *   2. the (appId, batchId) txn stamp rides INSIDE the commit, so a
  *      replayed batch is skipped with NO crash window — replaying the
  *      committed batch never duplicates a row (the property F17/F18's
  *      after-commit marker cannot give an append);
  *   3. a second app's stamps don't mask the first's;
  *   4. streamed == the batch union (end-to-end through foreachBatch).
  */
class CowAppendSinkSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("F20 one commit per batch, all prior files shared, replay cannot duplicate") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("f20").resolve("t").toString
    val b0 = Seq(Event(1L, ts(1), 1L, "view", 1.0), Event(2L, ts(2), 2L, "view", 2.0)).toDF()
    val b1 = Seq(Event(3L, ts(3), 3L, "view", 3.0)).toDF()

    CowAppendSink.commitBatch(b0, root, "app", 0L, statsCols = Seq("event_id"), filesHint = 2)
    assert(FileCow.currentVersion(root) == 1L)
    assert(CowAppendSink.lastCommitted(root, "app") == 0L)

    val v1Files = FileCow.manifest(spark, root, 1L).select("file")
      .collect().map(_.getString(0)).toSet
    CowAppendSink.commitBatch(b1, root, "app", 1L, statsCols = Seq("event_id"))
    assert(FileCow.currentVersion(root) == 2L)
    val v2Files = FileCow.manifest(spark, root, 2L).select("file")
      .collect().map(_.getString(0)).toSet
    assert(v1Files.subsetOf(v2Files), "append keeps every prior file by reference")
    assert(FileCow.commitInfo(root, 2L).get.kind == "append")
    assert(FileCow.commitInfo(root, 2L).get.txn.contains(("app", 1L)))

    // replay both batches: versions and rows unchanged — the stamp is in
    // the same atomic commit as the data, so there is no window where the
    // data landed but the stamp didn't
    CowAppendSink.commitBatch(b0, root, "app", 0L, statsCols = Seq("event_id"))
    CowAppendSink.commitBatch(b1, root, "app", 1L, statsCols = Seq("event_id"))
    assert(FileCow.currentVersion(root) == 2L)
    assert(FileCow.read(spark, root).count() == 3L)

    // a second app's newer stamp must not mask the first app's
    CowAppendSink.commitBatch(b1, root, "other", 7L, statsCols = Seq("event_id"))
    assert(CowAppendSink.lastCommitted(root, "app") == 1L)
    assert(CowAppendSink.lastCommitted(root, "other") == 7L)
    assert(FileCow.read(spark, root).count() == 4L)
  }

  test("F20 end-to-end stream: rows equal the batch union; empty batch commits nothing") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val root = Files.createTempDirectory("f20e2e").resolve("t").toString
    val ckpt = Files.createTempDirectory("f20-ck").toString
    val b1 = Seq(Event(10L, ts(1), 1L, "view", 1.0), Event(11L, ts(2), 2L, "view", 2.0))
    val b2 = Seq(Event(12L, ts(5), 1L, "purchase", 5.0))

    val input = MemoryStream[Event]
    val q = CowAppendSink.sink(input.toDF(), root, "e2e", ckpt,
      statsCols = Seq("event_id"), filesHint = 2)
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      q.processAllAvailable() // an empty pass commits nothing
    } finally q.stop()

    assert(FileCow.versions(root) == Seq(1L, 2L))
    val got = FileCow.read(spark, root).select("event_id", "user_id", "value")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == (b1 ++ b2).map(e => (e.event_id, e.user_id, e.value)).toSet)
    // appends never rewrite: every commit record removes nothing
    (2L to FileCow.currentVersion(root)).foreach { v =>
      assert(FileCow.commitInfo(root, v).get.removed.isEmpty)
    }
  }
}
