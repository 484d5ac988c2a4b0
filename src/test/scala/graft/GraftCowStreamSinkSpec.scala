package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.sources.FileCow
import graft.streaming.Event

/** `df.writeStream.format("graft-cow")` — the F20 exactly-once append sink
  * behind the idiomatic spelling. One end-to-end claim set: per-batch
  * append commits with the txn stamp inside the CAS, rows == batch union,
  * and restart-from-checkpoint without duplication.
  */
class GraftCowStreamSinkSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  test("outputMode(update): keyed latest-wins upsert; stale arrivals lose; restart is clean") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val root = Files.createTempDirectory("graft-wsup").resolve("t").toString
    val ckpt = Files.createTempDirectory("graft-wsup-ck").toString

    val input = MemoryStream[Event]
    def start() = input.toDF().writeStream.format("graft-cow")
      .option("root", root).option("appId", "ws-up")
      .option("keys", "user_id").option("orderBy", "ts")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()

    def state(): Map[Long, (Long, Double)] =
      FileCow.read(spark, root).select("user_id", "event_id", "value")
        .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap

    val q = start()
    try {
      // within-batch dup on user 1: the later ts wins deterministically
      input.addData(Seq(Event(1L, ts(1), 1L, "view", 1.0),
        Event(2L, ts(3), 1L, "buy", 9.0), Event(3L, ts(2), 2L, "view", 2.0)))
      q.processAllAvailable()
      assert(state() == Map(1L -> (2L, 9.0), 2L -> (3L, 2.0)))

      // stale re-arrival for user 1 loses; user 3 inserts
      input.addData(Seq(Event(4L, ts(1), 1L, "view", 0.5),
        Event(5L, ts(4), 3L, "view", 3.0)))
      q.processAllAvailable()
      assert(state() == Map(1L -> (2L, 9.0), 2L -> (3L, 2.0), 3L -> (5L, 3.0)))
    } finally q.stop()

    val vBefore = FileCow.currentVersion(root)
    val q2 = start()
    try {
      input.addData(Seq(Event(6L, ts(9), 2L, "buy", 7.0)))
      q2.processAllAvailable()
      assert(state()(2L) == ((6L, 7.0)), "post-restart batch folds in")
      assert(FileCow.currentVersion(root) == vBefore + 1,
        "no replayed versions after a clean restart")
    } finally q2.stop()
  }

  test("writeStream.format(graft-cow): append commits, txn stamps, no duplication") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val root = Files.createTempDirectory("graft-wssink").resolve("t").toString
    val ckpt = Files.createTempDirectory("graft-wssink-ck").toString
    val b1 = Seq(Event(1L, ts(1), 1L, "view", 1.0), Event(2L, ts(2), 2L, "view", 2.0))
    val b2 = Seq(Event(3L, ts(3), 3L, "view", 3.0))

    val input = MemoryStream[Event]
    def start() = input.toDF().writeStream.format("graft-cow")
      .option("root", root).option("appId", "ws-app")
      .option("statsCols", "event_id").option("filesHint", "2")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val q = start()
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
    } finally q.stop()

    assert(FileCow.versions(root) == Seq(1L, 2L))
    assert(FileCow.commitInfo(root, 2L).get.txn.contains(("ws-app", 1L)))
    val got = FileCow.read(spark, root).select("event_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L))

    // restart from the checkpoint: nothing replays, new data still lands
    val q2 = start()
    try {
      input.addData(Seq(Event(4L, ts(4), 4L, "view", 4.0)))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(FileCow.read(spark, root).count() == 4L)
    assert(FileCow.currentVersion(root) == 3L)
  }
}
