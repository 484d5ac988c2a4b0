package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{Event, UpsertSink}

/** F7: foreachBatch keyed-upsert materialization — replay-safe convergence
  * to the latest-state-per-key table.
  */
class UpsertSinkSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private def readTable(dir: String) =
    spark.read.parquet(dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"), r.getAs[Double]("value")))
      .sortBy(_._1).toSeq

  test("F7 upsert sink converges to latest-per-user across batches and replays") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val tableDir = Files.createTempDirectory("f7_table").resolve("t").toString
    val ckptDir = Files.createTempDirectory("f7_ckpt").toString

    val input = MemoryStream[Event]
    val query = UpsertSink.sink(input.toDF(), tableDir, ckptDir)
    try {
      input.addData(Seq(
        Event(10L, ts(1), 1L, "view", 1.0),
        Event(11L, ts(2), 2L, "view", 2.0)))
      query.processAllAvailable()
      // user 1 advances; user 3 appears; event 11 is REPLAYED verbatim
      input.addData(Seq(
        Event(12L, ts(5), 1L, "purchase", 5.0),
        Event(11L, ts(2), 2L, "view", 2.0),
        Event(13L, ts(4), 3L, "view", 3.0)))
      query.processAllAvailable()
    } finally query.stop()

    assert(readTable(tableDir) == Seq((1L, 12L, 5.0), (2L, 11L, 2.0), (3L, 13L, 3.0)))
  }

  test("F7 upsertBatch is idempotent: re-applying a batch changes nothing") {
    val s = spark
    import s.implicits._

    val tableDir = Files.createTempDirectory("f7_idem").resolve("t").toString
    val batch1 = Seq(
      Event(1L, ts(1), 1L, "view", 1.0),
      Event(2L, ts(3), 1L, "view", 3.0), // later event for same user
      Event(3L, ts(2), 2L, "view", 2.0)).toDF()
    UpsertSink.upsertBatch(batch1, tableDir)
    val after1 = readTable(tableDir)
    assert(after1 == Seq((1L, 2L, 3.0), (2L, 3L, 2.0))) // in-batch reduce picks max (ts, id)
    UpsertSink.upsertBatch(batch1, tableDir) // crash-recovery replay
    assert(readTable(tableDir) == after1)

    // an OLDER event arriving later must not regress the stored row
    val stale = Seq(Event(0L, ts(0), 1L, "view", 0.5)).toDF()
    UpsertSink.upsertBatch(stale, tableDir)
    assert(readTable(tableDir) == after1)
  }
}
