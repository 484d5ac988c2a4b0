package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{Event, EventsStream}

/** F3 streaming dedup and F4 stream-static enrichment. */
class StreamingOpsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("F3 dropDuplicates removes replays across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val input = MemoryStream[Event]
    val query = EventsStream.dedupedEvents(input.toDF())
      .writeStream.format("memory").queryName("f3_dedup")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Seq(
        Event(1L, ts(1), 1L, "view", 1.0),
        Event(1L, ts(1), 1L, "view", 1.0), // same-batch dup
        Event(2L, ts(2), 1L, "view", 2.0)))
      query.processAllAvailable()
      input.addData(Seq(
        Event(2L, ts(2), 1L, "view", 2.0), // cross-batch replay
        Event(3L, ts(3), 1L, "view", 3.0)))
      query.processAllAvailable()
    } finally query.stop()

    val ids = spark.table("f3_dedup").select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L))
  }

  test("F4 stream-static join enriches events with a dim") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[Event]
    val query = EventsStream.enriched(input.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("f4_enriched")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Seq(
        Event(1L, ts(1), 1L, "view", 1.0),
        Event(2L, ts(2), 2L, "purchase", 2.0),
        Event(3L, ts(3), 9L, "view", 3.0))) // no dim row -> dropped (inner)
      query.processAllAvailable()
    } finally query.stop()

    val out = spark.table("f4_enriched")
      .select("event_id", "tier").orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "gold"), (2L, "basic")))
  }
}
