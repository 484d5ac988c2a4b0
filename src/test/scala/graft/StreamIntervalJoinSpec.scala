package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{Event, EventsStream}

/** F5 stream-stream interval join: purchases attributed to same-user clicks
  * within the lookback window, checked against the identical join computed
  * batch-wise on the same rows — including a click landing in a later
  * micro-batch than its purchase (the buffered-state case the stream-stream
  * join exists for) and clicks outside the window or from another user.
  */
class StreamIntervalJoinSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private val events = Seq(
    Event(10L, ts(5), 1L, "click", 0.0),
    Event(11L, ts(20), 1L, "click", 0.0),
    Event(12L, ts(40), 1L, "purchase", 9.5), // catches click 11 (20m back), not 10 (35m)
    Event(13L, ts(41), 2L, "click", 0.0),    // other user: never attributed to 12
    Event(14L, ts(50), 2L, "purchase", 3.0), // catches click 13
    Event(15L, ts(90), 1L, "purchase", 7.0)) // no click within 30m

  test("F5 equals its batch mirror across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val input = MemoryStream[Event]
    val query = EventsStream.clickAttribution(input.toDF(), input.toDF())
      .writeStream.format("memory").queryName("f5_attr")
      .outputMode(OutputMode.Append).start()
    try {
      // Batch 1 delivers only the clicks; purchase 12's match (click 11) must
      // therefore survive as buffered join state until the purchase arrives
      // in batch 2 — the cross-batch retention case this spec exists for.
      input.addData(events.take(2))
      query.processAllAvailable()
      input.addData(events.drop(2))
      query.processAllAvailable()
    } finally query.stop()

    def key(r: org.apache.spark.sql.Row): (Long, Long) = (r.getLong(0), r.getLong(4))
    val streamed = spark.table("f5_attr").collect().map(key).sorted.toSeq
    val batch = EventsStream.clickAttribution(events.toDF(), events.toDF())
      .collect().map(key).sorted.toSeq
    assert(batch == Seq((12L, 11L), (14L, 13L)))
    assert(streamed == batch)
  }

  test("F13 left outer: unmatched purchase emits once with NULL click after the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val input = MemoryStream[Event]
    val query = EventsStream.clickAttributionOuter(input.toDF(), input.toDF())
      .writeStream.format("memory").queryName("f13_attr")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(events)
      query.processAllAvailable()
      // Push BOTH sides' watermarks far past purchase 15's horizon so the
      // engine can prove no matching click is still in flight — only then
      // may the outer (NULL-click) row leave the evicted state.
      input.addData(Seq(
        Event(98L, ts(300), 9L, "click", 0.0),
        Event(99L, ts(300), 9L, "purchase", 0.0)))
      query.processAllAvailable()
      input.addData(Seq(
        Event(100L, ts(400), 9L, "click", 0.0),
        Event(101L, ts(400), 9L, "purchase", 0.0)))
      query.processAllAvailable()
    } finally query.stop()

    def key(r: org.apache.spark.sql.Row): (Long, Long) =
      (r.getLong(0), if (r.isNullAt(4)) -1L else r.getLong(4))
    val streamed = spark.table("f13_attr").collect().map(key)
      .filter(_._1 < 90L).sorted.toSeq // ignore the watermark-driver dummies
    assert(streamed == Seq((12L, 11L), (14L, 13L), (15L, -1L)),
      s"expected the two matches plus exactly one NULL-click row; got $streamed")
  }
}
