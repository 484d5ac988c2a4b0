package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{Event, EventsStream}

/** F1/F2: Structured Streaming semantics checked against the batch
  * computation on the same rows (no DuckDB oracle by nature — the driver's
  * gate covers the batch mirrors q20/q19 instead). */
class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private val sample = Seq(
    Event(1L, ts(5), 1L, "view", 1.0),
    Event(2L, ts(20), 1L, "view", 2.0),
    Event(3L, ts(30), 2L, "purchase", 10.0),
    Event(4L, ts(75), 1L, "view", 3.0),   // second hour; >30min gap for user 1
    Event(5L, ts(80), 2L, "purchase", 5.0), // >30min gap for user 2
    Event(6L, ts(85), 1L, "view", 4.0))

  test("F1 windowedCounts: streaming result equals batch on same rows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val input = MemoryStream[Event]
    input.addData(sample)

    val query = EventsStream.windowedCounts(input.toDF())
      .writeStream.format("memory").queryName("f1_windowed")
      .outputMode(OutputMode.Complete).start()
    try query.processAllAvailable()
    finally query.stop()

    val streamed = s.table("f1_windowed")
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq
    val batch = EventsStream.windowedCounts(sample.toDF())
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    assert(streamed.size == 4) // (h0,h1) × (view,purchase)
  }

  test("F12 slidingCounts: streaming equals batch; every event covers 4 windows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val input = MemoryStream[Event]
    input.addData(sample)

    val query = EventsStream.slidingCounts(input.toDF())
      .writeStream.format("memory").queryName("f12_sliding")
      .outputMode(OutputMode.Complete).start()
    try query.processAllAvailable()
    finally query.stop()

    val streamed = s.table("f12_sliding")
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq
    val batch = EventsStream.slidingCounts(sample.toDF())
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    // 1h window / 15min slide: each event is counted in exactly 4 windows
    val totalCounted = s.table("f12_sliding")
      .agg(sum(col("n_events"))).head().getLong(0)
    assert(totalCounted == 4L * sample.size)
  }

  test("F2 sessionized: closed sessions match gap semantics; timeout flushes") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val input = MemoryStream[Event]
    val query = EventsStream.sessionized(input.toDS(), gapSeconds = 1800,
        watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("f2_sessions")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(sample)
      query.processAllAvailable()
      // Advance the watermark far past every open session's horizon so
      // EventTimeTimeout fires and flushes the two still-open sessions.
      input.addData(Seq(Event(99L, ts(600), 99L, "view", 0.0)))
      query.processAllAvailable()
      input.addData(Seq(Event(100L, ts(1200), 99L, "view", 0.0)))
      query.processAllAvailable()
    } finally query.stop()

    val out = s.table("f2_sessions")
      .filter(col("user_id") < 99)
      .orderBy("user_id", "session_start")
      .select("user_id", "n_events", "total_value")
      .collect().map(_.toSeq).toSeq
    // user 1: [5,20] (2 ev, 3.0) then [75,85] (2 ev, 7.0);
    // user 2: [30] (1 ev, 10.0) then [80] (1 ev, 5.0).
    assert(out == Seq(
      Seq(1L, 2L, 3.0), Seq(1L, 2L, 7.0),
      Seq(2L, 1L, 10.0), Seq(2L, 1L, 5.0)))
  }

  test("F2 sessionized: session extends across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val input = MemoryStream[Event]
    val query = EventsStream.sessionized(input.toDS(), gapSeconds = 1800,
        watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("f2_extend")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Seq(Event(1L, ts(0), 7L, "view", 1.0)))
      query.processAllAvailable()
      input.addData(Seq(Event(2L, ts(10), 7L, "view", 2.0))) // same session
      query.processAllAvailable()
      input.addData(Seq(Event(3L, ts(600), 8L, "view", 0.0))) // advance wm
      query.processAllAvailable()
      input.addData(Seq(Event(4L, ts(1200), 8L, "view", 0.0)))
      query.processAllAvailable()
    } finally query.stop()

    val out = s.table("f2_extend").filter(col("user_id") === 7)
      .select("n_events", "total_value").collect().map(_.toSeq).toSeq
    assert(out == Seq(Seq(2L, 3.0)))
  }
}
