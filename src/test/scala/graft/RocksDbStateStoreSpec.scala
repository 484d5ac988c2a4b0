package graft

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{Event, EventsStream}

/** The 100 TB streaming-state lever: the default HDFSBacked state store
  * keeps every key's state in executor HEAP — fine for windowed counts,
  * fatal for corpus-scale keyed state (millions of open sessions, the
  * incremental-dedup index). Spark ships a disk-backed RocksDB provider
  * (`spark.sql.streaming.stateStore.providerClass`) exactly for that; this
  * spec proves the engine's stateful operators run UNCHANGED under it —
  * the provider is a deployment conf, not a code path — and that results
  * are bit-identical to the default provider's.
  *
  * Session-scoped conf: the provider is read from the owning session's
  * SQLConf at query start, so a `newSession()` isolates the choice without
  * touching the shared test session.
  */
class RocksDbStateStoreSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private val sample = Seq(
    Event(1L, ts(5), 1L, "view", 1.0),
    Event(2L, ts(20), 1L, "view", 2.0),
    Event(3L, ts(30), 2L, "purchase", 10.0),
    Event(4L, ts(75), 1L, "view", 3.0),
    Event(5L, ts(80), 2L, "purchase", 5.0),
    Event(6L, ts(85), 1L, "view", 4.0))

  /** Runs the F2 sessionizer on `sample` in the given session and returns
    * the flushed sessions (same drain choreography as StreamingSpec F2). */
  private def runSessionized(s: org.apache.spark.sql.SparkSession,
                             name: String): Seq[Seq[Any]] = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[Event]
    val query = EventsStream.sessionized(input.toDS(), gapSeconds = 1800,
        watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(sample)
      query.processAllAvailable()
      input.addData(Seq(Event(99L, ts(600), 99L, "view", 0.0)))
      query.processAllAvailable()
      input.addData(Seq(Event(100L, ts(1200), 99L, "view", 0.0)))
      query.processAllAvailable()
      // the provider must actually be engaged, not silently fall back:
      // RocksDB surfaces its own custom metrics in the state operator
      val metrics = query.lastProgress.stateOperators.head
        .customMetrics.keySet.asScala
      val usingRocks = metrics.exists(_.toLowerCase.contains("rocksdb"))
      val expectRocks = s.conf.getOption(
        "spark.sql.streaming.stateStore.providerClass").exists(_.contains("RocksDB"))
      assert(usingRocks == expectRocks,
        s"state store engagement mismatch: metrics=$metrics")
    } finally query.stop()
    s.table(name).filter(col("user_id") < 99)
      .orderBy("user_id", "session_start")
      .select("user_id", "session_start", "session_end", "n_events", "total_value")
      .collect().map(_.toSeq).toSeq
  }

  test("F2 sessionization under RocksDB state store == default provider, bit for bit") {
    val rocks = spark.newSession()
    rocks.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // changelog checkpointing: commit deltas, not full SST uploads — the
    // production setting for low-latency large state (public Spark conf)
    rocks.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")

    val viaRocks = runSessionized(rocks, "f2_rocksdb")
    val viaDefault = runSessionized(spark, "f2_hdfsbacked")
    assert(viaRocks == viaDefault)
    assert(viaRocks.size == 4) // two sessions per active user, as F2 pins
  }
}
