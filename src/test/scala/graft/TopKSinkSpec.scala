package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.{Event, TopKSink}

/** F10: streaming windowed top-k — closed windows are ranked completely,
  * late windows close on watermark advance, replays rewrite identical rows.
  */
class TopKSinkSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private def readTable(dir: String) =
    spark.read.parquet(dir).collect()
      .map(r => (r.getAs[Timestamp]("window_start"), r.getAs[String]("event_type"),
        r.getAs[Long]("n_events"), r.getAs[Long]("rank")))
      .sortBy(t => (t._1.getTime, t._4)).toSeq

  test("F10 top-k equals the batch mirror for every closed window") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val tableDir = Files.createTempDirectory("f10_table").resolve("t").toString
    val ckptDir = Files.createTempDirectory("f10_ckpt").toString

    // window length 10 min, watermark 5 min; hour-0 windows [0,10) and [10,20)
    val batch1 = Seq(
      Event(1L, ts(1), 1L, "view", 1.0),
      Event(2L, ts(2), 2L, "view", 1.0),
      Event(3L, ts(3), 3L, "click", 1.0),
      Event(4L, ts(4), 4L, "purchase", 1.0),
      Event(5L, ts(5), 5L, "click", 1.0),
      Event(6L, ts(6), 6L, "view", 1.0))
    // watermark driver: advances past window [0,10) end + delay
    val batch2 = Seq(Event(7L, ts(16), 7L, "view", 1.0))
    // closes [10,20)
    val batch3 = Seq(Event(8L, ts(31), 8L, "view", 1.0))

    val input = MemoryStream[Event]
    val query = TopKSink.sink(input.toDF(), k = 2, tableDir, ckptDir,
      windowLength = "10 minutes", watermarkDelay = "5 minutes")
    try {
      input.addData(batch1); query.processAllAvailable()
      input.addData(batch2); query.processAllAvailable()
      input.addData(batch3); query.processAllAvailable()
    } finally query.stop()

    // batch mirror: q20-style counts over the SAME rows, ranked, k=2,
    // restricted to windows the watermark closed ([0,10) and [10,20))
    val all = (batch1 ++ batch2 ++ batch3).toDF()
    val wRank = Window.partitionBy(col("window_start"))
      .orderBy(col("n_events").desc, col("event_type"))
    val mirror = all
      .groupBy(window(col("ts"), "10 minutes").getField("start").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= 2)
      .filter(col("window_start") < ts(20))
      .collect()
      .map(r => (r.getAs[Timestamp]("window_start"), r.getAs[String]("event_type"),
        r.getAs[Long]("n_events"), r.getAs[Long]("rank")))
      .sortBy(t => (t._1.getTime, t._4)).toSeq

    val got = readTable(tableDir)
    assert(got == mirror)
    // window [0,10): view count 3 ranks 1, click count 2 ranks 2 — purchase cut
    assert(got.count(_._1 == ts(0)) == 2)
    assert(got.filter(_._1 == ts(0)).map(_._2) == Seq("view", "click"))
  }

  test("F10 topkBatch replaces a window's rows idempotently") {
    val s = spark
    import s.implicits._

    val tableDir = Files.createTempDirectory("f10_idem").resolve("t").toString
    val closed = Seq(
      (ts(0), "view", 3L, 1.0),
      (ts(0), "click", 2L, 1.0),
      (ts(0), "purchase", 1L, 1.0))
      .toDF("window_start", "event_type", "n_events", "total_value")

    TopKSink.topkBatch(closed, 2, tableDir)
    val after1 = readTable(tableDir)
    assert(after1.map(t => (t._2, t._3, t._4)) == Seq(("view", 3L, 1L), ("click", 2L, 2L)))

    TopKSink.topkBatch(closed, 2, tableDir) // crash-recovery replay
    assert(readTable(tableDir) == after1)

    // a different window folds in without touching the stored one
    val closed2 = Seq((ts(10), "click", 5L, 1.0))
      .toDF("window_start", "event_type", "n_events", "total_value")
    TopKSink.topkBatch(closed2, 2, tableDir)
    assert(readTable(tableDir).toSet == (after1 :+ ((ts(10), "click", 5L, 1L))).toSet)
  }
}
