package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.SkewMonitorStream

case class KeyedEvent(user_id: Long, value: Double)

/** F15: streaming skew monitor — per-batch profiles must equal the batch
  * operator's on identical rows, a planted hot key must be flagged in the
  * batch it arrives and ONLY that batch, and replays must be idempotent.
  */
class SkewMonitorStreamSpec extends SparkSpec {

  test("F15 flags the hot key in its own batch; uniform batches stay clean") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val outDir = Files.createTempDirectory("graft-f15").toString
    val ckDir = Files.createTempDirectory("graft-f15-ck").toString
    val uniform = (1L to 20L).map(k => KeyedEvent(k, 1.0))            // 20 keys × 1 row
    val campaign = (1 to 300).map(_ => KeyedEvent(7L, 1.0)) ++        // hot key 7
      (1L to 10L).map(k => KeyedEvent(100L + k, 1.0))
    val input = MemoryStream[KeyedEvent]
    val q = SkewMonitorStream.sink(input.toDF(), "user_id", nPart = 32, topN = 10,
      outDir, ckDir)
    try {
      input.addData(uniform)
      q.processAllAvailable()
      input.addData(campaign)
      q.processAllAvailable()
    } finally q.stop()

    val log = spark.read.parquet(outDir)
    // batch 0 (uniform): nothing flagged; batch 1: exactly key 7 flagged
    assert(log.filter(col("batch_id") === 0 && col("needs_salting")).isEmpty)
    val flagged = log.filter(col("batch_id") === 1 && col("needs_salting"))
      .select("key").collect().map(_.getLong(0)).toSeq
    assert(flagged == Seq(7L))
    // streamed rows equal the batch operator's on the same data
    val batchProfile = SkewMonitorStream.profile(
      campaign.toDF(), "user_id", nPart = 32, topN = 10)
    val streamedB1 = log.filter(col("batch_id") === 1).drop("batch_id")
    assert(streamedB1.exceptAll(batchProfile).isEmpty &&
      batchProfile.exceptAll(streamedB1).isEmpty)
  }

  test("F15 profile is a pure function — replay produces identical rows") {
    val s = spark
    import s.implicits._
    val rows = ((1 to 100).map(_ => KeyedEvent(1L, 1.0)) ++
      (2L to 5L).map(k => KeyedEvent(k, 1.0))).toDF()
    val once = SkewMonitorStream.profile(rows, "user_id", 32, 10)
    val twice = SkewMonitorStream.profile(rows, "user_id", 32, 10)
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }
}
