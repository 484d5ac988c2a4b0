package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.AuditStream

case class AuditEvent(event_id: Long, user_id: java.lang.Long,
    event_type: String, value: Double)

/** F16: streaming audit gate — per-batch check rows must equal the batch
  * core's on identical rows, a poisoned batch must fail exactly its
  * violated checks in exactly its batch, and the audit must be a pure
  * function of the batch (replay-idempotent).
  */
class AuditStreamSpec extends SparkSpec {

  private val clean = (1L to 50L).map(i =>
    AuditEvent(i, i % 7, if (i % 2 == 0) "view" else "click", 1.0 + i))

  test("F16 catches the poisoned batch's exact violations, in its batch only") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val outDir = Files.createTempDirectory("graft-f16").toString
    val ckDir = Files.createTempDirectory("graft-f16-ck").toString
    // batch 1: a bad upstream deploy — null user, new enum value, negative
    // amount, and one duplicated event_id
    val poisoned = Seq(
      AuditEvent(100L, null, "view", 2.0),
      AuditEvent(101L, 3L, "uninstall", 2.0),
      AuditEvent(102L, 4L, "click", -5.0),
      AuditEvent(103L, 5L, "view", 1.0),
      AuditEvent(103L, 5L, "view", 1.0))
    val input = MemoryStream[AuditEvent]
    val q = AuditStream.sink(input.toDF(), outDir, ckDir)
    try {
      input.addData(clean)
      q.processAllAvailable()
      input.addData(poisoned)
      q.processAllAvailable()
    } finally q.stop()

    val log = spark.read.parquet(outDir)
    assert(log.count() == 8) // 4 checks × 2 batches
    // the clean batch passes everything
    assert(log.filter(col("batch_id") === 0 && col("status") === "fail").isEmpty)
    // the poisoned batch fails all four, each with exactly its violation count
    val b1 = log.filter(col("batch_id") === 1)
      .select("check_name", "violations").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(b1 == Map(
      "events.user_id.complete" -> 1L,
      "events.event_type.domain" -> 1L,
      "events.value.positive" -> 1L,
      "events.event_id.unique" -> 1L))
    // streamed rows equal the batch core's on the same data
    val batchAudit = AuditStream.eventChecks(poisoned.toDF())
    val streamedB1 = log.filter(col("batch_id") === 1).drop("batch_id")
    assert(streamedB1.exceptAll(batchAudit).isEmpty &&
      batchAudit.exceptAll(streamedB1).isEmpty)
  }

  test("F16 audit is a pure function — replay produces identical rows") {
    val s = spark
    import s.implicits._
    val df = clean.toDF()
    val once = AuditStream.eventChecks(df)
    val twice = AuditStream.eventChecks(df)
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }
}
