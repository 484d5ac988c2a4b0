package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.streaming.{EventsStream, UpsertSink}

/** F7 under the failure it actually guards against: a StreamingQuery killed
  * mid-stream and RESTARTED from its checkpoint directory. The F-series
  * already proves logic parity and replay idempotence; this spec proves the
  * recovery contract itself — the restarted query resumes from committed
  * offsets (no batch re-run, no batch skipped, files landed while the query
  * was down picked up) and the final materialized table is byte-equal to a
  * run that was never interrupted.
  */
class CheckpointRecoverySpec extends SparkSpec {

  private def commitIds(ck: String): Set[Long] = {
    val d = Paths.get(ck, "commits")
    if (!Files.exists(d)) Set.empty
    else {
      val out = Set.newBuilder[Long]
      Files.list(d).forEach { p =>
        val n = p.getFileName.toString
        if (n.forall(_.isDigit)) out += n.toLong
      }
      out.result()
    }
  }

  test("F7 kill + restart from checkpoint equals the uninterrupted run") {
    val land = Files.createTempDirectory("graft-ckpt-land").toString
    val table = Files.createTempDirectory("graft-ckpt-tbl").toString + "/t"
    val tableUn = Files.createTempDirectory("graft-ckpt-un").toString + "/t"
    val ck = Files.createTempDirectory("graft-ckpt-ck").toString
    val ckUn = Files.createTempDirectory("graft-ckpt-ckun").toString

    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), (col("ts") / 1e9).cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .localCheckpoint()
    ev.filter(col("event_id") % 3 === 0).write.parquet(s"$land/b0")

    // phase 1: process the first landing, then KILL the query
    val q1 = UpsertSink.sink(EventsStream.fromFiles(spark, s"$land/b*"), table, ck)
    try q1.processAllAvailable() finally q1.stop()
    val committedBefore = commitIds(ck)
    assert(committedBefore.nonEmpty, "phase 1 must commit at least one batch")

    // while the query is down, two more landings arrive
    ev.filter(col("event_id") % 3 === 1).write.parquet(s"$land/b1")
    ev.filter(col("event_id") % 3 === 2).write.parquet(s"$land/b2")

    // phase 2: RESTART from the same checkpoint directory
    val q2 = UpsertSink.sink(EventsStream.fromFiles(spark, s"$land/b*"), table, ck)
    try q2.processAllAvailable() finally q2.stop()
    val committedAfter = commitIds(ck)

    // resumed, not restarted: every phase-1 commit survives, new commits
    // continue the sequence (a from-scratch run would begin again at 0 and
    // re-run the first landing)
    assert(committedBefore.subsetOf(committedAfter))
    assert(committedAfter.size > committedBefore.size,
      "the landings that arrived while down must have committed")
    assert(committedAfter.max == committedAfter.size - 1,
      "commit ids must be the unbroken sequence 0..n")

    // the uninterrupted control: same files, one run, fresh state
    val qU = UpsertSink.sink(EventsStream.fromFiles(spark, s"$land/b*"), tableUn, ckUn)
    try qU.processAllAvailable() finally qU.stop()

    val got = spark.read.parquet(table)
    val want = spark.read.parquet(tableUn)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "recovered table must equal the uninterrupted run's")
    // and the table is the latest-state-per-user reduction of ALL events
    val oracle = UpsertSink.latestPerKey(ev)
    assert(got.exceptAll(oracle).isEmpty && oracle.exceptAll(got).isEmpty)
  }
}
