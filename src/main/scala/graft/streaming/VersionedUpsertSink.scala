package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.plans.GraftCommit
import graft.sources.Versioned

/** F17: streaming upsert into a VERSIONED graft table — F7's sink with the
  * scaladoc promise ("in deployment the body is a single MERGE INTO")
  * cashed in: every micro-batch folds into the table through the SAME
  * optimistic-concurrency commit loop the SQL `MERGE INTO` uses
  * ([[GraftCommit.retrying]] → `Versioned.publishIf`), so each batch is an
  * immutable, time-travelable, CDF-diffable snapshot and a concurrent
  * writer (nightly batch job, second stream) is a retried conflict, not a
  * lost update.
  *
  * Exactly-once layering, in order of strength:
  *  1. the per-batch reduce + merge is [[UpsertSink.latestPerKey]]'s
  *     idempotent max_by reduction — a REPLAYED batch re-merged into a
  *     table that already contains it converges to the same rows (F7's
  *     at-least-once-safe core, spec-pinned there);
  *  2. on top, a transactional batch-id marker (the Delta `txnAppId/
  *     txnVersion` idempotent-writes pattern): `root/_txn/<appId>` stores
  *     the last committed batch id, written AFTER the snapshot commit;
  *     a recovering stream re-offering batch ≤ marker is SKIPPED — no
  *     duplicate version, no wasted commit. A crash in the marker-write
  *     window degrades to case 1 (one redundant but value-identical
  *     version), never to wrong data.
  *
  * Scale: per batch one keyed hash aggregate + one batch-vs-table
  * equi-join (broadcastable batch side) — the q06/dd15 increment shape at
  * streaming cadence.
  */
/** The Delta `txnAppId/txnVersion` idempotent-writes marker, shared by the
  * versioned (F17) and file-COW (F18) streaming sinks: `root/_txn/<appId>`
  * stores the last committed batch id, written AFTER the table commit, so a
  * recovering stream re-offering batch ≤ marker is skipped. */
private[streaming] object TxnMarker {

  private def txnPath(root: String, appId: String) =
    Paths.get(root, "_txn", appId)

  /** Last batch id committed by `appId` into `root`, −1 if none. */
  def lastCommitted(root: String, appId: String): Long = {
    val p = txnPath(root, appId)
    if (Files.exists(p))
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong
    else -1L
  }

  def write(root: String, appId: String, batchId: Long): Unit = {
    val p = txnPath(root, appId)
    Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling(s"${appId}.tmp")
    Files.write(tmp, batchId.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }
}

object VersionedUpsertSink {

  /** Last batch id committed by `appId` into `root`, −1 if none. */
  def lastCommitted(root: String, appId: String): Long =
    TxnMarker.lastCommitted(root, appId)

  private def writeMarker(root: String, appId: String, batchId: Long): Unit =
    TxnMarker.write(root, appId, batchId)

  /** Fold one micro-batch into the table (skip if `batchId` already
    * committed by this `appId`). Public so the spec can drive replays. */
  def commitBatch(batch: DataFrame, root: String, appId: String, batchId: Long): Unit = {
    if (batchId <= lastCommitted(root, appId)) return // replayed: already in
    val newest = UpsertSink.latestPerKey(batch).localCheckpoint()
    if (newest.isEmpty) { writeMarker(root, appId, batchId); return }
    val spark = batch.sparkSession
    GraftCommit.retrying(root, s"stream upsert $appId#$batchId") { version =>
      if (version == 0) newest
      else UpsertSink.latestPerKey(
        Versioned.readVersion(spark, root, version).unionByName(newest))
    }
    writeMarker(root, appId, batchId)
  }

  /** Start the continuous versioned upsert. */
  def sink(events: DataFrame, root: String, appId: String,
      checkpointDir: String): StreamingQuery =
    events.writeStream
      .foreachBatch((b: DataFrame, id: Long) => commitBatch(b, root, appId, id))
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .start()
}
