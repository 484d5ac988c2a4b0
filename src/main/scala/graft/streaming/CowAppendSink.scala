package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.FileCow

/** F20: EXACTLY-ONCE streaming APPEND into a file-level COW table — the
  * insert-only twin of F18's upsert sink, for event/log streams that never
  * update a key and therefore should not pay a merge's stat-prune join or
  * any file rewrite at all: each micro-batch is one [[FileCow.append]]
  * commit, cost O(batch), every existing file kept by reference.
  *
  * The exactly-once story is STRONGER than F17/F18's marker protocol, and
  * it is the commit log that buys it: the (appId, batchId) stamp rides
  * INSIDE the CAS commit as the record's `txn` field (Delta's txn action),
  * so the idempotence check and the data are one atomic unit — there is no
  * marker window to crash in. A replayed batch compares against
  * [[FileCow.lastTxn]] and skips; a crash anywhere before the CAS leaves
  * only orphan data files (vacuum's job), never rows. Contrast F17/F18:
  * a crash between their commit and their marker degrades to one redundant
  * value-identical version — harmless for an idempotent upsert, but an
  * APPEND replayed is duplicate rows, which is why append needed the
  * atomic stamp before it could stream at all.
  *
  * Retention caveat (Delta's too): vacuum drops commit records with their
  * versions, so keep snapshot retention above the stream's maximum replay
  * window.
  */
object CowAppendSink {

  def lastCommitted(root: String, appId: String): Long = FileCow.lastTxn(root, appId)

  /** Append one micro-batch exactly once (skip if `batchId` is already
    * stamped into a retained commit). Public so the spec drives replays. */
  def commitBatch(batch: DataFrame, root: String, appId: String, batchId: Long,
      statsCols: Seq[String], filesHint: Int = 4): Unit = {
    if (batchId <= lastCommitted(root, appId)) return // replayed: already in
    if (batch.isEmpty) return // nothing to commit; a replay re-skips the same way
    val spark = batch.sparkSession
    val ranged = batch.repartitionByRange(filesHint,
      org.apache.spark.sql.functions.col(statsCols.head))
    if (FileCow.currentVersion(root) == 0L) {
      // lost-creation races fold in as a plain append — see [[CowRace]];
      // append re-ranges internally, so the raw batch is fine there
      CowRace.createOrFoldIn {
        FileCow.create(spark, root, ranged, statsCols, txn = Some((appId, batchId))); ()
      } { FileCow.append(spark, root, batch, txn = Some((appId, batchId))); () }
    } else FileCow.append(spark, root, batch, txn = Some((appId, batchId)))
    ()
  }

  /** Start the continuous exactly-once append. `statsCols` seed the table's
    * manifest stats on the creating batch (the downstream prune keys). */
  def sink(events: DataFrame, root: String, appId: String, checkpointDir: String,
      statsCols: Seq[String], filesHint: Int = 4): StreamingQuery =
    events.writeStream
      .foreachBatch((b: DataFrame, id: Long) =>
        commitBatch(b, root, appId, id, statsCols, filesHint))
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
}
