package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.FileCow

/** F18: streaming upsert into a FILE-LEVEL COW table — F17 with the cost
  * model a 100 TB table actually needs. F17 commits one full-table snapshot
  * per micro-batch (correct, but per-batch cost is O(table)); here each
  * batch folds in through [[FileCow.merge]], which rewrites ONLY the data
  * files whose key stats admit a batch key — per-batch cost is
  * O(batch + touched files), the Delta/Iceberg streaming-MERGE shape.
  *
  * Exactly-once layering is F17's, unchanged:
  *  1. the reduction is [[UpsertSink.latestPerKey]] and the merge resolution
  *     is latest-wins over (touched rows ∪ batch) — replays and stale
  *     arrivals converge to the same rows (sound at file scope because an
  *     untouched file provably contains no batch key);
  *  2. the [[TxnMarker]] batch-id marker skips re-offered batches; a crash
  *     in the marker window degrades to one redundant value-identical
  *     version, never wrong data.
  *
  * `filesHint` range-partitions the CREATING batch by the key, so data
  * files carry DISJOINT key ranges from the start — that is what makes
  * later batches' stat pruning bite (hash-partitioned files would all span
  * the full key range and every merge would rewrite everything); merges
  * keep the discipline themselves (FileCow range-partitions each rewrite
  * on the key at touched-file width). Slow file growth from out-of-range
  * inserts is the compaction planner's job (G13) — the same maintenance
  * loop every file-level format schedules.
  */
object CowUpsertSink {

  def lastCommitted(root: String, appId: String): Long =
    TxnMarker.lastCommitted(root, appId)

  /** Fold one micro-batch into the COW table (skip if `batchId` already
    * committed by this `appId`). Public so the spec can drive replays. */
  def commitBatch(batch: DataFrame, root: String, appId: String, batchId: Long,
      filesHint: Int = 4): Unit = {
    if (batchId <= lastCommitted(root, appId)) return // replayed: already in
    val newest = UpsertSink.latestPerKey(batch).localCheckpoint()
    if (!newest.isEmpty) {
      val spark = batch.sparkSession
      val ranged = newest.repartitionByRange(filesHint, col("user_id"))
      if (FileCow.currentVersion(root) == 0L) {
        // lost-creation races fold in — both spellings, see [[CowRace]]
        CowRace.createOrFoldIn {
          FileCow.create(spark, root, ranged, statsCols = Seq("user_id")); ()
        } { mergeLatest(root, ranged, filesHint) }
      } else mergeLatest(root, ranged, filesHint)
    }
    TxnMarker.write(root, appId, batchId)
  }

  private def mergeLatest(root: String, newest: DataFrame, filesHint: Int): Unit = {
    // merge itself range-partitions the rewrite on the key (file count
    // tracks touched files, ranges stay disjoint) — combine only resolves
    FileCow.merge(newest.sparkSession, root, newest, keys = Seq("user_id"),
      combine = (base, src) => UpsertSink.latestPerKey(base.unionByName(src)))
    ()
  }

  /** Start the continuous file-COW upsert. */
  def sink(events: DataFrame, root: String, appId: String,
      checkpointDir: String, filesHint: Int = 4): StreamingQuery =
    events.writeStream
      .foreachBatch((b: DataFrame, id: Long) =>
        commitBatch(b, root, appId, id, filesHint))
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .start()
}
