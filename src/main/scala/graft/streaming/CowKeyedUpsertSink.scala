package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.FileCow

/** The GENERIC keyed streaming upsert behind
  * `writeStream.format("graft-cow").outputMode("update")` — F18's
  * latest-wins fold for ANY schema, given the two facts the generic sink
  * cannot guess: the key columns and the recency column. Determinism is
  * the design constraint (replays and stale re-arrivals must converge to
  * identical rows): the winner per key is `max_by` over the tuple
  * `(orderBy, every other non-key column in schema order)` — a TOTAL
  * lexicographic order, so ties on `orderBy` still pick one deterministic
  * winner instead of whichever task finished last. Cost model is F18's:
  * each batch merges at touched-file scope; idempotence is the
  * [[TxnMarker]] protocol (a replayed upsert is value-idempotent, so the
  * marker crash window degrades to one redundant identical version).
  */
object CowKeyedUpsertSink {

  /** Deterministic latest-per-key reduction (see class doc). */
  private[streaming] def latestPerKey(df: DataFrame, keys: Seq[String],
      orderBy: String): DataFrame = {
    val others = df.columns.filterNot(c =>
      keys.exists(_.equalsIgnoreCase(c)) || c.equalsIgnoreCase(orderBy))
    val rank = struct((orderBy +: others.toSeq).map(col): _*)
    val all = struct(df.columns.map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(all, rank).as("__r"))
      .select(col("__r.*"))
  }

  def commitBatch(batch: DataFrame, root: String, appId: String, batchId: Long,
      keys: Seq[String], orderBy: String, statsCols: Seq[String],
      filesHint: Int = 4): Unit = {
    if (batchId <= TxnMarker.lastCommitted(root, appId)) return // replayed
    require(batch.columns.exists(_.equalsIgnoreCase(orderBy)),
      s"graft-cow update sink: orderBy column '$orderBy' not in the stream")
    val newest = latestPerKey(batch, keys, orderBy).localCheckpoint()
    if (!newest.isEmpty) {
      val spark = batch.sparkSession
      def merge(): Unit = {
        FileCow.merge(spark, root, newest, keys,
          combine = (base, src) => latestPerKey(base.unionByName(src), keys, orderBy))
        ()
      }
      if (FileCow.currentVersion(root) == 0L) {
        val ranged = newest.repartitionByRange(filesHint, col(statsCols.head))
        // both spellings of a lost creation race fold in — see [[CowRace]]
        CowRace.createOrFoldIn {
          FileCow.create(spark, root, ranged, statsCols); ()
        } { merge() }
      } else merge()
    }
    TxnMarker.write(root, appId, batchId)
  }
}
