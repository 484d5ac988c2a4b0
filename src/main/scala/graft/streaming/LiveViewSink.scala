package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.MaterializedAgg

/** F21: a LIVE materialized view — F19's change-feed stream driving G20's
  * signed-delta fold continuously, so the view tracks the source table
  * within a micro-batch instead of waiting for a scheduled refresh. The
  * fold itself is [[MaterializedAgg.foldFeed]], the SAME code the batch
  * refresh runs (the twin discipline every streaming operator here
  * follows): scheduled and live views cannot drift on the algebra or on
  * the exactly-once protocol.
  *
  * Exactly-once layering:
  *  - the CDF source's offsets ARE source versions, so a micro-batch is a
  *    contiguous version interval and carries `_commit_version`;
  *  - the view's applied-marker records the source version it reflects; a
  *    replayed batch (restart, retry) filters to `_commit_version >`
  *    applied and skips entirely when nothing remains;
  *  - inside the fold, the G20 write-ahead intent makes "publish landed,
  *    marker didn't" recoverable — a += is never applied twice.
  *
  * Bootstrap: start the CDF stream at `startingVersion = 0` and the
  * genesis batch (version 1 as inserts) folds against the empty view —
  * no separate initialize step.
  */
object LiveViewSink {

  /** Fold one CDF micro-batch into the view. Public so specs drive
    * replays directly. */
  def foldBatch(feed: DataFrame, viewRoot: String,
      groupCols: Seq[String], sumCols: Seq[String]): Unit = {
    if (feed.isEmpty) return
    val spark = feed.sparkSession
    val (appliedSrc, _) = MaterializedAgg.applied(viewRoot)
    // replay guard: only versions the view does not already reflect
    val eligible = feed.filter(col("_commit_version") > appliedSrc)
    if (eligible.isEmpty) return
    val srcTo = eligible.agg(max(col("_commit_version"))).collect()(0).getLong(0)
    MaterializedAgg.foldFeed(spark, eligible, viewRoot, groupCols, sumCols, srcTo)
  }

  /** Start the live view over a CDF stream (`graft-cdf` source). */
  def sink(cdf: DataFrame, viewRoot: String, groupCols: Seq[String],
      sumCols: Seq[String], checkpointDir: String): StreamingQuery =
    cdf.writeStream
      .foreachBatch((b: DataFrame, _: Long) =>
        foldBatch(b, viewRoot, groupCols, sumCols))
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .start()
}
