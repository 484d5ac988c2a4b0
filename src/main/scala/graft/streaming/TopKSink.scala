package graft.streaming

import org.apache.spark.sql.{AnalysisException, DataFrame, Row, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** F10: streaming windowed TOP-K — the continuously-maintained leaderboard
  * ("top event types per hour") every operational dashboard asks a stream
  * for. Ranking is not a streaming-supported aggregate (a window function
  * over an unbounded stream has no eviction story), so the operator is the
  * composition that IS supported and exact:
  *
  *   watermarked tumbling-window counts (F1, APPEND mode)
  *     → per-closed-window rank in foreachBatch → keyed table replace.
  *
  * Append mode is the correctness hinge: a (window, event_type) count row
  * is emitted exactly once, when the watermark passes the window end — and
  * every group of that window closes in the SAME micro-batch, so the batch
  * holds each closed window in FULL and the in-batch row_number ranks a
  * complete window, never a partial one. No cross-batch rank state exists,
  * which is exactly why this shape scales: rank state = one micro-batch,
  * window state = F1's bounded watermark state.
  *
  * Replay safety: the sink REPLACES each arriving window's rows rather than
  * appending (read stored → drop rows of the windows present in the batch →
  * union the fresh ranking → overwrite behind a localCheckpoint barrier, the
  * UpsertSink discipline). Re-processing a batch rewrites the same windows
  * with the same ranking — idempotent. The per-batch window list is
  * driver-collected: bounded by windows-per-batch (a few), never data-sized.
  * Deployment: the replace is `MERGE INTO`/`replaceWhere` on an ACID format
  * (docs/ADR-001); plain-parquet overwrite stands in offline.
  */
object TopKSink {

  /** Rank one append-mode batch of closed windows: top-k event types per
    * window by count, ties to the lexicographically smaller type. */
  private[graft] def rankBatch(batch: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("window_start"))
      .orderBy(col("n_events").desc, col("event_type"))
    batch.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** One micro-batch: replace the stored ranking of every window the batch
    * closed. Idempotent — replaying the batch rewrites identical rows. */
  private[graft] def topkBatch(batch: DataFrame, k: Int, tableDir: String): Unit = {
    if (!batch.isEmpty) {
      val spark = batch.sparkSession
      val ranked = rankBatch(batch, k)
      val windows = ranked.select("window_start").distinct()
        .collect().map(_.get(0)).toSeq // bounded: windows closed this batch
      val existing =
        try spark.read.parquet(tableDir)
        catch { case _: AnalysisException =>
          spark.createDataFrame(spark.sparkContext.emptyRDD[Row], ranked.schema)
        }
      existing.filter(!col("window_start").isInCollection(windows))
        .unionByName(ranked)
        .localCheckpoint() // barrier: materialize before overwriting the source dir
        .write.mode(SaveMode.Overwrite).parquet(tableDir)
    }
  }

  /** Start the continuous top-k: F1's windowed counts in append mode, each
    * closed window ranked and folded into the stored leaderboard table. */
  def sink(events: DataFrame, k: Int, tableDir: String, checkpointDir: String,
      windowLength: String = "1 hour",
      watermarkDelay: String = "10 minutes"): StreamingQuery =
    EventsStream.windowedCounts(events, windowLength, watermarkDelay)
      .writeStream
      .outputMode("append")
      .foreachBatch((b: DataFrame, _: Long) => topkBatch(b, k, tableDir))
      .option("checkpointLocation", checkpointDir)
      .start()
}
