package graft.streaming

import org.apache.spark.sql.{AnalysisException, DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** F7: streaming keyed-upsert MATERIALIZATION — the sink half the reference's
  * scheduled merge job becomes when it runs continuously. The reference
  * re-pulls an increment and anti-join-merges it into the archive on a
  * schedule (dw3_merge_inc.py:109-118); here the same "latest state per key"
  * table is maintained from a stream via `foreachBatch`, with the merge
  * expressed so that REPLAYED batches are harmless: the combine is
  * `max_by(row, (ts, event_id))`, an idempotent, commutative reduction, so
  * at-least-once delivery from a recovering stream still converges to the
  * exactly-once table (the batch-dedup analog of F3's dropDuplicates).
  *
  * Offline this container has no ACID table format (docs/ADR-001), so the
  * materialization is a read-merge-overwrite of a parquet dir with a
  * localCheckpoint barrier between the read and the overwrite; in deployment
  * the body of [[upsertBatch]] is a single MERGE INTO (and the idempotence
  * argument carries over verbatim — that is the part worth testing).
  *
  * Scale: the per-batch reduce is a hash aggregate keyed on user_id (partial
  * aggregation collapses each micro-batch map-side); the merge joins
  * batch-sized against table-sized on the same key — with a bucketed or
  * ACID-partitioned table the rewrite touches only matching partitions.
  */
object UpsertSink {

  /** Latest row per user by (ts, event_id) — one idempotent reduction used
    * for the in-batch reduce, the merge, and the spec's oracle recompute. */
  private[graft] def latestPerKey(df: DataFrame): DataFrame = {
    val all = struct(df.columns.map(col): _*)
    df.groupBy(col("user_id").as("k"))
      .agg(max_by(all, struct(col("ts"), col("event_id"))).as("r"))
      .select(col("r.*"))
  }

  /** One micro-batch merge: reduce the batch, union the stored table, reduce
    * again, overwrite. Calling this twice with the same batch is a no-op by
    * construction — max_by over a set is insensitive to duplicates. */
  private[graft] def upsertBatch(batch: DataFrame, tableDir: String): Unit = {
    val spark = batch.sparkSession
    val newest = latestPerKey(batch)
    val existing =
      try spark.read.parquet(tableDir)
      catch { case _: AnalysisException => // first batch: nothing stored yet
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], newest.schema)
      }
    // The barrier: materialize the merged table BEFORE overwriting the dir it
    // was read from (no ACID swap available offline — see scaladoc).
    latestPerKey(existing.unionByName(newest)).localCheckpoint()
      .write.mode(SaveMode.Overwrite).parquet(tableDir)
  }

  /** Start the continuous upsert: every micro-batch folds into the stored
    * latest-state-per-user table at `tableDir`. */
  def sink(events: DataFrame, tableDir: String, checkpointDir: String): StreamingQuery =
    events.writeStream
      .foreachBatch((b: DataFrame, _: Long) => upsertBatch(b, tableDir))
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .start()
}
