package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Salting

/** F15: STREAMING skew monitor — q55's key-skew profile at ingest: each
  * micro-batch's heaviest keys, their ppm share, and the integer straggler
  * test, appended to a monitoring log as the batch lands. This is how a
  * campaign-day hot key (the brief's own scenario) is caught the batch it
  * starts, not in tomorrow's batch profile — the alert that flips q39's
  * salting on BEFORE the nightly join straggles.
  *
  * Same construction discipline as F11/F14: the decision core is SHARED
  * with the batch operator ([[graft.operators.Salting.skewProfile]] — one
  * spelling, zero drift), each batch needs only itself (stateless, no
  * watermark), and replays append identical rows (pure function of the
  * batch). Per batch: one key-count aggregate + TakeOrderedAndProject
  * top-N — ingest-bandwidth bound.
  */
object SkewMonitorStream {

  /** Per-batch profile — batch or micro-batch; q55's exact core. */
  def profile(batch: DataFrame, key: String, nPart: Int, topN: Int): DataFrame =
    Salting.skewProfile(batch, key, nPart, topN)

  /** Start the monitor: each micro-batch's profile (stamped with the batch
    * id) appends to `tableDir`. An alerting reader tails the log for
    * needs_salting = true rows. */
  def sink(events: DataFrame, key: String, nPart: Int, topN: Int,
      tableDir: String, checkpointDir: String): StreamingQuery =
    events.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        profile(b, key, nPart, topN)
          .withColumn("batch_id", lit(id))
          .write.mode("append").parquet(tableDir)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}
