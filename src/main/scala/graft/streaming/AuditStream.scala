package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.etl.Expectations

/** F16: STREAMING data-quality audit gate — q57's expectations at ingest:
  * every micro-batch is audited against the stream's declared contract
  * (completeness, value ranges, domain membership, within-batch key
  * uniqueness) and the per-check verdict rows land in a monitoring log as
  * the batch does. A poisoned upstream deploy (nulls where a key should
  * be, a new enum value, negative amounts) is caught the batch it arrives
  * — the alert that stops a bad landing BEFORE it reaches the nightly
  * merge, the ingest-time twin of G8's staged-audit discipline.
  *
  * Same construction discipline as F11/F14/F15: the decision core is
  * SHARED with the batch operator ([[graft.etl.Expectations.audit]] —
  * q57's exact spelling, zero drift), each batch needs only itself
  * (stateless, no watermark), and replays append identical rows (the
  * audit is a pure function of the batch). Per batch: ONE aggregate scan
  * for all checks + the literal-struct fan-out — ingest-bandwidth bound.
  */
object AuditStream {

  /** The events-stream contract, one place: shared by sink and spec. */
  def eventChecks(batch: DataFrame): DataFrame =
    Expectations.audit(batch,
      predicates = Seq(
        "events.user_id.complete" -> col("user_id").isNull,
        "events.value.positive" -> (col("value") <= 0),
        "events.event_type.domain" ->
          !col("event_type").isin("view", "click", "purchase", "signup", "error")),
      uniqueKeys = Seq("events.event_id.unique" -> Seq("event_id")))

  /** Start the gate: each micro-batch's audit (stamped with the batch id)
    * appends to `tableDir`. An alerting reader tails the log for
    * status = 'fail' rows. */
  def sink(events: DataFrame, tableDir: String, checkpointDir: String): StreamingQuery =
    events.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        eventChecks(b)
          .withColumn("batch_id", lit(id))
          .write.mode("append").parquet(tableDir)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}
