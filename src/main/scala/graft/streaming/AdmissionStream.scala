package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** F9: streaming training-data ADMISSION — the quality gate (tx08) and the
  * deterministic stratified sampler (tx06) applied at ingest time, so a
  * document's keep/drop decision is made once, as it lands, instead of in a
  * nightly batch over the accumulated corpus.
  *
  * Both decisions are pure per-row projections (regex feature counts, the
  * shared quality formula, a content-hash sampling bucket), so the stream
  * needs NO state, NO watermark and NO shuffle — the whole operator is
  * map-side and scales with ingest bandwidth alone. Determinism is the
  * point: the hash sampler admits a fixed, replayable subset (re-running a
  * batch admits exactly the same docs — at-least-once delivery is
  * idempotent by construction), unlike `rand()`-based sampling which is
  * neither replayable nor consistent across retries.
  *
  * The column logic is THE SAME code as the batch operators
  * ([[graft.functions.TextAnalysis.withQualitySignals]] /
  * `withSampleDecision`) — AdmissionStreamSpec asserts the streamed
  * decisions equal the batch operator's on identical rows, so the nightly
  * batch and the ingest path cannot diverge.
  */
object AdmissionStream {

  /** The admission decision on a (doc_id, ts, source, text) relation —
    * batch or streaming; the plan is identical (stateless projection). */
  def decide(docs: DataFrame): DataFrame =
    graft.functions.TextAnalysis.withSampleDecision(
      graft.functions.TextAnalysis.withQualitySignals(docs))
      .withColumn("admitted", col("pass") && col("sampled"))
      .select(col("doc_id"), col("ts"), col("source"), col("n_tokens"),
        col("quality"), col("fail_reason"), col("bucket"), col("rate_bp"),
        col("pass"), col("sampled"), col("admitted"))

  /** Only the admitted documents — what the ingest sink persists. */
  def admitted(docs: DataFrame): DataFrame =
    decide(docs).filter(col("admitted"))
}
