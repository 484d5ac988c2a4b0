package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextPrep
import graft.functions.WordShingles3

/** A document arriving on the ingest stream. */
final case class Doc(doc_id: Long, ts: Timestamp, text: String)

/** One (band, bucket) assignment of a document, carrying its full signature. */
final case class BandedDoc(
    band: Int,
    band_key: String,
    doc_id: Long,
    ts: Timestamp,
    sig: Seq[Long])

/** An emitted near-duplicate match: `doc_id` arrived and collided with the
  * earlier `dup_of` (estimated similarity = fraction of agreeing minhash
  * rows). One row per (doc, earlier-doc) pair regardless of how many bands
  * collide (first-match-band dedup). */
final case class DupMatch(doc_id: Long, dup_of: Long, band: Int, est_sim: Double)

/** Per-bucket state: (doc_id, event-time ms, signature) of documents seen in
  * this bucket, newest first, trimmed to the dedup horizon. */
final case class BucketState(docs: List[(Long, Long, Seq[Long])], lastTs: Long)

/** F6: STREAMING near-duplicate detection — dedup-on-ingest (SURVEY §2 F6).
  *
  * The batch dedup family (dd02/dd06/dd07) assumes the corpus is at rest; a
  * training-data pipeline also needs the arrival-time variant: as documents
  * land, flag each one that near-duplicates something already ingested,
  * before it reaches storage. Same MinHash+LSH math as dd02, re-expressed
  * for Structured Streaming:
  *
  *  - The 8-permutation signature is a per-row SCALAR (the native
  *    [[graft.functions.MinHashSig8]] codegen pass, shared with dd02
  *    through TextPrep.minhashSig) — no explode, no aggregate, so the
  *    stream needs no shuffle before banding.
  *  - Docs fan out to their 4 band buckets; `flatMapGroupsWithState` keyed
  *    on the bucket holds the signatures seen there. A new doc is compared
  *    against its bucket's members: ≥ 4/8 agreeing rows (the s-curve
  *    midpoint, matching dd02's J ≥ 0.5 verify) emits a match against each.
  *  - A pair colliding in several bands would emit once per band; the
  *    first-match-band predicate (emit only where every earlier band
  *    differs — dd03's trick) makes emissions exactly-once per pair with
  *    zero extra state or post-dedup shuffle.
  *  - State is bounded by event time, exactly like sessionization: the
  *    group-state timeout drops buckets idle past the dedup horizon, and a
  *    live bucket trims members older than the horizon on every arrival
  *    (duplicates arriving later than the horizon are accepted as "new" —
  *    the documented trade-off every streaming dedup makes). Eviction is
  *    deliberately NOT count-based: an age cut is consistent across a doc's
  *    four band buckets, which the first-match-band suppression relies on.
  *
  * DocsStreamSpec checks the emitted matches against a driver-side reference
  * over the same arrival order, including cross-micro-batch state. */
object DocsStream {

  /** (doc_id, ts, band, band_key, sig) stream/batch-agnostic projection —
    * signature and band keys come from the SAME TextPrep builders the batch
    * LSH family uses, so the two paths cannot drift apart. */
  def banded(docs: Dataset[Doc]): Dataset[BandedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("sig",
        TextPrep.minhashSig(WordShingles3.shingles3(TextPrep.clean(col("text")))))
      .select(col("doc_id"), col("ts"),
        posexplode(array(TextPrep.bandKeys(col("sig")).zipWithIndex.map {
          case (k, b) => struct(lit(b).as("band"), k.as("band_key"))
        }: _*)).as(Seq("pos", "bk")),
        col("sig"))
      .select(col("bk.band").as("band"), col("bk.band_key").as("band_key"),
        col("doc_id"), col("ts"), col("sig"))
      .as[BandedDoc]
  }

  /** Rows k where the two signatures agree. */
  private def agreement(a: Seq[Long], b: Seq[Long]): Int =
    (0 until 8).count(k => a(k) == b(k))

  /** True iff `band` is the FIRST band where the two signatures collide. */
  private def firstMatchBand(band: Int, a: Seq[Long], b: Seq[Long]): Boolean =
    (0 until band).forall(bp => a(2 * bp) != b(2 * bp) || a(2 * bp + 1) != b(2 * bp + 1))

  /** The streaming near-dup detector. `horizonMs` bounds how far back a
    * duplicate can be detected, `minAgree` of 8 rows is the similarity gate
    * (4 ≈ J 0.5).
    *
    * State eviction is EVENT-TIME based in two layers: idle buckets are
    * dropped wholesale by the group-state timeout, and within a live bucket
    * members older than the horizon relative to the newest arrival are
    * trimmed. Event-time trimming (vs a per-bucket count cap) is what keeps
    * the first-match-band suppression sound: a doc inside the horizon is
    * present in ALL FOUR of its band buckets, so the suppressing bucket and
    * the emitting bucket agree on membership. (The residual race is only at
    * the horizon boundary itself — a partner evicted from one bucket
    * slightly before another — which degrades into the already-documented
    * "older than the horizon counts as new" semantics, never a silent drop
    * of an in-horizon pair.) A redelivered doc_id (at-least-once source) is
    * recognized in state and neither re-matched against itself nor
    * double-inserted. */
  def nearDupMatches(
      docs: Dataset[Doc],
      watermarkDelay: String = "10 minutes",
      horizonMs: Long = 3600L * 1000,
      minAgree: Int = 4): Dataset[DupMatch] = {
    val spark = docs.sparkSession
    import spark.implicits._
    banded(docs.withWatermark("ts", watermarkDelay))
      .groupByKey(_.band_key)
      .flatMapGroupsWithState[BucketState, DupMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[BandedDoc], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // Arrival order within a micro-batch is not guaranteed: process
            // in deterministic (ts, doc_id) order, matching the reference.
            val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))
            var members = state.getOption.map(_.docs).getOrElse(Nil)
            var lastTs = state.getOption.map(_.lastTs).getOrElse(0L)
            val out = Seq.newBuilder[DupMatch]
            for (r <- sorted) {
              members = members.filter(_._2 >= r.ts.getTime - horizonMs)
              if (!members.exists(_._1 == r.doc_id)) {
                for ((id, _, sig) <- members
                     if agreement(r.sig, sig) >= minAgree
                       && firstMatchBand(r.band, r.sig, sig))
                  out += DupMatch(r.doc_id, id, r.band, agreement(r.sig, sig) / 8.0)
                members = (r.doc_id, r.ts.getTime, r.sig) :: members
              }
              lastTs = math.max(lastTs, r.ts.getTime)
            }
            state.update(BucketState(members, lastTs))
            state.setTimeoutTimestamp(lastTs + horizonMs)
            out.result().iterator
          }
      }
  }
}
