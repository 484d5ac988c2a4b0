package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit,
  Offset => OffsetV2, ReadLimit, ReadMaxBytes, ReadMaxRows,
  SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.sources.FileCow

/** F19: a COW TABLE'S CHANGE FEED AS A STREAMING SOURCE — the Delta
  * `spark.readStream.option("readChangeFeed", …)` analog on G19's layout,
  * and the third leg of the CDF story: G17/G19 derive the feed, G20 folds
  * it into a maintained aggregate on a schedule, and this source pushes it
  * CONTINUOUSLY into any Structured Streaming pipeline (a replicator, an
  * F-series ingest gate, a G20 refresh at trigger cadence).
  *
  * The OFFSET IS THE TABLE VERSION — the cleanest possible streaming
  * contract: `getOffset` returns the table's current version,
  * `getBatch(v₁, v₂)` emits the union of per-commit feeds (v, v+1] for
  * v₁ < v+1 ≤ v₂, each row tagged `_commit_version` (Delta's CDF
  * vocabulary). Exactly-once replay is INHERITED, not engineered:
  * versions are immutable and the diff is deterministic, so a recovering
  * stream re-reading an interval reproduces bit-identical rows; per-commit
  * tagging keeps one commit's update_pre/update_post pair in one batch.
  *
  * `startingVersion` (default: the version current when the stream starts)
  * sets the initial position; 0 streams the whole history — version 1
  * arrives as the genesis batch, every row an `insert` (the bootstrap a
  * downstream replica needs before it can follow deltas).
  *
  * Scale: each micro-batch reads only the files its commit pair does not
  * share (G19's incremental-diff bound) — a quiet table streams nothing, a
  * busy one streams its deltas, nothing ever rescans the table. Vacuumed
  * versions fail loudly (the Delta contract: retention must outlive the
  * slowest consumer).
  *
  * V1 `Source` deliberately, not DSv2: the feed already IS a DataFrame
  * program, and V1's `getBatch: DataFrame` slots it in directly where
  * DSv2's `PartitionReader` would force a hand-rolled row pipeline for
  * zero gain. The one hop V1 needs — re-tagging the batch plan as
  * streaming — is `GraftBridge.asStreaming` (the same package-bridge
  * pattern the rest of `graft.plans` uses).
  */
class CdfSourceProvider extends StreamSourceProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  /** `spark.readStream.format("graft-cdf")` (service-registered). */
  override def shortName(): String = "graft-cdf"

  private def opt(params: Map[String, String], key: String): String =
    params.getOrElse(key, sys.error(s"graft-cdf: '$key' option is required"))

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, params: Map[String, String]): (String, StructType) =
    ("graft-cdf", CdfSource.feedSchema(opt(params, "root")))

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      params: Map[String, String]): Source = {
    val root = opt(params, "root")
    val keys = opt(params, "keys").split(",").map(_.trim).toSeq
    CdfSource.pinnedMode(metadataPath, "cdf")
    val pinned = CdfSource.pinnedSchema(metadataPath, CdfSource.feedSchema(root))
    new CdfSource(ctx, root, keys, CdfSource.pinnedStart(metadataPath, root, params),
      params.get("maxVersionsPerTrigger").map(_.toLong), Some(metadataPath),
      pinnedFeedSchema = Some(pinned),
      maxBytesPerTrigger = params.get("maxBytesPerTrigger").map(
        org.apache.spark.network.util.JavaUtils.byteStringAsBytes))
  }
}

object CdfSource {

  /** Where a rate-limited source has delivered up to, persisted under the
    * checkpoint metadata dir. `getOffset` has no access to the WAL's
    * committed offset (the V1 API's gap), so without this a CLEAN restart
    * would re-resolve the cap from the start version — returning an offset
    * BELOW what the checkpoint already committed and re-delivering rows.
    * `advance` is monotonic and runs at batch CONSTRUCTION (getBatch), so
    * a crash-replayed batch just re-advances to the same position. */
  private[streaming] final class RatePos(metadataPath: String, root: String,
      init: Long) {
    private val file = metaDir(metadataPath).resolve("graft-rate-pos")
    def get: Long =
      if (java.nio.file.Files.exists(file))
        math.max(init, new String(java.nio.file.Files.readAllBytes(file),
          java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
      else init
    def advance(to: Long): Unit = if (to > get) {
      java.nio.file.Files.createDirectories(file.getParent)
      val tmp = file.resolveSibling(s"graft-rate-pos.tmp")
      java.nio.file.Files.write(tmp,
        to.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp, file,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** VACUUM PROTECTION (r13 #5): the checkpoint registers under the table
    * root at source CONSTRUCTION (floored at the pinned start — a restart
    * may still have to REPLAY WAL-committed-but-unprocessed batches, so
    * the floor must never ride the constructed batch end the rate
    * position tracks) and tightens to each batch's offset from the
    * engine's `Source.commit` callback — the one signal that means "this
    * batch is durably done and will never replay". Deleting the
    * checkpoint is the deregistration. */
  private[streaming] def registerProtection(metadataPath: Option[String],
      root: String, deliveredTo: Long, onlyIfAbsent: Boolean = false,
      readsRemoved: Boolean = true): Unit =
    metadataPath.foreach(mp =>
      FileCow.registerStream(root, metaDir(mp).toString, deliveredTo,
        onlyIfAbsent, readsRemoved = readsRemoved))

  private[streaming] def metaDir(metadataPath: String): java.nio.file.Path =
    java.nio.file.Paths.get(
      org.apache.hadoop.fs.Path.getPathWithoutSchemeAndAuthority(
        new org.apache.hadoop.fs.Path(metadataPath)).toString)

  /** Resolve the stream's start version ONCE and pin it under the source's
    * checkpoint metadata dir. The start must be STABLE across restarts: a
    * recovering stream re-creates the source, and a WAL-replayed first
    * batch would otherwise re-resolve the "current version" default against
    * a table that has moved — silently skipping the replayed interval.
    * `startingVersion` wins over `startingTimestamp` (TIMESTAMP AS OF
    * semantics: epoch-millis digits or a 'yyyy-MM-dd HH:mm:ss[.fff]'
    * literal); the default is the version current at first creation.
    * Shared by the CDF source and the graft-cow table stream — the pinning
    * contract is identical. */
  def pinnedStart(metadataPath: String, root: String,
      params: Map[String, String]): Long = {
    // metadataPath arrives as a Hadoop URI ("file:/…"); as a raw string it
    // would resolve RELATIVE to the working dir and pin in the wrong place.
    val pinned = metaDir(metadataPath).resolve("graft-cdf-start")
    if (java.nio.file.Files.exists(pinned))
      new String(java.nio.file.Files.readAllBytes(pinned),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
    else {
      val fromTs = params.get("startingTimestamp").map { ts =>
        val ms = if (ts.forall(_.isDigit)) ts.toLong
                 else java.sql.Timestamp.valueOf(ts).getTime
        FileCow.versionAtTimestamp(root, ms)
      }
      val v = params.get("startingVersion").map(_.toLong)
        .orElse(fromTs)
        .getOrElse(FileCow.visibleVersion(root))
      java.nio.file.Files.createDirectories(pinned.getParent)
      val tmp = pinned.resolveSibling("graft-cdf-start.tmp")
      java.nio.file.Files.write(tmp,
        v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp, pinned,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      v
    }
  }
  /** Persist the table-stream's BIRTH schema under the source's checkpoint
    * metadata dir and GUARD restarts against incompatible drift. A restart
    * re-creates the source, and Spark's V1 engine rebuilds the plan from
    * the provider's CURRENT schema resolution (the provider never sees the
    * checkpoint path at resolution time), so the source cannot simply keep
    * emitting the birth schema — the engine would reject its batches. What
    * it CAN do, and Delta does the same: pin the birth schema, accept a
    * restart whose resolution is a pure WIDENING (additive evolution —
    * replayed batches gain a null column, nothing the sink consumed
    * changes meaning; the pin advances), and FAIL LOUDLY when a
    * drop/rename-column commit would make WAL-replayed batches re-read
    * under a schema that silently changes the column set the checkpointed
    * sink already consumed. */
  def pinnedSchema(metadataPath: String, resolved: StructType): StructType = {
    val pinned = metaDir(metadataPath).resolve("graft-cow-schema")
    def write(s: StructType): Unit = {
      java.nio.file.Files.createDirectories(pinned.getParent)
      val tmp = pinned.resolveSibling("graft-cow-schema.tmp")
      java.nio.file.Files.write(tmp,
        s.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp, pinned,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    if (!java.nio.file.Files.exists(pinned)) { write(resolved); resolved }
    else {
      val birth = org.apache.spark.sql.types.DataType.fromJson(
        new String(java.nio.file.Files.readAllBytes(pinned),
          java.nio.charset.StandardCharsets.UTF_8)).asInstanceOf[StructType]
      if (birth == resolved) resolved
      else {
        // name+type alone would let a DROP + same-name RE-ADD pass as a
        // "widening" (the re-added column has a FRESH field id and reads
        // NULL from pre-drop files) — compare ids too, so that drift
        // fails loudly like rename does
        def idOf(x: org.apache.spark.sql.types.StructField): Option[Long] =
          if (x.metadata.contains(graft.sources.FileCow.FieldIdKey))
            Some(x.metadata.getLong(graft.sources.FileCow.FieldIdKey))
          else None
        val widening = birth.fields.forall(f => resolved.fields.exists(g =>
          g.name == f.name && g.dataType == f.dataType && idOf(g) == idOf(f)))
        if (widening) { write(resolved); resolved }
        else sys.error("graft-cow stream: the table schema changed " +
          s"incompatibly since this checkpoint's stream began " +
          s"(${birth.simpleString} -> ${resolved.simpleString}). " +
          "WAL-replayed batches would be re-read under the new schema, " +
          "silently changing the column set the sink already consumed — " +
          "start from a fresh checkpoint, or stream the change feed " +
          "(readChangeFeed=true).")
      }
    }
  }

  /** A version offset back out of the engine's Offset: LongOffset within a
    * run, SerializedOffset across a restart (the WAL replays JSON). Shared
    * by both cow sources' V1 (`getBatch`) and admission-control
    * (`latestOffset`) entries — V1 offsets subtype the connector Offset. */
  private[streaming] def versionOf(o: OffsetV2): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => sys.error(s"graft cow stream: unexpected offset $other")
  }

  /** Cap a planned catch-up (from, planned] at `maxVersions` commits
    * and/or `maxBytes` CUMULATIVE NEW-DATA BYTES — the commit log records
    * each commit's ADDED-FILE byte total (`bytesAdded`, what the batch
    * will read; NOT the record's `bytes`, which is the whole snapshot's
    * size — pricing on that would collapse every batch to one version the
    * moment the table outgrows the cap), so the walk reads
    * file-count-sized metadata, never data. A version-count cap alone
    * admits an unbounded-byte batch after one huge COPY INTO/append; the
    * byte cap bounds executor work per micro-batch. Delta's
    * `maxBytesPerTrigger` "soft max" contract: at least one commit is
    * always admitted (a single over-cap commit still makes progress — it
    * cannot be split below commit granularity), and the cap may be
    * exceeded by at most that one commit's size. Records from before the
    * field existed fall back to the snapshot total — conservative (a
    * smaller batch), never unbounded. `readsRemoved` prices the commit's
    * REMOVED bytes too — the change feed reads both sides of a rewrite
    * (a remove-only whole-file-drop DELETE would otherwise admit for
    * free and hand the CDF an unbounded pre-image batch), while the
    * table stream reads only added files. A DV-delta commit moves no
    * data files (bytesAdded = bytesRemoved = 0) yet its feed re-reads
    * the still-present files whose vectors changed — TWICE, one scan
    * per delta side (delete + insert; streaming batches run without
    * AQE, so even an empty side's semi-join scans its probe) — priced
    * as 2×`bytesDv` on the `readsRemoved` path (an r11-era record
    * carrying dvFiles without the field falls back to the snapshot
    * total, conservative). Shared by both cow sources and by their
    * legacy `getOffset` path. */
  private[streaming] def admitUpTo(root: String, from: Long, planned: Long,
      maxVersions: Option[Long], maxBytes: Option[Long],
      readsRemoved: Boolean = false): Long = {
    val vCap = maxVersions.fold(planned)(m =>
      math.min(planned, from + math.max(m, 1L)))
    maxBytes match {
      case None => vCap
      case Some(cap) =>
        var v = from
        var acc = 0L
        var stop = false
        while (!stop && v < vCap) {
          // the per-commit pricing lives on FileCow (ADVICE r14) —
          // `DESCRIBE STREAMS` sums the SAME function for lag_bytes
          val b = FileCow.commitInfo(root, v + 1)
            .map(ci => FileCow.commitAdmissionBytes(ci, readsRemoved))
            .getOrElse(0L)
          if (v > from && acc + b > cap) stop = true
          else { acc += b; v += 1 }
        }
        v
    }
  }

  /** CDC semantics of cross-table transactions (round 16): a version
    * gated by an ABORTED txn was NEVER VISIBLE, and the `txn_revert`
    * that healed it restores exactly the pre-txn state — so a change
    * feed must emit NOTHING for the whole span. Without the skip, a
    * version-granular batch (maxVersionsPerTrigger=1) would hand a
    * downstream replica the aborted rows as real inserts one trigger
    * before their reverting deletes — transiently (CDF) or permanently
    * (an append-only table stream under skipChangeCommits) wrong.
    * Offsets only ever PLAN past a version while it reads visible, so a
    * marker seen here is Committed (emit) or Aborted (skip) — decisions
    * are immutable, replays classify identically. Admission still prices
    * skipped versions' bytes (conservative: admits less, never more). */
  private[streaming] def skipInFeed(ci: graft.sources.FileCow.CommitInfo): Boolean =
    ci.kind == "txn_revert" ||
    ci.txnMarker.exists(m => graft.sources.GraftTransactions.stateFresh(m) ==
      graft.sources.GraftTransactions.Aborted)

  /** The engine's ReadLimit unpacked into (maxVersions, maxBytes). Rows
    * map onto VERSIONS for these sources (the unit their offsets count —
    * the same mapping FileStreamSource makes onto files); a composite
    * takes the tightest of each kind (the AvailableNow wrapping shape). */
  private[streaming] def limitCaps(limit: ReadLimit): (Option[Long], Option[Long]) =
    limit match {
      case r: ReadMaxRows => (Some(r.maxRows()), None)
      case b: ReadMaxBytes => (None, Some(b.maxBytes()))
      case c: CompositeReadLimit =>
        val parts = c.getReadLimits.toSeq.map(limitCaps)
        (parts.flatMap(_._1).minOption, parts.flatMap(_._2).minOption)
      case _ => (None, None)
    }

  /** The default ReadLimit advertised to the engine from the two option
    * knobs (`maxVersionsPerTrigger`, `maxBytesPerTrigger`). */
  private[streaming] def defaultLimit(maxVersions: Option[Long],
      maxBytes: Option[Long]): ReadLimit = (maxVersions, maxBytes) match {
    case (Some(m), Some(b)) =>
      ReadLimit.compositeLimit(Array(ReadLimit.maxRows(m), ReadLimit.maxBytes(b)))
    case (Some(m), None) => ReadLimit.maxRows(m)
    case (None, Some(b)) => ReadLimit.maxBytes(b)
    case _ => ReadLimit.allAvailable()
  }

  /** Project a per-commit feed onto the stream's PINNED schema, in its
    * declared order (offset-based row decoding is order-sensitive). A
    * restart may have ADVANCED the pin across a pure widening — a replayed
    * pre-widening slice lacks the new column and must gain it as a typed
    * NULL (the pin's documented contract). `fillable` is the disambiguator
    * (the CURRENT table schema's columns): a legitimately-replayed missing
    * column was ADDED later so it still exists now, while a column missing
    * because a drop/rename landed MID-RUN no longer does — that case must
    * FAIL LOUDLY (silently null-filling it would hand the sink real rows
    * with a corrupted column until the restart guard finally fires). */
  private[graft] def conformTo(schema: StructType, feed: DataFrame,
      fillable: String => Boolean): DataFrame = {
    val have = feed.columns.toSet
    feed.select(schema.fields.toSeq.map { f =>
      if (have.contains(f.name)) col(f.name)
      else if (fillable(f.name)) lit(null).cast(f.dataType).as(f.name)
      else sys.error(s"graft-cdf stream: column '${f.name}' vanished from " +
        "the table mid-run (a drop/rename commit) — the stream cannot keep " +
        "delivering it; restart from a fresh checkpoint")
    }: _*)
  }

  /** Pin the source MODE (table stream vs change feed) under the
    * checkpoint metadata dir. Reusing one checkpoint across modes would
    * PASS the schema-widening check (the feed schema is a pure superset
    * of the table schema: same columns + the two tag columns) and then
    * silently change what WAL-replayed batches mean to the sink — plain
    * appended rows re-delivered as tagged change rows, or vice versa. */
  def pinnedMode(metadataPath: String, mode: String): Unit = {
    val f = metaDir(metadataPath).resolve("graft-source-mode")
    if (java.nio.file.Files.exists(f)) {
      val prev = new String(java.nio.file.Files.readAllBytes(f),
        java.nio.charset.StandardCharsets.UTF_8).trim
      if (prev != mode) sys.error(
        s"graft-cow stream: this checkpoint was built by a '$prev' source; " +
          s"restarting it as '$mode' would silently change what replayed " +
          "batches mean to the sink — start from a fresh checkpoint")
    } else {
      java.nio.file.Files.createDirectories(f.getParent)
      val tmp = f.resolveSibling("graft-source-mode.tmp")
      java.nio.file.Files.write(tmp,
        mode.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp, f,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    }
  }

  /** Table schema + Delta's `_change_type` and `_commit_version`. */
  def feedSchema(root: String): StructType = {
    val v = FileCow.visibleVersion(root)
    require(v > 0, s"graft-cdf: no published version under $root")
    StructType(FileCow.schemaOf(root, v).fields ++ Seq(
      StructField("_change_type", StringType, nullable = false),
      StructField("_commit_version", LongType, nullable = false)))
  }
}

class CdfSource(ctx: SQLContext, root: String, keys: Seq[String],
    val startVersion: Long,
    maxVersionsPerTrigger: Option[Long] = None,
    metadataPath: Option[String] = None,
    pinnedFeedSchema: Option[StructType] = None,
    maxBytesPerTrigger: Option[Long] = None) extends Source
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  // the feed schema is PINNED at stream birth exactly like the table
  // stream's ([[CdfSource.pinnedSchema]]): a restart after a rename/drop
  // commit must fail loudly instead of silently re-reading WAL-replayed
  // batches under a different column set than the sink already consumed
  override val schema: StructType =
    pinnedFeedSchema.getOrElse(CdfSource.feedSchema(root))

  // rate limiting caps each micro-batch at N commits and/or B cumulative
  // new-data bytes, so a stream catching up on a long-idle checkpoint
  // drains the backlog in bounded batches instead of one giant one
  // (Delta's maxFilesPerTrigger/maxBytesPerTrigger motivation — the byte
  // cap is what bounds the batch after ONE fat COPY INTO lands among
  // small commits)
  // constructed for EVERY checkpointed stream (not just rate-limited
  // ones): RatePos doubles as the vacuum-protection registration seam
  // (r13 #5), and admitUpTo with no caps short-circuits for free
  private val ratePos = metadataPath.map(new CdfSource.RatePos(_, root, startVersion))
  // vacuum protection registers at the PINNED START only when no marker
  // exists yet (an existing one already holds an engine-confirmed
  // position); it tightens at getBatch (the start offset is
  // WAL-committed) and at the engine's commit callback below — never at
  // a constructed batch END, whose versions a crash would replay
  CdfSource.registerProtection(metadataPath, root, startVersion,
    onlyIfAbsent = true)

  override def getOffset: Option[Offset] = {
    val v = FileCow.visibleVersion(root)
    val capped = ratePos.fold(v)(pos => CdfSource.admitUpTo(root, pos.get, v,
      maxVersionsPerTrigger, maxBytesPerTrigger, readsRemoved = true))
    if (capped > startVersion) Some(LongOffset(capped)) else None
  }

  private def version(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => sys.error(s"graft-cdf: unexpected offset $other")
  }

  // Trigger.AvailableNow + admission control — same contract as
  // [[CowTableSource]]: the planned end is the version observed at prepare
  // time, each batch bounded by maxVersionsPerTrigger, a drain stops there.
  @volatile private var availableNowEnd: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(FileCow.visibleVersion(root))

  override def getDefaultReadLimit: ReadLimit =
    CdfSource.defaultLimit(maxVersionsPerTrigger, maxBytesPerTrigger)

  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val from = Option(start).map(CdfSource.versionOf).getOrElse(startVersion)
    val current = FileCow.visibleVersion(root)
    val planned = availableNowEnd.fold(current)(math.min(current, _))
    val (mv, mb) = CdfSource.limitCaps(limit)
    val capped = CdfSource.admitUpTo(root, from, planned, mv, mb,
      readsRemoved = true)
    if (capped > from) LongOffset(capped) else null
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val spark = ctx.sparkSession
    val from = start.map(version).getOrElse(startVersion)
    // `start` is the WAL-committed lower bound: safe to tighten the
    // vacuum-protection floor to it (batches below will never replay)
    CdfSource.registerProtection(metadataPath, root, from)
    val to = version(end)
    // which pinned columns may legitimately be missing from a slice: the
    // ones that still exist NOW were added later (replay below the pin);
    // a column gone from the current schema was dropped/renamed mid-run
    val currentCols =
      FileCow.schemaOf(root, FileCow.visibleVersion(root)).fieldNames.toSet
    val perCommit = (from until to).map { v =>
      // aborted-txn spans (the gated versions + their txn_revert) emit
      // NOTHING — see CdfSource.skipInFeed
      if (v > 0L && FileCow.commitInfo(root, v + 1).exists(CdfSource.skipInFeed))
        spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
      else {
      val feed =
        if (v == 0L) // genesis: version 1 IS the insert feed
          FileCow.readVersion(spark, root, 1L)
            .withColumn("_change_type", lit("insert"))
        else FileCow.changesBetween(spark, root, keys, v, v + 1)
      // changesBetween leads with _change_type; project to the DECLARED
      // schema order (offset-based row decoding is order-sensitive)
      CdfSource.conformTo(schema,
        feed.withColumn("_commit_version", lit(v + 1)), currentCols)
      }
    }
    ratePos.foreach(_.advance(to))
    org.apache.spark.sql.GraftBridge.asStreaming(perCommit.reduce(_ unionByName _))
  }

  /** The engine's durable-completion signal: batches at or below `end`
    * will never replay, so the vacuum-protection floor may advance. */
  override def commit(end: Offset): Unit =
    CdfSource.registerProtection(metadataPath, root, version(end))

  override def stop(): Unit = ()
}
