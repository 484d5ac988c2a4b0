package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2,
  ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.types.StructType

import graft.sources.FileCow

/** A COW TABLE AS AN APPEND STREAM — Delta's
  * `spark.readStream.format("delta")` analog on G19's layout: the table
  * itself is the source, each commit's NEWLY ADDED rows arrive as one
  * micro-batch slice, offsets are table versions (same contract as F19's
  * change feed, so replay is inherited from version immutability).
  *
  * Commit semantics are derived from the commit record's SHAPE, not from an
  * allowlist of kind names (so a new commit kind can never silently corrupt
  * or needlessly kill the stream — Delta classifies the same way, by the
  * commit's actions rather than its operation name):
  *   - added-only (`create` / `convert` / `copy_into` / `append` / an
  *     insert-only `merge` …) — the added files ARE the new rows; the batch
  *     reads exactly those files, O(new data).
  *   - no files touched (`add_columns` / `set_properties` /
  *     `add_constraint` …) — metadata-only, row set identical: skipped.
  *   - `compact` / `zorder` / `rename_column` — rewrite files but not rows
  *     (the one classification shape can't see): skipped.
  *   - anything else that removes files (`merge` / `delete` / `update` /
  *     `overwrite` / `restore`) rewrites rows an append-only stream cannot
  *     represent: FAIL by default (Delta's contract), or skip the whole
  *     commit when `skipChangeCommits=true` (Delta's option of the same
  *     name). For the full picture of such commits, stream
  *     `readChangeFeed=true` instead.
  *
  * The schema is pinned at stream birth; files committed under a later
  * evolved schema are projected onto it (missing columns read as null —
  * the parquet contract, same as batch reads across `addColumns`).
  *
  * Vacuum drops commit records with their versions, so retention must
  * outlive the slowest consumer — a gap fails loudly, never silently.
  */
class CowTableSource(ctx: SQLContext, root: String,
    override val schema: StructType, val startVersion: Long,
    skipChangeCommits: Boolean,
    maxVersionsPerTrigger: Option[Long] = None,
    metadataPath: Option[String] = None,
    maxBytesPerTrigger: Option[Long] = None) extends Source
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  /** Kinds that add+remove files yet leave the row set identical — the one
    * case the added/removed shape alone cannot distinguish from a rewrite. */
  private val RowNeutralRewriteKinds = Set("compact", "zorder", "rename_column")

  // same bounded-catch-up contract as the CDF source: cap each batch at N
  // commits and/or B cumulative new-data bytes ([[CdfSource.admitUpTo]] —
  // the byte cap bounds the batch after one fat COPY INTO), position
  // persisted in checkpoint metadata across restarts
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
    onlyIfAbsent = true, readsRemoved = false)

  override def getOffset: Option[Offset] = {
    val v = FileCow.visibleVersion(root)
    val capped = ratePos.fold(v)(pos => CdfSource.admitUpTo(root, pos.get, v,
      maxVersionsPerTrigger, maxBytesPerTrigger))
    if (capped > startVersion) Some(LongOffset(capped)) else None
  }

  // --- Trigger.AvailableNow (the FileStreamSource/Delta pattern: a V1
  // Source that ALSO implements the admission-control seam, so the engine
  // plans offsets through latestOffset instead of getOffset) -------------
  // The drain's PLANNED END: the version observed when the engine prepares
  // the run. Batches never plan past it, so a drain terminates at the
  // start-observed version no matter what lands mid-drain — the next run
  // (same checkpoint) picks those commits up from the committed offset.
  @volatile private var availableNowEnd: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(FileCow.visibleVersion(root))

  /** Offsets are table VERSIONS, so `maxVersionsPerTrigger` maps onto the
    * engine's max-rows limit shape (rows := versions here, the same way
    * FileStreamSource maps maxFilesPerTrigger onto maxFiles) and
    * `maxBytesPerTrigger` onto max-bytes. */
  override def getDefaultReadLimit: ReadLimit =
    CdfSource.defaultLimit(maxVersionsPerTrigger, maxBytesPerTrigger)

  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val from = Option(start).map(CdfSource.versionOf).getOrElse(startVersion)
    val current = FileCow.visibleVersion(root)
    val planned = availableNowEnd.fold(current)(math.min(current, _))
    val (mv, mb) = CdfSource.limitCaps(limit)
    val capped = CdfSource.admitUpTo(root, from, planned, mv, mb)
    if (capped > from) LongOffset(capped) else null
  }

  private def version(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => sys.error(s"graft-cow stream: unexpected offset $other")
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val spark = ctx.sparkSession
    val from = start.map(version).getOrElse(startVersion)
    // `start` is the WAL-committed lower bound: safe to tighten the
    // vacuum-protection floor to it (batches below will never replay)
    CdfSource.registerProtection(metadataPath, root, from, readsRemoved = false)
    val to = version(end)
    val addedFiles = ((from + 1) to to).flatMap { v =>
      val info = FileCow.commitInfo(root, v).getOrElse(sys.error(
        s"graft-cow stream: commit record for version $v of $root is gone " +
        "(vacuumed?) — snapshot retention must outlive the slowest consumer"))
      info.kind match {
        // an aborted txn's gated versions and their txn_revert heal: the
        // span was never visible and nets to nothing — emit nothing, and
        // never fail the stream on the heal's file removals
        case _ if CdfSource.skipInFeed(info) => Nil
        case k if RowNeutralRewriteKinds(k) => Nil
        // a deletion-vector change (delete_dv, or a restore rewinding
        // vectors over an identical file set) touches no files but DOES
        // change rows — it must never classify as metadata-only and pass;
        // a no-op DV commit carries dvFiles = [] and stays transparent
        case _ if info.dvFiles.nonEmpty && skipChangeCommits => Nil
        case _ if info.dvFiles.nonEmpty => sys.error(
          s"graft-cow stream: version $v changes deletion vectors, " +
          "rewriting rows an append-only stream cannot represent. " +
          "Stream the change feed or set skipChangeCommits.")
        case _ if info.removed.isEmpty => info.added // metadata-only or pure append
        case k if skipChangeCommits => Nil
        case k => sys.error(
          s"graft-cow stream: version $v is a '$k' commit, which rewrites " +
          "rows an append-only stream cannot represent. Stream the change " +
          "feed (.option(\"readChangeFeed\", \"true\").option(\"keys\", …)) " +
          "or skip such commits (.option(\"skipChangeCommits\", \"true\")).")
      }
    }
    // mapped tables resolve by field id — a reader-only JVM may never have
    // planned through relationFor, so the conf is ensured here too
    if (graft.sources.FileCow.isColumnMapped(schema))
      graft.sources.FileCow.ensureFieldIdConfs(spark)
    // the same fillable/fail-loudly discipline as CdfSource.conformTo: a
    // pinned column that no longer RESOLVES against the BATCH'S END
    // version — by field id on a mapped table (a metadata-only rename
    // keeps the id, so the pinned name keeps reading correctly), by name
    // on a convert-vintage one — was dropped/renamed MID-RUN. Relying on
    // parquet null-padding there would hand the sink real rows with a
    // silently-corrupted column until the restart-time pinnedSchema guard
    // finally fires; fail at the batch that first crosses the drift.
    // A pinned column is VANISHED only when it resolves at NEITHER the
    // batch's END version NOR the current one. Resolvable at `to`: the
    // batch predates the drift — deliverable backlog (including the
    // restart replay of the last checkpointed batch, whose files all
    // still carry the column); the first batch whose end crosses the
    // drop is the one that fails. Resolvable at CURRENT only: the pin
    // ADVANCED across a later widening and this is a pre-widening
    // replay — parquet null-pads the new column, the documented
    // contract (same fillable discipline as CdfSource.conformTo).
    locally {
      val atTo = graft.sources.FileCow.schemaOf(root, to)
      val atCur = graft.sources.FileCow.schemaOf(
        root, graft.sources.FileCow.visibleVersion(root))
      def idOf(f: org.apache.spark.sql.types.StructField): Option[Long] =
        if (f.metadata.contains(graft.sources.FileCow.FieldIdKey))
          Some(f.metadata.getLong(graft.sources.FileCow.FieldIdKey))
        else None
      def resolves(f: org.apache.spark.sql.types.StructField,
          in: org.apache.spark.sql.types.StructType): Boolean = {
        val byId = graft.sources.FileCow.isColumnMapped(schema) &&
          graft.sources.FileCow.isColumnMapped(in)
        if (byId) in.fields.exists(g => idOf(g) == idOf(f))
        else in.fieldNames.contains(f.name)
      }
      // the resolves-at-CURRENT-only escape is honest on a column-mapped
      // table (field ids disambiguate a re-add), but on a by-name table a
      // column dropped before `to` and RE-ADDED later under the same name
      // would pass it and silently null-pad — the exact corruption this
      // guard exists to stop (ADVICE r12). For by-name tables the escape
      // additionally requires the column be genuinely post-`to` widening:
      // no retained version ≤ `to` ever carried the name (a drop + re-add
      // leaves the name in some version ≤ `to`; the pre-retention horizon
      // is unknowable and those versions are behind the stream anyway).
      def postToWidening(f: org.apache.spark.sql.types.StructField): Boolean = {
        if (graft.sources.FileCow.isColumnMapped(schema)) true // ids decide
        else {
          var v = to
          var verdict: Option[Boolean] = None
          while (v >= 1 && verdict.isEmpty) {
            val s =
              try Some(graft.sources.FileCow.schemaOf(root, v))
              catch { case _: Exception => verdict = Some(true); None } // vacuumed horizon
            s.foreach(st => if (st.fieldNames.contains(f.name)) verdict = Some(false))
            v -= 1
          }
          verdict.getOrElse(true)
        }
      }
      val vanished = schema.fields.filterNot(f =>
        resolves(f, atTo) || (resolves(f, atCur) && postToWidening(f)))
      if (vanished.nonEmpty) sys.error("graft-cow stream: column(s) " +
        s"${vanished.map(_.name).mkString(",")} vanished from the table " +
        "mid-run (a drop/rename commit) — the stream cannot keep " +
        "delivering them; restart from a fresh checkpoint")
    }
    val batch =
      if (addedFiles.nonEmpty) spark.read.schema(schema).parquet(addedFiles: _*)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    ratePos.foreach(_.advance(to))
    org.apache.spark.sql.GraftBridge.asStreaming(batch)
  }

  /** The engine's durable-completion signal: batches at or below `end`
    * will never replay, so the vacuum-protection floor may advance. */
  override def commit(end: Offset): Unit =
    CdfSource.registerProtection(metadataPath, root, version(end),
      readsRemoved = false)

  override def stop(): Unit = ()
}
