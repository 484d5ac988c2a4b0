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
object FileCow {

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
  private def withFieldIds(schema: StructType): StructType =
    StructType(schema.fields.zipWithIndex.map { case (f, i) =>
      f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(f.metadata).putLong(FieldIdKey, i + 1L).build())
    })

  /** Attach fresh (never-reused) IDs to `fields`, continuing from the
    * table's high-water mark; returns the stamped fields and the bumped
    * property map to commit alongside them. */
  private def freshFieldIds(root: String, version: Long, schema: StructType,
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
  private val checkpointPos =
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
  private def stripFieldIds(df: DataFrame): DataFrame =
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
      dvFiles: Seq[String] = Nil)

  /** The file-path delta a commit is about to apply, handed to [[commit]]
    * by each DML (which knows it exactly — no diff needed). `txn` is the
    * Delta `txn`-action analog: an (appId, batchId) stamp riding INSIDE
    * the CAS commit, so a streaming writer's idempotence check and its
    * data land atomically — no marker window to crash in. `copied` is
    * COPY INTO's idempotence ledger: the source-file identities this
    * commit ingested, so a re-run skips them (riding the CAS, like txn). */
  private final case class CommitAction(kind: String, added: Seq[String],
      removed: Seq[String], txn: Option[(String, Long)] = None,
      copied: Seq[String] = Nil,
      dvFiles: Seq[String] = Nil)

  private def commitInfoFile(root: String, v: Long): NioPath =
    manifestsDir(root).resolve(s"m$v.commit.json")

  private def propsFile(root: String, v: Long): NioPath =
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

  private val ConstraintPrefix = "graft.constraints."

  /** One mapper for all commit-record IO (thread-safe for read/write once
    * configured; per-call construction is the expensive part). */
  private val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()

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
        strings("added"), strings("removed"), txn, copied, dvFiles))
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

  private def dataDir(root: String): NioPath = Paths.get(root, "_data")
  private def manifestsDir(root: String): NioPath = Paths.get(root, "_manifests")
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
  private def schemaFile(root: String, v: Long): NioPath =
    manifestsDir(root).resolve(s"m$v.schema.json")

  def currentVersion(root: String): Long = TablePointer.current(root)

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
  private def versionMarkers(root: String): Seq[Long] = {
    val dir = manifestsDir(root)
    if (!Files.exists(dir)) Seq.empty
    else {
      val list = Files.list(dir)
      try {
        val it = list.iterator()
        val buf = scala.collection.mutable.Set.empty[Long]
        while (it.hasNext) {
          val name = it.next().getFileName.toString
          if (name.startsWith("m") && name.drop(1).forall(_.isDigit))
            buf += name.drop(1).toLong
          else if (name.startsWith("m") && name.endsWith(".commit.json")) {
            val digits = name.stripPrefix("m").stripSuffix(".commit.json")
            if (digits.nonEmpty && digits.forall(_.isDigit)) buf += digits.toLong
          }
        }
        buf.toSeq.sorted
      } finally list.close()
    }
  }

  /** When version `v` committed: the commit record's filesystem mtime
    * (ATOMIC_MOVE preserves the staging write's time, and commits
    * serialize under the table lock, so mtime order is commit order — the
    * same file-time basis Delta uses). Pre-log versions fall back to the
    * manifest dir's mtime; a checkpoint MATERIALIZED after the fact
    * ([[vacuum]]'s fold-base) never shifts a commit time, because the
    * record's mtime wins while the record lives. */
  private def commitTimeOf(root: String, v: Long): Long = {
    val info = commitInfoFile(root, v)
    if (Files.exists(info)) Files.getLastModifiedTime(info).toMillis
    else Files.getLastModifiedTime(manifestDir(root, v)).toMillis
  }

  /** Latest version committed at or before `epochMs` — Delta's
    * `TIMESTAMP AS OF` resolution; the filter-then-max spelling tolerates
    * any residual same-millisecond ties. */
  def versionAtTimestamp(root: String, epochMs: Long): Long = {
    val eligible = versions(root).filter(commitTimeOf(root, _) <= epochMs)
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
      val commitMs = commitTimeOf(root, v)
      commitInfo(root, v) match {
        // commit-log fast path: the totals AND the operation kind were
        // recorded at commit time — no manifest parquet is opened
        case Some(ci) =>
          Seq((v, commitMs, ci.kind, ci.nFiles, ci.nRows, ci.bytes))
            .toDF("version", "commit_ms", "operation", "n_files", "n_rows", "bytes")
        case None => // pre-log version: aggregate its manifest, kind unknown
          manifest(spark, root, v)
            .agg(count(lit(1)).as("n_files"),
              coalesce(sum("rows"), lit(0L)).as("n_rows"),
              coalesce(sum("bytes"), lit(0L)).as("bytes"))
            .select(lit(v).as("version"), lit(commitMs).as("commit_ms"),
              lit(null).cast("string").as("operation"),
              col("n_files"), col("n_rows"), col("bytes"))
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
    val notNull = schema.fields.filterNot(_.nullable).map(f =>
      s"${ConstraintPrefix}nn_${f.name}" -> s"${f.name} IS NOT NULL").toMap
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
    val v = versionAsOf.getOrElse(currentVersion(srcRoot))
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

  private def clonesDir(root: String): NioPath = Paths.get(root, "_clones")

  private def registerClone(ownerRoot: String, cloneRoot: String): Unit = {
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
  private def cloneReferenced(spark: SparkSession, root: String,
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

  /** Read the current snapshot. */
  def read(spark: SparkSession, root: String): DataFrame =
    readVersion(spark, root, currentVersion(root))

  /** Time travel: snapshot `version`, planned through the manifest — pushed
    * filters on stat columns prune data files at `listFiles` time. If the
    * version carries deletion vectors, they anti-join out here, so EVERY
    * consumer of this read (SQL SELECT, DML base reads, exports) sees only
    * live rows — and only the files that ACTUALLY carry vectors pay the
    * per-row `_metadata` + anti-join tax: the clean files (usually almost
    * all of them) scan through their ordinary vectorized relation and
    * union back in. */
  def readVersion(spark: SparkSession, root: String, version: Long): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val reg = dvRegistryOf(root, version)
    if (reg.isEmpty)
      stripFieldIds(
        classic.baseRelationToDataFrame(relationFor(spark, root, version)))
    else {
      val all = CowManifestCache.rowsOf(spark, root, version)._2
        .map(_.getAs[String]("file")).filter(_.nonEmpty)
        .map(f => f.substring(f.lastIndexOf('/') + 1)).toSet
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
  private def evolvedSchema(root: String, version: Long,
      evolveTo: Option[StructType]): StructType =
    evolvedSchemaAndProps(root, version, evolveTo)._1

  /** [[evolvedSchema]] plus the property override its commit must carry:
    * on a column-mapped table the widening's fresh fields get fresh ids
    * (and the high-water mark bumps) so the table stays uniformly mapped
    * through MERGE … WITH SCHEMA EVOLUTION. */
  private def evolvedSchemaAndProps(root: String, version: Long,
      evolveTo: Option[StructType]): (StructType, Option[Map[String, String]]) =
    evolveTo match {
      case None => (schemaOf(root, version), None)
      case Some(s) =>
        val current = schemaOf(root, version)
        require(s.fields.toSeq.startsWith(current.fields.toSeq),
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
      require(combine != null || source.schema.map(f => (f.name, f.dataType)) ==
          schema.map(f => (f.name, f.dataType)),
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
      commit(spark, root, version, AddedSlice(added), schema,
        CommitAction("merge", addedPaths, affected.toSeq), props = evolvedProps)
      Commit(version + 1, prevFiles - affected.length,
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
      require(df.schema.map(f => (f.name, f.dataType)) ==
          schema.map(f => (f.name, f.dataType)),
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
      commit(spark, root, version, AddedSlice(added), schema,
        CommitAction("append", addedPaths, Nil, txn))
      Commit(version + 1, filesKept = prevFileCount, filesRewritten = 0L,
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
    def rewrite() = rewriteWhere(spark, root, cond, maxRecordsPerFile, "FileCow.delete") {
      (rows, condTrue) => rows.filter(!condTrue)
    }
    if (!useDv) rewrite()
    else try dvDelete(spark, root, cond)
    catch { case _: DvOverflow => rewrite() }
  }

  // ------------------------------------------------------ deletion vectors

  private[graft] val DvEnabledProp = "graft.dv.enabled"
  private[graft] val DvMaxRowsProp = "graft.dv.maxRows"
  private[graft] val DvMaxRowsDefault = 200000L

  /** Full-manifest checkpoint cadence: a checkpoint lands every N delta
    * commits (`graft.checkpoint.interval` table property), bounding a cold
    * JVM's fold chain. Declared HERE, before [[NumericProps]] initializes
    * (object vals initialize in order). */
  private[graft] val CheckpointIntervalProp = "graft.checkpoint.interval"
  private[graft] val CheckpointIntervalDefault = 20L

  private def dvDir(root: String): NioPath = Paths.get(root, "_dv")
  private def dvRegistryFile(root: String, v: Long): NioPath =
    manifestsDir(root).resolve(s"m$v.dv.json")
  private val dvSchema = StructType(Seq(
    org.apache.spark.sql.types.StructField("file",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("row_idx",
      org.apache.spark.sql.types.LongType)))

  /** The DELETION-VECTOR registry at version `v`: data-file BASENAME → the
    * sidecar parquet holding that file's deleted (file, row_idx) rows.
    * Versioned like the manifest (carried forward by [[commit]], entries
    * dropping automatically when their file retires), so time travel and
    * the change feed see each version's exact deleted-row set. Absent file
    * = no vectors. */
  def dvRegistryOf(root: String, v: Long): Map[String, String] = {
    val p = dvRegistryFile(root, v)
    if (!Files.exists(p)) Map.empty
    else {
      val n = jsonMapper.readTree(Files.readAllBytes(p))
      val b = Map.newBuilder[String, String]
      n.properties().forEach(e => b += e.getKey -> e.getValue.asText())
      b.result()
    }
  }

  /** Anti-join a registry's deleted rows out of a parquet-scan frame via
    * the hidden `_metadata` columns — how EVERY read path (snapshot reads,
    * DML base reads, the change feed) applies deletion vectors. The DV
    * side is registry-bounded (≤ `graft.dv.maxRows`), so the join is a
    * broadcast; pushed filters still reach the scan through the left side
    * of the anti-join. */
  private def applyDvRegistry(spark: SparkSession,
      reg: Map[String, String], df: DataFrame): DataFrame =
    if (reg.isEmpty) df
    else {
      val dv = spark.read.schema(dvSchema).parquet(reg.values.toSeq.distinct: _*)
        .select(col("file").as("_g_file"), col("row_idx").as("_g_rid"))
      val cols = df.columns.toSeq
      df.withColumn("_g_file", col("_metadata.file_name"))
        .withColumn("_g_rid", col("_metadata.row_index"))
        .join(broadcast(dv), Seq("_g_file", "_g_rid"), "left_anti")
        .select(cols.map(col): _*)
    }

  /** Read specific data files under `schema` with version `v`'s deletion
    * vectors applied — the base-read every DML shares. */
  private def readFilesWithDv(spark: SparkSession, root: String, v: Long,
      schema: StructType, files: Seq[String]): DataFrame = {
    if (isColumnMapped(schema)) ensureFieldIdConfs(spark)
    if (files.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else applyDvRegistry(spark, dvRegistryOf(root, v),
      spark.read.schema(schema).parquet(files: _*))
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

  private class DvOverflow extends RuntimeException

  /** The DV delete: stats-admit candidate files exactly like the rewrite
    * path, find the LIVE matching rows' (basename, row index) via the
    * hidden metadata columns, fold them into the touched files' standing
    * vectors, and commit kind `delete_dv` with the MANIFEST UNCHANGED —
    * no data file is written or retired. Throws [[DvOverflow]] (before
    * committing anything) when the standing vector count would exceed the
    * cap; [[delete]] then falls back to the materializing rewrite. */
  private def dvDelete(spark: SparkSession, root: String, cond: Column): Commit =
    retrying(root, "FileCow.delete") { version =>
      val schema = schemaOf(root, version)
      val man = manifest(spark, root, version)
      val statsCols = statsColsOf(spark, root, version)
      val dims = statsCols.map(c => c -> ZoneDim(c, s"min_$c", s"max_$c")).toMap
      val condExpr = readVersion(spark, root, version).filter(cond)
        .queryExecution.optimizedPlan.collectFirst {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
        }
      val admission = StatAdmission.admission(condExpr.toSeq, dims)
      val affected = man.filter(admission).select("file")
        .collect().map(_.getString(0)).filter(_.nonEmpty)
      val reg = dvRegistryOf(root, version)
      val condTrue = coalesce(cond, lit(false))
      val prevFiles = CowManifestCache.rowsOf(spark, root, version)._2.length.toLong
      if (affected.isEmpty) {
        commit(spark, root, version, MetadataOnly,
          schema, CommitAction("delete_dv", Nil, Nil), dvRegistry = Some(reg))
        Commit(version + 1, filesKept = prevFiles, 0L, 0L)
      } else {
        import spark.implicits._
        val affectedBase = affected.map(f => f.substring(f.lastIndexOf('/') + 1))
        // `.distinct()`: a file's entries can repeat across stale sidecar
        // copies (each delete writes the touched files' CUMULATIVE rows
        // into a fresh sidecar; older sidecars stay referenced by other
        // files) — dedupe so counts are exact and sidecars never inflate
        val existing =
          (if (reg.isEmpty)
            spark.createDataFrame(spark.sparkContext.emptyRDD[Row], dvSchema)
          else spark.read.schema(dvSchema).parquet(reg.values.toSeq.distinct: _*))
            .distinct()
        // _g_-prefixed join keys, never the user's namespace: a data column
        // named `file` must keep meaning the DATA column in the condition
        val existingKeyed = existing.select(
          col("file").as("_g_file"), col("row_idx").as("_g_rid"))
        if (isColumnMapped(schema)) ensureFieldIdConfs(spark)
        val newDel = spark.read.schema(schema).parquet(affected.toSeq: _*)
          .withColumn("_g_file", col("_metadata.file_name"))
          .withColumn("_g_rid", col("_metadata.row_index"))
          .join(broadcast(existingKeyed), Seq("_g_file", "_g_rid"), "left_anti")
          .filter(condTrue)
          .select(col("_g_file").as("file"), col("_g_rid").as("row_idx"))
        val touchedOld = existing.filter(col("file").isin(affectedBase.toSeq: _*))
        val combined = newDel.unionByName(touchedOld).localCheckpoint()
        val combinedCnt = combined.count()
        val touchedCnt = touchedOld.count()
        if (combinedCnt == touchedCnt) {
          // newDel is empty (disjoint from touchedOld by the anti-join):
          // every targeted row is already in the standing vectors — a
          // replayed DELETE. The registry is UNCHANGED: no fresh sidecar
          // (combined == touchedOld rewritten to a new path would mark a
          // row-identical commit ROW-CHANGING, killing append streams and
          // accumulating redundant sidecars), dvFiles stays empty, the
          // commit is stream-transparent like its no-op rewrite twin.
          commit(spark, root, version, MetadataOnly,
            schema, CommitAction("delete_dv", Nil, Nil), dvRegistry = Some(reg))
          Commit(version + 1, filesKept = prevFiles, 0L, 0L)
        } else {
          val maxRows = numericProp(tableProps(root, version), DvMaxRowsProp)
            .getOrElse(DvMaxRowsDefault)
          val standing = combinedCnt + existing.count() - touchedCnt
          if (standing > maxRows) throw new DvOverflow
          val touchedWithRows =
            combined.select("file").distinct().as[String].collect().toSet
          val reg2 = {
            Files.createDirectories(dvDir(root))
            val out = dvDir(root).resolve(
              s"d-${java.util.UUID.randomUUID().toString.take(12)}.parquet")
            combined.coalesce(1).write.parquet(out.toString)
            (reg -- affectedBase) ++ touchedWithRows.map(_ -> out.toString)
          }
          // dvFiles marks the commit as ROW-CHANGING for the append stream —
          // only when the registry actually changed (a delete matching no
          // live row must stay stream-transparent, like its rewrite twin)
          val dvChanged =
            if (reg2 == reg) Nil
            else affectedBase.toSeq.filter(b => reg.get(b) != reg2.get(b))
          commit(spark, root, version, MetadataOnly,
            schema, CommitAction("delete_dv", Nil, Nil, dvFiles = dvChanged),
            dvRegistry = Some(reg2))
          Commit(version + 1, filesKept = prevFiles, 0L, 0L)
        }
      }
    }

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
      require(df.schema.map(f => (f.name, f.dataType)) ==
          schema.map(f => (f.name, f.dataType)),
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

  private def rewriteWhere(spark: SparkSession, root: String, cond: Column,
      maxRecordsPerFile: Long, what: String)(
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
      val base = readFilesWithDv(spark, root, version, schema, affected.toSeq)
      // same layout discipline as merge: rewritten-file count tracks the
      // touched count, ranges stay disjoint on the lead stats column
      val newData = rewrite(base, condTrue).repartitionByRange(
        math.max(1, affected.length), col(statsCols.head))
      val added = writeDataFiles(spark, root, newData, statsCols, maxRecordsPerFile)
      val addedPaths = filePaths(added)
      commit(spark, root, version, AddedSlice(added), schema,
        CommitAction(what.stripPrefix("FileCow."), addedPaths, affected.toSeq))
      Commit(version + 1, prevFiles - affected.length,
        affected.length.toLong, addedPaths.size.toLong)
    }

  /** COMPACT the table (Delta `OPTIMIZE` / Iceberg rewrite_data_files):
    * rewrite the current rows into `targetFiles` range-partitioned files in
    * ONE commit — a LAYOUT-ONLY change (row set identical, proven by the
    * spec via an EMPTY change feed across the commit), healing the slow
    * file growth streaming merges and out-of-range inserts accrue (G13's
    * planner decides when; this is the mechanism). Old files retire to the
    * manifest history; vacuum reclaims them once their versions expire. */
  def compact(spark: SparkSession, root: String, targetFiles: Int,
      maxRecordsPerFile: Long = 0L): Commit =
    retrying(root, "FileCow.compact") { version =>
      val schema = schemaOf(root, version)
      val statsCols = statsColsOf(spark, root, version)
      val rows = readVersion(spark, root, version)
        .repartitionByRange(math.max(1, targetFiles), col(statsCols.head))
      val retired = filePaths(manifest(spark, root, version))
      val added = writeDataFiles(spark, root, rows, statsCols, maxRecordsPerFile)
      val addedPaths = filePaths(added)
      commit(spark, root, version, AddedSlice(added), schema,
        CommitAction("compact", addedPaths, retired))
      Commit(version + 1, filesKept = 0L, filesRewritten = retired.size.toLong,
        addedPaths.size.toLong)
    }

  /** COPY INTO (Delta's idempotent landing-zone loader): ingest the
    * parquet files under `sourceDir` that have NOT been copied before —
    * each run appends only the directory's NEW files, so a scheduled
    * `COPY INTO` over a landing zone is exactly-once per file with no
    * bookkeeping by the caller. The ledger is the commit log: each
    * copy_into commit records the source identities (path:size) it
    * ingested, riding the CAS like the streaming txn stamp; a re-run
    * folds the retained log and skips. Unlike [[convert]] (which ADOPTS
    * files in place, once, as the table's creation), COPY INTO reads and
    * REWRITES into the table's layout — repeatable, stats-tight, and the
    * landing files stay where they are.
    *
    * Retention caveat (Delta's too): vacuum drops commit records with
    * their versions, so keep retention above the landing zone's
    * reprocessing window or already-loaded files can reload. */
  def copyInto(spark: SparkSession, root: String, sourceDir: String,
      maxRecordsPerFile: Long = 0L): Commit =
    retrying(root, "FileCow.copyInto") { version =>
      val schema = schemaOf(root, version)
      val already: Set[String] = versions(root)
        .flatMap(v => commitInfo(root, v)).flatMap(_.copied).toSet
      val candidates = {
        val dir = Paths.get(sourceDir)
        require(Files.exists(dir), s"COPY INTO: no such directory $sourceDir")
        val list = Files.list(dir)
        try {
          val b = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
          val it = list.iterator()
          while (it.hasNext) {
            val p = it.next()
            val name = p.getFileName.toString
            if (name.endsWith(".parquet") && !name.startsWith(".") && Files.size(p) > 0)
              b += ((p.toString, s"$p:${Files.size(p)}"))
          }
          b.toSeq
        } finally list.close()
      }
      val fresh = candidates.filterNot { case (_, id) => already(id) }
      if (fresh.isEmpty) {
        // nothing new landed: a pure no-op, no version published
        Commit(version, filesKept = manifest(spark, root, version).count(),
          filesRewritten = 0L, filesAdded = 0L)
      } else {
        val incoming = spark.read.parquet(fresh.map(_._1): _*)
        require(incoming.schema.map(f => (f.name, f.dataType)) ==
            schema.map(f => (f.name, f.dataType)),
          s"COPY INTO: source schema ${incoming.schema.simpleString} does not " +
            s"match table schema ${schema.simpleString}")
        val statsCols = statsColsOf(spark, root, version)
        val prevFiles = CowManifestCache.rowsOf(spark, root, version)._2.length.toLong
        val ranged = incoming.repartitionByRange(
          math.max(1, fresh.size), col(statsCols.head))
        val added = writeDataFiles(spark, root, ranged, statsCols, maxRecordsPerFile)
        val addedPaths = filePaths(added)
        commit(spark, root, version, AddedSlice(added), schema,
          CommitAction("copy_into", addedPaths, Nil,
            copied = fresh.map(_._2)))
        Commit(version + 1, filesKept = prevFiles, filesRewritten = 0L,
          filesAdded = addedPaths.size.toLong)
      }
    }

  /** RENAME a column. On a COLUMN-MAPPED table (create-vintage — every
    * field carries a parquet field id) this is a METADATA-ONLY commit:
    * the id is the column's identity, the name is a label, reads resolve
    * by id so no data file is touched — Delta's column-mapping contract,
    * and what turns the old warning label ("the single most expensive
    * statement in the SQL surface at 100 TB") into a constant-time one.
    * The manifest's min_/max_ stat columns and the Bloom declaration
    * follow the new name in the same commit; old versions keep
    * time-traveling under their own names (each version's schema file is
    * immutable). On a LEGACY table (convert-vintage — adopted files carry
    * no ids) the honest full rewrite remains, Delta-without-mapping's
    * contract. Either way a column a CHECK constraint references cannot
    * be renamed (drop it first — the stored predicate text would
    * silently stop matching). */
  def renameColumn(spark: SparkSession, root: String, from: String,
      to: String, maxRecordsPerFile: Long = 0L): Commit =
    retrying(root, "FileCow.renameColumn") { version =>
      val schema = schemaOf(root, version)
      val byLower = schema.fieldNames.map(n => n.toLowerCase -> n).toMap
      val resolved = byLower.getOrElse(from.toLowerCase,
        sys.error(s"rename column $from: no such column " +
          s"(have: ${schema.fieldNames.mkString(",")})"))
      require(!byLower.contains(to.toLowerCase), s"column $to already exists")
      constraintsOf(root, version).foreach { case (cname, sql) =>
        val refs = spark.sessionState.sqlParser.parseExpression(sql).collect {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
            a.name.toLowerCase
        }.toSet
        require(!refs.contains(resolved.toLowerCase),
          s"cannot rename $resolved: CHECK constraint $cname ($sql) " +
            "references it — DROP CONSTRAINT first")
      }
      val newSchema = StructType(schema.fields.map(f =>
        if (f.name == resolved) f.copy(name = to) else f))
      if (isColumnMapped(schema)) {
        // a metadata-only rename keeps every data file LIVE, so stale
        // `bloom_<to>` bytes in old slices (from a previously dropped or
        // renamed-away column of that name) would become probe-reachable
        // for the WRONG column — a wrong skip loses rows. Refuse loudly;
        // the legacy rewrite path retires all sketched files, so only the
        // mapped path carries this hazard.
        require(!BloomStore.historicalNames(root).contains(to),
          s"cannot rename to '$to': the Bloom index once keyed sketches " +
            "by that name and old slices still reference live files — " +
            "pick another name, or OPTIMIZE (rewrite) then VACUUM first")
        // metadata-only: the files keep their footers' ids; only the label
        // moves. Stats columns follow the name in the same commit.
        val man = manifest(spark, root, version)
        val nFiles = CowManifestCache.rowsOf(spark, root, version)._2.length.toLong
        val renamedMan = man
          .withColumnRenamed(s"min_$resolved", s"min_$to")
          .withColumnRenamed(s"max_$resolved", s"max_$to")
        // the MANIFEST schema changes with the rename (min_/max_ names) —
        // a delta fold cannot cross that, so the commit checkpoints
        commit(spark, root, version, FullManifest(renamedMan), newSchema,
          CommitAction("rename_column", Nil, Nil))
        // the Bloom declaration/alias remap lands only AFTER the commit
        // wins its CAS: a losing attempt must not leave the index keyed by
        // a name the table never adopted (probes for that name would stay
        // silently disabled and the stale alias entries would trip
        // spurious recycled-name refusals later). The crash window between
        // the swap and this remap fails SAFE: the new name is undeclared,
        // so its probes simply don't skip until a later rename/backfill.
        BloomStore.renameColumn(root, resolved, to)
        Commit(version + 1, filesKept = nFiles, filesRewritten = 0L,
          filesAdded = 0L)
      } else {
        val statsCols = statsColsOf(spark, root, version)
          .map(c => if (c == resolved) to else c)
        val nFiles = manifest(spark, root, version).count().toInt
        val rows = readVersion(spark, root, version)
          .withColumnRenamed(resolved, to)
          .repartitionByRange(math.max(1, nFiles), col(statsCols.head))
        val retired = filePaths(manifest(spark, root, version))
        // the bloom index follows the rename, like the stats columns do.
        // The rewrite sketches under the NEW name via the explicit
        // override (pre-rename slices read as null → admit, sound), but
        // the declaration itself remaps only after the commit wins its
        // CAS — a losing attempt must not leave the store renamed ahead
        // of a table that kept the old column.
        val renamedBlooms = BloomStore.columns(root)
          .map(c => if (c == resolved) to else c)
        val added = writeDataFiles(spark, root, rows, statsCols, maxRecordsPerFile,
          bloomColsOverride = Some(renamedBlooms))
        val addedPaths = filePaths(added)
        // the MANIFEST schema changes with the rename (min_/max_ names) —
        // a delta fold cannot cross that, so the commit checkpoints
        commit(spark, root, version, FullManifest(added), newSchema,
          CommitAction("rename_column", addedPaths, retired))
        BloomStore.renameColumn(root, resolved, to)
        Commit(version + 1, filesKept = 0L, filesRewritten = retired.size.toLong,
          addedPaths.size.toLong)
      }
    }

  /** PREDICATE-SCOPED COMPACTION (Delta `OPTIMIZE … WHERE`): rewrite only
    * the files whose stats ADMIT `cond` into `targetFiles` files — the
    * 100 TB shape where yesterday's hot range gets healed without
    * touching the cold archive. The predicate scopes FILE SELECTION, not
    * rows (Delta's contract): every row of an admitted file survives, so
    * the commit is layout-only like [[compact]] (kind "compact" — the
    * table stream and CDF treat it row-neutral). Mirroring Delta's
    * partition-column restriction, every column in `cond` must be a
    * STATS column — otherwise admission would silently degrade to
    * rewrite-everything, and a loud error beats that. */
  def compactWhere(spark: SparkSession, root: String, targetFiles: Int,
      cond: Column, maxRecordsPerFile: Long = 0L): Commit =
    retrying(root, "FileCow.compactWhere") { version =>
      val schema = schemaOf(root, version)
      val statsCols = statsColsOf(spark, root, version)
      val man = manifest(spark, root, version)
      val dims = statsCols.map(c => c -> ZoneDim(c, s"min_$c", s"max_$c")).toMap
      val condExpr = readVersion(spark, root, version).filter(cond)
        .queryExecution.optimizedPlan.collectFirst {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
        }
      condExpr.foreach { e =>
        val refs = e.collect {
          case a: org.apache.spark.sql.catalyst.expressions.AttributeReference => a.name
        }.distinct
        val nonStats = refs.filterNot(statsCols.contains)
        require(nonStats.isEmpty, s"OPTIMIZE WHERE references non-stats " +
          s"column(s) ${nonStats.mkString(",")} — admission would degrade to " +
          s"a full rewrite (stats columns: ${statsCols.mkString(",")})")
      }
      val admission = StatAdmission.admission(condExpr.toSeq, dims)
      val affected = man.filter(admission).select("file")
        .collect().map(_.getString(0))
      if (affected.length <= 1) {
        // nothing to heal: zero or one file in scope — no commit
        Commit(version, filesKept = man.count(), filesRewritten = 0L, filesAdded = 0L)
      } else {
        val prevFiles = CowManifestCache.rowsOf(spark, root, version)._2.length.toLong
        val rows = readFilesWithDv(spark, root, version, schema, affected.toSeq)
          .repartitionByRange(math.max(1, targetFiles), col(statsCols.head))
        val added = writeDataFiles(spark, root, rows, statsCols, maxRecordsPerFile,
          declaredSchema = Some(schema))
        val addedPaths = filePaths(added)
        commit(spark, root, version, AddedSlice(added), schema,
          CommitAction("compact", addedPaths, affected.toSeq))
        Commit(version + 1, filesKept = prevFiles - affected.length,
          filesRewritten = affected.length.toLong,
          filesAdded = addedPaths.size.toLong)
      }
    }

  /** RESTORE the table to retained `toVersion` (Delta `RESTORE TABLE`):
    * ONE new commit whose manifest and schema are the target version's —
    * no data file is read or written; the restored snapshot SHARES every
    * file with the target by path, so the commit is metadata-sized and the
    * change feed across it (log-recorded added/removed = the manifest
    * delta) is exactly the rows the rewind undoes. History is preserved —
    * restore moves FORWARD to a new version that happens to equal an old
    * one, so the mistake and its correction both stay auditable (and
    * time-travelable) until vacuum retires them. */
  def restore(spark: SparkSession, root: String, toVersion: Long): Commit =
    retrying(root, "FileCow.restore") { version =>
      require(toVersion != version,
        s"restore target v$toVersion is already the current version")
      require(isRetained(root, toVersion),
        s"version $toVersion is not retained under $root — vacuumed history " +
          "cannot be restored")
      val target = manifest(spark, root, toVersion)
      val current = manifest(spark, root, version)
      val added = target.join(current, Seq("file"), "left_anti")
      val removed = current.join(target, Seq("file"), "left_anti")
      val addedPaths = filePaths(added)
      val removedPaths = filePaths(removed)
      // a restore rewinds the DV state too: the target version's registry
      // (its exact deleted-row set) becomes the new version's. dvFiles
      // marks a DV-only rewind (identical file set, rows re-appearing) as
      // row-changing so the append stream can never silently pass it.
      val regCur = dvRegistryOf(root, version)
      val regTgt = dvRegistryOf(root, toVersion)
      val dvChanged = (regCur.keySet ++ regTgt.keySet)
        .filter(b => regCur.get(b) != regTgt.get(b)).toSeq
      // restoring across a stats-column change (the target's manifest has
      // different columns) cannot fold as a delta — checkpoint it
      val delta =
        if (target.columns.toSeq == current.columns.toSeq) AddedSlice(added)
        else FullManifest(target)
      commit(spark, root, version, delta, schemaOf(root, toVersion),
        CommitAction("restore", addedPaths, removedPaths,
          dvFiles = dvChanged),
        dvRegistry = Some(regTgt))
      Commit(version + 1,
        filesKept = target.count() - addedPaths.size,
        filesRewritten = removedPaths.size.toLong,
        filesAdded = addedPaths.size.toLong)
    }

  /** COMPACT with Z-ORDER clustering — Delta's `OPTIMIZE … ZORDER BY` on
    * the cow layout: rewrite the current rows ordered by the 16-bit Morton
    * interleave of `colA`/`colB` (G12's grid) into `targetFiles` files, so
    * each file covers a roughly-square REGION of the (a, b) plane and the
    * manifest's per-file [min, max] — which this table ALREADY tracks for
    * every stats column — turns tight in BOTH dimensions. After this one
    * layout-only commit, a box predicate prunes to O(files touching the
    * box) through the ordinary [[CowFileIndex]] admission; a linear layout
    * prunes only its lead dimension. The Morton key never persists — it
    * exists to order the shuffle; pruning stays the stats-column interval
    * intersection.
    *
    * Both columns must be integer-valued stats columns (map dates through
    * datediff upstream): without manifest stats the clustering would buy
    * no pruning, which is a misuse worth failing loudly. */
  def compactZOrder(spark: SparkSession, root: String, targetFiles: Int,
      colA: String, colB: String, maxRecordsPerFile: Long = 0L): Commit =
    retrying(root, "FileCow.compactZOrder") { version =>
      val schema = schemaOf(root, version)
      val statsCols = statsColsOf(spark, root, version)
      Seq(colA, colB).foreach { c =>
        require(statsCols.contains(c), s"ZORDER BY $c: not a stats column " +
          s"(tracked: ${statsCols.mkString(",")}) — clustering without " +
          "per-file stats cannot prune")
        import org.apache.spark.sql.types._
        val ok = schema(c).dataType match {
          case ByteType | ShortType | IntegerType | LongType | DateType => true
          case _ => false
        }
        require(ok, s"ZORDER BY $c: not an integer/date column " +
          s"(${schema(c).dataType.simpleString}) — the Morton grid needs " +
          "integer coordinates (map other types upstream)")
      }
      val rows = readVersion(spark, root, version)
      val r = rows.agg(min(col(colA)).cast("long"), max(col(colA)).cast("long"),
        min(col(colB)).cast("long"), max(col(colB)).cast("long")).head()
      val ordered =
        if (r.isNullAt(0)) rows // empty table: nothing to cluster
        else rows.withColumn("_zkey", Sources.morton16(
            Sources.norm16(col(colA), r.getLong(0), r.getLong(1)),
            Sources.norm16(col(colB), r.getLong(2), r.getLong(3))))
          .repartitionByRange(math.max(1, targetFiles), col("_zkey"))
          .sortWithinPartitions("_zkey")
          .drop("_zkey")
      val retired = filePaths(manifest(spark, root, version))
      val added = writeDataFiles(spark, root, ordered, statsCols, maxRecordsPerFile)
      val addedPaths = filePaths(added)
      commit(spark, root, version, AddedSlice(added), schema,
        CommitAction("zorder", addedPaths, retired))
      Commit(version + 1, filesKept = 0L, filesRewritten = retired.size.toLong,
        addedPaths.size.toLong)
    }

  /** SCHEMA EVOLUTION: add a column (Delta/Iceberg `ALTER TABLE ADD
    * COLUMN`) as a METADATA-ONLY commit — no data file is touched; the new
    * manifest carries the same files and the new schema, and readers
    * surface the column as typed NULLs for every pre-evolution file
    * (parquet's missing-column contract under an explicit read schema,
    * G6's rule). Later DML writes the column for the files it rewrites. */
  def addColumn(spark: SparkSession, root: String,
      field: org.apache.spark.sql.types.StructField): Commit =
    addColumns(spark, root, Seq(field))

  /** Multi-column [[addColumn]] as ONE commit (one `ALTER TABLE … ADD
    * COLUMNS` statement = one snapshot, the Delta/Iceberg contract). */
  def addColumns(spark: SparkSession, root: String,
      fields: Seq[org.apache.spark.sql.types.StructField]): Commit =
    retrying(root, "FileCow.addColumns") { version =>
      val schema = schemaOf(root, version)
      val existing = schema.fieldNames.map(_.toLowerCase).toSet
      fields.foreach { f =>
        require(!existing.contains(f.name.toLowerCase),
          s"column ${f.name} already exists")
        require(f.nullable, s"added column ${f.name} must be nullable " +
          "(existing files cannot carry values for it)")
      }
      require(fields.map(_.name.toLowerCase).distinct.size == fields.size,
        "duplicate column names in one ADD COLUMNS")
      val prevFiles = CowManifestCache.rowsOf(spark, root, version)._2.length.toLong
      // column-mapped tables stamp FRESH ids from the high-water mark —
      // a re-added name can never resolve to a dropped column's old values
      val (stamped, props) =
        if (isColumnMapped(schema)) {
          val (fs, ps) = freshFieldIds(root, version, schema, fields)
          (fs, Some(ps))
        } else (fields, None)
      commit(spark, root, version, MetadataOnly, StructType(schema.fields ++ stamped),
        CommitAction("add_columns", Nil, Nil), props = props)
      Commit(version + 1, filesKept = prevFiles, filesRewritten = 0L, filesAdded = 0L)
    }

  /** SET TBLPROPERTIES: merge `kv` into the table's property map in ONE
    * metadata-only commit (manifest and schema unchanged). */
  /** Keys whose values must parse as positive longs — validated HERE,
    * loudly, so a typo'd sizing property can never brick later writes
    * (write-time parsing additionally falls back to defaults). */
  private val NumericProps =
    Set("graft.bloom.items", "graft.bloom.bits", DvMaxRowsProp,
      CheckpointIntervalProp)

  def setTableProperties(spark: SparkSession, root: String,
      kv: Map[String, String]): Commit =
    retrying(root, "FileCow.setTableProperties") { version =>
      kv.foreach { case (k, v) =>
        if (NumericProps.contains(k))
          require(scala.util.Try(v.trim.toLong).toOption.exists(_ > 0L),
            s"table property $k must be a positive integer, got '$v'")
      }
      val prevFiles = CowManifestCache.rowsOf(spark, root, version)._2.length.toLong
      commit(spark, root, version, MetadataOnly, schemaOf(root, version),
        CommitAction("set_properties", Nil, Nil),
        props = Some(tableProps(root, version) ++ kv))
      Commit(version + 1, filesKept = prevFiles, 0L, 0L)
    }

  /** UNSET TBLPROPERTIES: remove `keys` in ONE metadata-only commit. */
  def unsetTableProperties(spark: SparkSession, root: String,
      keys: Seq[String]): Commit =
    retrying(root, "FileCow.unsetTableProperties") { version =>
      val prevFiles = CowManifestCache.rowsOf(spark, root, version)._2.length.toLong
      commit(spark, root, version, MetadataOnly, schemaOf(root, version),
        CommitAction("unset_properties", Nil, Nil),
        props = Some(tableProps(root, version) -- keys))
      Commit(version + 1, filesKept = prevFiles, 0L, 0L)
    }

  /** ADD a CHECK constraint (Delta `ALTER TABLE … ADD CONSTRAINT name
    * CHECK (expr)`): validates the EXISTING rows first (one scan — the
    * Delta contract: a constraint admits no standing violation), then one
    * metadata-only commit stores the predicate under
    * `graft.constraints.<name>`. From that commit on, every data-writing
    * commit enforces it on the rows it writes, folded into the per-file
    * stats scan (zero extra passes); a violating write aborts BEFORE the
    * CAS, leaving only orphan staging files (vacuum's job), never rows.
    * SQL CHECK semantics: NULL passes, only FALSE violates. */
  def addConstraint(spark: SparkSession, root: String, name: String,
      constraintSql: String): Commit =
    retrying(root, "FileCow.addConstraint") { version =>
      val key = ConstraintPrefix + name
      require(!tableProps(root, version).contains(key),
        s"constraint $name already exists")
      val standing = readVersion(spark, root, version)
        .filter(!coalesce(expr(constraintSql), lit(true))).count()
      require(standing == 0L, s"cannot add CHECK constraint $name " +
        s"($constraintSql): $standing existing row(s) violate it")
      val prevFiles = CowManifestCache.rowsOf(spark, root, version)._2.length.toLong
      commit(spark, root, version, MetadataOnly, schemaOf(root, version),
        CommitAction("add_constraint", Nil, Nil),
        props = Some(tableProps(root, version) + (key -> constraintSql)))
      Commit(version + 1, filesKept = prevFiles, 0L, 0L)
    }

  /** DROP a CHECK constraint in ONE metadata-only commit. */
  def dropConstraint(spark: SparkSession, root: String, name: String): Commit =
    retrying(root, "FileCow.dropConstraint") { version =>
      val key = ConstraintPrefix + name
      require(tableProps(root, version).contains(key),
        s"constraint $name does not exist")
      val prevFiles = CowManifestCache.rowsOf(spark, root, version)._2.length.toLong
      commit(spark, root, version, MetadataOnly, schemaOf(root, version),
        CommitAction("drop_constraint", Nil, Nil),
        props = Some(tableProps(root, version) - key))
      Commit(version + 1, filesKept = prevFiles, 0L, 0L)
    }

  /** SCHEMA EVOLUTION, subtractive: drop columns in ONE metadata-only
    * commit — no data file is touched; the new schema omits the columns,
    * and every read (explicit read schema) simply stops projecting them
    * from old files (parquet's read-by-name contract — the same mechanism
    * that serves [[addColumns]]' typed NULLs, in reverse). Later DML
    * rewrites its touched files without the columns; pre-drop versions
    * still time-travel with them.
    *
    * A dropped STATS column also leaves the manifest (its min/max columns
    * are projected out — manifests are file-count-sized, so the rewrite is
    * metadata-cost); at least one stats column must survive, because every
    * rewrite range-partitions on the lead stats column. */
  def dropColumns(spark: SparkSession, root: String, names: Seq[String]): Commit =
    retrying(root, "FileCow.dropColumns") { version =>
      val schema = schemaOf(root, version)
      val byLower = schema.fieldNames.map(n => n.toLowerCase -> n).toMap
      val resolved = names.map { n =>
        byLower.getOrElse(n.toLowerCase,
          sys.error(s"drop column $n: no such column " +
            s"(have: ${schema.fieldNames.mkString(",")})"))
      }
      require(resolved.distinct.size == resolved.size,
        "duplicate column names in one DROP COLUMNS")
      require(resolved.size < schema.size, "cannot drop every column")
      val statsCols = statsColsOf(spark, root, version)
      val remainingStats = statsCols.filterNot(resolved.contains)
      require(remainingStats.nonEmpty,
        s"dropping ${resolved.mkString(",")} would leave no stats column — " +
          "every DML rewrite range-partitions on the lead stats column")
      // a CHECK constraint over a dropped column could never be enforced
      // again; make the dependency loud (drop the constraint first).
      // parseExpression, not expr(): a Spark 4 Column holds the raw SQL
      // unparsed until analysis, so its tree carries no attributes yet.
      constraintsOf(root, version).foreach { case (cname, sql) =>
        val refs = spark.sessionState.sqlParser.parseExpression(sql).collect {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
            a.name.toLowerCase
        }.toSet
        val hit = resolved.filter(r => refs.contains(r.toLowerCase))
        require(hit.isEmpty, s"cannot drop column(s) ${hit.mkString(",")}: " +
          s"CHECK constraint $cname ($sql) references them — DROP CONSTRAINT first")
      }
      val man = manifest(spark, root, version)
      val prevFiles = CowManifestCache.rowsOf(spark, root, version)._2.length.toLong
      val keepManCols = man.columns.filterNot(c =>
        resolved.exists(r => c == s"min_$r" || c == s"max_$r"))
      val newSchema = StructType(schema.fields.filterNot(f => resolved.contains(f.name)))
      // dropping a stats column changes the MANIFEST schema — a delta fold
      // cannot cross that, so the (file-count-sized) commit checkpoints
      commit(spark, root, version,
        FullManifest(man.select(keepManCols.map(col).toSeq: _*)), newSchema,
        CommitAction("drop_columns", Nil, Nil))
      // the bloom declaration drops (and its tombstones land) only after
      // the commit wins its CAS — same post-commit discipline as rename:
      // a losing attempt must not leave the index dropped ahead of a
      // table that kept the column
      BloomStore.dropColumns(root, resolved)
      Commit(version + 1, filesKept = prevFiles, filesRewritten = 0L, filesAdded = 0L)
    }

  /** G17's change data feed, INCREMENTALLY: snapshots share unchanged files
    * by path, and a key in a shared file is (by key-uniqueness) identical in
    * both versions — so the diff only scans each side's UNSHARED files.
    * Cost ∝ changed data + file count, never table size; the emitted rows
    * are bit-identical to [[Versioned.changesBetween]]'s full-diff contract
    * (same shared [[Versioned.diff]] core). */
  def changesBetween(spark: SparkSession, root: String, keys: Seq[String],
      fromVersion: Long, toVersion: Long): DataFrame = {
    val sa = schemaOf(root, fromVersion)
    val sb = schemaOf(root, toVersion)
    // both sides' file reads must resolve by field id on mapped tables —
    // a fresh reader-only JVM may never have planned through relationFor
    if (isColumnMapped(sb) || isColumnMapped(sa)) ensureFieldIdConfs(spark)
    // A rename_column commit inside the interval is a FULL rewrite whose
    // pre-side files carry the OLD name — reading them under the end
    // schema would project the renamed column as NULL and report every row
    // as an update with a NULL pre-image, while the table stream
    // classifies rename_column row-neutral. Recover each rename's mapping
    // from the schema pair it committed between (positional — a rename
    // changes exactly one name, never order or count), compose over the
    // interval, and read the A side under its OWN names before aliasing
    // to the end schema: a pure rename then feeds EMPTY, consistent.
    val renameSteps: Seq[Map[String, String]] = // per commit: new -> old
      ((fromVersion + 1) to toVersion).flatMap { v =>
        commitInfo(root, v) match {
          case Some(ci) if ci.kind == "rename_column" =>
            val pre = schemaOf(root, v - 1)
            val post = schemaOf(root, v)
            Some(post.fields.zip(pre.fields).collect {
              case (n, o) if n.name != o.name => n.name -> o.name
            }.toMap)
          case _ => None
        }
      }
    // end-version name -> that column's name AT fromVersion
    val backName0: Map[String, String] = sb.fieldNames.map { n =>
      n -> renameSteps.reverseIterator.foldLeft(n)((cur, m) => m.getOrElse(cur, cur))
    }.toMap
    // RENAME a->b then ADD COLUMNS (a) inside one interval: the RE-ADDED
    // column maps IDENTITY onto a name another column renamed away from.
    // It cannot have existed at fromVersion (the name then belonged to the
    // renamed column), so keeping its mapping would read the OLD column's
    // values as the NEW one's pre-image AND duplicate the A-side read
    // schema (an analysis error at best, silent conflation on legacy
    // tables). Drop identity colliders from the map — the A side then
    // null-fills them, exactly what "absent at fromVersion" means. Two
    // STEP-mapped names colliding would mean a non-injective rename chain,
    // which single-column renames cannot produce — fail loudly if seen.
    val collided: Set[String] = backName0.groupBy(_._2).valuesIterator
      .filter(_.size > 1).flatMap { grp =>
        val (identityMapped, stepped) = grp.keys.partition(n => backName0(n) == n)
        require(stepped.size <= 1, s"change feed: rename chain maps " +
          s"${stepped.mkString(",")} to one v$fromVersion column — corrupt history")
        identityMapped
      }.toSet
    val backName: Map[String, String] = backName0 -- collided
    // Both sides surface the END version's schema: parquet projection pads
    // columns added since `fromVersion` with null and drops ones removed —
    // the same contract as batch reads across addColumns/dropColumns, and it
    // lets the feed cross a metadata-only schema-evolution commit (whose
    // correct feed is empty) instead of failing on it. Keys must exist at
    // both endpoints (under the A side's own name) or the diff join would
    // compare nulls.
    keys.foreach { k =>
      require(!collided.contains(k),
        s"change feed key '$k' was re-added inside (v$fromVersion, " +
        s"v$toVersion] after a rename took its old identity away — the key " +
        "has no values at the interval start; diff a narrower interval")
      require(sb.fieldNames.contains(k) &&
          sa.fieldNames.contains(backName.getOrElse(k, k)),
        s"change feed key '$k' must exist at both v$fromVersion " +
        s"(${sa.fieldNames.mkString(",")}) and v$toVersion " +
        s"(${sb.fieldNames.mkString(",")})")
    }
    val (onlyA, onlyB) = unsharedFiles(spark, root, fromVersion, toVersion)
    val regA = dvRegistryOf(root, fromVersion)
    val regB = dvRegistryOf(root, toVersion)
    // each side reads under ITS version's deletion vectors: a row deleted
    // before `fromVersion` is not a delete of this interval, and a row
    // DV-deleted in a brand-new file must not feed as an insert
    def readFiles(fs: Seq[String], reg: Map[String, String]): DataFrame =
      if (fs.nonEmpty) applyDvRegistry(spark, reg,
        spark.read.schema(sb).parquet(fs: _*))
      else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], sb)
    // the A side, read under its version's names then aliased to the end
    // schema (identity when the interval crosses no rename)
    def readFilesA(fs: Seq[String]): DataFrame =
      if (renameSteps.isEmpty) readFiles(fs, regA)
      else if (fs.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], sb)
      else {
        val readSchema = StructType(sb.fields.toSeq.flatMap { f =>
          backName.get(f.name).flatMap(g => sa.fields.find(_.name == g))
        })
        applyDvRegistry(spark, regA,
          spark.read.schema(readSchema).parquet(fs: _*))
          .select(sb.map { f =>
            backName.get(f.name).filter(readSchema.fieldNames.contains) match {
              case Some(g) => col(g).cast(f.dataType).as(f.name)
              case None => lit(null).cast(f.dataType).as(f.name)
            }
          }: _*)
      }
    def tagged(df: DataFrame, tag: String): DataFrame =
      df.select(lit(tag).as("_change_type") +: sb.map(f => col(f.name)): _*)
    // One-sided short-circuit: an append-only interval retires no files, so
    // under the key-uniqueness contract every row in the new files is an
    // insert — the feed is a scan + tag, NO join, NO shuffle (ditto a pure
    // retire interval: all deletes). This is what makes streaming an
    // append-heavy table's feed (F19/F20) cost O(new data) with no
    // exchange at all; the diff join remains for genuinely mixed commits.
    val base: Option[DataFrame] =
      if (onlyA.isEmpty && onlyB.isEmpty) None
      else if (onlyA.isEmpty) Some(tagged(readFiles(onlyB, regB), "insert"))
      else if (onlyB.isEmpty) Some(tagged(readFilesA(onlyA), "delete"))
      else Some(Versioned.diff(readFilesA(onlyA), readFiles(onlyB, regB), keys))
    // DV deltas on files SHARED by both endpoints: a file whose vector
    // grew inside the interval feeds the newly-deleted rows as deletes
    // (and a restore that shrank a vector feeds the re-appeared rows as
    // inserts) — without this, a DV delete would be invisible to the feed
    // because the file set did not change.
    val dvParts: Seq[DataFrame] =
      if (regA.isEmpty && regB.isEmpty) Nil
      else {
        val unsharedBase = (onlyA ++ onlyB)
          .map(f => f.substring(f.lastIndexOf('/') + 1)).toSet
        val changed = (regA.keySet ++ regB.keySet)
          .filter(b => regA.get(b) != regB.get(b))
          .filterNot(unsharedBase)
        if (changed.isEmpty) Nil
        else {
          val pathOf = CowManifestCache.rowsOf(spark, root, toVersion)._2
            .map(_.getAs[String]("file")).filter(_.nonEmpty)
            .map(f => f.substring(f.lastIndexOf('/') + 1) -> f).toMap
          val paths = changed.toSeq.flatMap(pathOf.get)
          def dvRows(reg: Map[String, String]): DataFrame = {
            val ps = reg.filter { case (b, _) => changed(b) }.values.toSeq.distinct
            if (ps.isEmpty)
              spark.createDataFrame(spark.sparkContext.emptyRDD[Row], dvSchema)
            else spark.read.schema(dvSchema).parquet(ps: _*)
              .filter(col("file").isin(changed.toSeq: _*))
          }
          val aRows = dvRows(regA)
          val bRows = dvRows(regB)
          def deltaRows(side: DataFrame, other: DataFrame, tag: String): DataFrame = {
            val delta = side.join(other, Seq("file", "row_idx"), "left_anti")
              .select(col("file").as("_g_file"), col("row_idx").as("_g_rid"))
            tagged(spark.read.schema(sb).parquet(paths: _*)
              .withColumn("_g_file", col("_metadata.file_name"))
              .withColumn("_g_rid", col("_metadata.row_index"))
              .join(broadcast(delta), Seq("_g_file", "_g_rid"), "left_semi")
              .select(sb.map(f => col(f.name)): _*), tag)
          }
          Seq(deltaRows(bRows, aRows, "delete"), deltaRows(aRows, bRows, "insert"))
        }
      }
    val parts = base.toSeq ++ dvParts
    if (parts.isEmpty) tagged(readFiles(Nil, Map.empty), "insert")
    else parts.reduce(_ unionByName _)
  }

  /** Each side's files the versions do NOT share — preferably by FOLDING
    * the commit log over (from, to] (no manifest is opened). The fold is
    * SEQUENTIAL per commit, not two global sets: RESTORE re-adds previously
    * removed paths, so a path can be removed at v and re-added at v+k within
    * one interval — order-insensitive set differences would put it in
    * neither side and silently miss its rows. The net presence delta is
    * exact under write-once paths: a removal cancels a pending add (the
    * file lived and died inside the interval), a re-add cancels a pending
    * removal (present at both endpoints with identical bytes). Any missing
    * record (pre-log table) falls back to the manifest anti-join — the
    * state-diff answer is always available. */
  private def unsharedFiles(spark: SparkSession, root: String,
      fromVersion: Long, toVersion: Long): (Seq[String], Seq[String]) = {
    val infos = ((fromVersion + 1) to toVersion).map(v => commitInfo(root, v))
    if (infos.nonEmpty && infos.forall(_.isDefined)) {
      val addedNet = scala.collection.mutable.LinkedHashSet.empty[String]
      val removedNet = scala.collection.mutable.LinkedHashSet.empty[String]
      infos.foreach { i =>
        i.get.removed.foreach { f => if (!addedNet.remove(f)) removedNet += f }
        i.get.added.foreach { f => if (!removedNet.remove(f)) addedNet += f }
      }
      (removedNet.toSeq, addedNet.toSeq)
    } else {
      val manA = manifest(spark, root, fromVersion).select("file")
      val manB = manifest(spark, root, toVersion).select("file")
      (manA.join(manB, Seq("file"), "left_anti").collect().map(_.getString(0)).toSeq,
        manB.join(manA, Seq("file"), "left_anti").collect().map(_.getString(0)).toSeq)
    }
  }

  /** Reference-counted vacuum: drop manifests older than the newest `keep`,
    * then delete every `_data` file no RETAINED manifest names — which also
    * reclaims orphans from lost commit races. Returns deleted file paths.
    *
    * `minAgeMs` is the Delta VACUUM retention contract, and it exists for a
    * REAL race: an in-flight commit's fresh data files are unreferenced
    * until its manifest wins the CAS, so a concurrent vacuum with no age
    * floor would delete them out from under the commit. With writers
    * possibly active, pass an age comfortably above the longest in-flight
    * commit (Delta defaults to 7 days for the same reason); 0 is safe only
    * when the caller knows no commit is in flight. */
  /** What [[vacuum]] WOULD delete, without deleting — the `DRY RUN` ops
    * surface: (file, bytes, age-ms) of every `_data` file that is
    * unreferenced by the manifests a `keep`-retention vacuum would retain
    * AND old enough to clear `minAgeMs`. Pure metadata (manifest reads +
    * one directory listing); the table is untouched. */
  def vacuumPlan(spark: SparkSession, root: String, keep: Int,
      minAgeMs: Long = 0L): Seq[(String, Long, Long)] = {
    val retained = versions(root).takeRight(math.max(keep, 1))
    val referenced: Set[String] =
      (if (retained.isEmpty) Set.empty[String]
       else retained.map(v => manifest(spark, root, v).select("file"))
         .reduce(_ unionByName _).distinct()
         .collect().map(_.getString(0)).toSet) ++
      cloneReferenced(spark, root, pruneDead = false, minAgeMs)
    val dir = dataDir(root)
    if (!Files.exists(dir)) return Seq.empty
    val list = Files.list(dir)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    try {
      val now = System.currentTimeMillis()
      val it = list.iterator()
      while (it.hasNext) {
        val p = it.next()
        mtimeOf(p).map(now - _).foreach { age =>
          if (!referenced.contains(p.toString) && age >= minAgeMs)
            out += ((p.toString, Files.size(p), age))
        }
      }
    } finally list.close()
    out.toSeq
  }

  def vacuum(spark: SparkSession, root: String, keep: Int,
      minAgeMs: Long = 0L): Seq[String] = {
    val all = versions(root)
    val retained = all.takeRight(math.max(keep, 1))
    val dropped = all.filterNot(retained.contains)
    // the new oldest retained version must survive its fold base dropping:
    // materialize its full manifest BEFORE any predecessor goes
    if (dropped.nonEmpty) retained.headOption.foreach { v =>
      ensureCheckpoint(spark, root, v)
    }
    dropped.foreach { v =>
      deleteTree(manifestDir(root, v))
      deleteTree(manifestDeltaDir(root, v))
      Files.deleteIfExists(schemaFile(root, v))
      Files.deleteIfExists(commitInfoFile(root, v))
      Files.deleteIfExists(propsFile(root, v))
      Files.deleteIfExists(dvRegistryFile(root, v))
    }
    val referenced: Set[String] =
      (if (retained.isEmpty) Set.empty[String]
       else retained.map(v => manifest(spark, root, v).select("file"))
         .reduce(_ unionByName _).distinct()
         .collect().map(_.getString(0)).toSet) ++ // file-count metadata, driver-ok
      cloneReferenced(spark, root, pruneDead = true, minAgeMs)
    val dir = dataDir(root)
    if (!Files.exists(dir)) return Seq.empty
    val list = Files.list(dir)
    val removed = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
      val now = System.currentTimeMillis()
      val it = list.iterator()
      while (it.hasNext) {
        val p = it.next()
        if (!referenced.contains(p.toString) &&
            mtimeOf(p).exists(now - _ >= minAgeMs)) {
          Files.deleteIfExists(p)
          removed += p.toString
        }
      }
    } finally list.close()
    // crashed-attempt staging leftovers: a writer that died between
    // staging and its CAS leaves a `_staging-*` dir under the root (data
    // parts) or `m<v>.*.staging-*` entries under `_manifests` (manifest/
    // schema/props/commit tmp files) that nothing references — reclaim
    // them under the same age floor, which is what keeps an IN-FLIGHT
    // attempt's younger staging safe
    locally {
      val now = System.currentTimeMillis()
      def sweep(d: NioPath, pred: String => Boolean): Unit =
        if (Files.exists(d)) {
          val l = Files.list(d)
          try {
            val it = l.iterator()
            while (it.hasNext) {
              val p = it.next()
              // a concurrent commit MOVES its staging between our listing
              // and this stat — a vanished entry just needs no reclaiming
              if (pred(p.getFileName.toString) &&
                  mtimeOf(p).exists(now - _ >= minAgeMs))
                deleteTree(p)
            }
          } finally l.close()
        }
      sweep(Paths.get(root), _.startsWith("_staging-"))
      sweep(manifestsDir(root), _.contains(".staging-"))
      // a writer that crashed INSIDE its commit's lock body (after moving
      // artifacts, before the pointer swap) leaves non-staging manifest
      // files at versions ABOVE the pointer — [[versions]] rightly ignores
      // them (unpublished), so the dropped-version loop never reaches
      // them; reclaim here under the same age floor (an in-flight commit's
      // artifacts are younger than it by construction)
      locally {
        val cur = currentVersion(root)
        val now = System.currentTimeMillis()
        versionMarkers(root).filter(_ > cur).foreach { v =>
          val artifacts = Seq(schemaFile(root, v), commitInfoFile(root, v),
            propsFile(root, v), dvRegistryFile(root, v))
          val dirs = Seq(manifestDir(root, v), manifestDeltaDir(root, v))
          val youngest = (artifacts ++ dirs).flatMap(mtimeOf).maxOption
          if (youngest.exists(now - _ >= minAgeMs)) {
            dirs.foreach(deleteTree)
            artifacts.foreach(Files.deleteIfExists(_))
          }
        }
      }
    }
    // bloom slices whose every sketched file is now dead go with them
    // (a partially-live slice stays — its dead rows are bounded garbage
    // until compaction retires the slice's last live file)
    BloomStore.vacuumSlices(spark, root, referenced, minAgeMs)
    // DV sidecars no retained registry names are reclaimed under the same
    // age floor (a racing DV commit's freshly staged sidecar must survive
    // until its CAS resolves)
    locally {
      val dvReferenced = retained.flatMap(v => dvRegistryOf(root, v).values).toSet
      val dd = dvDir(root)
      if (Files.exists(dd)) {
        val l = Files.list(dd)
        try {
          val now = System.currentTimeMillis()
          val it = l.iterator()
          while (it.hasNext) {
            val p = it.next()
            if (!dvReferenced.contains(p.toString) &&
                mtimeOf(p).exists(now - _ >= minAgeMs))
              deleteTree(p)
          }
        } finally l.close()
      }
    }
    removed.toSeq
  }

  /** Materialize version `v`'s FULL manifest if it only exists as a delta
    * chain — [[vacuum]]'s fold-base guarantee. Checkpoint content is a
    * pure function of the version, so a lost race against another writer
    * just discards an identical staging. */
  private def ensureCheckpoint(spark: SparkSession, root: String, v: Long): Unit =
    if (!Files.exists(manifestDir(root, v))) {
      val (s, rows) = CowManifestCache.rowsOf(spark, root, v)
      import scala.jdk.CollectionConverters._
      val staging = manifestsDir(root).resolve(
        s"m$v.staging-${java.util.UUID.randomUUID().toString.take(8)}")
      spark.createDataFrame(rows.asJava, s)
        .coalesce(1).write.mode("overwrite").parquet(staging.toString)
      if (Files.exists(manifestDir(root, v))) deleteTree(staging)
      else try Files.move(staging, manifestDir(root, v), StandardCopyOption.ATOMIC_MOVE)
      catch {
        // lost the race between the exists probe and the move (two vacuums
        // re-basing the same version): the winner's checkpoint is the same
        // manifest — discard ours and proceed
        case _: java.nio.file.FileAlreadyExistsException
           | _: java.nio.file.DirectoryNotEmptyException
           | _: java.nio.file.FileSystemException if Files.exists(manifestDir(root, v)) =>
          deleteTree(staging)
      }
      // its delta slice is now redundant (reconstruction short-circuits at
      // the checkpoint); leave it for this version's own vacuum
    }

  // ---------------------------------------------------------------- internals

  /** Per-file Bloom sizing — Spark's own runtime-filter defaults (1 M
    * expected items, 8 M bits ≈ 1 MB per file per indexed column). The
    * false-positive rate must stay far below 1/|probe batch|, because a
    * multi-key lookup or merge admits a file when ANY probe hits: at
    * 250 k rows/file this sizing gives ~2.5e-5 per probe, so even a
    * 100-key batch admits a non-holder with probability ~2.5e-3. An
    * undersized sketch silently degrades to stats-only admission (sound,
    * never wrong — a false positive only costs an extra file read). */
  private val BloomItemsPerFile = 1000000L
  private val BloomNumBits = 8L * BloomItemsPerFile

  /** One file's Bloom sketch of `c` — Spark's own sketch aggregate over
    * [[xxhash64]] of the value (nulls skipped — an equality probe can
    * never match NULL), so the query-side literal hashes identically. */
  private def bloomAggFor(c: String, items: Long, bits: Long): Column =
    org.apache.spark.sql.GraftBridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        org.apache.spark.sql.GraftBridge.expression(xxhash64(col(c))),
        org.apache.spark.sql.catalyst.expressions.Literal(items),
        org.apache.spark.sql.catalyst.expressions.Literal(bits))
        .toAggregateExpression()).as(s"bloom_$c")

  /** Per-table sketch sizing: `graft.bloom.items` / `graft.bloom.bits`
    * table properties override the defaults (smaller files can shrink the
    * sidecar; bigger ones keep the multi-probe false-positive rate low —
    * a misjudged size only ever degrades to stats admission, never wrong).
    * Sketches are self-describing, so resizing mid-life is safe. */
  private def bloomSizing(root: String): (Long, Long) = {
    val p = tableProps(root, currentVersion(root))
    (numericProp(p, "graft.bloom.items").getOrElse(BloomItemsPerFile),
     numericProp(p, "graft.bloom.bits").getOrElse(BloomNumBits))
  }

  /** A positive-long table property, or None — a value that fails to parse
    * falls back to the default rather than bricking every write (and
    * [[setTableProperties]] rejects bad values loudly up front). */
  private def numericProp(p: Map[String, String], key: String): Option[Long] =
    p.get(key).flatMap(v => scala.util.Try(v.trim.toLong).toOption).filter(_ > 0L)

  /** Index an EXISTING table without rewriting a byte (Delta's
    * `CREATE BLOOMFILTER INDEX` backfill): declare `cols` and sketch every
    * CURRENT data file in ONE scan into a sidecar slice. Subsequent
    * commits keep sketching the declared columns automatically; a file
    * with no sketch for a probed column simply never skips (sound), so
    * the index can be added to a live table at any time. */
  def buildBloomIndex(spark: SparkSession, root: String,
      cols: Seq[String]): Unit = {
    val v = currentVersion(root)
    require(v >= 1L, s"no cow table at $root")
    val schema = schemaOf(root, v)
    require(cols.nonEmpty && cols.forall(schema.fieldNames.contains),
      s"bloom columns ${cols.mkString(",")} must exist " +
        s"(have: ${schema.fieldNames.mkString(",")})")
    val existing = BloomStore.columns(root)
    // a fresh declaration may not land on a name the store ever keyed
    // sketches by (alias chains / drop tombstones): old slices' stale
    // bytes would probe-match the new column and wrongly skip files
    locally {
      val stale = cols.filterNot(existing.contains)
        .filter(BloomStore.historicalNames(root).contains)
      require(stale.isEmpty,
        s"cannot bloom-index ${stale.mkString(",")}: old slices still key " +
          "sketches by these names for live files — pick other names, or " +
          "OPTIMIZE (rewrite) then VACUUM first")
    }
    val fresh = cols.filterNot(existing.contains)
    BloomStore.declare(root, existing ++ fresh)
    if (fresh.isEmpty) return
    val files = CowManifestCache.rowsOf(spark, root, v)._2
      .map(_.getAs[String]("file")).filter(_.nonEmpty)
    if (files.isEmpty) return
    if (isColumnMapped(schema)) ensureFieldIdConfs(spark)
    import spark.implicits._
    val (items, bits) = bloomSizing(root)
    val bloomNames = fresh.map(c => s"bloom_$c")
    val fileMeta = files.map(f => (f.substring(f.lastIndexOf('/') + 1), f))
      .toDF("basename", "file")
    spark.read.schema(schema).parquet(files: _*)
      .groupBy(regexp_extract(input_file_name(), "([^/]+)$", 1).as("basename"))
      .agg(bloomAggFor(fresh.head, items, bits),
        fresh.tail.map(bloomAggFor(_, items, bits)): _*)
      .join(fileMeta, Seq("basename"))
      .select(("file" +: bloomNames).map(col): _*)
      .write.parquet(BloomStore.newSliceDir(root).toString)
  }

  /** [[bloomPruneMerge]] skips its refinement above this many distinct
    * source keys: a corpus-sized backfill probes nothing (stats admission
    * stands, sound), while the streaming-upsert shape it exists for — a
    * SMALL batch against a LARGE table — probes cheaply on the driver. */
  private val BloomMergeProbeCap = 10000

  /** Refine merge's stat-admitted touched-file set through the per-file
    * Bloom sketches: a file rewrites only if, for EVERY bloom-indexed merge
    * key, SOME source value might be in the file's sketch. On a scattered
    * key (content hash, UUID) the [min, max] stats admit nearly every file
    * for any batch; the sketches cut that to the files that actually hold
    * a batch key (false positives only ever cost an extra rewrite, never a
    * missed match — the same soundness direction as the read-side skip). */
  private def bloomPruneMerge(spark: SparkSession, root: String, version: Long,
      source: DataFrame, pruneKeys: Seq[String],
      statAffected: Array[String]): Array[String] = {
    if (statAffected.isEmpty) return statAffected
    val manSchema = CowManifestCache.rowsOf(spark, root, version)._1
    // a key only probes if the SOURCE column's type matches the table's
    // (min_ carries it): xxhash64 is type-sensitive, and a mismatched hash
    // would skip a file that really holds the key — never acceptable
    val declared = BloomStore.columns(root).toSet
    val bloomKeys = pruneKeys.filter { k =>
      declared.contains(k) &&
        source.schema.fields.find(_.name == k).map(_.dataType) ==
          manSchema.fields.find(_.name == s"min_$k").map(_.dataType)
    }
    if (bloomKeys.isEmpty) return statAffected
    val hashed = source
      .select(bloomKeys.map(k => xxhash64(col(k)).as(k)): _*)
      .distinct().limit(BloomMergeProbeCap + 1).collect()
    if (hashed.length > BloomMergeProbeCap) return statAffected
    val probes = bloomKeys.map(k =>
      k -> hashed.map(_.getAs[Long](k)).distinct).toMap
    val filters = bloomKeys.map(k =>
      k -> BloomStore.filtersFor(spark, root, k, statAffected.toSeq)).toMap
    statAffected.filter { f =>
      bloomKeys.forall { k =>
        filters(k).getOrElse(f, None) match {
          case None => true // no sketch for this file: admission stands
          case Some(bf) => probes(k).exists(bf.mightContainLong)
        }
      }
    }
  }

  /** Write `df` as new immutable `_data` files and return their manifest
    * rows. Files land BEFORE any commit references them — invisible until a
    * manifest wins the CAS; orphans from lost races are vacuum's job. The
    * stats pass scans only the NEW files (one extra read of the increment,
    * the price of per-file stats without a custom committer).
    *
    * `bloomColsOverride`: None derives the bloom-indexed columns from the
    * table's [[BloomStore]] declaration (every ordinary rewrite);
    * create/convert pass their declaration explicitly. */
  private def writeDataFiles(spark: SparkSession, root: String, df0: DataFrame,
      statsCols: Seq[String], maxRecordsPerFile: Long,
      bloomColsOverride: Option[Seq[String]] = None,
      declaredSchema: Option[StructType] = None): DataFrame = {
    // column mapping: every data file carries the declared schema's field
    // ids in its footer — projections/casts upstream strip column metadata,
    // so the write re-attaches it here, by name, from the declared schema
    // (create passes its bootstrap schema; DML resolves the table's)
    val declared = declaredSchema.orElse {
      val v = currentVersion(root)
      if (v >= 1L) Some(schemaOf(root, v)) else None
    }
    val df = declared match {
      case Some(s) if isColumnMapped(s) =>
        ensureFieldIdConfs(spark)
        val metaByName = s.fields.map(f => f.name.toLowerCase -> f.metadata).toMap
        df0.select(df0.schema.fields.toSeq.map(f =>
          col(f.name).as(f.name,
            metaByName.getOrElse(f.name.toLowerCase, f.metadata))): _*)
      case _ => df0
    }
    val bloomCols = bloomColsOverride.getOrElse(BloomStore.columns(root))
      .filter(df.columns.contains)
    val staging = Paths.get(root, s"_staging-${java.util.UUID.randomUUID().toString.take(8)}")
    val writer = df.write.mode("overwrite")
    (if (maxRecordsPerFile > 0)
       writer.option("maxRecordsPerFile", maxRecordsPerFile.toString)
     else writer).parquet(staging.toString)
    Files.createDirectories(dataDir(root))
    val moved = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    val list = Files.list(staging)
    try {
      val it = list.iterator()
      while (it.hasNext) {
        val p = it.next()
        val name = p.getFileName.toString
        if (name.startsWith("part-") && name.endsWith(".parquet") && Files.size(p) > 0) {
          val dest = dataDir(root).resolve(
            s"f-${java.util.UUID.randomUUID().toString.take(12)}.parquet")
          Files.move(p, dest, StandardCopyOption.ATOMIC_MOVE)
          moved += ((dest.toString, Files.size(dest),
            Files.getLastModifiedTime(dest).toMillis))
        }
      }
    } finally list.close()
    deleteTree(staging)
    import spark.implicits._
    val statColNames = Seq("file", "bytes", "mtime", "rows") ++
      statsCols.flatMap(c => Seq(s"min_$c", s"max_$c"))
    val statAggs = count(lit(1)).as("rows") +:
      statsCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    if (moved.isEmpty) {
      // Zero data files (everything deleted / empty source): an empty
      // manifest slice with the full stats schema.
      val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], df.schema)
      return empty.groupBy(lit("").as("file")).agg(statAggs.head, statAggs.tail: _*)
        .withColumn("bytes", lit(0L)).withColumn("mtime", lit(0L))
        .select(statColNames.map(col): _*)
    }
    statsSlice(spark, root, moved.toSeq, statsCols,
      constraintsOf(root, currentVersion(root)).toSeq.sortBy(_._1), bloomCols)
  }

  /** Per-file stats for `moved` (path, bytes, mtime) files: ONE scan
    * grouped by provenance; the rows are file-count-sized metadata, so
    * they materialize to the driver once (a local relation) instead of
    * re-running the scan per consumer. Provenance joins on the BASENAME
    * (never percent-encoded): input_file_name() yields a URI-escaped
    * `file:` URI, and matching its full path against raw NIO strings
    * breaks the moment the table root contains a space or any URI-escaped
    * char. Zero-row part files (Spark writes one to preserve schema for an
    * empty frame/partition) get no stats group, must not enter the
    * manifest, and are deleted here rather than left for vacuum; anything
    * else missing a stats row is a real fault. Shared by [[writeDataFiles]]
    * (fresh files) and [[convert]] (adopted files). */
  private def statsSlice(spark: SparkSession, root: String,
      moved: Seq[(String, Long, Long)], statsCols: Seq[String],
      constraints: Seq[(String, String)] = Nil,
      bloomCols: Seq[String] = Nil): DataFrame = {
    import spark.implicits._
    // the manifest slice stays SLIM — sketches go to the sidecar store
    // below, never into the manifest (a 400-file manifest must not carry
    // 400 MB of sketch bytes through every commit's rewrite and every
    // planner's cache)
    val statColNames = Seq("file", "bytes", "mtime", "rows") ++
      statsCols.flatMap(c => Seq(s"min_$c", s"max_$c"))
    // CHECK-constraint violation counts ride the SAME scan as the stats
    // (zero extra passes); SQL CHECK semantics — NULL passes, FALSE violates
    val violNames = constraints.indices.map(i => s"_viol_$i")
    val violAggs = constraints.zipWithIndex.map { case ((_, sql), i) =>
      sum(when(!coalesce(expr(sql), lit(true)), 1L).otherwise(0L)).as(s"_viol_$i")
    }
    // Bloom sketches ride the same scan too: Spark's own sketch aggregate
    // over xxhash64 of the value (nulls skipped — an equality probe can
    // never match NULL), so the query-side literal hashes identically.
    val bloomNames = bloomCols.map(c => s"bloom_$c")
    val (bloomItems, bloomBits) = if (bloomCols.isEmpty) (0L, 0L) else bloomSizing(root)
    val bloomAggs = bloomCols.map(bloomAggFor(_, bloomItems, bloomBits))
    val statAggs = (count(lit(1)).as("rows") +:
      statsCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))) ++
      bloomAggs ++ violAggs
    val fileMeta = moved.toDF("file", "bytes", "mtime")
      .withColumn("basename", element_at(split(col("file"), "/"), -1))
    val grouped0 = spark.read.parquet(moved.map(_._1): _*)
      .groupBy(regexp_extract(input_file_name(), "([^/]+)$", 1).as("basename"))
      .agg(statAggs.head, statAggs.tail: _*)
    // with sketches in play, materialize the one scan once: the slim stats
    // collect to the driver, the megabyte-sized sketches are written out
    // DISTRIBUTED (they never hit driver memory)
    val grouped = if (bloomCols.nonEmpty) grouped0.localCheckpoint() else grouped0
    val joined = fileMeta.join(grouped.drop(bloomNames: _*), Seq("basename"))
      .select((statColNames ++ violNames).map(col): _*)
    val allRows = joined.collect().toSeq
    constraints.zipWithIndex.foreach { case ((name, sql), i) =>
      val violations = allRows.map(_.getLong(statColNames.length + i)).sum
      if (violations > 0L) {
        // abort BEFORE any commit references the files: delete the staged
        // increment so the table provably never held the bad rows
        moved.foreach(m => Files.deleteIfExists(Paths.get(m._1)))
        sys.error(s"CHECK constraint $name ($sql) violated by $violations " +
          "row(s) in the written increment; nothing committed")
      }
    }
    if (bloomCols.nonEmpty) {
      // constraint checks passed: land this commit's sketch slice
      fileMeta.select((col("basename") +: col("file") +: Nil): _*)
        .join(grouped.select((col("basename") +: bloomNames.map(col)): _*), Seq("basename"))
        .select(("file" +: bloomNames).map(col): _*)
        .write.parquet(BloomStore.newSliceDir(root).toString)
    }
    import scala.jdk.CollectionConverters._
    // dropping the trailing _viol_ columns is a plain local projection —
    // allRows already holds everything, no second plan/collect round-trip
    val rows = allRows.map(r => Row.fromSeq(r.toSeq.take(statColNames.length)))
    val slimSchema = StructType(joined.schema.fields.take(statColNames.length))
    val statFiles = rows.map(_.getString(0)).toSet
    moved.filterNot(m => statFiles.contains(m._1)).foreach { m =>
      val empty = spark.read.parquet(m._1).isEmpty
      require(empty, s"per-file stats pass lost non-empty file ${m._1}")
      Files.deleteIfExists(Paths.get(m._1))
    }
    spark.createDataFrame(rows.asJava, slimSchema)
  }

  /** How a commit changes the MANIFEST — the write-side half of the
    * delta-manifest design ([[manifestDir]]/[[manifestDeltaDir]]):
    *
    *  - [[AddedSlice]]: the ordinary DML shape. Only the ADDED files'
    *    stat rows persist (a delta slice, change-sized); removals ride the
    *    commit record. Commit metadata cost: O(changed files), plus an
    *    amortized full checkpoint every [[CheckpointIntervalProp]] commits
    *    — never O(table file count) per commit (the cost Delta's JSON
    *    delta-log + periodic parquet checkpoint removes, and the one
    *    structural scale gap VERDICT r9 named).
    *  - [[FullManifest]]: the complete new manifest, for commits that
    *    (re)define the MANIFEST SCHEMA itself — create/convert/clone
    *    (version 1), drop/rename of stats columns — always written as a
    *    checkpoint, so a fold never crosses a manifest-schema change.
    *  - [[MetadataOnly]]: no file-set change (schema evolution,
    *    properties, constraints, DV-only commits) — nothing but the
    *    record, schema, and sidecar JSONs persist.
    */
  private sealed trait ManifestDelta
  private final case class FullManifest(df: DataFrame) extends ManifestDelta
  private final case class AddedSlice(df: DataFrame) extends ManifestDelta
  private case object MetadataOnly extends ManifestDelta

  /** Stage the manifest change, then CAS-commit it under the table lock
    * (the same [[TablePointer]] seam as [[Versioned.publishIf]]).
    * Alongside it land the [[CommitInfo]] action record — the commit log
    * every incremental reader prefers over a manifest diff — and the
    * schema/props/DV sidecar JSONs. The new manifest's rows resolve
    * DRIVER-SIDE: the previous version's rows come off
    * [[CowManifestCache]] (one fold per JVM, usually seeded by the
    * previous commit), the added slice is change-sized, and totals are an
    * in-memory fold — no Spark job reads metadata back, and nothing
    * table-file-count-sized is written unless this commit is a
    * checkpoint. */
  private def commit(spark: SparkSession, root: String, expected: Long,
      delta: ManifestDelta, schema: StructType, action: CommitAction,
      props: Option[Map[String, String]] = None,
      dvRegistry: Option[Map[String, String]] = None): Long = {
    val next = expected + 1
    Files.createDirectories(manifestsDir(root))
    // properties carry forward unless the commit overrides them
    val nextProps = props.getOrElse(tableProps(root, expected))
    val propsTmp =
      if (nextProps.isEmpty) None
      else {
        val n = jsonMapper.createObjectNode()
        nextProps.toSeq.sortBy(_._1).foreach { case (k, v) => n.put(k, v) }
        val t = manifestsDir(root).resolve(
          s"m$next.props.staging-${java.util.UUID.randomUUID().toString.take(8)}")
        Files.write(t, jsonMapper.writeValueAsBytes(n))
        Some(t)
      }
    // ---- resolve the new manifest's rows driver-side ----
    val (manSchema: StructType, newRows: Seq[Row], addedRows: Seq[Row]) =
      delta match {
        case FullManifest(df) =>
          val local = df.collect().toSeq // file-count-sized, checkpoint shape
          (df.schema, local, local)
        case AddedSlice(df) =>
          require(expected >= 1L, "AddedSlice commits need a previous version")
          val (ps, prevRows) = CowManifestCache.rowsOf(spark, root, expected)
          // conform the slice to the previous manifest's column order (a
          // delta fold must never cross a manifest-schema change)
          val added = df.select(ps.fieldNames.map(col).toSeq: _*).collect().toSeq
          val fIdx = ps.fieldIndex("file")
          require(added.map(_.getString(fIdx)).toSet == action.added.toSet,
            s"manifest delta drifted from the commit action's added set")
          val removed = action.removed.toSet
          (ps, prevRows.filterNot(r => removed(r.getString(fIdx))) ++ added,
            added)
        case MetadataOnly =>
          require(expected >= 1L, "MetadataOnly commits need a previous version")
          require(action.added.isEmpty && action.removed.isEmpty,
            "MetadataOnly commit cannot change the file set")
          val (ps, prevRows) = CowManifestCache.rowsOf(spark, root, expected)
          (ps, prevRows, Seq.empty[Row])
      }
    val fileIdx = manSchema.fieldIndex("file")
    val rowsIdx = manSchema.fieldIndex("rows")
    val bytesIdx = manSchema.fieldIndex("bytes")
    val totals = (newRows.length.toLong,
      newRows.iterator.map(_.getLong(rowsIdx)).sum,
      newRows.iterator.map(_.getLong(bytesIdx)).sum)
    // ---- stage the checkpoint or the delta slice ----
    // a checkpoint is due every N delta commits (property-tunable), so a
    // cold JVM folds at most N slices before hitting a full manifest
    val checkpointDue = delta match {
      case _: FullManifest => true
      case _ =>
        val every = numericProp(nextProps, CheckpointIntervalProp)
          .getOrElse(CheckpointIntervalDefault)
        val rk = Paths.get(root).toAbsolutePath.normalize.toString
        // first touch per JVM seeds DOWNWARD (stops at the nearest
        // checkpoint, ≤ interval stats) — a single-commit-per-JVM cron
        // pattern must not stat-walk the whole history upward from v1
        val (ck0, sc0) = Option(checkpointPos.get(rk)).getOrElse {
          val down = (expected to 1L by -1L)
            .find(w => Files.exists(manifestDir(root, w))).getOrElse(0L)
          (down, expected)
        }
        var last = ck0
        var w = sc0 + 1
        while (w <= expected) {
          if (Files.exists(manifestDir(root, w))) last = w
          w += 1
        }
        checkpointPos.put(rk, (last, expected))
        next - last >= every
    }
    import scala.jdk.CollectionConverters._
    val checkpointTmp =
      if (!checkpointDue) None
      else {
        val t = manifestsDir(root).resolve(
          s"m$next.staging-${java.util.UUID.randomUUID().toString.take(8)}")
        spark.createDataFrame(newRows.asJava, manSchema)
          .coalesce(1).write.mode("overwrite").parquet(t.toString)
        Some(t)
      }
    val deltaTmp =
      if (checkpointDue || addedRows.isEmpty) None
      else {
        val t = manifestsDir(root).resolve(
          s"m$next.delta.staging-${java.util.UUID.randomUUID().toString.take(8)}")
        spark.createDataFrame(addedRows.asJava, manSchema)
          .coalesce(1).write.mode("overwrite").parquet(t.toString)
        Some(t)
      }
    val schemaTmp = manifestsDir(root).resolve(
      s"m$next.schema.staging-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(schemaTmp, schema.json.getBytes(StandardCharsets.UTF_8))
    // the DV registry carries forward like props, intersected with the new
    // manifest's files: a retired file's vectors are MATERIALIZED by its
    // rewrite, so its entry must drop with it (a DV-delete passes the full
    // updated map; restore passes the target version's)
    val manBases = newRows.iterator.map(_.getString(fileIdx))
      .filter(_.nonEmpty)
      .map(f => f.substring(f.lastIndexOf('/') + 1)).toSet
    val nextDv = dvRegistry.getOrElse(dvRegistryOf(root, expected))
      .filter { case (b, _) => manBases.contains(b) }
    val dvTmp =
      if (nextDv.isEmpty) None
      else {
        val n = jsonMapper.createObjectNode()
        nextDv.toSeq.sortBy(_._1).foreach { case (k, v) => n.put(k, v) }
        val t = manifestsDir(root).resolve(
          s"m$next.dv.staging-${java.util.UUID.randomUUID().toString.take(8)}")
        Files.write(t, jsonMapper.writeValueAsBytes(n))
        Some(t)
      }
    val rec = jsonMapper.createObjectNode()
    rec.put("version", next); rec.put("kind", action.kind)
    rec.put("commitMs", System.currentTimeMillis())
    rec.put("nFiles", totals._1)
    rec.put("nRows", totals._2); rec.put("bytes", totals._3)
    val addedArr = rec.putArray("added"); action.added.foreach(addedArr.add)
    val removedArr = rec.putArray("removed"); action.removed.foreach(removedArr.add)
    action.txn.foreach { case (app, batch) =>
      rec.put("txnApp", app); rec.put("txnBatch", batch)
    }
    if (action.copied.nonEmpty) {
      val copiedArr = rec.putArray("copied"); action.copied.foreach(copiedArr.add)
    }
    if (action.dvFiles.nonEmpty) {
      val dvArr = rec.putArray("dvFiles"); action.dvFiles.foreach(dvArr.add)
    }
    val infoTmp = manifestsDir(root).resolve(
      s"m$next.commit.staging-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(infoTmp, jsonMapper.writeValueAsBytes(rec))
    TablePointer.withCommitLock(root) {
      val cur = currentVersion(root)
      if (cur != expected) {
        checkpointTmp.foreach(deleteTree)
        deltaTmp.foreach(deleteTree)
        Files.deleteIfExists(schemaTmp)
        Files.deleteIfExists(infoTmp)
        propsTmp.foreach(Files.deleteIfExists(_))
        dvTmp.foreach(Files.deleteIfExists(_))
        throw new ConcurrentPublishException(root, expected, cur)
      }
      // orphans from a crashed attempt at this version (provably
      // unpublished) — either form may be lying around
      deleteTree(manifestDir(root, next))
      deleteTree(manifestDeltaDir(root, next))
      checkpointTmp.foreach(t =>
        Files.move(t, manifestDir(root, next), StandardCopyOption.ATOMIC_MOVE))
      deltaTmp.foreach(t =>
        Files.move(t, manifestDeltaDir(root, next), StandardCopyOption.ATOMIC_MOVE))
      Files.move(schemaTmp, schemaFile(root, next), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      Files.move(infoTmp, commitInfoFile(root, next), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      propsTmp match {
        case Some(t) => Files.move(t, propsFile(root, next),
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        case None => Files.deleteIfExists(propsFile(root, next)) // crashed orphan
      }
      dvTmp match {
        case Some(t) => Files.move(t, dvRegistryFile(root, next),
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        case None => Files.deleteIfExists(dvRegistryFile(root, next)) // crashed orphan
      }
      TablePointer.swap(root, next)
      if (checkpointTmp.isDefined)
        checkpointPos.put(
          Paths.get(root).toAbsolutePath.normalize.toString, (next, next))
      // seed the cache with the rows just resolved: consumers of the new
      // version (the next commit, the planner) never re-fold or re-read
      CowManifestCache.seed(root, next, manSchema, newRows)
      next
    }
  }

  /** The conflict-retry loop ([[graft.plans.GraftCommit]]'s protocol): on a
    * lost CAS, re-derive against the winner's version. */
  private def retrying(root: String, what: String)(body: Long => Commit): Commit = {
    val MaxAttempts = 8
    var attempt = 0
    while (true) {
      val version = currentVersion(root)
      try return body(version)
      catch {
        case e: ConcurrentPublishException =>
          attempt += 1
          if (attempt >= MaxAttempts)
            throw new IllegalStateException(
              s"$what: lost the commit race $MaxAttempts times — giving up", e)
      }
    }
    sys.error("unreachable")
  }

  /** File paths of a manifest (slice) — file-count-sized metadata. */
  private def filePaths(manifestSlice: DataFrame): Seq[String] =
    manifestSlice.select("file").collect().map(_.getString(0)).toSeq

  private[graft] def statsColsOf(spark: SparkSession, root: String, v: Long): Seq[String] =
    manifest(spark, root, v).columns.toSeq
      .filter(_.startsWith("min_")).map(_.stripPrefix("min_"))

  /** mtime of `p`, or None when a concurrent writer moved/deleted it
    * between a directory listing and this stat — every vacuum sweep uses
    * this so the listing-vs-stat race can never abort a run mid-way. */
  private def mtimeOf(p: NioPath): Option[Long] =
    try Some(Files.getLastModifiedTime(p).toMillis)
    catch { case _: java.nio.file.NoSuchFileException => None }

  /** Shared recursive delete ([[BloomStore]] and the stress tools reuse
    * it — one implementation to fix if failure semantics ever change). */
  private[graft] def deleteTree(p: NioPath): Unit = if (Files.exists(p)) {
    val walk = Files.walk(p)
    try walk.sorted(java.util.Comparator.reverseOrder()).forEach(f => Files.delete(f))
    finally walk.close()
  }
}

/** Driver-local cache of PUBLISHED cow manifests, keyed (root, version).
  * A published manifest is immutable (version numbers are pointer-allocated
  * and never reused, even across vacuum), so caching is safe forever; the
  * value is file-count-sized metadata (the same adjudicated bound as
  * Spark's `InMemoryFileIndex` cache). Bounded LRU so a long-lived session
  * touching many versions cannot grow without limit. The payoff: a hot
  * query loop against a cow table pays the manifest-parquet Spark job ONCE
  * per version, not once per query plan ([[CowFileIndex]] previously ran
  * one small job per `listFiles`/`sizeInBytes` call). */
private[graft] object CowManifestCache {
  private val MaxEntries = 64

  /** Test seam: how many cache MISSES (manifest parquet loads) happened. */
  @volatile var loads: Long = 0L

  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, Long), (StructType, Seq[Row])](
        MaxEntries, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long), (StructType, Seq[Row])]): Boolean =
        size() > MaxEntries
    })

  /** Drop every cached manifest for `root`. Version numbers are never
    * reused within a table's lifetime, but the LIFETIME can restart: if
    * the root directory is deleted out-of-band and a NEW table is created
    * at the same path in the same JVM, its version 1 must not resolve to
    * the old table's cached manifest. Every table-creating entry point
    * ([[FileCow.create]]/[[FileCow.convert]]/[[FileCow.shallowClone]])
    * invalidates its root first. */
  private[graft] def invalidate(root: String): Unit = {
    val abs = Paths.get(root).toAbsolutePath.normalize.toString
    cache.synchronized {
      cache.keySet().removeIf(k => k._1 == abs)
    }
  }

  /** A freshly committed version's rows, straight from the committer —
    * the cache's usual source in a writing JVM: commits seed what they
    * just resolved, so neither the next commit nor the planner ever
    * re-reads manifest parquet. */
  private[sources] def seed(root: String, version: Long,
      schema: StructType, rows: Seq[Row]): Unit =
    cache.put((Paths.get(root).toAbsolutePath.normalize.toString, version),
      (schema, rows))

  private[sources] def rowsOf(spark: SparkSession, root: String,
      version: Long): (StructType, Seq[Row]) = {
    val key = (Paths.get(root).toAbsolutePath.normalize.toString, version)
    val hit = cache.get(key)
    if (hit != null) hit else load(spark, root, version)
  }

  /** Resolve a version's manifest rows: a CHECKPOINT dir reads directly;
    * a delta version folds its slice over the previous version's rows.
    * ITERATIVE on purpose: the walk down to the nearest resolvable base
    * (cached version or checkpoint) and the fold back up are loops, so a
    * long delta chain (a table with `graft.checkpoint.interval` set high)
    * can never overflow the stack — one frame regardless of chain length.
    * Every intermediate version caches, so a cold chain of N delta
    * commits folds each slice exactly once per JVM. */
  private def load(spark: SparkSession, root: String,
      version: Long): (StructType, Seq[Row]) = {
    val absKey = Paths.get(root).toAbsolutePath.normalize.toString
    val published = TablePointer.current(root)
    def cachePut(v: Long, e: (StructType, Seq[Row])): Unit =
      // an UNPUBLISHED version dir (crashed commit's orphan) may still be
      // replaced by a winning commit — never cache it
      if (v <= published) cache.put((absKey, v), e)
    // walk DOWN to the nearest base
    var base: (StructType, Seq[Row]) = null
    var v = version
    val pending = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (base == null) {
      val hit = cache.get((absKey, v))
      if (hit != null) base = hit
      else {
        val dir = FileCow.manifestDir(root, v)
        if (java.nio.file.Files.exists(dir)) {
          val df = spark.read.parquet(dir.toString)
          base = (df.schema, df.collect().toSeq)
          loads += 1
          cachePut(v, base)
        } else {
          require(v >= 1L, s"no manifest for version $v under $root")
          pending += v
          v -= 1
        }
      }
    }
    // fold the delta slices back UP, caching each version on the way
    var acc = base
    pending.reverseIterator.foreach { w =>
      val ci = FileCow.commitInfo(root, w).getOrElse(sys.error(
        s"cannot reconstruct manifest v$w under $root: no checkpoint " +
          "and no commit record (vacuumed?)"))
      val (ps, prevRows) = acc
      val fIdx = ps.fieldIndex("file")
      val added: Seq[Row] =
        if (ci.added.isEmpty) Nil
        else {
          val deltaDir = FileCow.manifestDeltaDir(root, w)
          require(java.nio.file.Files.exists(deltaDir),
            s"commit record v$w under $root names added files but its " +
              "delta manifest is missing")
          // conform to the fold base's column order — delta slices never
          // cross a manifest-schema change (those commits checkpoint)
          spark.read.parquet(deltaDir.toString)
            .select(ps.fieldNames.map(org.apache.spark.sql.functions.col).toSeq: _*)
            .collect().toSeq
        }
      val removed = ci.removed.toSet
      acc = (ps, prevRows.filterNot(r => removed(r.getString(fIdx))) ++ added)
      loads += 1
      cachePut(w, acc)
    }
    acc
  }

  /** The cached manifest as a LOCAL relation (driver-side data; filters on
    * it fold without a Spark job). */
  def relation(spark: SparkSession, root: String, version: Long): DataFrame = {
    val (schema, rows) = rowsOf(spark, root, version)
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }
}

/** [[FileIndex]] over a [[FileCow]] manifest: the scan's file list IS the
  * manifest (no directory listing — `_data` holds every version's files),
  * and pushed data filters on stat columns prune files via the same
  * [[StatAdmission]] translation as [[ZoneMapFileIndex]]. The driver
  * materializes only admitted manifest rows — the same adjudicated
  * metadata bound as Spark's own `InMemoryFileIndex`. */
private[graft] class CowFileIndex(
    spark: SparkSession,
    root: String,
    version: Long,
    byColumn: Map[String, ZoneDim],
    /** When set, the scan covers only these data-file BASENAMES — how
      * [[FileCow.readVersion]] splits a DV'd snapshot into a vectorized
      * clean-file scan and a metadata-joined dirty-file scan. */
    only: Option[Set[String]] = None) extends FileIndex {

  private def inScope(path: String): Boolean =
    only.forall(_.contains(path.substring(path.lastIndexOf('/') + 1)))

  /** Exposed for [[graft.plans.CowMetadataAggRule]]: the manifest rows this
    * scan would read, straight off the driver-local cache. */
  private[graft] def manifestRows: Seq[Row] =
    CowManifestCache.rowsOf(spark, root, version)._2
  /** Columns with per-file [min, max] stats in the manifest. */
  private[graft] def statsColumns: Set[String] = byColumn.keySet
  /** Deletion vectors make manifest row counts an over-count of live rows —
    * the metadata-only aggregate rewrite must decline. */
  private[graft] def hasDeletionVectors: Boolean =
    FileCow.dvRegistryOf(root, version).nonEmpty

  private def man: DataFrame = FileCow.manifest(spark, root, version)

  override def rootPaths: Seq[Path] = Seq(new Path(root, "_data"))
  override def partitionSchema: StructType = new StructType()
  override def refresh(): Unit = ()

  // straight off the cached driver-local manifest rows — planning a query
  // against a cow table submits NO Spark job (an aggregate over even a
  // local relation would)
  override lazy val inputFiles: Array[String] =
    CowManifestCache.rowsOf(spark, root, version)._2
      .map(_.getAs[String]("file")).filter(inScope).toArray

  override lazy val sizeInBytes: Long =
    CowManifestCache.rowsOf(spark, root, version)._2
      .filter(r => inScope(r.getAs[String]("file")))
      .map(_.getAs[Long]("bytes")).sum

  override def listFiles(
      partitionFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      dataFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[PartitionDirectory] = {
    val admission = StatAdmission.admission(dataFilters, byColumn)
    val admitted = man.filter(admission).select("file", "bytes", "mtime")
      .collect()
    // bloom skipping: equality/IN conjuncts on bloom-indexed columns also
    // test each STAT-ADMITTED file's sidecar sketch — the pruning path for
    // scattered high-cardinality keys whose [min, max] admit everything.
    // Sketches load lazily for exactly the shortlisted files (LRU-cached
    // deserialized), so a probe never touches more index than candidates.
    val probes = BloomProbe.extract(dataFilters, BloomStore.columns(root).toSet)
    val kept =
      if (probes.isEmpty) admitted
      else {
        val candidates = admitted.map(_.getString(0)).toSeq
        val filters = probes.map { case (c, _) =>
          c -> BloomStore.filtersFor(spark, root, c, candidates) }.toMap
        admitted.filter { r =>
          probes.forall { case (c, hashes) =>
            filters(c).getOrElse(r.getString(0), None) match {
              case None => true // no sketch for this file: sound
              case Some(bf) => hashes.exists(bf.mightContainLong)
            }
          }
        }
      }
    val statuses = kept
      .filter(r => inScope(r.getString(0)))
      .map(r => new FileStatus(r.getLong(1), false, 1, 128L * 1024 * 1024,
        r.getLong(2), new Path(r.getString(0))))
    Seq(PartitionDirectory(InternalRow.empty, statuses))
  }
}

/** Extracts the bloom-testable probes from pushed data filters: top-level
  * equality / null-safe-equality / IN conjuncts comparing a bloom-indexed
  * column to non-null literals. Each probe is the [[functions.xxhash64]] of
  * the literal — the exact hash the write side sketched — and a file is
  * admitted when ANY probe value might be contained (IN = disjunction).
  * Anything else (casts, expressions, null literals) simply doesn't probe:
  * skipping is only ever an optimization, never a semantics change. */
private[sources] object BloomProbe {
  import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualNullSafe, EqualTo, Expression, In, Literal, XxHash64}

  def extract(filters: Seq[Expression],
      bloomCols: Set[String]): Seq[(String, Seq[Long])] =
    filters.flatMap {
      case EqualTo(a: Attribute, l: Literal) if ok(a, l, bloomCols) =>
        Some(a.name -> Seq(hash(l)))
      case EqualTo(l: Literal, a: Attribute) if ok(a, l, bloomCols) =>
        Some(a.name -> Seq(hash(l)))
      case EqualNullSafe(a: Attribute, l: Literal) if ok(a, l, bloomCols) =>
        Some(a.name -> Seq(hash(l)))
      case EqualNullSafe(l: Literal, a: Attribute) if ok(a, l, bloomCols) =>
        Some(a.name -> Seq(hash(l)))
      case In(a: Attribute, vs) if bloomCols.contains(a.name) && vs.nonEmpty &&
          vs.forall { case l: Literal => l.value != null; case _ => false } =>
        Some(a.name -> vs.map { case l: Literal => hash(l) })
      case _ => None
    }

  private def ok(a: Attribute, l: Literal, cols: Set[String]): Boolean =
    cols.contains(a.name) && l.value != null

  private def hash(l: Literal): Long =
    new XxHash64(Seq(l)).eval(null).asInstanceOf[Long]
}
