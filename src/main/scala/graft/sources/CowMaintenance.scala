package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path => NioPath, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** TABLE MAINTENANCE + DDL commits — the [[FileCow]] surface behind
  * OPTIMIZE/ZORDER, COPY INTO, RESTORE, RENAME/ADD/DROP COLUMN,
  * TBLPROPERTIES, and CHECK constraints: every member is one commit
  * through [[CowWritePath]]'s CAS seam. Extracted along the VERDICT r10
  * seam; self-typed on [[FileCow]] — same object, same private surface,
  * zero call-site change. */
private[sources] trait CowMaintenance { this: FileCow.type =>

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
      // typed: mid-storm, "no such column" usually means a CONCURRENT
      // rename won — retryingSchema re-resolves and retries; a genuine
      // typo keeps failing identically and surfaces when the budget ends
      val resolved = byLower.getOrElse(from.toLowerCase,
        throw new GraftConcurrentSchemaChange(
          s"rename column $from: no such column " +
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
      // a default follows its column's name (the sidecar's file vintages
      // are name-independent, so the fill keeps working under the new name)
      val prevProps = tableProps(root, version)
      val oldDefaultKeys = defaultKeysFor(prevProps, resolved)
      val renamedProps: Option[Map[String, String]] =
        if (oldDefaultKeys.isEmpty) None
        else Some(prevProps -- oldDefaultKeys ++ oldDefaultKeys.map { k =>
          (DefaultPrefix + to + k.substring((DefaultPrefix + resolved).length)) ->
            prevProps(k)
        })
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
          CommitAction("rename_column", Nil, Nil), props = renamedProps)
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
          CommitAction("rename_column", addedPaths, retired),
          props = renamedProps)
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
      // the pointer is the single source of published truth: isRetained
      // alone also counts a crashed attempt's checkpoint-shaped orphan
      // ABOVE the pointer, and restoring to it would PUBLISH a manifest
      // that provably never landed (same versions()-caps-at-the-pointer
      // discipline as lastTxn/COPY INTO)
      require(toVersion >= 1L && toVersion < version,
        s"restore target v$toVersion is not a published version " +
          s"(current is v$version) — only published history can be restored")
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
    * COLUMNS` statement = one snapshot, the Delta/Iceberg contract).
    * `defaults` (column name → foldable literal SQL) makes the addition a
    * DEFAULTED column ([[CowDefaults]]): pre-ALTER files fill the default
    * on read (the files present NOW are recorded once in a `_defaults/`
    * sidecar — they are exactly the files that will lack the column
    * forever), and writes that omit the column materialize it. */
  def addColumns(spark: SparkSession, root: String,
      fields: Seq[org.apache.spark.sql.types.StructField],
      defaults: Map[String, String] = Map.empty): Commit =
    retrying(root, "FileCow.addColumns") { version =>
      val schema = schemaOf(root, version)
      val existing = schema.fieldNames.map(_.toLowerCase).toSet
      val defaulted = defaults.map { case (k, v) =>
        k.toLowerCase(java.util.Locale.ROOT) -> v }
      defaulted.keys.foreach(k => require(
        fields.exists(_.name.equalsIgnoreCase(k)),
        s"DEFAULT declared for $k, which this ADD COLUMNS does not add"))
      fields.foreach { f =>
        require(!existing.contains(f.name.toLowerCase),
          s"column ${f.name} already exists")
        // nullable even when DEFAULTED: the scan's declared schema must
        // admit the NULLs pre-ALTER files physically produce (the fill
        // projects the default ABOVE the scan; a non-nullable scan schema
        // would let Catalyst fold IsNull(c) below it, unsoundly)
        require(f.nullable, s"added column ${f.name} must be nullable " +
          "(existing files cannot carry values for it)")
        require(!defaulted.contains(f.name.toLowerCase) || !f.name.contains("."),
          s"a DEFAULT cannot be declared on column ${f.name}: dots in the " +
            "name collide with the property-key encoding")
        defaulted.get(f.name.toLowerCase).foreach(sql =>
          validateDefault(spark, f, sql))
      }
      require(fields.map(_.name.toLowerCase).distinct.size == fields.size,
        "duplicate column names in one ADD COLUMNS")
      val prevFiles = CowManifestCache.rowsOf(spark, root, version)._2.length.toLong
      // column-mapped tables stamp FRESH ids from the high-water mark —
      // a re-added name can never resolve to a dropped column's old values
      val (stamped, mapProps) =
        if (isColumnMapped(schema)) {
          val (fs, ps) = freshFieldIds(root, version, schema, fields)
          (fs, Some(ps))
        } else (fields, None)
      val defaultProps =
        if (defaulted.isEmpty) Map.empty[String, String]
        else {
          // record THIS attempt's live files once; a lost CAS leaves an
          // orphan sidecar (tiny, never referenced) and the retry records
          // the winner's file set
          Files.createDirectories(defaultsDir(root))
          val liveFiles = CowManifestCache.rowsOf(spark, root, version)._2
            .map(_.getAs[String]("file")).filter(_.nonEmpty)
            .map(f => f.substring(f.lastIndexOf('/') + 1))
          fields.filter(f => defaulted.contains(f.name.toLowerCase)).flatMap { f =>
            val sql = defaulted(f.name.toLowerCase)
            val ref = s"d${version + 1}-${f.name.toLowerCase}-" +
              s"${java.util.UUID.randomUUID().toString.take(8)}.json"
            val n = jsonMapper.createObjectNode()
            n.put("col", f.name); n.put("since", version + 1)
            val arr = n.putArray("files")
            liveFiles.foreach(arr.add)
            Files.write(defaultsDir(root).resolve(ref),
              jsonMapper.writeValueAsBytes(n))
            Seq(DefaultPrefix + f.name -> sql,
              DefaultPrefix + f.name + ".__since" -> (version + 1).toString,
              DefaultPrefix + f.name + ".__files" -> ref)
          }.toMap
        }
      val props =
        if (defaultProps.isEmpty) mapProps
        else Some(mapProps.getOrElse(tableProps(root, version)) ++ defaultProps)
      commit(spark, root, version, MetadataOnly, StructType(schema.fields ++ stamped),
        CommitAction("add_columns", Nil, Nil), props = props)
      Commit(version + 1, filesKept = prevFiles, filesRewritten = 0L, filesAdded = 0L)
    }

  /** SET TBLPROPERTIES: merge `kv` into the table's property map in ONE
    * metadata-only commit (manifest and schema unchanged). */
  /** Keys whose values must parse as positive longs — validated HERE,
    * loudly, so a typo'd sizing property can never brick later writes
    * (write-time parsing additionally falls back to defaults). */
  private[sources] val NumericProps =
    Set("graft.bloom.items", "graft.bloom.bits", DvMaxRowsProp,
      CheckpointIntervalProp,
      CowAutoMaintenance.SmallBytesProp, CowAutoMaintenance.MinFilesProp,
      CowAutoMaintenance.MaxPerTriggerProp)

  def setTableProperties(spark: SparkSession, root: String,
      kv: Map[String, String]): Commit =
    retrying(root, "FileCow.setTableProperties") { version =>
      kv.foreach { case (k, v) =>
        if (NumericProps.contains(k))
          require(scala.util.Try(v.trim.toLong).toOption.exists(_ > 0L),
            s"table property $k must be a positive integer, got '$v'")
      }
      // SET ('graft.default.<col>' = '<literal>') is the ALTER COLUMN SET
      // DEFAULT spelling: write-side only (no vintage sidecar — files that
      // predate it keep reading NULL; ADD COLUMN … DEFAULT is the fill-
      // on-read route). Validated like every default; the internal
      // __since/__files bookkeeping keys are refused.
      validateDefaultProps(spark, schemaOf(root, version), kv)
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
      // a dropped column's default props go with it (an orphan default
      // would fail the next same-name ADD's property validation)
      val prevProps = tableProps(root, version)
      val dropKeys = resolved.flatMap(r => defaultKeysFor(prevProps, r))
      // dropping a stats column changes the MANIFEST schema — a delta fold
      // cannot cross that, so the (file-count-sized) commit checkpoints
      commit(spark, root, version,
        FullManifest(man.select(keepManCols.map(col).toSeq: _*)), newSchema,
        CommitAction("drop_columns", Nil, Nil),
        props = if (dropKeys.isEmpty) None else Some(prevProps -- dropKeys))
      // the bloom declaration drops (and its tombstones land) only after
      // the commit wins its CAS — same post-commit discipline as rename:
      // a losing attempt must not leave the index dropped ahead of a
      // table that kept the column
      BloomStore.dropColumns(root, resolved)
      Commit(version + 1, filesKept = prevFiles, filesRewritten = 0L, filesAdded = 0L)
    }

  // ---------------------------------------------------------------- internals
}
