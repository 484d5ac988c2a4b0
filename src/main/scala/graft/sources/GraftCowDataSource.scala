package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.execution.streaming.{Sink, Source}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider,
  DataSourceRegister, RelationProvider, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

import graft.streaming.{CdfSource, CowTableSource}

/** The IDIOMATIC DataFrame API surface for cow tables — the shape a Delta
  * user reaches for before any SQL:
  *
  * {{{
  *   spark.read.format("graft-cow").option("root", root).load()
  *   spark.read.format("graft-cow").option("root", root)
  *     .option("versionAsOf", 3).load()                    // time travel
  *   df.write.format("graft-cow").option("root", root)
  *     .mode("append").save()                              // FileCow.append
  *   df.write.format("graft-cow").option("root", root)
  *     .mode("overwrite").save()                           // one replace commit
  * }}}
  *
  * Reads hand Spark the SAME manifest-pruned [[org.apache.spark.sql
  * .execution.datasources.HadoopFsRelation]] the SQL path plans through
  * (pushed filters prune files; no second code path to drift). Writes map
  * SaveMode onto the commit vocabulary: `Append` → [[FileCow.append]]
  * (bootstrap-creates on first write, like the first INSERT),
  * `Overwrite` → [[FileCow.overwrite]], `ErrorIfExists` → [[FileCow
  * .create]], `Ignore` → create-if-absent. `statsCols` (comma list)
  * overrides the default stats set ([[FileCow.statsEligible]]); the
  * creating write is range-partitioned on the lead stats column so DML
  * pruning bites from version 1. `bloomCols` (comma list) declares
  * bloom-indexed columns on the creating write (equality skipping for
  * scattered keys; carried forward by every rewrite).
  */
class GraftCowDataSource extends RelationProvider
    with CreatableRelationProvider with StreamSinkProvider
    with StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-cow"

  /** `spark.readStream.format("graft-cow")` — the table as a stream:
    * each commit's newly appended rows arrive as a micro-batch
    * ([[graft.streaming.CowTableSource]]; change commits fail unless
    * `skipChangeCommits=true`). With `readChangeFeed=true` (+ `keys`)
    * the stream is the F19 change feed instead — every commit
    * representable, rows tagged `_change_type`/`_commit_version`.
    * `startingVersion`/`startingTimestamp` position the start; the
    * resolved start is pinned in checkpoint metadata across restarts.
    * `maxVersionsPerTrigger` bounds each micro-batch to N commits (the
    * Delta `maxFilesPerTrigger` analog) and `maxBytesPerTrigger` to B
    * cumulative new-data bytes ("512m"/"10g"/plain bytes — the soft max
    * that bounds the batch after one fat COPY INTO lands among small
    * commits; at least one commit always admits), so a long-idle
    * checkpoint drains its backlog in bounded batches; the delivered-to
    * position persists in checkpoint metadata so a clean restart cannot
    * regress below what the checkpoint committed. */
  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, params: Map[String, String]): (String, StructType) = {
    val r = root(params)
    if (readsChangeFeed(params)) ("graft-cow", CdfSource.feedSchema(r))
    else {
      val v = FileCow.visibleVersion(r)
      require(v > 0L, s"graft-cow: no published version under $r")
      ("graft-cow", FileCow.schemaOf(r, v))
    }
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      params: Map[String, String]): Source = {
    val r = root(params)
    val start = CdfSource.pinnedStart(metadataPath, r, params)
    val maxPerTrigger = params.get("maxVersionsPerTrigger").map(_.toLong)
    // Delta's maxBytesPerTrigger soft max — byte-string spellings accepted
    // ("512m", "10g", or plain bytes); see [[CdfSource.admitUpTo]]
    val maxBytes = params.get("maxBytesPerTrigger").map(
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes)
    if (readsChangeFeed(params)) {
      val keys = params.getOrElse("keys", sys.error(
        "graft-cow: readChangeFeed requires the 'keys' option (the table's " +
        "merge keys — the change feed classifies rows by key presence)"))
        .split(",").map(_.trim).toSeq
      // the feed schema pins at stream birth like the table stream's —
      // a restart across a rename/drop commit fails loudly; the MODE pins
      // too (a table-stream checkpoint reused as a change feed would pass
      // the widening check and silently re-tag replayed rows)
      CdfSource.pinnedMode(metadataPath, "cdf")
      val pinnedFeed = CdfSource.pinnedSchema(metadataPath, CdfSource.feedSchema(r))
      new CdfSource(ctx, r, keys, start, maxPerTrigger, Some(metadataPath),
        pinnedFeedSchema = Some(pinnedFeed), maxBytesPerTrigger = maxBytes)
    } else {
      // the stream's BIRTH schema is persisted like the start version: a
      // restart adopts a pure widening (additive evolution), and fails
      // loudly after drop/rename-column commits — never silently re-reads
      // WAL-replayed batches under a different column set than the sink
      // already consumed ([[CdfSource.pinnedSchema]])
      CdfSource.pinnedMode(metadataPath, "table")
      val pinned = CdfSource.pinnedSchema(metadataPath,
        sourceSchema(ctx, schema, providerName, params)._2)
      new CowTableSource(ctx, r, pinned,
        start, params.get("skipChangeCommits").exists(_.toBoolean),
        maxPerTrigger, Some(metadataPath), maxBytesPerTrigger = maxBytes)
    }
  }

  private def readsChangeFeed(params: Map[String, String]): Boolean =
    params.get("readChangeFeed").exists(_.toBoolean)

  /** `option("mergeSchema", "true")` on an append (Delta's writer option):
    * the frame's NEW columns evolve the table first (a metadata-only
    * `addColumns` commit — nullable, no file touched), then the frame is
    * projected onto the evolved schema, with table columns the frame
    * lacks padded null. Without the option, [[FileCow.append]]'s exact
    * schema contract stands and drift fails loudly. */
  private def evolveForAppend(spark: SparkSession, r: String,
      df: DataFrame, params: Map[String, String]): DataFrame = {
    if (!params.get("mergeSchema").exists(_.toBoolean)) return df
    import org.apache.spark.sql.functions.{col, lit}
    val table = FileCow.schemaOf(r, FileCow.currentVersion(r))
    val existing = table.fieldNames.map(_.toLowerCase).toSet
    val fresh = df.schema.fields.toSeq
      .filterNot(f => existing(f.name.toLowerCase))
      .map(_.copy(nullable = true))
    if (fresh.nonEmpty) FileCow.addColumns(spark, r, fresh)
    val evolved = FileCow.schemaOf(r, FileCow.currentVersion(r))
    val have = df.schema.fieldNames.map(n => n.toLowerCase -> n).toMap
    df.select(evolved.fields.toSeq.map { f =>
      have.get(f.name.toLowerCase) match {
        case Some(n) => col(n).cast(f.dataType).as(f.name)
        case None =>
          // padding NULL into a NOT NULL column would poison reads (the
          // declared no-null contract lets the reader skip null checks)
          require(f.nullable, s"mergeSchema append: the frame lacks table " +
            s"column '${f.name}', which is NOT NULL — nothing to pad with")
          lit(null).cast(f.dataType).as(f.name)
      }
    }: _*)
  }

  /** `df.writeStream.format("graft-cow")` — the streaming write surface
    * behind the idiomatic spelling. APPEND output mode = the F20
    * exactly-once append sink: each micro-batch is one append commit
    * stamped (appId, batchId) INSIDE the CAS (no marker window; a
    * replayed batch cannot duplicate). UPDATE output mode = the generic
    * keyed latest-wins upsert ([[graft.streaming.CowKeyedUpsertSink]]):
    * `keys` + `orderBy` options supply the facts a generic sink cannot
    * guess, the winner per key is deterministic (total lexicographic
    * tiebreak), each batch merges at touched-file scope, replays skip via
    * the txn marker. Common options: `root` (required), `appId` (required
    * — the txn identity; keep it stable across restarts), `statsCols`
    * (comma list for the creating batch), `filesHint`. */
  override def createSink(ctx: SQLContext, params: Map[String, String],
      partitionColumns: Seq[String], outputMode: OutputMode): Sink = {
    require(partitionColumns.isEmpty, "graft-cow sink: partitionBy unsupported " +
      "(layout is range-partitioning on the lead stats column; hive-style " +
      "partition columns are adjudicated — with measurements — in " +
      "docs/ADR-002-partition-columns.md)")
    val r = root(params)
    // the txn identity: explicit `appId`, else derived STABLY from the
    // query's checkpoint location, so the plain
    // `writeStream.toTable("graft.t")` spelling is exactly-once with zero
    // options. The checkpoint IS the stream's replay identity, so keying
    // the txn stamp on it is exactly as stable as the recovery story
    // itself. When the checkpoint comes from the session-wide
    // `spark.sql.streaming.checkpointLocation` conf, Spark resolves it
    // only AFTER createSink — so the fallback resolves it lazily at first
    // addBatch from the running query itself (addBatch runs on the
    // query's execution thread; same normalization, same derived id).
    def ckptAppId(cp: String): String = "ckpt-" +
      java.util.UUID.nameUUIDFromBytes(
        java.nio.file.Paths.get(normalizePath(cp)).toAbsolutePath.normalize
          .toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .toString.take(12)
    lazy val appId = params.get("appId")
      .orElse(params.get("checkpointLocation").map(ckptAppId))
      .orElse(org.apache.spark.sql.GraftBridge
        .currentStreamCheckpoint(ctx.sparkSession).map(ckptAppId))
      .getOrElse(sys.error(
        "graft-cow sink: txn identity unresolved — pass 'appId' or " +
          "'checkpointLocation' as a sink option (no running stream " +
          "checkpoint found on this thread)"))
    val filesHint = params.get("filesHint").map(_.toInt).getOrElse(4)
    def stats(data: DataFrame): Seq[String] = params.get("statsCols")
      .map(_.split(",").map(_.trim).toSeq)
      .getOrElse(FileCow.statsEligible(data.schema))
    if (outputMode == OutputMode.Update()) {
      // keyed latest-wins upsert: the two facts a generic sink cannot
      // guess arrive as options — the key columns and the recency column
      val keys = params.getOrElse("keys", sys.error("graft-cow sink: update " +
        "output mode requires the 'keys' option (the upsert key columns)"))
        .split(",").map(_.trim).toSeq
      val orderBy = params.getOrElse("orderBy", sys.error("graft-cow sink: " +
        "update output mode requires the 'orderBy' option (the recency " +
        "column latest-wins resolves on)"))
      new Sink {
        override def addBatch(batchId: Long, data: DataFrame): Unit = {
          val batch = org.apache.spark.sql.GraftBridge.asBatch(data)
          graft.streaming.CowKeyedUpsertSink.commitBatch(
            batch, r, appId, batchId, keys, orderBy,
            params.get("statsCols").map(_.split(",").map(_.trim).toSeq)
              .getOrElse(keys), filesHint)
        }
        override def toString: String = s"GraftCowUpsertSink[$r]"
      }
    } else {
      require(outputMode == OutputMode.Append(),
        s"graft-cow sink: append or update output mode, got $outputMode")
      new Sink {
        override def addBatch(batchId: Long, data: DataFrame): Unit = {
          // the streaming frame cannot be written directly — re-plan its
          // rows as a batch frame the same way foreachBatch does
          val batch = org.apache.spark.sql.GraftBridge.asBatch(data)
          graft.streaming.CowAppendSink.commitBatch(
            batch, r, appId, batchId, stats(batch), filesHint)
        }
        override def toString: String = s"GraftCowAppendSink[$r]"
      }
    }
  }

  /** The table root: the explicit `root` option, or the `path` option the
    * `writeStream.toTable` v1 fallback injects (Spark passes the catalog
    * table's LOCATION as a `file:` URI string — normalize it back to the
    * local path the cow layout keys on). */
  private def root(params: Map[String, String]): String =
    params.get("root").orElse(params.get("path").map(normalizePath))
      .getOrElse(sys.error("graft-cow: 'root' option is required"))

  private def normalizePath(p: String): String =
    if (p.startsWith("file:")) java.nio.file.Paths.get(java.net.URI.create(p)).toString
    else p

  private def resolveVersion(root: String, params: Map[String, String]): Long = {
    val v = params.get("versionAsOf").map(_.toLong)
      .orElse(params.get("timestampAsOf").map(ts =>
        FileCow.versionAtTimestamp(root, parseTs(ts))))
      .getOrElse(FileCow.visibleVersion(root))
    // an explicitly named version inside an open/aborted cross-table txn
    // was never visible — refuse rather than serve phantom state
    GraftTransactions.requireReadable(root, v)
    v
  }

  private def parseTs(s: String): Long =
    if (s.forall(_.isDigit)) s.toLong
    else java.sql.Timestamp.valueOf(s).getTime

  override def createRelation(ctx: SQLContext,
      params: Map[String, String]): BaseRelation = {
    val r = root(params)
    require(FileCow.currentVersion(r) > 0L,
      s"graft-cow: no published version under $r")
    val v = resolveVersion(r, params)
    // a BaseRelation cannot express the deletion-vector anti-join, and
    // returning the bare relation would RESURRECT deleted rows — refuse
    // loudly; SQL and FileCow.read apply vectors and stay available
    require(FileCow.dvRegistryOf(r, v).isEmpty,
      s"graft-cow: version $v of $r carries deletion vectors, which the " +
        "format reader cannot apply — read via SQL / FileCow.read, or " +
        "OPTIMIZE to materialize the vectors")
    FileCow.relationFor(ctx.sparkSession, r, v)
  }

  override def createRelation(ctx: SQLContext, mode: SaveMode,
      params: Map[String, String], df: DataFrame): BaseRelation = {
    val spark = ctx.sparkSession
    val r = root(params)
    val exists = FileCow.currentVersion(r) > 0L
    def stats: Seq[String] = params.get("statsCols")
      .map(_.split(",").map(_.trim).toSeq)
      .getOrElse(FileCow.statsEligible(df.schema))
    def create(): Unit = {
      val s = stats
      require(s.nonEmpty, "graft-cow: no stats-eligible column to create with")
      // bloomCols (comma list): per-file Bloom sketches for equality
      // skipping on scattered keys — FileCow.create's bloom index
      val blooms = params.get("bloomCols")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
      FileCow.create(spark, r, FileCow.rangedByLead(df, s), statsCols = s,
        bloomCols = blooms)
      ()
    }
    mode match {
      case SaveMode.Append =>
        if (exists) FileCow.append(spark, r, evolveForAppend(spark, r, df, params))
        else create()
      case SaveMode.Overwrite => if (exists) FileCow.overwrite(spark, r, df) else create()
      case SaveMode.ErrorIfExists =>
        require(!exists, s"graft-cow: table already exists at $r (mode ErrorIfExists)")
        create()
      case SaveMode.Ignore => if (!exists) create()
    }
    FileCow.relationFor(spark, r, FileCow.visibleVersion(r))
  }
}
