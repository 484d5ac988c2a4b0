package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path => NioPath, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** DELETION VECTORS — the merge-on-read half of [[FileCow]]'s delete
  * path (Delta's DV analog): a versioned sidecar registry of deleted
  * (file, row_idx) rows that reads anti-join out, so small deletes touch
  * no data file. Extracted along the VERDICT r10 seam; self-typed on
  * [[FileCow]] — same object, same private surface. */
private[sources] trait CowDeletionVectors { this: FileCow.type =>

  // ------------------------------------------------------ deletion vectors

  private[graft] val DvEnabledProp = "graft.dv.enabled"
  private[graft] val DvMaxRowsProp = "graft.dv.maxRows"
  private[graft] val DvMaxRowsDefault = 200000L

  /** Full-manifest checkpoint cadence: a checkpoint lands every N delta
    * commits (`graft.checkpoint.interval` table property), bounding a cold
    * JVM's fold chain. Declared HERE, in a trait that linearizes before
    * [[CowMaintenance]], so [[NumericProps]]'s initializer can reference
    * it (trait vals initialize in linearization order — keep
    * CowDeletionVectors before CowMaintenance in FileCow's extends
    * chain). */
  private[graft] val CheckpointIntervalProp = "graft.checkpoint.interval"
  private[graft] val CheckpointIntervalDefault = 20L

  private[sources] def dvDir(root: String): NioPath = Paths.get(root, "_dv")
  private[sources] def dvRegistryFile(root: String, v: Long): NioPath =
    manifestsDir(root).resolve(s"m$v.dv.json")
  private[sources] val dvSchema = StructType(Seq(
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
  private[sources] def applyDvRegistry(spark: SparkSession,
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
    * vectors applied — the base-read every DML shares. Defaulted columns
    * fill by FILE VINTAGE here too (CowDefaults), so an UPDATE/DELETE/
    * compaction base over pre-ALTER files sees the default, never a
    * silent NULL its rewrite would then materialize. */
  private[sources] def readFilesWithDv(spark: SparkSession, root: String, v: Long,
      schema: StructType, files: Seq[String]): DataFrame = {
    if (isColumnMapped(schema)) ensureFieldIdConfs(spark)
    if (files.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else {
      def readRaw(fs: Seq[String]): DataFrame =
        applyDvRegistry(spark, dvRegistryOf(root, v),
          spark.read.schema(schema).parquet(fs: _*))
      val defaults =
        if (tableProps(root, v).keys.exists(_.startsWith(DefaultPrefix)))
          readDefaultsOf(spark, root, v,
            files.map(f => f.substring(f.lastIndexOf('/') + 1)).toSet)
        else Nil
      if (defaults.isEmpty) readRaw(files)
      else {
        val byBase = files.map(f => f.substring(f.lastIndexOf('/') + 1) -> f).toMap
        vintageGroups(defaults, byBase.keySet).map { case (lack, group) =>
          fillLacking(spark, readRaw(group.toSeq.map(byBase)), lack, defaults)
        }.reduce(_ unionByName _)
      }
    }
  }
  /** The DV delete: stats-admit candidate files exactly like the rewrite
    * path, find the LIVE matching rows' (basename, row index) via the
    * hidden metadata columns, fold them into the touched files' standing
    * vectors, and commit kind `delete_dv` with the MANIFEST UNCHANGED —
    * no data file is written or retired. Throws [[DvOverflow]] (before
    * committing anything) when the standing vector count would exceed the
    * cap; [[delete]] then falls back to the materializing rewrite. */
  private[sources] def dvDelete(spark: SparkSession, root: String, cond: Column): Commit =
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
}
