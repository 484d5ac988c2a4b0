package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path => NioPath, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** G17's CHANGE DATA FEED between snapshots, derived incrementally from
  * the commit log (each side's unshared files only — cost ∝ changed
  * data). Extracted along the VERDICT r10 seam; self-typed on
  * [[FileCow]]. */
private[sources] trait CowChangeFeed { this: FileCow.type =>

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
  private[sources] def unsharedFiles(spark: SparkSession, root: String,
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
}
