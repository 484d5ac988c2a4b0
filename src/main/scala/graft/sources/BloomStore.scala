package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{BinaryType, StringType, StructField, StructType}
import org.apache.spark.util.sketch.BloomFilter

/** SIDECAR store for a cow table's per-file Bloom sketches — Delta's
  * bloom-filter-index layout, and the reason the sketches scale: they live
  * OUTSIDE the manifest, under `root/_bloom/`, as one immutable parquet
  * slice per data-writing commit holding `(file, bloom_<c> …)` rows for
  * that commit's NEW files only. The manifest stays slim (a 400-file
  * table's manifest does not grow by 400 MB of sketch bytes, and a commit
  * never rewrites old files' sketches), and reads fetch sketches LAZILY —
  * only for the files the stats admission already shortlisted, through a
  * bounded LRU of deserialized filters so serving workloads pay the read
  * once.
  *
  * Lifecycle: the indexed column set is declared once at create/convert in
  * `_bloom/columns` (renames/drops update it); slices referencing vacuumed
  * files become dead weight but never wrong (sketches are only ever probed
  * for LIVE candidate files, and a missing sketch admits — sound); DROP
  * TABLE removes the store with the root. Slices staged by a commit that
  * loses its CAS race are orphans of the same class as staged data files.
  */
private[graft] object BloomStore {

  /** Serialize alias/declaration READ-MODIFY-WRITES (rename/drop remaps
    * vs vacuum's prune) under the table's own commit lock
    * ([[TablePointer.withCommitLock]]): the JVM monitor inside it covers
    * same-JVM contenders, the advisory FILE lock covers a second driver
    * process — the same one seam every commit already serializes on, so a
    * cross-process rename and vacuum can never interleave a stale
    * read-modify-write (raced by the multi-writer stress harness). Callers
    * never hold the commit lock when entering (remaps run before/after the
    * commit's own lock window, never inside it), so this cannot deadlock
    * or nest the non-reentrant file lock. */
  private def rmw[T](root: String)(body: => T): T =
    TablePointer.withCommitLock(root)(body)

  private def dir(root: String): Path = Paths.get(root, "_bloom")
  private def markerFile(root: String): Path = dir(root).resolve("columns")
  private def aliasFile(root: String): Path = dir(root).resolve("aliases")

  /** The declared bloom-indexed columns (empty = no index). */
  def columns(root: String): Seq[String] =
    if (!Files.exists(markerFile(root))) Nil
    else new String(Files.readAllBytes(markerFile(root)), StandardCharsets.UTF_8)
      .trim.split(",").toSeq.map(_.trim).filter(_.nonEmpty)

  /** Historical slice-column names per CURRENT name (newest first) — a
    * METADATA-ONLY rename (column mapping) leaves existing slices keyed
    * by the old `bloom_<name>` column; the alias map lets probes keep
    * reading them (a rename relabels, so the sketch bytes stay exact).
    * Format: one `current=old1,old2` line per renamed column. */
  def aliases(root: String): Map[String, Seq[String]] =
    if (!Files.exists(aliasFile(root))) Map.empty
    else new String(Files.readAllBytes(aliasFile(root)), StandardCharsets.UTF_8)
      .split("\n").toSeq.map(_.trim).filter(_.nonEmpty).flatMap { line =>
        line.split("=", 2) match {
          case Array(k, v) =>
            Some(k.trim -> v.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
          case _ => None
        }
      }.toMap

  private def writeAliases(root: String, m: Map[String, Seq[String]]): Unit = {
    if (m.isEmpty) { Files.deleteIfExists(aliasFile(root)); () }
    else {
      Files.createDirectories(dir(root))
      // write-aside + ATOMIC_MOVE: a reader in another process sees the
      // old map or the new one, never a torn line
      val tmp = aliasFile(root).resolveSibling(
        s"aliases.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
      Files.write(tmp,
        m.toSeq.sortBy(_._1).map { case (k, v) => s"$k=${v.mkString(",")}" }
          .mkString("\n").getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, aliasFile(root),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    }
  }

  /** Every name the store has EVER keyed sketches by — declared names,
    * alias keys and alias values. A rename/backfill landing on one of
    * these would make stale `bloom_<name>` bytes probe-reachable for the
    * WRONG column (a wrong skip loses rows), so the callers refuse. */
  def historicalNames(root: String): Set[String] = {
    val a = aliases(root)
    columns(root).toSet ++ a.keySet ++ a.values.flatten
  }

  def declare(root: String, cols: Seq[String]): Unit = if (cols.nonEmpty) {
    Files.createDirectories(dir(root))
    // atomic for the same reason as the alias file: a concurrent probe's
    // columns() read must never see a half-written declaration
    val tmp = markerFile(root).resolveSibling(
      s"columns.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, cols.mkString(",").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, markerFile(root),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** Remap the declaration AND the alias chain: `to` inherits `from`'s
    * history with `from` prepended (newest alias first), so slices from
    * every vintage stay probe-readable after chained renames. */
  def renameColumn(root: String, from: String, to: String): Unit =
    rmw(root) {
      val cur = columns(root)
      if (cur.contains(from)) {
        declare(root, cur.map(c => if (c == from) to else c))
        val a = aliases(root)
        writeAliases(root, (a - from) + (to -> (from +: a.getOrElse(from, Nil))))
      }
    }

  def dropColumns(root: String, dropped: Seq[String]): Unit =
    rmw(root) {
    val cur = columns(root)
    val kept = cur.filterNot(dropped.contains)
    if (kept != cur) {
      if (kept.isEmpty) Files.deleteIfExists(markerFile(root))
      else declare(root, kept)
      // the dropped names become TOMBSTONES in the alias file (their
      // existing chains stay, never-renamed names gain an empty entry):
      // historicalNames must keep refusing a later rename/backfill onto
      // any name whose stale bytes still sit in old slices
      val a = aliases(root)
      val gone = cur.filter(dropped.contains)
      writeAliases(root, a ++ gone.filterNot(a.contains).map(_ -> Nil))
      ()
    }
  }

  /** A fresh slice directory for one commit's new files' sketches. */
  def newSliceDir(root: String): Path = {
    Files.createDirectories(dir(root))
    dir(root).resolve(s"s-${java.util.UUID.randomUUID().toString.take(12)}")
  }

  private def sliceDirs(root: String): Seq[String] = {
    val d = dir(root)
    if (!Files.exists(d)) return Nil
    val list = Files.list(d)
    try {
      val b = Seq.newBuilder[String]
      val it = list.iterator()
      while (it.hasNext) {
        val p = it.next()
        if (p.getFileName.toString.startsWith("s-")) b += p.toString
      }
      b.result()
    } finally list.close()
  }

  /** Vacuum's sidecar sweep: delete every slice dir (old enough to clear
    * `minAgeMs`, the same in-flight-commit guard as data files — a racing
    * commit's freshly staged slice must survive until its CAS resolves)
    * NONE of whose sketched files are still referenced. A slice with any
    * live file stays whole. Returns deleted slice dirs. */
  def vacuumSlices(spark: SparkSession, root: String,
      referenced: Set[String], minAgeMs: Long): Seq[String] = {
    val now = System.currentTimeMillis()
    val removed = sliceDirs(root).filter { d =>
      val p = Paths.get(d)
      // a concurrent vacuum may delete the dir between listing and stat
      val age = try Some(Files.getLastModifiedTime(p).toMillis)
                catch { case _: java.nio.file.NoSuchFileException => None }
      age.exists(now - _ >= minAgeMs) && {
        val schema = StructType(Seq(StructField("file", StringType)))
        spark.read.schema(schema).parquet(d).collect()
          .forall(r => !referenced.contains(r.getString(0)))
      }
    }.map { d => FileCow.deleteTree(Paths.get(d)); d }
    // alias/tombstone entries exist to guard STALE bloom_<name> bytes in
    // old slices; once no surviving slice carries a name, the guard (and
    // the rename/backfill refusal) LIFTS — this is what makes the
    // advertised "OPTIMIZE (rewrite), then VACUUM" remediation real.
    // Pruning only runs when THIS vacuum removed a slice (otherwise the
    // map cannot have newly qualified), under the table's commit lock (a
    // concurrent rename's remap — same-JVM or another process — must not
    // be clobbered by a stale read-modify-write), and aborts harmlessly if
    // any surviving dir is unreadable (a concurrent commit's mid-write
    // slice) — keeping a prunable entry one vacuum longer is sound;
    // dropping a live one is not.
    if (removed.nonEmpty) rmw(root) {
      val a = aliases(root)
      if (a.nonEmpty) {
        try {
          val live: Set[String] = sliceDirs(root).flatMap { d =>
            spark.read.parquet(d).schema.fieldNames.toSeq
              .filter(_.startsWith("bloom_")).map(_.stripPrefix("bloom_"))
          }.toSet
          val declared = columns(root).toSet
          val pruned = a.flatMap { case (k, chain) =>
            val keep = chain.filter(live.contains)
            // a tombstone stays only while its own stale bytes survive; a
            // CURRENT column's own slices are never stale, so an emptied
            // chain under a declared name drops entirely
            if (keep.nonEmpty || (live.contains(k) && !declared.contains(k)))
              Some(k -> keep)
            else None
          }
          if (pruned != a) writeAliases(root, pruned)
        } catch { case _: org.apache.spark.sql.AnalysisException => () }
      }
    }
    removed
  }

  // deserialized-filter LRU: ~1 MB each, bounded count — serving workloads
  // read and inflate a file's sketch once, not per query. Sized so a
  // point-lookup loop over a table at the feature's target scale
  // (hundreds of candidate files) fits without thrashing; ~1 GiB worst.
  private val MaxCached = 1024
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, String), Option[BloomFilter]](
        MaxCached, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String), Option[BloomFilter]]): Boolean =
        size() > MaxCached
    })

  /** Deserialized sketches of `colName` for exactly `files` (full paths, as
    * the manifest names them). A file with no sketch row maps to None —
    * the caller must ADMIT it (missing index is never an excuse to skip).
    * Cache misses load in ONE parquet read over the slice store, filtered
    * to the missing paths; slices written before a rename lack the renamed
    * column and read as null (→ None → admit) under the explicit schema. */
  def filtersFor(spark: SparkSession, root: String, colName: String,
      files: Seq[String]): Map[String, Option[BloomFilter]] = {
    val keyOf = (f: String) => (f, colName)
    val hit = scala.collection.mutable.Map.empty[String, Option[BloomFilter]]
    val misses = files.filter { f =>
      val c = cache.get(keyOf(f))
      if (c != null) { hit(f) = c; false } else true
    }
    if (misses.nonEmpty) {
      val dirs = sliceDirs(root)
      val loaded: Map[String, Option[BloomFilter]] =
        if (dirs.isEmpty) Map.empty
        else {
          // slices written before a METADATA-ONLY rename key the sketch by
          // the then-current name — probe the current column FIRST, then
          // the alias chain newest-first (a file's sketch lives in exactly
          // one slice, so at most one of these is non-null per row)
          val names = colName +: aliases(root).getOrElse(colName, Nil)
          val schema = StructType(StructField("file", StringType) +:
            names.map(n => StructField(s"bloom_$n", BinaryType)))
          spark.read.schema(schema).parquet(dirs: _*)
            .filter(col("file").isin(misses: _*))
            .collect()
            .flatMap { r =>
              val b = names.iterator.map(n => r.getAs[Array[Byte]](s"bloom_$n"))
                .find(_ != null).orNull
              if (b == null) None
              else Some(r.getString(0) ->
                Some(BloomFilter.readFrom(new ByteArrayInputStream(b))))
            }.toMap
        }
      misses.foreach { f =>
        val v = loaded.getOrElse(f, None)
        // a MISSING sketch is never cached: it may be transient (a
        // backfill slice landing between declare and first probe), and a
        // pinned None would silently disable the index for that file for
        // the JVM's lifetime — re-checking costs one batched slice read
        // per lookup only while gaps actually exist
        if (v.isDefined) cache.put(keyOf(f), v)
        hit(f) = v
      }
    }
    hit.toMap
  }
}
