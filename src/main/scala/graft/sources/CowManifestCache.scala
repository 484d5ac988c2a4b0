package graft.sources

import java.nio.file.Paths

import org.apache.hadoop.fs.{FileStatus, Path}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

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
    val published = FileCow.currentVersion(root)
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
