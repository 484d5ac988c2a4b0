package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path => NioPath, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Per-file BLOOM-INDEX integration — sizing, the sketch aggregate that
  * rides every stats scan, backfill indexing of existing tables, and
  * merge's probe-refined touched-file pruning. The sketch STORE is the
  * [[BloomStore]] sidecar; this trait is the write/plan integration.
  * Extracted along the VERDICT r10 seam; self-typed on [[FileCow]]. */
private[sources] trait CowBloomIndex { this: FileCow.type =>

  /** Per-file Bloom sizing — Spark's own runtime-filter defaults (1 M
    * expected items, 8 M bits ≈ 1 MB per file per indexed column). The
    * false-positive rate must stay far below 1/|probe batch|, because a
    * multi-key lookup or merge admits a file when ANY probe hits: at
    * 250 k rows/file this sizing gives ~2.5e-5 per probe, so even a
    * 100-key batch admits a non-holder with probability ~2.5e-3. An
    * undersized sketch silently degrades to stats-only admission (sound,
    * never wrong — a false positive only costs an extra file read). */
  private[sources] val BloomItemsPerFile = 1000000L
  private[sources] val BloomNumBits = 8L * BloomItemsPerFile

  /** One file's Bloom sketch of `c` — Spark's own sketch aggregate over
    * [[xxhash64]] of the value (nulls skipped — an equality probe can
    * never match NULL), so the query-side literal hashes identically. */
  private[sources] def bloomAggFor(c: String, items: Long, bits: Long): Column =
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
  private[sources] def bloomSizing(root: String): (Long, Long) = {
    val p = tableProps(root, currentVersion(root))
    (numericProp(p, "graft.bloom.items").getOrElse(BloomItemsPerFile),
     numericProp(p, "graft.bloom.bits").getOrElse(BloomNumBits))
  }

  /** A positive-long table property, or None — a value that fails to parse
    * falls back to the default rather than bricking every write (and
    * [[setTableProperties]] rejects bad values loudly up front). */
  private[sources] def numericProp(p: Map[String, String], key: String): Option[Long] =
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
    // the read-check-declare below is a read-modify-write of the
    // declaration file: it serializes under the SAME advisory-lock seam as
    // every other declaration/alias mutation (a concurrent rename's remap
    // read after our columns() but written before our declare would
    // otherwise be clobbered — resurrecting the renamed-away name, whose
    // old slices' sketches then wrongly skip for the wrong column)
    val fresh = TablePointer.withCommitLock(root) {
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
      val f = cols.filterNot(existing.contains)
      BloomStore.declare(root, existing ++ f)
      f
    }
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
  private[sources] val BloomMergeProbeCap = 10000

  /** Refine merge's stat-admitted touched-file set through the per-file
    * Bloom sketches: a file rewrites only if, for EVERY bloom-indexed merge
    * key, SOME source value might be in the file's sketch. On a scattered
    * key (content hash, UUID) the [min, max] stats admit nearly every file
    * for any batch; the sketches cut that to the files that actually hold
    * a batch key (false positives only ever cost an extra rewrite, never a
    * missed match — the same soundness direction as the read-side skip). */
  private[sources] def bloomPruneMerge(spark: SparkSession, root: String, version: Long,
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
}
