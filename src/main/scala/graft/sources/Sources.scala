package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Sources & sinks (SURVEY §2 G2/G3).
  *
  * Reference analog: the reference reads/writes CSV with an explicit
  * `dtype_spec` dict so types survive the text round-trip
  * (/root/reference/dw3_merge_inc.py:33-83) and lands facts in BigQuery
  * partitioned tables (/root/reference/dw5_order_royalty_fact.py). Here the
  * same contracts are the Spark-native ones: an explicit StructType carried
  * through csv/json, and `partitionBy` parquet for the fact sink so the date
  * predicate becomes partition pruning instead of a full scan.
  */
object Sources {

  /** G2: write `df` as CSV and read it back with df's own schema enforced
    * (FAILFAST — a drifted value errors instead of silently nulling). */
  def csvRoundTrip(spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true").option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .csv(path)
    readCsv(spark, path, df.schema)
  }

  /** Schema-enforced CSV reader — the dtype_spec analog. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true").option("mode", "FAILFAST")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .csv(path)

  /** G2: JSON round-trip with enforced schema (no sampling inference — at
    * 100 TB, schema inference is a full extra pass over the data). */
  def jsonRoundTrip(spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    df.write.mode(SaveMode.Overwrite).json(path)
    spark.read.schema(df.schema).option("mode", "FAILFAST").json(path)
  }

  /** G3: partitioned fact write — the scale path for the order-line fact.
    * Partitioning on a low-cardinality derived month key keeps file counts
    * bounded (one dir per month, not per day) while date-range queries prune
    * to the touched months at planning time. */
  def writeFactPartitioned(df: DataFrame, dateCol: String, path: String): Unit =
    df.withColumn("part_month", date_format(col(dateCol), "yyyy-MM"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("part_month")
      .parquet(path)

  def readFact(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** G5: small-file compaction for a partitioned landing. Streaming and
    * incremental writers (F-series sinks, q06-style merges) produce
    * batches × tasks files per partition; scans then pay per-file open cost
    * and the driver pays per-file listing state. Compaction rewrites each
    * partition directory through ONE shuffle task (hash repartition on the
    * partition key), re-split only by `maxRecordsPerFile` — so the file
    * count per partition drops to ⌈rows / maxRecordsPerFile⌉ regardless of
    * how many increments landed. At warehouse scale this runs on the
    * partitions an increment touched (filter before calling), not the whole
    * table; the transactional swap (write-audit-publish or Delta OPTIMIZE)
    * is the ADR-001 deployment path — here the rewrite lands in a fresh
    * directory for the caller to swap in. */
  def compactFact(spark: SparkSession, path: String, outPath: String,
      maxRecordsPerFile: Long): Unit =
    readFact(spark, path)
      .repartition(col("part_month"))
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("part_month")
      .parquet(outPath)

  /** G6: schema-evolution read. Incremental landings drift: a new source
    * field appears mid-history, so old files lack the column. Reading with
    * `mergeSchema` unions the file schemas (old rows surface NULL for new
    * columns — parquet's column-absent semantics, no rewrite of history),
    * and the caller's `expected` schema is then ENFORCED: missing expected
    * columns are added as typed NULLs, unexpected extras are dropped, and a
    * type conflict fails loudly instead of silently casting. This is the
    * reference's dtype_spec contract (dw3_merge_inc.py:33-83) applied to a
    * drifting parquet landing rather than CSV.
    *
    * Scale: mergeSchema's footer-union pass is driver-side metadata work
    * (bounded by file count, which G5 compaction keeps low); the projection
    * is a per-row map — no shuffle. */
  /** G7: DYNAMIC partition overwrite — the incremental-load sink. A nightly
    * (or streaming foreachBatch) increment touches a handful of date
    * partitions; `partitionOverwriteMode=dynamic` replaces EXACTLY the
    * partitions present in the increment and leaves every other directory
    * byte-untouched — the idempotent re-run semantics a scheduled loader
    * needs (re-running a day's load cannot clobber the rest of history),
    * without reading or rewriting the full table.
    *
    * Static overwrite (the default) would truncate the whole table first —
    * at 100 TB that is the difference between rewriting ~0.1% and 100% of
    * the fact. The mode is set per-write (option), not session-wide, so
    * callers sharing the session are unaffected. Deployment note: on an
    * ACID format this becomes `replaceWhere`/MERGE (ADR-001); on plain
    * parquet it relies on the job-commit protocol, which is atomic per
    * partition directory — the same guarantee the reference's scheduled
    * BigQuery loads lean on. */
  def overwriteIncrement(increment: DataFrame, dateCol: String, path: String): Unit = {
    increment.withColumn("part_month", date_format(col(dateCol), "yyyy-MM"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("part_month")
      .parquet(path)
    // In-place partition rewrite invalidates any cached file listing of the
    // table path — readers in this session would otherwise chase the
    // replaced files (FILE_NOT_EXIST). Same-session read-after-write is
    // exactly the foreachBatch loader pattern, so the sink refreshes.
    increment.sparkSession.catalog.refreshByPath(path)
  }

  def readFactEvolved(spark: SparkSession, path: String,
      expected: StructType): DataFrame = {
    val merged = spark.read.option("mergeSchema", "true").parquet(path)
    // Case-INSENSITIVE landing lookup, matching Spark's own resolution — a
    // landed 'Channel' must satisfy a contracted 'channel', not be silently
    // shadowed by an all-NULL column.
    val have = merged.schema.map(f => f.name.toLowerCase -> f).toMap
    val cols = expected.fields.map { f =>
      have.get(f.name.toLowerCase) match {
        case Some(g) if g.dataType == f.dataType => col(g.name).as(f.name)
        case Some(g) => throw new IllegalArgumentException(
          s"schema drift on '${f.name}': landing has ${g.dataType}, contract wants ${f.dataType}")
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }
    merged.select(cols.toIndexedSeq: _*)
  }

  /** G9: ZONED write — range-partition on the query key, sort within each
    * zone, and persist a min/max MANIFEST (one row per written file). This
    * is the data-skipping layout every table format (Iceberg manifests,
    * Delta file stats, parquet row-group zone maps) builds on: because a
    * range filter on a sorted layout touches only the files whose
    * [zmin, zmax] intersect it, a reader can prove most files irrelevant
    * from the manifest alone — partition pruning (G3) for keys too dense
    * to be directory keys.
    *
    * Scale: `repartitionByRange` is one range-shuffle (sampled bounds);
    * the manifest aggregate is one scan collapsing to |files| rows. At
    * 100 TB the manifest (KBs per thousand files) IS the planning input —
    * exactly what Iceberg ships in avro manifests; ADR-001's formats
    * replace the hand-rolled manifest, not the layout. */
  def writeFactZoned(df: DataFrame, keyCol: String, path: String, nZones: Int): Unit = {
    df.repartitionByRange(nZones, col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode(SaveMode.Overwrite).parquet(path)
    val spark = df.sparkSession
    spark.catalog.refreshByPath(path)
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(keyCol)).as("zmin"), max(col(keyCol)).as("zmax"),
        count(lit(1)).as("n_rows"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(path + "_zonemap")
  }

  /** The manifest-pruned file list for a [lo, hi] range — OBSERVATION API
    * (specs count admitted files with it); the query path does not call it.
    * Driver-side planning over one row per file, the same bounded metadata
    * pass every table format's planner runs. */
  def zonedFiles(spark: SparkSession, path: String, lo: Any, hi: Any): Seq[String] =
    spark.read.parquet(path + "_zonemap")
      .filter(col("zmax") >= lit(lo) && col("zmin") <= lit(hi))
      .select("file").collect().map(_.getString(0)).toSeq

  /** G9 read: a relation whose SCAN plans through [[ZoneMapFileIndex]] —
    * the range predicate is pushed as an ordinary dataFilter, the planner
    * translates it against the manifest relation, and only admitted files
    * are opened (or even materialized driver-side). The exact predicate is
    * re-applied to rows (zone bounds are necessary, not sufficient). An
    * empty admission returns an empty frame with the table's schema. */
  def readFactZoned(spark: SparkSession, path: String, keyCol: String,
      lo: Any, hi: Any): DataFrame =
    ZoneMapFileIndex.relation(spark, path, path + "_zonemap",
        Seq(ZoneDim(keyCol, "zmin", "zmax")))
      .filter(col(keyCol) >= lit(lo) && col(keyCol) <= lit(hi))

  /** G10: corrupt-record QUARANTINE for a JSON landing — the third contract
    * after FAILFAST (G2: any drift kills the job) and mergeSchema (G6:
    * benign drift absorbed): malformed rows must neither kill a 100 TB load
    * NOR silently vanish. The landing is read as raw text and each line is
    * parsed with `from_json` against the declared schema — a parse failure
    * yields a NULL struct, so routing is a null test, the original bytes of
    * every rejected line survive for forensics, and the same plan works
    * verbatim under `readStream` (no PERMISSIVE `_corrupt_record` column,
    * whose filter requires a cache barrier and dies on streaming scans).
    * Lines that parse but miss a required field are quarantined too — the
    * "valid JSON, broken record" class an audit would otherwise catch late.
    *
    * Returns (clean, quarantine): clean rows carry the declared schema;
    * quarantine rows carry the raw line + which gate rejected them. The
    * split is one scan, two narrow filters — no shuffle anywhere. */
  def readJsonQuarantined(spark: SparkSession, path: String, schema: StructType,
      required: Seq[String]): (DataFrame, DataFrame) = {
    // PERMISSIVE from_json yields an all-NULL struct for malformed input, so a
    // null test cannot separate "corrupt" from "every field absent" — the
    // declared corrupt-record column can (non-null ⇔ the parser rejected the
    // line and preserved it verbatim).
    val withCorrupt = schema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
    val parsed = spark.read.text(path)
      .select(col("value").as("raw"),
        from_json(col("value"), withCorrupt,
          Map("columnNameOfCorruptRecord" -> "_corrupt_record")).as("r"))
    // Blank/whitespace-only lines parse to a NULL struct (no corrupt-record
    // column populated) — they are malformed input, not a schema failure.
    val malformed = col("r").getField("_corrupt_record").isNotNull ||
      col("r").isNull || trim(col("raw")) === ""
    val missing = required.map(f => col("r").getField(f).isNull)
      .foldLeft(lit(false))(_ || _)
    val clean = parsed.filter(!malformed && !missing)
      .select(schema.fieldNames.map(f => col("r").getField(f).as(f)): _*)
    val quarantine = parsed.filter(malformed || missing)
      .select(col("raw"),
        when(malformed, "malformed").otherwise("missing_required").as("reason"))
    (clean, quarantine)
  }

  // ------------------------------------------------------------------ G12
  /** 16-bit Morton (Z-order) interleave of two already-normalized
    * coordinates — 32 shift/mask terms, pure codegen arithmetic.
    * private[graft] so ZOrderSpec can pin it against a reference
    * bit-interleave. */
  private[graft] def morton16(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftrightunsigned(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftrightunsigned(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Affine map of an integer column onto the 16-bit Morton grid.
    * private[graft]: [[FileCow.compactZOrder]] shares the grid. */
  private[graft] def norm16(c: Column, mn: Long, mx: Long): Column =
    if (mx == mn) lit(0L)
    else ((c.cast("long") - mn) * 65535L / (mx - mn)).cast("long")

  /** G12: Z-ORDER clustering — multi-dimensional data skipping, the
    * layout-side complement of G9's single-key zones (and the plain-parquet
    * analog of Delta/Iceberg's OPTIMIZE ZORDER; ADR-001). A file layout
    * range-sorted on one key gives that key tight per-file bounds but
    * leaves every OTHER key spanning its full range in every file — a
    * two-dimensional predicate prunes on one dimension and scans on the
    * other. Interleaving the two keys' bits (Morton order) makes each
    * file a roughly-square REGION of the (a, b) grid, so per-file min/max
    * bounds are tight in BOTH dimensions and a box predicate admits
    * O(files that touch the box), not O(files that touch its a-range).
    *
    * Both columns must be integer-valued (map dates through datediff
    * first); bounds for the grid normalization come from one min/max
    * aggregate — the same bounded planning pass every layout optimizer
    * runs. The manifest stores per-file min/max of the NATURAL columns
    * (never the Morton key — it exists only to order the shuffle), so
    * pruning logic stays the G9 interval intersection, per dimension.
    *
    * Scale: one range-shuffle on the Morton key + one manifest aggregate;
    * at 100 TB the manifest is KBs per thousand files and IS the planning
    * input. ZOrderSpec pins the contract: a box predicate reads exactly
    * its rows, and a secondary-dimension-only predicate prunes files where
    * the G9 linear layout provably cannot. */
  def writeFactZOrdered(df: DataFrame, colA: String, colB: String,
      path: String, nFiles: Int): Unit = {
    val r = df.agg(min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).head()
    if (r.isNullAt(0)) {
      // Empty input: min/max are null, so there is no grid to normalize
      // into. Still honor the write contract — an empty dataset plus an
      // empty zonemap — so readFactZOrdered opens the path and prunes
      // every file (of which there are none) instead of failing on a
      // missing manifest.
      df.write.mode(SaveMode.Overwrite).parquet(path)
      df.sparkSession.read.parquet(path)
        .groupBy(input_file_name().as("file"))
        .agg(min(col(colA)).as("amin"), max(col(colA)).as("amax"),
          min(col(colB)).as("bmin"), max(col(colB)).as("bmax"),
          count(lit(1)).as("n_rows"))
        .filter(col("n_rows") > 0) // drop the empty-file row, if any
        .coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(path + "_zonemap2")
      return
    }
    val z = morton16(norm16(col(colA), r.getLong(0), r.getLong(1)),
      norm16(col(colB), r.getLong(2), r.getLong(3)))
    df.withColumn("_zkey", z)
      .repartitionByRange(nFiles, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
      .write.mode(SaveMode.Overwrite).parquet(path)
    val spark = df.sparkSession
    spark.catalog.refreshByPath(path)
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(colA)).as("amin"), max(col(colA)).as("amax"),
        min(col(colB)).as("bmin"), max(col(colB)).as("bmax"),
        count(lit(1)).as("n_rows"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(path + "_zonemap2")
  }

  /** Manifest-pruned file list for a box predicate — OBSERVATION API (specs
    * count admitted files); the query path plans through the index instead.
    * Per-dimension interval intersection over one row per file. Pass `None`
    * for a dimension to leave it unconstrained. */
  def zoned2Files(spark: SparkSession, path: String,
      a: Option[(Any, Any)], b: Option[(Any, Any)]): Seq[String] = {
    val m = spark.read.parquet(path + "_zonemap2")
    val fa = a.map { case (lo, hi) => col("amax") >= lit(lo) && col("amin") <= lit(hi) }
      .getOrElse(lit(true))
    val fb = b.map { case (lo, hi) => col("bmax") >= lit(lo) && col("bmin") <= lit(hi) }
      .getOrElse(lit(true))
    m.filter(fa && fb).select("file").collect().map(_.getString(0)).toSeq
  }

  /** G12 read: the box predicate rides as dataFilters into a
    * [[ZoneMapFileIndex]] scan over BOTH natural dimensions — per-dimension
    * interval intersection happens against the manifest relation at
    * planning time, and the exact predicate is re-applied to rows (zone
    * bounds are necessary, not sufficient). */
  def readFactZOrdered(spark: SparkSession, path: String,
      colA: String, colB: String,
      a: Option[(Any, Any)], b: Option[(Any, Any)]): DataFrame = {
    val rel = ZoneMapFileIndex.relation(spark, path, path + "_zonemap2",
      Seq(ZoneDim(colA, "amin", "amax"), ZoneDim(colB, "bmin", "bmax")))
    val pa = a.map { case (lo, hi) => col(colA) >= lit(lo) && col(colA) <= lit(hi) }
      .getOrElse(lit(true))
    val pb = b.map { case (lo, hi) => col(colB) >= lit(lo) && col(colB) <= lit(hi) }
      .getOrElse(lit(true))
    rel.filter(pa && pb)
  }

  // ------------------------------------------------------------------ G13
  /** Compaction PLANNER — the decision table in front of G5's mechanism:
    * per partition directory, file count, total/average bytes, and the
    * action a table maintainer should take — 'compact' when the partition
    * holds more than `maxFiles` files OR holds several files averaging
    * below `minAvgBytes` (the small-file problem: every reader pays
    * per-file open/footer cost, every planner pays per-file metadata),
    * 'leave' otherwise. A single file is always 'leave' regardless of
    * size — rewriting one file into one file buys nothing.
    * Running compaction blindly over a 100 TB table rewrites
    * everything; this table scopes the rewrite to the partitions that
    * earned it (the OPTIMIZE planning pass of Delta/Iceberg, on plain
    * directories — ADR-001).
    *
    * Driver-side directory listing — one row per (partition, file), the
    * same bounded metadata pass every planner runs (G9's adjudicated
    * class); no Spark job at all until someone acts on the plan. */
  def compactionPlan(spark: SparkSession, path: String,
      maxFiles: Int, minAvgBytes: Long): DataFrame = {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val root = new java.io.File(path)
    val parts = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.contains("="))
    val rows = parts.toSeq.map { dir =>
      val files = Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      val bytes = files.map(_.length()).sum
      (dir.getName, files.length.toLong, bytes)
    }
    rows.toDF("partition", "n_files", "total_bytes")
      .withColumn("avg_bytes",
        when(col("n_files") > 0, col("total_bytes") / col("n_files")).otherwise(0L))
      .withColumn("action",
        when(col("n_files") > maxFiles || (col("n_files") > 1 && col("avg_bytes") < minAvgBytes),
          "compact").otherwise("leave"))
  }
}
