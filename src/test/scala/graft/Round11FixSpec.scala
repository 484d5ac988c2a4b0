package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.sources.{BloomStore, FileCow}

/** Round-11 ADVICE batch — each test pins one reviewed defect:
  *   1. A writer that crashed INSIDE its commit's lock body (artifacts
  *      moved, pointer not swapped) left marker files ABOVE the pointer
  *      that [[FileCow.versions]] counted as real: [[FileCow.lastTxn]]
  *      then reported the crashed batch committed (a recovering stream
  *      would SKIP it — data loss), COPY INTO's ledger marked its files
  *      loaded, and a crashed CREATE bricked the root forever. The
  *      pointer is now the single source of published truth; vacuum
  *      reclaims the orphaned artifacts.
  *   2. [[FileCow.manifest]] for v > currentVersion (crashed-attempt
  *      inspection) surfaced a raw parquet AnalysisException when the
  *      attempt was delta-shaped (no full manifest dir) — now a domain
  *      error naming what happened.
  *   3. [[FileCow.changesBetween]] across RENAME a→b + ADD COLUMNS (a) in
  *      one interval mapped BOTH end-schema columns back to the same
  *      fromVersion name — duplicate read schema (analysis error), and on
  *      legacy tables the re-added column would conflate with the old
  *      one's values. The re-added identity-collider now null-fills (it
  *      cannot have existed at fromVersion); a key on it fails loudly.
  *   4. User-facing cow reads carried `parquet.field.id` column metadata
  *      outward, so a frame derived from a cow read and written as plain
  *      parquet flipped that copy's later reads into id-resolution
  *      (session confs are the only gate Spark offers). Public reads now
  *      strip the ids; the metadata-only aggregate rewrite looks through
  *      the strip projection.
  *   5. The graft-cow TABLE stream silently null-filled a pinned column
  *      that vanished mid-run on a name-mapped (convert-vintage) table —
  *      real rows with a corrupted column until the restart guard fired.
  *      getBatch now applies the same fillable/fail-loudly discipline as
  *      the CDF source's conformTo (and keeps serving by field id across
  *      a metadata-only rename on mapped tables, where nothing vanished).
  */
class Round11FixSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Plant a crashed commit attempt at `v`: the commit record (and only
    * it) moved before the writer died — the pointer never swapped. */
  private def plantCrashedRecord(root: String, v: Long, kind: String,
      txn: Option[(String, Long)] = None,
      copied: Seq[String] = Nil): Unit = {
    val rec = mapper.createObjectNode()
    rec.put("version", v); rec.put("kind", kind)
    rec.put("commitMs", System.currentTimeMillis())
    rec.put("nFiles", 0L); rec.put("nRows", 0L); rec.put("bytes", 0L)
    rec.putArray("added"); rec.putArray("removed")
    txn.foreach { case (app, b) => rec.put("txnApp", app); rec.put("txnBatch", b) }
    if (copied.nonEmpty) {
      val arr = rec.putArray("copied"); copied.foreach(arr.add)
    }
    val dir = Paths.get(root, "_manifests")
    Files.createDirectories(dir)
    Files.write(dir.resolve(s"m$v.commit.json"), mapper.writeValueAsBytes(rec))
    ()
  }

  test("a crashed attempt above the pointer is invisible to published truth; vacuum reclaims it") {
    val root = Files.createTempDirectory("graft-r11-crash").resolve("t").toString
    FileCow.create(spark, root,
      spark.range(1, 11).select(col("id").as("k"), (col("id") * 10).as("v")),
      statsCols = Seq("k"))                                           // v1
    FileCow.append(spark, root,
      Seq((50L, 1L)).toDF("k", "v"), txn = Some(("app", 7L)))         // v2
    // a crashed v3 attempt whose record carries the NEXT batch's txn stamp
    plantCrashedRecord(root, 3L, "append", txn = Some(("app", 8L)))
    assert(FileCow.versions(root) == Seq(1L, 2L),
      "unpublished marker files must not count as versions")
    assert(FileCow.lastTxn(root, "app") == 7L,
      "a crashed attempt's txn stamp must not mark its batch committed — " +
        "the recovering stream would skip it (data loss)")
    assert(FileCow.history(spark, root).count() == 2L)
    // crashed delta-shaped attempt: inspection gets the domain error, not
    // a raw parquet AnalysisException on the missing manifest dir
    val e = intercept[IllegalArgumentException] {
      FileCow.manifest(spark, root, 3L).collect()
    }
    assert(e.getMessage.contains("not published") &&
      e.getMessage.contains("crashed"), e.getMessage)
    // vacuum sweeps the orphaned artifacts under its age floor
    FileCow.vacuum(spark, root, keep = 10, minAgeMs = 0L)
    assert(!FileCow.isRetained(root, 3L), "vacuum must reclaim the crashed record")
    assert(FileCow.versions(root) == Seq(1L, 2L), "published versions survive")
    // ... and an age floor younger than the artifacts keeps them (the
    // in-flight-commit guard)
    plantCrashedRecord(root, 3L, "append")
    FileCow.vacuum(spark, root, keep = 10, minAgeMs = 3600000L)
    assert(FileCow.isRetained(root, 3L),
      "a young crashed-looking attempt may be an IN-FLIGHT commit — the age floor guards it")
  }

  test("a root whose only commit attempt crashed is creatable, not bricked") {
    val root = Files.createTempDirectory("graft-r11-brick").resolve("t").toString
    plantCrashedRecord(root, 1L, "create")
    assert(FileCow.currentVersion(root) == 0L && FileCow.versions(root).isEmpty)
    val c = FileCow.create(spark, root,
      spark.range(1, 6).select(col("id").as("k"), col("id").as("v")),
      statsCols = Seq("k"))
    assert(c.version == 1L)
    assert(FileCow.read(spark, root).count() == 5L)
  }

  test("COPY INTO ignores a crashed attempt's ledger — its files still load") {
    val root = Files.createTempDirectory("graft-r11-copy").resolve("t").toString
    FileCow.create(spark, root,
      Seq((1L, 1L)).toDF("k", "v"), statsCols = Seq("k"))             // v1
    val landing = Files.createTempDirectory("graft-r11-landing").toString
    Seq((2L, 2L), (3L, 3L)).toDF("k", "v").coalesce(1)
      .write.mode("overwrite").parquet(landing)
    val landed = Files.list(Paths.get(landing)).iterator()
    val ids = new mutable.ArrayBuffer[String]
    while (landed.hasNext) {
      val p = landed.next()
      if (p.getFileName.toString.endsWith(".parquet") && Files.size(p) > 0)
        ids += s"$p:${Files.size(p)}"
    }
    // a crashed copy_into attempt recorded the landing files as ingested
    plantCrashedRecord(root, 2L, "copy_into", copied = ids.toSeq)
    val c = FileCow.copyInto(spark, root, landing)
    assert(c.version == 2L && c.filesAdded > 0L,
      "the crashed ledger entry must not mark the files already loaded")
    assert(FileCow.read(spark, root).count() == 3L)
  }

  test("change feed across rename a→b + re-added a: null-fill, no duplicate read schema") {
    val root = Files.createTempDirectory("graft-r11-readd").resolve("t").toString
    FileCow.create(spark, root,
      spark.range(1, 6).select(col("id").as("k"), (col("id") * 10).as("a")),
      statsCols = Seq("k"))                                           // v1
    FileCow.renameColumn(spark, root, "a", "b")                       // v2
    FileCow.addColumns(spark, root, Seq(StructField("a", LongType)))  // v3
    // rewrite a v1-era file so the interval has a real A side
    FileCow.merge(spark, root,
      Seq((3L, 999L, 7L)).toDF("k", "b", "a"), keys = Seq("k"))       // v4
    val feed = FileCow.changesBetween(spark, root, Seq("k"), 1L, 4L)
      .collect().map(r => (r.getString(0), r.getAs[Long]("k"),
        r.getAs[Any]("b"), r.getAs[Any]("a"))).toSet
    // pre-image: b carries the OLD a's value, re-added a is NULL (it did
    // not exist at v1); post-image carries both new values
    assert(feed.contains(("update_pre", 3L, 30L, null)), feed.toString)
    assert(feed.contains(("update_post", 3L, 999L, 7L)), feed.toString)
    assert(feed.size == 2, s"only k=3 changed: $feed")
    // keying the feed on the re-added column fails loudly — it has no
    // values at the interval start
    val e = intercept[IllegalArgumentException] {
      FileCow.changesBetween(spark, root, Seq("a"), 1L, 4L)
    }
    assert(e.getMessage.contains("re-added"), e.getMessage)
  }

  test("public cow reads strip parquet.field.id metadata; metadata-only aggregates survive the strip") {
    val root = Files.createTempDirectory("graft-r11-strip").resolve("t").toString
    FileCow.create(spark, root,
      spark.range(1, 101).select(col("id").as("k"), (col("id") * 2).as("v")),
      statsCols = Seq("k"))
    val df = FileCow.read(spark, root)
    assert(!df.schema.fields.exists(_.metadata.contains(FileCow.FieldIdKey)),
      "a user-facing frame must not smuggle field ids into unrelated writes")
    // the stripped frame round-trips through plain parquet without ids
    val out = Files.createTempDirectory("graft-r11-plain").toString
    df.write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() == 100L)
    // the strip projection must not break the metadata-only rewrite
    val agg = df.agg(count(lit(1)).as("n"), min("k").as("mn"), max("k").as("mx"))
    val metadataOnly = agg.queryExecution.optimizedPlan.collectFirst {
      case _: org.apache.spark.sql.execution.datasources.LogicalRelation => ()
    }.isEmpty
    assert(metadataOnly,
      s"count/min/max must still fold from the manifest:\n${agg.queryExecution.optimizedPlan}")
    val r = agg.collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (100L, 1L, 100L))
    // internal paths keep their ids: the table stays column-mapped
    assert(FileCow.isColumnMapped(FileCow.schemaOf(root, 1L)))
  }

  test("table stream fails loudly when a pinned column vanishes mid-run (legacy table)") {
    // convert-vintage: files carry no field ids, reads resolve BY NAME —
    // exactly where parquet null-padding used to corrupt silently
    val plain = Files.createTempDirectory("graft-r11-ts-plain").toString
    spark.range(1, 11).select(col("id").as("k"), (col("id") * 10).as("a"))
      .coalesce(1).write.mode("overwrite").parquet(plain)
    val root = Files.createTempDirectory("graft-r11-ts").resolve("t").toString
    FileCow.convert(spark, root, plain, statsCols = Seq("k"))         // v1
    val ckpt = Files.createTempDirectory("graft-r11-ts-ck").toString
    val got = mutable.Set.empty[(Long, Any)]
    val q = spark.readStream.format("graft-cow").option("root", root)
      .option("startingVersion", "0").load()
      .writeStream
      .foreachBatch((b: DataFrame, _: Long) => {
        got.synchronized {
          got ++= b.collect().map(r => (r.getLong(0), r.get(1)))
        }; ()
      })
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      assert(got.size == 10)
      FileCow.renameColumn(spark, root, "a", "b") // v2: legacy full rewrite, row-neutral
      FileCow.append(spark, root,
        Seq((100L, 1L)).toDF("k", "b"))           // v3: files carry the NEW name
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("vanished")),
        s"expected the mid-run vanished-column error, got: ${messages(e)}")
    } finally q.stop()
  }

  test("table stream keeps serving by field id across a mid-run rename (mapped table)") {
    val root = Files.createTempDirectory("graft-r11-ts2").resolve("t").toString
    FileCow.create(spark, root,
      spark.range(1, 6).select(col("id").as("k"), (col("id") * 10).as("a")),
      statsCols = Seq("k"))                                           // v1
    val ckpt = Files.createTempDirectory("graft-r11-ts2-ck").toString
    val got = mutable.Set.empty[(Long, Long)]
    val q = spark.readStream.format("graft-cow").option("root", root)
      .option("startingVersion", "0").load()
      .writeStream
      .foreachBatch((b: DataFrame, _: Long) => {
        got.synchronized {
          got ++= b.collect().map(r => (r.getLong(0), r.getLong(1)))
        }; ()
      })
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      assert(got.size == 5)
      FileCow.renameColumn(spark, root, "a", "b") // v2: metadata-only, id kept
      FileCow.append(spark, root,
        Seq((100L, 777L)).toDF("k", "b"))         // v3: new name, same field id
      q.processAllAvailable()
      assert(got.contains((100L, 777L)),
        "the pinned old-name column must keep resolving by field id mid-run")
    } finally q.stop()
  }

  test("a refused rename leaves the bloom declaration and alias chain untouched") {
    val root = Files.createTempDirectory("graft-r11-bloom").resolve("t").toString
    FileCow.create(spark, root,
      spark.range(1, 101).select(col("id").as("k"), col("id").as("u")),
      statsCols = Seq("k"), bloomCols = Seq("u"))                     // v1
    FileCow.renameColumn(spark, root, "u", "w")                       // v2
    assert(BloomStore.columns(root) == Seq("w"))
    assert(BloomStore.aliases(root)("w") == Seq("u"))
    // renaming another column ONTO a bloom-historical name is refused —
    // and must leave the store exactly as it was (the remap now lands
    // only after a commit wins its CAS)
    FileCow.addColumns(spark, root, Seq(StructField("x", LongType)))  // v3
    val e = intercept[IllegalArgumentException] {
      FileCow.renameColumn(spark, root, "x", "u")
    }
    assert(e.getMessage.contains("Bloom"), e.getMessage)
    assert(BloomStore.columns(root) == Seq("w"), "declaration untouched by the refusal")
    assert(BloomStore.aliases(root)("w") == Seq("u"), "alias chain untouched")
    assert(FileCow.schemaOf(root, FileCow.currentVersion(root)).fieldNames
      .toSeq == Seq("k", "w", "x"), "no commit landed for the refused rename")
  }
}
