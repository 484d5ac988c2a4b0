package graft

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException

import graft.sources.FileCow

/** Round-10 self-review fixes, each spec-pinned:
  *
  *   1. every cow data-file read path ensures the field-id read conf
  *      itself — a fresh reader-only session (conf never set by
  *      relationFor) reading a RENAMED mapped table through
  *      changesBetween / DML base reads must resolve by id, not read the
  *      renamed column as NULL;
  *   2. the table-stream birth-schema widening check compares FIELD IDS,
  *      so a drop + same-name re-add (fresh id — pre-drop files would
  *      replay NULL) fails loudly instead of passing as a widening;
  *   3. the CDF stream pins its feed schema at birth like the table
  *      stream — a restart across a rename fails loudly instead of
  *      silently re-reading WAL-replayed batches under new names.
  */
class Round10FixSpec2 extends SparkSpec {
  import spark.implicits._

  private def mkMapped(): String = {
    val root = Files.createTempDirectory("r10b").resolve("t").toString
    FileCow.create(spark, root,
      spark.range(1, 21).select(col("id").as("k"), (col("id") * 10).as("v"))
        .repartitionByRange(2, col("k")),
      statsCols = Seq("k"))
    root
  }

  /** Simulate a fresh reader-only JVM: the session-global field-id read
    * conf is unset, so only the code path under test can restore it. */
  private def unsetFieldIdConfs(): Unit = {
    spark.conf.unset("spark.sql.parquet.fieldId.read.enabled")
    spark.conf.unset("spark.sql.parquet.fieldId.write.enabled")
  }

  test("changesBetween resolves renamed columns by id without a prior plan") {
    val root = mkMapped()                            // v1
    FileCow.renameColumn(spark, root, "v", "w")      // v2: metadata-only
    FileCow.delete(spark, root, col("w") === 50L)    // v3
    unsetFieldIdConfs()
    val feed = FileCow.changesBetween(spark, root, Seq("k"), 2L, 3L)
      .select("_change_type", "k", "w").as[(String, Long, Long)].collect().toSet
    assert(feed == Set(("delete", 5L, 50L)),
      s"the pre-image must carry the real value read by field id, got $feed")
  }

  test("DML predicates on a renamed column evaluate against real values") {
    val root = mkMapped()                            // v1
    FileCow.renameColumn(spark, root, "v", "w")      // v2
    unsetFieldIdConfs()
    FileCow.delete(spark, root, col("w") > 180L)     // v3: touches ids 19, 20
    val left = FileCow.read(spark, root).select("k").as[Long].collect().toSet
    assert(left == (1L to 18L).toSet,
      s"delete must remove exactly w>180 (k=19,20), left $left")
  }

  test("table-stream restart across drop + same-name re-add fails loudly") {
    val root = mkMapped()                            // v1
    val ckpt = Files.createTempDirectory("r10b-ck").toString
    val got = mutable.Set.empty[Long]
    def run(): Unit = {
      val q = spark.readStream.format("graft-cow").option("root", root)
        .option("startingVersion", "0").load()
        .writeStream
        .foreachBatch((b: DataFrame, _: Long) =>
          { got.synchronized { got ++= b.select("k").as[Long].collect() }; () })
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(got.size == 20)
    FileCow.dropColumns(spark, root, Seq("v"))       // v2
    FileCow.addColumns(spark, root, Seq(
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType, nullable = true))) // v3: FRESH id
    val e = intercept[Exception] { run() }
    assert(e.getMessage.contains("incompatibly") ||
      Option(e.getCause).exists(_.getMessage.contains("incompatibly")),
      s"drop + re-add must fail the pinned-schema guard, got: ${e.getMessage}")
  }

  test("bloom remap orders AFTER the CAS: a lost attempt leaves no remap; a foreign one refuses") {
    // The round-10 version of this test simulated "remap landed, CAS
    // lost" and expected the retry to adopt it — that ordering is GONE
    // (ADVICE r10: the remap now lands only after the commit wins its
    // CAS, so a losing/aborting rename can never leave the index keyed by
    // a name the table never adopted). The new pins:
    //  1. an ABORTING rename (refused before its CAS) leaves declaration
    //     and alias chain untouched — no drift to recover from;
    //  2. a remap that somehow PRE-EXISTS without its commit (the old
    //     hazard state, reachable only by out-of-band tampering now) is
    //     refused loudly as a recycled name — the FAIL-SAFE direction
    //     (no wrong skip), not silently adopted.
    val root = Files.createTempDirectory("r10b-ren").resolve("t").toString
    FileCow.create(spark, root,
      spark.range(1, 21).select(col("id").as("k"),
        ((col("id") * 2654435761L) % 1000003L).as("u")),
      statsCols = Seq("k"), bloomCols = Seq("u"))
    // 1. an aborting rename (target name exists → refused before its CAS)
    intercept[Exception] { FileCow.renameColumn(spark, root, "u", "k") }
    assert(graft.sources.BloomStore.columns(root) == Seq("u"),
      "a refused rename must not remap the declaration")
    assert(graft.sources.BloomStore.aliases(root).getOrElse("u", Nil).isEmpty)
    // 2. the tampered state: remap present, commit absent
    graft.sources.BloomStore.renameColumn(root, "u", "uid")
    val e = intercept[IllegalArgumentException] {
      FileCow.renameColumn(spark, root, "u", "uid")
    }
    assert(e.getMessage.contains("uid"), s"got: ${e.getMessage}")
    // fail-safe direction: the table still serves exact rows on u
    val probe = (5L * 2654435761L) % 1000003L
    assert(FileCow.read(spark, root).filter(col("u") === probe).count() == 1L)
  }

  test("OPTIMIZE + VACUUM lifts the recycled-bloom-name refusal") {
    val root = Files.createTempDirectory("r10b-lift").resolve("t").toString
    FileCow.create(spark, root,
      spark.range(1, 21).select(col("id").as("k"),
        ((col("id") * 2654435761L) % 1000003L).as("u"),
        concat(lit("s"), col("id")).as("s")),
      statsCols = Seq("k"), bloomCols = Seq("u"))
    FileCow.dropColumns(spark, root, Seq("u"))
    intercept[IllegalArgumentException] {
      FileCow.renameColumn(spark, root, "s", "u")
    }
    // the advertised remediation: rewrite every sketched file, vacuum the
    // now-dead slices — the tombstone prunes and the name frees up
    FileCow.compact(spark, root, targetFiles = 1)
    FileCow.vacuum(spark, root, keep = 1, minAgeMs = 0L)
    val c = FileCow.renameColumn(spark, root, "s", "u")
    assert(FileCow.schemaOf(root, FileCow.currentVersion(root))
      .fieldNames.toSeq.contains("u"))
    assert(c.filesRewritten == 0L, "post-remediation rename is metadata-only again")
  }

  test("a table-stream checkpoint cannot be restarted as a change feed") {
    val root = mkMapped()
    val ckpt = Files.createTempDirectory("r10b-mode").toString
    val q = spark.readStream.format("graft-cow").option("root", root)
      .option("startingVersion", "0").load()
      .writeStream.foreachBatch((_: DataFrame, _: Long) => ())
      .option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()
    val e = intercept[Exception] {
      val q2 = spark.readStream.format("graft-cow").option("root", root)
        .option("readChangeFeed", "true").option("keys", "k")
        .option("startingVersion", "0").load()
        .writeStream.foreachBatch((_: DataFrame, _: Long) => ())
        .option("checkpointLocation", ckpt).start()
      try q2.processAllAvailable() finally q2.stop()
    }
    assert(e.getMessage.contains("replayed") ||
      Option(e.getCause).exists(_.getMessage.contains("replayed")),
      s"mode switch on one checkpoint must fail loudly, got: ${e.getMessage}")
  }

  test("a replayed pre-widening CDF slice null-fills against an advanced pin") {
    val root = mkMapped()                                   // v1: (k, v)
    FileCow.delete(spark, root, col("k") === 1L)            // v2
    FileCow.addColumns(spark, root, Seq(
      org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.LongType, nullable = true))) // v3 widening
    // a source whose pin ADVANCED to the widened feed schema replaying the
    // pre-widening interval (1,2]: the slice lacks 'extra' and must gain
    // it as typed NULL, not crash an unresolvable select — exercised via
    // getBatch's projection (conformTo) on the exact replayed slice
    val widePin = graft.streaming.CdfSource.feedSchema(root)
    assert(widePin.fieldNames.contains("extra"))
    val slice = FileCow.changesBetween(spark, root, Seq("k"), 1L, 2L)
      .withColumn("_commit_version", lit(2L))
    assert(!slice.columns.contains("extra"), "spec premise: pre-widening slice")
    val currentCols = FileCow.schemaOf(root,
      FileCow.currentVersion(root)).fieldNames.toSet
    val batch = graft.streaming.CdfSource.conformTo(widePin, slice, currentCols)
    val rows = batch.select("_change_type", "k", "extra")
      .collect().map(r => (r.getString(0), r.getLong(1), r.isNullAt(2)))
    assert(rows.toSeq == Seq(("delete", 1L, true)),
      s"the replayed slice must null-fill the widened column, got ${rows.toSeq}")
  }

  test("a pinned column that vanished MID-RUN fails loudly, not null-fills") {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val pin = StructType(Seq(StructField("k", LongType),
      StructField("gone", LongType, nullable = true)))
    val feed = spark.range(1).select(col("id").as("k"))
    // the column no longer exists in the current schema (a drop/rename
    // landed mid-run): silently null-filling it would corrupt the sink
    val e = intercept[RuntimeException] {
      graft.streaming.CdfSource.conformTo(pin, feed, Set("k")).collect()
    }
    assert(e.getMessage.contains("vanished"), e.getMessage)
    // the legitimate replay-below-the-pin case (column exists NOW — it was
    // added after the replayed slice's vintage) still null-fills
    val ok = graft.streaming.CdfSource.conformTo(pin, feed, Set("k", "gone"))
    assert(ok.collect().head.isNullAt(1))
  }

  test("vacuum reclaims crashed-attempt staging orphans under the age floor") {
    val root = mkMapped()
    // plant what a writer crashed mid-attempt leaves behind: a data
    // staging dir under the root and a manifest staging file
    val st = java.nio.file.Paths.get(root, "_staging-deadbeef")
    Files.createDirectories(st)
    Files.write(st.resolve("part-0.parquet"), Array[Byte](1, 2, 3))
    val ms = java.nio.file.Paths.get(root, "_manifests", "m9.delta.staging-dead")
    Files.write(ms, Array[Byte](1))
    // a YOUNG orphan (an in-flight attempt) survives an age-floored vacuum
    FileCow.vacuum(spark, root, keep = 10, minAgeMs = 3600000L)
    assert(Files.exists(st) && Files.exists(ms),
      "young staging must survive the age floor")
    // aged past the floor, both are reclaimed
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 8L * 24 * 3600 * 1000)
    Files.setLastModifiedTime(st, old)
    Files.setLastModifiedTime(ms, old)
    FileCow.vacuum(spark, root, keep = 10, minAgeMs = 0L)
    assert(!Files.exists(st) && !Files.exists(ms),
      "aged staging orphans must be reclaimed")
    // the table is untouched
    assert(FileCow.read(spark, root).count() == 20L)
  }

  test("CDF-stream restart across a rename fails loudly (pinned feed schema)") {
    val root = mkMapped()                            // v1
    val ckpt = Files.createTempDirectory("r10b-ck2").toString
    val versions = mutable.Set.empty[Long]
    def run(): Unit = {
      val q = spark.readStream.format("graft-cdf").option("root", root)
        .option("keys", "k").option("startingVersion", "0").load()
        .writeStream
        .foreachBatch((b: DataFrame, _: Long) => {
          versions.synchronized {
            versions ++= b.select("_commit_version").as[Long].collect()
          }
          ()
        })
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(versions.contains(1L))
    FileCow.renameColumn(spark, root, "v", "w")      // v2: metadata-only
    FileCow.append(spark, root, Seq((100L, 1000L)).toDF("k", "w")) // v3
    val e = intercept[Exception] { run() }
    assert(e.getMessage.contains("incompatibly") ||
      Option(e.getCause).exists(_.getMessage.contains("incompatibly")),
      s"a rename must fail the CDF stream's pinned feed schema, got: ${e.getMessage}")
  }
}
