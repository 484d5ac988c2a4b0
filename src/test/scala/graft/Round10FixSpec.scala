package graft

import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.FileCow

/** Round-10 ADVICE batch 1 — each test pins one reviewed defect:
  *   1. MERGE … NOT MATCHED BY SOURCE read its base OUTSIDE the commit
  *      retry, so a commit landing between the read and the CAS was
  *      silently discarded (lost update). [[FileCow.overwriteWith]] now
  *      re-derives the replacement inside the retry body.
  *   2. A replayed DV DELETE (all targeted rows already in the standing
  *      vectors) rewrote the sidecar to a fresh path, marking a
  *      row-identical commit ROW-CHANGING — killing append streams and
  *      accumulating redundant sidecars.
  *   3. [[graft.sources.FileCow]]'s manifest cache keyed (root, version)
  *      forever; a root deleted out-of-band and re-created in the same
  *      JVM served the OLD table's manifest.
  *   4. [[FileCow.changesBetween]] read the pre-side of a rename-crossing
  *      interval under the END schema, projecting the renamed column as
  *      NULL and reporting every row as changed — now rename-aware and
  *      row-neutral, consistent with the table stream.
  *   5. The graft-cow table stream re-resolved its schema from the CURRENT
  *      version on restart; now pinned under the checkpoint metadata like
  *      the start version.
  */
class Round10FixSpec extends SparkSpec {
  import spark.implicits._

  test("overwriteWith re-reads the base inside the retry — no lost update") {
    val root = Files.createTempDirectory("graft-r10-lost").resolve("t").toString
    FileCow.create(spark, root,
      spark.range(1, 11).select(col("id").as("k"), (col("id") * 10).as("v")),
      statsCols = Seq("k"))                                          // v1
    var calls = 0
    FileCow.overwriteWith(spark, root) { (s, version) =>
      calls += 1
      if (calls == 1) {
        // a concurrent writer lands AFTER this attempt's base read: the
        // attempt's CAS must lose and the retry must see the new row
        FileCow.append(s, root,
          Seq((99L, 5L)).toDF("k", "v"))
      }
      FileCow.readVersion(s, root, version)
        .withColumn("v", col("v") + lit(100L))
    }
    assert(calls == 2, s"the first attempt must lose its CAS and retry, calls=$calls")
    val got = FileCow.read(spark, root).as[(Long, Long)].collect().toMap
    assert(got.size == 11, "the concurrently appended row must survive")
    assert(got(99L) == 105L,
      "the retry must recompute FROM the concurrent writer's row (5 + 100)")
    assert(got(1L) == 110L)
  }

  test("a replayed DV delete is a no-op commit: registry unchanged, stream-transparent") {
    val root = Files.createTempDirectory("graft-r10-dvnoop").resolve("t").toString
    FileCow.create(spark, root,
      spark.range(1, 101).select(col("id").as("k"), concat(lit("p"), col("id")).as("p"))
        .repartitionByRange(4, col("k")),
      statsCols = Seq("k"))                                          // v1
    FileCow.setTableProperties(spark, root,
      Map(FileCow.DvEnabledProp -> "true"))                          // v2
    FileCow.delete(spark, root, col("k") <= 10)                      // v3: 10 DV rows
    val reg3 = FileCow.dvRegistryOf(root, 3L)
    assert(reg3.nonEmpty)
    def dvSidecars: Set[String] = {
      val d = Paths.get(root, "_dv")
      val l = java.nio.file.Files.list(d)
      try {
        val b = mutable.Set.empty[String]
        l.iterator().forEachRemaining(p => b += p.getFileName.toString)
        b.toSet
      } finally l.close()
    }
    val sidecarsBefore = dvSidecars

    FileCow.delete(spark, root, col("k") <= 10)                      // v4: replay
    assert(FileCow.dvRegistryOf(root, 4L) == reg3,
      "registry must be byte-identical — same sidecar paths, no rewrite")
    assert(FileCow.commitInfo(root, 4L).get.dvFiles.isEmpty,
      "a row-identical commit must not be marked row-changing")
    assert(dvSidecars == sidecarsBefore, "no redundant sidecar may accumulate")
    assert(FileCow.read(spark, root).count() == 90L)

    // an append stream WITHOUT skipChangeCommits passes over the replay
    val got = mutable.Set.empty[Long]
    val q = spark.readStream.format("graft-cow").option("root", root)
      .option("startingVersion", "4").load()
      .writeStream
      .foreachBatch((b: DataFrame, _: Long) => {
        got.synchronized { got ++= b.select("k").as[Long].collect() }; ()
      })
      .option("checkpointLocation",
        Files.createTempDirectory("graft-r10-dvnoop-ck").toString)
      .start()
    try {
      FileCow.append(spark, root,
        Seq((500L, "p500")).toDF("k", "p"))                          // v5
      q.processAllAvailable()
      assert(got.toSet == Set(500L),
        "the stream must deliver the append without tripping on the replay")
    } finally q.stop()
  }

  test("re-creating a table at a reused root serves the NEW manifests") {
    val root = Files.createTempDirectory("graft-r10-reuse").resolve("t").toString
    FileCow.create(spark, root,
      spark.range(1, 11).select(col("id").as("k")), statsCols = Seq("k"))
    assert(FileCow.read(spark, root).count() == 10L) // populates the cache
    FileCow.deleteTree(Paths.get(root))              // out-of-band drop
    FileCow.create(spark, root,
      spark.range(1, 6).select(col("id").as("k")), statsCols = Seq("k"))
    assert(FileCow.read(spark, root).count() == 5L,
      "version 1 must resolve to the NEW table's manifest, not the cached old one")
  }

  test("change feed crossing rename_column is rename-aware and row-neutral") {
    val root = Files.createTempDirectory("graft-r10-renfeed").resolve("t").toString
    FileCow.create(spark, root,
      spark.range(1, 21).select(col("id").as("k"), concat(lit("p"), col("id")).as("p"))
        .repartitionByRange(2, col("k")),
      statsCols = Seq("k"))                                          // v1
    FileCow.delete(spark, root, col("k") > 18)                       // v2: -2 rows
    FileCow.renameColumn(spark, root, "p", "q")                      // v3: full rewrite
    FileCow.append(spark, root, Seq((100L, "n100"), (101L, "n101")).toDF("k", "q")) // v4

    // a PURE rename interval feeds EMPTY (row-neutral, like the table stream)
    assert(FileCow.changesBetween(spark, root, Seq("k"), 2L, 3L).isEmpty,
      "a rename commit alone must feed no rows")

    // a mixed interval feeds exactly the real changes, under END names
    val feed = FileCow.changesBetween(spark, root, Seq("k"), 1L, 4L)
      .select("_change_type", "k", "q")
      .as[(String, Long, String)].collect().toSet
    assert(feed == Set(
      ("delete", 19L, "p19"), ("delete", 20L, "p20"),
      ("insert", 100L, "n100"), ("insert", 101L, "n101")),
      s"pre-side rows must surface their OLD values under the NEW name, got $feed")

    // renaming the KEY itself: the caller speaks END names, the feed maps back
    FileCow.renameColumn(spark, root, "k", "id")                     // v5
    assert(FileCow.changesBetween(spark, root, Seq("id"), 4L, 5L).isEmpty,
      "a key rename alone must feed no rows")
  }

  test("table-stream restart: widening adopted, drop-column drift fails loudly") {
    val root = Files.createTempDirectory("graft-r10-pins").resolve("t").toString
    FileCow.create(spark, root,
      spark.range(1, 6).select(col("id"), (col("id") % 3).as("grp")),
      statsCols = Seq("id"))                                         // v1
    val ckpt = Files.createTempDirectory("graft-r10-pins-ck").toString
    val schemas = mutable.Set.empty[Seq[String]]
    val got = mutable.Set.empty[Long]
    def run(): Unit = {
      val q = spark.readStream.format("graft-cow").option("root", root)
        .option("startingVersion", "1").load()
        .writeStream
        .foreachBatch((b: DataFrame, _: Long) => {
          schemas.synchronized { schemas += b.columns.toSeq }
          got.synchronized { got ++= b.select("id").as[Long].collect() }
          ()
        })
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    FileCow.append(spark, root, Seq((50L, 0L)).toDF("id", "grp"))    // v2
    run()
    assert(schemas.toSet == Set(Seq("id", "grp")) && got.contains(50L))

    // ADDITIVE evolution: the restart adopts the widened schema (the pin
    // advances) — replayed/future batches only gain a null column
    FileCow.addColumns(spark, root, Seq(
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.StringType)))                     // v3
    FileCow.append(spark, root,
      Seq((60L, 0L, "v60")).toDF("id", "grp", "payload"))            // v4
    run()
    assert(schemas.toSet == Set(Seq("id", "grp"), Seq("id", "grp", "payload")),
      s"a widening restart adopts the new schema, saw $schemas")
    assert(got.contains(60L))

    // INCOMPATIBLE drift (drop-column): the restart must fail LOUDLY —
    // WAL-replayed batches re-read under a silently narrower schema is
    // exactly what the pin exists to prevent
    FileCow.dropColumns(spark, root, Seq("payload"))                 // v5
    FileCow.append(spark, root, Seq((70L, 0L)).toDF("id", "grp"))    // v6
    val e = intercept[Exception] { run() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("changed incompatibly")),
      s"expected the loud schema-drift error, got $e")
  }
}
