package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.plans.GraftTables
import graft.sources.FileCow

/** The `format("graft-cow")` DataFrame reader/writer (the idiomatic Spark
  * API surface) plus the round-9 ops additions: `VACUUM … DRY RUN` and the
  * CDF stream's `startingTimestamp` / `format("graft-cdf")` spellings.
  * Claims:
  *
  *   1. writes map SaveMode onto the commit vocabulary (ErrorIfExists =
  *      create, Append = new-files commit with prior files shared,
  *      Overwrite = one replace commit, Ignore = create-if-absent);
  *   2. reads plan through the SAME manifest-pruned relation as SQL —
  *      pushed filters prune files; versionAsOf/timestampAsOf time-travel;
  *   3. DRY RUN reports exactly what the real vacuum then deletes, and
  *      deletes nothing itself.
  */
class GraftCowDataSourceSpec extends SparkSpec {
  import spark.implicits._

  test("writer SaveModes -> commit vocabulary; reader round-trips and time-travels") {
    val root = Files.createTempDirectory("graft-dsv1").resolve("t").toString
    val base = spark.range(1, 101).select(col("id").as("k"), col("id").as("v"))
      .repartitionByRange(4, col("k"))

    base.write.format("graft-cow").option("root", root).mode("error").save()
    assert(FileCow.currentVersion(root) == 1L)
    assert(FileCow.commitInfo(root, 1L).get.kind == "create")

    // append: a new-files commit, all prior files shared
    Seq((500L, 500L)).toDF("k", "v").write.format("graft-cow")
      .option("root", root).mode("append").save()
    assert(FileCow.commitInfo(root, 2L).get.kind == "append")
    assert(FileCow.commitInfo(root, 2L).get.removed.isEmpty)

    // reader: current + versionAsOf
    val cur = spark.read.format("graft-cow").option("root", root).load()
    assert(cur.count() == 101L)
    assert(spark.read.format("graft-cow").option("root", root)
      .option("versionAsOf", "1").load().count() == 100L)

    // pruned scan through the same relation as SQL
    val q = cur.filter(col("k").between(1, 25))
    import org.apache.spark.sql.execution.FileSourceScanExec
    val scan = q.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case s: FileSourceScanExec => s }.get
    val opened = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters).map(_.files.length).sum
    assert(opened == 1, s"k<=25 lives in 1 of 4 range files, opened $opened")

    // overwrite: one replace commit
    Seq((1L, -1L)).toDF("k", "v").write.format("graft-cow")
      .option("root", root).mode("overwrite").save()
    assert(spark.read.format("graft-cow").option("root", root).load().count() == 1L)
    // ignore: existing table untouched
    base.write.format("graft-cow").option("root", root).mode("ignore").save()
    assert(FileCow.currentVersion(root) == 3L)
    // error on existing fails loudly
    val e = intercept[Exception] {
      base.write.format("graft-cow").option("root", root).mode("error").save()
    }
    assert(e.getMessage.contains("already exists"))
  }

  test("mergeSchema append evolves the table, pads missing columns, keeps strictness off it") {
    val root = Files.createTempDirectory("graft-ms").resolve("t").toString
    // v nullable: only a nullable column can be padded on later appends
    spark.range(1, 11).select(col("id").as("k"),
        when(col("id") > 0, col("id")).as("v"))
      .write.format("graft-cow").option("root", root).mode("error").save()

    // drifted frame: new column `w`, missing column `v`
    val drifted = Seq((100L, 7.5)).toDF("k", "w")
    intercept[Exception] { // without the option, the exact-schema contract stands
      drifted.write.format("graft-cow").option("root", root).mode("append").save()
    }
    intercept[Exception] { // a frame missing a NOT NULL column cannot be padded
      drifted.drop("w").write.format("graft-cow").option("root", Files
          .createTempDirectory("graft-ms2").resolve("t2").toString)
        .mode("error").save() // t2: k NOT NULL only
      val t2 = Files.createTempDirectory("graft-ms3").resolve("t3").toString
      spark.range(1, 3).select(col("id").as("k"), col("id").as("nn"))
        .write.format("graft-cow").option("root", t2).mode("error").save()
      Seq(9L).toDF("k").write.format("graft-cow").option("root", t2)
        .option("mergeSchema", "true").mode("append").save()
    }
    drifted.write.format("graft-cow").option("root", root)
      .option("mergeSchema", "true").mode("append").save()

    val got = spark.read.format("graft-cow").option("root", root).load()
    assert(got.columns.toSeq == Seq("k", "v", "w"))
    val r = got.filter(col("k") === 100L).select("v", "w").collect().head
    assert(r.isNullAt(0) && r.getDouble(1) == 7.5, "missing padded null, new kept")
    assert(got.filter(col("k") < 100L).select("w").collect().forall(_.isNullAt(0)),
      "old rows read null for the evolved column")
    // evolution = one metadata commit + one append commit
    assert(FileCow.commitInfo(root, 2L).get.kind == "add_columns")
    assert(FileCow.commitInfo(root, 3L).get.kind == "append")
  }

  test("SHOW GRAFT TABLES lists the registry with layout and version") {
    val root = Files.createTempDirectory("graft-show").resolve("t").toString
    spark.range(1, 6).select(col("id").as("k"), col("id").as("v"))
      .write.format("graft-cow").option("root", root).mode("error").save()
    GraftTables.registerCow("show_me_cow", root)
    val rows = spark.sql("SHOW GRAFT TABLES")
      .filter(col("name") === "show_me_cow")
      .select("root", "layout", "version").collect()
    assert(rows.length == 1)
    assert(rows.head.getString(0) == root)
    assert(rows.head.getString(1) == "cow")
    assert(rows.head.getLong(2) == 1L)
    // composable: aggregates work on it
    assert(spark.sql("SHOW GRAFT TABLES").filter(col("layout") === "cow").count() >= 1)
    GraftTables.unregister("show_me_cow")
  }

  test("VACUUM DRY RUN reports exactly what the real vacuum deletes, touching nothing") {
    val root = Files.createTempDirectory("graft-dryrun").toString
    GraftTables.registerCow("dry_t", root)
    spark.sql("CREATE TABLE dry_t AS SELECT id AS k, id AS v FROM range(1, 101)")
    spark.sql("DELETE FROM dry_t WHERE k <= 50")
    val planned = spark.sql("VACUUM dry_t RETAIN 1 VERSIONS OLDER THAN 0 HOURS DRY RUN")
      .select("file").as[String].collect().toSet
    assert(planned.nonEmpty, "the retired pre-delete files are reclaimable")
    // nothing deleted yet: both versions still read
    assert(FileCow.readVersion(spark, root, 1L).count() == 100L)
    val deleted = FileCow.vacuum(spark, root, keep = 1, minAgeMs = 0L).toSet
    assert(deleted == planned, "dry run must equal the real deletion set")
    GraftTables.unregister("dry_t")
  }

  test("CDF stream: format(graft-cdf) + startingTimestamp resolve like TIMESTAMP AS OF") {
    val root = Files.createTempDirectory("graft-cdfts").resolve("t").toString
    FileCow.create(spark, root,
      spark.range(1, 11).select(col("id").as("k"), lit("old").as("v"))
        .repartition(1), statsCols = Seq("k"))
    Thread.sleep(60)
    val t1 = System.currentTimeMillis()
    FileCow.update(spark, root, set = Seq("v" -> lit("new")), cond = col("k") === 1L)

    val got = scala.collection.mutable.Set.empty[(Long, String, String, Long)]
    val q = spark.readStream.format("graft-cdf")
      .option("root", root).option("keys", "k")
      .option("startingTimestamp", t1.toString).load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= b.select("k", "v", "_change_type", "_commit_version")
            .as[(Long, String, String, Long)].collect()
        }; ()
      }
      .option("checkpointLocation", Files.createTempDirectory("graft-cdfts-ck").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    // started AFTER the version live at t1 (v1): only the update arrives
    assert(got.toSet == Set((1L, "old", "update_pre", 2L), (1L, "new", "update_post", 2L)))
  }
}
