package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.plans.GraftTables
import graft.sources.FileCow

/** G19 × G18: the full SQL DML surface (MERGE / DELETE / UPDATE / SELECT /
  * VERSION AS OF / VACUUM) over a FILE-LEVEL COW table — same statements,
  * same rule/strategy/exec stack as the versioned tables, but commits
  * rewrite only the files the statement touches. The spec pins both halves:
  * SQL-visible semantics AND the manifest-level file sharing.
  */
class GraftCowSqlSpec extends SparkSpec {

  private def freshCow(name: String): String = {
    val root = Files.createTempDirectory(s"graft-cow-$name").toString
    GraftTables.registerCow(name, root)
    root
  }

  private def fileSet(root: String, v: Long): Set[String] =
    FileCow.manifest(spark, root, v).select("file").collect().map(_.getString(0)).toSet

  test("SQL MERGE on a cow table: first merge creates, second rewrites only touched files") {
    val s = spark
    import s.implicits._
    val root = freshCow("cow_orders")

    // 1000 keys in 8 range files
    spark.range(1, 1001).select(col("id").as("k"),
        concat(lit("n"), col("id")).as("name"), (col("id") * 1.0).as("amt"))
      .repartitionByRange(8, col("k"))
      .createOrReplaceTempView("cow_base")
    spark.sql("MERGE INTO cow_orders t USING cow_base s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(FileCow.currentVersion(root) == 1L)
    assert(fileSet(root, 1L).size == 8)

    Seq((5L, "upd", 5.5), (2001L, "new", 0.0))
      .toDF("k", "name", "amt").createOrReplaceTempView("cow_inc")
    spark.sql("MERGE INTO cow_orders t USING cow_inc s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(FileCow.currentVersion(root) == 2L)
    // COW: 7 of the 8 base files survive by reference
    assert((fileSet(root, 1L) intersect fileSet(root, 2L)).size == 7)

    val got = spark.sql("SELECT name, amt FROM cow_orders WHERE k IN (5, 6, 2001)")
      .as[(String, Double)].collect().toSet
    assert(got == Set(("upd", 5.5), ("n6", 6.0), ("new", 0.0)))
    assert(spark.sql("SELECT count(*) c FROM cow_orders").as[Long].head() == 1001L)

    // time travel reads the pre-merge snapshot
    assert(spark.sql("SELECT name FROM cow_orders VERSION AS OF 1 WHERE k = 5")
      .as[String].head() == "n5")
  }

  test("SQL DELETE and UPDATE on a cow table share untouched files and hit SQL semantics") {
    val s = spark
    import s.implicits._
    val root = freshCow("cow_del")
    spark.range(1, 1001).select(col("id").as("k"), (col("id") % 10).as("g"))
      .repartitionByRange(8, col("k")).createOrReplaceTempView("cow_del_b")
    spark.sql("MERGE INTO cow_del t USING cow_del_b s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")

    spark.sql("DELETE FROM cow_del WHERE k <= 100")
    assert(spark.sql("SELECT count(*) c FROM cow_del").as[Long].head() == 900L)
    assert((fileSet(root, 1L) intersect fileSet(root, 2L)).size == 7,
      "k<=100 lives in 1 of 8 range files")

    spark.sql("UPDATE cow_del SET g = -1 WHERE k > 990")
    assert(spark.sql("SELECT count(*) c FROM cow_del WHERE g = -1").as[Long].head() == 10L)
    assert(spark.sql("SELECT g FROM cow_del WHERE k = 500").as[Long].head() == 0L)
    assert((fileSet(root, 2L) intersect fileSet(root, 3L)).size >= 6)
  }

  test("SQL MERGE … NOT MATCHED BY SOURCE DELETE makes the cow table the source") {
    val s = spark
    import s.implicits._
    val root = freshCow("cow_sync")
    Seq((1L, "x"), (2L, "y")).toDF("k", "v").createOrReplaceTempView("cow_sync_b")
    spark.sql("MERGE INTO cow_sync t USING cow_sync_b s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    Seq((2L, "y2"), (3L, "z")).toDF("k", "v").createOrReplaceTempView("cow_sync_i")
    spark.sql("MERGE INTO cow_sync t USING cow_sync_i s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * " +
      "WHEN NOT MATCHED BY SOURCE THEN DELETE")
    val got = spark.sql("SELECT k, v FROM cow_sync").as[(Long, String)].collect().toSet
    assert(got == Set((2L, "y2"), (3L, "z")))
    assert(FileCow.currentVersion(root) == 2L)
  }

  test("SQL VACUUM on a cow table drops old versions and unreferenced files") {
    val s = spark
    import s.implicits._
    val root = freshCow("cow_vac")
    spark.range(1, 101).select(col("id").as("k"), col("id").as("v"))
      .repartitionByRange(4, col("k")).createOrReplaceTempView("cow_vac_b")
    spark.sql("MERGE INTO cow_vac t USING cow_vac_b s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    spark.sql("DELETE FROM cow_vac WHERE k <= 50")
    assert(FileCow.versions(root) == Seq(1L, 2L))
    spark.sql("VACUUM cow_vac RETAIN 1 VERSIONS")
    assert(FileCow.versions(root) == Seq(2L))
    intercept[IllegalArgumentException] { FileCow.readVersion(spark, root, 1L) }
    assert(spark.sql("SELECT count(*) c FROM cow_vac").as[Long].head() == 50L)
  }

  test("SQL TIMESTAMP AS OF resolves to the version live at that instant") {
    val s = spark
    import s.implicits._
    val root = freshCow("cow_ts")
    spark.range(1, 51).select(col("id").as("k"), lit("old").as("v"))
      .repartitionByRange(2, col("k")).createOrReplaceTempView("cow_ts_b")
    spark.sql("MERGE INTO cow_ts t USING cow_ts_b s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    Thread.sleep(60) // separate commit mtimes on millisecond clocks
    spark.sql("UPDATE cow_ts SET v = 'new'")
    // commit-time basis is the RECORD's own commitMs (r13: survives a
    // copied/rsynced table dir whose file mtimes are fresh)
    val t1 = graft.sources.FileCow.commitInfo(root, 1L).get.commitMs
    def iso(ms: Long) = java.time.Instant.ofEpochMilli(ms).toString.replace("T", " ").stripSuffix("Z")
    assert(spark.sql(s"SELECT v FROM cow_ts TIMESTAMP AS OF '${iso(t1)}' WHERE k = 1")
      .as[String].head() == "old")
    assert(spark.sql(s"SELECT v FROM cow_ts TIMESTAMP AS OF '${iso(System.currentTimeMillis())}' WHERE k = 1")
      .as[String].head() == "new")
    val err = intercept[RuntimeException] {
      spark.sql(s"SELECT v FROM cow_ts TIMESTAMP AS OF '${iso(t1 - 3600000L)}'").collect()
    }
    assert(err.getMessage.contains("no version"))
  }

  test("SQL OPTIMIZE compacts a cow table's layout without changing a row") {
    val s = spark
    import s.implicits._
    val root = freshCow("cow_opt")
    spark.range(1, 501).select(col("id").as("k"), col("id").as("v"))
      .repartitionByRange(8, col("k")).createOrReplaceTempView("cow_opt_b")
    spark.sql("MERGE INTO cow_opt t USING cow_opt_b s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    Seq((601L, 601L), (701L, 701L)).toDF("k", "v").createOrReplaceTempView("cow_opt_i")
    spark.sql("MERGE INTO cow_opt t USING cow_opt_i s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    val vPre = FileCow.currentVersion(root)
    val before = spark.sql("SELECT k, v FROM cow_opt").as[(Long, Long)].collect().toSet
    spark.sql("OPTIMIZE cow_opt INTO 2 FILES")
    assert(fileSet(root, FileCow.currentVersion(root)).size == 2)
    assert(spark.sql("SELECT k, v FROM cow_opt").as[(Long, Long)].collect().toSet == before)
    assert(FileCow.changesBetween(spark, root, Seq("k"), vPre, vPre + 1).isEmpty)
    // OPTIMIZE on a snapshot-level table is refused with a reason
    val vroot = java.nio.file.Files.createTempDirectory("graft-opt-v").toString
    GraftTables.register("opt_snap", vroot)
    val err = intercept[RuntimeException] { spark.sql("OPTIMIZE opt_snap INTO 2 FILES") }
    assert(err.getMessage.contains("snapshot-level"))
  }

  test("SQL ALTER TABLE ADD COLUMNS: one metadata commit, NULLs on old files, DML fills it") {
    val s = spark
    import s.implicits._
    val root = freshCow("cow_alter")
    spark.range(1, 101).select(col("id").as("k"), col("id").as("v"))
      .repartitionByRange(4, col("k")).createOrReplaceTempView("cow_alter_b")
    spark.sql("MERGE INTO cow_alter t USING cow_alter_b s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    spark.sql("ALTER TABLE cow_alter ADD COLUMNS (note STRING, score DOUBLE)")
    assert(FileCow.currentVersion(root) == 2L)
    assert(fileSet(root, 1L) == fileSet(root, 2L), "metadata-only: same data files")
    val got = spark.sql("SELECT k, v, note, score FROM cow_alter")
    assert(got.schema.map(_.name) == Seq("k", "v", "note", "score"))
    assert(got.filter(col("note").isNotNull || col("score").isNotNull).count() == 0L)
    spark.sql("UPDATE cow_alter SET note = 'hot', score = 1.5 WHERE k <= 10")
    assert(spark.sql("SELECT count(*) c FROM cow_alter WHERE note = 'hot' AND score = 1.5")
      .as[Long].head() == 10L)
    // snapshot-level tables refuse the statement with a reason
    val vroot = java.nio.file.Files.createTempDirectory("graft-alter-v").toString
    GraftTables.register("alter_snap", vroot)
    val err = intercept[RuntimeException] {
      spark.sql("ALTER TABLE alter_snap ADD COLUMNS (x STRING)")
    }
    assert(err.getMessage.contains("cow-table operation"))
  }

  test("SQL DESCRIBE HISTORY: per-version manifest accounting, composable as a relation") {
    val s = spark
    import s.implicits._
    val root = freshCow("cow_hist")
    spark.range(1, 201).select(col("id").as("k"), col("id").as("v"))
      .repartitionByRange(4, col("k")).createOrReplaceTempView("cow_hist_b")
    spark.sql("MERGE INTO cow_hist t USING cow_hist_b s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    spark.sql("DELETE FROM cow_hist WHERE k <= 100")
    val h = spark.sql("DESCRIBE HISTORY cow_hist")
      .orderBy("version")
      .select("version", "n_files", "n_rows")
      .as[(Long, Long, Long)].collect().toSeq
    assert(h.map(_._1) == Seq(1L, 2L))
    assert(h.head._3 == 200L && h.last._3 == 100L)
    assert(h.head._2 == 4L)
    // composable: the statement returns a real relation, not an opaque
    // command — aggregate it like any frame (the one-prefix parser seam
    // can't nest it inside another statement's text; compose on the result)
    assert(spark.sql("DESCRIBE HISTORY cow_hist").agg(max("n_rows"))
      .as[Long].head() == 200L)
    // snapshot tables report (version, commit_ms) from their dirs
    val vroot = java.nio.file.Files.createTempDirectory("graft-hist-v").toString
    GraftTables.register("hist_snap", vroot)
    graft.sources.Versioned.publish(Seq((1L, "a")).toDF("k", "v"), vroot)
    assert(spark.sql("DESCRIBE HISTORY hist_snap").select("version")
      .as[Long].collect().toSeq == Seq(1L))
  }

  test("cow CDF across SQL commits: incremental feed equals the applied delta") {
    val s = spark
    import s.implicits._
    val root = freshCow("cow_cdf")
    spark.range(1, 101).select(col("id").as("k"), col("id").as("v"))
      .repartitionByRange(4, col("k")).createOrReplaceTempView("cow_cdf_b")
    spark.sql("MERGE INTO cow_cdf t USING cow_cdf_b s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    Seq((7L, -7L), (200L, 200L)).toDF("k", "v").createOrReplaceTempView("cow_cdf_i")
    spark.sql("MERGE INTO cow_cdf t USING cow_cdf_i s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    val changes = FileCow.changesBetween(spark, root, Seq("k"), 1L, 2L)
      .select("k", "_change_type").as[(Long, String)].collect().toSet
    assert(changes == Set((7L, "update_pre"), (7L, "update_post"), (200L, "insert")))
  }
}
