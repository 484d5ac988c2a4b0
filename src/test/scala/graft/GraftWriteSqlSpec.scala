package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.plans.GraftTables
import graft.sources.{FileCow, Versioned}

/** G18 round 9: the SQL WRITE-PATH entry statements — `CREATE TABLE … AS
  * SELECT` and `INSERT INTO` / `INSERT OVERWRITE` — on both graft layouts.
  * These are the first two statements a migrating user types (the
  * reference's archive bootstrap + append half, dw3_merge_inc.py:109-118);
  * until now they required the Scala API. Pinned here:
  *
  *   1. CTAS materializes version 1 on either layout and refuses a second
  *      create; unregistered names fall through to Spark's own CTAS;
  *   2. INSERT INTO is an APPEND commit — on a cow table every pre-existing
  *      file survives by reference (O(increment), the Delta blind-append
  *      cost model) and history/CDF see the commit;
  *   3. INSERT resolves columns positionally with casts (ANSI), and
  *      mismatched arity fails loudly;
  *   4. INSERT OVERWRITE replaces the contents in one commit.
  */
class GraftWriteSqlSpec extends SparkSpec {
  import spark.implicits._

  private def fileSet(root: String, v: Long): Set[String] =
    FileCow.manifest(spark, root, v).select("file").collect().map(_.getString(0)).toSet

  test("CTAS on a registered cow table: version 1, stats on eligible columns, second create refused") {
    val root = Files.createTempDirectory("graft-ctas-cow").toString
    GraftTables.registerCow("ctas_cow", root)
    spark.range(1, 201).select(col("id").as("k"), (col("id") * 2).as("v"),
      array(lit(1)).as("tags")).createOrReplaceTempView("ctas_cow_src")
    spark.sql("CREATE TABLE ctas_cow AS SELECT * FROM ctas_cow_src")
    assert(FileCow.currentVersion(root) == 1L)
    // stats tracked for the orderable columns only (array is ineligible)
    val man = FileCow.manifest(spark, root, 1L)
    assert(man.columns.count(_.startsWith("min_")) == 2)
    assert(spark.sql("SELECT count(*) c FROM ctas_cow").as[Long].head() == 200L)
    // CREATE means create: a second CTAS on the same name is refused
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE ctas_cow AS SELECT * FROM ctas_cow_src")
    }
    assert(e.getMessage.contains("already exists"))
    GraftTables.unregister("ctas_cow")
  }

  test("CTAS on a registered snapshot table; unregistered names fall through to Spark") {
    val root = Files.createTempDirectory("graft-ctas-snap").toString
    GraftTables.register("ctas_snap", root)
    spark.range(1, 51).select(col("id").as("k"), lit("x").as("v"))
      .createOrReplaceTempView("ctas_snap_src")
    spark.sql("CREATE TABLE ctas_snap AS SELECT * FROM ctas_snap_src")
    assert(Versioned.currentVersion(root) == 1L)
    assert(spark.sql("SELECT count(*) c FROM ctas_snap").as[Long].head() == 50L)
    // an unregistered name is NOT ours: Spark's session catalog takes it
    spark.sql("CREATE TABLE ctas_passthrough AS SELECT 1 AS one")
    assert(spark.table("ctas_passthrough").count() == 1L)
    spark.sql("DROP TABLE ctas_passthrough")
    GraftTables.unregister("ctas_snap")
  }

  test("INSERT INTO a cow table appends new files; every old file shared by reference") {
    val root = Files.createTempDirectory("graft-ins-cow").toString
    GraftTables.registerCow("ins_cow", root)
    spark.range(1, 1001).select(col("id").as("k"), (col("id") % 10).as("g"))
      .repartitionByRange(8, col("k")).createOrReplaceTempView("ins_cow_b")
    spark.sql("CREATE TABLE ins_cow AS SELECT * FROM ins_cow_b")
    val v1Files = fileSet(root, 1L)
    spark.sql("INSERT INTO ins_cow SELECT id AS k, id % 10 AS g FROM range(2001, 2021)")
    assert(FileCow.currentVersion(root) == 2L)
    // append: ALL version-1 files survive by path — the O(increment) commit
    assert(v1Files.subsetOf(fileSet(root, 2L)))
    assert(spark.sql("SELECT count(*) c FROM ins_cow").as[Long].head() == 1020L)
    // history shows the append; CDF emits exactly the inserted keys
    val hist = spark.sql("DESCRIBE HISTORY ins_cow").orderBy("version")
      .select("n_rows").as[Long].collect().toSeq
    assert(hist == Seq(1000L, 1020L))
    val changes = FileCow.changesBetween(spark, root, Seq("k"), 1L, 2L)
      .select("k", "_change_type").as[(Long, String)].collect().toSet
    assert(changes == (2001L until 2021L).map(k => (k, "insert")).toSet)
    GraftTables.unregister("ins_cow")
  }

  test("INSERT resolves positionally with casts; arity mismatch fails loudly") {
    val root = Files.createTempDirectory("graft-ins-pos").toString
    GraftTables.registerCow("ins_pos", root)
    spark.sql("CREATE TABLE ins_pos AS SELECT CAST(1 AS BIGINT) AS k, CAST(1.5 AS DOUBLE) AS v")
    // INT/STRING literals cast to the table's BIGINT/DOUBLE by position
    spark.sql("INSERT INTO ins_pos SELECT 2, '2.5'")
    val got = spark.sql("SELECT k, v FROM ins_pos").as[(Long, Double)].collect().toSet
    assert(got == Set((1L, 1.5), (2L, 2.5)))
    val e = intercept[Exception] { spark.sql("INSERT INTO ins_pos SELECT 3") }
    assert(e.getMessage.contains("arity"))
    GraftTables.unregister("ins_pos")
  }

  test("INSERT OVERWRITE replaces contents in one commit on both layouts") {
    val cowRoot = Files.createTempDirectory("graft-ovr-cow").toString
    GraftTables.registerCow("ovr_cow", cowRoot)
    spark.sql("CREATE TABLE ovr_cow AS SELECT id AS k, id AS v FROM range(1, 101)")
    spark.sql("INSERT OVERWRITE ovr_cow SELECT id AS k, -id AS v FROM range(1, 11)")
    assert(FileCow.currentVersion(cowRoot) == 2L)
    assert(spark.sql("SELECT count(*) c, sum(v) s FROM ovr_cow")
      .as[(Long, Long)].head() == ((10L, -55L)))

    val snapRoot = Files.createTempDirectory("graft-ovr-snap").toString
    GraftTables.register("ovr_snap", snapRoot)
    spark.sql("CREATE TABLE ovr_snap AS SELECT id AS k FROM range(1, 101)")
    spark.sql("INSERT INTO ovr_snap SELECT id FROM range(200, 203)")
    assert(spark.sql("SELECT count(*) c FROM ovr_snap").as[Long].head() == 103L)
    spark.sql("INSERT OVERWRITE ovr_snap SELECT id FROM range(1, 6)")
    assert(Versioned.currentVersion(snapRoot) == 3L)
    assert(spark.sql("SELECT count(*) c FROM ovr_snap").as[Long].head() == 5L)
    // time travel still reads the pre-overwrite snapshot
    assert(spark.sql("SELECT count(*) c FROM ovr_snap VERSION AS OF 2")
      .as[Long].head() == 103L)
    GraftTables.unregister("ovr_cow"); GraftTables.unregister("ovr_snap")
  }

  test("INSERT INTO a never-created cow table bootstraps it (merge's courtesy)") {
    val root = Files.createTempDirectory("graft-ins-boot").toString
    GraftTables.registerCow("ins_boot", root)
    spark.sql("INSERT INTO ins_boot SELECT id AS k, id * 10 AS v FROM range(1, 21)")
    assert(FileCow.currentVersion(root) == 1L)
    assert(spark.sql("SELECT sum(v) s FROM ins_boot").as[Long].head() == 2100L)
    GraftTables.unregister("ins_boot")
  }

  test("INSERT INTO ... VALUES goes through the same positional append path") {
    val root = Files.createTempDirectory("graft-ins-vals").toString
    GraftTables.registerCow("ins_vals", root)
    spark.sql("CREATE TABLE ins_vals AS SELECT CAST(1 AS BIGINT) AS k, 'a' AS v")
    spark.sql("INSERT INTO ins_vals VALUES (2, 'b'), (3, 'c')")
    assert(FileCow.currentVersion(root) == 2L)
    assert(spark.sql("SELECT k, v FROM ins_vals").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    GraftTables.unregister("ins_vals")
  }

  test("TRUNCATE TABLE empties both layouts in one commit; history survives") {
    val cowRoot = Files.createTempDirectory("graft-trunc-cow").toString
    GraftTables.registerCow("trunc_cow", cowRoot)
    spark.sql("CREATE TABLE trunc_cow AS SELECT id AS k, id AS v FROM range(1, 101)")
    spark.sql("TRUNCATE TABLE trunc_cow")
    assert(FileCow.currentVersion(cowRoot) == 2L)
    assert(spark.sql("SELECT count(*) c FROM trunc_cow").as[Long].head() == 0L)
    // schema survives the empty snapshot; time travel reads pre-truncate
    assert(spark.sql("SELECT k FROM trunc_cow").schema.map(_.name) == Seq("k"))
    assert(spark.sql("SELECT count(*) c FROM trunc_cow VERSION AS OF 1")
      .as[Long].head() == 100L)
    // and the table is still writable after
    spark.sql("INSERT INTO trunc_cow SELECT 7, 7")
    assert(spark.sql("SELECT count(*) c FROM trunc_cow").as[Long].head() == 1L)

    val snapRoot = Files.createTempDirectory("graft-trunc-snap").toString
    GraftTables.register("trunc_snap", snapRoot)
    spark.sql("CREATE TABLE trunc_snap AS SELECT id AS k FROM range(1, 51)")
    spark.sql("TRUNCATE TABLE trunc_snap")
    assert(spark.sql("SELECT count(*) c FROM trunc_snap").as[Long].head() == 0L)
    assert(Versioned.currentVersion(snapRoot) == 2L)
    GraftTables.unregister("trunc_cow"); GraftTables.unregister("trunc_snap")
  }

  test("DROP TABLE removes the binding, keeps the data; re-register re-attaches history") {
    val root = Files.createTempDirectory("graft-drop").toString
    GraftTables.registerCow("drop_me", root)
    spark.sql("CREATE TABLE drop_me AS SELECT id AS k FROM range(1, 11)")
    spark.sql("INSERT INTO drop_me SELECT 99")
    spark.sql("DROP TABLE drop_me")
    assert(GraftTables.entryOf("drop_me").isEmpty)
    // the name no longer resolves through us
    val e = intercept[Exception] { spark.sql("SELECT * FROM drop_me").collect() }
    assert(e.getMessage.toLowerCase.contains("drop_me"))
    // external-table semantics: the data and history are still on disk
    assert(FileCow.versions(root) == Seq(1L, 2L))
    GraftTables.registerCow("drop_me", root)
    assert(spark.sql("SELECT count(*) c FROM drop_me").as[Long].head() == 11L)
    assert(spark.sql("SELECT count(*) c FROM drop_me VERSION AS OF 1")
      .as[Long].head() == 10L)
    GraftTables.unregister("drop_me")
  }

  test("CREATE TABLE IF NOT EXISTS is a no-op on an existing table") {
    val root = Files.createTempDirectory("graft-ctas-ine").toString
    GraftTables.registerCow("ctas_ine", root)
    spark.sql("CREATE TABLE IF NOT EXISTS ctas_ine AS SELECT id AS k FROM range(1, 11)")
    assert(FileCow.currentVersion(root) == 1L)
    // second IF NOT EXISTS: no new version, contents untouched
    spark.sql("CREATE TABLE IF NOT EXISTS ctas_ine AS SELECT id AS k FROM range(1, 1001)")
    assert(FileCow.currentVersion(root) == 1L)
    assert(spark.sql("SELECT count(*) c FROM ctas_ine").as[Long].head() == 10L)
    // plain CREATE still refuses
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE ctas_ine AS SELECT 1 AS k")
    }
    assert(e.getMessage.contains("already exists"))
    GraftTables.unregister("ctas_ine")
  }

  test("DESCRIBE HISTORY carries the operation kind from the commit log") {
    val root = Files.createTempDirectory("graft-hist-op").toString
    GraftTables.registerCow("hist_op", root)
    spark.sql("CREATE TABLE hist_op AS SELECT id AS k, id AS v FROM range(1, 101)")
    spark.sql("INSERT INTO hist_op SELECT 500, 500")
    spark.sql("DELETE FROM hist_op WHERE k <= 10")
    val ops = spark.sql("DESCRIBE HISTORY hist_op").orderBy("version")
      .select("operation").as[String].collect().toSeq
    assert(ops == Seq("create", "append", "delete"))
    GraftTables.unregister("hist_op")
  }

  test("CREATE OR REPLACE TABLE: one replace commit; history and time travel survive") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-cor").toString
    GraftTables.registerCow("cor_t", root)
    spark.range(1, 11).select(col("id").as("k"), (col("id") * 2).as("v"))
      .createOrReplaceTempView("cor_base")
    // OR REPLACE on a nonexistent table simply creates
    spark.sql("CREATE OR REPLACE TABLE cor_t AS SELECT * FROM cor_base") // v1
    assert(FileCow.currentVersion(root) == 1L)

    spark.range(100, 103).select(col("id").as("k"), lit(0L).as("v"))
      .createOrReplaceTempView("cor_new")
    spark.sql("CREATE OR REPLACE TABLE cor_t AS SELECT * FROM cor_new") // v2
    assert(FileCow.currentVersion(root) == 2L, "replace is a COMMIT, not a reset")
    assert(spark.sql("SELECT count(*) c FROM cor_t").as[Long].head() == 3L)
    // the pre-replace table still time-travels — the Delta OR REPLACE contract
    assert(spark.sql("SELECT count(*) c FROM cor_t VERSION AS OF 1")
      .as[Long].head() == 10L)

    // a schema-drifting replace fails (schema change goes through ALTER)
    spark.range(1, 3).select(col("id").as("other")).createOrReplaceTempView("cor_bad")
    val e = intercept[Exception] {
      spark.sql("CREATE OR REPLACE TABLE cor_t AS SELECT * FROM cor_bad")
    }
    assert(e.getMessage.contains("must match"))
    GraftTables.unregister("cor_t")
  }

  test("DELETE and UPDATE conditions take subqueries") {
    val s = spark
    import s.implicits._
    GraftTables.registerCow("subq_t", Files.createTempDirectory("graft-subq").toString)
    spark.range(1, 21).select(col("id").as("k"), (col("id") % 5).as("grp"))
      .createOrReplaceTempView("subq_base")
    spark.sql("CREATE TABLE subq_t AS SELECT * FROM subq_base")
    Seq(0L, 1L).toDF("g").createOrReplaceTempView("subq_kill")

    spark.sql("DELETE FROM subq_t WHERE grp IN (SELECT g FROM subq_kill)")
    assert(spark.sql("SELECT count(*) c FROM subq_t").as[Long].head() == 12L,
      "grp 0 and 1 rows deleted via the IN-subquery")

    spark.sql("UPDATE subq_t SET grp = -1 WHERE k > (SELECT max(g) + 15 FROM subq_kill)")
    assert(spark.sql("SELECT count(*) c FROM subq_t WHERE grp = -1")
      .as[Long].head() == 3L,
      "k in 17..19 updated via the scalar subquery (20 was grp 0, deleted above)")
    GraftTables.unregister("subq_t")
  }

  test("append keeps rows-per-file near the table's existing grain") {
    val root = Files.createTempDirectory("graft-app-grain").toString
    // 1000 rows in 4 files => ~250 rows/file
    FileCow.create(spark, root,
      spark.range(0, 1000).select(col("id").as("k"), col("id").as("v"))
        .repartitionByRange(4, col("k")), statsCols = Seq("k"))
    // a 500-row append should land ~2 files, not 1 and not 32
    val c = FileCow.append(spark, root,
      spark.range(5000, 5500).select(col("id").as("k"), col("id").as("v")))
    assert(c.filesAdded == 2L, s"expected 2 appended files, got ${c.filesAdded}")
    assert(c.filesKept == 4L && c.filesRewritten == 0L)
  }
}
