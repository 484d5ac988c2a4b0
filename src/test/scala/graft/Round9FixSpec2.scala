package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField}

import graft.plans.GraftTables
import graft.sources.{FileCow, Versioned}

/** Round-9 self-review hardening, second batch — each test pins one
  * adjudicated finding from the session's review of the round diff:
  *
  *   1. `changesBetween` folds the commit log SEQUENTIALLY, so a file
  *      removed and then re-added inside the interval (RESTORE) still
  *      contributes its rows — order-insensitive set differences would
  *      silently drop them;
  *   2. the change feed crosses a metadata-only schema-evolution commit
  *      (empty feed, end-version schema) instead of failing on it;
  *   3. `MERGE … WITH SCHEMA EVOLUTION` on a cow table is ATOMIC: a merge
  *      that fails its own checks leaves the schema un-evolved, and a
  *      successful one lands widening + rows in ONE commit;
  *   4. snapshot-layout SQL DELETE keeps rows whose condition evaluates
  *      NULL (SQL WHERE semantics — parity with the cow twin);
  *   5. snapshot-layout SQL VACUUM honors an explicit `OLDER THAN` age
  *      floor instead of silently dropping it.
  */
class Round9FixSpec2 extends SparkSpec {
  import spark.implicits._

  test("changesBetween: a file removed then re-added (RESTORE) inside the interval still feeds its rows") {
    val root = Files.createTempDirectory("graft-cdf-restore").toString
    FileCow.create(spark, root,
      spark.range(1, 101).select(col("id").as("k"), lit("b").as("v")).repartition(1),
      statsCols = Seq("k"))                                     // v1
    FileCow.append(spark, root,
      spark.range(101, 201).select(col("id").as("k"), lit("n").as("v"))) // v2: + file F
    FileCow.restore(spark, root, 1L)                            // v3: removes F
    FileCow.restore(spark, root, 2L)                            // v4: re-adds F by path
    val feed = FileCow.changesBetween(spark, root, Seq("k"), 1L, 4L)
    // F is present at v4 and absent at v1: its 100 rows are inserts. The
    // order-insensitive fold put F in neither side and fed NOTHING.
    assert(feed.filter(col("_change_type") === "insert").count() == 100L)
    assert(feed.count() == 100L)
    // and the cancelling interval (2, 4]: F at both endpoints -> empty feed
    assert(FileCow.changesBetween(spark, root, Seq("k"), 2L, 4L).isEmpty)
  }

  test("changesBetween crosses a schema-evolution commit; feed carries the end-version schema") {
    val root = Files.createTempDirectory("graft-cdf-evolve").toString
    FileCow.create(spark, root,
      spark.range(1, 51).select(col("id").as("k"), lit("x").as("v")).repartition(1),
      statsCols = Seq("k"))                                     // v1
    FileCow.addColumns(spark, root,
      Seq(StructField("note", StringType, nullable = true)))    // v2: metadata-only
    val feed12 = FileCow.changesBetween(spark, root, Seq("k"), 1L, 2L)
    assert(feed12.isEmpty, "a metadata-only commit's change feed is empty, not an error")
    assert(feed12.columns.contains("note"), "feed reads under the END version's schema")
    FileCow.merge(spark, root,
      Seq((1000L, "y", "hot")).toDF("k", "v", "note"), keys = Seq("k")) // v3: insert
    val feed13 = FileCow.changesBetween(spark, root, Seq("k"), 1L, 3L)
    assert(feed13.count() == 1L)
    assert(feed13.select("note").as[String].head() == "hot")
  }

  test("MERGE WITH SCHEMA EVOLUTION is atomic: a failed merge leaves the schema un-evolved") {
    val root = Files.createTempDirectory("graft-ev-atomic").toString
    GraftTables.registerCow("ev_atomic", root)
    spark.range(1, 101).select(col("id").as("k"), (col("id") * 1.0).as("amt"))
      .repartitionByRange(4, col("k")).createOrReplaceTempView("ev_atomic_b")
    spark.sql("MERGE INTO ev_atomic t USING ev_atomic_b s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")   // v1
    assert(FileCow.currentVersion(root) == 1L)

    // a source that widens the schema AND violates the NULL-key check: the
    // statement must fail WITHOUT leaving an add_columns commit behind
    Seq((Some(5L), 9.9, "fresh"), (Option.empty[Long], 0.0, "nul"))
      .toDF("k", "amt", "extra").createOrReplaceTempView("ev_atomic_bad")
    val e = intercept[IllegalArgumentException] {
      spark.sql("MERGE WITH SCHEMA EVOLUTION INTO ev_atomic t " +
        "USING ev_atomic_bad s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    }
    assert(e.getMessage.contains("NULL merge key"))
    assert(FileCow.currentVersion(root) == 1L,
      "failed evolution merge must not commit anything")
    assert(!FileCow.schemaOf(root, 1L).fieldNames.contains("extra"),
      "failed evolution merge must not evolve the schema")

    // the successful spelling: widening + rows land in ONE commit
    Seq((5L, 9.9, "fresh"), (2000L, 1.0, "new"))
      .toDF("k", "amt", "extra").createOrReplaceTempView("ev_atomic_ok")
    spark.sql("MERGE WITH SCHEMA EVOLUTION INTO ev_atomic t " +
      "USING ev_atomic_ok s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(FileCow.currentVersion(root) == 2L,
      "evolution + merge is one atomic commit, not addColumns + merge")
    assert(FileCow.schemaOf(root, 2L).fieldNames.contains("extra"))
    val got = spark.sql(
      "SELECT k, amt, extra FROM ev_atomic WHERE k IN (5, 6, 2000)")
      .as[(Long, Double, Option[String])].collect().toSet
    assert(got == Set((5L, 9.9, Some("fresh")), (6L, 6.0, None), (2000L, 1.0, Some("new"))))
    assert(spark.sql("SELECT count(*) c FROM ev_atomic").as[Long].head() == 101L)
    GraftTables.unregister("ev_atomic")
  }

  test("snapshot SQL DELETE keeps NULL-condition rows (parity with the cow twin)") {
    val root = Files.createTempDirectory("graft-nulldel-snap").toString
    GraftTables.register("nulldel_snap", root)
    Seq((1L, Some(3L)), (2L, Some(9L)), (3L, Option.empty[Long]))
      .toDF("k", "v").createOrReplaceTempView("nulldel_src")
    spark.sql("CREATE TABLE nulldel_snap AS SELECT * FROM nulldel_src")
    spark.sql("DELETE FROM nulldel_snap WHERE v > 5")
    // v=9 deleted; v=3 kept; v=NULL kept (the condition is NULL, not TRUE)
    val kept = spark.sql("SELECT k FROM nulldel_snap").as[Long].collect().toSet
    assert(kept == Set(1L, 3L), s"NULL-condition row must survive DELETE, kept $kept")
    GraftTables.unregister("nulldel_snap")
  }

  test("snapshot SQL VACUUM honors an explicit OLDER THAN age floor") {
    val root = Files.createTempDirectory("graft-vac-snap").toString
    GraftTables.register("vac_age_snap", root)
    spark.range(1, 11).select(col("id").as("k")).createOrReplaceTempView("vac_age_src")
    spark.sql("CREATE TABLE vac_age_snap AS SELECT * FROM vac_age_src")  // v1
    spark.sql("INSERT INTO vac_age_snap SELECT id AS k FROM range(11, 21)") // v2
    spark.sql("INSERT INTO vac_age_snap SELECT id AS k FROM range(21, 31)") // v3
    // every version dir is seconds old: a week-long floor retains them all
    spark.sql("VACUUM vac_age_snap RETAIN 1 VERSIONS OLDER THAN 168 HOURS")
    assert(Versioned.versions(root) == Seq(1L, 2L, 3L),
      "versions younger than the explicit floor must survive")
    // age 0 opts into immediate reclaim
    spark.sql("VACUUM vac_age_snap RETAIN 1 VERSIONS OLDER THAN 0 HOURS")
    assert(Versioned.versions(root) == Seq(3L))
    GraftTables.unregister("vac_age_snap")
  }
}
