package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.plans.GraftTables
import graft.sources.Versioned

/** G18: `MERGE INTO` as real Spark SQL over Versioned snapshot tables —
  * the resolution-rule + strategy + physical-exec stack registered by
  * GraftExtensions (SparkSpec's session carries
  * spark.sql.extensions=graft.GraftExtensions, the deployment conf).
  */
class GraftMergeSpec extends SparkSpec {

  private def freshTable(name: String): String = {
    val root = Files.createTempDirectory(s"graft-merge-$name").toString
    GraftTables.register(name, root)
    root
  }

  test("G18 MERGE upserts: updates matched keys, inserts new, snapshots advance") {
    val s = spark
    import s.implicits._
    val root = freshTable("orders_v")

    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "amt").createOrReplaceTempView("merge_base")
    spark.sql("MERGE INTO orders_v t USING merge_base s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(Versioned.currentVersion(root) == 1L)

    Seq((2L, "b2", 25.0), (4L, "d", 40.0))
      .toDF("k", "name", "amt").createOrReplaceTempView("merge_inc")
    spark.sql("MERGE INTO orders_v t USING merge_inc s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(Versioned.currentVersion(root) == 2L)

    val got = Versioned.read(spark, root).as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "a", 10.0), (2L, "b2", 25.0), (3L, "c", 30.0), (4L, "d", 40.0)))

    // time travel: the pre-merge snapshot is untouched
    val v1 = Versioned.readVersion(spark, root, 1L).as[(Long, String, Double)].collect().toSet
    assert(v1 == Set((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))

    // CDF across the merge commit sees exactly the update + the insert
    val changes = Versioned.changesBetween(spark, root, Seq("k"), 1L, 2L)
      .select("k", "_change_type").as[(Long, String)].collect().toSet
    assert(changes == Set((2L, "update_pre"), (2L, "update_post"), (4L, "insert")))
  }

  test("G18 WHEN NOT MATCHED BY SOURCE THEN DELETE makes the table the source") {
    val s = spark
    import s.implicits._
    val root = freshTable("sync_v")
    Seq((1L, "x"), (2L, "y")).toDF("k", "v").createOrReplaceTempView("sync_b")
    spark.sql("MERGE INTO sync_v t USING sync_b s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    Seq((2L, "y2"), (3L, "z")).toDF("k", "v").createOrReplaceTempView("sync_i")
    spark.sql("MERGE INTO sync_v t USING sync_i s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * " +
      "WHEN NOT MATCHED BY SOURCE THEN DELETE")
    val got = Versioned.read(spark, root).as[(Long, String)].collect().toSet
    assert(got == Set((2L, "y2"), (3L, "z"))) // key 1 deleted
  }

  test("G18 duplicate source keys are rejected (multiple-matches contract)") {
    val s = spark
    import s.implicits._
    val root = freshTable("dup_v")
    Seq((1L, "a"), (1L, "b")).toDF("k", "v").createOrReplaceTempView("dup_src")
    val e = intercept[Exception] {
      spark.sql("MERGE INTO dup_v t USING dup_src s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    }
    assert(e.getMessage.contains("duplicate source rows"))
    assert(Versioned.currentVersion(root) == 0L) // nothing published
  }

  test("G18 unsupported shapes fail loudly; non-equality ON rejected") {
    val s = spark
    import s.implicits._
    freshTable("shape_v")
    Seq((1L, "a")).toDF("k", "v").createOrReplaceTempView("shape_src")
    val e1 = intercept[Exception] {
      spark.sql("MERGE INTO shape_v t USING shape_src s ON t.k = s.k " +
        "WHEN MATCHED THEN DELETE")
    }
    assert(e1.getMessage.contains("UPDATE SET *"))
    val e2 = intercept[Exception] {
      spark.sql("MERGE INTO shape_v t USING shape_src s ON t.k > s.k " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    }
    assert(e2.getMessage.contains("conjunction"))
  }

  test("G18 unregistered targets pass through to normal resolution") {
    val s = spark
    import s.implicits._
    Seq((1L, "a")).toDF("k", "v").createOrReplaceTempView("pt_src")
    val e = intercept[Exception] {
      spark.sql("MERGE INTO never_registered t USING pt_src s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    }
    // fails as a missing table / non-row-level-op table, NOT via graft's rule
    assert(!e.getMessage.contains("graft MERGE"))
  }

  test("G18 schema mismatch between source and table fails loudly") {
    val s = spark
    import s.implicits._
    val root = freshTable("schema_v")
    Seq((1L, "a")).toDF("k", "v").createOrReplaceTempView("schema_b")
    spark.sql("MERGE INTO schema_v t USING schema_b s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    Seq((2L, "b", 1.0)).toDF("k", "v", "extra").createOrReplaceTempView("schema_i")
    val e = intercept[Exception] {
      spark.sql("MERGE INTO schema_v t USING schema_i s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    }
    assert(e.getMessage.contains("must match table columns"))
    assert(Versioned.currentVersion(root) == 1L)
  }

  test("G18 SELECT and VERSION AS OF resolve registered tables in plain SQL") {
    val s = spark
    import s.implicits._
    val root = freshTable("sel_v")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").createOrReplaceTempView("sel_b")
    spark.sql("MERGE INTO sel_v t USING sel_b s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    Seq((2L, "b2"), (3L, "c")).toDF("k", "v").createOrReplaceTempView("sel_i")
    spark.sql("MERGE INTO sel_v t USING sel_i s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")

    val now = spark.sql("SELECT k, v FROM sel_v ORDER BY k").as[(Long, String)].collect().toSeq
    assert(now == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
    val v1 = spark.sql("SELECT k, v FROM sel_v VERSION AS OF 1 ORDER BY k")
      .as[(Long, String)].collect().toSeq
    assert(v1 == Seq((1L, "a"), (2L, "b")))
    // joins/aggregates over the resolved relation work like any table
    val cnt = spark.sql("SELECT COUNT(*) FROM sel_v WHERE k >= 2").as[Long].head()
    assert(cnt == 2L)
    assert(Versioned.currentVersion(root) == 2L)
    // TIMESTAMP AS OF: the instant of v1's commit resolves to v1
    // the in-dir _commit_ms stamp is the basis (r13: survives fresh mtimes)
    val t1 = Versioned.history(spark, root).where("version = 1")
      .select("commit_ms").as[Long].head()
    val iso = java.time.Instant.ofEpochMilli(t1).toString.replace("T", " ").stripSuffix("Z")
    val atT1 = spark.sql(s"SELECT k, v FROM sel_v TIMESTAMP AS OF '$iso' ORDER BY k")
      .as[(Long, String)].collect().toSeq
    assert(atT1 == Seq((1L, "a"), (2L, "b")))
  }

  test("G18 DELETE FROM publishes a snapshot without the matching rows") {
    val s = spark
    import s.implicits._
    val root = freshTable("del_v")
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "amt")
      .createOrReplaceTempView("del_b")
    spark.sql("MERGE INTO del_v t USING del_b s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    spark.sql("DELETE FROM del_v t WHERE t.amt > 15.0")
    val got = spark.sql("SELECT k FROM del_v").as[Long].collect().toSet
    assert(got == Set(1L))
    assert(Versioned.currentVersion(root) == 2L)
    // pre-delete snapshot intact
    assert(Versioned.readVersion(spark, root, 1L).count() == 3L)
  }

  test("G18 UPDATE SET rewrites only matching rows; unconditional UPDATE all") {
    val s = spark
    import s.implicits._
    val root = freshTable("upd_v")
    Seq((1L, 10.0, "x"), (2L, 20.0, "y")).toDF("k", "amt", "tag")
      .createOrReplaceTempView("upd_b")
    spark.sql("MERGE INTO upd_v t USING upd_b s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    spark.sql("UPDATE upd_v SET amt = amt * 2 WHERE k = 2")
    val got = spark.sql("SELECT k, amt, tag FROM upd_v ORDER BY k")
      .as[(Long, Double, String)].collect().toSeq
    assert(got == Seq((1L, 10.0, "x"), (2L, 40.0, "y")))
    spark.sql("UPDATE upd_v SET tag = 'z'")
    val tags = spark.sql("SELECT DISTINCT tag FROM upd_v").as[String].collect().toSet
    assert(tags == Set("z"))
    assert(Versioned.currentVersion(root) == 3L)
  }

  test("G18 VACUUM retains the newest n snapshots, keeps reads working") {
    val s = spark
    import s.implicits._
    val root = freshTable("vac_v")
    for (i <- 1 to 4) {
      Seq((i.toLong, s"r$i")).toDF("k", "v").createOrReplaceTempView(s"vac_$i")
      spark.sql(s"MERGE INTO vac_v t USING vac_$i s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    }
    assert(Versioned.versions(root) == Seq(1L, 2L, 3L, 4L))
    spark.sql("VACUUM vac_v RETAIN 2 VERSIONS")
    assert(Versioned.versions(root) == Seq(3L, 4L))
    // current reads + retained time travel still work; expired fails loudly
    assert(spark.sql("SELECT COUNT(*) FROM vac_v").as[Long].head() == 4L)
    assert(spark.sql("SELECT COUNT(*) FROM vac_v VERSION AS OF 3").as[Long].head() == 3L)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM vac_v VERSION AS OF 1").collect()
    }
    assert(e.getMessage.contains("not retained"))
    // unregistered table name fails loudly at parse time
    val e2 = intercept[Exception] { spark.sql("VACUUM nope_v RETAIN 2 VERSIONS") }
    assert(e2.getMessage.contains("not a registered graft table"))
  }

  test("G18 optimistic concurrency: racing merges both land exactly once") {
    val s = spark
    import s.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val root = freshTable("race_v")
    Seq((0L, "base")).toDF("k", "v").createOrReplaceTempView("race_b")
    spark.sql("MERGE INTO race_v t USING race_b s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")

    // two writers, disjoint keys, racing the same base version
    Seq((1L, "w1")).toDF("k", "v").createOrReplaceTempView("race_1")
    Seq((2L, "w2")).toDF("k", "v").createOrReplaceTempView("race_2")
    val fs = Seq("race_1", "race_2").map { v =>
      Future {
        spark.sql(s"MERGE INTO race_v t USING $v s ON t.k = s.k " +
          "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
      }
    }
    fs.foreach(Await.result(_, 120.seconds))

    val got = Versioned.read(spark, root).as[(Long, String)].collect().toSet
    assert(got == Set((0L, "base"), (1L, "w1"), (2L, "w2")),
      s"lost an update in the race: $got")
    // exactly one commit per writer: base + 2 = version 3, no gaps
    assert(Versioned.currentVersion(root) == 3L)
    assert(Versioned.versions(root) == Seq(1L, 2L, 3L))
  }

  test("G18 publishIf rejects a stale expected version without committing") {
    val s = spark
    import s.implicits._
    val root = freshTable("cas_v")
    val df = Seq((1L, "a")).toDF("k", "v")
    Versioned.publishIf(df, root, 0L)
    assert(Versioned.currentVersion(root) == 1L)
    val e = intercept[graft.sources.ConcurrentPublishException] {
      Versioned.publishIf(df, root, 0L) // stale: table moved to 1
    }
    assert(e.getMessage.contains("expected version 0"))
    assert(Versioned.currentVersion(root) == 1L)
    assert(Versioned.versions(root) == Seq(1L)) // no orphan snapshot published
  }

  test("G18 merge result equals the q06-style anti-join+union reference") {
    val s = spark
    import s.implicits._
    val root = freshTable("ref_v")
    val base = Seq((1L, 5.0), (2L, 6.0), (3L, 7.0)).toDF("k", "amt")
    val inc = Seq((3L, 70.0), (4L, 80.0)).toDF("k", "amt")
    base.createOrReplaceTempView("ref_b"); inc.createOrReplaceTempView("ref_i")
    spark.sql("MERGE INTO ref_v t USING ref_b s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    spark.sql("MERGE INTO ref_v t USING ref_i s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    val expected = inc.unionByName(base.join(inc.select("k"), Seq("k"), "left_anti"))
    val got = Versioned.read(spark, root)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }
}
