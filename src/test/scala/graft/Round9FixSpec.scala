package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.plans.GraftTables
import graft.sources.FileCow

/** Round-9 hardening, each test pinning one adjudicated finding:
  *
  *   1. compound-key merges prune on EVERY keyed stats column (intersected
  *      admission), not just the first key that has stats;
  *   2. NULL merge keys are rejected loudly (stats can never prune them and
  *      key uniqueness would silently break);
  *   3. table roots containing URI-escaped characters (a space) survive the
  *      per-file stats pass (basename join, not URI-string matching);
  *   4. SQL VACUUM defaults to a 7-day data-file age floor (in-flight-commit
  *      safety) and `OLDER THAN 0 HOURS` opts into immediate reclaim;
  *   5. `TIMESTAMP AS OF` resolves in the SESSION timezone;
  *   6. [[graft.sources.ReportExport.writeCsv]] refuses fact-sized frames;
  *   7. `FileCow.create` signals a lost creation race with the message
  *      [[graft.streaming.CowUpsertSink]]'s fallback matches on.
  */
class Round9FixSpec extends SparkSpec {
  import spark.implicits._

  test("merge prunes on ALL keyed stats columns: tight second key beats a wide lead key") {
    val root = Files.createTempDirectory("graft-mkprune").toString
    // lead key k1 has only 2 values -> every k1=0 file shares the same
    // [0, 0] range; k2 is tight per file. Lexicographic range partitioning
    // gives 4 files per k1 value with disjoint k2 ranges.
    val base = spark.range(0, 800).select(
      (col("id") % 2).as("k1"), col("id").as("k2"), lit("v").as("p"))
      .repartitionByRange(8, col("k1"), col("k2"))
    val c0 = FileCow.create(spark, root, base, statsCols = Seq("k1", "k2"))
    assert(c0.filesAdded == 8L)
    // one touched row: k1=0 admits 4 files, but k2=10 admits exactly 1
    val c1 = FileCow.merge(spark, root,
      Seq((0L, 10L, "upd")).toDF("k1", "k2", "p"), keys = Seq("k1", "k2"))
    assert(c1.filesRewritten == 1L,
      s"intersected admission must touch 1 file, touched ${c1.filesRewritten}")
    assert(c1.filesKept == 7L)
    val got = FileCow.read(spark, root)
    assert(got.filter(col("p") === "upd").select("k2").as[Long].collect().toSeq == Seq(10L))
    assert(got.count() == 800L)
  }

  test("merge rejects NULL source keys loudly") {
    val root = Files.createTempDirectory("graft-nullkey").toString
    FileCow.create(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v").repartition(1), statsCols = Seq("k"))
    val e = intercept[IllegalArgumentException] {
      FileCow.merge(spark, root,
        Seq((Some(3L), "c"), (None, "nul")).toDF("k", "v"), keys = Seq("k"))
    }
    assert(e.getMessage.contains("NULL merge key"))
    // table unchanged: the reject happened before any commit
    assert(FileCow.currentVersion(root) == 1L)
  }

  test("cow table under a root with a space: stats pass and DML survive URI escaping") {
    val parent = Files.createTempDirectory("graft-uri esc")
    val root = parent.resolve("cow table").toString
    val base = spark.range(1, 101).select(col("id").as("k"), col("id").as("v"))
      .repartitionByRange(4, col("k"))
    val c = FileCow.create(spark, root, base, statsCols = Seq("k"))
    assert(c.filesAdded == 4L)
    // manifest rows carry real stats (the basename join found every file)
    val man = FileCow.manifest(spark, root, 1L)
    assert(man.agg(sum("rows")).as[Long].head() == 100L)
    val c2 = FileCow.merge(spark, root, Seq((5L, -5L)).toDF("k", "v"), keys = Seq("k"))
    assert(c2.filesRewritten == 1L)
    assert(FileCow.read(spark, root).filter(col("k") === 5).select("v")
      .as[Long].head() == -5L)
  }

  test("SQL VACUUM: default age floor keeps fresh unreferenced files; OLDER THAN 0 reclaims") {
    val root = Files.createTempDirectory("graft-vacage").toString
    GraftTables.registerCow("vac_age", root)
    spark.range(1, 101).select(col("id").as("k"), col("id").as("v"))
      .repartitionByRange(4, col("k")).createOrReplaceTempView("vac_age_b")
    spark.sql("MERGE INTO vac_age t USING vac_age_b s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    spark.sql("DELETE FROM vac_age WHERE k <= 25") // retires 1 of 4 files
    def dataFiles(): Set[String] = {
      val it = Files.list(Paths.get(root, "_data")).iterator()
      val b = scala.collection.mutable.Set.empty[String]
      while (it.hasNext) b += it.next().getFileName.toString
      b.toSet
    }
    val before = dataFiles()
    spark.sql("VACUUM vac_age RETAIN 1 VERSIONS")
    assert(FileCow.versions(root) == Seq(2L))
    // v1's retired file is unreferenced but FRESH: the 7-day default floor
    // protects it (the in-flight-commit race window)
    assert(dataFiles() == before)
    spark.sql("VACUUM vac_age RETAIN 1 VERSIONS OLDER THAN 0 HOURS")
    val after = dataFiles()
    assert(after.subsetOf(before) && after.size < before.size)
    assert(spark.sql("SELECT count(*) c FROM vac_age").as[Long].head() == 75L)
    GraftTables.unregister("vac_age")
  }

  test("TIMESTAMP AS OF resolves the literal in the session timezone") {
    val root = Files.createTempDirectory("graft-tstz").toString
    GraftTables.registerCow("ts_tz", root)
    spark.range(1, 11).select(col("id").as("k"), lit("old").as("v"))
      .repartitionByRange(2, col("k")).createOrReplaceTempView("ts_tz_b")
    spark.sql("MERGE INTO ts_tz t USING ts_tz_b s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    Thread.sleep(60)
    spark.sql("UPDATE ts_tz SET v = 'new'")
    // commit-time basis is the RECORD's own commitMs (r13: survives a
    // copied table dir; a vacuum-materialized checkpoint never shifts it)
    val t1 = graft.sources.FileCow.commitInfo(root, 1L).get.commitMs
    val zone = java.time.ZoneId.of("Australia/Sydney") // +10/+11, never UTC
    val local = java.time.Instant.ofEpochMilli(t1).atZone(zone)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", zone.getId)
      // a Sydney-wall-clock literal of t1 must resolve to version 1; the old
      // hard-coded-UTC cast would shift it ~10 h into the future and read v2
      assert(spark.sql(s"SELECT v FROM ts_tz TIMESTAMP AS OF '$local' WHERE k = 1")
        .as[String].head() == "old")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
    GraftTables.unregister("ts_tz")
  }

  test("ReportExport.writeCsv refuses a frame over the report-row ceiling") {
    val out = Files.createTempDirectory("graft-csvguard").toString
    val big = spark.range(0, 5000).select(col("id"), (col("id") % 7).as("g"))
    val e = intercept[IllegalArgumentException] {
      graft.sources.ReportExport.writeCsv(big, out, Seq("id", "g"),
        sortCols = Seq("id"), maxRows = 1000L)
    }
    assert(e.getMessage.contains("exceeds 1000 rows"))
    // at or under the ceiling still delivers the one-file report
    graft.sources.ReportExport.writeCsv(big.limit(100), out, Seq("id", "g"),
      sortCols = Seq("id"), maxRows = 1000L)
    import scala.jdk.CollectionConverters._
    val files = Files.list(Paths.get(out)).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".csv")).toSeq
    assert(files.size == 1)
  }

  test("create on an existing table raises the message the streaming fallback matches") {
    val root = Files.createTempDirectory("graft-createrace").toString
    val df = Seq((1L, "a")).toDF("k", "v").repartition(1)
    FileCow.create(spark, root, df, statsCols = Seq("k"))
    // CowUpsertSink's lost-creation-race catch keys on this exact message —
    // pin it so a reworded require cannot silently break the fallback
    val e = intercept[IllegalArgumentException] {
      FileCow.create(spark, root, df, statsCols = Seq("k"))
    }
    assert(e.getMessage.contains("already exists"))
  }
}
