package graft

import java.nio.file.Files

import graft.plans.GraftTables
import graft.sources.FileCow

/** The DSv2 `TableCatalog` plugin (VERDICT r12 missing #1): graft tables
  * visible to SPARK'S OWN catalog machinery — `SHOW TABLES IN graft`,
  * `DESCRIBE TABLE graft.t`, `spark.catalog.listTables("graft")`,
  * `spark.table("graft.t")`, `USE graft`, catalog-qualified DML/DDL and
  * time travel — all over the SAME registry and read/write paths as the
  * unprefixed spellings (one binding, one scan plan, one commit seam). */
class GraftDsv2CatalogSpec extends SparkSpec {

  private def withWarehouse[T](body: String => T): T = {
    val wh = Files.createTempDirectory("graft-dsv2-wh").toString
    GraftTables.attachWarehouse(wh)
    try body(wh) finally GraftTables.detachWarehouse()
  }

  test("headline spellings: SHOW TABLES IN graft, DESCRIBE, listTables, spark.table") {
    withWarehouse { _ =>
      spark.sql("CREATE TABLE dsv2_a (k BIGINT NOT NULL, v STRING) USING graft-cow")
      spark.sql("INSERT INTO dsv2_a SELECT id, concat('v', id) FROM range(0, 5)")
      spark.sql("CREATE TABLE sales.dsv2_b (k BIGINT NOT NULL, amt DOUBLE) USING graft-cow")

      val shown = spark.sql("SHOW TABLES IN graft").collect().map(_.getString(1))
      assert(shown.contains("dsv2_a"), shown.mkString(", "))
      assert(!shown.contains("dsv2_b"), "namespaced tables list under their namespace")
      val shownNs = spark.sql("SHOW TABLES IN graft.sales").collect().map(_.getString(1))
      assert(shownNs.sameElements(Array("dsv2_b")), shownNs.mkString(", "))

      val desc = spark.sql("DESCRIBE TABLE graft.dsv2_a").collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(desc.contains(("k", "bigint")) && desc.contains(("v", "string")),
        desc.mkString(", "))

      val listed = spark.catalog.listTables("graft").collect().map(_.name)
      assert(listed.contains("dsv2_a"), listed.mkString(", "))

      assert(spark.table("graft.dsv2_a").count() == 5L)
      // the catalog-qualified scan is the SAME plan (same values) as the
      // unprefixed one
      assert(spark.sql("SELECT sum(k) AS s FROM graft.dsv2_a").collect()
        .head.getLong(0) ==
        spark.sql("SELECT sum(k) AS s FROM dsv2_a").collect().head.getLong(0))
    }
  }

  test("catalog-qualified DML: INSERT, MERGE, UPDATE, DELETE land the same commits") {
    withWarehouse { _ =>
      spark.sql("CREATE TABLE dsv2_dml (k BIGINT NOT NULL, v STRING) USING graft-cow")
      spark.sql("INSERT INTO graft.dsv2_dml SELECT id, concat('v', id) FROM range(0, 4)")
      assert(spark.table("dsv2_dml").count() == 4L)

      spark.sql("MERGE INTO graft.dsv2_dml t USING (SELECT CAST(2 AS BIGINT) AS k, " +
        "'m2' AS v UNION ALL SELECT 9L, 'm9') s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET v = s.v WHEN NOT MATCHED THEN INSERT *")
      val afterMerge = spark.table("dsv2_dml").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(afterMerge(2L) == "m2" && afterMerge(9L) == "m9" && afterMerge.size == 5)

      spark.sql("UPDATE graft.dsv2_dml SET v = 'upd' WHERE k = 0")
      assert(spark.sql("SELECT v FROM dsv2_dml WHERE k = 0").collect()
        .head.getString(0) == "upd")

      spark.sql("DELETE FROM graft.dsv2_dml WHERE k = 1")
      assert(spark.table("graft.dsv2_dml").count() == 4L)

      spark.sql("INSERT OVERWRITE graft.dsv2_dml SELECT id, 'ow' FROM range(0, 2)")
      assert(spark.table("graft.dsv2_dml").count() == 2L)
    }
  }

  test("time travel through the catalog's loadTable overloads") {
    withWarehouse { _ =>
      spark.sql("CREATE TABLE dsv2_tt (k BIGINT NOT NULL) USING graft-cow")
      spark.sql("INSERT INTO dsv2_tt SELECT id FROM range(0, 3)")
      spark.sql("INSERT INTO dsv2_tt SELECT id FROM range(10, 15)")
      assert(spark.sql("SELECT count(*) AS n FROM graft.dsv2_tt VERSION AS OF 1")
        .collect().head.getLong(0) == 0L, "v1 is the empty create")
      assert(spark.sql("SELECT count(*) AS n FROM graft.dsv2_tt VERSION AS OF 2")
        .collect().head.getLong(0) == 3L)
      assert(spark.sql("SELECT count(*) AS n FROM graft.dsv2_tt VERSION AS OF 3")
        .collect().head.getLong(0) == 8L)
      assert(spark.sql("SELECT count(*) AS n FROM graft.dsv2_tt TIMESTAMP AS OF " +
        "current_timestamp()").collect().head.getLong(0) == 8L)
    }
  }

  test("catalog-path CREATE (no USING) honors column DEFAULTs; DROP unbinds, data stays") {
    withWarehouse { wh =>
      // no USING clause → the parser intercept passes; Spark's own CREATE
      // resolves against the graft catalog → GraftCatalog.createTable
      spark.sql("CREATE TABLE graft.dsv2_c (k BIGINT NOT NULL, v STRING DEFAULT 'dv')")
      val e = GraftTables.entryOf("dsv2_c").get
      assert(e.cow && FileCow.currentVersion(e.root) == 1L,
        s"catalog createTable must land the same empty-create commit, got $e")
      // the DEFAULT rides the CowDefaults seam → an omitting INSERT pads it
      spark.sql("INSERT INTO graft.dsv2_c (k) VALUES (1)")
      assert(spark.sql("SELECT v FROM dsv2_c WHERE k = 1").collect()
        .head.getString(0) == "dv")
      // DESCRIBE through the catalog shows both columns
      val cols = spark.sql("DESCRIBE TABLE graft.dsv2_c").collect().map(_.getString(0))
      assert(cols.contains("k") && cols.contains("v"))

      spark.sql("DROP TABLE graft.dsv2_c")
      assert(GraftTables.entryOf("dsv2_c").isEmpty, "binding gone")
      assert(FileCow.currentVersion(e.root) == 2L,
        "data stays (external-table semantics; reclaim is vacuum's job)")
    }
  }

  test("USE graft: bare names resolve, list, and write through the catalog") {
    withWarehouse { _ =>
      spark.sql("CREATE TABLE dsv2_use (k BIGINT NOT NULL) USING graft-cow")
      spark.sql("INSERT INTO dsv2_use SELECT id FROM range(0, 3)")
      spark.sql("USE graft")
      try {
        assert(spark.sql("SELECT count(*) AS n FROM dsv2_use").collect()
          .head.getLong(0) == 3L)
        val shown = spark.sql("SHOW TABLES").collect().map(_.getString(1))
        assert(shown.contains("dsv2_use"), shown.mkString(", "))
        spark.sql("INSERT INTO dsv2_use VALUES (7)")
        assert(spark.sql("SELECT count(*) AS n FROM dsv2_use").collect()
          .head.getLong(0) == 4L)
      } finally spark.sql("USE spark_catalog.default")
    }
  }

  test("writeTo API appends through the V1Write fallback") {
    withWarehouse { _ =>
      spark.sql("CREATE TABLE dsv2_wt (k BIGINT NOT NULL) USING graft-cow")
      spark.range(0, 6).toDF("k").writeTo("graft.dsv2_wt").append()
      assert(spark.table("graft.dsv2_wt").count() == 6L)
    }
  }

  test("ALTER through the catalog: ADD COLUMNS, RENAME TO, SHOW NAMESPACES") {
    withWarehouse { _ =>
      spark.sql("CREATE TABLE ns1.dsv2_alt (k BIGINT NOT NULL) USING graft-cow")
      spark.sql("INSERT INTO graft.ns1.dsv2_alt VALUES (1)")
      spark.sql("ALTER TABLE graft.ns1.dsv2_alt ADD COLUMNS (w DOUBLE)")
      assert(spark.table("graft.ns1.dsv2_alt").columns.toSeq == Seq("k", "w"))

      val nss = spark.sql("SHOW NAMESPACES IN graft").collect().map(_.getString(0))
      assert(nss.contains("ns1"), nss.mkString(", "))

      spark.sql("ALTER TABLE graft.ns1.dsv2_alt RENAME TO graft.ns1.dsv2_alt2")
      assert(GraftTables.entryOf("ns1.dsv2_alt").isEmpty)
      assert(spark.table("graft.ns1.dsv2_alt2").count() == 1L)
    }
  }

  test("a catalog-qualified CREATE ... USING graft-cow registers the FLAT key") {
    withWarehouse { _ =>
      spark.sql("CREATE TABLE graft.dsv2_flat (k BIGINT NOT NULL) USING graft-cow")
      assert(GraftTables.entryOf("dsv2_flat").isDefined,
        "graft.t and t must be one binding, not two")
      assert(GraftTables.entryOf("graft.dsv2_flat").isEmpty)
      assert(spark.sql("SHOW TABLES IN graft").collect().map(_.getString(1))
        .contains("dsv2_flat"))
      // and CTAS through the same strip
      spark.sql("CREATE TABLE graft.dsv2_flat2 USING graft-cow AS SELECT 1L AS k")
      assert(GraftTables.entryOf("dsv2_flat2").isDefined)
      assert(spark.table("graft.dsv2_flat2").count() == 1L)
    }
  }

  test("path tables resolve through the catalog too (graft.`/path` spelling)") {
    withWarehouse { _ =>
      val root = Files.createTempDirectory("dsv2-path").resolve("t").toString
      graft.sources.Versioned.publish(spark.range(0, 4).toDF("k"), root)
      assert(spark.sql(s"SELECT count(*) AS n FROM graft.`$root`").collect()
        .head.getLong(0) == 4L)
      val desc = spark.sql(s"DESCRIBE TABLE graft.`$root`").collect().map(_.getString(0))
      assert(desc.contains("k"), desc.mkString(", "))
    }
  }

  test("catalog CTAS, TRUNCATE, SHOW TBLPROPERTIES, listColumns") {
    withWarehouse { _ =>
      // CTAS with no USING routes through the catalog's createTable + the
      // V1 write fallback (CreateTableAsSelectExec)
      spark.sql("CREATE TABLE graft.dsv2_ctas AS SELECT id AS k, " +
        "concat('v', id) AS v FROM range(0, 7)")
      assert(GraftTables.entryOf("dsv2_ctas").exists(_.cow))
      assert(spark.table("graft.dsv2_ctas").count() == 7L)

      val cols = spark.catalog.listColumns("graft.dsv2_ctas").collect().map(_.name)
      assert(cols.toSet == Set("k", "v"), cols.mkString(", "))

      spark.sql("ALTER TABLE dsv2_ctas SET TBLPROPERTIES ('owner' = 'me')")
      val props = spark.sql("SHOW TBLPROPERTIES graft.dsv2_ctas").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props.get("owner").contains("me"), props.toString)

      spark.sql("TRUNCATE TABLE graft.dsv2_ctas")
      assert(spark.table("graft.dsv2_ctas").count() == 0L)
      assert(FileCow.currentVersion(GraftTables.entryOf("dsv2_ctas").get.root) >= 3L,
        "TRUNCATE is one commit; history survives")
    }
  }

  test("readStream.table('graft.t') streams through the proven V1 source") {
    withWarehouse { _ =>
      spark.sql("CREATE TABLE dsv2_rs (k BIGINT NOT NULL) USING graft-cow")
      spark.sql("INSERT INTO dsv2_rs SELECT id FROM range(0, 5)")
      val got = scala.collection.mutable.Set.empty[Long]
      val q = spark.readStream.table("graft.dsv2_rs")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized { got ++= b.select("k").collect().map(_.getLong(0)) }; ()
        }
        .option("checkpointLocation",
          Files.createTempDirectory("dsv2-rs-ck").toString)
        .start()
      try {
        q.processAllAvailable()
        assert(got.isEmpty, "the default start is the CURRENT version — " +
          "existing rows do not re-stream")
        spark.sql("INSERT INTO graft.dsv2_rs SELECT id FROM range(100, 103)")
        q.processAllAvailable()
        assert(got == Set(100L, 101L, 102L), got.toString)
      } finally q.stop()
      // statement intercepts take the catalog-qualified spelling too
      assert(spark.sql("DESCRIBE HISTORY graft.dsv2_rs").count() >= 3L)
      spark.sql("VACUUM graft.dsv2_rs RETAIN 100 VERSIONS DRY RUN").collect()
    }
  }

  test("catalog-qualified MERGE WITH SCHEMA EVOLUTION and INSERT BY NAME") {
    withWarehouse { _ =>
      spark.sql("CREATE TABLE dsv2_ev (k BIGINT NOT NULL, v STRING) USING graft-cow")
      spark.sql("INSERT INTO dsv2_ev VALUES (1, 'a'), (2, 'b')")
      // the DSv2-resolved target's clauses may arrive RESOLVED; evolution
      // widens the schema inside the merge commit
      spark.sql("MERGE WITH SCHEMA EVOLUTION INTO graft.dsv2_ev t USING " +
        "(SELECT CAST(2 AS BIGINT) AS k, 'b2' AS v, 9.5D AS w " +
        " UNION ALL SELECT 3L, 'c', 1.5D) s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
      val rows = spark.table("graft.dsv2_ev").collect()
        .map(r => r.getLong(0) -> (r.getString(1),
          if (r.isNullAt(2)) null else r.getDouble(2))).toMap
      assert(rows(1L) == (("a", null)), "pre-evolution row pads null")
      assert(rows(2L) == (("b2", 9.5)) && rows(3L) == (("c", 1.5)), rows.toString)

      spark.sql("INSERT INTO graft.dsv2_ev BY NAME " +
        "SELECT 'd' AS v, CAST(4 AS BIGINT) AS k, 2.5D AS w")
      assert(spark.sql("SELECT v FROM dsv2_ev WHERE k = 4").collect()
        .head.getString(0) == "d", "BY NAME maps columns by name, any order")
    }
  }

  test("a second session (fresh sessionState) sees the same catalog") {
    withWarehouse { _ =>
      spark.sql("CREATE TABLE dsv2_s2 (k BIGINT NOT NULL) USING graft-cow")
      spark.sql("INSERT INTO dsv2_s2 VALUES (1), (2)")
      val s2 = spark.newSession()
      assert(s2.sql("SHOW TABLES IN graft").collect().map(_.getString(1))
        .contains("dsv2_s2"))
      assert(s2.table("graft.dsv2_s2").count() == 2L)
    }
  }
}
