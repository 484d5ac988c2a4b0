package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.plans.GraftTables
import graft.sources.FileCow

/** COLUMN DEFAULTS (VERDICT r12 #4) — Iceberg-v3 `initial-default` +
  * `write-default` semantics on the cow layout, plus `INSERT … BY NAME`:
  *
  *  - `ALTER TABLE t ADD COLUMN c T DEFAULT <lit>` stays metadata-only;
  *    pre-ALTER files FILL the default on read (by file vintage, never a
  *    value-level coalesce — an explicit NULL written later stays NULL);
  *  - INSERT (column-list or BY NAME) and MERGE INSERT that OMIT the
  *    column materialize the default;
  *  - compaction reads through the fill and self-heals;
  *  - BY NAME maps query columns to same-named table columns on both
  *    layouts, padding omitted nullable/defaulted columns.
  */
class ColumnDefaultsSpec extends SparkSpec {
  import spark.implicits._

  private def cowTable(prefix: String): String = {
    val root = Files.createTempDirectory(prefix).resolve("t").toString
    FileCow.create(spark, root,
      (1L to 6L).map(k => (k, s"v$k")).toDF("k", "v"), statsCols = Seq("k"))
    root
  }

  test("ADD COLUMN DEFAULT: old files fill on read; explicit NULL stays NULL") {
    val root = cowTable("graft-def1")
    val name = "def1_t"
    GraftTables.registerCow(name, root)
    try {
      spark.sql(s"ALTER TABLE $name ADD COLUMNS (score BIGINT DEFAULT 42)")
      // the ALTER is metadata-only, yet every pre-ALTER row reads 42
      val pre = spark.sql(s"SELECT k, score FROM $name").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(pre.values.toSet == Set(42L), s"old rows must fill 42, got $pre")
      // an explicit NULL written AFTER the alter is a stored value — the
      // fill is by FILE VINTAGE, so it must stay NULL
      spark.sql(s"INSERT INTO $name VALUES (100, 'x', NULL), (101, 'y', 7)")
      val got = spark.sql(s"SELECT k, score FROM $name WHERE k >= 100")
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert(got == Map(100L -> None, 101L -> Some(7L)),
        s"explicit NULL must stay NULL, got $got")
      // old rows still fill across the newer version
      assert(spark.sql(s"SELECT count(*) FROM $name WHERE score = 42")
        .collect().head.getLong(0) == 6L)
      // time travel BEFORE the alter has no such column at all
      assert(!spark.sql(s"SELECT * FROM $name VERSION AS OF 1").columns
        .contains("score"))
    } finally GraftTables.unregister(name)
  }

  test("omitting inserts materialize the default (column list, BY NAME, MERGE)") {
    val root = cowTable("graft-def2")
    val name = "def2_t"
    GraftTables.registerCow(name, root)
    try {
      spark.sql(s"ALTER TABLE $name ADD COLUMNS (score BIGINT DEFAULT 42)")
      spark.sql(s"INSERT INTO $name (k, v) VALUES (200, 'cl')")
      spark.sql(s"INSERT INTO $name BY NAME SELECT 'bn' AS v, 201 AS k")
      spark.sql(s"MERGE INTO $name t USING (SELECT 202 AS k, 'mg' AS v) s " +
        "ON t.k = s.k WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)")
      val got = spark.sql(s"SELECT k, v, score FROM $name WHERE k >= 200")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == Set((200L, "cl", 42L), (201L, "bn", 42L), (202L, "mg", 42L)),
        s"every omitting write must materialize 42, got $got")
      // and the values are PHYSICAL in the new files, not a read-time fill:
      // the raw parquet slice of version 4's added file carries 42
      val added = FileCow.commitInfo(root, 3L).get.added
      assert(added.nonEmpty)
      val raw = spark.read.parquet(added: _*).select("score")
        .collect().map(_.getLong(0)).toSet
      assert(raw == Set(42L), s"the default must be materialized, got $raw")
    } finally GraftTables.unregister(name)
  }

  test("DML rewrites and compaction read through the fill (self-heal)") {
    val root = cowTable("graft-def3")
    FileCow.addColumns(spark, root,
      Seq(org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.LongType)), Map("score" -> "42"))
    // an UPDATE touching OTHER columns must not turn the fill into NULL
    FileCow.update(spark, root, set = Seq("v" -> lit("upd")), cond = col("k") === 1L)
    val afterUpd = FileCow.read(spark, root).filter(col("k") === 1L)
      .select("score").collect().map(_.getLong(0)).toSet
    assert(afterUpd == Set(42L), s"rewrite must materialize the default, got $afterUpd")
    // compaction self-heals: after OPTIMIZE the raw rewritten files carry 42
    FileCow.compact(spark, root, targetFiles = 1)
    val files = FileCow.commitInfo(root, FileCow.currentVersion(root)).get.added
    assert(files.nonEmpty)
    val raw = spark.read.parquet(files: _*).select("score")
      .collect().map(_.getLong(0)).toSet
    assert(raw == Set(42L), s"compaction must materialize the default, got $raw")
  }

  test("defaults follow renames, leave with drops, and validate loudly") {
    val root = cowTable("graft-def4")
    FileCow.addColumns(spark, root,
      Seq(org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.LongType)), Map("score" -> "42"))
    FileCow.renameColumn(spark, root, "score", "pts")
    val v = FileCow.currentVersion(root)
    assert(FileCow.defaultSqlOf(root, v) == Map("pts" -> "42"))
    assert(FileCow.read(spark, root).select("pts").collect()
      .map(_.getLong(0)).toSet == Set(42L), "the fill must follow the rename")
    FileCow.dropColumns(spark, root, Seq("pts"))
    assert(FileCow.defaultSqlOf(root, FileCow.currentVersion(root)).isEmpty,
      "a dropped column's default props must go with it")
    // validation: non-foldable and mistyped defaults refuse at declaration
    val e1 = intercept[Exception] {
      FileCow.addColumns(spark, root,
        Seq(org.apache.spark.sql.types.StructField("r",
          org.apache.spark.sql.types.DoubleType)), Map("r" -> "rand()"))
    }
    assert(e1.getMessage.contains("foldable"), e1.getMessage)
    val e2 = intercept[Exception] {
      FileCow.setTableProperties(spark, root, Map("graft.default.nope" -> "1"))
    }
    assert(e2.getMessage.contains("no such column"), e2.getMessage)
    val e3 = intercept[Exception] {
      FileCow.setTableProperties(spark, root,
        Map("graft.default.k.__files" -> "x.json"))
    }
    assert(e3.getMessage.contains("internal"), e3.getMessage)
  }

  test("convert-vintage (by-name) tables fill defaults too") {
    val plain = Files.createTempDirectory("graft-def5-src").toString
    (1L to 4L).map(k => (k, s"v$k")).toDF("k", "v")
      .write.mode("overwrite").parquet(plain)
    val root = Files.createTempDirectory("graft-def5").resolve("t").toString
    FileCow.convert(spark, root, plain, Seq("k"))
    FileCow.addColumns(spark, root,
      Seq(org.apache.spark.sql.types.StructField("flag",
        org.apache.spark.sql.types.StringType)), Map("flag" -> "'on'"))
    assert(FileCow.read(spark, root).select("flag").collect()
      .map(_.getString(0)).toSet == Set("on"))
  }

  test("BY NAME: reorder + pad on both layouts; unknown and NOT NULL refuse") {
    // cow layout
    val root = cowTable("graft-def6")
    val name = "def6_t"
    GraftTables.registerCow(name, root)
    try {
      spark.sql(s"INSERT INTO $name BY NAME SELECT 'r' AS v, 300 AS k")
      assert(spark.sql(s"SELECT v FROM $name WHERE k = 300").collect()
        .head.getString(0) == "r")
      val e = intercept[Exception] {
        spark.sql(s"INSERT INTO $name BY NAME SELECT 301 AS k, 'x' AS nope")
      }
      assert(e.getMessage.contains("unknown"), e.getMessage)
    } finally GraftTables.unregister(name)
    // NOT NULL without default refuses
    val root2 = Files.createTempDirectory("graft-def6nn").resolve("t").toString
    val name2 = "def6_nn"
    try {
      spark.sql(s"CREATE TABLE $name2 (k BIGINT NOT NULL, v STRING) " +
        s"USING graft-cow LOCATION '$root2'")
      val e2 = intercept[Exception] {
        spark.sql(s"INSERT INTO $name2 BY NAME SELECT 'x' AS v")
      }
      assert(e2.getMessage.contains("NOT NULL"), e2.getMessage)
    } finally GraftTables.unregister(name2)
    // snapshot layout
    val root3 = Files.createTempDirectory("graft-def6s").resolve("t").toString
    val name3 = "def6_s"
    graft.sources.Versioned.publish((1L to 3L).map(k => (k, s"v$k"))
      .toDF("k", "v"), root3)
    GraftTables.register(name3, root3)
    try {
      spark.sql(s"INSERT INTO $name3 BY NAME SELECT 'snap' AS v, 400 AS k")
      assert(spark.sql(s"SELECT v FROM $name3 WHERE k = 400").collect()
        .head.getString(0) == "snap")
    } finally GraftTables.unregister(name3)
  }

  test("SHOW CREATE replays the write-side default, never the vintage refs") {
    val root = cowTable("graft-def7")
    val name = "def7_t"
    GraftTables.registerCow(name, root)
    try {
      spark.sql(s"ALTER TABLE $name ADD COLUMNS (score BIGINT DEFAULT 42)")
      val ddl = spark.sql(s"SHOW CREATE TABLE $name").collect().head.getString(0)
      assert(ddl.contains("'graft.default.score' = '42'"), ddl)
      assert(!ddl.contains("__since") && !ddl.contains("__files"), ddl)
      // replay into a fresh location: the default applies to writes there
      val name8 = "def7_replay"
      val root8 = Files.createTempDirectory("graft-def7r").resolve("t").toString
      spark.sql(ddl.replace(s"CREATE TABLE $name", s"CREATE TABLE $name8")
        .replace(s"LOCATION '$root'", s"LOCATION '$root8'"))
      try {
        spark.sql(s"INSERT INTO $name8 (k, v) VALUES (1, 'a')")
        assert(spark.sql(s"SELECT score FROM $name8").collect()
          .head.getLong(0) == 42L)
      } finally GraftTables.unregister(name8)
    } finally GraftTables.unregister(name)
  }
}
