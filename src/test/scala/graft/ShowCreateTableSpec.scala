package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.plans.GraftTables
import graft.sources.FileCow

/** `SHOW CREATE TABLE` on registered graft names: the migration artifact —
  * columns with nullability, layout, location, table properties (CHECK
  * constraints ride them), and the bloom-index statement when declared.
  * Unregistered names stay Spark's.
  */
class ShowCreateTableSpec extends SparkSpec {
  import spark.implicits._

  test("cow table DDL carries schema, location, properties and the bloom index") {
    val root = Files.createTempDirectory("graft-showcreate").toString
    GraftTables.registerCow("sc_cow", root)
    FileCow.create(spark, root,
      spark.range(1, 51).select(col("id").as("k"),
        md5(col("id").cast("string")).as("h"), (col("id") * 1.5).as("amt"))
        .repartitionByRange(2, col("k")),
      statsCols = Seq("k"), bloomCols = Seq("h"))
    spark.sql("ALTER TABLE sc_cow ADD CONSTRAINT amt_pos CHECK (amt > 0)")
    // a predicate with a string literal: the DDL must '' -escape it
    spark.sql("ALTER TABLE sc_cow ADD CONSTRAINT h_ok CHECK (h <> 'bad')")

    val ddl = spark.sql("SHOW CREATE TABLE sc_cow").as[String].head()
    assert(ddl.contains("CREATE TABLE sc_cow ("))
    assert(ddl.contains("k BIGINT"))
    assert(ddl.contains("h STRING"))
    assert(ddl.contains("amt DOUBLE"))
    assert(ddl.contains("USING graft-cow"))
    assert(ddl.contains(s"LOCATION '$root'"))
    assert(ddl.contains("'graft.constraints.amt_pos' = 'amt > 0'"))
    assert(ddl.contains("'graft.constraints.h_ok' = 'h <> ''bad'''"),
      s"string literals must round-trip via '' doubling, got:\n$ddl")
    assert(ddl.contains("-- STATS (k)"))
    assert(ddl.contains("CREATE BLOOMFILTER INDEX ON sc_cow FOR COLUMNS (h)"))
    GraftTables.unregister("sc_cow")

    // registered but never created: a clean named error, not a raw IO crash
    val emptyRoot = Files.createTempDirectory("graft-showcreate-empty").toString
    GraftTables.registerCow("sc_empty", emptyRoot)
    val e = intercept[RuntimeException] { spark.sql("SHOW CREATE TABLE sc_empty") }
    assert(e.getMessage.contains("no published version"))
    GraftTables.unregister("sc_empty")

    // an unregistered name is NOT ours: Spark's own SHOW CREATE TABLE runs
    spark.sql("CREATE TABLE sc_passthrough AS SELECT 1 AS one")
    val pt = spark.sql("SHOW CREATE TABLE sc_passthrough").as[String].head()
    assert(pt.contains("sc_passthrough"))
    spark.sql("DROP TABLE sc_passthrough")
  }

  test("snapshot-level table DDL shows the snapshot layout") {
    val root = Files.createTempDirectory("graft-showcreate-snap").toString
    GraftTables.register("sc_snap", root)
    spark.range(1, 11).select(col("id").as("k"), lit("x").as("v"))
      .createOrReplaceTempView("sc_snap_src")
    spark.sql("CREATE TABLE sc_snap AS SELECT * FROM sc_snap_src")
    val ddl = spark.sql("SHOW CREATE TABLE sc_snap").as[String].head()
    assert(ddl.contains("USING graft"))
    assert(ddl.contains("k BIGINT") && ddl.contains("v STRING"))
    GraftTables.unregister("sc_snap")
  }
}
