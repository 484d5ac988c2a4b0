package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.plans.GraftTables
import graft.sources.FileCow

/** CHECK constraints + table properties on cow tables (the Delta
  * `ADD CONSTRAINT … CHECK` surface). Claims under test: a constraint
  * admits no standing violation when added, every data-writing commit
  * enforces it on the rows it writes (folded into the stats scan, abort
  * before the CAS — the table provably never holds bad rows), NULL passes
  * (SQL CHECK semantics), properties carry forward across unrelated
  * commits and survive a shallow clone, DROP CONSTRAINT lifts the gate,
  * dropping a constrained column is refused, and the SQL spellings
  * (ADD/DROP CONSTRAINT, SET/UNSET/SHOW TBLPROPERTIES) drive the same
  * commits through the extension stack.
  */
class FileCowConstraintSpec extends SparkSpec {

  private def mkTable(): String = {
    val root = Files.createTempDirectory("cow-chk").resolve("t").toString
    val base = spark.range(1, 101).select(col("id"),
      when(col("id") % 10 =!= 0, col("id") * 2).as("amt"))
    FileCow.create(spark, root, base.repartitionByRange(4, col("id")), Seq("id"))
    root
  }

  test("constraints validate standing rows, gate every write, and NULL passes") {
    val root = mkTable() // amt is NULL every 10th row, else 2*id
    // a standing violation blocks the ADD
    val e = intercept[IllegalArgumentException] {
      FileCow.addConstraint(spark, root, "amt_big", "amt > 100")
    }
    assert(e.getMessage.contains("existing row(s) violate"))
    assert(FileCow.constraintsOf(root, FileCow.currentVersion(root)).isEmpty)

    // NULL amt passes (SQL CHECK), so amt > 0 admits the table
    FileCow.addConstraint(spark, root, "amt_pos", "amt > 0") // v2
    assert(FileCow.commitInfo(root, 2L).get.kind == "add_constraint")

    // a violating append aborts BEFORE the CAS: no version, no rows, no files
    val before = FileCow.currentVersion(root)
    val bad = spark.range(500, 503).select(col("id"), lit(-1L).as("amt"))
    val v = intercept[RuntimeException] { FileCow.append(spark, root, bad) }
    assert(v.getMessage.contains("amt_pos") && v.getMessage.contains("3 row(s)"))
    assert(FileCow.currentVersion(root) == before)
    assert(FileCow.read(spark, root).count() == 100L)

    // a violating MERGE aborts too (enforcement sits under every DML)
    val m = intercept[RuntimeException] {
      FileCow.merge(spark, root, spark.range(5, 7).select(col("id"),
        lit(-9L).as("amt")), Seq("id"))
    }
    assert(m.getMessage.contains("amt_pos"))

    // conforming writes pass; NULLs pass
    FileCow.append(spark, root, spark.range(500, 503).select(col("id"),
      when(col("id") === 501L, lit(null).cast("bigint")).otherwise(lit(7L)).as("amt")))
    assert(FileCow.read(spark, root).count() == 103L)

    // dropping the constrained column is refused; DROP CONSTRAINT lifts it
    val d = intercept[IllegalArgumentException] {
      FileCow.dropColumns(spark, root, Seq("amt"))
    }
    assert(d.getMessage.contains("amt_pos"))
    FileCow.dropConstraint(spark, root, "amt_pos")
    FileCow.append(spark, root, bad) // now admitted
    assert(FileCow.read(spark, root).filter(col("amt") < 0).count() == 3L)
  }

  test("streaming appends hit the same constraint gate as batch commits") {
    val root = mkTable()
    FileCow.addConstraint(spark, root, "amt_pos", "amt > 0")
    val bad = spark.range(900, 903).select(col("id"), lit(-5L).as("amt"))
    val before = FileCow.currentVersion(root)
    val e = intercept[RuntimeException] {
      graft.streaming.CowAppendSink.commitBatch(bad, root, "chk-app",
        batchId = 0L, statsCols = Seq("id"))
    }
    assert(e.getMessage.contains("amt_pos"))
    assert(FileCow.currentVersion(root) == before, "the batch never committed")
    // a conforming batch then lands normally with the same batch id
    graft.streaming.CowAppendSink.commitBatch(
      spark.range(900, 903).select(col("id"), lit(5L).as("amt")),
      root, "chk-app", batchId = 0L, statsCols = Seq("id"))
    assert(FileCow.read(spark, root).count() == 103L)
  }

  test("properties carry forward across commits and into shallow clones") {
    val root = mkTable()
    FileCow.setTableProperties(spark, root, Map("owner" -> "graft", "tier" -> "gold"))
    FileCow.delete(spark, root, col("id") > 95) // unrelated commit
    FileCow.compact(spark, root, targetFiles = 2) // another
    val v = FileCow.currentVersion(root)
    // column mapping adds its internal high-water mark at create (round 10)
    def user(m: Map[String, String]) = m - FileCow.MaxColIdProp
    assert(FileCow.tableProps(root, v)(FileCow.MaxColIdProp) == "2")
    assert(user(FileCow.tableProps(root, v)) == Map("owner" -> "graft", "tier" -> "gold"))

    val tgt = Files.createTempDirectory("cow-chk-clone").resolve("c").toString
    FileCow.shallowClone(spark, root, tgt)
    assert(user(FileCow.tableProps(tgt, 1L)) == Map("owner" -> "graft", "tier" -> "gold"))

    FileCow.unsetTableProperties(spark, root, Seq("tier"))
    assert(user(FileCow.tableProps(root, v + 1)) == Map("owner" -> "graft"))
    // time travel sees the old property set
    assert(FileCow.tableProps(root, v)("tier") == "gold")
  }

  test("RENAME COLUMN tracks stats names and respects constraints") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("cow-ren").toString
    GraftTables.registerCow("ren_t", root)
    spark.range(1, 41).select(col("id").as("k"), (col("id") * 2).as("amount"))
      .createOrReplaceTempView("ren_base")
    spark.sql("CREATE TABLE ren_t AS SELECT * FROM ren_base") // v1

    spark.sql("ALTER TABLE ren_t ADD CONSTRAINT amt_pos CHECK (amount > 0)") // v2
    val guard = intercept[Exception] {
      spark.sql("ALTER TABLE ren_t RENAME COLUMN amount TO amt")
    }
    assert(guard.getMessage.contains("amt_pos"))
    spark.sql("ALTER TABLE ren_t DROP CONSTRAINT amt_pos") // v3

    spark.sql("ALTER TABLE ren_t RENAME COLUMN amount TO amt") // v4: metadata-only (column mapping)
    assert(FileCow.commitInfo(root, 4L).get.kind == "rename_column")
    assert(FileCow.schemaOf(root, 4L).fieldNames.toSeq == Seq("k", "amt"))
    assert(spark.sql("SELECT sum(amt) s FROM ren_t").as[Long].head() ==
      (1L until 41L).map(_ * 2).sum)
    // pre-rename versions still time-travel under the old name
    assert(spark.sql("SELECT sum(amount) s FROM ren_t VERSION AS OF 1")
      .as[Long].head() == (1L until 41L).map(_ * 2).sum)
    // a renamed STATS column keeps pruning: manifest tracks the new name
    val manCols = FileCow.manifest(spark, root, 4L).columns.toSet
    assert(!manCols.contains("min_amount"))
    GraftTables.unregister("ren_t")
  }

  test("SQL: ADD/DROP CONSTRAINT and SET/UNSET/SHOW TBLPROPERTIES") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("cow-chk-sql").toString
    GraftTables.registerCow("chk_t", root)
    spark.range(1, 21).select(col("id").as("k"), (col("id") * 3).as("v"))
      .createOrReplaceTempView("chk_base")
    spark.sql("CREATE TABLE chk_t AS SELECT * FROM chk_base")

    spark.sql("ALTER TABLE chk_t ADD CONSTRAINT v_pos CHECK (v > 0)")
    val bad = intercept[Exception] {
      spark.sql("INSERT INTO chk_t VALUES (999, -1)")
    }
    assert(bad.getMessage.contains("v_pos"))
    assert(spark.sql("SELECT count(*) c FROM chk_t").as[Long].head() == 20L)
    spark.sql("INSERT INTO chk_t VALUES (999, 1)") // conforming

    spark.sql("ALTER TABLE chk_t SET TBLPROPERTIES ('owner' = 'graft')")
    val props = spark.sql("SHOW TBLPROPERTIES chk_t")
      .as[(String, String)].collect().toMap
    assert(props("owner") == "graft")
    assert(props("graft.constraints.v_pos") == "v > 0")

    spark.sql("ALTER TABLE chk_t DROP CONSTRAINT v_pos")
    spark.sql("INSERT INTO chk_t VALUES (1000, -5)") // gate lifted
    spark.sql("ALTER TABLE chk_t UNSET TBLPROPERTIES ('owner')")
    val props2 = spark.sql("SHOW TBLPROPERTIES chk_t")
      .as[(String, String)].collect().toMap
    // only the column-mapping high-water mark remains (internal, shown like
    // Delta's delta.columnMapping.maxColumnId)
    assert(props2 == Map(FileCow.MaxColIdProp -> "2"), s"got $props2")
    GraftTables.unregister("chk_t")
  }
}
