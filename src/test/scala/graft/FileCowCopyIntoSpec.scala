package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.plans.GraftTables
import graft.sources.FileCow

/** COPY INTO — the idempotent landing-zone loader. Claims under test:
  * the first run loads every parquet file in the directory, a re-run is a
  * no-op (no version published), new landing files load incrementally
  * (only they are read), the ledger rides the commit log (commit record
  * carries the copied identities), a schema mismatch fails loudly, and
  * the SQL spelling drives the same commits.
  */
class FileCowCopyIntoSpec extends SparkSpec {

  private def land(dir: String, name: String, lo: Long, hi: Long): Unit = {
    val tmp = Files.createTempDirectory("land-tmp").toString
    spark.range(lo, hi).select(col("id").as("k"), (col("id") * 10).as("v"))
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).filter(p =>
      p.getFileName.toString.endsWith(".parquet")).findFirst().get()
    Files.createDirectories(Paths.get(dir))
    Files.move(part, Paths.get(dir, name))
  }

  test("loads once, skips on re-run, picks up only new landing files") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("cp-into").resolve("t").toString
    val landing = Files.createTempDirectory("cp-into-land").toString
    FileCow.create(spark, root,
      spark.range(0, 10).select(col("id").as("k"), (col("id") * 10).as("v"))
        .repartitionByRange(2, col("k")), Seq("k")) // v1

    land(landing, "a.parquet", 100, 110)
    land(landing, "b.parquet", 200, 210)
    val c1 = FileCow.copyInto(spark, root, landing) // v2: both files
    assert(c1.version == 2L)
    assert(FileCow.read(spark, root).count() == 30L)
    assert(FileCow.commitInfo(root, 2L).get.kind == "copy_into")
    assert(FileCow.commitInfo(root, 2L).get.copied.size == 2)

    // idempotent: nothing new -> no version published
    val c2 = FileCow.copyInto(spark, root, landing)
    assert(c2.version == 2L && FileCow.currentVersion(root) == 2L)

    // a third landing file arrives: only it loads
    land(landing, "c.parquet", 300, 305)
    val c3 = FileCow.copyInto(spark, root, landing) // v3
    assert(c3.version == 3L)
    assert(FileCow.read(spark, root).count() == 35L)
    assert(FileCow.commitInfo(root, 3L).get.copied.size == 1)
    assert(FileCow.read(spark, root).filter(col("k") >= 300).as[(Long, Long)]
      .collect().toSet == (300L until 305L).map(k => (k, k * 10)).toSet)

    // schema drift in the landing zone fails loudly
    val bad = Files.createTempDirectory("cp-into-bad").toString
    spark.range(0, 3).select(col("id").as("other")).coalesce(1)
      .write.mode("overwrite").parquet(bad)
    val e = intercept[IllegalArgumentException] {
      FileCow.copyInto(spark, root, bad)
    }
    assert(e.getMessage.contains("does not match table schema"))
  }

  test("SQL COPY INTO drives the same idempotent load") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("cp-sql").toString
    val landing = Files.createTempDirectory("cp-sql-land").toString
    GraftTables.registerCow("cp_t", root)
    spark.range(0, 5).select(col("id").as("k"), (col("id") * 10).as("v"))
      .createOrReplaceTempView("cp_base")
    spark.sql("CREATE TABLE cp_t AS SELECT * FROM cp_base") // v1

    land(landing, "x.parquet", 50, 55)
    spark.sql(s"COPY INTO cp_t FROM '$landing'") // v2
    spark.sql(s"COPY INTO cp_t FROM '$landing'") // no-op
    assert(FileCow.currentVersion(root) == 2L)
    assert(spark.sql("SELECT count(*) c FROM cp_t").as[Long].head() == 10L)
    val hist = spark.sql("DESCRIBE HISTORY cp_t")
      .filter(col("operation") === "copy_into")
    assert(hist.count() == 1L)
    GraftTables.unregister("cp_t")
  }
}
