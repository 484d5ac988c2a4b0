package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.plans.GraftTables
import graft.sources.FileCow

/** The FULL Delta-style MERGE clause surface: conditional WHEN MATCHED
  * clauses with explicit assignments, MATCHED DELETE, first-match-wins
  * ordering, conditional NOT MATCHED INSERT with explicit column lists
  * (missing columns null), sources whose schema differs from the table,
  * ambiguity rejection, and the same clauses on the snapshot layout and
  * under NOT MATCHED BY SOURCE DELETE. The star pair keeps its
  * touched-file fast path (pinned by GraftCowSqlSpec); this spec pins the
  * general path.
  */
class GraftMergeClausesSpec extends SparkSpec {

  private def freshCow(name: String): String = {
    val root = Files.createTempDirectory(s"mc-$name").toString
    GraftTables.registerCow(name, root)
    root
  }

  private def fileSet(root: String, v: Long): Set[String] =
    FileCow.manifest(spark, root, v).select("file").collect().map(_.getString(0)).toSet

  test("conditional UPDATE assignments, MATCHED DELETE, first-match-wins, file scoping") {
    val s = spark
    import s.implicits._
    val root = freshCow("mc_t")
    spark.range(1, 1001).select(col("id").as("k"),
        (col("id") % 100).as("qty"), lit("keep").as("status"))
      .repartitionByRange(8, col("k"))
      .createOrReplaceTempView("mc_base")
    spark.sql("MERGE INTO mc_t t USING mc_base s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *") // v1

    // source: a DIFFERENT schema than the table (no status, extra flag)
    Seq((5L, 0L, "zero"), (6L, 7L, "bump"), (7L, 3L, "drop"))
      .toDF("k", "newqty", "flag").createOrReplaceTempView("mc_inc")
    spark.sql("""MERGE INTO mc_t t USING mc_inc s ON t.k = s.k
      WHEN MATCHED AND s.flag = 'drop' THEN DELETE
      WHEN MATCHED AND s.newqty = 0 THEN UPDATE SET status = 'zeroed'
      WHEN MATCHED THEN UPDATE SET qty = s.newqty + t.qty, status = s.flag""") // v2

    val got = spark.sql("SELECT k, qty, status FROM mc_t WHERE k IN (5, 6, 7, 8)")
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set(
      (5L, 5L, "zeroed"),        // second clause: qty untouched, status set
      (6L, 13L, "bump"),         // third clause: 7 + 6, status from source
      (8L, 8L, "keep")))         // untouched row; k=7 deleted
    assert(spark.sql("SELECT count(*) c FROM mc_t").as[Long].head() == 999L)
    // touched-file scoping survives the general path: 3 keys hit 1 of 8 files
    assert((fileSet(root, 1L) intersect fileSet(root, 2L)).size == 7)
    GraftTables.unregister("mc_t")
  }

  test("conditional INSERT with explicit columns pads nulls and drops unclaimed rows") {
    val s = spark
    import s.implicits._
    freshCow("mc_i")
    // status NULLABLE: only a nullable column can be pad-inserted
    spark.range(1, 11).select(col("id").as("k"), col("id").as("qty"),
        when(col("id") > 0, lit("base")).as("status"))
      .createOrReplaceTempView("mci_base")
    spark.sql("MERGE INTO mc_i t USING mci_base s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *") // v1

    Seq((100L, 1L), (200L, -1L), (5L, 9L)).toDF("k", "sig")
      .createOrReplaceTempView("mci_inc")
    // only positive-sig rows insert; k=5 matches and updates; k=200 dropped
    spark.sql("""MERGE INTO mc_i t USING mci_inc s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET qty = s.sig
      WHEN NOT MATCHED AND s.sig > 0 THEN INSERT (k, qty) VALUES (s.k, s.sig)""")

    val got = spark.sql("SELECT k, qty, status FROM mc_i WHERE k IN (5, 100, 200)")
      .as[(Long, Long, Option[String])].collect().toSet
    assert(got == Set((5L, 9L, Some("base")), (100L, 1L, None)),
      "k=100 inserted with status NULL; k=200 unclaimed, dropped")

    // omitting a NOT NULL column (qty, from the non-null base frame) fails
    val nn = intercept[Exception] {
      spark.sql("MERGE INTO mc_i t USING mci_inc s ON t.k = s.k " +
        "WHEN NOT MATCHED THEN INSERT (k) VALUES (s.k)")
    }
    assert(nn.getMessage.contains("NOT NULL"))
    GraftTables.unregister("mc_i")
  }

  test("ambiguous bare columns fail loudly; snapshot layout runs the same clauses") {
    val s = spark
    import s.implicits._
    val vroot = Files.createTempDirectory("mc-v").toString
    GraftTables.register("mc_v", vroot) // snapshot layout
    spark.range(1, 6).select(col("id").as("k"), col("id").as("qty"))
      .createOrReplaceTempView("mcv_base")
    spark.sql("MERGE INTO mc_v t USING mcv_base s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")

    Seq((2L, 10L), (9L, 9L)).toDF("k", "qty").createOrReplaceTempView("mcv_inc")
    // bare `qty` exists on both sides of the join → must demand a qualifier
    val e = intercept[Exception] {
      spark.sql("MERGE INTO mc_v t USING mcv_inc s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET qty = qty + 1")
    }
    assert(e.getMessage.contains("ambiguous"))

    spark.sql("""MERGE INTO mc_v t USING mcv_inc s ON t.k = s.k
      WHEN MATCHED AND t.qty < 100 THEN UPDATE SET qty = s.qty + t.qty
      WHEN NOT MATCHED THEN INSERT (k, qty) VALUES (s.k, s.qty)""")
    val got = spark.sql("SELECT k, qty FROM mc_v").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L), (2L, 12L), (3L, 3L), (4L, 4L), (5L, 5L), (9L, 9L)))
    GraftTables.unregister("mc_v")
  }

  test("NOT MATCHED BY SOURCE UPDATE/conditional DELETE mark and prune stale targets") {
    val s = spark
    import s.implicits._
    freshCow("mc_b")
    spark.range(1, 11).select(col("id").as("k"), col("id").as("qty"),
        when(col("id") > 0, lit("live")).as("status"))
      .createOrReplaceTempView("mcb_base")
    spark.sql("MERGE INTO mc_b t USING mcb_base s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")

    Seq((1L, 100L), (2L, 200L)).toDF("k", "v").createOrReplaceTempView("mcb_inc")
    // targets absent from the source: qty ≥ 9 deleted, the rest marked stale
    spark.sql("""MERGE INTO mc_b t USING mcb_inc s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET qty = s.v
      WHEN NOT MATCHED BY SOURCE AND t.qty >= 9 THEN DELETE
      WHEN NOT MATCHED BY SOURCE THEN UPDATE SET status = 'stale'""")
    val got = spark.sql("SELECT k, qty, status FROM mc_b")
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 100L, "live"), (2L, 200L, "live")) ++
      (3L to 8L).map(k => (k, k, "stale")).toSet,
      "matched updated and kept live; 9,10 deleted; 3-8 marked stale")

    // a by-source clause referencing the source must fail loudly
    val e = intercept[Exception] {
      spark.sql("MERGE INTO mc_b t USING mcb_inc s ON t.k = s.k " +
        "WHEN NOT MATCHED BY SOURCE AND s.v > 0 THEN DELETE")
    }
    assert(e.getMessage.contains("unknown column"))
    GraftTables.unregister("mc_b")
  }

  test("MERGE WITH SCHEMA EVOLUTION: source-only columns evolve the table") {
    val s = spark
    import s.implicits._
    val root = freshCow("mc_ev")
    spark.range(1, 6).select(col("id").as("k"), col("id").as("qty"))
      .createOrReplaceTempView("mcev_base")
    spark.sql("MERGE INTO mc_ev t USING mcev_base s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *") // v1

    Seq((2L, 20L, "hot"), (9L, 90L, "new")).toDF("k", "qty", "tag")
      .createOrReplaceTempView("mcev_inc")
    // without evolution, the extra source column is a loud error
    val e = intercept[Exception] {
      spark.sql("MERGE INTO mc_ev t USING mcev_inc s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    }
    assert(e.getMessage.contains("must match table columns"))

    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO mc_ev t USING mcev_inc s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""")
    assert(FileCow.schemaOf(root, FileCow.currentVersion(root))
      .fieldNames.toSeq == Seq("k", "qty", "tag"))
    val got = spark.sql("SELECT k, qty, tag FROM mc_ev")
      .as[(Long, Long, Option[String])].collect().toSet
    assert(got == Set((1L, 1L, None), (2L, 20L, Some("hot")), (3L, 3L, None),
      (4L, 4L, None), (5L, 5L, None), (9L, 90L, Some("new"))),
      "matched row takes the new column, untouched rows read NULL, insert carries it")
    GraftTables.unregister("mc_ev")
  }

  test("general clauses + NOT MATCHED BY SOURCE DELETE: full-rewrite semantics") {
    val s = spark
    import s.implicits._
    freshCow("mc_d")
    spark.range(1, 11).select(col("id").as("k"), col("id").as("qty"))
      .createOrReplaceTempView("mcd_base")
    spark.sql("MERGE INTO mc_d t USING mcd_base s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")

    Seq((3L, 300L), (20L, 200L)).toDF("k", "v").createOrReplaceTempView("mcd_inc")
    spark.sql("""MERGE INTO mc_d t USING mcd_inc s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET qty = s.v
      WHEN NOT MATCHED THEN INSERT (k, qty) VALUES (s.k, s.v)
      WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    val got = spark.sql("SELECT k, qty FROM mc_d").as[(Long, Long)].collect().toSet
    assert(got == Set((3L, 300L), (20L, 200L)),
      "matched updated, unmatched source inserted, unmatched targets deleted")
    GraftTables.unregister("mc_d")
  }
}
