package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.FileCow

/** Column mapping (Delta id-mode analog on parquet field IDs). Claims:
  *
  *   1. RENAME on a created (column-mapped) multi-file table is a
  *      METADATA-ONLY commit: zero data files written or retired, the
  *      data-file set is bit-identical, reads under the new name return
  *      the old values, and stat columns keep pruning under the new name;
  *   2. old versions still time-travel under their own names;
  *   3. a DROPPED column's values can never RESURRECT through a later
  *      same-name ADD (fresh field id from the high-water mark);
  *   4. MERGE-style schema evolution keeps the table uniformly mapped;
  *   5. a CONVERTed table (foreign files, no ids) stays legacy: rename
  *      remains the honest full rewrite;
  *   6. the change feed and the table stream see the metadata-only rename
  *      as row-neutral.
  */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def dataFiles(root: String): Set[String] = {
    val dir = Paths.get(root, "_data")
    val list = Files.list(dir)
    try {
      val b = Set.newBuilder[String]
      list.iterator().forEachRemaining(p => b += p.getFileName.toString)
      b.result()
    } finally list.close()
  }

  private def mkMapped(): String = {
    val root = Files.createTempDirectory("cow-map").resolve("t").toString
    FileCow.create(spark, root,
      spark.range(1, 41).select(col("id").as("k"), (col("id") * 10).as("v"),
        concat(lit("p"), col("id")).as("payload"))
        .repartitionByRange(4, col("k")),
      statsCols = Seq("k", "v"))
    root
  }

  test("rename on a mapped multi-file table is metadata-only; reads follow") {
    val root = mkMapped() // v1, 4 files
    val before = dataFiles(root)
    assert(before.size >= 4)
    val c = FileCow.renameColumn(spark, root, "v", "amount") // v2
    assert(c.filesRewritten == 0L && c.filesAdded == 0L,
      s"mapped rename must touch no files, got $c")
    assert(dataFiles(root) == before, "the data-file set must be bit-identical")
    // old values under the new name, resolved BY FIELD ID from old footers
    val got = FileCow.read(spark, root).select("k", "amount")
      .as[(Long, Long)].collect().toMap
    assert(got(7L) == 70L && got(40L) == 400L && got.size == 40)
    // stat pruning follows the new name (manifest min_/max_ renamed)
    assert(FileCow.read(spark, root).filter(col("amount") === 100L)
      .select("payload").as[String].head() == "p10")
    // the old version time-travels under its own name
    val old = FileCow.readVersion(spark, root, 1L)
    assert(old.columns.contains("v") && !old.columns.contains("amount"))
    assert(old.filter(col("v") === 100L).select("k").as[Long].head() == 10L)
  }

  test("renamed tables keep supporting DML, and appends write the new name") {
    val root = mkMapped()                                    // v1
    FileCow.renameColumn(spark, root, "payload", "body")     // v2 metadata-only
    FileCow.append(spark, root,
      Seq((100L, 1000L, "n100")).toDF("k", "v", "body"))     // v3 new-name append
    FileCow.delete(spark, root, col("k") === 1L)             // v4
    val rows = FileCow.read(spark, root).select("k", "body")
      .as[(Long, String)].collect().toMap
    assert(!rows.contains(1L) && rows(100L) == "n100" && rows(5L) == "p5")
    // merge across the rename boundary: touched old-vintage files rewrite
    // under the new name, untouched ones keep serving by id
    FileCow.merge(spark, root,
      Seq((5L, 55L, "u5")).toDF("k", "v", "body"), keys = Seq("k"))
    assert(FileCow.read(spark, root).filter(col("k") === 5L)
      .select("body").as[String].head() == "u5")
  }

  test("a dropped column cannot resurrect through a same-name re-add") {
    val root = mkMapped()                                    // v1
    FileCow.dropColumns(spark, root, Seq("payload"))         // v2 metadata-only
    FileCow.addColumns(spark, root, Seq(
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.StringType, nullable = true))) // v3 fresh id
    val vals = FileCow.read(spark, root).select("payload")
      .as[Option[String]].collect()
    assert(vals.length == 40 && vals.forall(_.isEmpty),
      "re-added column must read NULL everywhere — old values must not resurrect")
    // and writes under the re-added name land (and read back) normally
    FileCow.append(spark, root, Seq((200L, 2000L, "fresh")).toDF("k", "v", "payload"))
    assert(FileCow.read(spark, root).filter(col("k") === 200L)
      .select("payload").as[String].head() == "fresh")
  }

  test("schema evolution keeps the table uniformly mapped with fresh ids") {
    val root = mkMapped()                                    // v1
    val current = FileCow.schemaOf(root, FileCow.currentVersion(root))
    val evolved = org.apache.spark.sql.types.StructType(current.fields ++ Seq(
      org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.LongType, nullable = true)))
    FileCow.merge(spark, root,
      Seq((1L, 11L, "e1", 7L)).toDF("k", "v", "payload", "extra"),
      keys = Seq("k"), evolveTo = Some(evolved))
    val schema = FileCow.schemaOf(root, FileCow.currentVersion(root))
    assert(FileCow.isColumnMapped(schema),
      "evolution must stamp fresh ids on the widened fields")
    val ids = schema.fields.map(_.metadata.getLong(FileCow.FieldIdKey))
    assert(ids.distinct.length == ids.length, s"duplicate field ids: ${ids.toSeq}")
    val got = FileCow.read(spark, root).select("k", "extra")
      .as[(Long, Option[Long])].collect().toMap
    assert(got(1L).contains(7L) && got(2L).isEmpty)
  }

  test("a converted table stays legacy: rename remains a full rewrite") {
    val src = Files.createTempDirectory("cow-map-src").toString
    spark.range(1, 21).select(col("id").as("k"), (col("id") * 2).as("w"))
      .repartition(2).write.mode("overwrite").parquet(src)
    val root = Files.createTempDirectory("cow-map-cv").resolve("t").toString
    FileCow.convert(spark, root, src, statsCols = Seq("k"))
    assert(!FileCow.isColumnMapped(FileCow.schemaOf(root, 1L)),
      "adopted foreign files carry no ids — the table must stay name-mapped")
    val c = FileCow.renameColumn(spark, root, "w", "w2")
    assert(c.filesRewritten > 0L && c.filesAdded > 0L,
      s"legacy rename must rewrite, got $c")
    assert(FileCow.read(spark, root).filter(col("k") === 3L)
      .select("w2").as[Long].head() == 6L)
  }

  test("the change feed and table stream treat a mapped rename as row-neutral") {
    val root = mkMapped()                                    // v1
    FileCow.renameColumn(spark, root, "v", "amount")         // v2
    assert(FileCow.changesBetween(spark, root, Seq("k"), 1L, 2L).isEmpty,
      "a metadata-only rename must feed no rows")
    val info = FileCow.commitInfo(root, 2L).get
    assert(info.kind == "rename_column" && info.added.isEmpty && info.removed.isEmpty)
  }
}
