package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.plans.GraftTables
import graft.sources.FileCow

/** Zero-copy SHALLOW CLONE. Claims under test: cloning copies no bytes
  * (the clone's `_data` stays empty; its manifest names the source's
  * files), the clone and source then diverge independently with touched
  * files rewritten into the clone's own dir, source-side vacuum keeps any
  * file a live clone still references (the Delta hazard this design
  * closes) while still reclaiming files nobody references, a dropped
  * clone's marker is pruned and its files reclaimed, and the SQL spelling
  * (`CREATE TABLE t SHALLOW CLONE s [VERSION AS OF n]`) lands the same
  * commit through the extension stack.
  */
class FileCowCloneSpec extends SparkSpec {

  private def mkSource(): String = {
    val root = Files.createTempDirectory("clone-src").resolve("t").toString
    val base = spark.range(1, 101).select(col("id"), (col("id") % 5).as("grp"))
    FileCow.create(spark, root, base.repartitionByRange(4, col("id")), Seq("id"))
    root
  }

  private def deleteTree(p: java.nio.file.Path): Unit = {
    val walk = Files.walk(p)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(f => Files.delete(f))
    finally walk.close()
  }

  private def fileSet(root: String, v: Long): Set[String] =
    FileCow.manifest(spark, root, v).select("file").collect().map(_.getString(0)).toSet

  private def dataFiles(root: String): Set[String] = {
    val d = Paths.get(root, "_data")
    if (!Files.exists(d)) Set.empty
    else {
      val l = Files.list(d)
      try {
        val b = Set.newBuilder[String]
        l.iterator().forEachRemaining(p => b += p.toString)
        b.result()
      } finally l.close()
    }
  }

  test("clone copies no bytes; clone and source diverge independently") {
    val src = mkSource() // v1: 4 files
    FileCow.delete(spark, src, col("id") > 90) // v2
    val tgt = Files.createTempDirectory("clone-tgt").resolve("c").toString

    FileCow.shallowClone(spark, src, tgt) // clone of v2
    assert(dataFiles(tgt).isEmpty, "a shallow clone writes no data files")
    assert(fileSet(tgt, 1L) == fileSet(src, 2L), "the manifest IS the copy")
    assert(FileCow.read(spark, tgt).count() == 90L)

    // the clone diverges: its delete rewrites touched files into ITS dir
    FileCow.delete(spark, tgt, col("id") <= 10) // clone v2
    assert(FileCow.read(spark, tgt).count() == 80L)
    assert(FileCow.read(spark, src).count() == 90L, "source unchanged")
    val cloneOwn = fileSet(tgt, 2L).filter(_.startsWith(tgt))
    assert(cloneOwn.nonEmpty, "rewritten files live under the clone's root")
    assert((fileSet(tgt, 2L) intersect fileSet(src, 2L)).nonEmpty,
      "untouched files stay shared with the source")

    // the source diverges the other way without touching the clone
    FileCow.append(spark, src,
      spark.range(200, 211).select(col("id"), lit(9L).as("grp"))) // src v3
    assert(FileCow.read(spark, tgt).count() == 80L)

    // clone-at-version: a second clone pinned to the source's v1
    val tgt2 = Files.createTempDirectory("clone-tgt2").resolve("c2").toString
    FileCow.shallowClone(spark, src, tgt2, versionAsOf = Some(1L))
    assert(FileCow.read(spark, tgt2).count() == 100L)
  }

  test("source vacuum keeps clone-referenced files, reclaims the rest, prunes dead clones") {
    val src = mkSource() // v1: 4 files, all rows
    val tgt = Files.createTempDirectory("clone-tgt3").resolve("c").toString
    FileCow.shallowClone(spark, src, tgt) // references all v1 files

    FileCow.append(spark, src,
      spark.range(300, 311).select(col("id"), lit(9L).as("grp"))) // v2: +1 file
    val appended = (fileSet(src, 2L) -- fileSet(src, 1L))
    FileCow.overwrite(spark, src,
      spark.range(1, 3).select(col("id"), lit(0L).as("grp"))) // v3: drops all

    // keep=1 retains only v3; v1 files survive via the clone, v2's don't
    val removed = FileCow.vacuum(spark, src, keep = 1, minAgeMs = 0L).toSet
    assert(removed == appended,
      s"vacuum must reclaim exactly the unshared appended file, got $removed")
    assert(FileCow.read(spark, tgt).count() == 100L, "clone still reads after source vacuum")

    // the clone dies; the next source vacuum prunes its marker and reclaims
    deleteTree(Paths.get(tgt).getParent)
    val removed2 = FileCow.vacuum(spark, src, keep = 1, minAgeMs = 0L)
    assert(removed2.size == 4, "dead clone's referenced files reclaimed")
    assert(!Files.list(Paths.get(src, "_clones")).iterator().hasNext,
      "dead clone marker pruned")
  }

  test("clone of a clone registers with the transitive owner; vacuum respects it") {
    val a = mkSource() // table A, v1: 4 files in A/_data
    val b = Files.createTempDirectory("clone-b").resolve("b").toString
    FileCow.shallowClone(spark, a, b) // B's manifest names A's files
    val c = Files.createTempDirectory("clone-c").resolve("c").toString
    FileCow.shallowClone(spark, b, c) // C also names A's files — owner is A

    // B dies; only C still needs A's originals
    deleteTree(Paths.get(b).getParent)
    // A drops every original from its own retained manifests
    FileCow.overwrite(spark, a,
      spark.range(0, 2).select(col("id"), lit(0L).as("grp")))
    val removed = FileCow.vacuum(spark, a, keep = 1, minAgeMs = 0L)
    assert(removed.isEmpty,
      s"C still references A's originals transitively — nothing to reclaim, got $removed")
    assert(FileCow.read(spark, c).count() == 100L, "the grandchild still reads")

    // C dies too: the originals finally reclaim
    deleteTree(Paths.get(c).getParent)
    assert(FileCow.vacuum(spark, a, keep = 1, minAgeMs = 0L).size == 4)
  }

  test("SQL: CREATE TABLE t SHALLOW CLONE s VERSION AS OF n, then diverge via INSERT") {
    val s = spark
    import s.implicits._
    val srcRoot = Files.createTempDirectory("clone-sql-src").toString
    val tgtRoot = Files.createTempDirectory("clone-sql-tgt").toString
    GraftTables.registerCow("clone_src", srcRoot)
    GraftTables.registerCow("clone_tgt", tgtRoot)

    spark.range(1, 51).select(col("id").as("k"), (col("id") * 2).as("v"))
      .createOrReplaceTempView("clone_base")
    spark.sql("CREATE TABLE clone_src AS SELECT * FROM clone_base") // v1
    spark.sql("DELETE FROM clone_src WHERE k > 40") // v2

    spark.sql("CREATE TABLE clone_tgt SHALLOW CLONE clone_src VERSION AS OF 1")
    assert(spark.sql("SELECT count(*) c FROM clone_tgt").as[Long].head() == 50L,
      "VERSION AS OF 1 clones the pre-delete snapshot")
    assert(dataFiles(tgtRoot).isEmpty)
    val hist = spark.sql("DESCRIBE HISTORY clone_tgt")
      .select("operation").as[String].collect().toSeq
    assert(hist == Seq("clone"))

    spark.sql("INSERT INTO clone_tgt VALUES (1000, 0)")
    assert(spark.sql("SELECT count(*) c FROM clone_tgt").as[Long].head() == 51L)
    assert(spark.sql("SELECT count(*) c FROM clone_src").as[Long].head() == 40L,
      "the source does not see the clone's insert")

    // a second CREATE ... CLONE on the same target must refuse
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE clone_tgt SHALLOW CLONE clone_src")
    }
    assert(e.getMessage.contains("already exists"))
  }
}
