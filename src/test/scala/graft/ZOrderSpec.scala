package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Sources

/** G12: Z-order clustering — the box-predicate read must be exact, and the
  * layout must deliver what motivates it: per-file bounds tight in BOTH
  * dimensions, so a secondary-dimension predicate prunes files where the
  * G9 single-key linear layout provably cannot.
  */
class ZOrderSpec extends SparkSpec {

  private val nFiles = 16

  private lazy val fact = Tables.orders(spark, sfDir)
    .select(col("o_orderkey"), col("o_custkey"),
      datediff(col("o_orderdate"), lit("1992-01-01")).as("od"))
    .localCheckpoint() // three layouts + expected-row checks read it

  // data-driven predicate bounds: quarter-boxes of each dimension's range
  private lazy val (odLo, odHi) = {
    val r = fact.agg(min(col("od")), max(col("od"))).head()
    (r.getInt(0), r.getInt(1))
  }
  private lazy val (ckLo, ckHi) = {
    val r = fact.agg(min(col("o_custkey")), max(col("o_custkey"))).head()
    (r.getLong(0), r.getLong(1))
  }

  test("G12 box read returns exactly the predicate's rows") {
    val out = Files.createTempDirectory("graft-zorder").toString
    Sources.writeFactZOrdered(fact, "o_custkey", "od", out, nFiles)
    val (aLo, aHi) = (ckLo, ckLo + (ckHi - ckLo) / 4)
    val (bLo, bHi) = (odLo, odLo + (odHi - odLo) / 4)
    val got = Sources.readFactZOrdered(spark, out, "o_custkey", "od",
      Some((aLo, aHi)), Some((bLo, bHi)))
    val want = fact.filter(col("o_custkey").between(aLo, aHi) && col("od").between(bLo, bHi))
    assert(got.count() == want.count())
    assert(got.select("o_orderkey").exceptAll(want.select("o_orderkey")).isEmpty)
    // and the box admitted a strict subset of the files
    val admitted = Sources.zoned2Files(spark, out, Some((aLo, aHi)), Some((bLo, bHi)))
    val all = Sources.zoned2Files(spark, out, None, None)
    assert(all.size == nFiles)
    assert(admitted.size < all.size, s"box admitted ${admitted.size}/${all.size}")
    // planner-integrated skipping (r8): the scan itself opens exactly the
    // admitted files — both dims' intervals travel as pushed dataFilters.
    import org.apache.spark.sql.execution.FileSourceScanExec
    val scan = got.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case s: FileSourceScanExec => s }.get
    val opened = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters).flatMap(_.files).length
    assert(opened == admitted.size,
      s"scan opened $opened files, manifest admits ${admitted.size}")
  }

  test("G12 empty input: write succeeds and the reader sees zero rows") {
    // min/max over zero rows are null — the writer must still honor the
    // contract (dataset + zonemap) so readFactZOrdered opens the path.
    val out = Files.createTempDirectory("graft-zorder-empty").toString
    Sources.writeFactZOrdered(fact.filter(lit(false)), "o_custkey", "od", out, nFiles)
    val got = Sources.readFactZOrdered(spark, out, "o_custkey", "od",
      Some((ckLo, ckHi)), Some((odLo, odHi)))
    assert(got.count() == 0L)
    assert(Sources.zoned2Files(spark, out, None, None).isEmpty)
  }

  test("morton16 equals a reference bit-interleave and preserves quadrant order") {
    val s = spark
    import s.implicits._
    def ref(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val pts = for (x <- Seq(0L, 1L, 2L, 255L, 32767L, 65535L);
                   y <- Seq(0L, 1L, 3L, 128L, 40000L, 65535L)) yield (x, y)
    val got = pts.toDF("x", "y")
      .withColumn("z", Sources.morton16(col("x"), col("y")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == ref(x, y), s"morton($x,$y)")
    }
    // quadrant locality: the top bits of z are the top bits of (y, x) —
    // every point of the low-left quadrant sorts before any of the
    // high-right quadrant (the property that makes file regions square)
    assert(ref(100, 200) < ref(33000, 40000))
    // bit 31 (y's top bit) dominates: any y >= 2^15 point sorts after
    // every y < 2^15 point regardless of x
    assert(ref(65535, 32767) < ref(0, 32768))
  }

  test("G12 prunes the secondary dimension where the linear layout cannot") {
    val zDir = Files.createTempDirectory("graft-zorder-z").toString
    val linDir = Files.createTempDirectory("graft-zorder-lin").toString
    Sources.writeFactZOrdered(fact, "o_custkey", "od", zDir, nFiles)
    // linear comparison layout: range-sorted by custkey only, same file
    // count, manifest carrying BOTH dims' bounds for a fair comparison
    fact.repartitionByRange(nFiles, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(linDir)
    spark.catalog.refreshByPath(linDir)
    spark.read.parquet(linDir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col("o_custkey")).as("amin"), max(col("o_custkey")).as("amax"),
        min(col("od")).as("bmin"), max(col("od")).as("bmax"),
        count(lit(1)).as("n_rows"))
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(linDir + "_zonemap2")

    // date-only predicate: first ~15% of the actual date range
    val (bLo, bHi) = (odLo, odLo + (odHi - odLo) * 15 / 100)
    val zAdmitted = Sources.zoned2Files(spark, zDir, None, Some((bLo, bHi)))
    val linAdmit = Sources.zoned2Files(spark, linDir, None, Some((bLo, bHi))).size
    assert(zAdmitted.nonEmpty, "predicate range must be live")
    // every custkey-sorted file spans ~the full date range -> no pruning
    assert(linAdmit == nFiles,
      s"linear layout unexpectedly pruned the secondary dim: $linAdmit/$nFiles")
    assert(zAdmitted.size < nFiles,
      s"z-order must prune on the secondary dim: ${zAdmitted.size}/$nFiles")
    // primary-dimension pruning survives interleaving (coarser, but real)
    val zA = Sources.zoned2Files(spark, zDir,
      Some((ckLo, ckLo + (ckHi - ckLo) * 15 / 100)), None).size
    assert(zA < nFiles, s"z-order lost primary-dim pruning entirely: $zA/$nFiles")
  }
}
