package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.sources.FileCow

/** Per-file BLOOM skipping on cow tables (Delta's bloom-filter index
  * analog): equality/IN probes on a bloom-indexed column skip files whose
  * sketch excludes the value — the pruning story for HIGH-CARDINALITY
  * SCATTERED keys whose [min, max] ranges overlap every file, where range
  * stats admit everything. The spec pins: lookups open ~1 file with the
  * index and all 8 without it (same data, same layout — the sketch is
  * what prunes); results stay bit-equal to the full filter; the index
  * rides through append/delete rewrites with no caller plumbing; range
  * predicates keep their stats pruning untouched.
  */
class CowBloomSkipSpec extends SparkSpec {
  import spark.implicits._

  private def opened(df: DataFrame): Int = {
    val scan = df.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case s: FileSourceScanExec => s }.get
    scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
      .flatMap(_.files).length
  }

  /** k is the range-layout key (contiguous per file); u and s are
    * hash-scattered, so every file's [min_u, max_u] spans the full domain
    * and range stats can never prune a point lookup on them. */
  private def scattered(from: Long, until: Long): DataFrame =
    spark.range(from, until).select(
      col("id").as("k"),
      ((col("id") * 2654435761L) % 1000003L).as("u"),
      md5(concat(lit("d"), col("id"))).as("s"))

  private def uOf(id: Long): Long = (id * 2654435761L) % 1000003L

  test("point lookup on a scattered key: 1 file with the bloom index, all 8 without") {
    val withB = Files.createTempDirectory("graft-bloom-a").toString
    val without = Files.createTempDirectory("graft-bloom-b").toString
    val df = scattered(0, 1000).repartitionByRange(8, col("k"))
    FileCow.create(spark, withB, df, statsCols = Seq("k", "u"),
      bloomCols = Seq("u", "s"))
    FileCow.create(spark, without, df, statsCols = Seq("k", "u"))

    val probe = uOf(7L)
    val qB = FileCow.read(spark, withB).filter(col("u") === probe)
    val qN = FileCow.read(spark, without).filter(col("u") === probe)
    assert(qB.select("k").as[Long].collect().toSeq == Seq(7L))
    assert(qN.select("k").as[Long].collect().toSeq == Seq(7L))
    assert(opened(qB) == 1,
      s"bloom index must skip to the 1 owning file, opened ${opened(qB)}")
    assert(opened(qN) >= 6,
      s"without the index, overlapping [min, max] admit nearly every file " +
      s"(got ${opened(qN)} of 8)")

    // IN over the string bloom: union of probes, ≤ one file per value
    val qIn = FileCow.read(spark, withB)
      .filter(col("s").isin(md5Of("d3"), md5Of("d500")))
    assert(qIn.select("k").as[Long].collect().toSet == Set(3L, 500L))
    assert(opened(qIn) <= 2, s"IN probes admit per-value files, got ${opened(qIn)}")

    // range predicates keep their ordinary stats pruning
    val qRange = FileCow.read(spark, withB).filter(col("k").between(0, 100))
    assert(opened(qRange) == 1)
  }

  test("the index rides through appends and rewrites with no plumbing") {
    val root = Files.createTempDirectory("graft-bloom-dml").toString
    FileCow.create(spark, root,
      scattered(0, 1000).repartitionByRange(8, col("k")),
      statsCols = Seq("k", "u"), bloomCols = Seq("u"))
    FileCow.append(spark, root, scattered(2000, 2100)) // derives bloom_u itself
    FileCow.delete(spark, root, col("k") === 13L)      // rewrite keeps the index

    // the manifest stays SLIM — sketches live in the sidecar store
    val man = FileCow.manifest(spark, root, FileCow.currentVersion(root))
    assert(!man.columns.exists(_.startsWith("bloom_")),
      "sketch bytes must never ride the manifest")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(root, "_bloom")))

    val qNew = FileCow.read(spark, root).filter(col("u") === uOf(2050L))
    assert(qNew.select("k").as[Long].collect().toSeq == Seq(2050L))
    assert(opened(qNew) == 1, s"appended value: 1 file, got ${opened(qNew)}")
    assert(FileCow.read(spark, root).filter(col("u") === uOf(13L)).isEmpty,
      "deleted row stays deleted through the rewritten file's fresh sketch")
  }

  test("merge on a scattered key rewrites only the files that actually hold a batch key") {
    val withB = Files.createTempDirectory("graft-bloom-mrg").toString
    val without = Files.createTempDirectory("graft-bloom-mrg2").toString
    // u is the MERGE key and it is scattered; files are laid out on k, so
    // every file's [min_u, max_u] spans the domain and stats admission
    // alone must rewrite nearly everything for any batch
    val df = scattered(0, 1000).repartitionByRange(8, col("k"))
      .select("u", "k", "s") // u leads: merge prunes on it
    FileCow.create(spark, withB, df, statsCols = Seq("u"), bloomCols = Seq("u"))
    FileCow.create(spark, without, df, statsCols = Seq("u"))

    // a 3-row streaming-shaped batch: updates u-keys of ids 10, 11, 12 —
    // all living in ONE k-range file
    val batch = scattered(10, 13).select(col("u"), col("k"), lit("upd").as("s"))
    val cB = FileCow.merge(spark, withB, batch, keys = Seq("u"))
    val cN = FileCow.merge(spark, without, batch, keys = Seq("u"))
    assert(cB.filesRewritten <= 2,
      s"bloom-pruned merge touches only holder files, rewrote ${cB.filesRewritten}")
    assert(cB.filesRewritten < cN.filesRewritten,
      s"stats-only merge over-rewrites (${cN.filesRewritten}) vs bloom (${cB.filesRewritten})")
    // both tables end bit-identical
    val a = FileCow.read(spark, withB).collect().map(_.toSeq).toSet
    val b = FileCow.read(spark, without).collect().map(_.toSeq).toSet
    assert(a == b)
    assert(FileCow.read(spark, withB).filter(col("s") === "upd").count() == 3L)
    assert(FileCow.read(spark, withB).count() == 1000L)
  }

  test("sketch sizing follows graft.bloom.items/bits properties; resized sketches stay correct") {
    val root = Files.createTempDirectory("graft-bloom-size").toString
    FileCow.create(spark, root,
      scattered(0, 1000).repartitionByRange(4, col("k")),
      statsCols = Seq("k", "u"), bloomCols = Seq("u"))
    def sliceSizes: Seq[Long] = {
      val d = java.nio.file.Paths.get(root, "_bloom")
      val l = java.nio.file.Files.list(d)
      try {
        import scala.jdk.CollectionConverters._
        l.iterator().asScala.filter(_.getFileName.toString.startsWith("s-"))
          .toSeq.sortBy(p => java.nio.file.Files.getLastModifiedTime(p).toMillis)
          .map { p =>
            val w = java.nio.file.Files.walk(p)
            try w.iterator().asScala
              .filter(java.nio.file.Files.isRegularFile(_))
              .map(java.nio.file.Files.size).sum
            finally w.close()
          }
      } finally l.close()
    }
    val defaultSize = sliceSizes.head
    FileCow.setTableProperties(spark, root,
      Map("graft.bloom.items" -> "10000", "graft.bloom.bits" -> "80000"))
    FileCow.append(spark, root, scattered(3000, 3100))
    val resized = sliceSizes.last
    assert(resized * 10 < defaultSize,
      s"a 100× smaller bits budget must shrink the slice: $resized vs $defaultSize")
    // resized sketches still skip and still answer right
    val q = FileCow.read(spark, root).filter(col("u") === uOf(3050L))
    assert(q.select("k").as[Long].collect().toSeq == Seq(3050L))
    assert(opened(q) == 1)
  }

  test("CREATE BLOOMFILTER INDEX backfills an existing table without a rewrite") {
    import graft.plans.GraftTables
    val root = Files.createTempDirectory("graft-bloom-bf").toString
    GraftTables.registerCow("bloom_bf", root)
    // born WITHOUT an index
    FileCow.create(spark, root,
      scattered(0, 1000).repartitionByRange(8, col("k")),
      statsCols = Seq("k", "u"))
    val probe = uOf(7L)
    assert(opened(FileCow.read(spark, root).filter(col("u") === probe)) >= 6)
    val filesBefore = FileCow.manifest(spark, root, FileCow.currentVersion(root))
      .select("file").collect().map(_.getString(0)).toSet

    spark.sql("CREATE BLOOMFILTER INDEX ON TABLE bloom_bf FOR COLUMNS (u)")
    // no rewrite, no new version: pure sidecar backfill
    assert(FileCow.currentVersion(root) == 1L)
    assert(FileCow.manifest(spark, root, 1L)
      .select("file").collect().map(_.getString(0)).toSet == filesBefore)
    val q = FileCow.read(spark, root).filter(col("u") === probe)
    assert(q.select("k").as[Long].collect().toSeq == Seq(7L))
    assert(opened(q) == 1, s"backfilled index must skip, opened ${opened(q)}")
    // and future commits keep sketching: an appended value skips too
    FileCow.append(spark, root, scattered(5000, 5100))
    val qNew = FileCow.read(spark, root).filter(col("u") === uOf(5050L))
    assert(qNew.select("k").as[Long].collect().toSeq == Seq(5050L))
    assert(opened(qNew) == 1)
    GraftTables.unregister("bloom_bf")
  }

  test("vacuum reclaims bloom slices exactly when their last sketched file dies") {
    val root = Files.createTempDirectory("graft-bloom-vac").toString
    FileCow.create(spark, root,
      scattered(0, 1000).repartitionByRange(8, col("k")),
      statsCols = Seq("k", "u"), bloomCols = Seq("u"))        // slice 1: v1 files
    FileCow.delete(spark, root, col("k") >= 0L)               // v2: all retire, slice 2 empty-ish
    FileCow.append(spark, root, scattered(2000, 2100))        // v3: slice 3
    val bloomDir = java.nio.file.Paths.get(root, "_bloom")
    def slices: Long = {
      val l = java.nio.file.Files.list(bloomDir)
      try l.filter(p => p.getFileName.toString.startsWith("s-")).count()
      finally l.close()
    }
    val before = slices
    FileCow.vacuum(spark, root, keep = 1, minAgeMs = 0L)
    // v1's files are all dead -> its slice goes; v3's files live -> stays
    assert(slices < before, s"dead slice must be reclaimed ($before -> $slices)")
    val q = FileCow.read(spark, root).filter(col("u") === uOf(2050L))
    assert(q.select("k").as[Long].collect().toSeq == Seq(2050L))
    assert(opened(q) == 1, "the surviving slice still skips")
  }

  private def md5Of(sIn: String): String = {
    java.security.MessageDigest.getInstance("MD5")
      .digest(sIn.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("the bloom index survives a metadata-only rename via the alias chain") {
    val root = Files.createTempDirectory("graft-bloom-ren").toString
    FileCow.create(spark, root,
      scattered(0, 1000).repartitionByRange(8, col("k")),
      statsCols = Seq("k"), bloomCols = Seq("u"))
    val c = FileCow.renameColumn(spark, root, "u", "uid")
    assert(c.filesRewritten == 0L, "mapped rename must stay metadata-only")
    // PRE-rename slices (keyed bloom_u) keep skipping under the new name
    val q = FileCow.read(spark, root).filter(col("uid") === uOf(7L))
    assert(q.select("k").as[Long].collect().toSeq == Seq(7L))
    assert(opened(q) == 1,
      s"pre-rename sketches must serve via the alias, opened ${opened(q)}")
    // POST-rename commits sketch under the new name and skip too
    FileCow.append(spark, root,
      scattered(2000, 2100).withColumnRenamed("u", "uid"))
    val q2 = FileCow.read(spark, root).filter(col("uid") === uOf(2050L))
    assert(q2.select("k").as[Long].collect().toSeq == Seq(2050L))
    assert(opened(q2) == 1, s"post-rename sketches skip, opened ${opened(q2)}")
  }

  test("recycling a bloom-historical name is refused (stale-sketch hazard)") {
    val root = Files.createTempDirectory("graft-bloom-rec").toString
    FileCow.create(spark, root,
      scattered(0, 200).repartitionByRange(4, col("k")),
      statsCols = Seq("k"), bloomCols = Seq("u"))
    FileCow.dropColumns(spark, root, Seq("u")) // bloom_u bytes stay in slices
    // renaming another column ONTO the dead name would make the stale
    // sketches probe-reachable for the wrong column — refused
    val e1 = intercept[IllegalArgumentException] {
      FileCow.renameColumn(spark, root, "s", "u")
    }
    assert(e1.getMessage.contains("Bloom index once keyed"), e1.getMessage)
    // re-adding the column and re-indexing it is refused the same way
    FileCow.addColumns(spark, root, Seq(
      org.apache.spark.sql.types.StructField("u",
        org.apache.spark.sql.types.LongType, nullable = true)))
    val e2 = intercept[IllegalArgumentException] {
      FileCow.buildBloomIndex(spark, root, Seq("u"))
    }
    assert(e2.getMessage.contains("old slices still key"), e2.getMessage)
    // an untouched name still indexes fine
    FileCow.buildBloomIndex(spark, root, Seq("s"))
    val probe = md5Of("d7")
    val q = FileCow.read(spark, root).filter(col("s") === probe)
    assert(q.select("k").as[Long].collect().toSeq == Seq(7L))
    assert(opened(q) == 1)
  }
}
