package graft

import java.nio.file.Files

import graft.sources.{CowAutoMaintenance, FileCow}

/** AUTO-MAINTENANCE (VERDICT r14 #5): the `graft.maintenance.auto` table
  * property closes the loop between the fragmentation planner and
  * OPTIMIZE — a fragmented landing workload converges to a compacted
  * layout with NO manual OPTIMIZE, layout commits stay distinct from data
  * commits in history, and the change feed across them is provably
  * empty. */
class CowAutoMaintenanceSpec extends SparkSpec {

  private def mkTable(tag: String, auto: Boolean): String = {
    val root = Files.createTempDirectory(s"graft-auto-$tag").resolve("t").toString
    val s = spark
    import s.implicits._
    val props =
      if (!auto) Map.empty[String, String]
      else Map(
        CowAutoMaintenance.AutoProp -> "true",
        // tiny test files: everything under 1 MiB is "small", trigger at 4
        CowAutoMaintenance.SmallBytesProp -> (1024L * 1024).toString,
        CowAutoMaintenance.MinFilesProp -> "4",
        CowAutoMaintenance.MaxPerTriggerProp -> "32")
    FileCow.create(spark, root,
      (0L until 10L).map(k => (k, "seed")).toDF("k", "v"),
      statsCols = Seq("k"), props = props)
    root
  }

  private def appendOne(root: String, k: Long): Unit = {
    val s = spark
    import s.implicits._
    FileCow.append(spark, root, Seq((k, "new")).toDF("k", "v"))
    ()
  }

  private def fileCount(root: String): Long =
    FileCow.detail(spark, root, FileCow.currentVersion(root)).count()

  private def kinds(root: String): Seq[String] =
    (1L to FileCow.currentVersion(root))
      .flatMap(v => FileCow.commitInfo(root, v)).map(_.kind)

  test("a fragmented landing workload converges without a manual OPTIMIZE") {
    val root = mkTable("conv", auto = true)
    (1 to 12).foreach(i => appendOne(root, 100L + i))
    val ks = kinds(root)
    assert(ks.count(_ == "compact") >= 2,
      s"the hook must have fired repeatedly, got $ks")
    assert(ks.count(_ == "append") == 12, ks.toString)
    // converged: the standing small-file debt is below the trigger
    assert(fileCount(root) < 4L,
      s"expected a converged layout, got ${fileCount(root)} files")
    // correctness: every row present exactly once
    assert(FileCow.read(spark, root).count() == 22L)
    // and the loop is BOUNDED per trigger: maintenance commits never
    // outnumber the data commits that price them in
    assert(ks.count(_ == "compact") <= 12, ks.toString)
  }

  test("the change feed across an auto-compact commit is provably empty") {
    val root = mkTable("cdf", auto = true)
    (1 to 5).foreach(i => appendOne(root, 200L + i))
    val compactV = (1L to FileCow.currentVersion(root))
      .find(v => FileCow.commitInfo(root, v).exists(_.kind == "compact"))
      .getOrElse(fail(s"no auto-compact landed: ${kinds(root)}"))
    val feed = FileCow.changesBetween(spark, root, Seq("k"),
      compactV - 1L, compactV)
    assert(feed.count() == 0L,
      "a row-neutral layout commit must produce an empty change feed")
  }

  test("auto-maintenance composes with concurrent writers: no lost rows, reduced debt") {
    val root = mkTable("race", auto = true)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 2).map(w => new Thread(() =>
      try (1 to 8).foreach(i => appendOne(root, 10000L * (w + 1) + i))
      catch { case e: Throwable => errs.add(e) }))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, errs.toArray.mkString("; "))
    // correctness first: every append's row present exactly once
    assert(FileCow.read(spark, root).count() == 26L)
    val ks = kinds(root)
    assert(ks.count(_ == "append") == 16, ks.toString)
    assert(ks.contains("compact"), s"maintenance never fired under race: $ks")
    // the debt is materially below the no-maintenance 17 files
    assert(fileCount(root) < 10L, s"${fileCount(root)} files: $ks")
  }

  test("without the property nothing triggers; the manual bounded step still works") {
    val root = mkTable("off", auto = false)
    (1 to 6).foreach(i => appendOne(root, 300L + i))
    assert(!kinds(root).contains("compact"), kinds(root).toString)
    assert(fileCount(root) >= 6L)
    // the manual spelling of the same bounded step
    val c = CowAutoMaintenance.compactSmall(spark, root,
      smallBytes = 1024L * 1024, minFiles = 2, maxPerTrigger = 32)
    assert(c.filesRewritten >= 6L, c.toString)
    assert(fileCount(root) == 1L)
    assert(FileCow.read(spark, root).count() == 16L)
    // below the floor: a re-run is a commit-free no-op
    val v = FileCow.currentVersion(root)
    val c2 = CowAutoMaintenance.compactSmall(spark, root,
      smallBytes = 1024L * 1024, minFiles = 2, maxPerTrigger = 32)
    assert(c2.filesRewritten == 0L && FileCow.currentVersion(root) == v)
  }

  test("OPTIMIZE t AUTO is the SQL spelling of the bounded step") {
    val root = mkTable("sqlauto", auto = false)
    graft.plans.GraftTables.registerCow("auto_sql_t", root)
    try {
      (1 to 4).foreach(i => appendOne(root, 400L + i))
      // thresholds ride the same table properties the hook reads
      FileCow.setTableProperties(spark, root, Map(
        CowAutoMaintenance.SmallBytesProp -> (1024L * 1024).toString))
      assert(fileCount(root) >= 5L)
      spark.sql("OPTIMIZE auto_sql_t AUTO")
      assert(fileCount(root) == 1L)
      assert(FileCow.commitInfo(root, FileCow.currentVersion(root)).get.kind
        == "compact")
      assert(FileCow.read(spark, root).count() == 14L)
      // snapshot tables refuse with the cure
      val snapRoot = Files.createTempDirectory("graft-auto-snap").resolve("t").toString
      graft.plans.GraftTables.register("auto_sql_snap", snapRoot)
      try {
        val e = intercept[Exception] { spark.sql("OPTIMIZE auto_sql_snap AUTO") }
        assert(e.getMessage.contains("snapshot-level"), e.getMessage)
      } finally graft.plans.GraftTables.unregister("auto_sql_snap")
    } finally graft.plans.GraftTables.unregister("auto_sql_t")
  }

  test("a malformed maintenance property never fails a statement whose commit landed (VERDICT r15 #2)") {
    val root = Files.createTempDirectory("graft-auto-bad").resolve("t").toString
    val s = spark
    import s.implicits._
    FileCow.create(spark, root,
      (0L until 10L).map(k => (k, "seed")).toDF("k", "v"),
      statsCols = Seq("k"),
      props = Map(CowAutoMaintenance.AutoProp -> "true"))
    // CREATE and SET both validate sizing props now, so the malformed
    // value arrives the way it would in production: written into the
    // props sidecar by an external tool / another engine / a hand edit.
    // '32MB' is not a long, and before the fix the hook's parse threw
    // NumberFormatException out of commit() AFTER the user's version
    // durably landed — the statement reported failure, an app-level retry
    // would double-commit, and every subsequent write was wedged the same
    // way
    val propsFile = java.nio.file.Paths.get(root, "_manifests", "m1.props.json")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val pn = mapper.readTree(Files.readAllBytes(propsFile))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    pn.put(CowAutoMaintenance.SmallBytesProp, "32MB")
    Files.write(propsFile, mapper.writeValueAsBytes(pn))
    appendOne(root, 500L) // must SUCCEED: the hook swallows its own failure
    assert(FileCow.currentVersion(root) == 2L)
    assert(FileCow.read(spark, root).count() == 11L)
    appendOne(root, 501L) // and the table is not wedged
    assert(FileCow.read(spark, root).count() == 12L)
    assert(!kinds(root).contains("compact"),
      "maintenance cannot run with an unparseable threshold")
    // the SET spelling refuses the typo up front (belt to the hook's braces)
    val e = intercept[IllegalArgumentException] {
      FileCow.setTableProperties(spark, root,
        Map(CowAutoMaintenance.SmallBytesProp -> "64MB"))
    }
    assert(e.getMessage.contains("positive integer"), e.getMessage)
    // fixing the property resumes maintenance on the standing debt
    FileCow.setTableProperties(spark, root, Map(
      CowAutoMaintenance.SmallBytesProp -> (1024L * 1024).toString,
      CowAutoMaintenance.MinFilesProp -> "2"))
    appendOne(root, 502L)
    assert(kinds(root).contains("compact"),
      s"maintenance must resume once the property parses: ${kinds(root)}")
    assert(FileCow.read(spark, root).count() == 13L)
  }
}
