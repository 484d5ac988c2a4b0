package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.plans.GraftTables
import graft.sources.{CatalogStore, FileCow}
import graft.tools.{StressCatalog, StressMultiWriter}

/** The round-14 killsweep kill points (VERDICT r13 #8):
  *
  *  1. SIGKILL a writer INSIDE the rebase window — after its lost CAS
  *     passed the winner-probe, before its re-CAS. A crash there must
  *     leave exactly the winner's table state, with the victim's staged
  *     rebase as vacuum-reclaimable orphans — on BOTH commit backends.
  *
  *  2. SIGKILL a DDL process inside the catalog's lock-held RMW while a
  *     second process races `CREATE TABLE` on the SAME name: the store
  *     stays contiguous and single-mutation-per-version, the survivor
  *     finishes its schedule, and the name is not wedged afterwards.
  *     (The race also pins the new registerIfAbsent contract: two
  *     creates of one name can never both bind.)
  */
class RoundKillSpec extends SparkSpec {

  for (backend <- Seq("lock", "cput"))
  test(s"[$backend] SIGKILL between the rebase's winner-probe and its re-CAS: winner state only, orphans reclaim") {
    if (backend == "cput") System.setProperty("graft.commit.backend", "cput")
    try {
      val base = Files.createTempDirectory(s"graft-rbk-$backend")
      val root = base.resolve("t").toString
      StressMultiWriter.createTable(spark, root) // v1: SharedKeys seeded
      val marker = base.resolve("in-window").toString
      val victim = StressMultiWriter.fork(Seq("rebasevictim", root, marker))
      val deadline = System.nanoTime() + 120L * 1000000000L
      while (victim.isAlive && !Files.exists(Paths.get(marker))) {
        assert(System.nanoTime() < deadline, "victim never reached the rebase window")
        Thread.sleep(25)
      }
      if (!Files.exists(Paths.get(marker)))
        fail(s"victim exited (${victim.exitValue()}) before the rebase window")
      victim.destroyForcibly(); victim.waitFor()

      // exactly the WINNER's state: v2 = the disjoint insert the victim's
      // own hook landed; the victim's shared-key merge never re-CASed
      assert(FileCow.currentVersion(root) == 2L,
        s"expected only the winner landed, at v${FileCow.currentVersion(root)}")
      val rows = FileCow.read(spark, root).select("k", "val").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows(5000000L) == "winner")
      StressMultiWriter.SharedKeys.foreach(k =>
        assert(rows(k) == "seed", s"shared key $k must hold the seed, got ${rows(k)}"))

      // the victim's staged rebase (data files + manifest temps + the
      // possible bloom slice) reclaims under an age-0 vacuum, completely
      FileCow.vacuum(spark, root, keep = 1000, minAgeMs = 0L)
      assert(FileCow.currentVersion(root) == 2L, "vacuum commits no version")
      assert(FileCow.vacuumPlan(spark, root, 1000, 0L).isEmpty,
        "vacuum left reclaimable files behind")
      val staged = {
        val l = Files.list(Paths.get(root, "_manifests"))
        try {
          val it = l.iterator(); var acc = List.empty[String]
          while (it.hasNext) { val f = it.next().getFileName.toString
            if (f.contains(".staging-")) acc ::= f }
          acc
        } finally l.close()
      }
      assert(staged.isEmpty, s"staging orphans survived vacuum: $staged")
      assert(!FileCow.isRetained(root, 3L), "no v3 artifacts may survive")

      // the statement retries cleanly from a fresh process's perspective
      val s = spark
      import s.implicits._
      FileCow.merge(spark, root,
        StressMultiWriter.SharedKeys.map(k => (k, "retry", 2L)).toDF("k", "val", "u"),
        Seq("k"))
      assert(FileCow.currentVersion(root) == 3L)
      assert(FileCow.read(spark, root).filter($"val" === "retry").count() ==
        StressMultiWriter.SharedKeys.size.toLong)
    } finally System.clearProperty("graft.commit.backend")
  }

  test("SIGKILL a cput winner between record-landing and roll-forward over planted DV debris: any probe completes the cleanup") {
    // VERDICT r14 #1: the commit record must be fully self-sufficient —
    // it embeds the ABSENT-ARTIFACT cleanups next to the moves, so a
    // winner crashing right after its put-if-absent leaves nothing only
    // it could have finished. Planted here: lock-era debris at the fixed
    // DV-registry name of the version being committed (a crashed
    // lock-mode attempt's leftover), which a reader would otherwise take
    // as the published version's deletion vectors — silently masking rows.
    System.setProperty("graft.commit.backend", "cput")
    try {
      val base = Files.createTempDirectory("graft-cleankill")
      val root = base.resolve("t").toString
      StressMultiWriter.createTable(spark, root) // v1, no deletion vectors
      val debris = Paths.get(root, "_manifests", "m2.dv.json")
      Files.write(debris,
        """{"lock-era-file.parquet":"dv-stale.bin"}"""
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))

      val marker = base.resolve("record-landed").toString
      val victim = StressMultiWriter.fork(Seq("cleanupvictim", root, marker))
      val deadline = System.nanoTime() + 120L * 1000000000L
      while (victim.isAlive && !Files.exists(Paths.get(marker))) {
        assert(System.nanoTime() < deadline, "victim never landed its record")
        Thread.sleep(25)
      }
      if (!Files.exists(Paths.get(marker)))
        fail(s"victim exited (${victim.exitValue()}) before landing its record")
      victim.destroyForcibly(); victim.waitFor()

      // the record landed → the commit HAPPENED; the winner just never
      // rolled it forward. It must carry the absent-cleanup entries.
      val rec = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
        Files.readAllBytes(Paths.get(root, "_manifests", "m2.commit.json")))
      val arts = rec.get("commitArtifacts")
      val absents = (0 until arts.size()).map(arts.get)
        .filter(_.path("absent").asBoolean(false))
        .map(_.get("final").asText())
      assert(absents.exists(_.endsWith("m2.dv.json")),
        s"record must embed the DV-registry cleanup, carried: $absents")

      // a plain reader's probe completes the commit: moves AND cleanup
      assert(FileCow.currentVersion(root) == 2L)
      assert(Files.notExists(debris),
        "roll-forward must clear the planted lock-era DV debris")
      val rows = FileCow.read(spark, root)
      assert(rows.filter(col("val") === "victim").count() == 1L,
        "the landed record IS the commit — its rows must be readable")
      assert(rows.count() == StressMultiWriter.SharedKeys.size + 1L,
        "no row may be masked by the stale DV registry")

      // hygiene: vacuum reclaims nothing surprising and commits no version
      FileCow.vacuum(spark, root, keep = 1000, minAgeMs = 0L)
      assert(FileCow.currentVersion(root) == 2L)
      assert(FileCow.vacuumPlan(spark, root, 1000, 0L).isEmpty)
    } finally System.clearProperty("graft.commit.backend")
  }

  test("SIGKILL a cput roller MID-roll-forward: racing rollers complete the half-rolled record") {
    // VERDICT r14 #8: the victim consumed the record's first artifact
    // (the delta dir) and died with the rest (schema/props) still at
    // staged names. Two concurrent rollers then race the SAME record —
    // staged-temp consumption under the rename lock must complete it
    // exactly once, whichever wins each artifact.
    System.setProperty("graft.commit.backend", "cput")
    try {
      val base = Files.createTempDirectory("graft-rollkill")
      val root = base.resolve("t").toString
      StressMultiWriter.createTable(spark, root) // props-carrying (bloom cols)
      val marker = base.resolve("mid-roll").toString
      val victim = StressMultiWriter.fork(Seq("rollvictim", root, marker))
      val deadline = System.nanoTime() + 120L * 1000000000L
      while (victim.isAlive && !Files.exists(Paths.get(marker))) {
        assert(System.nanoTime() < deadline, "victim never reached mid-roll")
        Thread.sleep(25)
      }
      if (!Files.exists(Paths.get(marker)))
        fail(s"victim exited (${victim.exitValue()}) before mid-roll")
      victim.destroyForcibly(); victim.waitFor()

      // two racing rollers: both probes must complete the record
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val rollers = (0 until 2).map(_ => new Thread(() =>
        try seen.add(FileCow.currentVersion(root))
        catch { case e: Throwable => errs.add(e) }))
      rollers.foreach(_.start()); rollers.foreach(_.join())
      assert(errs.isEmpty, errs.toArray.mkString("; "))
      assert(seen.toArray.forall(_ == 2L), seen.toArray.mkString(","))

      // every artifact at its fixed name, none staged, reads complete
      assert(Files.exists(Paths.get(root, "_manifests", "m2.schema.json")))
      assert(Files.exists(Paths.get(root, "_manifests", "m2.props.json")))
      assert(FileCow.read(spark, root).filter(col("val") === "roller").count() == 1L)
      assert(FileCow.read(spark, root).count() ==
        StressMultiWriter.SharedKeys.size + 1L)
      FileCow.vacuum(spark, root, keep = 1000, minAgeMs = 0L)
      assert(FileCow.vacuumPlan(spark, root, 1000, 0L).isEmpty)
      val staged = {
        val l = Files.list(Paths.get(root, "_manifests"))
        try {
          val it = l.iterator(); var acc = List.empty[String]
          while (it.hasNext) { val f = it.next().getFileName.toString
            if (f.contains(".staging-")) acc ::= f }
          acc
        } finally l.close()
      }
      assert(staged.isEmpty, s"staging leftovers survived: $staged")
    } finally System.clearProperty("graft.commit.backend")
  }

  test("a recorded commit whose staged artifacts were reclaimed fails LOUDLY, never silently") {
    // VERDICT r14 #8: the artifact-gone check in roll-forward is the
    // guard against an age-0 vacuum racing an in-flight commit — a
    // recorded version whose artifacts vanished (tmp consumed-nor-final)
    // must refuse the probe with the vacuum diagnosis, not resolve a
    // torn version.
    System.setProperty("graft.commit.backend", "cput")
    try {
      val base = Files.createTempDirectory("graft-gonekill")
      val root = base.resolve("t").toString
      StressMultiWriter.createTable(spark, root)
      val marker = base.resolve("record-landed").toString
      val victim = StressMultiWriter.fork(Seq("cleanupvictim", root, marker))
      val deadline = System.nanoTime() + 120L * 1000000000L
      while (victim.isAlive && !Files.exists(Paths.get(marker))) {
        assert(System.nanoTime() < deadline, "victim never landed its record")
        Thread.sleep(25)
      }
      victim.destroyForcibly(); victim.waitFor()
      // simulate the rogue reclaim: every staged temp of the un-rolled
      // commit vanishes (what an age-0 vacuum racing the roll would do)
      val l = Files.list(Paths.get(root, "_manifests"))
      try {
        val it = l.iterator()
        while (it.hasNext) {
          val p = it.next()
          if (p.getFileName.toString.contains(".staging-")) FileCow.deleteTree(p)
        }
      } finally l.close()
      val e = intercept[RuntimeException] { FileCow.currentVersion(root) }
      assert(e.getMessage.contains("vacuum"),
        s"expected the loud vacuum diagnosis, got: ${e.getMessage}")
    } finally System.clearProperty("graft.commit.backend")
  }

  test("SIGKILL a DDL racer while another process CREATEs the same name: store untorn, name not wedged") {
    val baseDir = Files.createTempDirectory("graft-ddlkill")
    val wh = baseDir.resolve("wh").toString
    val receipts = baseDir.resolve("receipts").toString
    // victim: paced so the kill lands mid-stride (inside create/register/drop)
    val victim = StressCatalog.fork(Seq("ddl", wh, receipts, "1", "500", "30"))
    while (victim.isAlive && CatalogStore.currentVersion(wh) < 4L) Thread.sleep(25)
    victim.destroyForcibly(); victim.waitFor()
    // survivor: races the SAME name through the dead process's released lock
    val survivor = StressCatalog.fork(Seq("ddl", wh, receipts, "2", "5", "0"))
    assert(survivor.waitFor() == 0, "survivor DDL racer failed after the kill")
    assert(StressCatalog.readReceipt(receipts, "ddl2")
      .exists(_.get("landed").asInt() == 5))

    // store integrity: contiguous versions, every snapshot parses, each
    // commit is exactly one binding mutation (no lost update, no tear)
    val cur = CatalogStore.currentVersion(wh)
    assert(cur >= 9L, s"too few catalog commits to mean anything: $cur")
    var prev = Map.empty[String, CatalogStore.Binding]
    (1L to cur).foreach { v =>
      val snap = CatalogStore.loadSnapshot(wh, v)
      val diff = (snap.bindings.keySet -- prev.keySet) ++
        (prev.keySet -- snap.bindings.keySet) ++
        snap.bindings.keySet.intersect(prev.keySet)
          .filter(k => snap.bindings(k) != prev(k))
      assert(diff.size == 1,
        s"catalog v$v mutated ${diff.size} bindings: $diff")
      prev = snap.bindings
    }

    // the shared name is NOT wedged: this process binds it cleanly
    GraftTables.attachWarehouse(wh)
    try {
      val root = baseDir.resolve("post").toString
      spark.sql(s"CREATE TABLE graft.shared_ddl (k BIGINT NOT NULL) " +
        s"USING graft_cow LOCATION '$root'")
      assert(GraftTables.entryOf("shared_ddl").isDefined)
      // and a second CREATE of the bound name loses LOUDLY — through
      // whichever front door claims it (the intercept refuses the location
      // conflict against the registered binding; the DSv2 catalog throws
      // TableAlreadyExists via registerIfAbsent)
      val e = intercept[Exception] {
        spark.sql(s"CREATE TABLE graft.shared_ddl (k BIGINT NOT NULL) " +
          s"USING graft_cow LOCATION '${baseDir.resolve("post2")}'")
      }
      val msg = e.getMessage.toLowerCase
      assert(msg.contains("already exists") || msg.contains("conflicts with the registered root"),
        e.getMessage)
      spark.sql("DROP TABLE graft.shared_ddl")
    } finally GraftTables.detachWarehouse()
  }
}
