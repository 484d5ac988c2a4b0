package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.plans.GraftTables
import graft.sources.{CatalogStore, FileCow, GraftTransactions}
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

  // ---- round-16 killsweep variations (VERDICT r15 #7) ----

  private def mkTxnTable(tag: String): String = {
    val root = Files.createTempDirectory(s"graft-rk16-$tag").resolve("t").toString
    val s = spark
    import s.implicits._
    FileCow.create(spark, root,
      (0L until 10L).map(k => (k, "seed", 0L)).toDF("k", "val", "u"),
      statsCols = Seq("k"))
    root
  }

  private def awaitTouch(victim: Process, touch: java.nio.file.Path,
      what: String): Unit = {
    val deadline = System.nanoTime() + 120L * 1000000000L
    while (victim.isAlive && !Files.exists(touch)) {
      assert(System.nanoTime() < deadline, s"victim never reached $what")
      Thread.sleep(25)
    }
    if (!Files.exists(touch))
      fail(s"victim exited (${victim.exitValue()}) before $what")
  }

  private def observeBoth(r1: String, r2: String): (Long, Long) = {
    val out = new java.util.concurrent.atomic.AtomicReference[(Long, Long)]()
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val t = new Thread(() =>
      try out.set(GraftTransactions.consistentRead {
        (FileCow.read(spark, r1).count(), FileCow.read(spark, r2).count())
      }) catch { case e: Throwable => err.set(e) })
    t.start(); t.join()
    if (err.get() != null) throw err.get()
    out.get()
  }

  test("SIGKILL the txn coordinator right AFTER its decision put: both tables flip visible from the files alone") {
    val fact = mkTxnTable("dec-f"); val summary = mkTxnTable("dec-s")
    val base = Files.createTempDirectory("graft-rk16-dec")
    val txnDir = base.resolve("txns").toString
    val touch = base.resolve("decided")
    val victim = StressMultiWriter.fork(
      Seq("txndecidedvictim", fact, summary, txnDir, touch.toString))
    awaitTouch(victim, touch, "its decision put")
    victim.destroyForcibly(); victim.waitFor()
    assert(new String(Files.readAllBytes(touch)) == "committed")

    // the decision is durable: a foreign JVM (this one — it never saw the
    // txn) resolves BOTH tables post-state together, from the files alone
    assert(observeBoth(fact, summary) == (11L, 11L),
      "a committed decision must flip every participant, coordinator dead or not")
    Seq(fact, summary).foreach { r =>
      assert(FileCow.currentVersion(r) == 2L)
      val m = FileCow.commitInfo(r, 2L).get.txnMarker
      assert(m.isDefined)
      assert(GraftTransactions.state(m.get) == GraftTransactions.Committed)
      GraftTransactions.requireReadable(r, 2L) // time travel into it is legal
    }
    assert(GraftTransactions.listTransactions(txnDir).map(_._2)
      == Seq("committed"))
    // ordinary writes proceed on top with no heal detour
    val s = spark
    import s.implicits._
    FileCow.append(spark, fact, Seq((888100L, "after", 8L)).toDF("k", "val", "u"))
    assert(FileCow.commitInfo(fact, 3L).get.kind == "append")
    assert(FileCow.read(spark, fact).count() == 12L)
  }

  test("SIGKILL the txn coordinator with its 2nd commit RECORDED but unrolled (cput): invisible, stale-break heals, never a tear") {
    System.setProperty("graft.commit.backend", "cput")
    try {
      val fact = mkTxnTable("stg-f"); val summary = mkTxnTable("stg-s")
      val base = Files.createTempDirectory("graft-rk16-stg")
      val txnDir = base.resolve("txns").toString
      val touch = base.resolve("recorded")
      val victim = StressMultiWriter.fork(
        Seq("txnstagedvictim", fact, summary, txnDir, touch.toString))
      awaitTouch(victim, touch, "its second record put")
      victim.destroyForcibly(); victim.waitFor()

      // the second table's record landed with artifacts still staged: any
      // probe completes the roll-forward, but the version stays GATED by
      // the still-pending marker — pre-state everywhere, never one-of-two
      assert(FileCow.currentVersion(summary) == 2L,
        "the recorded commit must resolve via any probe")
      assert(FileCow.visibleVersion(summary) == 1L, "but stay invisible")
      assert(observeBoth(fact, summary) == (10L, 10L))

      // the stale-break (through a foreign writer's gate check) aborts the
      // dead txn and heals the written table before the writer's own row
      System.setProperty("graft.txn.timeoutMs", "400")
      try {
        Thread.sleep(500)
        val s = spark
        import s.implicits._
        FileCow.append(spark, summary,
          Seq((888200L, "after", 8L)).toDF("k", "val", "u"))
      } finally System.clearProperty("graft.txn.timeoutMs")
      val m = FileCow.commitInfo(summary, 2L).get.txnMarker.get
      assert(GraftTransactions.state(m) == GraftTransactions.Aborted)
      assert(FileCow.read(spark, summary).count() == 11L)
      assert(FileCow.read(spark, summary)
        .filter(col("k") === 888004L).count() == 0L,
        "the dead txn's row must never surface")
      val kinds = (2L to FileCow.currentVersion(summary))
        .flatMap(v => FileCow.commitInfo(summary, v)).map(_.kind)
      assert(kinds == Seq("append", "txn_revert", "append"), kinds.toString)
      // the FIRST table heals on its next write the same way
      val s2 = spark
      import s2.implicits._
      FileCow.append(spark, fact, Seq((888201L, "after", 8L)).toDF("k", "val", "u"))
      assert(FileCow.read(spark, fact).count() == 11L)
      assert(FileCow.read(spark, fact).filter(col("k") === 888003L).count() == 0L)
    } finally System.clearProperty("graft.commit.backend")
  }

  test("SIGKILL a JOINED foreign participant after its gated commit lands: the coordinator's decision alone flips both tables") {
    val fact = mkTxnTable("join-f"); val summary = mkTxnTable("join-s")
    val base = Files.createTempDirectory("graft-rk16-join")
    val txnDir = base.resolve("txns").toString
    val touch = base.resolve("landed")
    val marker = GraftTransactions.begin(txnDir)
    try {
      val s = spark
      import s.implicits._
      FileCow.append(spark, fact,
        Seq((888300L, "coord", 8L)).toDF("k", "val", "u"))
      // the worker JOINS, lands its gated append, touches, then HANGS —
      // SIGKILLed mid-join: a dead participant, its work durably landed
      val victim = StressMultiWriter.forkMain("graft.TxnHangWorker",
        Seq(marker, summary, touch.toString))
      awaitTouch(victim, touch, "its gated append")
      victim.destroyForcibly(); victim.waitFor()
      // the dead participant's commit is real (a recorded version), its
      // side-record registration durable — and nothing is visible yet
      assert(FileCow.currentVersion(summary) == 2L)
      assert(observeBoth(fact, summary) == (10L, 10L),
        "a dead participant must not leak pre-decision state")
    } finally {
      GraftTransactions.commitActive(spark)
    }
    // the coordinator's ONE decision flips its own table AND the dead
    // worker's — membership lives in the marker files, not in any JVM
    assert(observeBoth(fact, summary) == (11L, 11L),
      "the dead participant's landed work must flip with the decision")
    Seq(fact, summary).foreach { r =>
      val m = FileCow.commitInfo(r, 2L).get.txnMarker
      assert(m.contains(marker), s"$r: $m")
    }
  }

  test("an aggressive vacuum races the txn_revert heal: both complete, no visible data lost") {
    val root = mkTxnTable("heal")
    val txnDir = Files.createTempDirectory("graft-rk16-heal").toString
    // an aborted-gated, UNHEALED head: a coordinator thread lands one
    // gated commit and dies without deciding; an ops abort() then decides
    // — nothing has healed yet
    val marker = new java.util.concurrent.atomic.AtomicReference[String]()
    val t = new Thread(() => {
      marker.set(GraftTransactions.begin(txnDir))
      val s = spark
      import s.implicits._
      FileCow.append(spark, root, Seq((666L, "dead", 6L)).toDF("k", "val", "u"))
    })
    t.start(); t.join()
    assert(GraftTransactions.abort(marker.get()))
    assert(FileCow.currentVersion(root) == 2L)
    assert(FileCow.visibleVersion(root) == 1L)

    // the race, made DETERMINISTIC: a keep=1 age-0 vacuum fires INSIDE
    // the heal's commit window — after revertAborted chose its restore
    // set from the clean version, before the txn_revert's CAS reads those
    // manifests. The vacuum's visible-version floor must keep the clean
    // manifest (the version the table SERVES and the heal restores from)
    // alive even though keep=1 would otherwise retain only the gated
    // head. (An unguarded age-0 sweep against a LIVE writer's staging is
    // the separately-pinned loud-failure case above.)
    val vacuumsInWindow = new java.util.concurrent.atomic.AtomicInteger(0)
    FileCow.CommitHooks.beforeCommit = (r, expected) =>
      if (r == root && expected == 2L && vacuumsInWindow.incrementAndGet() == 1) {
        FileCow.vacuum(spark, root, keep = 1, minAgeMs = 0L)
        ()
      }
    val s = spark
    import s.implicits._
    try FileCow.append(spark, root, Seq((777L, "healer", 9L)).toDF("k", "val", "u"))
    finally FileCow.CommitHooks.reset()
    assert(vacuumsInWindow.get() >= 1, "the vacuum never fired in the heal window")

    // end state: seed + healer row, no dead row, history tells the story
    val rows = FileCow.read(spark, root)
    assert(rows.count() == 11L)
    assert(rows.filter(col("k") === 666L).count() == 0L)
    assert(rows.filter(col("k") === 777L).count() == 1L)
    val kinds = (2L to FileCow.currentVersion(root))
      .flatMap(v => FileCow.commitInfo(root, v)).map(_.kind)
    assert(kinds.contains("txn_revert") && kinds.last == "append", kinds.toString)
    // hygiene: a quiescent sweep reclaims the rest and the table stays
    // writable and correct afterwards
    FileCow.vacuum(spark, root, keep = 1, minAgeMs = 0L)
    assert(FileCow.vacuumPlan(spark, root, 1, 0L).isEmpty)
    FileCow.append(spark, root, Seq((778L, "post", 7L)).toDF("k", "val", "u"))
    assert(FileCow.read(spark, root).count() == 12L)
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

/** The forked JOINED-participant victim of RoundKillSpec's joined-kill
  * case: joins the coordinator's open txn by marker path, lands ONE
  * gated append on `root`, touches `touchPath`, then hangs until the
  * spec SIGKILLs it — a participant that dies mid-transaction with its
  * work durably landed. Test-tree main: forked with the spec JVM's own
  * classpath. */
object TxnHangWorker {
  def main(args: Array[String]): Unit = {
    val marker = args(0); val root = args(1); val touchPath = args(2)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("graft-txn-hang-worker")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    import spark.implicits._
    GraftTransactions.join(spark, marker) {
      FileCow.append(spark, root,
        Seq((888400L, "worker", 1L)).toDF("k", "val", "u"))
      Files.write(Paths.get(touchPath), "landed".getBytes)
      Thread.sleep(300000L) // hold the join open until the SIGKILL
    }
    ()
  }
}
