package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.functions._

import graft.plans.GraftTables
import graft.sources.{FileCow, GraftOpenTransactionException, GraftTransactions}
import graft.tools.StressMultiWriter

/** CROSS-TABLE TRANSACTIONS (VERDICT r14 #3): the reference's orchestrator
  * writes fact + summary in sequence (main_orchestrator.py:18-36) and gets
  * multi-table consistency by convention only; this spec pins the seam
  * that makes it a guarantee — N single-table commits gated behind ONE
  * conditional-put marker decision, visible all together or not at all,
  * across threads and across SIGKILLed processes. */
class GraftTransactionsSpec extends SparkSpec {

  private def mkTable(tag: String, rows: Long = 10L): String = {
    val root = Files.createTempDirectory(s"graft-txn-$tag").resolve("t").toString
    val s = spark
    import s.implicits._
    FileCow.create(spark, root,
      (0L until rows).map(k => (k, "seed", 0L)).toDF("k", "val", "u"),
      statsCols = Seq("k"))
    root
  }

  private def appendOne(root: String, k: Long): Unit = {
    val s = spark
    import s.implicits._
    FileCow.append(spark, root, Seq((k, "new", 1L)).toDF("k", "val", "u"))
    ()
  }

  /** Read both counts from a FRESH thread (no txn bound), one consistent
    * scope. */
  private def observe(r1: String, r2: String): (Long, Long) = {
    val out = new AtomicReference[(Long, Long)]()
    val err = new AtomicReference[Throwable]()
    val t = new Thread(() =>
      try out.set(GraftTransactions.consistentRead {
        (FileCow.read(spark, r1).count(), FileCow.read(spark, r2).count())
      })
      catch { case e: Throwable => err.set(e) })
    t.start(); t.join()
    if (err.get() != null) throw err.get()
    out.get()
  }

  test("two-table commit flips visible atomically at the marker decision; body reads its own writes") {
    val fact = mkTable("fact"); val summary = mkTable("sum")
    val txnDir = Files.createTempDirectory("graft-txn-m").toString
    GraftTransactions.run(spark, txnDir) {
      appendOne(fact, 100L)
      // a foreign observer mid-txn: BOTH tables still read pre-state
      assert(observe(fact, summary) == (10L, 10L))
      // the coordinating thread reads its own gated writes
      assert(FileCow.read(spark, fact).count() == 11L)
      appendOne(summary, 100L)
      assert(FileCow.read(spark, summary).count() == 11L)
    }
    // decided: both flip together, records carry the marker
    assert(observe(fact, summary) == (11L, 11L))
    val m1 = FileCow.commitInfo(fact, 2L).get.txnMarker
    val m2 = FileCow.commitInfo(summary, 2L).get.txnMarker
    assert(m1.isDefined && m1 == m2, s"$m1 vs $m2")
    assert(GraftTransactions.state(m1.get) == GraftTransactions.Committed)
  }

  test("abort on exception: nothing visible, tables heal with txn_revert, writers unblocked") {
    val fact = mkTable("afact"); val summary = mkTable("asum")
    val txnDir = Files.createTempDirectory("graft-txn-am").toString
    val boom = intercept[RuntimeException] {
      GraftTransactions.run(spark, txnDir) {
        appendOne(fact, 200L)
        appendOne(summary, 200L)
        sys.error("mid-transaction failure")
      }
    }
    assert(boom.getMessage.contains("mid-transaction failure"))
    assert(observe(fact, summary) == (10L, 10L),
      "an aborted txn's writes must never become visible")
    // both tables healed: head is a clean txn_revert whose state == v1's
    Seq(fact, summary).foreach { r =>
      val head = FileCow.currentVersion(r)
      val ci = FileCow.commitInfo(r, head).get
      assert(ci.kind == "txn_revert" && ci.txnMarker.isEmpty, ci.toString)
      assert(FileCow.visibleVersion(r) == head)
      // explicit time travel INTO the aborted version refuses
      val e = intercept[RuntimeException] {
        graft.sources.GraftTransactions.requireReadable(r, 2L)
      }
      assert(e.getMessage.contains("ABORTED"), e.getMessage)
    }
    // DESCRIBE HISTORY tells the story: the gated version reads aborted,
    // the heal and the ordinary commits read null
    val hist = FileCow.history(spark, fact)
      .select("version", "txn_status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hist(2L) == "aborted" && hist(1L) == null && hist(3L) == null,
      hist.toString)
    // ordinary writes proceed on the healed head
    appendOne(fact, 201L)
    assert(FileCow.read(spark, fact).count() == 11L)
    assert(FileCow.read(spark, fact).filter(col("k") === 200L).count() == 0L,
      "the aborted row must not resurface")
  }

  test("SQL DML participates: INSERT into two registered tables moves together") {
    val fact = mkTable("sfact"); val summary = mkTable("ssum")
    GraftTables.registerCow("txn_fact", fact)
    GraftTables.registerCow("txn_sum", summary)
    try {
      val txnDir = Files.createTempDirectory("graft-txn-sqlm").toString
      GraftTransactions.run(spark, txnDir) {
        spark.sql("INSERT INTO txn_fact VALUES (300, 'sql', 3)")
        assert(observe(fact, summary) == (10L, 10L))
        spark.sql("INSERT INTO txn_sum VALUES (300, 'sql', 3)")
      }
      assert(observe(fact, summary) == (11L, 11L))
      assert(spark.sql("SELECT count(*) AS n FROM txn_fact WHERE k = 300")
        .head.getLong(0) == 1L)
    } finally { GraftTables.unregister("txn_fact"); GraftTables.unregister("txn_sum") }
  }

  test("a live open txn refuses foreign writers loudly; the decision releases them") {
    val fact = mkTable("lfact")
    val txnDir = Files.createTempDirectory("graft-txn-lm").toString
    val gate = new java.util.concurrent.CountDownLatch(1)
    val landed = new java.util.concurrent.CountDownLatch(1)
    val txnErr = new AtomicReference[Throwable]()
    val txnThread = new Thread(() =>
      try GraftTransactions.run(spark, txnDir) {
        appendOne(fact, 400L)
        landed.countDown()
        gate.await()
      } catch { case e: Throwable => txnErr.set(e) })
    txnThread.start()
    try {
      landed.await()
      val e = intercept[GraftOpenTransactionException] { appendOne(fact, 401L) }
      assert(e.getMessage.contains("OPEN cross-table transaction"), e.getMessage)
      // an aggressive vacuum while the gate is open must not drop the
      // manifest the table currently SERVES (the visible version)
      FileCow.vacuum(spark, fact, keep = 1, minAgeMs = 0L)
      assert(FileCow.read(spark, fact).count() == 10L,
        "the visible version must survive keep=1 vacuum under an open gate")
    } finally { gate.countDown(); txnThread.join() }
    assert(txnErr.get() == null, s"txn thread failed: ${txnErr.get()}")
    // decided now: the foreign writer proceeds on top of the txn's commit
    appendOne(fact, 401L)
    assert(FileCow.read(spark, fact).count() == 12L)
  }

  test("SIGKILL between the two table commits: pre-state everywhere, stale-break + heal unblocks") {
    val fact = mkTable("kfact"); val summary = mkTable("ksum")
    val base = Files.createTempDirectory("graft-txn-kill")
    val txnDir = base.resolve("txns").toString
    val touch = base.resolve("t1-committed").toString
    val victim = StressMultiWriter.fork(Seq("txnvictim", fact, summary, txnDir, touch))
    val deadline = System.nanoTime() + 120L * 1000000000L
    while (victim.isAlive && !Files.exists(Paths.get(touch))) {
      assert(System.nanoTime() < deadline, "victim never landed its first commit")
      Thread.sleep(25)
    }
    if (!Files.exists(Paths.get(touch)))
      fail(s"victim exited (${victim.exitValue()}) before its first commit")
    victim.destroyForcibly(); victim.waitFor()

    // the half-done txn is invisible on BOTH tables — never one-of-two
    assert(observe(fact, summary) == (10L, 10L))
    assert(FileCow.currentVersion(fact) == 2L, "the gated commit is real")
    assert(FileCow.visibleVersion(fact) == 1L, "but not visible")

    // a foreign writer breaks the stale txn (timeout) and heals
    System.setProperty("graft.txn.timeoutMs", "400")
    try {
      Thread.sleep(500)
      appendOne(fact, 500L)
    } finally System.clearProperty("graft.txn.timeoutMs")
    assert(FileCow.read(spark, fact).filter(col("k") === 777001L).count() == 0L,
      "the dead txn's row must never surface")
    assert(observe(fact, summary) == (11L, 10L))
    val marker = FileCow.commitInfo(fact, 2L).get.txnMarker.get
    assert(GraftTransactions.state(marker) == GraftTransactions.Aborted)
    // history shows: gated commit, heal, foreign append
    val kinds = (2L to FileCow.currentVersion(fact))
      .flatMap(v => FileCow.commitInfo(fact, v)).map(_.kind)
    assert(kinds == Seq("append", "txn_revert", "append"), kinds.toString)
  }

  test("a concurrent reader probe NEVER observes one-of-two across repeated transactions") {
    val fact = mkTable("pfact"); val summary = mkTable("psum")
    val txnDir = Files.createTempDirectory("graft-txn-pm").toString
    val rounds = 6
    val violations = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      while (!stop.get()) {
        val (a, b) = GraftTransactions.consistentRead {
          (FileCow.read(spark, fact).count(), FileCow.read(spark, summary).count())
        }
        if (a != b) violations.add(s"observed fact=$a summary=$b")
      }
    })
    reader.start()
    try (1 to rounds).foreach { i =>
      GraftTransactions.run(spark, txnDir) {
        appendOne(fact, 1000L + i)
        Thread.sleep(30) // widen the window a probe could exploit
        appendOne(summary, 1000L + i)
      }
    } finally { stop.set(true); reader.join() }
    assert(violations.isEmpty, violations.toArray.mkString("; "))
    assert(observe(fact, summary) == (10L + rounds, 10L + rounds))
  }

  test("a FOREIGN-PROCESS reader probe never observes one-of-two (marker files alone)") {
    // the same-JVM probe shares caches with the coordinator; this one
    // shares NOTHING but the filesystem — visibility is enforced from
    // the commit records + marker files, exactly what a second executor
    // fleet or engine would see
    val fact = mkTable("xfact"); val summary = mkTable("xsum")
    val txnDir = Files.createTempDirectory("graft-txn-xm").toString
    val receipt = Files.createTempDirectory("graft-txn-xr").resolve("probe.json")
    val probe = StressMultiWriter.fork(
      Seq("txnprobe", fact, summary, receipt.toString, "20000"))
    try {
      val deadline = System.nanoTime() + 60L * 1000000000L
      (1 to 8).foreach { i =>
        GraftTransactions.run(spark, txnDir) {
          appendOne(fact, 2000L + i)
          Thread.sleep(25)
          appendOne(summary, 2000L + i)
        }
        assert(System.nanoTime() < deadline)
      }
    } finally assert(probe.waitFor() == 0, "probe process failed")
    val n = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readAllBytes(receipt))
    assert(n.get("violations").size() == 0,
      s"cross-process probe observed a mix: $n")
    assert(n.get("probes").asLong() > 10L,
      s"probe too slow to mean anything: $n")
    assert(observe(fact, summary) == (18L, 18L))
  }

  test("SQL spelling: BEGIN / COMMIT / ROLLBACK GRAFT TRANSACTION + SHOW GRAFT TRANSACTIONS") {
    val fact = mkTable("qfact"); val summary = mkTable("qsum")
    GraftTables.registerCow("txq_fact", fact)
    GraftTables.registerCow("txq_sum", summary)
    val dir = Files.createTempDirectory("graft-txn-sqldir").toString
    try {
      spark.sql(s"BEGIN GRAFT TRANSACTION AT '$dir'")
      spark.sql("INSERT INTO txq_fact VALUES (700, 'sql', 7)")
      assert(observe(fact, summary) == (10L, 10L))
      val open = spark.sql(s"SHOW GRAFT TRANSACTIONS IN '$dir'").collect()
      assert(open.length == 1 && open.head.getAs[String]("status") == "open",
        open.mkString(","))
      spark.sql("INSERT INTO txq_sum VALUES (700, 'sql', 7)")
      spark.sql("COMMIT GRAFT TRANSACTION")
      assert(observe(fact, summary) == (11L, 11L))
      assert(spark.sql(s"SHOW GRAFT TRANSACTIONS IN '$dir'").collect()
        .head.getAs[String]("status") == "committed")

      // the rollback spelling: nothing visible, table healed
      spark.sql(s"BEGIN GRAFT TRANSACTION AT '$dir'")
      spark.sql("INSERT INTO txq_fact VALUES (701, 'rb', 7)")
      spark.sql("ROLLBACK GRAFT TRANSACTION")
      assert(observe(fact, summary) == (11L, 11L))
      assert(FileCow.commitInfo(fact, FileCow.currentVersion(fact)).get.kind
        == "txn_revert")
      val statuses = spark.sql(s"SHOW GRAFT TRANSACTIONS IN '$dir'")
        .collect().map(_.getAs[String]("status")).sorted.toSeq
      assert(statuses == Seq("aborted", "committed"), statuses.toString)

      // decision statements demand an open txn
      val e = intercept[Exception] { spark.sql("COMMIT GRAFT TRANSACTION") }
      assert(e.getMessage.contains("no open transaction"), e.getMessage)
    } finally { GraftTables.unregister("txq_fact"); GraftTables.unregister("txq_sum") }
  }

  test("bootstrap inside a txn refuses; snapshot-level tables refuse participation") {
    val txnDir = Files.createTempDirectory("graft-txn-bm").toString
    val fresh = Files.createTempDirectory("graft-txn-fresh").resolve("t").toString
    val s = spark
    import s.implicits._
    val e = intercept[RuntimeException] {
      GraftTransactions.run(spark, txnDir) {
        FileCow.create(spark, fresh,
          Seq((1L, "x", 0L)).toDF("k", "val", "u"), statsCols = Seq("k"))
      }
    }
    assert(e.getMessage.contains("cannot CREATE"), e.getMessage)
    val snapRoot = Files.createTempDirectory("graft-txn-snap").resolve("t").toString
    val e2 = intercept[IllegalArgumentException] {
      GraftTransactions.run(spark, txnDir) {
        graft.sources.Versioned.publish(Seq((1L, "x")).toDF("k", "v"), snapRoot)
      }
    }
    assert(e2.getMessage.contains("snapshot-level"), e2.getMessage)
  }
}
