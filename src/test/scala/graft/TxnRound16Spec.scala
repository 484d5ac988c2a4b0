package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.CountDownLatch
import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.functions._

import graft.sources.{CommitBackend, CommitObjectStore, ConditionalPutBackend,
  FaultyObjectStore, FileCow, GraftOpenTransactionException, GraftTransactions,
  LocalFsObjectStore}

/** Round-16 cross-table-transaction hardening (VERDICT r15 #1/#3/#4 +
  * ADVICE r15): the marker store rides the pluggable commit backend, the
  * decision put survives a lost response, writers inside a consistentRead
  * scope derive fresh, the scope itself pins table HEADS (not just
  * markers), non-coordinator threads refuse loudly, and decided markers
  * age into a sealed ledger without ever flipping visibility. */
class TxnRound16Spec extends SparkSpec {

  private def mkTable(tag: String, rows: Long = 10L): String = {
    val root = Files.createTempDirectory(s"graft-txn16-$tag").resolve("t").toString
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

  /** Run `body` on a FRESH thread (no txn bound, no read scope) and
    * rethrow its failure here. */
  private def onThread[T](body: => T): T = {
    val out = new AtomicReference[T]()
    val err = new AtomicReference[Throwable]()
    val t = new Thread(() =>
      try out.set(body) catch { case e: Throwable => err.set(e) })
    t.start(); t.join()
    if (err.get() != null) throw err.get()
    out.get()
  }

  private def observe(r1: String, r2: String): (Long, Long) = onThread {
    GraftTransactions.consistentRead {
      (FileCow.read(spark, r1).count(), FileCow.read(spark, r2).count())
    }
  }

  // ------------------------------------------------- VERDICT r15 #1

  test("marker IO rides the ACTIVE backend's CommitObjectStore (cput): the decision is a conditional put on the same substrate") {
    // a spy store proves every marker byte crosses the pluggable seam —
    // on a cloud deployment this is the S3 client, and the cross-table
    // commit point must not silently stay on the coordinator's local FS
    val touched = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val spy = new CommitObjectStore {
      def read(key: String) = { touched.add(s"read:$key"); LocalFsObjectStore.read(key) }
      def putIfAbsent(key: String, bytes: Array[Byte]) = {
        touched.add(s"cput:$key"); LocalFsObjectStore.putIfAbsent(key, bytes) }
      def put(key: String, bytes: Array[Byte]) = {
        touched.add(s"put:$key"); LocalFsObjectStore.put(key, bytes) }
      def delete(key: String) = { touched.add(s"del:$key"); LocalFsObjectStore.delete(key) }
      def list(prefix: String) = { touched.add(s"list:$prefix"); LocalFsObjectStore.list(prefix) }
    }
    val prior = CommitBackend.forced
    CommitBackend.forced = Some(new ConditionalPutBackend(spy))
    try {
      val fact = mkTable("store-f"); val summary = mkTable("store-s")
      val txnDir = Files.createTempDirectory("graft-txn16-store").toString
      GraftTransactions.run(spark, txnDir) {
        appendOne(fact, 100L)
        appendOne(summary, 100L)
      }
      assert(observe(fact, summary) == (11L, 11L))
      val m = FileCow.commitInfo(fact, 2L).get.txnMarker.get
      val ops = touched.toArray(Array.empty[String]).toSeq
      // the pending file landed through the store...
      assert(ops.exists(o => o.startsWith("put:") && o.contains(m + ".json")),
        s"pending marker did not ride the backend store: ${ops.filter(_.contains("txn-")).take(8)}")
      // ...and the DECISION landed as a put-if-absent through the store
      assert(ops.exists(o => o.startsWith("cput:") && o.endsWith(m + ".final.json")),
        s"the decision put did not ride the backend store: ${ops.filter(_.contains("final")).take(8)}")
      // SHOW lists through the store, too
      assert(GraftTransactions.listTransactions(txnDir).exists(_._2 == "committed"))
      assert(touched.toArray(Array.empty[String]).exists(_.startsWith("list:")))
    } finally CommitBackend.forced = prior
  }

  test("a LOST RESPONSE on the decision put settles by read-back: the txn commits exactly once (ADVICE r15)") {
    val faulty = new FaultyObjectStore(LocalFsObjectStore)
    GraftTransactions.markerStoreOverride = Some(faulty)
    try {
      val fact = mkTable("lost-f"); val summary = mkTable("lost-s")
      val txnDir = Files.createTempDirectory("graft-txn16-lost").toString
      GraftTransactions.run(spark, txnDir) {
        appendOne(fact, 200L)
        appendOne(summary, 200L)
        // the NEXT marker-store write is the decision put: its response is
        // lost AFTER the put applied — the pre-fix code rethrew to the
        // caller with the decision durably 'committed' on disk
        faulty.lostPutResponses.set(1)
      }
      assert(faulty.lostPutResponses.get() == 0, "the fault must have fired")
      assert(observe(fact, summary) == (11L, 11L),
        "the txn decided committed; a lost response must not surface as failure")
      val m = FileCow.commitInfo(fact, 2L).get.txnMarker.get
      assert(GraftTransactions.state(m) == GraftTransactions.Committed)

      // duplicate delivery of the decision put: if-absent makes the
      // retransmit a no-op — still exactly one decision
      val fact2 = mkTable("dup-f"); val summary2 = mkTable("dup-s")
      GraftTransactions.run(spark, txnDir) {
        appendOne(fact2, 201L)
        appendOne(summary2, 201L)
        faulty.duplicateDeliveries.set(1)
      }
      assert(observe(fact2, summary2) == (11L, 11L))
    } finally GraftTransactions.markerStoreOverride = None
  }

  // ------------------------------------------------- VERDICT r15 #3

  test("a write statement inside a consistentRead scope derives FRESH across a foreign txn decision") {
    val t = mkTable("wscope")
    val txnDir = Files.createTempDirectory("graft-txn16-ws").toString
    GraftTransactions.consistentRead {
      assert(FileCow.read(spark, t).count() == 10L) // pins the head
      // a foreign txn commits on another thread MID-SCOPE
      onThread {
        GraftTransactions.run(spark, txnDir) { appendOne(t, 900L) }
      }
      // the scope still reads its snapshot...
      assert(FileCow.read(spark, t).count() == 10L)
      // ...but a WRITE from this thread must land: pre-fix, the derive
      // loop read the scope-pinned version, lost every CAS to the
      // (scope-invisible) committed gate, and died after 8 re-derives
      appendOne(t, 901L)
    }
    assert(FileCow.read(spark, t).count() == 12L,
      "both the foreign txn's row and the scoped statement's row landed")
    assert(FileCow.commitInfo(t, 3L).get.txnMarker.isEmpty,
      "the scoped statement's commit is an ordinary ungated commit")
  }

  // ------------------------------------------------- ADVICE r15 (medium)

  test("a clean commit atop a mid-scope txn cannot leak the txn in sideways: scopes pin table HEADS") {
    val a = mkTable("pin-a"); val b = mkTable("pin-b")
    val txnDir = Files.createTempDirectory("graft-txn16-pin").toString
    val pinnedB = new CountDownLatch(1)
    val cleanLanded = new CountDownLatch(1)
    val seen = new AtomicReference[(Long, Long)]()
    val err = new AtomicReference[Throwable]()
    val probe = new Thread(() =>
      try GraftTransactions.consistentRead {
        val nb = FileCow.read(spark, b).count() // scope begins: B resolved pre-txn
        pinnedB.countDown()
        cleanLanded.await()
        val na = FileCow.read(spark, a).count() // first touch of A is POST-everything
        seen.set((na, nb))
      } catch { case e: Throwable => err.set(e) })
    probe.start()
    try {
      pinnedB.await()
      // a whole txn begins AND decides inside the scope's lifetime...
      GraftTransactions.run(spark, txnDir) {
        appendOne(a, 950L); appendOne(b, 950L)
      }
      // ...and an UNRELATED clean commit lands on A above the gated
      // version — its cumulative manifest embeds the txn's row, which is
      // exactly how the pre-fix scope (markers pinned, heads not) tore
      appendOne(a, 951L)
    } finally { cleanLanded.countDown(); probe.join() }
    if (err.get() != null) throw err.get()
    assert(seen.get() == ((10L, 10L)),
      s"the scope observed ${seen.get()} — the txn leaked in through the clean head")
    // outside any scope, everything is visible
    assert(FileCow.read(spark, a).count() == 12L)
    assert(FileCow.read(spark, b).count() == 11L)
  }

  // ------------------------------------------------- VERDICT r15 #4

  test("a commit from a NON-coordinator thread on a touched table refuses loudly (never lands ungated)") {
    val fact = mkTable("guard-f"); val other = mkTable("guard-o")
    val txnDir = Files.createTempDirectory("graft-txn16-guard").toString
    GraftTransactions.run(spark, txnDir) {
      appendOne(fact, 800L)
      // the body spawns a thread (Future/parallel-collection shape) that
      // believes its commit is part of the txn — it must NOT land as an
      // ungated, immediately-visible write
      val e = intercept[GraftOpenTransactionException] {
        onThread { appendOne(fact, 801L) }
      }
      assert(e.getMessage.contains("ANOTHER thread"), e.getMessage)
      assert(e.getMessage.contains("coordinating thread"), e.getMessage)
      // a table the txn has NOT touched is outside the guard's knowledge
      // (documented boundary): the commit lands as an ordinary write
      onThread { appendOne(other, 802L) }
    }
    // the refused row never landed; the txn's own row flipped visible
    assert(FileCow.read(spark, fact).count() == 11L)
    assert(FileCow.read(spark, fact).filter(col("k") === 801L).count() == 0L)
    // after the decision, foreign threads write freely
    onThread { appendOne(fact, 803L) }
    assert(FileCow.read(spark, fact).count() == 12L)
  }

  // ------------------------------------------------- ADVICE r15 (marker GC)

  test("vacuumMarkers seals decided markers: files age out, outcomes stay exact for a fresh process") {
    val fact = mkTable("seal-f"); val summary = mkTable("seal-s")
    val txnDir = Files.createTempDirectory("graft-txn16-seal").toString
    GraftTransactions.run(spark, txnDir) {
      appendOne(fact, 600L); appendOne(summary, 600L)
    }
    val boom = intercept[RuntimeException] {
      GraftTransactions.run(spark, txnDir) {
        appendOne(fact, 601L)
        sys.error("abort this one")
      }
    }
    assert(boom.getMessage.contains("abort this one"))
    assert(GraftTransactions.listTransactions(txnDir).map(_._2).sorted
      == Seq("aborted", "committed"))

    assert(GraftTransactions.vacuumMarkers(txnDir, retainMs = 0L) == 2)
    // the live files are gone; the listing ages them out
    assert(GraftTransactions.listTransactions(txnDir).isEmpty)
    val leftover = LocalFsObjectStore.list(
      Paths.get(txnDir).toAbsolutePath.normalize.toString)
      .filter(k => Paths.get(k).getFileName.toString.startsWith("txn-"))
    assert(leftover.isEmpty, s"marker files must be consolidated: $leftover")

    // a FRESH process (caches dropped) resolves visibility from the
    // sealed ledger alone: committed history stays visible, the aborted
    // version stays invisible — and the vacated final path can never be
    // stale-broken into a corrupting 'aborted' (state() is decided)
    GraftTransactions.resetCachesForTest()
    assert(observe(fact, summary) == (11L, 11L))
    assert(FileCow.read(spark, fact).filter(col("k") === 601L).count() == 0L)
    // exact outcomes survive: time travel into the committed-gated
    // version works; into the aborted one refuses with ABORTED (not OPEN)
    GraftTransactions.requireReadable(fact, 2L)
    val e = intercept[RuntimeException] {
      GraftTransactions.requireReadable(fact, 3L)
    }
    assert(e.getMessage.contains("ABORTED"), e.getMessage)
    // writers proceed over sealed history
    appendOne(fact, 602L)
    assert(FileCow.read(spark, fact).count() == 12L)
    // idempotent: nothing left to seal
    assert(GraftTransactions.vacuumMarkers(txnDir, retainMs = 0L) == 0)
    // open markers are never touched
    GraftTransactions.begin(txnDir)
    try {
      assert(GraftTransactions.vacuumMarkers(txnDir, retainMs = 0L) == 0)
      assert(GraftTransactions.listTransactions(txnDir).map(_._2) == Seq("open"))
    } finally GraftTransactions.rollbackActive(spark)
  }

  test("TxnHandle.join opts a worker thread INTO the txn: gated, atomic, accepted by the guard") {
    val fact = mkTable("join-f"); val summary = mkTable("join-s")
    val txnDir = Files.createTempDirectory("graft-txn16-join").toString
    val escaped = new AtomicReference[GraftTransactions.TxnHandle]()
    GraftTransactions.run(spark, txnDir) {
      appendOne(fact, 810L)
      val h = GraftTransactions.handle
      escaped.set(h)
      // the worker commits through the handle: gated by the SAME marker
      // (the bare-thread spelling of this is refused by the guard)
      onThread { h.join { appendOne(summary, 810L) } }
      assert(observe(fact, summary) == (10L, 10L),
        "a joined worker's commit is still invisible pre-decision")
      // a joined thread cannot double-bind
      val e = intercept[IllegalArgumentException] {
        onThread { h.join { GraftTransactions.begin(txnDir) } }
      }
      assert(e.getMessage.contains("do not nest"), e.getMessage)
    }
    // the decision flips BOTH tables' rows — coordinator's and worker's
    assert(observe(fact, summary) == (11L, 11L))
    val m1 = FileCow.commitInfo(fact, 2L).get.txnMarker
    val m2 = FileCow.commitInfo(summary, 2L).get.txnMarker
    assert(m1.isDefined && m1 == m2, s"$m1 vs $m2")
    // joining a DECIDED txn refuses with the cure
    val late = intercept[RuntimeException] {
      onThread { escaped.get().join { appendOne(fact, 811L) } }
    }
    assert(late.getMessage.contains("already decided"), late.getMessage)
    assert(FileCow.read(spark, fact).count() == 11L)
  }

  test("VACUUM GRAFT TRANSACTIONS is the SQL spelling of marker retention") {
    val fact = mkTable("sqlvac")
    val dir = Files.createTempDirectory("graft-txn16-sqlvac").toString
    GraftTransactions.run(spark, dir) { appendOne(fact, 700L) }
    assert(spark.sql(s"VACUUM GRAFT TRANSACTIONS IN '$dir' RETAIN 0 HOURS")
      .head.getInt(0) == 1)
    assert(spark.sql(s"SHOW GRAFT TRANSACTIONS IN '$dir'").count() == 0L)
    assert(FileCow.read(spark, fact).count() == 11L, "sealing never flips visibility")
    // the default retention (168 h) leaves young markers alone
    GraftTransactions.run(spark, dir) { appendOne(fact, 701L) }
    assert(spark.sql(s"VACUUM GRAFT TRANSACTIONS IN '$dir'").head.getInt(0) == 0)
    assert(spark.sql(s"SHOW GRAFT TRANSACTIONS IN '$dir'").count() == 1L)
  }
}
