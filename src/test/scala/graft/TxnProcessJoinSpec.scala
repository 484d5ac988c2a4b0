package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicReference

import graft.sources.{FileCow, GraftTransactions,
  GraftTransactionAbortedException}
import graft.tools.StressMultiWriter

/** Multi-process transaction participants (round 16): a SECOND OS PROCESS
  * joins an open cross-table transaction by marker path
  * ([[GraftTransactions.join]]) and its commits flip with the
  * coordinator's single conditional-put decision — the reference's
  * process-per-stage pipeline (bp_etl.sh → main_orchestrator.py) given
  * real atomicity. The forked worker shares NOTHING with the coordinator
  * JVM but the store: registration rides put-if-absent side records, the
  * heal set is the union any decider can see, and a participant failure
  * aborts the whole transaction. */
class TxnProcessJoinSpec extends SparkSpec {

  private def mkTable(tag: String, rows: Long = 10L): String = {
    val root = Files.createTempDirectory(s"graft-txnproc-$tag").resolve("t").toString
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

  private def forkJoiner(marker: String, root: String, k: Long,
      fail: Boolean = false): Process =
    StressMultiWriter.forkMain("graft.tools.TxnProcessWorker",
      Seq(marker, root, k.toString) ++ (if (fail) Seq("fail") else Nil))

  test("a foreign process joins the txn: its commit gates on the SAME marker and flips with the coordinator's decision") {
    val fact = mkTable("join-f"); val summary = mkTable("join-s")
    val txnDir = Files.createTempDirectory("graft-txnproc-m").toString
    val marker = GraftTransactions.begin(txnDir)
    try {
      appendOne(fact, 900L) // coordinator's own participant
      val p = forkJoiner(marker, summary, 900L)
      assert(p.waitFor() == 0, "worker process failed")
      // the worker's commit LANDED (a real gated version) but is invisible
      assert(FileCow.currentVersion(summary) == 2L)
      assert(observe(fact, summary) == (10L, 10L),
        "neither table shows pre-decision")
      // the worker registered through a put-if-absent side record — the
      // coordinator's pending list was never rewritten by a foreign RMW
      val sideFiles = new java.io.File(txnDir).listFiles()
        .map(_.getName).filter(_.contains(".root."))
      assert(sideFiles.length == 1, sideFiles.mkString(","))
      // SHOW GRAFT TRANSACTIONS surfaces the UNION participant set — the
      // ops view of which tables a dead coordinator would leave gated
      val parts = GraftTransactions.listTransactionsDetailed(txnDir).head._5
      assert(parts.toSet == Set(fact, summary), parts.toString)
    } finally {
      GraftTransactions.commitActive(spark)
    }
    // ONE decision flipped both processes' commits
    assert(observe(fact, summary) == (11L, 11L))
    val m1 = FileCow.commitInfo(fact, 2L).get.txnMarker
    val m2 = FileCow.commitInfo(summary, 2L).get.txnMarker
    assert(m1.contains(marker) && m2.contains(marker), s"$m1 / $m2")
  }

  test("a participant FAILURE aborts the whole txn: the coordinator's commit loses and EVERY table heals, the worker's included") {
    val fact = mkTable("fail-f"); val summary = mkTable("fail-s")
    val txnDir = Files.createTempDirectory("graft-txnproc-fm").toString
    val marker = GraftTransactions.begin(txnDir)
    appendOne(fact, 910L)
    val p = forkJoiner(marker, summary, 910L, fail = true)
    assert(p.waitFor() != 0, "worker was supposed to fail")
    // the worker's append LANDED before its body threw — gated, invisible,
    // and the abort decision is already durable
    assert(FileCow.currentVersion(summary) >= 2L)
    intercept[GraftTransactionAbortedException] {
      GraftTransactions.commitActive(spark)
    }
    // the coordinator healed the union it can see from the marker files —
    // including the table ONLY the foreign worker ever touched
    assert(observe(fact, summary) == (10L, 10L), "aborted work leaked")
    val healedF = FileCow.commitInfo(fact, FileCow.currentVersion(fact))
    val healedS = FileCow.commitInfo(summary, FileCow.currentVersion(summary))
    assert(healedF.exists(_.kind == "txn_revert"), healedF.toString)
    assert(healedS.exists(_.kind == "txn_revert"), healedS.toString)
  }

  test("join refuses a decided txn and a marker that never existed") {
    val fact = mkTable("ref-f")
    val txnDir = Files.createTempDirectory("graft-txnproc-rm").toString
    val marker = GraftTransactions.run(spark, txnDir) {
      appendOne(fact, 920L)
      GraftTransactions.handle.marker
    }
    val late = intercept[RuntimeException] {
      GraftTransactions.join(spark, marker) { appendOne(fact, 921L) }
    }
    assert(late.getMessage.contains("already decided"), late.getMessage)
    val ghost = intercept[RuntimeException] {
      GraftTransactions.join(spark,
        java.nio.file.Paths.get(txnDir).resolve("txn-nope").toString) { () }
    }
    assert(ghost.getMessage.contains("no transaction marker"), ghost.getMessage)
    assert(FileCow.read(spark, fact).count() == 11L)
  }

  private def chainMessages(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")

  test("SQL spellings: JOIN / LEAVE GRAFT TRANSACTION; participant COMMIT refuses; participant ROLLBACK aborts the whole txn") {
    val fact = mkTable("sql-f"); val summary = mkTable("sql-s")
    val txnDir = Files.createTempDirectory("graft-txnproc-sql").toString
    val marker = GraftTransactions.begin(txnDir)
    appendOne(fact, 940L)
    onThread {
      spark.sql(s"JOIN GRAFT TRANSACTION '$marker'").collect()
      appendOne(summary, 940L) // gated behind the coordinator's marker
      val e = intercept[Throwable] {
        spark.sql("COMMIT GRAFT TRANSACTION").collect()
      }
      assert(chainMessages(e).contains("only the coordinating session"),
        chainMessages(e))
      spark.sql("LEAVE GRAFT TRANSACTION").collect()
    }
    GraftTransactions.commitActive(spark)
    assert(observe(fact, summary) == (11L, 11L),
      "the participant session's DML flips with the coordinator's COMMIT")

    // a participant that knows the work is bad stops the whole publish
    val m2 = GraftTransactions.begin(txnDir)
    appendOne(fact, 941L)
    onThread {
      spark.sql(s"JOIN GRAFT TRANSACTION '$m2'").collect()
      appendOne(summary, 941L)
      spark.sql("ROLLBACK GRAFT TRANSACTION").collect()
    }
    intercept[GraftTransactionAbortedException] {
      GraftTransactions.commitActive(spark)
    }
    assert(observe(fact, summary) == (11L, 11L), "aborted work leaked")
  }

  test("rollback heals a table only the FOREIGN participant touched (union heal from the marker files)") {
    val fact = mkTable("rb-f"); val summary = mkTable("rb-s")
    val txnDir = Files.createTempDirectory("graft-txnproc-rb").toString
    val marker = GraftTransactions.begin(txnDir)
    appendOne(fact, 930L)
    val p = forkJoiner(marker, summary, 930L)
    assert(p.waitFor() == 0)
    GraftTransactions.rollbackActive(spark)
    assert(observe(fact, summary) == (10L, 10L))
    assert(FileCow.commitInfo(summary, FileCow.currentVersion(summary))
      .exists(_.kind == "txn_revert"),
      "the worker-only table must heal eagerly on the coordinator's rollback")
  }
}
