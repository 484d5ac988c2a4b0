package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicReference

import graft.etl.Orchestrator
import graft.etl.Orchestrator.Stage
import graft.sources.{FileCow, GraftTransactions}

/** Atomic pipeline runs (round 16): `Orchestrator.runAtomic` wraps the
  * reference's dw2→dw5 sequence in ONE cross-table transaction — a
  * mid-pipeline failure leaves NOTHING visible (every landed stage output
  * heals), a success flips every stage's output with one decision, and
  * the run log records `reverted` (not `ok`) for healed stages so resume
  * restarts from stage 0. */
class OrchestratorAtomicSpec extends SparkSpec {

  private def mkTable(tag: String): String = {
    val root = Files.createTempDirectory(s"orch-atomic-$tag").resolve("t").toString
    val s = spark
    import s.implicits._
    FileCow.create(spark, root,
      (0L until 5L).map(k => (k, "seed")).toDF("k", "val"), statsCols = Seq("k"))
    root
  }

  private def appendStage(name: String, root: String, k: Long): Stage =
    Stage(name, sp => {
      import sp.implicits._
      FileCow.append(sp, root, Seq((k, name)).toDF("k", "val"))
      ()
    })

  private def onThread[T](body: => T): T = {
    val out = new AtomicReference[T]()
    val err = new AtomicReference[Throwable]()
    val t = new Thread(() =>
      try out.set(body) catch { case e: Throwable => err.set(e) })
    t.start(); t.join()
    if (err.get() != null) throw err.get()
    out.get()
  }

  test("a committed atomic run flips every stage's output with ONE decision; mid-run nothing is visible") {
    val facts = mkTable("f"); val dims = mkTable("d")
    val logDir = Files.createTempDirectory("orch-atomic-log").toString + "/log"
    val txnDir = Files.createTempDirectory("orch-atomic-txn").toString
    val midRun = new AtomicReference[(Long, Long)]()
    val stages = Seq(
      appendStage("facts", facts, 100L),
      appendStage("dims", dims, 100L),
      Stage("probe", _ => midRun.set(onThread {
        GraftTransactions.consistentRead {
          (FileCow.read(spark, facts).count(), FileCow.read(spark, dims).count())
        }
      })))
    val report = Orchestrator.runAtomic(spark, stages, logDir, 1L, txnDir)
    assert(report.ok, report.toString)
    // a FOREIGN reader mid-pipeline (after both stage writes landed) saw
    // the pre-run state: stage outputs are invisible until the decision
    assert(midRun.get() == (5L, 5L), s"mid-run leak: ${midRun.get()}")
    assert(FileCow.read(spark, facts).count() == 6L)
    assert(FileCow.read(spark, dims).count() == 6L)
    val m1 = FileCow.commitInfo(facts, 2L).get.txnMarker
    val m2 = FileCow.commitInfo(dims, 2L).get.txnMarker
    assert(m1.isDefined && m1 == m2, "one txn marker spans the pipeline")
    assert(Orchestrator.lastRun(spark, logDir).select("status")
      .collect().map(_.getString(0)).toSeq == Seq("ok", "ok", "ok"))
  }

  test("a mid-pipeline failure heals every landed stage: nothing visible, log says reverted/failed/skipped, rerun lands clean") {
    val facts = mkTable("ff"); val dims = mkTable("fd")
    val logDir = Files.createTempDirectory("orch-atomic-faillog").toString + "/log"
    val txnDir = Files.createTempDirectory("orch-atomic-failtxn").toString
    def stages(failDims: Boolean) = Seq(
      appendStage("facts", facts, 200L),
      Stage("dims", sp => {
        import sp.implicits._
        FileCow.append(sp, dims, Seq((200L, "dims")).toDF("k", "val"))
        if (failDims) sys.error("boom in dims")
      }),
      appendStage("report", facts, 201L))
    val report = Orchestrator.runAtomic(spark, stages(failDims = true),
      logDir, 1L, txnDir)
    assert(!report.ok)
    assert(report.stages.map(s => s.stage -> s.status) == Seq(
      "facts" -> "reverted", "dims" -> "failed", "report" -> "skipped"))
    assert(report.stages.find(_.stage == "dims").get.error.get.contains("boom"))
    // BOTH tables healed — the failed stage's own landed append included
    assert(FileCow.read(spark, facts).count() == 5L, "facts leaked")
    assert(FileCow.read(spark, dims).count() == 5L, "dims leaked")
    // rerun (resume of an all-or-nothing run IS a full rerun — the healed
    // stages' effects are gone by construction)
    val rerun = Orchestrator.runAtomic(spark, stages(failDims = false),
      logDir, 2L, txnDir)
    assert(rerun.ok)
    assert(FileCow.read(spark, facts).count() == 7L) // 200 + 201
    assert(FileCow.read(spark, dims).count() == 6L)
  }
}
