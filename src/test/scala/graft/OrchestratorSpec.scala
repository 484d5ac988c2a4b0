package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.etl.Orchestrator
import graft.etl.Orchestrator.Stage

/** G16 — the reference's sequential pipeline driver semantics
  * (main_orchestrator.py: run in order, abort on first failure) plus the
  * run-log relation and resume-from-failed-stage contract. */
class OrchestratorSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("orch").toFile.getAbsolutePath + "/runlog"

  private def probeStages(log: scala.collection.mutable.Buffer[String],
      failAt: Set[String] = Set.empty): Seq[Stage] =
    Seq("extract", "merge", "dims", "facts").map { n =>
      Stage(n, _ => {
        if (failAt(n)) sys.error(s"boom in $n")
        log += n
      })
    }

  test("stages run in declared order; all ok; log has one ok row per stage") {
    val dir = tmp()
    val ran = scala.collection.mutable.Buffer[String]()
    val report = Orchestrator.run(spark, probeStages(ran), dir, runId = 1L)
    assert(report.ok)
    assert(ran.toSeq == Seq("extract", "merge", "dims", "facts"))
    val rows = Orchestrator.lastRun(spark, dir)
      .select("seq", "stage", "status").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(rows == Seq((0L, "extract", "ok"), (1L, "merge", "ok"),
      (2L, "dims", "ok"), (3L, "facts", "ok")))
  }

  test("first failure aborts: later stages never execute and log as skipped") {
    val dir = tmp()
    val ran = scala.collection.mutable.Buffer[String]()
    val report = Orchestrator.run(spark, probeStages(ran, failAt = Set("merge")),
      dir, runId = 1L)
    assert(!report.ok)
    assert(ran.toSeq == Seq("extract"), "dims/facts must not run after merge fails")
    val status = report.stages.map(s => s.stage -> s.status)
    assert(status == Seq("extract" -> "ok", "merge" -> "failed",
      "dims" -> "skipped", "facts" -> "skipped"))
    assert(report.stages.find(_.stage == "merge").get.error.get.contains("boom"))
  }

  test("resume skips the completed prefix and restarts at the failed stage") {
    val dir = tmp()
    val ran = scala.collection.mutable.Buffer[String]()
    Orchestrator.run(spark, probeStages(ran, failAt = Set("dims")), dir, runId = 1L)
    assert(ran.toSeq == Seq("extract", "merge"))

    ran.clear()
    val report = Orchestrator.resume(spark, probeStages(ran), dir, runId = 2L)
    assert(report.ok)
    assert(ran.toSeq == Seq("dims", "facts"), "extract/merge must be skipped")
    assert(report.stages.map(s => s.stage -> s.status) ==
      Seq("extract" -> "skipped_done", "merge" -> "skipped_done",
        "dims" -> "ok", "facts" -> "ok"))
    // The run log keeps BOTH runs: failure history is queryable, not erased.
    assert(spark.read.parquet(dir).select("run_id").distinct().count() == 2)
  }

  test("resume of a fully-ok run is a no-op") {
    val dir = tmp()
    Orchestrator.run(spark, probeStages(scala.collection.mutable.Buffer()),
      dir, runId = 1L)
    val ran = scala.collection.mutable.Buffer[String]()
    val report = Orchestrator.resume(spark, probeStages(ran), dir, runId = 2L)
    assert(report.ok && ran.isEmpty)
    assert(report.stages.forall(_.status == "skipped_done"))
  }

  test("duplicate stage names are rejected") {
    intercept[IllegalArgumentException] {
      Orchestrator.run(spark, Seq(Stage("a", _ => ()), Stage("a", _ => ())),
        tmp(), runId = 1L)
    }
  }
}
