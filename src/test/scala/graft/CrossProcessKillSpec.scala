package graft

import java.nio.file.Files

import graft.tools.StressMultiWriter

/** The commit seam under a REAL mid-run SIGKILL (VERDICT r11 #2) plus a
  * concurrent READER process (#7): r11 proved the crashed-inside-the-lock
  * recovery only with hand-placed orphan artifacts; here a forked worker
  * JVM dies by `destroyForcibly` while committing against live
  * contention, and [[StressMultiWriter.killSweep]] proves from the
  * artifacts that
  *   - the survivor kept committing (the OS released the advisory lock
  *     with the dead process),
  *   - every unreceipted effect of the victim is a COMPLETE atomic commit
  *     (no torn state — CDF replay, manifest fold, shared-key
  *     serializability all still hold),
  *   - a third reader JVM's time-travel probes saw zero torn reads and
  *     failed loudly above the pointer,
  *   - an age-0 vacuum reclaims every orphan the kill left.
  * The larger sweep is `dev/jrun.sh graft.tools.StressMultiWriter
  * killsweep`; this is one round at sbt-test scale. */
class CrossProcessKillSpec extends SparkSpec {

  test("SIGKILL mid-run: survivor commits on, no torn state, reader never torn") {
    val base = Files.createTempDirectory("graft-kill")
    val r = StressMultiWriter.killSweep(spark, base, opsW0 = 10, opsW1 = 64,
      killAfterLanded = 2, readerMs = 12000L)
    assert(r.errors.isEmpty, r.errors.mkString("\n"))
    assert(r.landed >= 10, s"too few commits landed to mean anything: $r")
    assert(r.reader.exists(_.probes > 0), s"reader made no probes: $r")
  }

  test("SIGKILL mid-run under the CONDITIONAL-PUT backend: same invariants, no lock anywhere") {
    // `graft.commit.backend` is process-global and inherited by the forked
    // workers (the deployment model: every writer of a table uses one
    // backend) — under it, commit arbitration is record put-if-absent and
    // a victim killed between its record landing and its roll-forward is
    // completed by the survivor's next version probe
    System.setProperty("graft.commit.backend", "cput")
    try {
      val base = Files.createTempDirectory("graft-kill-cput")
      val r = StressMultiWriter.killSweep(spark, base, opsW0 = 10, opsW1 = 64,
        killAfterLanded = 2, readerMs = 12000L)
      assert(r.errors.isEmpty, r.errors.mkString("\n"))
      assert(r.landed >= 10, s"too few commits landed to mean anything: $r")
      assert(r.reader.exists(_.probes > 0), s"reader made no probes: $r")
    } finally System.clearProperty("graft.commit.backend")
  }
}
