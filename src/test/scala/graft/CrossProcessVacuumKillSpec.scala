package graft

import java.nio.file.Files

import graft.tools.StressMultiWriter

/** SIGKILL a VACUUM mid-sweep under live commits (VERDICT r12 #8): the
  * writer-kill sweep crashes commits; this crashes the OTHER mutation
  * class — retention sweeps (version-artifact drops + fold-base
  * checkpoint staging). Post-kill contract: the writer is undisturbed,
  * the standing invariants hold, and vacuum is IDEMPOTENT — re-running
  * the same-parameter sweep converges, whatever the killed one half-did. */
class CrossProcessVacuumKillSpec extends SparkSpec {

  test("SIGKILL mid-vacuum: writer undisturbed, next vacuum converges") {
    val base = Files.createTempDirectory("graft-vackill")
    val r = StressMultiWriter.killVacuumSweep(spark, base, opsW0 = 16)
    assert(r.errors.isEmpty, r.errors.mkString("\n"))
    assert(r.landed >= 16, s"too few commits landed to mean anything: $r")
  }
}
