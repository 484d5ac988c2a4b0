package graft

import java.nio.file.Files

import graft.sources.FileCow
import graft.tools.StressMultiWriter

/** The commit seam raced across TWO REAL OS PROCESSES — the one structural
  * claim every prior concurrency spec asserted same-JVM only. Two forked
  * worker JVMs (fresh processes: no shared monitors, no shared manifest or
  * checkpoint caches — serialization rests ENTIRELY on the `_commit.lock`
  * advisory file lock and the CAS) drive concurrent MERGE / append /
  * RENAME COLUMN / property commits / age-floored vacuums against one
  * table root; [[StressMultiWriter.validate]] then proves from the
  * artifacts that both writers landed exactly-once with no version gap,
  * no torn commit record, no lost or duplicated rows, serializable
  * shared-key state, and a consistent Bloom declaration/alias chain.
  * The larger sweep is `dev/jrun.sh graft.tools.StressMultiWriter
  * orchestrate`; this is the same core at sbt-test scale. */
class CrossProcessCommitSpec extends SparkSpec {

  test("two OS processes commit concurrently: exactly-once, gap-free, untorn") {
    val base = Files.createTempDirectory("graft-xproc")
    val root = base.resolve("t").toString
    val receipts = base.resolve("receipts").toString
    StressMultiWriter.createTable(spark, root)
    val ops = 8
    val ps = Seq(
      StressMultiWriter.forkWorker(root, receipts, 0, ops, cpus = 2),
      StressMultiWriter.forkWorker(root, receipts, 1, ops, cpus = 2))
    val exits = ps.map(_.waitFor())
    assert(exits.forall(_ == 0), s"worker exit codes: $exits")
    val rs = StressMultiWriter.readReceipts(receipts)
    // writer 1's seq%8==0 op is a vacuum (no commit): 2*ops - 1 receipts
    assert(rs.size == 2 * ops - 1, s"landed ${rs.size} of ${2 * ops - 1}: $rs")
    val errs = StressMultiWriter.validate(spark, root, rs)
    assert(errs.isEmpty, errs.mkString("\n"))
    assert(FileCow.currentVersion(root) == rs.size + 1L)
  }
}
