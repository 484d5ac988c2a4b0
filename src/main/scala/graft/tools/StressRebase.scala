package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.FileCow

/** MEASURE the lost-CAS rebase (G29, VERDICT r12 #2): N same-JVM writer
  * threads each run M MERGEs into their OWN disjoint key band of one
  * table, so every CAS conflict between them is logically disjoint. Two
  * arms over identical work:
  *
  *   - `rebase=on` (the shipped protocol): a loser re-folds its staged
  *     manifest from the winner's head — derive-once per merge;
  *   - `rebase=off` (`-Dgraft.conflict.rebase=off`, the pre-r13
  *     protocol): every lost CAS re-derives the whole statement —
  *     re-reads the base, re-stages the files, re-prices the merge.
  *
  * Reported per arm: wall-clock, landed versions, rebased / re-derived
  * counts. The claim under test is the throughput ceiling the verdict
  * named: with re-derive, N concurrent writers SERIALIZE (each conflict
  * redoes Spark-job work), so wall-clock grows superlinearly with
  * contention; with rebase the conflict cost is one driver-side manifest
  * re-fold. Threads (not processes) deliberately: the CAS serializes
  * same-JVM writers through the identical lock seam, and same-JVM keeps
  * CommitStats readable — the cross-process half of the protocol is
  * StressMultiWriter's job.
  *
  * Usage: `dev/jrun.sh graft.tools.StressRebase [writers] [mergesEach]`
  */
object StressRebase {

  private def mkTable(spark: SparkSession, root: String, writers: Int,
      rowsPerBand: Int): Unit = {
    import spark.implicits._
    val rows = (0 until writers).flatMap { w =>
      (0 until rowsPerBand).map(i => (w * 1000000L + i, "seed"))
    }.toDF("k", "v")
    // one file per band: every writer's merges touch ONLY its own file,
    // so cross-writer conflicts are always logically disjoint
    FileCow.create(spark, root, rows.repartitionByRange(writers, col("k")),
      statsCols = Seq("k"))
    ()
  }

  final case class Arm(rebase: Boolean, wallSec: Double, landed: Long,
      completed: Long, gaveUp: Long, rebased: Long, rederived: Long,
      histRebases: Long, histRederives: Long)

  def runArm(spark: SparkSession, rebase: Boolean, writers: Int,
      mergesEach: Int, rowsPerBand: Int): Arm = {
    import spark.implicits._
    val root = Files.createTempDirectory(
      s"graft-rebase-${if (rebase) "on" else "off"}").resolve("t").toString
    mkTable(spark, root, writers, rowsPerBand)
    val prev = System.getProperty("graft.conflict.rebase")
    if (rebase) System.clearProperty("graft.conflict.rebase")
    else System.setProperty("graft.conflict.rebase", "off")
    FileCow.CommitStats.reset()
    // per-writer landed-merge count; a writer that exhausts the re-derive
    // retry budget records a give-up and stops — under the OFF arm that is
    // the livelock the rebase exists to remove, so it is REPORTED, not a
    // tool crash
    val completed = new java.util.concurrent.atomic.AtomicLongArray(writers)
    val gaveUp = new java.util.concurrent.atomic.AtomicLong(0L)
    val t0 = System.nanoTime()
    try {
      val threads = (0 until writers).map { w =>
        val t = new Thread(() => {
          try (1 to mergesEach).foreach { m =>
            val src = (0 until 50).map(i =>
              (w * 1000000L + i, s"w$w-m$m")).toDF("k", "v")
            FileCow.merge(spark, root, src, Seq("k"))
            completed.set(w, m.toLong)
          } catch {
            case e: IllegalStateException if e.getMessage.contains("lost the commit race") =>
              gaveUp.incrementAndGet(); ()
          }
        }, s"rebase-writer-$w")
        t.start(); t
      }
      threads.foreach(_.join())
    } finally {
      if (prev == null) System.clearProperty("graft.conflict.rebase")
      else System.setProperty("graft.conflict.rebase", prev)
    }
    val wall = (System.nanoTime() - t0) / 1e9
    // correctness floor for both arms: every writer's LAST LANDED merge
    // value won its own band (disjoint writers can never clobber each
    // other), and every landed merge is exactly one version
    val got = FileCow.read(spark, root)
      .filter(col("k") % 1000000L < 50L).select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    var totalCompleted = 0L
    (0 until writers).foreach { w =>
      val c = completed.get(w); totalCompleted += c
      val want = if (c == 0L) "seed" else s"w$w-m$c"
      val v = got(w * 1000000L)
      require(v == want, s"writer $w's band carries $v, expected $want")
    }
    require(FileCow.currentVersion(root) == 1L + totalCompleted,
      "every landed merge must be exactly one version")
    // conflict observability (VERDICT r13 #6): the DESCRIBE HISTORY columns
    // must tell the same story as the JVM counters — rebases exactly (every
    // rebase lands), re-derives exactly when no writer gave up (a gave-up
    // statement's re-derives never land a record to be stamped into)
    val hist = FileCow.history(spark, root)
      .agg(org.apache.spark.sql.functions.sum("rebases"),
        org.apache.spark.sql.functions.sum("rederives")).collect().head
    val (hr, hd) = (hist.getLong(0), hist.getLong(1))
    require(hr == FileCow.CommitStats.rebased.get(),
      s"history rebases $hr != CommitStats ${FileCow.CommitStats.rebased.get()}")
    if (gaveUp.get() == 0L)
      require(hd == FileCow.CommitStats.rederived.get(),
        s"history rederives $hd != CommitStats ${FileCow.CommitStats.rederived.get()}")
    Arm(rebase, math.round(wall * 10) / 10.0,
      FileCow.currentVersion(root), totalCompleted, gaveUp.get(),
      FileCow.CommitStats.rebased.get(), FileCow.CommitStats.rederived.get(),
      hr, hd)
  }

  def main(args: Array[String]): Unit = {
    val writers = args.lift(0).map(_.toInt).getOrElse(4)
    val mergesEach = args.lift(1).map(_.toInt).getOrElse(8)
    val rowsPerBand = args.lift(2).map(_.toInt).getOrElse(100000)
    // `… [writers mergesEach rowsPerBand cput]` re-measures both arms with
    // the commit CAS riding conditional puts instead of the advisory lock
    args.lift(3).foreach(b => System.setProperty("graft.commit.backend", b))
    val backend = sys.props.getOrElse("graft.commit.backend", "lock")
    val spark = StressMultiWriter.session(8, "graft-rebase")
    def p(a: Arm): Unit = println(
      s"""{"tool":"rebase","backend":"$backend","rebase":${a.rebase},""" +
      s""""writers":$writers,""" +
      s""""mergesEach":$mergesEach,"wallSec":${a.wallSec},""" +
      s""""landed":${a.landed},"completed":${a.completed},""" +
      s""""gaveUp":${a.gaveUp},"rebased":${a.rebased},""" +
      s""""rederived":${a.rederived},""" +
      s""""histRebases":${a.histRebases},"histRederives":${a.histRederives}}""")
    // off first (the control), then on — same JVM, same warmed session
    p(runArm(spark, rebase = false, writers, mergesEach, rowsPerBand))
    p(runArm(spark, rebase = true, writers, mergesEach, rowsPerBand))
    spark.stop()
  }
}
