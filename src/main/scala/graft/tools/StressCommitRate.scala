package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{CommitBackend, ConditionalPutBackend, FileCow,
  LatencyObjectStore, LocalFsObjectStore}

/** MEASURE the conditional-put commit rate under HTTP-realistic store
  * latency (VERDICT r14 #4): the ≤8-store-ops-per-commit budget is
  * spec-pinned, but the commits/s/table number it implies (~≥4/s at
  * ~30 ms RTT) was derived, not measured. This harness wraps the commit
  * protocol's object store in [[graft.sources.LatencyObjectStore]]
  * (every read/put sleeps the injected RTT and counts itself) and runs
  * the SAME append workload twice — latency 0 (control) and latency L —
  * so the marginal cost per commit is isolated from Spark-job time:
  *
  *   measured store-ops/commit = (wall_L − wall_0) / commits / L
  *
  * Arms: single writer (the per-table serial commit rate an orchestrator
  * sees) and `writers` contending threads with rebase on (disjoint
  * appends — every conflict is rebase-eligible, the realistic
  * multi-writer shape). Reported per arm: wall seconds, landed commits,
  * sustained commits/s, store ops per landed commit (from the op
  * counter — the direct budget check), rebases.
  *
  * Usage: `dev/jrun.sh graft.tools.StressCommitRate [latencyMs] [writers]
  * [commitsEach]` — defaults 30 / 4 / 24.
  */
object StressCommitRate {

  final case class Arm(label: String, latencyMs: Long, writers: Int,
      wallSec: Double, landed: Long, commitsPerSec: Double,
      storeOps: Long, opsPerCommit: Double, rebased: Long,
      refusals: Long = 0L)

  private def runArm(spark: SparkSession, latencyMs: Long, writers: Int,
      commitsEach: Int): Arm = {
    import spark.implicits._
    val store = new LatencyObjectStore(LocalFsObjectStore, latencyMs)
    CommitBackend.forced = Some(new ConditionalPutBackend(store))
    try {
      val root = Files.createTempDirectory(s"graft-rate-$latencyMs")
        .resolve("t").toString
      FileCow.create(spark, root, Seq((0L, "seed")).toDF("k", "v"),
        statsCols = Seq("k"))
      val createOps = store.ops.get()
      FileCow.CommitStats.reset()
      val t0 = System.nanoTime()
      val threads = (0 until writers).map { w =>
        new Thread(() => (0 until commitsEach).foreach { i =>
          FileCow.append(spark, root,
            Seq((1000000L * (w + 1) + i, s"w$w-$i")).toDF("k", "v"))
          ()
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val wall = (System.nanoTime() - t0) / 1e9
      val landed = FileCow.currentVersion(root) - 1L // minus the create
      val ops = store.ops.get() - createOps
      Arm(if (writers == 1) "single" else s"contended$writers", latencyMs,
        writers, math.round(wall * 100) / 100.0, landed,
        math.round(landed / wall * 100) / 100.0, ops,
        math.round(ops.toDouble / landed * 100) / 100.0,
        FileCow.CommitStats.rebased.get())
    } finally CommitBackend.forced = None
  }

  /** The CROSS-TABLE TXN arm (round 16): the same serial append workload,
    * but every PAIR of appends (one to each of two tables) runs inside a
    * `GraftTransactions.run` — with the marker store riding the SAME
    * latency-injected client (it now resolves through the active
    * backend). Prices the G35 claims directly: per txn the protocol adds
    * 1 pending put + 1 decision conditional-put + 1 pending rewrite per
    * new table (2 here, first txn only), and ZERO ops per table commit. */
  private def runTxnArm(spark: SparkSession, latencyMs: Long,
      txns: Int): Arm = {
    import spark.implicits._
    val store = new LatencyObjectStore(LocalFsObjectStore, latencyMs)
    CommitBackend.forced = Some(new ConditionalPutBackend(store))
    try {
      val base = Files.createTempDirectory(s"graft-rate-txn-$latencyMs")
      val fact = base.resolve("fact").toString
      val summary = base.resolve("summary").toString
      val txnDir = base.resolve("txns").toString
      Seq(fact, summary).foreach(r => FileCow.create(spark, r,
        Seq((0L, "seed")).toDF("k", "v"), statsCols = Seq("k")))
      val createOps = store.ops.get()
      FileCow.CommitStats.reset()
      val t0 = System.nanoTime()
      (0 until txns).foreach { i =>
        graft.sources.GraftTransactions.run(spark, txnDir) {
          FileCow.append(spark, fact, Seq((1000L + i, s"t$i")).toDF("k", "v"))
          FileCow.append(spark, summary, Seq((1000L + i, s"t$i")).toDF("k", "v"))
        }
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val landed = (FileCow.currentVersion(fact) - 1L) +
        (FileCow.currentVersion(summary) - 1L)
      val ops = store.ops.get() - createOps
      Arm("txn2table", latencyMs, 1, math.round(wall * 100) / 100.0, landed,
        math.round(landed / wall * 100) / 100.0, ops,
        math.round(ops.toDouble / landed * 100) / 100.0,
        FileCow.CommitStats.rebased.get())
    } finally CommitBackend.forced = None
  }

  /** The CONTENDED-TXN arm (round 16): `writers` coordinator threads each
    * run serial cross-table txns touching ONE SHARED table plus a private
    * one. While any txn is open the shared table is gated, so a rival's
    * commit refuses ([[graft.sources.GraftOpenTransactionException]]
    * through the gate check), its txn aborts + heals, and the
    * application-level retry (the documented pattern) re-runs the whole
    * txn — this arm measures what that serialization actually costs:
    * aggregate committed-txns/s and the refusal count, with every retry's
    * store ops honestly in the bill. */
  private def runTxnContendArm(spark: SparkSession, latencyMs: Long,
      writers: Int, txnsEach: Int): Arm = {
    import spark.implicits._
    val store = new LatencyObjectStore(LocalFsObjectStore, latencyMs)
    CommitBackend.forced = Some(new ConditionalPutBackend(store))
    try {
      val base = Files.createTempDirectory(s"graft-rate-txc-$latencyMs")
      val shared = base.resolve("shared").toString
      val owns = (0 until writers).map(w => base.resolve(s"own$w").toString)
      (shared +: owns).foreach(r => FileCow.create(spark, r,
        Seq((0L, "seed")).toDF("k", "v"), statsCols = Seq("k")))
      val txnDir = base.resolve("txns").toString
      val createOps = store.ops.get()
      val refusals = new java.util.concurrent.atomic.AtomicLong(0L)
      FileCow.CommitStats.reset()
      val t0 = System.nanoTime()
      val threads = (0 until writers).map { w =>
        new Thread(() => (0 until txnsEach).foreach { i =>
          var landedTxn = false
          while (!landedTxn) {
            try {
              graft.sources.GraftTransactions.run(spark, txnDir) {
                // SHARED FIRST: the gate on the shared table is held for
                // the rest of the txn (the adversarial shape — a pipeline
                // stamping its fact table before its private summaries),
                // so rival txns actually collide with a LIVE gate
                FileCow.append(spark, shared,
                  Seq((1000000L * (w + 1) + i, s"w$w-$i")).toDF("k", "v"))
                FileCow.append(spark, owns(w),
                  Seq((1000000L * (w + 1) + i, s"w$w-$i")).toDF("k", "v"))
              }
              landedTxn = true
            } catch {
              case _: graft.sources.GraftOpenTransactionException =>
                refusals.incrementAndGet()
                Thread.sleep(25L) // the rival's decision is ~1 RTT away
              case _: graft.sources.GraftTransactionAbortedException =>
                refusals.incrementAndGet() // stale-broken: same retry path
            }
          }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val wall = (System.nanoTime() - t0) / 1e9
      val landed = writers.toLong * txnsEach // every txn eventually lands
      // sanity from the artifacts: the shared table carries one append per txn
      require(FileCow.read(spark, shared).count() == landed + 1L,
        s"lost or duplicated txn appends on the shared table")
      val ops = store.ops.get() - createOps
      Arm(s"txncontend$writers", latencyMs, writers,
        math.round(wall * 100) / 100.0, landed,
        math.round(landed / wall * 100) / 100.0, ops,
        math.round(ops.toDouble / landed * 100) / 100.0,
        FileCow.CommitStats.rebased.get(), refusals.get())
    } finally CommitBackend.forced = None
  }

  def main(args: Array[String]): Unit = {
    val latencyMs = args.headOption.map(_.toLong).getOrElse(30L)
    val writers = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val commitsEach = args.drop(2).headOption.map(_.toInt).getOrElse(24)
    val spark = StressMultiWriter.session(8, "graft-commit-rate")
    try {
      val arms = Seq(
        runArm(spark, 0L, 1, commitsEach * 2),        // control: protocol + Spark only
        runArm(spark, latencyMs, 1, commitsEach * 2), // the RTT-priced serial rate
        runArm(spark, latencyMs, writers, commitsEach), // contention + rebase
        runTxnArm(spark, latencyMs, commitsEach),     // cross-table txn pricing
        runTxnContendArm(spark, latencyMs, 2, commitsEach / 2)) // gated rivals
      val single0 = arms(0); val singleL = arms(1)
      // marginal store time per commit isolates the protocol from Spark:
      // (wall_L - wall_0) / commits = ops/commit × L (if the budget holds)
      val marginalOps =
        if (latencyMs == 0L) 0.0
        else (singleL.wallSec - single0.wallSec) / singleL.landed /
          (latencyMs / 1000.0)
      def j(a: Arm) = s"""{"label":"${a.label}","latencyMs":${a.latencyMs},""" +
        s""""writers":${a.writers},"wallSec":${a.wallSec},"landed":${a.landed},""" +
        s""""commitsPerSec":${a.commitsPerSec},"storeOps":${a.storeOps},""" +
        s""""opsPerCommit":${a.opsPerCommit},"rebased":${a.rebased},""" +
        s""""refusals":${a.refusals}}"""
      println(s"""{"tool":"commitrate","latencyMs":$latencyMs,""" +
        s""""arms":[${arms.map(j).mkString(",")}],""" +
        s""""marginalOpsPerCommit":${math.round(marginalOps * 100) / 100.0}}""")
    } finally spark.stop()
  }
}
