package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev tool: empirical per-stage attribution for one or more registry
  * queries (guide §1 — decide whether time goes to shuffle, compute, or
  * scheduling before touching anything). Runs each query once at sf0.001
  * (warm-up, untimed) then `reps` times at sfDir, printing per-stage wall
  * duration, task count, total task time, shuffle read/write bytes for the
  * LAST rep, plus job count and end-to-end seconds per rep.
  *
  * Usage: runMain graft.tools.ProfileQuery <q1,q2,...> [sfDir] [reps]
  */
object ProfileQuery {
  final case class StageRow(
      id: Int, name: String, tasks: Int, wallMs: Long, taskMs: Long,
      shufReadMB: Double, shufWriteMB: Double, inputMB: Double, gcMs: Long)

  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // Experiment hook: SPARK_GRAFT_PROF_CONF="k=v;k=v" extra session confs.
    sys.env.get("SPARK_GRAFT_PROF_CONF").foreach(_.split(';').filter(_.nonEmpty)
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stages = mutable.ArrayBuffer[StageRow]()
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {a <- si.completionTime; b <- si.submissionTime} yield a - b).getOrElse(-1L)
        val m = si.taskMetrics
        stages += StageRow(si.stageId, si.name.takeWhile(_ != '\n').take(90),
          si.numTasks, wall, m.executorRunTime,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          m.inputMetrics.bytesRead / 1e6, m.jvmGCTime)
      }
    }

    val all = graft.SparkEntry.queries
    names.foreach { n =>
      val fn = all(n)
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case e: Throwable => System.err.println(s"[prof] warmup $n: ${e.getMessage}") }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc(); Thread.sleep(150)
      for (r <- 1 to reps) {
        stages.clear(); jobs = 0
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let the listener bus drain
        spark.sparkContext.removeSparkListener(listener)
        println(f"[prof] ===== $n rep $r: $sec%.2f s, $jobs jobs, ${stages.size} stages, " +
          f"stage-wall-sum ${stages.map(_.wallMs).sum / 1e3}%.2f s =====")
        if (r == reps)
          stages.sortBy(-_.wallMs).take(28).foreach { s =>
            println(f"[prof]   stage ${s.id}%4d ${s.wallMs}%6d ms wall ${s.taskMs}%7d ms task " +
              f"${s.tasks}%3d tasks gc=${s.gcMs}%5d in=${s.inputMB}%7.1f MB sr=${s.shufReadMB}%7.2f sw=${s.shufWriteMB}%7.2f  ${s.name}")
          }
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        System.gc(); Thread.sleep(150)
      }
    }
    spark.stop()
  }
}
