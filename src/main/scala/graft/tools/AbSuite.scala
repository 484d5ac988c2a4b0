package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: PAIRED A/B timing for MANY registry queries under two session
  * conf SETS — [[AbTest]] generalized to full-suite paired mode (VERDICT r16
  * item 7). For each query the arms run interleaved A,B,A,B,… in ONE JVM so
  * this host's multi-minute ±50% noise waves hit both arms equally; the
  * report is the per-query MEDIAN of per-pair deltas plus arm totals, so a
  * single full run gives a mechanical regression call per query.
  *
  * Arms are semicolon-separated conf lists (`k=v;k=v`), `-` for "defaults
  * only" — so an arm can flip several knobs at once (e.g. the rescue +
  * the CC loop codegen toggle = "the r16 plan" vs "the r17 plan") and the
  * round-close comparison becomes one paired run instead of two unpaired
  * bench invocations separated by minutes of host drift.
  *
  * Usage: runMain graft.tools.AbSuite <confsA> <confsB> [pairs] [sfDir] [only]
  *   only = comma-separated query subset (default: the whole registry)
  */
object AbSuite {
  def main(args: Array[String]): Unit = {
    def parse(s: String): Seq[(String, String)] =
      if (s == "-") Nil
      else s.split(';').filter(_.nonEmpty).toSeq.map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }
    val armA = parse(args(0)); val armB = parse(args(1))
    val pairs = if (args.length > 2) args(2).toInt else 2
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val only = if (args.length > 4) Some(args(4).split(',').toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ordered = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    // Warm-up pass (JIT/codegen/file-index), untimed, default confs.
    ordered.foreach { case (n, fn) =>
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case e: Throwable => System.err.println(s"[absuite] warmup $n: ${e.getMessage}") }
    }
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))

    def withArm[A](arm: Seq[(String, String)])(f: => A): A = {
      val saved = arm.map { case (k, _) => k -> spark.conf.getOption(k) }
      arm.foreach { case (k, v) => spark.conf.set(k, v) }
      try f
      finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }

    var totA = 0.0; var totB = 0.0
    val perQuery = ordered.map { case (name, fn) =>
      def once(arm: Seq[(String, String)]): Double = withArm(arm) {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val s = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        System.gc(); Thread.sleep(100)
        s
      }
      val runs = (1 to pairs).map { _ => (once(armA), once(armB)) }
      val deltas = runs.map { case (a, b) => b - a }.sorted
      val med = deltas(deltas.length / 2)
      val sumA = runs.map(_._1).sum; val sumB = runs.map(_._2).sum
      totA += sumA / pairs; totB += sumB / pairs
      println(f"[absuite] $name%-28s A=${sumA / pairs}%6.2f B=${sumB / pairs}%6.2f medΔ=$med%+7.3f")
      name -> med
    }
    val worst = perQuery.sortBy(-_._2).take(8)
      .map { case (n, d) => f"$n $d%+.2f" }.mkString(", ")
    val best = perQuery.sortBy(_._2).take(8)
      .map { case (n, d) => f"$n $d%+.2f" }.mkString(", ")
    println(f"[absuite] TOTAL A=$totA%.1f s  B=$totB%.1f s  (B-A)=${totB - totA}%+.1f s over ${perQuery.size} queries x $pairs pairs")
    println(s"[absuite] most regressed (B vs A): $worst")
    println(s"[absuite] most improved (B vs A): $best")
    spark.stop()
  }
}
