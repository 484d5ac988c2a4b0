package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan for one registry query and
  * time N executions — the explain-driven tuning loop from SURVEY §6.
  * Usage: runMain graft.Explain <queryName> [sfDir] [reps]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).explain("formatted")
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[explain] run $r: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
