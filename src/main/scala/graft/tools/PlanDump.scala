package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` for a list of registry queries to
  * `<outDir>/<name>_<tag>.txt` — the optimization rounds' plan-evidence
  * artifacts (plans/r16/...). One JVM for the whole list, bench-identical
  * session settings.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <tag> <q1,q2,...|ALL> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args(2)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all = graft.SparkEntry.queries
    val list = if (names == "ALL") all.keys.toSeq.sorted else names.split(',').toSeq
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    list.foreach { n =>
      try {
        val df = all(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${n}_$tag.txt"),
          plan.getBytes("UTF-8"))
        println(s"[plandump] wrote $n")
      } catch {
        case e: Throwable => System.err.println(s"[plandump] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
