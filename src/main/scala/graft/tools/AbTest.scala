package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: PAIRED A/B timing for one registry query under a session conf
  * toggle, interleaved A,B,A,B,… in ONE JVM so multi-minute host-noise waves
  * hit both arms equally (this box shows ±50% waves; unpaired runs are
  * useless for <30% effects). Prints per-pair times and the median of the
  * per-pair deltas.
  *
  * Usage: runMain graft.tools.AbTest <query> <confKey> <valA> <valB> [pairs] [sfDir]
  */
object AbTest {
  def main(args: Array[String]): Unit = {
    val name = args(0); val key = args(1); val va = args(2); val vb = args(3)
    val pairs = if (args.length > 4) args(4).toInt else 4
    val sfDir = if (args.length > 5) args(5) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    def once(v: String): Double = {
      spark.conf.set(key, v)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val s = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc(); Thread.sleep(150)
      s
    }
    try { once(va); once(vb) } catch { case e: Throwable => System.err.println(e.getMessage) } // warmup both arms
    val deltas = (1 to pairs).map { i =>
      val a = once(va); val b = once(vb)
      println(f"[ab] pair $i: A=$a%6.2f s  B=$b%6.2f s  (B-A)=${b - a}%+6.2f")
      b - a
    }.sorted
    val med = deltas(deltas.length / 2)
    println(f"[ab] $name $key A=$va B=$vb: median(B-A) = $med%+6.3f s over $pairs pairs")
    spark.stop()
  }
}
