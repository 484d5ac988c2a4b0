package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{BloomFilters, TextPrep, WordShinglesN}

/** Measurement harness for the dd18 Bloom prefilter — does the sketch
  * actually keep corpus-sized gram traffic out of the exchange, and what
  * does that buy in wall time at this scale?
  *
  * Reports, per corpus:
  *  - `train_grams`: rows the dd09 plan sends into the hit-join exchange;
  *  - `admitted`: rows the dd18 sketch admits into the same join (true hits
  *    + false positives) and the implied admit ratio;
  *  - full-materialization wall seconds for both plans, result counts
  *    asserted equal (the harness doubles as a scale-level equivalence
  *    check, like StressDd02/StressDd04/StressDd13).
  *
  * The local[N] caveat from SCALING.md applies: on one machine both plans'
  * exchanges are memory-bandwidth cheap, so the wall-time delta UNDERSTATES
  * the cluster benefit (where admitted/train_grams directly scales shuffle
  * bytes over the network). The admit ratio is the portable number.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> dev/jrun.sh graft.tools.StressDd18
  */
object StressDd18 {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Same gram table both queries build internally (re-built here so the
    // two timed runs stay self-contained, as the bench times them).
    val g = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        explode(WordShinglesN.shinglesN(TextPrep.clean(col("text")), 8)).as("gram"))
      .select(col("doc_id"), TextPrep.charHash(col("gram")).as("gh"))
      .localCheckpoint()
    val ev = g.filter(col("doc_id") % 17 === 0).select("gh").distinct().localCheckpoint()
    val nEval = ev.count()
    val trainGrams = g.filter(col("doc_id") % 17 =!= 0).count()
    val bf = BloomFilters.buildLong(ev, "gh", nEval, 0.01)
    val admitted = g.filter(col("doc_id") % 17 =!= 0)
      .filter(BloomFilters.mightContainLong(col("gh"), bf)).count()
    val trueHits = g.filter(col("doc_id") % 17 =!= 0).join(ev, "gh").count()

    def timeIt(q: graft.Q): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = q.build(spark, sfDir).count()
      (n, (System.nanoTime() - t0) / 1e9)
    }
    val (n09, s09) = timeIt(graft.operators.Dedup.dd09)
    val (n18, s18) = timeIt(graft.operators.Dedup.dd18)
    require(n09 == n18, s"PLAN DIVERGENCE: dd09=$n09 dd18=$n18")

    println(f"""{"sf":"$sfDir","eval_grams":$nEval,"train_grams":$trainGrams,"admitted":$admitted,"true_hits":$trueHits,"admit_ratio":${admitted.toDouble / trainGrams}%.4f,"dd09_sec":$s09%.2f,"dd18_sec":$s18%.2f,"rows":$n09}""")
    spark.stop()
  }
}
