package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Mass-duplicate stress harness for dd02's two candidate plans — the third
  * falsification exercise in the StressDd04/StressDd13 series, aimed at the
  * regime LSH banding cannot bound: classes of BYTE-IDENTICAL documents.
  *
  * A real web corpus has classes of thousands of identical documents (empty
  * pages, license pages, error boilerplate). Every member of a class of
  * size m shares all 4 band keys, so the default band self-join forms 4·m²
  * candidate rows per class and verifies m(m-1)/2 pairs carrying BOTH full
  * shingle arrays — quadratic per class, with df-style capping unavailable
  * (dropping the band key would drop the true jaccard-1.0 pairs the
  * contract demands). The renamed synthetic corpus bounds this away by
  * construction (constant dup RATE, constant class size), so the regime is
  * CREATED here: a controlled fraction of documents has its shingle set
  * replaced by one of K = 50 shared class contents (deterministic by
  * doc_id), and both plans run to full materialization.
  *
  * Output: one JSON line per (fraction, plan) with wall seconds, intra-pair
  * count (the separating statistic the router probes), and the pair count —
  * asserted equal across plans, so the harness doubles as a scale-level
  * equivalence check. SCALING.md carries the adjudicated table; the
  * measured crossover sets [[Dedup.lshClassedMinIntraPairs]].
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir with documents.parquet>
  *        runMain graft.tools.StressDd02 [fractions…  default: 0 2 10 30]
  */
object StressDd02 {

  private val K = 50 // distinct mass-dup classes planted

  /** Shingle table with a `pct`% mass-dup fraction: affected docs get the
    * shingle set of one of K base docs (class = doc_id mod K). */
  def stressedShingles(sh: DataFrame, pctTimes10: Int): DataFrame = {
    if (pctTimes10 == 0) return sh
    val content = sh.orderBy("doc_id").limit(K)
      .select(col("shs").as("content"))
      .withColumn("cls", monotonically_increasing_id().cast("int"))
    val stressed = sh
      .filter(pmod(col("doc_id"), lit(1000)) < pctTimes10)
      .withColumn("cls", pmod(col("doc_id"), lit(K)).cast("int"))
      .join(broadcast(content), "cls")
      .select(col("doc_id"), col("content").as("shs"))
    sh.filter(pmod(col("doc_id"), lit(1000)) >= pctTimes10)
      .select("doc_id", "shs")
      .unionByName(stressed)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val fractions = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(0, 2, 10, 30)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), graft.functions.WordShingles3.shingles3(
        graft.functions.TextPrep.clean(col("text"))).as("shs"))
      .localCheckpoint()
    val nDocs = docs.count()
    val keep = spark.sparkContext.getPersistentRDDs.keySet

    for (pct <- fractions) {
      val sh = stressedShingles(docs, pct * 10).localCheckpoint()
      // the router's separating statistic, measured on the stressed corpus
      val intraPairs = sh.select(xxhash64(array_sort(col("shs"))).as("h"))
        .groupBy("h").agg(count(lit(1)).as("m"))
        .agg(coalesce(sum(expr("m * (m - 1) DIV 2")), lit(0L))).head().getLong(0)

      val counts = for ((plan, fn) <- Seq(
          "default" -> ((d: DataFrame) => Dedup.lshPairsFrom(d)),
          "classed" -> ((d: DataFrame) => Dedup.lshPairsClassed(d)))) yield {
        val t0 = System.nanoTime()
        val n = fn(sh).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"sf":"$sfDir","n_docs":$nDocs,"stress_pct":$pct,"plan":"$plan","intra_pairs":$intraPairs,"pairs":$n,"sec":$sec%.2f}""")
        n
      }
      require(counts.distinct.size == 1,
        s"PLAN DIVERGENCE at $pct%: ${counts.mkString(" vs ")}")

      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => keep(id) }
        .values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    spark.stop()
  }
}
