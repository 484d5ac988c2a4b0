package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Hot-shingle stress harness for dd04's two candidate plans — the
  * measurement SCALING.md's renamed synthetic corpus structurally cannot
  * produce.
  *
  * dd04's default plan self-joins the exploded shingle table: candidate
  * rows = Σ df² over shingle document frequencies. The scaling campaign's
  * corpora have bounded df (max 42 at synth-sf1), so the df² term is
  * invisible there — but a REAL web corpus has boilerplate ("all rights
  * reserved …") whose df grows with N. This harness CREATES that regime:
  * it appends one fixed boilerplate sentence to a controlled fraction of
  * documents (deterministic by doc_id) and times BOTH plans to full
  * materialization, at increasing corpus scales, printing one JSON line
  * per (scale, fraction, plan) with wall seconds and the candidate-join
  * row count.
  *
  * The boilerplate is appended (not replacing text), so stressed docs stay
  * distinct non-near-dups of each other — every cross-boilerplate
  * candidate the default plan generates is WASTED work its plan must pay
  * and the PPJoin prefix plan is designed to avoid (hot shingles rank
  * last in the df-ascending prefix order and fall out of every prefix).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir with documents.parquet>
  *        runMain graft.tools.StressDd04 [fractions…  default: 0 2 10 30]
  */
object StressDd04 {

  /** ~10 hot 3-shingles per stressed doc: a 12-word sentence. */
  private val Boilerplate =
    "all rights reserved unauthorized reproduction of this document is strictly prohibited worldwide"

  def stressedShingles(docs: DataFrame, pctTimes10: Int): DataFrame = {
    val stressed = docs.withColumn("text",
      when(pmod(col("doc_id"), lit(1000)) < pctTimes10,
        concat(col("text"), lit(" " + Boilerplate))).otherwise(col("text")))
    stressed.select(col("doc_id"),
      graft.functions.WordShingles3.shingles3(
        graft.functions.TextPrep.clean(col("text"))).as("shs"))
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
      .select("doc_id", "text").localCheckpoint()
    val nDocs = docs.count()

    for (pct <- fractions) {
      val sh = stressedShingles(docs, pct * 10).localCheckpoint()
      // candidate-join volume of the default plan: Σ df² on the distinct
      // (doc, shingle) explode — measured, not estimated.
      val joinRows = sh.select(col("doc_id"), explode(col("shs")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("df"))
        .agg(sum(col("df") * col("df"))).head().getLong(0)
      for ((plan, pf) <- Seq("default" -> false, "prefix" -> true)) {
        val t0 = System.nanoTime()
        val pairs = Dedup.ngramJaccardPairsFrom(sh, prefixFilter = pf).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"sf":"$sfDir","n_docs":$nDocs,"stress_pct":$pct,"plan":"$plan","join_rows":$joinRows,"pairs":$pairs,"sec":$sec%.2f}""")
      }
      sh.unpersist(blocking = true)
      System.gc()
    }
    spark.stop()
  }
}
