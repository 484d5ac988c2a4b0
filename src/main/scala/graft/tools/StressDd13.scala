package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Boilerplate stress harness for dd13's containment df-cap — the same
  * falsification exercise StressDd04 ran for dd04's candidate-plan router,
  * aimed at the cap instead of the router.
  *
  * dd13 bounds candidate fan-out by DROPPING shingles whose document
  * frequency exceeds the cap (default [[Dedup.containmentMaxDf]] = 64):
  * unlike dd04, containment has no lossless prefix bound, so the cap is a
  * real recall trade and its cost had only been argued, not measured. This
  * harness plants the regime the cap exists for (boilerplate whose df grows
  * with N — StressDd04's fixed 12-word sentence appended to a controlled
  * fraction of documents) and measures, per stress fraction, BOTH sides of
  * the trade to full materialization:
  *
  *   - cost: wall seconds of the capped vs the UNCAPPED plan (uncapped =
  *     maxDf Int.MaxValue, which skips the df window pass entirely, so the
  *     cap's own overhead — one tok-keyed window — is charged to the capped
  *     arm only), plus the uncapped candidate-join volume Σ df².
  *   - recall: pairs the capped plan loses vs the uncapped stressed truth,
  *     split into `dropped_organic` (pairs ALSO present in the 0%-stress
  *     uncapped ground truth — genuine content near-dups lost, the real
  *     recall cost) and `dropped_boiler` (pairs whose ≥ 0.5 containment
  *     EXISTS ONLY because of planted boilerplate — false merges the cap is
  *     SUPPOSED to refuse; dropping them is precision, not loss).
  *
  * The organic/boiler split is exact by construction: boilerplate is
  * appended (never replaces text), so a pair's organic overlap is unchanged
  * by stressing — any dropped pair absent from the organic truth owes its
  * qualifying overlap to the planted sentence.
  *
  * Output: one JSON line per (stress %, plan) with seconds, pair counts and
  * the drop decomposition; SCALING.md carries the adjudicated table.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir with documents.parquet>
  *        runMain graft.tools.StressDd13 [fractions…  default: 0 2 10 30]
  */
object StressDd13 {

  private def pairKeys(df: DataFrame): DataFrame = df.select("id_a", "id_b")

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

    // Organic ground truth: UNCAPPED pairs on the clean corpus. Small
    // (pair-set-sized), kept checkpointed for the per-fraction recall split.
    val organic = Dedup.containmentPairs(
      StressDd04.stressedShingles(docs, 0), maxDf = Int.MaxValue)
      .select("id_a", "id_b").localCheckpoint()
    val nOrganic = organic.count()

    // docs + organic must survive the whole run; everything checkpointed
    // after this point is per-iteration scratch. (Dataset.unpersist does not
    // release localCheckpoint RDDs — they live in getPersistentRDDs.)
    val keep = spark.sparkContext.getPersistentRDDs.keySet

    for (pct <- fractions) {
      val sh = StressDd04.stressedShingles(docs, pct * 10).localCheckpoint()
      // uncapped candidate-join volume: Σ df² — measured, not estimated.
      val joinRows = sh.select(explode(col("shs")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("df"))
        .agg(sum(col("df") * col("df"))).head().getLong(0)

      def timed(maxDf: Int): (DataFrame, Long, Double) = {
        val t0 = System.nanoTime()
        val res = Dedup.containmentPairs(sh, maxDf).localCheckpoint() // eager: forces full materialization
        val n = res.count()
        (res, n, (System.nanoTime() - t0) / 1e9)
      }

      val (capped, nCapped, tCapped) = timed(Dedup.containmentMaxDf)
      val (uncapped, nUncapped, tUncapped) = timed(Int.MaxValue)

      // Drop decomposition (off the clock): lost = uncapped \ capped, split
      // by membership in the organic truth.
      val lost = pairKeys(uncapped).except(pairKeys(capped)).localCheckpoint()
      val nLost = lost.count()
      val nLostOrganic = lost.join(organic, Seq("id_a", "id_b"), "left_semi").count()
      val nLostBoiler = nLost - nLostOrganic

      println(f"""{"sf":"$sfDir","n_docs":$nDocs,"stress_pct":$pct,"join_rows":$joinRows,"organic_pairs":$nOrganic,"capped_pairs":$nCapped,"uncapped_pairs":$nUncapped,"sec_capped":$tCapped%.2f,"sec_uncapped":$tUncapped%.2f,"dropped":$nLost,"dropped_organic":$nLostOrganic,"dropped_boiler":$nLostBoiler}""")

      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => keep(id) }
        .values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    spark.stop()
  }
}
