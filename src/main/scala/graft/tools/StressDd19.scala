package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Boilerplate stress harness for dd19's window df-cap — StressDd13's
  * exercise applied to the repeated-span join: the stride-1 window
  * self-join's structural hazard is a window whose df grows with N (site
  * chrome, license blocks), fanning out df² match rows PER WINDOW POSITION.
  * dd19 drops windows with df > 16; this measures what that costs and
  * buys, to full materialization, per planted boilerplate fraction:
  *
  *  - cost: wall seconds capped vs UNCAPPED (maxDf = Int.MaxValue skips
  *    the df pass, so the cap's one window-keyed aggregate is charged to
  *    the capped arm);
  *  - effect: span counts, with dropped spans split into `dropped_organic`
  *    (also present in the 0%-stress uncapped truth — genuine repeated
  *    content lost) and `dropped_boiler` (spans existing only because of
  *    the planted block — the false merges the cap exists to refuse).
  *
  * The split is exact by construction: the boilerplate block is APPENDED,
  * so every organic span keeps its exact (id_a, id_b, start_a, start_b)
  * key under stress, and any dropped span absent from the organic truth
  * owes its existence to the plant.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> dev/jrun.sh graft.tools.StressDd19 [pcts…]
  */
object StressDd19 {

  private val boiler = (0 until 25).map(i => s"boilerplate$i").mkString(" ")

  private def stressed(docs: DataFrame, pctTimes10: Int): DataFrame =
    if (pctTimes10 == 0) docs
    else docs.withColumn("c",
      when(pmod(col("doc_id"), lit(1000)) < pctTimes10,
        concat(col("c"), lit(" " + boiler))).otherwise(col("c")))

  private def spanKeys(df: DataFrame): DataFrame =
    df.select("id_a", "id_b", "start_a", "start_b")

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
      .select(col("doc_id"),
        graft.functions.TextPrep.clean(col("text")).as("c"))
      .localCheckpoint()
    val organicTruth = spanKeys(
      Dedup.repeatedSpansFrom(docs, Int.MaxValue)).localCheckpoint()
    val keep = spark.sparkContext.getPersistentRDDs.keySet

    for (pct <- fractions) {
      val d = stressed(docs, pct * 10).localCheckpoint()
      val results = for ((plan, maxDf) <- Seq("capped" -> 16, "uncapped" -> Int.MaxValue)) yield {
        val t0 = System.nanoTime()
        val spans = spanKeys(Dedup.repeatedSpansFrom(d, maxDf)).localCheckpoint()
        val n = spans.count()
        val sec = (System.nanoTime() - t0) / 1e9
        (plan, spans, n, sec)
      }
      val Seq((_, capped, nCap, sCap), (_, uncapped, nUnc, sUnc)) = results
      val dropped = uncapped.exceptAll(capped).localCheckpoint()
      val droppedOrganic = dropped.intersect(organicTruth).count()
      val droppedTotal = dropped.count()
      println(f"""{"sf":"$sfDir","stress_pct":$pct,"capped_sec":$sCap%.2f,"uncapped_sec":$sUnc%.2f,"capped_spans":$nCap,"uncapped_spans":$nUnc,"dropped_total":$droppedTotal,"dropped_organic":$droppedOrganic,"dropped_boiler":${droppedTotal - droppedOrganic}}""")
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => keep(id) }
        .values.foreach(_.unpersist(blocking = false))
      System.gc()
    }
    spark.stop()
  }
}
