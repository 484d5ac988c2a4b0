package graft.tools

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{FileCow, MaterializedAgg}

/** Measures G20's claim — an incremental view refresh costs O(changed data
  * + view), a full recompute costs O(table) — across table decades. Per
  * size: build a cow table + initialize the grouped view, apply the SAME
  * narrow 1000-row upsert, then time (a) `MaterializedAgg.refresh` (feed
  * from unshared files → signed-delta fold) vs (b) the full re-aggregate
  * of the current table. Expected: refresh flat, recompute grows.
  *
  * Usage: dev/jrun.sh graft.tools.StressIvm [rowCounts…]
  */
object StressIvm {

  private def rmTree(p: Path): Unit = if (Files.exists(p)) {
    val walk = Files.walk(p)
    try walk.sorted(java.util.Comparator.reverseOrder()).forEach(f => Files.delete(f))
    finally walk.close()
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
                else Seq(1000000L, 10000000L, 100000000L)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = Paths.get("/tmp/stress-ivm")
    rmTree(work)

    for (n <- sizes) {
      val src = work.resolve(s"src-$n").toString
      val vw = work.resolve(s"view-$n").toString
      val nFiles = math.max(8L, n / 250000L).toInt
      val base = spark.range(0L, n).select(col("id"),
        (col("id") % 1000).as("grp"), (col("id") % 97).as("v"))
      FileCow.create(spark, src, base.repartitionByRange(nFiles, col("id")), Seq("id"))
      MaterializedAgg.initialize(spark, src, vw, Seq("grp"), Seq("v"))

      FileCow.merge(spark, src, spark.range(0L, 1000L).select(col("id"),
        (col("id") % 1000).as("grp"), lit(-5L).as("v")), Seq("id"))

      def timed[T](body: => T): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      val sRefresh = timed(
        MaterializedAgg.refresh(spark, src, vw, Seq("id"), Seq("grp"), Seq("v")))
      val sFull = timed(
        FileCow.read(spark, src).groupBy("grp")
          .agg(count(lit(1)).as("n_rows"), sum("v").as("sum_v"))
          .write.mode("overwrite").parquet(work.resolve(s"full-$n").toString))
      // equality audit: the incremental view equals the recompute
      val viewRows = MaterializedAgg.read(spark, vw)
        .select("grp", "n_rows", "sum_v").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val fullRows = spark.read.parquet(work.resolve(s"full-$n").toString)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      require(viewRows == fullRows, s"IVM drifted from recompute at n=$n")
      println(f"""{"n":$n,"files":$nFiles,"refresh_sec":$sRefresh%.2f,"recompute_sec":$sFull%.2f,"groups":${viewRows.size}}""")
      rmTree(Paths.get(src)); rmTree(Paths.get(vw)); rmTree(work.resolve(s"full-$n"))
      System.gc()
    }
    spark.stop()
  }
}
