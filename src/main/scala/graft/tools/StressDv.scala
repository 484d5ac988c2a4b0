package graft.tools

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.FileCow

/** Measures DELETION VECTORS against the rewrite baseline on the shape
  * they exist for: a SMALL delete against a LARGE table.
  *
  * Arms per decade (fresh twin tables, identical data and layout):
  *   - dv: `graft.dv.enabled=true`, DELETE of ~100 scattered rows —
  *     seconds, files rewritten (must be 0), then a full-scan read to
  *     price the standing anti-join;
  *   - rewrite: the same DELETE on the stats-only twin — seconds, files
  *     rewritten (every admitted file), and the same read.
  *
  * The claim: DV delete cost is FLAT (O(deleted rows) — find the rows,
  * write a kilobyte sidecar, commit) while the rewrite arm grows with the
  * admitted data; the read-side overhead of a standing vector is one
  * broadcast anti-join.
  */
object StressDv {

  private def rmTree(p: Path): Unit = FileCow.deleteTree(p)

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

    val work = Paths.get("/tmp/stress-dv")
    rmTree(work)

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = body; (r, (System.nanoTime() - t0) / 1e9)
    }

    for (n <- sizes) {
      val nFiles = math.max(8L, n / 250000L).toInt
      val base = spark.range(0L, n).select(col("id"),
        (col("id") % 97).as("grp"), md5(col("id").cast("string")).as("payload"))
        .repartitionByRange(nFiles, col("id"))
      val dvRoot = work.resolve(s"dv-$n").toString
      val rwRoot = work.resolve(s"rw-$n").toString
      FileCow.create(spark, dvRoot, base, statsCols = Seq("id"))
      FileCow.setTableProperties(spark, dvRoot, Map("graft.dv.enabled" -> "true"))
      FileCow.create(spark, rwRoot, base, statsCols = Seq("id"))

      // ~100 scattered rows: every file's range is hit, so the rewrite arm
      // must rewrite everything while the DV arm writes one tiny sidecar
      val stride = math.max(1L, n / 100L)
      val cond = col("id") % stride === 0L

      val (cDv, sDv) = timed(FileCow.delete(spark, dvRoot, cond))
      val (cRw, sRw) = timed(FileCow.delete(spark, rwRoot, cond))
      // a SUM, not COUNT(*): the metadata-only rewrite answers COUNT from
      // the manifest on the rewrite arm (no scan at all), which would
      // compare a metadata fold against the DV arm's real scan — the read
      // price under test is scan+anti-join vs scan
      def readArm(root: String): Long =
        FileCow.read(spark, root).agg(sum(col("grp"))).collect()(0).getLong(0)
      val (nDv, sReadDv) = timed(readArm(dvRoot))
      val (nRw, sReadRw) = timed(readArm(rwRoot))
      require(nDv == nRw, s"arms disagree: $nDv vs $nRw")

      println(f"""{"n":$n,"files":$nFiles,"dv_delete_sec":$sDv%.2f,"dv_rewritten":${cDv.filesRewritten},"rw_delete_sec":$sRw%.2f,"rw_rewritten":${cRw.filesRewritten},"read_dv_sec":$sReadDv%.2f,"read_rw_sec":$sReadRw%.2f,"rows_after":$nDv}""")
      rmTree(Paths.get(dvRoot)); rmTree(Paths.get(rwRoot))
      System.gc()
    }
    spark.stop()
  }
}
