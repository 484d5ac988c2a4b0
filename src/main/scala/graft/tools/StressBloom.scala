package graft.tools

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.FileCow

/** Measures the per-file BLOOM index against the stats-only baseline on
  * the shape it exists for: a table keyed by a CONTENT HASH (md5 — every
  * file's [min, max] spans the whole domain) taking small point workloads.
  *
  *   - read arm: a 20-key IN lookup — files opened and seconds, bloom vs
  *     stats-only, across table decades;
  *   - write arm: a 100-key upsert batch (FileCow.merge) — files rewritten
  *     and seconds, bloom vs stats-only.
  *
  * The claim under measurement: with the index, both arms track the
  * BATCH's holder-file count (flat as the table grows); without it, they
  * track the TABLE's file count (growing linearly) — the difference
  * between O(batch) and O(table) at 100 TB.
  */
object StressBloom {

  private def rmTree(p: Path): Unit = FileCow.deleteTree(p)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
                else Seq(1000000L, 10000000L)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = Paths.get("/tmp/stress-bloom")
    rmTree(work)

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = body; (r, (System.nanoTime() - t0) / 1e9)
    }

    for (n <- sizes) {
      val nFiles = math.max(8L, n / 250000L).toInt
      val base = spark.range(0L, n).select(col("id"),
        md5(col("id").cast("string")).as("h"),
        (col("id") % 97).as("grp"))
        .repartitionByRange(nFiles, col("id")) // h scattered across every file
      val bRoot = work.resolve(s"bloom-$n").toString
      val cRoot = work.resolve(s"ctrl-$n").toString
      FileCow.create(spark, bRoot, base, statsCols = Seq("id", "h"),
        bloomCols = Seq("h"))
      FileCow.create(spark, cRoot, base, statsCols = Seq("id", "h"))

      // Both workloads probe CLUSTERED rows (one id-range file holds them
      // all) BY THEIR HASH — the realistic shape: data clusters by ingest
      // order, the key is a content hash. Stats on h admit every file
      // (scattered); only the sketches know which file actually holds the
      // probed rows. A spread workload would prune nothing — every file
      // would genuinely hold a key, and rewriting them all is correct.
      def hashesOf(ids: Seq[Long]) = ids.map(k =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(k.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString)
      def lookup(root: String, ids: Seq[Long]): Long =
        FileCow.read(spark, root)
          .filter(col("h").isin(hashesOf(ids): _*)).count()
      // cold pays the one-time manifest-cache load (bloom bytes included);
      // warm is the steady-state serving shape on different keys
      val (rb, sReadCold) = timed(lookup(bRoot, 100L until 120L))
      val (rb2, sReadB) = timed(lookup(bRoot, 200L until 220L))
      val (rc, sReadC) = timed(lookup(cRoot, 200L until 220L))
      require(rb == 20L && rb2 == 20L && rc == 20L, s"lookup drift: $rb $rb2 $rc")

      // write arm: a 100-key streaming-shaped upsert on the hash key
      def batch = spark.range(1000L, 1100L).select(col("id"),
        md5(col("id").cast("string")).as("h"), lit(-1L).as("grp"))
        .localCheckpoint()
      val mb = batch
      val (cB, sMergeB) = timed(FileCow.merge(spark, bRoot, mb, Seq("h")))
      val (cC, sMergeC) = timed(FileCow.merge(spark, cRoot, mb, Seq("h")))
      require(FileCow.read(spark, bRoot).filter(col("grp") === -1L).count() ==
        FileCow.read(spark, cRoot).filter(col("grp") === -1L).count())

      println(f"""{"n":$n,"files":$nFiles,"read_bloom_cold_sec":$sReadCold%.2f,"read_bloom_sec":$sReadB%.2f,"read_ctrl_sec":$sReadC%.2f,"merge_bloom_sec":$sMergeB%.2f,"merge_bloom_rewritten":${cB.filesRewritten},"merge_ctrl_sec":$sMergeC%.2f,"merge_ctrl_rewritten":${cC.filesRewritten}}""")
      rmTree(Paths.get(bRoot)); rmTree(Paths.get(cRoot))
      System.gc()
    }
    spark.stop()
  }
}
