package graft.tools

import java.nio.file.{Files, Path, Paths}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.FileCow

/** Measures the cow TABLE-AS-A-STREAM catch-up claim: a stream recovering
  * a backlog of K append commits costs O(backlog rows), INDEPENDENT of
  * table size, because the source resolves each commit's added files from
  * the commit log and reads only those — no manifest diff, no table scan.
  * Three arms per table size, same 20-commit × 5k-row backlog each time:
  *
  *  - `catchup`: readStream.format("graft-cow") drains the backlog in one
  *    batch. Expected: wall time FLAT across table decades.
  *  - `catchup_rate4`: same with maxVersionsPerTrigger=4 — five bounded
  *    batches instead of one. Expected: same order of wall time (the cap
  *    bounds PEAK batch size, the per-batch stream machinery is the only
  *    overhead), still table-size-independent.
  *  - `rescan`: the naive comparator — re-reading the whole table once,
  *    what a refresh without a commit log pays. Expected: grows with the
  *    table; the widening gap is the feature.
  *
  * Usage: dev/jrun.sh graft.tools.StressTableStream [rowCounts…]
  */
object StressTableStream {

  private def rmTree(p: Path): Unit = if (Files.exists(p)) {
    val walk = Files.walk(p)
    try walk.sorted(java.util.Comparator.reverseOrder()).forEach(f => Files.delete(f))
    finally walk.close()
  }

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

    val work = Paths.get("/tmp/stress-tablestream")
    rmTree(work)
    val Commits = 20
    val RowsPerCommit = 5000L

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = body; (r, (System.nanoTime() - t0) / 1e9)
    }

    for (n <- sizes) {
      val root = work.resolve(s"t-$n").toString
      val nFiles = math.max(8L, n / 250000L).toInt
      val base = spark.range(0L, n).select(col("id"),
        (col("id") % 97).as("grp"), md5(col("id").cast("string")).as("payload"))
      FileCow.create(spark, root, base.repartitionByRange(nFiles, col("id")),
        statsCols = Seq("id"))
      val birth = FileCow.currentVersion(root) // streams start here: no genesis

      // the backlog: 20 append commits of 5k fresh keys each
      (0 until Commits).foreach { i =>
        val lo = n + i * RowsPerCommit
        FileCow.append(spark, root, spark.range(lo, lo + RowsPerCommit)
          .select(col("id"), lit(-1L).as("grp"), lit("NEW").as("payload")))
      }

      def drain(maxPerTrigger: Option[Int]): (Long, Long, Double) = {
        val got = new java.util.concurrent.atomic.AtomicLong(0L)
        val batches = mutable.ArrayBuffer.empty[Long]
        val reader = spark.readStream.format("graft-cow")
          .option("root", root).option("startingVersion", birth.toString)
        val q = maxPerTrigger.fold(reader)(m =>
            reader.option("maxVersionsPerTrigger", m.toString))
          .load().writeStream
          .foreachBatch { (b: DataFrame, _: Long) =>
            val c = b.count(); got.addAndGet(c)
            batches.synchronized { batches += c }
            ()
          }
          .option("checkpointLocation",
            Files.createTempDirectory("sts-ck").toString)
          .start()
        val (_, sec) = timed(q.processAllAvailable())
        q.stop()
        (got.get(), batches.count(_ > 0).toLong, sec)
      }

      val (rows1, batches1, sCatchup) = drain(None)
      require(rows1 == Commits * RowsPerCommit, s"catchup lost rows: $rows1")
      val (rows2, batches2, sRate) = drain(Some(4))
      require(rows2 == Commits * RowsPerCommit, s"rate-limited lost rows: $rows2")
      // a real data scan, not count() (parquet answers count from footers)
      val (_, sRescan) = timed(FileCow.read(spark, root)
        .agg(sum(length(col("payload")))).collect())

      println(f"""{"n":$n,"files":$nFiles,"backlog_commits":$Commits,"backlog_rows":${Commits * RowsPerCommit},"catchup_sec":$sCatchup%.2f,"catchup_batches":$batches1,"catchup_rate4_sec":$sRate%.2f,"catchup_rate4_batches":$batches2,"rescan_sec":$sRescan%.2f}""")
      rmTree(Paths.get(root))
      System.gc()
    }
    spark.stop()
  }
}
