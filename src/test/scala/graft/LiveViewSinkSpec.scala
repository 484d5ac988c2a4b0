package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{FileCow, MaterializedAgg, Versioned}
import graft.streaming.{CdfSourceProvider, LiveViewSink}

/** F21: the live materialized view — the CDF stream driving G20's fold per
  * micro-batch. Claims:
  *
  *   1. after streaming a genesis + DML mix, the view equals the full
  *      recompute of the source's current version (the G20 oracle, now
  *      reached through the stream);
  *   2. a replayed micro-batch cannot double-apply (+= is not idempotent;
  *      the applied-version guard plus the G20 intent make it exactly
  *      once);
  *   3. kill + restart from the checkpoint converges to the same view;
  *   4. the fold IS MaterializedAgg.foldFeed — scheduled refresh over the
  *      same source produces the identical view (twin parity).
  */
class LiveViewSinkSpec extends SparkSpec {

  private def recompute(srcRoot: String): Set[(Long, Long, Long)] =
    FileCow.read(spark, srcRoot).groupBy("grp")
      .agg(count(lit(1)).as("n_rows"), sum("amt").as("sum_amt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def viewRows(viewRoot: String): Set[(Long, Long, Long)] =
    MaterializedAgg.read(spark, viewRoot)
      .collect().map(r => (r.getAs[Long]("grp"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("sum_amt"))).toSet

  private def mkSource(): String = {
    val root = Files.createTempDirectory("f21").resolve("t").toString
    FileCow.create(spark, root,
      spark.range(1, 201).select(col("id").as("k"), (col("id") % 5).as("grp"),
        col("id").as("amt")).repartitionByRange(4, col("k")),
      statsCols = Seq("k"))
    root
  }

  private def cdf(root: String): DataFrame =
    spark.readStream.format(classOf[CdfSourceProvider].getName)
      .option("root", root).option("keys", "k")
      .option("startingVersion", "0").load()

  test("F21 live view == full recompute across a DML mix; restart converges") {
    val s = spark
    import s.implicits._
    val srcRoot = mkSource()
    val viewRoot = Files.createTempDirectory("f21-view").toString
    val ckpt = Files.createTempDirectory("f21-ck").toString

    val q = LiveViewSink.sink(cdf(srcRoot), viewRoot,
      groupCols = Seq("grp"), sumCols = Seq("amt"), checkpointDir = ckpt)
    try {
      q.processAllAvailable() // genesis folds v1 against the empty view
      assert(viewRows(viewRoot) == recompute(srcRoot))

      FileCow.merge(spark, srcRoot,
        Seq((5L, 0L, -100L), (500L, 2L, 500L)).toDF("k", "grp", "amt"), keys = Seq("k"))
      FileCow.delete(spark, srcRoot, col("k") <= 20)
      q.processAllAvailable()
      assert(viewRows(viewRoot) == recompute(srcRoot))
    } finally q.stop()

    // more DML while the stream is down, then restart from the checkpoint
    FileCow.update(spark, srcRoot, set = Seq("amt" -> lit(0L)), cond = col("grp") === 3L)
    val q2 = LiveViewSink.sink(cdf(srcRoot), viewRoot,
      groupCols = Seq("grp"), sumCols = Seq("amt"), checkpointDir = ckpt)
    try {
      q2.processAllAvailable()
      assert(viewRows(viewRoot) == recompute(srcRoot))
    } finally q2.stop()

    // twin parity: a scheduled G20 refresh finds nothing left to apply
    val (from, to) = MaterializedAgg.refresh(spark, srcRoot, viewRoot,
      keys = Seq("k"), groupCols = Seq("grp"), sumCols = Seq("amt"))
    assert(from == to, "stream left the view current; refresh is a no-op")
    assert(viewRows(viewRoot) == recompute(srcRoot))
  }

  test("F21 a replayed micro-batch cannot double-apply") {
    val s = spark
    import s.implicits._
    val srcRoot = mkSource()
    val viewRoot = Files.createTempDirectory("f21-replay").toString
    // hand-build the genesis + one commit, then replay the same feed twice
    val genesis = FileCow.readVersion(spark, srcRoot, 1L)
      .withColumn("_change_type", lit("insert"))
      .withColumn("_commit_version", lit(1L))
    LiveViewSink.foldBatch(genesis, viewRoot, Seq("grp"), Seq("amt"))
    val before = viewRows(viewRoot)
    assert(before == recompute(srcRoot))
    LiveViewSink.foldBatch(genesis, viewRoot, Seq("grp"), Seq("amt")) // replay
    assert(viewRows(viewRoot) == before, "replayed genesis must be a no-op")
    assert(Versioned.currentVersion(viewRoot) == 1L, "no redundant view version")
  }
}
