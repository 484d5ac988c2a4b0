package graft

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.FileCow
import graft.streaming.CdfSourceProvider

/** F19: the cow change feed as a streaming source. Claims under test: the
  * genesis batch bootstraps the full table as inserts, every later commit
  * arrives tagged with its version and bit-equal to the batch CDF,
  * checkpoint recovery resumes at the committed version (no replay, no
  * loss — offsets ARE versions), and a default-start stream sees only
  * commits after its birth.
  */
class CdfStreamSpec extends SparkSpec {

  private type FeedRow = (Long, Long, String, String, Long)

  private def mkTable(): String = {
    val root = Files.createTempDirectory("f19").resolve("t").toString
    val base = spark.range(1, 101).select(col("id"), (col("id") % 7).as("grp"),
      concat(lit("v"), col("id")).as("payload"))
    FileCow.create(spark, root, base.repartitionByRange(4, col("id")), Seq("id"))
    root
  }

  private def rows(df: DataFrame): Set[FeedRow] =
    df.collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("grp"),
      r.getAs[String]("payload"), r.getAs[String]("_change_type"),
      r.getAs[Long]("_commit_version"))).toSet

  private def expectedFeed(root: String, from: Long, to: Long): Set[FeedRow] =
    (from until to).flatMap { v =>
      rows(FileCow.changesBetween(spark, root, Seq("id"), v, v + 1)
        .withColumn("_commit_version", lit(v + 1)))
    }.toSet

  private def startStream(root: String, ckpt: String, sink: mutable.Set[FeedRow],
      startingVersion: Option[Long]) = {
    val reader = spark.readStream.format(classOf[CdfSourceProvider].getName)
      .option("root", root).option("keys", "id")
    val stream = startingVersion.fold(reader)(v =>
      reader.option("startingVersion", v.toString)).load()
    stream.writeStream
      .foreachBatch((b: DataFrame, _: Long) => { sink.synchronized { sink ++= rows(b) }; () })
      .option("checkpointLocation", ckpt)
      .start()
  }

  test("F19 genesis + per-commit deltas + checkpoint recovery at version granularity") {
    val root = mkTable()
    val ckpt = Files.createTempDirectory("f19-ck").toString
    val got = mutable.Set.empty[FeedRow]

    val q = startStream(root, ckpt, got, startingVersion = Some(0L))
    try {
      q.processAllAvailable()
      // genesis: the whole v1 table as inserts tagged _commit_version 1
      assert(got.size == 100 && got.forall { case (_, _, _, t, v) => t == "insert" && v == 1L })

      FileCow.merge(spark, root, spark.range(5, 8).select(col("id"),
        lit(99L).as("grp"), lit("UPD").as("payload"))
        .unionByName(spark.range(201, 204).select(col("id"), lit(0L).as("grp"),
          lit("NEW").as("payload"))), Seq("id")) // v2
      FileCow.delete(spark, root, col("id") > 90 && col("id") < 200) // v3
      q.processAllAvailable()

      val expected =
        rows(FileCow.readVersion(spark, root, 1L)
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_version", lit(1L))) ++ expectedFeed(root, 1L, 3L)
      assert(got.toSet == expected)
    } finally q.stop()

    // table advances while the stream is down…
    FileCow.update(spark, root, Seq("payload" -> lit("X")), col("id") <= 3) // v4
    val got2 = mutable.Set.empty[FeedRow]
    val q2 = startStream(root, ckpt, got2, startingVersion = Some(0L))
    try {
      q2.processAllAvailable()
      // …recovery delivers EXACTLY the missed commit: no replay, no loss
      assert(got2.toSet == expectedFeed(root, 3L, 4L))
      assert(got2.forall(_._5 == 4L))
    } finally q2.stop()
  }

  test("F19 the birth version is pinned in checkpoint metadata: recreation cannot move it") {
    val root = mkTable() // v1
    val metaDir = Files.createTempDirectory("f19-meta").toString
    val provider = new CdfSourceProvider
    val params = Map("root" -> root, "keys" -> "id")
    val s1 = provider.createSource(spark.sqlContext, metaDir, None, "graft-cdf", params)
      .asInstanceOf[graft.streaming.CdfSource]
    assert(s1.startVersion == 1L)
    // the table moves; a WAL-replay recreation must NOT re-resolve "current"
    FileCow.delete(spark, root, col("id") <= 5) // v2
    val s2 = provider.createSource(spark.sqlContext, metaDir, None, "graft-cdf", params)
      .asInstanceOf[graft.streaming.CdfSource]
    assert(s2.startVersion == 1L, "recreated source must keep the pinned birth version")
    // a FRESH checkpoint resolves against the moved table
    val s3 = provider.createSource(spark.sqlContext,
      Files.createTempDirectory("f19-meta2").toString, None, "graft-cdf", params)
      .asInstanceOf[graft.streaming.CdfSource]
    assert(s3.startVersion == 2L)
  }

  test("F19 default start is the stream's birth version: history does not replay") {
    val root = mkTable()
    FileCow.delete(spark, root, col("id") <= 10) // v2, before the stream exists
    val ckpt = Files.createTempDirectory("f19b-ck").toString
    val got = mutable.Set.empty[FeedRow]
    val q = startStream(root, ckpt, got, startingVersion = None)
    try {
      q.processAllAvailable()
      assert(got.isEmpty, "no new commits yet — nothing must stream")
      FileCow.merge(spark, root, spark.range(500, 503).select(col("id"),
        lit(1L).as("grp"), lit("n").as("payload")), Seq("id")) // v3
      q.processAllAvailable()
      assert(got.toSet == expectedFeed(root, 2L, 3L))
    } finally q.stop()
  }
}
