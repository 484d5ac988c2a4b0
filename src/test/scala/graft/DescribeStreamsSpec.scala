package graft

import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.GraftTables
import graft.sources.FileCow

/** The stream-registration OPS surface + retention cap (VERDICT r13 #4):
  * `DESCRIBE STREAMS t` shows who is pinning the table's history (delivered
  * version, lag in versions/bytes, liveness, whether the registration still
  * floors vacuum), and `graft.streams.maxLagVersions` bounds how long a
  * stalled-but-checkpointed consumer can pin retention — beyond the cap it
  * stops flooring and, once retention actually reclaims its backlog, hits
  * the existing loud vacuumed-history failure instead of pinning forever. */
class DescribeStreamsSpec extends SparkSpec {

  private def mkTable(name: String): String = {
    val root = Files.createTempDirectory("ds").resolve("t").toString
    FileCow.create(spark, root,
      spark.range(0, 10).select(col("id").as("k")), Seq("k"))
    GraftTables.registerCow(name, root)
    root
  }

  private def append(root: String, from: Long, until: Long): Unit = {
    FileCow.append(spark, root, spark.range(from, until).select(col("id").as("k"))); ()
  }

  private def startStream(root: String, ckpt: String, sink: mutable.Set[Long]) =
    spark.readStream.format("graft-cow").option("root", root)
      .option("startingVersion", "0").load()
      .writeStream
      .foreachBatch((b: DataFrame, _: Long) => {
        val ks = b.select("k").collect().map(_.getLong(0))
        sink.synchronized { sink ++= ks }; ()
      })
      .option("checkpointLocation", ckpt)
      .start()

  test("DESCRIBE STREAMS: delivered/lag/live/flooring rows, composable as a relation") {
    val root = mkTable("ds_t")
    try {
      val ckpt = Files.createTempDirectory("ds-ck").toString
      val got = mutable.Set.empty[Long]
      val q = startStream(root, ckpt, got)
      try { q.processAllAvailable() } finally q.stop() // delivered through v1
      append(root, 10, 15) // v2
      append(root, 15, 20) // v3
      // a second consumer whose checkpoint was deleted (dead registration)
      FileCow.registerStream(root, "/definitely/gone/ckpt", deliveredTo = 2L)

      val rows = spark.sql("DESCRIBE STREAMS ds_t").collect()
      assert(rows.length == 2, rows.mkString("\n"))
      val byLive = rows.map(r => r.getAs[Boolean]("live") -> r).toMap
      val liveRow = byLive(true); val deadRow = byLive(false)
      // the marker holds the ENGINE-CONFIRMED position, which may trail
      // the drained batch by one commit callback — assert relationships
      val delivered = liveRow.getAs[Long]("delivered_version")
      assert(delivered >= 0L && delivered <= 1L, liveRow.toString)
      assert(liveRow.getAs[Long]("lag_versions") == 3L - delivered)
      assert(liveRow.getAs[Long]("lag_bytes") > 0L,
        "two undelivered appends must price > 0 bytes")
      assert(liveRow.getAs[Boolean]("flooring"), "a live in-cap stream floors")
      assert(deadRow.getAs[String]("checkpoint") == "/definitely/gone/ckpt")
      assert(!deadRow.getAs[Boolean]("flooring"), "a dead registration never floors")
      // composes as a relation (filters/aggregates apply to the frame)
      assert(spark.sql("DESCRIBE STREAMS ds_t")
        .where("lag_versions > 0").count() >= 1L)
    } finally GraftTables.unregister("ds_t")
  }

  test("lag_bytes prices a DV-delete commit exactly as the admission path, per consumer kind (ADVICE r14)") {
    val root = mkTable("ds_dvp")
    try {
      // a CDF consumer delivered through v1, then: v2 = DV enable
      // (metadata-only), v3 = DV delete (moves no data files —
      // bytesAdded = 0 — but its catch-up batch re-reads every DV-dirty
      // file twice, one scan per delta side)
      val ckpt = Files.createTempDirectory("ds-dv-ck").toString
      val got = mutable.Set.empty[Long]
      val q = spark.readStream.format("graft-cdf").option("root", root)
        .option("keys", "k").option("startingVersion", "0").load()
        .writeStream
        .foreachBatch((b: DataFrame, _: Long) => {
          val ks = b.select("k").collect().map(_.getLong(0))
          got.synchronized { got ++= ks }; ()
        })
        .option("checkpointLocation", ckpt)
        .start()
      try { q.processAllAvailable() } finally q.stop()
      FileCow.setTableProperties(spark, root,
        Map(FileCow.DvEnabledProp -> "true"))      // v2
      FileCow.delete(spark, root, col("k") < 3L)   // v3: delete_dv
      val ci3 = FileCow.commitInfo(root, 3L).get
      assert(ci3.kind == "delete_dv" && ci3.bytesAdded == 0L && ci3.bytesDv > 0L,
        s"fixture must be a DV delta: $ci3")

      // a table-stream registration at the same position, for contrast:
      // it reads only ADDED files, so the same lag prices 0 bytes
      FileCow.registerStream(root, "/definitely/gone/ts-ckpt",
        deliveredTo = 1L, readsRemoved = false)

      val rows = spark.sql("DESCRIBE STREAMS ds_dvp").collect()
      val cdfRow = rows.find(_.getAs[String]("checkpoint").startsWith(ckpt))
        .getOrElse(fail(s"no CDF registration row in ${rows.mkString("\n")}"))
      val tsRow = rows.find(_.getAs[String]("checkpoint").contains("ts-ckpt")).get
      val delivered = cdfRow.getAs[Long]("delivered_version")
      assert(delivered <= 1L, cdfRow.toString)
      // exactly the admission pricing: plain commits at bytesAdded (the
      // marker's engine-confirmed position may trail by one callback, so
      // v1's create bytes may be in scope), v2 contributes 0
      // (metadata-only), v3 contributes 2×bytesDv (delete side + insert
      // side) — never ~0
      val plain = ((delivered + 1) to 2L).flatMap(v => FileCow.commitInfo(root, v))
        .map(ci => math.max(ci.bytesAdded, 0L)).sum
      assert(cdfRow.getAs[Long]("lag_bytes") == plain + 2L * ci3.bytesDv,
        s"CDF lag_bytes must price the DV re-read, got $cdfRow " +
          s"vs $plain + 2×${ci3.bytesDv}")
      assert(tsRow.getAs[Long]("lag_bytes") == 0L,
        s"a table-stream consumer admits only added bytes, got $tsRow")
    } finally GraftTables.unregister("ds_dvp")
  }

  test("maxLagVersions: a stalled stream stops flooring, vacuum reclaims, resume fails LOUDLY") {
    val root = mkTable("ds_lag")
    try {
      val ckpt = Files.createTempDirectory("ds-ck2").toString
      val got = mutable.Set.empty[Long]
      val q = startStream(root, ckpt, got)
      try { q.processAllAvailable() } finally q.stop() // delivered through v1
      append(root, 10, 15) // v2
      append(root, 15, 20) // v3
      append(root, 20, 25) // v4

      // within the cap (lag 3 ≤ 5): the floor holds
      FileCow.setTableProperties(spark, root,
        Map("graft.streams.maxLagVersions" -> "5")) // v5
      FileCow.vacuum(spark, root, keep = 1, minAgeMs = 0L)
      assert(FileCow.versions(root).head == 1L,
        s"in-cap stream must keep flooring, got ${FileCow.versions(root)}")

      // beyond the cap (lag 4 > 2): the registration stops flooring —
      // visible in DESCRIBE STREAMS before the vacuum even runs
      FileCow.setTableProperties(spark, root,
        Map("graft.streams.maxLagVersions" -> "2")) // v6
      val row = spark.sql("DESCRIBE STREAMS ds_lag").collect().head
      assert(row.getAs[Boolean]("live") && !row.getAs[Boolean]("flooring"),
        s"a beyond-cap registration must report flooring=false: $row")
      FileCow.vacuum(spark, root, keep = 1, minAgeMs = 0L)
      assert(FileCow.versions(root) == Seq(6L),
        s"beyond-cap stream must not widen retention, got ${FileCow.versions(root)}")

      // the marker itself survives (not deregistered) …
      assert(Files.list(FileCow.streamsDir(root)).iterator().hasNext)
      // … and the stalled stream's resume fails LOUDLY on the reclaimed
      // backlog — never silent row loss
      val q2 = startStream(root, ckpt, got)
      try {
        val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q2.processAllAvailable()
        }
        val msg = e.getCause match { case null => e.getMessage case c => c.getMessage }
        assert(msg != null && msg.contains("retention"),
          s"expected the retention loud-failure, got: $msg")
      } finally q2.stop()
    } finally GraftTables.unregister("ds_lag")
  }

  test("a caught-up stream keeps flooring under the cap; snapshot tables refuse") {
    val root = mkTable("ds_ok")
    try {
      val ckpt = Files.createTempDirectory("ds-ck3").toString
      val got = mutable.Set.empty[Long]
      append(root, 10, 15) // v2
      val q = startStream(root, ckpt, got)
      try {
        q.processAllAvailable() // batch 0: v1..v2
        // a SECOND batch confirms the first (the engine's Source.commit
        // callback — the only signal the marker may ride — fires when the
        // next batch runs)
        append(root, 15, 20) // v3
        q.processAllAvailable() // batch 1: v3; confirms delivered=2
      } finally q.stop()
      FileCow.setTableProperties(spark, root,
        Map("graft.streams.maxLagVersions" -> "2")) // v4
      // delivered = 2, lag = 2 ≤ cap: floor holds at the confirmed position
      val row = spark.sql("DESCRIBE STREAMS ds_ok").collect().head
      assert(row.getAs[Long]("delivered_version") == 2L, row.toString)
      assert(row.getAs[Boolean]("flooring"), row.toString)
      FileCow.vacuum(spark, root, keep = 1, minAgeMs = 0L)
      assert(FileCow.versions(root) == (2L to 4L),
        s"floor holds at the confirmed position: ${FileCow.versions(root)}")

      val snapRoot = Files.createTempDirectory("ds-snap").resolve("t").toString
      graft.sources.Versioned.publish(
        spark.range(3).select(col("id").as("k")), snapRoot)
      GraftTables.register("ds_snap", snapRoot)
      try {
        val e = intercept[Exception] { spark.sql("DESCRIBE STREAMS ds_snap") }
        assert(e.getMessage.contains("snapshot-level"), e.getMessage)
      } finally GraftTables.unregister("ds_snap")
    } finally GraftTables.unregister("ds_ok")
  }
}
