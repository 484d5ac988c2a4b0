package graft

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.FileCow

/** `maxBytesPerTrigger` on both cow stream sources (VERDICT r10 #4): a
  * version-count cap alone admits an unbounded-byte batch after one fat
  * COPY INTO/append lands among small commits. The byte cap bounds each
  * micro-batch's CUMULATIVE NEW-DATA BYTES, priced from the commit log's
  * per-commit byte totals (metadata, never a data scan), with Delta's
  * soft-max contract: at least one commit always admits, so a single
  * over-cap commit still makes progress — isolated in its own batch.
  * The spec's oracle is exact: it replays the greedy admission walk over
  * the REAL per-commit byte totals and asserts the observed batch
  * partition of versions equals it.
  */
class MaxBytesPerTriggerSpec extends SparkSpec {

  /** (version marker, id) for every delivered row — payloads encode the
    * commit that wrote them, so a batch's version span is observable. */
  private def taggedRows(df: DataFrame): Set[(String, Long)] =
    df.select("payload", "id").collect()
      .map(r => (r.getString(0).takeWhile(_ != '-'), r.getLong(1))).toSet

  /** v1 create (tag c) + appends v2.. with one FAT commit in the middle. */
  private def mkBacklog(): (String, Seq[Long]) = {
    val root = Files.createTempDirectory("cow-mb").resolve("t").toString
    val base = spark.range(1, 21).select(col("id"),
      concat(lit("c-"), col("id")).as("payload"))
    FileCow.create(spark, root, base.repartitionByRange(2, col("id")), Seq("id"))
    def append(tag: String, from: Long, n: Long): Unit = {
      FileCow.append(spark, root, spark.range(from, from + n).select(col("id"),
        concat(lit(s"$tag-"), col("id")).as("payload")).coalesce(1))
      ()
    }
    append("v2", 1000, 3); append("v3", 2000, 3); append("v4", 3000, 3)
    append("v5", 10000, 20000) // the fat commit
    append("v6", 4000, 3); append("v7", 5000, 3); append("v8", 6000, 3)
    // ADDED-file bytes, not the record's snapshot totals: pricing on the
    // totals would make every commit after the fat one exceed the cap and
    // collapse v6..v8 to one-version batches (the bug the first cut had)
    val bytes = (1L to 8L).map(v => FileCow.commitInfo(root, v).get.bytesAdded)
    assert(bytes.forall(_ >= 0L), "fresh commits must record bytesAdded")
    assert(FileCow.commitInfo(root, 6L).get.bytes > bytes(5),
      "post-fat snapshot totals dwarf the added bytes — the distinction under test")
    (root, bytes)
  }

  /** The greedy admission walk [[graft.streaming.CdfSource.admitUpTo]]
    * performs, replayed here as the oracle: batches of versions whose
    * cumulative bytes stay ≤ cap, first commit always admitted. */
  private def expectedBatches(bytes: Seq[Long], cap: Long): Seq[Seq[Long]] = {
    val out = mutable.ArrayBuffer.empty[Seq[Long]]
    var v = 0L
    while (v < bytes.length) {
      val batch = mutable.ArrayBuffer.empty[Long]
      var acc = 0L
      var stop = false
      while (!stop && v < bytes.length) {
        val b = bytes(v.toInt) // bytes of version v+1
        if (batch.nonEmpty && acc + b > cap) stop = true
        else { acc += b; batch += v + 1; v += 1 }
      }
      out += batch.toSeq
    }
    out.toSeq
  }

  test("table stream: maxBytesPerTrigger isolates the fat commit, AvailableNow drains") {
    val (root, bytes) = mkBacklog()
    // cap: four small commits fit, the fat one cannot share a batch
    val small = bytes(1)
    val cap = small * 4 + small / 2
    assert(bytes(4) > cap, s"fat commit must exceed the cap: ${bytes(4)} vs $cap")
    val want = expectedBatches(bytes, cap)
    assert(want.exists(b => b == Seq(5L)),
      s"the oracle itself must isolate v5: $want (bytes=$bytes)")

    val observed = mutable.ArrayBuffer.empty[Set[String]]
    val got = mutable.Set.empty[(String, Long)]
    val q = spark.readStream.format("graft-cow").option("root", root)
      .option("startingVersion", "0")
      .option("maxBytesPerTrigger", cap.toString).load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val r = taggedRows(b)
        got.synchronized { got ++= r; if (r.nonEmpty) observed += r.map(_._1) }
        ()
      }
      .option("checkpointLocation", Files.createTempDirectory("cow-mb-ck").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000), "byte-capped AvailableNow must stop")

    // complete + exactly-once: every row of the final table, no dupes
    assert(got.toSet == taggedRows(FileCow.read(spark, root)))
    // each observed batch's version span matches the greedy oracle
    val tagOf: Long => String = v => if (v == 1L) "c" else s"v$v"
    val wantTags = want.map(_.map(tagOf).toSet)
    assert(observed.toSeq == wantTags,
      s"admission walk diverged: observed $observed, expected $wantTags (bytes=$bytes, cap=$cap)")
  }

  test("change feed: maxBytesPerTrigger drains the same backlog in byte-bounded batches") {
    val (root, bytes) = mkBacklog()
    val cap = bytes(1) * 4 + bytes(1) / 2
    val want = expectedBatches(bytes, cap)

    val observed = mutable.ArrayBuffer.empty[Set[Long]]
    val got = mutable.Set.empty[(String, Long, Long)]
    val q = spark.readStream.format("graft-cow").option("root", root)
      .option("readChangeFeed", "true").option("keys", "id")
      .option("startingVersion", "0")
      .option("maxBytesPerTrigger", cap.toString).load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val r = b.select("payload", "id", "_commit_version").collect()
          .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSet
        got.synchronized {
          got ++= r; if (r.nonEmpty) observed += r.map(_._3)
        }
        ()
      }
      .option("checkpointLocation", Files.createTempDirectory("cdf-mb-ck").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000), "byte-capped CDF AvailableNow must stop")
    assert(got.size == 20 + 9 + 20000 + 9,
      s"append-only history: one insert per row, got ${got.size}")
    assert(observed.toSeq == want.map(_.toSet),
      s"CDF admission diverged: observed $observed, expected $want (bytes=$bytes, cap=$cap)")
  }

  test("the change feed prices a rewrite's REMOVED bytes too") {
    // a delete that rewrites a fat file is cheap on the ADDED side if few
    // rows survive — but the CDF reads the fat pre-image; pricing added
    // bytes alone would admit it for free into a small batch
    val root = Files.createTempDirectory("cdf-rm").resolve("t").toString
    val mk = (tag: String, from: Long, n: Long) =>
      spark.range(from, from + n).select(col("id"),
        concat(lit(s"$tag-"), col("id")).as("payload")).coalesce(1)
    FileCow.create(spark, root, mk("c", 0, 20), Seq("id"))        // v1 small
    FileCow.append(spark, root, mk("v2", 1000, 3))                // v2 small
    FileCow.append(spark, root, mk("v3", 10000, 20000))           // v3 FAT
    FileCow.delete(spark, root, col("id") >= 10000 && col("id") < 29990) // v4: fat rewrite
    FileCow.append(spark, root, mk("v5", 2000, 3))                // v5 small
    FileCow.append(spark, root, mk("v6", 3000, 3))                // v6 small
    val infos = (1L to 6L).map(v => FileCow.commitInfo(root, v).get)
    assert(infos(3).bytesRemoved > 0L && infos(3).bytesAdded < infos(3).bytesRemoved,
      s"the delete must carry a fat pre-image: ${infos(3)}")
    val costs = infos.map(ci => ci.bytesAdded + math.max(ci.bytesRemoved, 0L))
    val cap = costs(1) * 4 + costs(1) / 2
    assert(costs(3) > cap, "the rewrite's two-sided cost must exceed the cap")
    val want = expectedBatches(costs, cap)
    assert(want.exists(_ == Seq(4L)), s"the oracle must isolate v4: $want ($costs)")

    val observed = mutable.ArrayBuffer.empty[Set[Long]]
    val q = spark.readStream.format("graft-cow").option("root", root)
      .option("readChangeFeed", "true").option("keys", "id")
      .option("startingVersion", "0")
      .option("maxBytesPerTrigger", cap.toString).load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val vs = b.select("_commit_version").distinct().collect()
          .map(_.getLong(0)).toSet
        observed.synchronized { if (vs.nonEmpty) observed += vs }
        ()
      }
      .option("checkpointLocation", Files.createTempDirectory("cdf-rm-ck").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000))
    assert(observed.toSeq == want.map(_.toSet),
      s"two-sided CDF pricing diverged: $observed vs $want (costs=$costs)")
  }

  test("a version cap composes with the byte cap (tightest wins per kind)") {
    val (root, bytes) = mkBacklog()
    // byte cap generous (covers everything), version cap 2: pure 2-version batches
    val observed = mutable.ArrayBuffer.empty[Int]
    val q = spark.readStream.format("graft-cow").option("root", root)
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "2")
      .option("maxBytesPerTrigger", (bytes.sum * 2).toString).load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val tags = taggedRows(b).map(_._1)
        observed.synchronized { if (tags.nonEmpty) observed += tags.size }
        ()
      }
      .option("checkpointLocation", Files.createTempDirectory("cow-mb-ck3").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000))
    assert(observed.forall(_ <= 2) && observed.sum == 8,
      s"2-version batches covering all 8 commits, got $observed")
  }
}
