package graft

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException

import graft.sources.FileCow

/** `spark.readStream.format("graft-cow")` — the table as an append stream.
  * Claims under test: append commits stream exactly their new rows,
  * layout-only commits (compact) stream nothing, a change commit (delete)
  * fails the stream by default and is skipped under `skipChangeCommits`,
  * and `readChangeFeed=true` routes to the F19 feed with its tagged rows.
  */
class GraftCowTableStreamSpec extends SparkSpec {

  private type Row3 = (Long, Long, String)

  private def mkTable(): String = {
    val root = Files.createTempDirectory("cow-ts").resolve("t").toString
    val base = spark.range(1, 51).select(col("id"), (col("id") % 7).as("grp"),
      concat(lit("v"), col("id")).as("payload"))
    FileCow.create(spark, root, base.repartitionByRange(2, col("id")), Seq("id"))
    root
  }

  private def rows(df: DataFrame): Set[Row3] =
    df.select("id", "grp", "payload").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  private def inc(from: Long, until: Long): DataFrame =
    spark.range(from, until).select(col("id"), lit(0L).as("grp"),
      concat(lit("n"), col("id")).as("payload"))

  private def startStream(root: String, ckpt: String, sink: mutable.Set[Row3],
      opts: Map[String, String] = Map.empty) = {
    val reader = opts.foldLeft(
      spark.readStream.format("graft-cow").option("root", root)) {
        case (r, (k, v)) => r.option(k, v)
      }
    reader.load().writeStream
      .foreachBatch((b: DataFrame, _: Long) => { sink.synchronized { sink ++= rows(b) }; () })
      .option("checkpointLocation", ckpt)
      .start()
  }

  test("appends stream their new rows; compaction streams nothing") {
    val root = mkTable() // v1
    val ckpt = Files.createTempDirectory("cow-ts-ck").toString
    val got = mutable.Set.empty[Row3]
    val q = startStream(root, ckpt, got, Map("startingVersion" -> "0"))
    try {
      q.processAllAvailable()
      assert(got.toSet == rows(FileCow.readVersion(spark, root, 1L)),
        "startingVersion 0 bootstraps the v1 table through its create commit")

      FileCow.append(spark, root, inc(100, 110)) // v2
      FileCow.append(spark, root, inc(110, 115)) // v3
      q.processAllAvailable()
      assert(got.toSet == rows(FileCow.read(spark, root)))

      val before = got.size
      FileCow.compact(spark, root, targetFiles = 1) // v4: layout-only
      q.processAllAvailable()
      assert(got.size == before, "compaction must not re-stream rows")

      FileCow.append(spark, root, inc(115, 118)) // v5: stream survives past it
      q.processAllAvailable()
      assert(got.toSet == rows(FileCow.read(spark, root)))
    } finally q.stop()
  }

  test("a change commit fails the stream by default; skipChangeCommits skips it") {
    val root = mkTable() // v1
    val got = mutable.Set.empty[Row3]
    val q = startStream(root, Files.createTempDirectory("cow-ts-ck2").toString, got)
    try {
      FileCow.delete(spark, root, col("id") <= 5) // v2: a rewrite commit
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      assert(e.getMessage.contains("delete") || e.getCause.getMessage.contains("delete"))
    } finally q.stop()

    val got2 = mutable.Set.empty[Row3]
    val q2 = startStream(root, Files.createTempDirectory("cow-ts-ck3").toString,
      got2, Map("startingVersion" -> "1", "skipChangeCommits" -> "true"))
    try {
      FileCow.append(spark, root, inc(200, 203)) // v3
      q2.processAllAvailable()
      assert(got2.toSet == rows(inc(200, 203)),
        "the delete commit is skipped, the append after it still arrives")
    } finally q2.stop()
  }

  test("maxVersionsPerTrigger drains a backlog in bounded batches") {
    val root = mkTable()                       // v1
    FileCow.append(spark, root, inc(400, 405)) // v2
    FileCow.append(spark, root, inc(405, 410)) // v3
    FileCow.append(spark, root, inc(410, 415)) // v4
    FileCow.append(spark, root, inc(415, 420)) // v5
    val got = mutable.Set.empty[Row3]
    val batchSizes = mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft-cow").option("root", root)
      .option("startingVersion", "0").option("maxVersionsPerTrigger", "2")
      .load().writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val r = rows(b)
        got.synchronized { got ++= r; batchSizes += r.size.toLong }
        ()
      }
      .option("checkpointLocation", Files.createTempDirectory("cow-ts-rate").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(got.toSet == rows(FileCow.read(spark, root)), "backlog fully drained")
      // 5 commits at ≤2 per trigger: at least 3 batches, none spanning >2
      // commits' worth of rows (v1 has 50, each append 5 — a 2-commit cap
      // bounds any batch at 55)
      assert(batchSizes.count(_ > 0) >= 3, s"expected ≥3 bounded batches, got $batchSizes")
      assert(batchSizes.forall(_ <= 55L), s"a batch exceeded the 2-commit cap: $batchSizes")
    } finally q.stop()
  }

  test("classification is structural: COPY INTO and insert-only MERGE stream, metadata-only commits skip") {
    val root = mkTable() // v1
    val got = mutable.Set.empty[Row3]
    val q = startStream(root, Files.createTempDirectory("cow-ts-shape").toString,
      got, Map("startingVersion" -> "0"))
    try {
      q.processAllAvailable()
      assert(got.toSet == rows(FileCow.read(spark, root)))
      // v2: metadata-only (no files touched) — must NOT kill the stream
      FileCow.setTableProperties(spark, root, Map("owner" -> "spec"))
      q.processAllAvailable()
      // v3: COPY INTO — a pure append spelled under a kind the old
      // allowlist missed; its rows must arrive, never be silently dropped
      val land = Files.createTempDirectory("cow-ts-land").toString
      inc(300, 305).coalesce(1).write.mode("overwrite").parquet(land)
      FileCow.copyInto(spark, root, land)
      q.processAllAvailable()
      assert(inc(300, 305).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2))).toSet.subsetOf(got.toSet),
        "COPY INTO rows must stream through")
      // v4: a merge whose keys miss every file range = removed-empty commit;
      // structurally an append, so it streams instead of failing
      FileCow.merge(spark, root, inc(700, 703), keys = Seq("id"))
      q.processAllAvailable()
      assert(got.toSet == rows(FileCow.read(spark, root)),
        "insert-only merge rows must stream through")
    } finally q.stop()
  }

  test("readChangeFeed=true streams the F19 feed with change tags") {
    val root = mkTable() // v1
    val got = mutable.Set.empty[(Long, String, Long)]
    val q = spark.readStream.format("graft-cow").option("root", root)
      .option("readChangeFeed", "true").option("keys", "id")
      .load().writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        got.synchronized {
          got ++= b.select("id", "_change_type", "_commit_version").collect()
            .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        }
        ()
      }
      .option("checkpointLocation", Files.createTempDirectory("cow-ts-ck4").toString)
      .start()
    try {
      FileCow.delete(spark, root, col("id") === 7L) // v2
      FileCow.append(spark, root, inc(300, 302))    // v3
      q.processAllAvailable()
      assert(got.toSet == Set((7L, "delete", 2L),
        (300L, "insert", 3L), (301L, "insert", 3L)))
    } finally q.stop()
  }
}
