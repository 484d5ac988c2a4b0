package graft

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.FileCow

/** `Trigger.AvailableNow` on the graft-cow sources — the "drain the
  * backlog, then stop" entry a migrating Delta user types first. The cow
  * sources implement the admission-control seam (`SupportsAdmissionControl`
  * + `SupportsTriggerAvailableNow`, the FileStreamSource pattern), so the
  * engine plans offsets through `latestOffset` with a PLANNED END captured
  * at prepare time. Claims:
  *
  *   1. a 20-commit backlog drains COMPLETELY and the query STOPS on its
  *      own, both uncapped (one batch) and rate-capped
  *      (`maxVersionsPerTrigger` bounds every batch, the drain still ends);
  *   2. the planned-end contract: a commit landing MID-DRAIN is not
  *      consumed by that run — the next AvailableNow run on the same
  *      checkpoint picks it up from the committed offset (no loss, no
  *      duplicate);
  *   3. the change-feed source drains and stops the same way.
  */
class CowAvailableNowSpec extends SparkSpec {

  private type Row3 = (Long, Long, String)

  private def mkTable(): String = {
    val root = Files.createTempDirectory("cow-an").resolve("t").toString
    val base = spark.range(1, 21).select(col("id"), (col("id") % 7).as("grp"),
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

  /** v1 create + 20 small appends = a 21-version backlog. */
  private def backlog(root: String): Unit =
    (0 until 20).foreach(i => FileCow.append(spark, root, inc(100 + 2 * i, 102 + 2 * i)))

  test("AvailableNow drains a 20-commit backlog and stops (uncapped)") {
    val root = mkTable()
    backlog(root)
    val endAtStart = FileCow.currentVersion(root)
    val got = mutable.Set.empty[Row3]
    val batches = mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft-cow").option("root", root)
      .option("startingVersion", "0").load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val r = rows(b); got.synchronized { got ++= r; batches += r.size.toLong }; ()
      }
      .option("checkpointLocation", Files.createTempDirectory("cow-an-ck").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "AvailableNow query must stop on its own")
    assert(got.toSet == rows(FileCow.readVersion(spark, root, endAtStart)),
      "the drain delivers exactly the start-observed version's rows")
    assert(batches.count(_ > 0) == 1, s"uncapped drain is one batch, got $batches")
  }

  test("AvailableNow + maxVersionsPerTrigger drains in bounded batches and stops") {
    val root = mkTable()
    backlog(root)
    val endAtStart = FileCow.currentVersion(root)
    val got = mutable.Set.empty[Row3]
    val batches = mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft-cow").option("root", root)
      .option("startingVersion", "0").option("maxVersionsPerTrigger", "3").load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val r = rows(b); got.synchronized { got ++= r; batches += r.size.toLong }; ()
      }
      .option("checkpointLocation", Files.createTempDirectory("cow-an-ck2").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "rate-capped AvailableNow must still stop")
    assert(got.toSet == rows(FileCow.readVersion(spark, root, endAtStart)))
    // 21 versions at ≤3 per trigger: at least 7 batches, and no batch may
    // span more than 3 commits' worth of rows (v1 has 20, appends 2 each)
    assert(batches.size >= 7, s"expected ≥7 bounded batches, got $batches")
    assert(batches.forall(_ <= 24L), s"a batch exceeded the 3-commit cap: $batches")
  }

  test("a mid-drain commit waits for the next run; the next run picks it up") {
    val root = mkTable() // v1
    (0 until 4).foreach(i => FileCow.append(spark, root, inc(100 + 2 * i, 102 + 2 * i))) // v2..v5
    val endAtStart = FileCow.currentVersion(root)
    val ckpt = Files.createTempDirectory("cow-an-ck3").toString
    val got = mutable.Set.empty[Row3]
    @volatile var injected = false
    val q = spark.readStream.format("graft-cow").option("root", root)
      .option("startingVersion", "0").option("maxVersionsPerTrigger", "1").load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val r = rows(b)
        got.synchronized { got ++= r }
        // first batch: land a NEW commit while the drain is running
        if (!injected) { injected = true; FileCow.append(spark, root, inc(900, 905)) }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000))
    assert(injected, "the spec premise: a commit landed mid-drain")
    assert(got.toSet == rows(FileCow.readVersion(spark, root, endAtStart)),
      "the drain must stop at the start-observed version — mid-drain commits excluded")

    // second run, SAME checkpoint: resumes from the committed offset and
    // delivers exactly the mid-drain commit — nothing lost, nothing replayed
    val got2 = mutable.Set.empty[Row3]
    val q2 = spark.readStream.format("graft-cow").option("root", root)
      .option("startingVersion", "0").load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) => got2.synchronized { got2 ++= rows(b) }; () }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q2.awaitTermination(120000))
    assert(got2.toSet == rows(inc(900, 905)),
      s"the follow-up drain delivers exactly the mid-drain commit, got ${got2.size} rows")
  }

  test("the change-feed source drains under AvailableNow and stops") {
    val root = mkTable() // v1
    FileCow.append(spark, root, inc(100, 103)) // v2
    FileCow.delete(spark, root, col("id") === 1L) // v3
    val versions = mutable.Set.empty[Long]
    val types = mutable.Set.empty[String]
    val q = spark.readStream.format("graft-cdf").option("root", root)
      .option("keys", "id").option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "1").load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val r = b.select("_commit_version", "_change_type").collect()
        versions.synchronized {
          versions ++= r.map(_.getLong(0)); types ++= r.map(_.getString(1))
        }
        ()
      }
      .option("checkpointLocation", Files.createTempDirectory("cow-an-ck4").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "CDF AvailableNow query must stop")
    assert(versions.toSet == Set(1L, 2L, 3L),
      s"all three commits' feeds drained, got $versions")
    assert(types.contains("insert") && types.contains("delete"))
  }
}
