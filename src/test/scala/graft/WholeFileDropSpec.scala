package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.plans.GraftTables
import graft.sources.FileCow

/** WHOLE-FILE DROPS on delete — ADR-002's recorded follow-up, closing the
  * one structural advantage hive partition dirs kept (O(1) retention
  * drops): a DELETE whose predicate provably covers a file retires it as
  * PURE METADATA, never reading it. Soundness rests on two proofs the
  * spec exercises both ways: the NEGATED predicate's stat admission must
  * EXCLUDE the file (no row can be a survivor), and every referenced
  * column must carry an enforced `IS NOT NULL` CHECK constraint (min/max
  * stats are null-blind — without the constraint a NULL-cond survivor
  * could hide anywhere, so the optimization must NOT fire). Measured by a
  * task-metrics listener: records read during the delete.
  */
class WholeFileDropSpec extends SparkSpec {
  import spark.implicits._

  private def recordsReadDuring[T](body: => T): (T, Long) = {
    val n = new AtomicLong(0L)
    val l = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          n.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      // listener events are async: give the bus a moment to drain before
      // reading the counter (no public waitUntilEmpty on SparkContext)
      Thread.sleep(500)
      (r, n.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  /** 8 day-aligned files (min_day == max_day == d), day NOT NULL. */
  private def mkRetentionTable(name: String): String = {
    val root = Files.createTempDirectory(s"graft-wfd-$name").toString
    GraftTables.registerCow(name, root)
    spark.sql(s"CREATE TABLE $name (day BIGINT NOT NULL, id BIGINT NOT NULL, v STRING)")
    val rows = spark.range(0, 800).select((col("id") % 8).as("day"),
      col("id"), concat(lit("p"), col("id")).as("v"))
    FileCow.append(spark, root, rows.repartition(8, col("day"))
      .sortWithinPartitions("day", "id"))
    root
  }

  test("retention delete retires covered files without reading them") {
    val root = mkRetentionTable("wfd_t")
    // files are day-pure: hash-partitioned on day into 8 partitions —
    // verify the layout premise before relying on it
    val man = FileCow.manifest(spark, root, FileCow.currentVersion(root))
    val pure = man.filter(col("min_day") === col("max_day")).count()
    assert(pure == man.count(), "every file must cover exactly one day")

    val (c, read) = recordsReadDuring {
      FileCow.delete(spark, root, col("day") < 4)
    }
    assert(read == 0L, s"a fully-covered delete must read NOTHING, read $read rows")
    assert(c.filesAdded == 0L, "no survivor files to write")
    // correctness: exactly the surviving days remain
    val left = FileCow.read(spark, root).select("day").distinct()
      .as[Long].collect().sorted.toSeq
    assert(left == Seq(4L, 5L, 6L, 7L))
    assert(FileCow.read(spark, root).count() == 400L)

    // the dropped files still serve the CHANGE FEED (they retire from the
    // manifest, not from disk until vacuum): the delete's feed carries
    // exactly the 400 dropped rows as deletes
    val v = FileCow.currentVersion(root)
    val feed = FileCow.changesBetween(spark, root, Seq("id"), v - 1, v)
    assert(feed.filter(col("_change_type") === "delete").count() == 400L)
    GraftTables.unregister("wfd_t")
  }

  test("a boundary file is read and rewritten; covered files still drop free") {
    val root = mkRetentionTable("wfd_b")
    val (c, read) = recordsReadDuring {
      FileCow.delete(spark, root, col("day") < 4 || (col("day") === 4 && col("id") < 100))
    }
    // day 4's file must be read (partial coverage); days 0-3 must not.
    // day 4 holds 100 rows; the rewrite reads it twice (repartitionByRange
    // samples before it shuffles) and the stats scan reads the 88 written
    // survivors — all well under the 500 affected rows an unoptimized
    // delete reads twice (measured 1088 before the whole-file drop)
    assert(read <= 400L, s"only the boundary file's rows may be read, read $read")
    assert(read > 0L, "the boundary file must actually be read")
    assert(c.filesAdded == 1L, "the boundary survivors land in one file")
    // day-4 ids are ≡ 4 (mod 8); 12 of them are < 100 → 88 survive there
    assert(FileCow.read(spark, root).count() == 388L)
    val byDay = FileCow.read(spark, root).groupBy("day").count()
      .as[(Long, Long)].collect().toMap
    assert(!byDay.contains(0L) && !byDay.contains(3L))
    assert(byDay(4L) == 88L)
    assert(byDay(5L) == 100L && byDay(6L) == 100L && byDay(7L) == 100L)
    GraftTables.unregister("wfd_b")
  }

  test("a parenthesized user-added NOT NULL constraint also enables the drop") {
    val root = Files.createTempDirectory("graft-wfd-paren").toString
    GraftTables.registerCow("wfd_paren", root)
    val rows = spark.range(0, 800).select((col("id") % 8).as("day"),
      col("id"), concat(lit("p"), col("id")).as("v"))
    FileCow.create(spark, root,
      rows.repartitionByRange(8, col("day"), col("id")),
      statsCols = Seq("day", "id"))
    val man = FileCow.manifest(spark, root, FileCow.currentVersion(root))
    assert(man.filter(col("min_day") === col("max_day")).count() == man.count(),
      "premise: day-pure files")
    // the user's spelling, not createEmpty's: parens + odd spacing — the
    // detection parses the predicate shape, it does not string-match
    FileCow.addConstraint(spark, root, "day_nn", "( day  IS NOT NULL )")
    val (_, read) = recordsReadDuring {
      FileCow.delete(spark, root, col("day") < 4)
    }
    assert(read == 0L, s"shape-parsed constraint must enable the drop, read $read")
    assert(FileCow.read(spark, root).count() == 400L)
    GraftTables.unregister("wfd_paren")
  }

  test("without the NOT NULL constraint the optimization must not fire") {
    val root = Files.createTempDirectory("graft-wfd-nn").toString
    GraftTables.registerCow("wfd_nn", root)
    // CTAS-style create: nullable day, NO constraint — and one real NULL
    // survivor hiding where min/max stats cannot see it
    val rows = spark.range(0, 800).select(
      when(col("id") === 7, lit(null)).otherwise(col("id") % 8)
        .cast("bigint").as("day"),
      col("id"), concat(lit("p"), col("id")).as("v"))
    FileCow.create(spark, root, rows.repartition(8, col("day")),
      statsCols = Seq("day", "id"))
    val (_, read) = recordsReadDuring {
      FileCow.delete(spark, root, col("day") < 4)
    }
    assert(read > 0L, "null-blind stats must force the read")
    // the NULL-day row survives (SQL: NULL cond = not matched)
    assert(FileCow.read(spark, root).filter(col("day").isNull).count() == 1L)
    GraftTables.unregister("wfd_nn")
  }
}
