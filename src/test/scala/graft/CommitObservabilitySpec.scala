package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.plans.GraftTables
import graft.sources.FileCow
import graft.sources.FileCow.{CommitHooks, CommitStats}

/** Conflict-resolution OBSERVABILITY (VERDICT r13 #6): every commit's
  * record carries how it landed — `rebases` (lost CASes re-folded over,
  * no statement re-derive) and `rederives` (full statement re-runs before
  * landing) — and `DESCRIBE HISTORY` surfaces both, so a deployment reads
  * its contention story without JVM access to CommitStats. */
class CommitObservabilitySpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(name: String): String = {
    val root = Files.createTempDirectory("graft-obs").resolve("t").toString
    val df = spark.range(0, 100).select($"id".as("k"), concat(lit("v"), $"id").as("v"))
      .repartitionByRange(4, $"k")
    FileCow.create(spark, root, df, statsCols = Seq("k"))
    GraftTables.registerCow(name, root)
    root
  }

  private def mergeKeys(root: String, lo: Long, hi: Long, tag: String): Unit = {
    FileCow.merge(spark, root,
      spark.range(lo, hi).select($"id".as("k"), lit(tag).as("v")), Seq("k")); ()
  }

  test("a REBASED commit stamps rebases=1; DESCRIBE HISTORY tells the story") {
    val root = freshTable("obs_rb")
    try {
      CommitStats.reset()
      var armed = true
      CommitHooks.beforeCommit = (r, _) =>
        if (armed && r == root) { armed = false; mergeKeys(root, 1000, 1005, "w") }
      try mergeKeys(root, 0, 5, "l") finally CommitHooks.reset()
      assert(CommitStats.rebased.get() == 1L, "spec premise: the race rebased")

      val hist = spark.sql("DESCRIBE HISTORY obs_rb")
        .select("version", "rebases", "rederives").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(hist(2L) == ((0L, 0L)), s"the uncontended winner: ${hist(2L)}")
      assert(hist(3L) == ((1L, 0L)),
        s"the rebased loser must stamp rebases=1, rederives=0: ${hist(3L)}")
      // and the raw record agrees
      assert(FileCow.commitInfo(root, 3L).get.rebases == 1L)
    } finally GraftTables.unregister("obs_rb")
  }

  test("a RE-DERIVED commit stamps rederives; uncontended commits stamp zero") {
    val root = freshTable("obs_rd")
    try {
      CommitStats.reset()
      // overlapping keys: the winner rewrites the loser's file, so the
      // loser must re-derive (rebase would trade serializability away)
      var armed = true
      CommitHooks.beforeCommit = (r, _) =>
        if (armed && r == root) { armed = false; mergeKeys(root, 3, 8, "w") }
      try mergeKeys(root, 0, 5, "l") finally CommitHooks.reset()
      assert(CommitStats.rederived.get() == 1L, "spec premise: the race re-derived")

      val hist = spark.sql("DESCRIBE HISTORY obs_rd")
        .select("version", "rebases", "rederives").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(hist(3L) == ((0L, 1L)),
        s"the re-derived loser must stamp rederives=1: ${hist(3L)}")
      // an uncontended follow-up stamps clean zeros (the thread-local
      // statement counter must not leak across statements)
      mergeKeys(root, 50, 55, "clean")
      val after = spark.sql("DESCRIBE HISTORY obs_rd")
        .where($"version" === 4L).select("rebases", "rederives").head
      assert(after.getLong(0) == 0L && after.getLong(1) == 0L, after.toString)
    } finally GraftTables.unregister("obs_rd")
  }
}
