package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._

import graft.plans.{GraftSqlLex, GraftTables}
import graft.sources.{CatalogStore, FileCow}

/** Round-13 ADVICE batch — each test pins one reviewed defect:
  *   1. `CatalogStore.load` treated a MISSING snapshot for a PUBLISHED
  *      version as an empty catalog — a damaged store silently stopped
  *      resolving every durable name, and the next commit rebased its RMW
  *      from an empty map and durably wiped every binding.
  *   2. `createSchema` scanned for TBLPROPERTIES before the LOCATION
  *      literal was spliced out, so a path containing "TBLPROPERTIES ("
  *      anchored the props scan inside the quoted literal. Retired
  *      structurally: every clause keyword now scans the length-preserving
  *      [[GraftSqlLex.mask]] (literals/comments blanked), so scan order
  *      no longer matters.
  *   3. `GraftTables.refresh` stat'd the `_catalog` pointer on EVERY
  *      lookup miss — a GET-per-name storm on object stores. Now at most
  *      one pointer read per `refreshTtlMs` (force-bypassed for this
  *      process's own mutations: read-your-writes).
  *   4. The table stream's resolves-at-CURRENT-only escape accepted a
  *      by-name column dropped before the batch's end and RE-ADDED later
  *      under the same name — the batch silently delivered stale values.
  *      The escape now requires the column be genuinely post-`to`
  *      widening (no retained version ≤ `to` carries the name).
  *   (5. the typed schema-race exception is pinned in RetryingSchemaSpec.)
  */
class Round13FixSpec extends SparkSpec {
  import spark.implicits._

  test("a damaged catalog store fails loudly instead of wiping bindings") {
    val wh = Files.createTempDirectory("graft-r13-cat").toString
    CatalogStore.commit(wh)(m => m + ("t1" -> CatalogStore.Binding("/r1", true)))
    val v = CatalogStore.currentVersion(wh)
    assert(v == 1L && CatalogStore.load(wh, v).contains("t1"))
    // damage: the pointer names v1 but its snapshot is gone (hand-pruned
    // history / partial restore)
    Files.delete(Paths.get(wh, "_catalog", s"c$v.json"))
    val e = intercept[IllegalArgumentException] { CatalogStore.load(wh, v) }
    assert(e.getMessage.contains("damaged"), e.getMessage)
    // the next commit must refuse too — the old behavior rebased from an
    // empty map and durably dropped every existing binding
    val e2 = intercept[IllegalArgumentException] {
      CatalogStore.commit(wh)(m => m + ("t2" -> CatalogStore.Binding("/r2", true)))
    }
    assert(e2.getMessage.contains("damaged"), e2.getMessage)
    assert(CatalogStore.currentVersion(wh) == 1L, "the refusal must not publish")
  }

  test("clause keywords inside a LOCATION literal cannot anchor other scans") {
    // a root whose PATH TEXT contains every other clause's keyword — with
    // mask-based scanning none of them can anchor inside the literal
    val base = Files.createTempDirectory("graft-r13-loc")
    val evil = base.resolve("TBLPROPERTIES (x, USING graft, STATS (k)").resolve("t")
    val name = "r13_evil_loc"
    try {
      spark.sql(s"CREATE TABLE $name (k BIGINT NOT NULL, v STRING) " +
        s"USING graft-cow LOCATION '${GraftSqlLex.q(evil.toString)}' " +
        "TBLPROPERTIES ('note' = 'props (with parens) survive')")
      assert(GraftTables.entryOf(name).map(_.root).contains(evil.toString),
        s"root must be the verbatim path, got ${GraftTables.entryOf(name)}")
      assert(FileCow.tableProps(evil.toString, FileCow.currentVersion(evil.toString))
        .get("note").contains("props (with parens) survive"))
      // and the reverse order: TBLPROPERTIES whose VALUE contains
      // "LOCATION '…'" must not anchor the location scan
      val name2 = "r13_evil_props"
      val root2 = base.resolve("plain").resolve("t2")
      spark.sql(s"CREATE TABLE $name2 (k BIGINT) USING graft-cow " +
        s"TBLPROPERTIES ('ddl' = 'LOCATION ''/somewhere/else'' TBLPROPERTIES (') " +
        s"LOCATION '${GraftSqlLex.q(root2.toString)}'")
      assert(GraftTables.entryOf(name2).map(_.root).contains(root2.toString))
      assert(FileCow.tableProps(root2.toString, FileCow.currentVersion(root2.toString))
        .get("ddl").contains("LOCATION '/somewhere/else' TBLPROPERTIES ("))
    } finally {
      GraftTables.unregister(name); GraftTables.unregister("r13_evil_props")
    }
  }

  test("lookup misses stat the catalog pointer at most once per TTL") {
    val wh = Files.createTempDirectory("graft-r13-ttl").toString
    val prevTtl = GraftTables.refreshTtlMs
    GraftTables.attachWarehouse(wh)
    try {
      GraftTables.refreshTtlMs = 60000L
      GraftTables.entryOf("r13_miss_warm") // arm the TTL window
      val before = GraftTables.pointerReads.get()
      (1 to 50).foreach(i => GraftTables.entryOf(s"r13_miss_$i"))
      val reads = GraftTables.pointerReads.get() - before
      assert(reads == 0L, s"50 misses inside the TTL must re-stat 0 times, got $reads")
      // read-your-writes: this process's own registration bypasses the TTL
      val root = Files.createTempDirectory("graft-r13-ttl-t").resolve("t").toString
      GraftTables.registerCow("r13_ttl_t", root)
      assert(GraftTables.entryOf("r13_ttl_t").exists(_.cow),
        "own registration must resolve immediately despite the TTL")
      GraftTables.unregister("r13_ttl_t")
    } finally {
      GraftTables.refreshTtlMs = prevTtl
      GraftTables.detachWarehouse()
    }
  }

  test("a column dropped and RE-ADDED under the same name is vanished, not null-padded") {
    // the hazard is BY-NAME resolution, i.e. a convert-vintage table (a
    // create()'d table is column-mapped: the re-added column gets a fresh
    // field id, old files read NULL for it — ids protect it by design)
    val plain = Files.createTempDirectory("graft-r13-plain").toString
    spark.range(1, 6).select(col("id").as("k"), (col("id") * 10).as("a"))
      .write.mode("overwrite").parquet(plain)
    val root = Files.createTempDirectory("graft-r13-readd").resolve("t").toString
    FileCow.convert(spark, root, plain, Seq("k"))              // v1: has a
    FileCow.dropColumns(spark, root, Seq("a"))                 // v2: a gone
    FileCow.addColumns(spark, root,
      Seq(org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.LongType)))                 // v3: a re-added
    // pin at CURRENT (a restart re-pins); batch (1,2]: at its end version
    // v2 'a' is dropped; it resolves at current v3 — but only via the
    // re-add. Null-padding here would deliver v1's files as if 'a' were
    // the re-added column — the silent corruption under test.
    val pin = FileCow.schemaOf(root, 3L)
    assert(!FileCow.isColumnMapped(pin), "spec premise: by-name table")
    val src = new graft.streaming.CowTableSource(spark.sqlContext, root,
      pin, startVersion = 1L, skipChangeCommits = false)
    val e = intercept[RuntimeException] {
      src.getBatch(Some(LongOffset(1L)), LongOffset(2L))
    }
    assert(e.getMessage.contains("vanished"), e.getMessage)

    // control: a GENUINE post-`to` widening still delivers (null-padded)
    val root2 = Files.createTempDirectory("graft-r13-widen").resolve("t").toString
    FileCow.create(spark, root2,
      spark.range(1, 4).select(col("id").as("k")), statsCols = Seq("k")) // v1
    FileCow.append(spark, root2, Seq(10L).toDF("k"))                     // v2
    FileCow.addColumns(spark, root2,
      Seq(org.apache.spark.sql.types.StructField("b",
        org.apache.spark.sql.types.LongType)))                           // v3: +b
    // driven through a REAL stream (the source's getBatch frame only
    // re-executes inside engine planning — see GraftBridge.asBatch docs):
    // pin at current (v3, has b), backlog (1,3] replays v2's pre-widening
    // file, which must null-pad b and deliver
    val got = scala.collection.mutable.Set.empty[(Long, Boolean)]
    // maxVersionsPerTrigger=1 forces batch (1,2] on its own, whose END
    // (v2) predates the widening — the exact resolves-at-current-only
    // escape under test
    val q = spark.readStream.format("graft-cow").option("root", root2)
      .option("startingVersion", "1").option("maxVersionsPerTrigger", "1").load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= b.collect().map(r => (r.getLong(0), r.isNullAt(1)))
        }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft-r13-widen-ck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000), "the widening replay must complete")
    assert(got.toSet == Set((10L, true)),
      s"pre-widening replay must null-pad, got $got")
  }
}
