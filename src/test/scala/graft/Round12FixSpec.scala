package graft

import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.plans.GraftTables
import graft.sources.FileCow

/** Round-12 ADVICE batch — each test pins one reviewed defect:
  *   1. `balancedClose` tracked quote state with no awareness of SQL
  *      comments, so an apostrophe inside a `--` remark in a CREATE
  *      column list (legal Spark DDL) flipped the quote state and the
  *      statement was rejected as unbalanced on a registered name.
  *   2. The LOCATION clause parsed with a raw `'([^']*)'` regex and
  *      compared verbatim, but SHOW CREATE emits LOCATION through q()
  *      (doubling quotes and backslashes) — a root carrying ' or \ broke
  *      the advertised verbatim replay with a spurious conflict error.
  *   3. `restore()` gated on isRetained, which also counts a crashed
  *      attempt's artifacts ABOVE the pointer — RESTORE to
  *      currentVersion+1 would publish a manifest that provably never
  *      landed. The pointer is the single source of published truth.
  *   4. The table stream's vanished-column guard resolved the pinned
  *      schema against the CURRENT version, not the batch's END version —
  *      once a drop landed, even deliverable pre-drift backlog was
  *      refused. Pre-drift batches now deliver; the first batch whose end
  *      crosses the drop is the one that fails.
  *   5. A DV-delta commit recorded bytesAdded = bytesRemoved = 0 yet its
  *      change-feed batch re-reads every still-present file whose vectors
  *      changed — CDF admission under-priced it. The record now carries
  *      `bytesDv` (the dirty files' byte total) and the admission walk
  *      prices it on the readsRemoved path.
  */
class Round12FixSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  test("CREATE column list tolerates SQL comments carrying apostrophes") {
    val root = Files.createTempDirectory("graft-r12-cmt").resolve("t").toString
    GraftTables.registerCow("r12cmt", root)
    try {
      spark.sql(
        """CREATE TABLE r12cmt (
          |  k BIGINT NOT NULL, -- the driver's id
          |  v STRING /* the rider's 'name', quoted */
          |)
          |USING graft-cow
          |STATS (k)""".stripMargin)
      assert(FileCow.currentVersion(root) == 1L)
      val schema = FileCow.schemaOf(root, 1L)
      assert(schema.fieldNames.toSeq == Seq("k", "v"))
      assert(!schema("k").nullable && schema("v").nullable)
    } finally GraftTables.unregister("r12cmt")
  }

  test("LOCATION literal with quotes and backslashes round-trips exactly") {
    val base = Files.createTempDirectory("graft-r12-loc")
    // a legal POSIX directory name the q()-emitter must escape (backslash
    // dirs are a Hadoop-glob limitation, covered at the parse layer below)
    val root = base.resolve("it's weird").resolve("t").toString
    GraftTables.registerCow("r12loc", root)
    try {
      spark.sql("CREATE TABLE r12loc (k BIGINT, v STRING) STATS (k)")
      assert(FileCow.currentVersion(root) == 1L)
      val ddl = spark.sql("SHOW CREATE TABLE r12loc").collect().head.getString(0)
      assert(ddl.contains("it''s weird"), s"q()-escaped LOCATION expected in: $ddl")
      // verbatim replay: the emitted DDL must parse its LOCATION back to
      // the exact registered root — so the failure is "already exists"
      // (the table-level contract), never a spurious LOCATION conflict
      val e = intercept[Exception] { spark.sql(ddl) }
      assert(e.getMessage.contains("already exists"), e.getMessage)
      assert(!e.getMessage.contains("conflicts"), e.getMessage)
      // positive parse on a fresh name: the escaped spelling creates
      val root2 = base.resolve("al'so odd").resolve("t").toString
      GraftTables.registerCow("r12loc2", root2)
      try {
        val esc = root2.replace("\\", "\\\\").replace("'", "''")
        spark.sql(s"CREATE TABLE r12loc2 (k BIGINT) LOCATION '$esc'")
        assert(FileCow.currentVersion(root2) == 1L)
      } finally GraftTables.unregister("r12loc2")
      // backslash unescaping, parse-layer: a deliberate MISMATCH must
      // report the UNESCAPED spelling (proving \\ parsed to \), and the
      // old `'([^']*)'` regex could not even match a ''-doubled literal
      GraftTables.registerCow("r12bs", "/never/graft\\x/t")
      try {
        val e2 = intercept[Exception] {
          spark.sql("CREATE TABLE r12bs (k BIGINT) LOCATION '/never/graft\\\\y/t'")
        }
        assert(e2.getMessage.contains("LOCATION '/never/graft\\y/t' conflicts"),
          e2.getMessage)
      } finally GraftTables.unregister("r12bs")
    } finally GraftTables.unregister("r12loc")
  }

  test("restore refuses a crashed-attempt version above the pointer") {
    val root = Files.createTempDirectory("graft-r12-rst").resolve("t").toString
    FileCow.create(spark, root,
      spark.range(1, 11).select(col("id").as("k"), (col("id") * 10).as("v")),
      statsCols = Seq("k"))                                   // v1
    FileCow.append(spark, root, Seq((50L, 1L)).toDF("k", "v")) // v2
    // plant what a writer crashed inside its lock window leaves behind: a
    // commit record at v3 the pointer never acknowledged
    val rec = mapper.createObjectNode()
    rec.put("version", 3L); rec.put("kind", "append")
    rec.put("commitMs", System.currentTimeMillis())
    rec.put("nFiles", 0L); rec.put("nRows", 0L); rec.put("bytes", 0L)
    rec.putArray("added"); rec.putArray("removed")
    Files.write(Paths.get(root, "_manifests", "m3.commit.json"),
      mapper.writeValueAsBytes(rec))
    assert(FileCow.isRetained(root, 3L), "spec premise: the orphan is retained-shaped")
    val e = intercept[IllegalArgumentException] { FileCow.restore(spark, root, 3L) }
    assert(e.getMessage.contains("not a published version"), e.getMessage)
    assert(FileCow.currentVersion(root) == 2L, "the refusal must not commit")
    // a legitimate rewind still works — and its commit overwrites the orphan
    FileCow.restore(spark, root, 1L)                          // v3 (real)
    assert(FileCow.read(spark, root).count() == 10L)
  }

  test("table stream delivers pre-drift backlog; fails at the batch crossing the drop") {
    val root = Files.createTempDirectory("graft-r12-ts").resolve("t").toString
    FileCow.create(spark, root,
      spark.range(1, 6).select(col("id").as("k"), (col("id") * 10).as("a")),
      statsCols = Seq("k"))                                   // v1
    FileCow.append(spark, root, Seq((100L, 1L)).toDF("k", "a")) // v2
    FileCow.append(spark, root, Seq((101L, 2L)).toDF("k", "a")) // v3
    // the drop lands MID-RUN, from inside the first batch's handler: with
    // maxVersionsPerTrigger=1 the backlog drains (1,2], (2,3] one commit
    // at a time, so batch (2,3] — whose files all still carry the column —
    // is planned AFTER the drop. It must deliver (it used to fail with
    // 'vanished': the guard resolved against the CURRENT schema); the
    // AvailableNow drain then terminates at its prepare-time end (v3),
    // before the drop commit itself.
    val got = mutable.Set.empty[(Long, Long)]
    @volatile var dropped = false
    val q = spark.readStream.format("graft-cow").option("root", root)
      .option("startingVersion", "1").option("maxVersionsPerTrigger", "1").load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        got.synchronized { got ++= b.collect().map(r => (r.getLong(0), r.getLong(1))) }
        if (!dropped) { dropped = true; FileCow.dropColumns(spark, root, Seq("a")); () }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft-r12-ts-ck").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000), "the pre-drift drain must complete")
    assert(got.toSet == Set((100L, 1L), (101L, 2L)),
      s"pre-drift backlog must deliver, got $got")
    // the first batch whose end crosses the drop still fails loudly —
    // pinned via the source seam (the engine path's pin guard fires at
    // restart before getBatch can)
    val pin = FileCow.schemaOf(root, 1L)
    val src = new graft.streaming.CowTableSource(spark.sqlContext, root,
      pin, startVersion = 1L, skipChangeCommits = false)
    val e = intercept[RuntimeException] {
      src.getBatch(Some(LongOffset(3L)), LongOffset(4L))
    }
    assert(e.getMessage.contains("vanished"), e.getMessage)
  }

  test("DV-delta commits record bytesDv and CDF admission isolates the re-read") {
    val root = Files.createTempDirectory("graft-r12-dv").resolve("t").toString
    // v1: one FAT file the DV delete will dirty
    FileCow.create(spark, root,
      spark.range(1, 20001).select(col("id"),
        concat(lit("c-"), col("id")).as("payload")).coalesce(1),
      statsCols = Seq("id"))
    FileCow.setTableProperties(spark, root, Map("graft.dv.enabled" -> "true"))
    def append(tag: String, from: Long): Unit = {
      FileCow.append(spark, root, spark.range(from, from + 3).select(col("id"),
        concat(lit(s"$tag-"), col("id")).as("payload")).coalesce(1))
      ()
    }
    append("v3", 100000)                                      // v3: small
    FileCow.delete(spark, root, col("id") === 7L)             // v4: DV delete
    append("v5", 200000)                                      // v5: small
    val ci = FileCow.commitInfo(root, 4L).get
    assert(ci.kind == "delete_dv" && ci.dvFiles.nonEmpty, ci.toString)
    assert(ci.bytesAdded == 0L && ci.bytesRemoved == 0L)
    // bytesDv = the dirty still-present files' manifest byte total
    val dirty = ci.dvFiles.toSet
    val want = FileCow.manifest(spark, root, 4L).select("file", "bytes").collect()
      .filter(r => dirty(r.getString(0).substring(r.getString(0).lastIndexOf('/') + 1)))
      .map(_.getLong(1)).sum
    assert(want > 0L && ci.bytesDv == want, s"bytesDv=${ci.bytesDv}, want=$want")

    // the drain: cap fits both small appends together but not the DV
    // commit's dirty re-read — the greedy walk must isolate v4
    val small = FileCow.commitInfo(root, 3L).get.bytesAdded
    val cap = small * 3
    assert(ci.bytesDv > cap, s"spec premise: dirty bytes ${ci.bytesDv} > cap $cap")
    val observed = mutable.ArrayBuffer.empty[Set[Long]]
    val q = spark.readStream.format("graft-cow").option("root", root)
      .option("readChangeFeed", "true").option("keys", "id")
      .option("startingVersion", "1")
      .option("maxBytesPerTrigger", cap.toString).load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val vs = b.select("_commit_version").distinct().collect()
          .map(_.getLong(0)).toSet
        observed.synchronized { if (vs.nonEmpty) observed += vs }
        ()
      }
      .option("checkpointLocation", Files.createTempDirectory("graft-r12-dv-ck").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000), "byte-capped AvailableNow must stop")
    // the zero-byte props commit (v2) shares v3's batch but feeds no rows
    assert(observed.toSeq == Seq(Set(3L), Set(4L), Set(5L)),
      s"the DV commit must isolate in its own batch: $observed")
  }
}
