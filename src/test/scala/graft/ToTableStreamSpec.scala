package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.sources.FileCow
import graft.streaming.Event

/** `writeStream.toTable("graft.t")` (VERDICT r13 #2) — the catalog spelling
  * of a streaming write, the first idiom a Delta user types. Spark routes a
  * catalog table without `STREAMING_WRITE` through the
  * `V2TableWithV1Fallback` seam ([[graft.sources.GraftV2Table.v1Table]]) —
  * `format("graft-cow").option("path", location)` — so the micro-batches
  * land on the PROVEN sinks: append mode → the F20 exactly-once append
  * (txn stamp inside the CAS), update mode + `keys`/`orderBy` → the F22
  * keyed latest-wins upsert. The txn identity defaults to a stable hash of
  * the checkpoint location, so the spelling needs no sink options. Spark's
  * fallback requires the writer's format to MATCH the table's provider
  * (`format("graft-cow")` — the same contract stock Spark applies to any
  * non-default provider's `toTable`). */
class ToTableStreamSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  private def sql(q: String) = spark.sql(q)

  private def freshTable(name: String): String = {
    val root = Files.createTempDirectory(s"graft-tt-$name").resolve("t").toString
    sql(s"CREATE TABLE graft.$name (event_id BIGINT, ts TIMESTAMP, " +
      s"user_id BIGINT, event_type STRING, value DOUBLE) USING graft_cow LOCATION '$root'")
    root
  }

  test("toTable append: streamed == batch, txn-stamped commits, restart replays nothing") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val root = freshTable("tt_app")
    val ckpt = Files.createTempDirectory("graft-tt-app-ck").toString
    try {
      val input = MemoryStream[Event]
      def start() = input.toDF().writeStream.format("graft-cow")
        .option("checkpointLocation", ckpt)
        .outputMode("append").toTable("graft.tt_app")

      val q = start()
      try {
        input.addData(Seq(Event(1L, ts(1), 1L, "view", 1.0),
          Event(2L, ts(2), 2L, "view", 2.0)))
        q.processAllAvailable()
        input.addData(Seq(Event(3L, ts(3), 3L, "buy", 3.0)))
        q.processAllAvailable()
      } finally q.stop()

      // table created empty (v1) + one append commit per non-empty batch
      assert(FileCow.currentVersion(root) == 3L)
      // the txn stamp rides INSIDE the commit (F20's exactly-once), with
      // the checkpoint-derived default identity
      val txn = FileCow.commitInfo(root, 3L).get.txn
      assert(txn.exists { case (app, batch) => app.startsWith("ckpt-") && batch == 1L },
        s"expected a checkpoint-derived txn stamp, got $txn")
      assert(sql("SELECT count(*) FROM graft.tt_app").head.getLong(0) == 3L)

      // restart from the checkpoint: nothing replays, new data lands
      val q2 = start()
      try {
        input.addData(Seq(Event(4L, ts(4), 4L, "view", 4.0)))
        q2.processAllAvailable()
      } finally q2.stop()
      assert(FileCow.currentVersion(root) == 4L,
        "a clean restart must not replay a committed batch")
      assert(sql("SELECT count(*) FROM graft.tt_app").head.getLong(0) == 4L)
    } finally sql("DROP TABLE graft.tt_app")
  }

  test("toTable update: keyed latest-wins upsert through the catalog spelling") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    freshTable("tt_up")
    val ckpt = Files.createTempDirectory("graft-tt-up-ck").toString
    try {
      val input = MemoryStream[Event]
      def start() = input.toDF().writeStream.format("graft-cow")
        .option("checkpointLocation", ckpt)
        .option("keys", "user_id").option("orderBy", "ts")
        .outputMode("update").toTable("graft.tt_up")

      def state(): Map[Long, Double] =
        sql("SELECT user_id, value FROM graft.tt_up").collect()
          .map(r => r.getLong(0) -> r.getDouble(1)).toMap

      val q = start()
      try {
        input.addData(Seq(Event(1L, ts(1), 1L, "view", 1.0),
          Event(2L, ts(3), 1L, "buy", 9.0), Event(3L, ts(2), 2L, "view", 2.0)))
        q.processAllAvailable()
        assert(state() == Map(1L -> 9.0, 2L -> 2.0),
          "within-batch dup resolves to the later ts")
        // a stale re-arrival loses; a new key inserts
        input.addData(Seq(Event(4L, ts(1), 1L, "view", 0.5),
          Event(5L, ts(4), 3L, "view", 3.0)))
        q.processAllAvailable()
        assert(state() == Map(1L -> 9.0, 2L -> 2.0, 3L -> 3.0))
      } finally q.stop()
    } finally sql("DROP TABLE graft.tt_up")
  }

  test("toTable honors Trigger.AvailableNow and the table-stream round-trips back out") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val srcRoot = freshTable("tt_src")
    val dstRoot = Files.createTempDirectory("graft-tt-dst").resolve("t").toString
    sql(s"CREATE TABLE graft.tt_dst (event_id BIGINT, ts TIMESTAMP, " +
      s"user_id BIGINT, event_type STRING, value DOUBLE) USING graft_cow LOCATION '$dstRoot'")
    val ckpt = Files.createTempDirectory("graft-tt-an-ck").toString
    try {
      sql("INSERT INTO graft.tt_src VALUES " +
        "(1, TIMESTAMP'2024-01-01 00:01:00', 1, 'view', 1.0), " +
        "(2, TIMESTAMP'2024-01-01 00:02:00', 2, 'view', 2.0)")
      // readStream.table → transform → writeStream.toTable: the catalog
      // spelling on BOTH ends, drained by AvailableNow (the batch-shaped
      // backfill trigger) — the full table-to-table streaming pipe
      // startingVersion=1: the table stream's default start is the version
      // current at stream birth (only FUTURE commits stream), and the
      // backfill insert above already landed as v2
      val q = spark.readStream.option("startingVersion", "1").table("graft.tt_src")
        .where($"value" > 1.5)
        .writeStream.format("graft-cow")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable("graft.tt_dst")
      q.awaitTermination(60000L)
      assert(!q.isActive, "AvailableNow must terminate after draining")
      val got = sql("SELECT event_id FROM graft.tt_dst").collect().map(_.getLong(0)).toSet
      assert(got == Set(2L))
      assert(FileCow.currentVersion(dstRoot) == 2L)
    } finally { sql("DROP TABLE graft.tt_src"); sql("DROP TABLE graft.tt_dst") }
  }

  test("toTable with only the session-wide checkpoint conf: zero options, stable identity") {
    // ADVICE r14: when the checkpoint comes from
    // spark.sql.streaming.checkpointLocation, Spark resolves it AFTER
    // createSink and it is absent from the sink options — the txn
    // identity must then resolve lazily from the running query itself.
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val root = freshTable("tt_conf")
    val confBase = Files.createTempDirectory("graft-tt-conf-ck").toString
    s.conf.set("spark.sql.streaming.checkpointLocation", confBase)
    try {
      val input = MemoryStream[Event]
      // queryName pins the resolved checkpoint to $conf/$name, so the
      // derived identity is stable across restarts of the same stream
      def start() = input.toDF().writeStream.format("graft-cow")
        .queryName("tt_conf_q")
        .outputMode("append").toTable("graft.tt_conf")

      val q = start()
      try {
        input.addData(Seq(Event(1L, ts(1), 1L, "view", 1.0)))
        q.processAllAvailable()
      } finally q.stop()
      assert(FileCow.currentVersion(root) == 2L)
      val txn = FileCow.commitInfo(root, 2L).get.txn
      assert(txn.exists { case (app, batch) => app.startsWith("ckpt-") && batch == 0L },
        s"expected a checkpoint-derived txn stamp, got $txn")

      // restart recovers the same conf-resolved checkpoint → same derived
      // identity → the committed batch must not replay
      val q2 = start()
      try {
        input.addData(Seq(Event(2L, ts(2), 2L, "view", 2.0)))
        q2.processAllAvailable()
      } finally q2.stop()
      assert(FileCow.currentVersion(root) == 3L,
        "a clean restart under the conf checkpoint must not replay a committed batch")
      assert(FileCow.commitInfo(root, 3L).get.txn == txn.map { case (a, _) => (a, 1L) },
        "the restart must derive the SAME txn identity from the conf-resolved checkpoint")
      assert(sql("SELECT count(*) FROM graft.tt_conf").head.getLong(0) == 2L)
    } finally {
      s.conf.unset("spark.sql.streaming.checkpointLocation")
      sql("DROP TABLE graft.tt_conf")
    }
  }

  test("toTable on a snapshot-level table refuses with the cure in the message") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val root = Files.createTempDirectory("graft-tt-snap").resolve("t").toString
    sql(s"CREATE TABLE graft.tt_snap (k BIGINT, v STRING) USING graft LOCATION '$root'")
    try {
      sql("INSERT INTO graft.tt_snap VALUES (1, 'a')")
      val input = MemoryStream[Event]
      val e = intercept[Exception] {
        input.toDF().writeStream
          .option("checkpointLocation",
            Files.createTempDirectory("graft-tt-snap-ck").toString)
          .toTable("graft.tt_snap")
      }
      assert(e.getMessage.contains("cow-table surface"), e.getMessage)
    } finally sql("DROP TABLE graft.tt_snap")
  }
}
