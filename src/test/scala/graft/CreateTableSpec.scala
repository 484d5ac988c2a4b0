package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

import org.apache.spark.sql.functions._

import graft.plans.GraftTables
import graft.sources.FileCow

/** Plain `CREATE TABLE t (col type [NOT NULL], …)` — the migrating user's
  * ACTUAL first statement (VERDICT r10 #2): an EMPTY table with a declared
  * schema, before any seed query exists to CTAS from. Pins: empty v1 with
  * the declared schema + parquet field ids (column mapping from birth —
  * RENAME stays metadata-only, same as CTAS), the full lifecycle on top
  * (INSERT → MERGE → stream-shaped append → time travel → history from
  * v1), NOT NULL riding the CHECK-constraint seam on every future write,
  * STATS/TBLPROPERTIES clauses, IF NOT EXISTS, layout/location validation,
  * the snapshot-layout twin, delegation of unregistered names, and the
  * SHOW CREATE round-trip (the emitted DDL replays VERBATIM, `-- STATS`
  * comment and bloom statement included).
  */
class CreateTableSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String, cow: Boolean = true): String = {
    val root = Files.createTempDirectory(s"graft-ct-$name").toString
    if (cow) GraftTables.registerCow(name, root) else GraftTables.register(name, root)
    root
  }

  private def deleteTree(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f =>
        Files.deleteIfExists(f))

  test("CREATE TABLE (schema) commits an empty v1; INSERT/MERGE/append/time-travel ride it") {
    val root = fresh("ct_orders")
    spark.sql("CREATE TABLE ct_orders (k BIGINT NOT NULL, name STRING, " +
      "amt DECIMAL(10,2), ts TIMESTAMP)")

    // v1: empty, declared schema (with nullability), field ids from birth
    assert(FileCow.currentVersion(root) == 1L)
    assert(spark.sql("SELECT count(*) c FROM ct_orders").as[Long].head() == 0L)
    val schema = FileCow.schemaOf(root, 1L)
    assert(schema.fieldNames.toSeq == Seq("k", "name", "amt", "ts"))
    assert(!schema("k").nullable && schema("name").nullable)
    assert(schema("amt").dataType.sql == "DECIMAL(10,2)", "balanced-paren types")
    assert(schema.fields.forall(_.metadata.contains("parquet.field.id")),
      "column mapping from birth, matching CTAS")
    // prune columns derived from the declared schema, exactly as CTAS
    assert(FileCow.statsColsOf(spark, root, 1L) == Seq("k", "name", "amt", "ts"))

    // INSERT into the empty table appends (v2), no bootstrap ambiguity
    spark.sql("INSERT INTO ct_orders VALUES " +
      "(1, 'a', 10.50, TIMESTAMP '2026-01-01 00:00:00'), " +
      "(2, 'b', 2.25, TIMESTAMP '2026-01-02 00:00:00')")
    assert(FileCow.currentVersion(root) == 2L)
    assert(spark.sql("SELECT sum(amt) s FROM ct_orders").as[java.math.BigDecimal]
      .head().doubleValue() == 12.75)

    // MERGE upserts against it
    Seq((2L, "b2", "9.00"), (3L, "c", "1.00"))
      .toDF("k", "name", "amt")
      .withColumn("amt", col("amt").cast("decimal(10,2)"))
      .withColumn("ts", lit("2026-01-03 00:00:00").cast("timestamp"))
      .createOrReplaceTempView("ct_inc")
    spark.sql("MERGE INTO ct_orders t USING ct_inc s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(spark.sql("SELECT name FROM ct_orders WHERE k = 2").as[String].head() == "b2")
    assert(spark.sql("SELECT count(*) c FROM ct_orders").as[Long].head() == 3L)

    // the empty v1 stays time-travelable; history starts at the create
    assert(spark.sql("SELECT count(*) c FROM ct_orders VERSION AS OF 1")
      .as[Long].head() == 0L)
    val hist = spark.sql("DESCRIBE HISTORY ct_orders")
      .select("version", "operation").orderBy("version")
      .as[(Long, String)].collect().toSeq
    assert(hist.head == ((1L, "create")), s"history from v1: $hist")

    // declared-schema rename is metadata-only (the column-mapping payoff)
    val before = FileCow.manifest(spark, root, FileCow.currentVersion(root))
      .select("file").as[String].collect().toSet
    spark.sql("ALTER TABLE ct_orders RENAME COLUMN name TO title")
    val after = FileCow.manifest(spark, root, FileCow.currentVersion(root))
      .select("file").as[String].collect().toSet
    assert(before == after, "rename on a born-mapped table rewrites nothing")
    assert(spark.sql("SELECT title FROM ct_orders WHERE k = 3").as[String].head() == "c")
    GraftTables.unregister("ct_orders")
  }

  test("NOT NULL is enforced on every future write through the constraint seam") {
    val root = fresh("ct_nn")
    spark.sql("CREATE TABLE ct_nn (k BIGINT NOT NULL, v STRING)")
    assert(FileCow.constraintsOf(root, 1L) == Map("nn_k" -> "k IS NOT NULL"))

    spark.sql("INSERT INTO ct_nn VALUES (1, 'ok'), (2, NULL)") // v nullable: fine
    val e = intercept[Exception] {
      spark.sql("INSERT INTO ct_nn VALUES (CAST(NULL AS BIGINT), 'bad')")
    }
    assert(e.getMessage.contains("nn_k"), s"got: ${e.getMessage}")
    // the violating write landed nothing
    assert(spark.sql("SELECT count(*) c FROM ct_nn").as[Long].head() == 2L)
    GraftTables.unregister("ct_nn")
  }

  test("STATS and TBLPROPERTIES clauses land in the single create commit") {
    val root = fresh("ct_props")
    spark.sql("CREATE TABLE ct_props (k BIGINT, h STRING) STATS (k) " +
      "TBLPROPERTIES ('graft.bloom.items' = '100000', 'owner.note' = 'x')")
    assert(FileCow.currentVersion(root) == 1L, "one commit, not create+props")
    assert(FileCow.statsColsOf(spark, root, 1L) == Seq("k"))
    val props = FileCow.tableProps(root, 1L)
    assert(props("graft.bloom.items") == "100000" && props("owner.note") == "x")

    // a typo'd sizing property fails the create loudly, bricking nothing
    val root2 = fresh("ct_badprop")
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE ct_badprop (k BIGINT) " +
        "TBLPROPERTIES ('graft.bloom.items' = 'ten')")
    }
    assert(e.getMessage.contains("positive integer"))
    assert(FileCow.currentVersion(root2) == 0L)
    GraftTables.unregister("ct_props"); GraftTables.unregister("ct_badprop")
  }

  test("IF NOT EXISTS, double-create, layout and location validation, delegation") {
    val root = fresh("ct_guard")
    spark.sql("CREATE TABLE IF NOT EXISTS ct_guard (k BIGINT)")
    spark.sql("CREATE TABLE IF NOT EXISTS ct_guard (k BIGINT)") // silent keep
    assert(FileCow.currentVersion(root) == 1L)
    val dup = intercept[Exception] { spark.sql("CREATE TABLE ct_guard (k BIGINT)") }
    assert(dup.getMessage.contains("already exists"))

    val lay = intercept[Exception] {
      spark.sql("CREATE TABLE IF NOT EXISTS ct_guard (k BIGINT) USING graft")
    }
    assert(lay.getMessage.contains("registered as"), "USING must match the layout")
    val loc = intercept[Exception] {
      spark.sql("CREATE TABLE IF NOT EXISTS ct_guard (k BIGINT) LOCATION '/elsewhere'")
    }
    assert(loc.getMessage.contains("registered root"))
    val ctas = intercept[Exception] {
      spark.sql("CREATE TABLE ct_guard (k BIGINT) AS SELECT 1 AS k")
    }
    assert(ctas.getMessage.contains("cannot combine with AS"))
    // OR REPLACE with a column list must refuse loudly, not fall through
    // to Spark's catalog and shadow the registered name
    val orr = intercept[Exception] {
      spark.sql("CREATE OR REPLACE TABLE ct_guard (k BIGINT)")
    }
    assert(orr.getMessage.contains("declared-schema replace"))

    // a column list on an UNREGISTERED name is Spark's own CREATE TABLE
    spark.sql("CREATE TABLE ct_delegated (k BIGINT) USING parquet")
    assert(spark.sql("SELECT count(*) c FROM ct_delegated").as[Long].head() == 0L)
    spark.sql("DROP TABLE ct_delegated")
    GraftTables.unregister("ct_guard")
  }

  test("two concurrent CREATE IF NOT EXISTS both succeed; exactly one v1 lands") {
    val root = fresh("ct_race")
    val start = new java.util.concurrent.CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = (1 to 2).map { _ =>
      new Thread(() => {
        start.await()
        try spark.sql("CREATE TABLE IF NOT EXISTS ct_race (k BIGINT)")
        catch { case t: Throwable => errs.add(t); () }
      })
    }
    ts.foreach(_.start()); start.countDown(); ts.foreach(_.join(60000))
    // the loser of the create CAS must land on "silently keep the table",
    // never a concurrency error — the statement is declared idempotent
    assert(errs.isEmpty, s"IF NOT EXISTS must absorb the race: ${errs.peek()}")
    assert(FileCow.currentVersion(root) == 1L)
    GraftTables.unregister("ct_race")
  }

  test("snapshot-layout CREATE refuses contracts it cannot keep") {
    GraftTables.register("ct_snapstats",
      Files.createTempDirectory("ct-snapstats").toString)
    val e1 = intercept[Exception] {
      spark.sql("CREATE TABLE ct_snapstats (k BIGINT) STATS (k)")
    }
    assert(e1.getMessage.contains("cow-table surface"))
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE ct_snapstats (k BIGINT NOT NULL)")
    }
    assert(e2.getMessage.contains("NOT NULL"), s"got: ${e2.getMessage}")
    GraftTables.unregister("ct_snapstats")
  }

  test("snapshot-layout CREATE publishes an empty v1 on the Versioned layout") {
    val root = fresh("ct_snap", cow = false)
    spark.sql("CREATE TABLE ct_snap (k BIGINT, v STRING) USING graft")
    assert(graft.sources.Versioned.currentVersion(root) == 1L)
    assert(spark.sql("SELECT count(*) c FROM ct_snap").as[Long].head() == 0L)
    spark.sql("INSERT INTO ct_snap VALUES (1, 'a')")
    assert(spark.sql("SELECT v FROM ct_snap WHERE k = 1").as[String].head() == "a")
    // properties are a cow surface: declared loudly, not silently dropped
    val e = intercept[Exception] {
      GraftTables.register("ct_snap2", Files.createTempDirectory("ct-snap2").toString)
      spark.sql("CREATE TABLE ct_snap2 (k BIGINT) TBLPROPERTIES ('a' = 'b')")
    }
    assert(e.getMessage.contains("cow-table surface"))
    GraftTables.unregister("ct_snap"); GraftTables.unregister("ct_snap2")
  }

  test("SHOW CREATE TABLE output replays verbatim: schema, props, stats, bloom") {
    val root = fresh("ct_rt")
    spark.sql("CREATE TABLE ct_rt (k BIGINT NOT NULL, h STRING, amt DOUBLE) " +
      "STATS (k, amt) TBLPROPERTIES ('owner.note' = 'rt')")
    spark.sql("CREATE BLOOMFILTER INDEX ON ct_rt FOR COLUMNS (h)")
    spark.sql("ALTER TABLE ct_rt ADD CONSTRAINT amt_pos CHECK (amt >= 0)")
    // the hard round-trip: parens AND a ''-escaped string literal inside a
    // property value (the balanced scan + ''-aware pair parser's reason)
    spark.sql("ALTER TABLE ct_rt ADD CONSTRAINT h_ok " +
      "CHECK ((h <> 'q') AND (h <> 'y''z'))")
    // backslashes in a stored predicate (a regex) must also survive:
    // SHOW CREATE escapes them, parsePropPairs unescapes — the identity
    spark.sql("""ALTER TABLE ct_rt ADD CONSTRAINT h_re CHECK (h RLIKE 'x|\\d*')""")
    val ddl = spark.sql("SHOW CREATE TABLE ct_rt").as[String].head()
    assert(ddl.contains("k BIGINT NOT NULL") && ddl.contains("-- STATS (k, amt)"))

    // out-of-band drop (the migration target: an empty root), then replay
    // the emitted DDL verbatim — statement by statement, as a user would
    deleteTree(java.nio.file.Paths.get(root))
    ddl.split(";\n").map(_.trim).filter(_.nonEmpty).foreach(spark.sql(_))

    assert(FileCow.currentVersion(root) == 1L)
    val schema = FileCow.schemaOf(root, 1L)
    assert(schema.fieldNames.toSeq == Seq("k", "h", "amt") && !schema("k").nullable)
    assert(FileCow.statsColsOf(spark, root, 1L) == Seq("k", "amt"),
      "the -- STATS comment is honored as the prune declaration")
    val props = FileCow.tableProps(root, 1L)
    assert(props("owner.note") == "rt")
    assert(props("graft.constraints.amt_pos") == "amt >= 0",
      "CHECK constraints ride properties through the round-trip")
    assert(props("graft.constraints.h_ok") == "(h <> 'q') AND (h <> 'y''z')",
      "parens and ''-escaped literals survive the TBLPROPERTIES round-trip")
    assert(props("graft.constraints.h_re") == """h RLIKE 'x|\\d*'""",
      "backslashes survive the TBLPROPERTIES round-trip verbatim")
    assert(props("graft.constraints.nn_k") == "k IS NOT NULL")
    assert(graft.sources.BloomStore.columns(root) == Seq("h"),
      "the emitted CREATE BLOOMFILTER INDEX statement re-declares the index")

    // the replayed table is live: NOT NULL still enforced, insert works
    spark.sql("INSERT INTO ct_rt VALUES (1, 'x', 2.0)")
    assert(spark.sql("SELECT h FROM ct_rt WHERE k = 1").as[String].head() == "x")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO ct_rt VALUES (CAST(NULL AS BIGINT), 'y', 1.0)")
    }
    assert(e.getMessage.contains("nn_k"))
    GraftTables.unregister("ct_rt")
  }

  test("a created-empty table serves as a stream sink target from v1") {
    val root = fresh("ct_stream")
    spark.sql("CREATE TABLE ct_stream (k BIGINT, v STRING)")
    // the graft-cow batch writer appends to the existing empty table the
    // way a foreachBatch stream sink would, one commit per batch
    Seq((1L, "s1")).toDF("k", "v").write.format("graft-cow")
      .option("root", root).mode("append").save()
    Seq((2L, "s2")).toDF("k", "v").write.format("graft-cow")
      .option("root", root).mode("append").save()
    assert(FileCow.currentVersion(root) == 3L)
    assert(spark.sql("SELECT count(*) c FROM ct_stream").as[Long].head() == 2L)
    GraftTables.unregister("ct_stream")
  }
}
