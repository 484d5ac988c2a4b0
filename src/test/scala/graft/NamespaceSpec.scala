package graft

import java.nio.file.Files

import graft.plans.GraftTables
import graft.tools.StressCatalog

/** DURABLE NAMESPACES (VERDICT r13 #3): `CREATE NAMESPACE` persists a
  * record with properties in the same CatalogStore snapshot as the table
  * bindings — so a team can organize empty namespaces ahead of their
  * tables — while table-key-prefix namespaces keep existing implicitly.
  * DROP refuses on a non-empty namespace unless CASCADE, which unbinds
  * the tables and the record in ONE catalog commit. */
class NamespaceSpec extends SparkSpec {

  private def sql(q: String) = spark.sql(q)

  test("CREATE / SHOW / DESCRIBE / ALTER / DROP namespace, with properties") {
    sql("CREATE NAMESPACE graft.ns_a WITH PROPERTIES ('team' = 'etl', 'tier' = 'gold')")
    try {
      // an EMPTY declared namespace lists and describes
      val names = sql("SHOW NAMESPACES IN graft").collect().map(_.getString(0))
      assert(names.contains("ns_a"), names.mkString(","))
      assert(sql("SHOW TABLES IN graft.ns_a").collect().isEmpty)
      val props = sql("DESCRIBE NAMESPACE EXTENDED graft.ns_a").collect()
        .find(_.getString(0) == "Properties").map(_.getString(1)).getOrElse("")
      assert(props.contains("team") && props.contains("etl"), props)

      // IF NOT EXISTS is honored; a bare re-CREATE collides loudly
      sql("CREATE NAMESPACE IF NOT EXISTS graft.ns_a")
      val e = intercept[Exception] { sql("CREATE NAMESPACE graft.ns_a") }
      assert(e.getMessage.toLowerCase.contains("already exists"), e.getMessage)

      // ALTER SET/UNSET round-trips
      sql("ALTER NAMESPACE graft.ns_a SET PROPERTIES ('tier' = 'silver', 'owner2' = 'x')")
      sql("ALTER NAMESPACE graft.ns_a UNSET PROPERTIES ('team')")
      // Spark stamps a reserved `owner` property at CREATE — ignore it
      val p2 = GraftTables.namespaceProps("ns_a").get - "owner"
      assert(p2 == Map("tier" -> "silver", "owner2" -> "x"), p2.toString)

      // a table created under it makes the namespace non-empty
      sql("CREATE TABLE graft.ns_a.t1 (k BIGINT NOT NULL) USING graft_cow LOCATION '" +
        Files.createTempDirectory("graft-ns-t1").resolve("t") + "'")
      assert(sql("SHOW TABLES IN graft.ns_a").collect().map(_.getString(1))
        .contains("t1"))
      val full = intercept[Exception] { sql("DROP NAMESPACE graft.ns_a") }
      assert(full.getMessage.toLowerCase.contains("schema_not_empty") ||
        full.getMessage.toLowerCase.contains("non-empty"), full.getMessage)

      // CASCADE unbinds the table and the record together
      sql("DROP NAMESPACE graft.ns_a CASCADE")
      assert(!sql("SHOW NAMESPACES IN graft").collect().map(_.getString(0))
        .contains("ns_a"))
      assert(GraftTables.entryOf("ns_a.t1").isEmpty, "cascade must unbind the table")
    } finally {
      GraftTables.dropNamespace("ns_a", alsoUnregister = Seq("ns_a.t1"))
    }
  }

  test("concurrent local ALTER NAMESPACE SET never drops a racing change (ADVICE r14)") {
    // warehouse-less sessions hold namespace props in a local map; the
    // read-modify-write must be atomic so two racing ALTERs compose
    GraftTables.createNamespace("ns_race", Map("seed" -> "1"))
    try {
      val threads = (0 until 8).map { i =>
        new Thread(() =>
          GraftTables.alterNamespaceProps("ns_race", Map(s"p$i" -> s"v$i"), Nil))
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val props = GraftTables.namespaceProps("ns_race").get
      (0 until 8).foreach(i => assert(props.get(s"p$i").contains(s"v$i"),
        s"lost update: p$i missing from $props"))
      assert(props.get("seed").contains("1"))
    } finally GraftTables.dropNamespace("ns_race", alsoUnregister = Nil)
  }

  test("implicit namespaces still exist through table keys; ALTER on them demands a declaration") {
    val root = Files.createTempDirectory("graft-ns-imp").resolve("t").toString
    sql(s"CREATE TABLE graft.impns.t (k BIGINT NOT NULL) USING graft_cow LOCATION '$root'")
    try {
      assert(sql("SHOW NAMESPACES IN graft").collect().map(_.getString(0))
        .contains("impns"))
      // DESCRIBE works (no properties), ALTER names the cure
      assert(sql("DESCRIBE NAMESPACE graft.impns").collect().nonEmpty)
      val e = intercept[Exception] {
        sql("ALTER NAMESPACE graft.impns SET PROPERTIES ('a' = 'b')")
      }
      assert(e.getMessage.contains("CREATE NAMESPACE"), e.getMessage)
      // an implicit name cannot be re-CREATEd over
      val c = intercept[Exception] { sql("CREATE NAMESPACE graft.impns") }
      assert(c.getMessage.toLowerCase.contains("already exists"), c.getMessage)
    } finally sql("DROP TABLE graft.impns.t")
  }

  test("declared namespaces are DURABLE and cross-process (forked JVM, both directions)") {
    val base = Files.createTempDirectory("graft-ns-x")
    val wh = base.resolve("wh").toString
    val receipts = base.resolve("receipts").toString
    GraftTables.attachWarehouse(wh)
    try {
      sql("CREATE NAMESPACE graft.teams WITH PROPERTIES ('lead' = 'ada')")
      sql("CREATE NAMESPACE graft.empty_ns")
      val p = StressCatalog.fork(Seq("nsreader", wh, receipts))
      assert(p.waitFor() == 0, "nsreader process failed")
      val r = StressCatalog.readReceipt(receipts, "nsreader").get
      val seen = r.get("namespaces").asText()
      assert(seen.contains("teams") && seen.contains("empty_ns"), seen)
      assert(r.get("teamProps").asText().contains("lead"), r.toString)
      // the reader's own declaration is visible HERE
      assert(sql("SHOW NAMESPACES IN graft").collect().map(_.getString(0))
        .contains("from_reader"))
      assert(GraftTables.namespaceProps("from_reader")
        .exists(_.get("origin").contains("reader-jvm")))
    } finally {
      GraftTables.dropNamespace("teams")
      GraftTables.dropNamespace("empty_ns")
      GraftTables.dropNamespace("from_reader")
      GraftTables.detachWarehouse()
    }
  }
}
