package graft

import java.nio.file.{Files, Paths}

import graft.plans.GraftTables
import graft.sources.{FileCow, GraftTransactions}
import graft.tools.StressMultiWriter

/** G40 × G41 composed across REAL OS PROCESSES: a foreign worker JOINS
  * the coordinator's transaction and CREATEs + fills a table inside it;
  * a THIRD prober process (sharing nothing but the warehouse) must not
  * resolve the name before the coordinator's decision and must resolve
  * it after — cross-process atomic DDL, arbitrated by one conditional
  * put. */
class TxnProcessCatalogSpec extends SparkSpec {

  private def probe(wh: String, name: String): String = {
    val out = Files.createTempDirectory("graft-xpcat-probe").resolve("r").toString
    val p = StressMultiWriter.forkMain("graft.TxnCatalogWorker",
      Seq("probe", wh, name, out))
    assert(p.waitFor() == 0, "prober process failed")
    new String(Files.readAllBytes(Paths.get(out)))
  }

  test("a joined process CREATEs inside the txn: a third process resolves the name only after the coordinator's decision") {
    val wh = Files.createTempDirectory("graft-xpcat-wh").toString
    GraftTables.attachWarehouse(wh)
    try {
      val factRoot = Files.createTempDirectory("graft-xpcat-f").resolve("t").toString
      val newRoot = Files.createTempDirectory("graft-xpcat-n").resolve("t").toString
      val s = spark
      import s.implicits._
      FileCow.create(spark, factRoot,
        Seq((1L, "seed", 0L)).toDF("k", "val", "u"), statsCols = Seq("k"))
      GraftTables.registerCow("xp_fact", factRoot)
      val txnDir = Files.createTempDirectory("graft-xpcat-m").toString
      val marker = GraftTransactions.begin(txnDir)
      try {
        FileCow.append(spark, factRoot,
          Seq((2L, "txn", 1L)).toDF("k", "val", "u"))
        val worker = StressMultiWriter.forkMain("graft.TxnCatalogWorker",
          Seq("create", wh, marker, "xp_new", newRoot))
        assert(worker.waitFor() == 0, "creating worker failed")
        // pre-decision, from a THIRD process: the name must not resolve
        assert(probe(wh, "xp_new") == "absent",
          "a txn-created name leaked to a foreign process before the decision")
        // the worker's table is a registered PARTICIPANT (its INSERT's
        // side record) — the ops view a dead coordinator would leave
        val parts = GraftTransactions.listTransactionsDetailed(txnDir).head._5
        assert(parts.contains(newRoot), parts.toString)
      } finally {
        GraftTransactions.commitActive(spark)
      }
      // post-decision: name + rows resolve in a FRESH process
      val bound = probe(wh, "xp_new")
      assert(bound == s"bound:$newRoot:5", bound)
      // and in this one (the coordinator's own JVM)
      assert(GraftTables.resolveName("xp_new").map(_.root).contains(newRoot))
      assert(FileCow.read(spark, factRoot).count() == 2L)
    } finally GraftTables.detachWarehouse()
  }

  test("an ABORTED creating txn never leaks the name to any process") {
    val wh = Files.createTempDirectory("graft-xpcat-awh").toString
    GraftTables.attachWarehouse(wh)
    try {
      val newRoot = Files.createTempDirectory("graft-xpcat-an").resolve("t").toString
      val txnDir = Files.createTempDirectory("graft-xpcat-am").toString
      val marker = GraftTransactions.begin(txnDir)
      val worker = StressMultiWriter.forkMain("graft.TxnCatalogWorker",
        Seq("create", wh, marker, "xp_gone", newRoot))
      assert(worker.waitFor() == 0)
      GraftTransactions.rollbackActive(spark)
      assert(probe(wh, "xp_gone") == "absent",
        "an aborted creation must never bind the name for any process")
      assert(GraftTables.resolveName("xp_gone").isEmpty)
    } finally GraftTables.detachWarehouse()
  }
}

/** Forked halves of [[TxnProcessCatalogSpec]] (test-tree main, forked
  * with the spec JVM's classpath):
  *  - `create <wh> <marker> <name> <root>`: attach the warehouse, JOIN
  *    the open txn, CREATE the table by SQL intercept and fill it —
  *    binding stamped, rows gated, everything pending the coordinator.
  *  - `probe <wh> <name> <outFile>`: attach and resolve; writes
  *    `bound:<root>:<rowcount>` or `absent`.
  */
object TxnCatalogWorker {
  def main(args: Array[String]): Unit = {
    val mode = args(0); val wh = args(1)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName(s"graft-txncat-$mode")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      GraftTables.attachWarehouse(wh)
      mode match {
        case "create" =>
          val marker = args(2); val name = args(3); val root = args(4)
          GraftTransactions.join(spark, marker) {
            spark.sql(s"CREATE TABLE $name (k BIGINT NOT NULL) " +
              s"USING graft_cow LOCATION '$root'")
            spark.sql(s"INSERT INTO $name VALUES (1), (2), (3), (4), (5)")
          }
          ()
        case "probe" =>
          val name = args(2); val out = args(3)
          val result = GraftTables.resolveName(name) match {
            case Some(e) =>
              s"bound:${e.root}:${FileCow.read(spark, e.root).count()}"
            case None => "absent"
          }
          Files.write(Paths.get(out), result.getBytes)
          ()
      }
    } finally spark.stop()
  }
}
