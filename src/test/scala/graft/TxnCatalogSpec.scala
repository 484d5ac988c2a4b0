package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicReference

import graft.plans.GraftTables
import graft.sources.{FileCow, GraftTransactions}

/** G41 — CREATE TABLE inside a cross-table transaction: the NAME carries
  * the atomicity. The new table's v1 lands clean (a bootstrap has no
  * clean version to revert to), but its catalog binding is stamped with
  * the txn marker and resolves ONLY at the decision — so a pipeline that
  * creates a table and fills it alongside existing tables flips
  * name+data+siblings with one conditional put, and an abort leaves the
  * name unbound (re-CREATE of the same name replaces the aborted stamp).
  * DROP / RENAME / DROP NAMESPACE inside a txn refuse loudly — they land
  * immediately and cannot be reverted on abort. */
class TxnCatalogSpec extends SparkSpec {

  private def onThread[T](body: => T): T = {
    val out = new AtomicReference[T]()
    val err = new AtomicReference[Throwable]()
    val t = new Thread(() =>
      try out.set(body) catch { case e: Throwable => err.set(e) })
    t.start(); t.join()
    if (err.get() != null) throw err.get()
    out.get()
  }

  private def withWarehouse[T](body: String => T): T = {
    val whDir = Files.createTempDirectory("graft-txncat-wh").toString
    GraftTables.attachWarehouse(whDir)
    try body(whDir) finally GraftTables.detachWarehouse()
  }

  test("CREATE + INSERT inside a txn: the NAME flips with the decision, atomically with a sibling table's rows") {
    withWarehouse { wh =>
      val factRoot = Files.createTempDirectory("graft-txncat-f").resolve("t").toString
      val newRoot = Files.createTempDirectory("graft-txncat-n").resolve("t").toString
      spark.sql(s"CREATE TABLE graft.txncat_fact (k BIGINT NOT NULL, val STRING) " +
        s"USING graft_cow LOCATION '$factRoot'")
      spark.sql("INSERT INTO txncat_fact VALUES (1, 'seed')")
      val txnDir = Files.createTempDirectory("graft-txncat-m").toString
      GraftTransactions.run(spark, txnDir) {
        spark.sql(s"CREATE TABLE graft.txncat_new (k BIGINT NOT NULL, val STRING) " +
          s"USING graft_cow LOCATION '$newRoot'")
        spark.sql("INSERT INTO txncat_new VALUES (10, 'new')")
        spark.sql("INSERT INTO txncat_fact VALUES (2, 'txn')")
        // the creating txn reads its own name and rows
        assert(GraftTables.resolveName("txncat_new").isDefined)
        assert(spark.sql("SELECT * FROM txncat_new").count() == 1L)
        // a FOREIGN observer sees NEITHER the name nor the sibling's row
        onThread {
          assert(GraftTables.resolveName("txncat_new").isEmpty,
            "a txn-created name must not resolve before the decision")
          assert(!GraftTables.all().exists(_._1 == "txncat_new"),
            "SHOW GRAFT TABLES must hide a pending txn-created name")
          assert(FileCow.read(spark, factRoot).count() == 1L)
        }
      }
      // ONE decision: name + its rows + the sibling's row, together
      assert(GraftTables.resolveName("txncat_new").map(_.root).contains(newRoot))
      assert(GraftTables.all().exists(_._1 == "txncat_new"))
      assert(spark.sql("SELECT * FROM txncat_new").count() == 1L)
      assert(FileCow.read(spark, factRoot).count() == 2L)
    }
  }

  test("CTAS inside a txn (parser front door): created, filled, and named atomically") {
    withWarehouse { wh =>
      val root = Files.createTempDirectory("graft-txncat-c").resolve("t").toString
      val txnDir = Files.createTempDirectory("graft-txncat-cm").toString
      GraftTransactions.run(spark, txnDir) {
        spark.sql(s"CREATE TABLE txncat_ctas USING graft_cow LOCATION '$root' " +
          "AS SELECT id AS k, CAST(id AS STRING) AS val FROM range(5)")
        onThread {
          assert(GraftTables.resolveName("txncat_ctas").isEmpty)
        }
      }
      assert(spark.sql("SELECT * FROM txncat_ctas").count() == 5L)
    }
  }

  test("an ABORTED creating txn leaves the name unbound; re-CREATE of the name replaces the aborted stamp") {
    withWarehouse { wh =>
      val root1 = Files.createTempDirectory("graft-txncat-a1").resolve("t").toString
      val root2 = Files.createTempDirectory("graft-txncat-a2").resolve("t").toString
      val txnDir = Files.createTempDirectory("graft-txncat-am").toString
      val e = intercept[RuntimeException] {
        GraftTransactions.run(spark, txnDir) {
          spark.sql(s"CREATE TABLE graft.txncat_gone (k BIGINT NOT NULL) " +
            s"USING graft_cow LOCATION '$root1'")
          spark.sql("INSERT INTO txncat_gone VALUES (1)")
          sys.error("boom")
        }
      }
      assert(e.getMessage.contains("boom"))
      assert(GraftTables.resolveName("txncat_gone").isEmpty,
        "an aborted creation must never bind the name")
      assert(!GraftTables.all().exists(_._1 == "txncat_gone"))
      // the aborted stamp is ABSENT for a new CREATE: same name, new root
      spark.sql(s"CREATE TABLE graft.txncat_gone (k BIGINT NOT NULL) " +
        s"USING graft_cow LOCATION '$root2'")
      assert(GraftTables.resolveName("txncat_gone").map(_.root).contains(root2))
      spark.sql("INSERT INTO txncat_gone VALUES (7)")
      assert(spark.sql("SELECT * FROM txncat_gone").count() == 1L)
    }
  }

  test("consistentRead pins NAME resolution: a name committed mid-scope stays unresolvable until the scope ends") {
    withWarehouse { wh =>
      val root = Files.createTempDirectory("graft-txncat-s").resolve("t").toString
      val txnDir = Files.createTempDirectory("graft-txncat-sm").toString
      // the txn begins BEFORE the scope and decides MID-scope — the
      // scope's snapshot-at-start rule (decisions stamped after scope
      // start read as pending) must govern the catalog too
      val done = new java.util.concurrent.CountDownLatch(1)
      val committed = new java.util.concurrent.CountDownLatch(1)
      val creator = new Thread(() => {
        GraftTransactions.run(spark, txnDir) {
          spark.sql(s"CREATE TABLE graft.txncat_scoped (k BIGINT NOT NULL) " +
            s"USING graft_cow LOCATION '$root'")
          done.await()
        }
        committed.countDown()
      })
      creator.start()
      // wait for the STAMPED BINDING to land (catalog version advances)
      // before opening the scope — the scope's first resolution must
      // observe the pending marker to have anything to pin
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (graft.sources.CatalogStore.currentVersion(wh) < 1L &&
        System.nanoTime() < deadline) Thread.sleep(20)
      assert(graft.sources.CatalogStore.currentVersion(wh) >= 1L)
      onThread {
        GraftTransactions.consistentRead {
          assert(GraftTables.resolveName("txncat_scoped").isEmpty,
            "pre-decision: pending name invisible")
          done.countDown() // let the creator COMMIT mid-scope
          committed.await()
          assert(GraftTables.resolveName("txncat_scoped").isEmpty,
            "a decision stamped mid-scope must stay pinned out of the scope")
        }
        // a FRESH observation sees the committed name
        assert(GraftTables.resolveName("txncat_scoped").isDefined,
          "post-scope: the committed name resolves")
      }
      creator.join()
    }
  }

  test("DROP / RENAME / DROP NAMESPACE inside a txn refuse loudly (they cannot be reverted on abort)") {
    withWarehouse { wh =>
      val root = Files.createTempDirectory("graft-txncat-d").resolve("t").toString
      spark.sql(s"CREATE TABLE graft.txncat_keep (k BIGINT NOT NULL) " +
        s"USING graft_cow LOCATION '$root'")
      val txnDir = Files.createTempDirectory("graft-txncat-dm").toString
      GraftTransactions.run(spark, txnDir) {
        val d = intercept[Throwable] { GraftTables.unregister("txncat_keep") }
        assert(d.getMessage.contains("not transactional"), d.getMessage)
        val r = intercept[Throwable] {
          GraftTables.rename("txncat_keep", "txncat_keep2") }
        assert(r.getMessage.contains("not transactional"), r.getMessage)
        val n = intercept[Throwable] { GraftTables.dropNamespace("team_x") }
        assert(n.getMessage.contains("not transactional"), n.getMessage)
      }
      assert(GraftTables.resolveName("txncat_keep").isDefined)
    }
  }

  test("CREATE inside a txn without a warehouse refuses with the cure (the gated binding must be durable)") {
    val root = Files.createTempDirectory("graft-txncat-nw").resolve("t").toString
    val txnDir = Files.createTempDirectory("graft-txncat-nwm").toString
    val e = intercept[Throwable] {
      GraftTransactions.run(spark, txnDir) {
        spark.sql(s"CREATE TABLE txncat_nowh (k BIGINT NOT NULL) " +
          s"USING graft_cow LOCATION '$root'")
      }
    }
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(chain(e).contains("attached graft warehouse"), chain(e))
  }
}
