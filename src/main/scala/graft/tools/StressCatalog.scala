package graft.tools

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.plans.GraftTables
import graft.sources.CatalogStore

/** CROSS-PROCESS exercise of the DURABLE catalog (VERDICT r11 #1): the
  * registry's whole point is that a name CREATEd by one driver process
  * resolves from a second one and after a restart — claims only a real
  * second JVM can prove. Two modes fork as fresh processes against one
  * warehouse dir:
  *
  *  - `reader <wh> <receiptsDir>` — builds its OWN SparkSession with
  *    nothing but `spark.graft.warehouse=<wh>` (the deployment spelling —
  *    no registration call anywhere), resolves the orchestrator's table
  *    BY NAME, counts it, and MERGEs a marker row back through SQL. The
  *    receipt carries what it saw; the orchestrator then reads the marker
  *    row by name — both directions of cross-process resolution proven.
  *  - `racer <wh> <receiptsDir> <writerId> <nOps>` — no Spark at all:
  *    hammers `GraftTables.register/registerCow/unregister` against the
  *    shared store under deliberate lock contention (private names plus a
  *    raced shared name).
  *
  * [[validate]] then proves from the store's artifacts alone:
  *   1. versions are CONTIGUOUS (c1..cV all present and parseable) — the
  *      pointer-swap protocol never skipped or tore a commit;
  *   2. each version differs from its predecessor by EXACTLY ONE binding
  *      mutation — raced RMWs serialized, no lost update folded two
  *      writers' intents into one commit;
  *   3. every racer's PRIVATE names resolve to exactly their last op
  *      (present with the right root, or dropped);
  *   4. the raced SHARED name holds one writer's complete binding, never
  *      a torn mix.
  */
object StressCatalog {

  def session(wh: String, app: String): SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName(app)
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.graft.warehouse", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def writeReceipt(receiptsDir: String, name: String,
      fill: com.fasterxml.jackson.databind.node.ObjectNode => Unit): Unit = {
    Files.createDirectories(Paths.get(receiptsDir))
    val n = mapper.createObjectNode()
    fill(n)
    val tmp = Paths.get(receiptsDir, s"$name.tmp")
    Files.write(tmp, mapper.writeValueAsBytes(n))
    Files.move(tmp, Paths.get(receiptsDir, s"$name.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  def readReceipt(receiptsDir: String,
      name: String): Option[com.fasterxml.jackson.databind.JsonNode] = {
    val p = Paths.get(receiptsDir, s"$name.json")
    if (Files.exists(p)) Some(mapper.readTree(Files.readAllBytes(p))) else None
  }

  // ---------------------------------------------------------------- reader

  /** Resolve + read + write BY NAME from a fresh process whose only link
    * to the tables is the warehouse conf. */
  def reader(spark: SparkSession, wh: String, receiptsDir: String): Unit = {
    // the warehouse attaches when the session's parser builds (lazy
    // sessionState) — resolve by SQL first, registry introspection after
    val rows = spark.sql("SELECT count(*) AS n FROM cat_t").collect().head.getLong(0)
    val entry = GraftTables.entryOf("cat_t").getOrElse(sys.error(
      "cat_t did not resolve from a fresh process — the durable registry failed"))
    spark.sql(
      """MERGE INTO cat_t t USING
        |  (SELECT CAST(999999 AS BIGINT) AS k, 'from-reader' AS v) s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val after = spark.sql("SELECT count(*) AS n FROM cat_t").collect().head.getLong(0)
    writeReceipt(receiptsDir, "reader", { n =>
      n.put("rows", rows); n.put("rowsAfterMerge", after)
      n.put("root", entry.root); n.put("cow", entry.cow)
      ()
    })
  }

  // ----------------------------------------------------------------- racer

  /** Writer `writerId`'s private-name schedule: which seqs survive its own
    * drops (seq−1 is dropped whenever seq % 3 == 0). */
  def survivingSeqs(nOps: Int): Set[Int] =
    (1 to nOps).toSet -- (1 to nOps).collect { case s if s % 3 == 0 => s - 1 }

  def privateName(writerId: Int, seq: Int): String = s"race_w${writerId}_$seq"
  def privateRoot(writerId: Int, seq: Int): String = s"/r/$writerId/$seq"
  def sharedRoot(writerId: Int, seq: Int): String = s"/shared/$writerId/$seq"

  /** Pure registry hammer — no Spark: register private cow names, drop
    * some back, and fight over one shared snapshot name. `sleepMs`
    * paces the loop so a kill harness can SIGKILL it mid-stride. */
  def racer(wh: String, receiptsDir: String, writerId: Int, nOps: Int,
      sleepMs: Long = 0L): Unit = {
    GraftTables.attachWarehouse(wh)
    (1 to nOps).foreach { seq =>
      GraftTables.registerCow(privateName(writerId, seq), privateRoot(writerId, seq))
      if (seq % 3 == 0 && seq > 1)
        GraftTables.unregister(privateName(writerId, seq - 1))
      if (seq % 2 == 0)
        GraftTables.register("race_shared", sharedRoot(writerId, seq))
      if (sleepMs > 0) Thread.sleep(sleepMs)
    }
    writeReceipt(receiptsDir, s"racer$writerId", { n =>
      n.put("writer", writerId); n.put("nOps", nOps)
      ()
    })
  }

  // ------------------------------------------------------------ validation

  def validate(wh: String, writers: Seq[Int], nOps: Int,
      killed: Set[Int] = Set.empty): Seq[String] = {
    val errs = scala.collection.mutable.ArrayBuffer.empty[String]
    val v = CatalogStore.currentVersion(wh)
    if (v < 1L) errs += s"no catalog version committed under $wh"

    // 1 + 2: contiguous versions, each a single-mutation step
    var prev = Map.empty[String, CatalogStore.Binding]
    (1L to v).foreach { w =>
      val snap =
        try CatalogStore.load(wh, w)
        catch { case e: Exception =>
          errs += s"catalog version $w unreadable: ${e.getMessage}"
          prev
        }
      if (snap eq prev) () // unreadable, already reported
      else {
        val added = snap.keySet -- prev.keySet
        val removed = prev.keySet -- snap.keySet
        val changed = (snap.keySet & prev.keySet).filter(k => snap(k) != prev(k))
        val mutations = added.size + removed.size + changed.size
        if (mutations != 1)
          errs += s"catalog version $w applies $mutations mutations " +
            s"(added=$added removed=$removed changed=$changed) — exactly one expected"
        prev = snap
      }
    }

    // 3: every private name's final state equals its writer's last op —
    // for a KILLED writer only the bindings that DID land are checked
    // (they must be exact; which prefix landed is the kill's business)
    val finalSnap = CatalogStore.load(wh, v)
    writers.foreach { w =>
      if (killed.contains(w)) {
        (1 to nOps).foreach { seq =>
          finalSnap.get(privateName(w, seq)).foreach { b =>
            if (b != CatalogStore.Binding(privateRoot(w, seq), cow = true))
              errs += s"killed writer's ${privateName(w, seq)} holds torn binding $b"
          }
        }
      } else {
      val want = survivingSeqs(nOps)
      (1 to nOps).foreach { seq =>
        val name = privateName(w, seq)
        (finalSnap.get(name), want.contains(seq)) match {
          case (Some(b), true) =>
            if (b != CatalogStore.Binding(privateRoot(w, seq), cow = true))
              errs += s"$name holds $b, expected its registered binding"
          case (None, false) => ()
          case (got, _) =>
            errs += s"$name final state $got contradicts the writer's schedule " +
              s"(surviving=${want.contains(seq)})"
        }
      }
      }
    }

    // 4: the shared name holds ONE writer's complete final binding
    if (writers.nonEmpty && nOps >= 2) {
      finalSnap.get("race_shared") match {
        case Some(b) =>
          val legal = for {
            w <- writers; seq <- 2 to nOps by 2
          } yield CatalogStore.Binding(sharedRoot(w, seq), cow = false)
          if (!legal.contains(b))
            errs += s"race_shared holds torn binding $b"
        case None => errs += "race_shared missing from the final catalog"
      }
    }
    errs.toSeq
  }

  // -------------------------------------------------------------- forking

  private val Opens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io", "java.base/java.net",
    "java.base/java.nio", "java.base/java.util",
    "java.base/java.util.concurrent", "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")

  def fork(args: Seq[String], heap: String = "2g"): Process = {
    val java = Paths.get(sys.props("java.home"), "bin", "java").toString
    val cp = sys.props("java.class.path")
    val cmd = Seq(java) ++ Opens.flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED")) ++
      Seq(s"-Xmx$heap", "-Dspark.ui.enabled=false",
        "-Dspark.sql.session.timeZone=UTC", "-cp", cp,
        "graft.tools.StressCatalog") ++ args
    new ProcessBuilder(cmd.asJava)
      .redirectOutput(ProcessBuilder.Redirect.INHERIT)
      .redirectErrorStream(true)
      .start()
  }

  // ----------------------------------------------------------------- mains

  /** Price the catalog's commit path as the registry GROWS (VERDICT r15
    * #5): register `n` bindings one commit at a time, report per-commit
    * latency and bytes written at the start vs the end of the run — the
    * checkpoint+delta log must hold both roughly FLAT in binding count
    * (amortized), where the old whole-snapshot-per-commit shape grew both
    * linearly. One JSON line to stdout. */
  def grow(wh: String, n: Int): String = {
    def dirBytes(): Long = {
      val d = Paths.get(wh, "_catalog")
      if (!Files.exists(d)) return 0L
      val l = Files.list(d)
      try l.iterator().asScala.map(p => Files.size(p)).sum finally l.close()
    }
    var bytesBefore = dirBytes()
    val window = math.max(50, n / 20)
    var firstWindowMs = 0.0
    var firstWindowBytes = 0L
    var t0 = System.nanoTime()
    (1 to n).foreach { i =>
      CatalogStore.commit(wh)(m =>
        m + (f"grow_t$i%06d" -> CatalogStore.Binding(s"/data/grow/t$i", true)))
      if (i == window) {
        firstWindowMs = (System.nanoTime() - t0) / 1e6 / window
        firstWindowBytes = (dirBytes() - bytesBefore) / window
      }
    }
    val totalMs = (System.nanoTime() - t0) / 1e6
    // last window: re-measure at full size
    bytesBefore = dirBytes()
    t0 = System.nanoTime()
    (1 to window).foreach { i =>
      CatalogStore.commit(wh)(m =>
        m + (f"grow_u$i%06d" -> CatalogStore.Binding(s"/data/grow/u$i", true)))
    }
    val lastWindowMs = (System.nanoTime() - t0) / 1e6 / window
    val lastWindowBytes = (dirBytes() - bytesBefore) / window
    val v = CatalogStore.currentVersion(wh)
    s"""{"tool":"catgrow","bindings":$n,"versions":$v,""" +
      s""""first_ms_per_commit":${f"$firstWindowMs%.2f"},""" +
      s""""last_ms_per_commit":${f"$lastWindowMs%.2f"},""" +
      s""""first_bytes_per_commit":$firstWindowBytes,""" +
      s""""last_bytes_per_commit":$lastWindowBytes,""" +
      s""""total_sec":${f"${totalMs / 1000.0}%.1f"}}"""
  }

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("grow") =>
      val Array(_, wh, n) = args
      println(grow(wh, n.toInt))

    case Some("reader") =>
      val Array(_, wh, receiptsDir) = args
      val spark = session(wh, "graft-cat-reader")
      try reader(spark, wh, receiptsDir)
      finally spark.stop()

    case Some("racer") =>
      val wh = args(1); val receiptsDir = args(2)
      val sleepMs = if (args.length > 5) args(5).toLong else 0L
      racer(wh, receiptsDir, args(3).toInt, args(4).toInt, sleepMs)

    // the round-14 catalog kill point: a paced loop of DSv2 DDL on ONE
    // SHARED name — `CREATE TABLE graft.<shared>` (TableAlreadyExists from
    // the other racer is expected and folds to a DROP + retry) — so a
    // SIGKILL lands inside the catalog's lock-held RMW while another
    // process races createTable on the same name
    case Some("ddl") =>
      val Array(_, wh, receiptsDir, id, nOps, paceMs) = args
      val spark = session(wh, s"graft-cat-ddl-$id")
      try {
        val dataDir = Files.createTempDirectory(s"graft-ddl-$id")
        var landed = 0
        var i = 0
        while (landed < nOps.toInt) {
          i += 1
          try {
            spark.sql("CREATE TABLE graft.shared_ddl (k BIGINT NOT NULL) " +
              s"USING graft_cow LOCATION '${dataDir.resolve(s"t$i")}'")
            landed += 1
            spark.sql("DROP TABLE graft.shared_ddl")
          } catch {
            // the other racer owns the name right now: drop if it is
            // still there, then retry the create
            case _: Exception =>
              try spark.sql("DROP TABLE IF EXISTS graft.shared_ddl")
              catch { case _: Exception => () }
          }
          if (paceMs.toLong > 0) Thread.sleep(paceMs.toLong)
        }
        writeReceipt(receiptsDir, s"ddl$id", { n => n.put("landed", landed); () })
      } finally spark.stop()

    // a fresh JVM's view of DECLARED namespaces (VERDICT r13 #3): lists
    // them, reads a property, and declares one of its own for the parent
    // process to see — both directions of durability in one receipt
    case Some("nsreader") =>
      val Array(_, wh, receiptsDir) = args
      val spark = session(wh, "graft-ns-reader")
      try {
        val names = spark.sql("SHOW NAMESPACES IN graft").collect()
          .map(_.getString(0)).sorted.mkString(",")
        val teamProp = spark.sql("DESCRIBE NAMESPACE EXTENDED graft.teams")
          .collect().find(_.getString(0) == "Properties")
          .map(_.getString(1)).getOrElse("")
        spark.sql("CREATE NAMESPACE graft.from_reader " +
          "WITH PROPERTIES ('origin' = 'reader-jvm')")
        writeReceipt(receiptsDir, "nsreader", { n =>
          n.put("namespaces", names); n.put("teamProps", teamProp); ()
        })
      } finally spark.stop()

    case _ =>
      val nOps = args.drop(1).headOption.map(_.toInt).getOrElse(24)
      val base = Files.createTempDirectory("graft-cat")
      val wh = base.resolve("wh").toString
      val receipts = base.resolve("receipts").toString
      val spark = session(wh, "graft-cat-orchestrator")
      val t0 = System.nanoTime()
      spark.sql("CREATE TABLE cat_t (k BIGINT NOT NULL, v STRING) USING graft-cow")
      spark.sql("INSERT INTO cat_t SELECT id, concat('r-', id) FROM range(1, 6)")
      val rp = fork(Seq("reader", wh, receipts))
      val readerExit = rp.waitFor()
      val marker = spark.sql(
        "SELECT count(*) AS n FROM cat_t WHERE v = 'from-reader'")
        .collect().head.getLong(0)
      val ps = Seq(
        fork(Seq("racer", wh, receipts, "1", nOps.toString)),
        fork(Seq("racer", wh, receipts, "2", nOps.toString)))
      val exits = ps.map(_.waitFor())
      val errs = (if (readerExit == 0) Nil else Seq(s"reader exit $readerExit")) ++
        (if (exits.forall(_ == 0)) Nil else Seq(s"racer exits $exits")) ++
        (if (marker == 1L) Nil
         else Seq(s"reader's merged marker row not visible by name ($marker)")) ++
        validate(wh, Seq(1, 2), nOps)
      val secs = (System.nanoTime() - t0) / 1e9
      println(s"""{"tool":"catalog","nOps":$nOps,""" +
        s""""catalogVersion":${CatalogStore.currentVersion(wh)},""" +
        s""""errors":${errs.size},"sec":${math.round(secs * 10) / 10.0}}""")
      errs.foreach(e => println(s"  FAIL: $e"))
      GraftTables.detachWarehouse()
      spark.stop()
      if (errs.nonEmpty) sys.exit(1)
  }
}
