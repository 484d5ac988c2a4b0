package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources._

/** The CONDITIONAL-PUT commit protocol at the object-store level (VERDICT
  * r13 #1): record put-if-absent is the commit point, artifacts roll
  * forward idempotently, the pointer is a monotonic hint — pinned against
  * an in-memory store double with the three injectable failure modes a
  * network object store actually has (lost responses, duplicate delivery,
  * stale reads). No Spark: these cases drive [[ConditionalPutBackend]]
  * directly with real staged files, because the protocol itself is pure
  * driver-side filesystem + store arithmetic. */
class CommitBackendSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** A staged commit for version `v` under `root`: one staged manifest dir
    * (with a one-byte file inside) and one staged schema file, shaped like
    * CowWritePath's staging. */
  private def stage(root: String, v: Long, tag: String): StagedCommit = {
    val manifests = Paths.get(root, "_manifests")
    Files.createDirectories(manifests)
    val uid = java.util.UUID.randomUUID().toString.take(8)
    val dirTmp = manifests.resolve(s"m$v.staging-$uid")
    Files.createDirectories(dirTmp)
    Files.write(dirTmp.resolve("part-0.parquet"),
      s"manifest-$tag".getBytes(StandardCharsets.UTF_8))
    val schemaTmp = manifests.resolve(s"m$v.schema.staging-$uid")
    Files.write(schemaTmp, s"schema-$tag".getBytes(StandardCharsets.UTF_8))
    val rec = mapper.createObjectNode()
    rec.put("version", v); rec.put("kind", "append"); rec.put("tag", tag)
    var committed = 0
    StagedCommit(
      next = v,
      record = rec,
      recordPath = manifests.resolve(s"m$v.commit.json"),
      orphanDirs = Seq(manifests.resolve(s"m$v")),
      dirMoves = Seq(dirTmp -> manifests.resolve(s"m$v")),
      fileMoves = Seq(schemaTmp -> manifests.resolve(s"m$v.schema.json")),
      absentCleanups = Nil,
      onCommitted = () => committed += 1)
  }

  private def fresh(): String =
    Files.createTempDirectory("graft-cput").resolve("t").toString

  private def fixedManifest(root: String, v: Long): Path =
    Paths.get(root, "_manifests", s"m$v")
  private def fixedSchema(root: String, v: Long): Path =
    Paths.get(root, "_manifests", s"m$v.schema.json")
  private def recordPath(root: String, v: Long): Path =
    Paths.get(root, "_manifests", s"m$v.commit.json")

  test("happy path: publish lands artifacts at fixed names, advances the hint") {
    val root = fresh()
    val store = new MemoryObjectStore
    val be = new ConditionalPutBackend(store)
    assert(be.currentVersion(root) == 0L)
    be.publish(root, 0L, stage(root, 1L, "a"))
    assert(be.currentVersion(root) == 1L)
    assert(Files.exists(fixedManifest(root, 1L)))
    assert(Files.exists(fixedSchema(root, 1L)))
    assert(new String(store.read(Paths.get(root, "_current").toString).get,
      StandardCharsets.UTF_8).trim == "1")
    be.publish(root, 1L, stage(root, 2L, "b"))
    assert(be.currentVersion(root) == 2L)
  }

  test("loser: stale expected throws ConcurrentPublishException and cleans its temps") {
    val root = fresh()
    val store = new MemoryObjectStore
    val be = new ConditionalPutBackend(store)
    be.publish(root, 0L, stage(root, 1L, "w"))
    val loser = stage(root, 1L, "l") // derived from v0, but the table is at 1
    val e = intercept[ConcurrentPublishException] {
      be.publish(root, 0L, loser)
    }
    assert(e.getMessage.contains("expected version 0"))
    assert(!Files.exists(loser.dirMoves.head._1), "loser's staged dir must be cleaned")
    assert(!Files.exists(loser.fileMoves.head._1), "loser's staged file must be cleaned")
    assert(be.currentVersion(root) == 1L)
  }

  test("race on one version: exactly one winner, the loser loses by the RECORD put") {
    val root = fresh()
    val store = new MemoryObjectStore
    val be = new ConditionalPutBackend(store)
    // both stage against v0 BEFORE either commits — the preflight version
    // check passes for both; only the put-if-absent can decide
    val a = stage(root, 1L, "a")
    val b = stage(root, 1L, "b")
    be.publish(root, 0L, a)
    intercept[ConcurrentPublishException] { be.publish(root, 0L, b) }
    assert(be.currentVersion(root) == 1L)
    val rec = mapper.readTree(store.read(recordPath(root, 1L).toString).get)
    assert(rec.get("tag").asText() == "a", "the first record put owns the version")
    assert(new String(Files.readAllBytes(
      fixedManifest(root, 1L).resolve("part-0.parquet")),
      StandardCharsets.UTF_8) == "manifest-a")
  }

  test("lost response: the put APPLIED, the caller's read-back recognizes its own uid") {
    val root = fresh()
    val store = new FaultyObjectStore(new MemoryObjectStore)
    val be = new ConditionalPutBackend(store)
    store.lostPutResponses.set(1) // the record put lands but the response dies
    be.publish(root, 0L, stage(root, 1L, "a")) // must NOT throw
    assert(be.currentVersion(root) == 1L)
    assert(Files.exists(fixedManifest(root, 1L)))
    // and the commit is exactly-once: a follow-up lands at 2, not a re-1
    be.publish(root, 1L, stage(root, 2L, "b"))
    assert(be.currentVersion(root) == 2L)
  }

  test("lost response + stale read-back: one stale 'absent' does not double-commit") {
    val root = fresh()
    val store = new FaultyObjectStore(new MemoryObjectStore)
    val be = new ConditionalPutBackend(store)
    // the record put applies, response lost; the FIRST read-back serves the
    // key's prior state (absent) — the protocol's bounded re-read converges
    // on the truth instead of concluding "did not apply"
    store.lostPutResponses.set(1)
    store.staleReads.set(1)
    be.publish(root, 0L, stage(root, 1L, "a"))
    assert(be.currentVersion(root) == 1L)
    val rec = mapper.readTree(store.read(recordPath(root, 1L).toString).get)
    assert(rec.get("tag").asText() == "a")
  }

  test("duplicate delivery: a retransmitted record put is a no-op (if-absent is the idempotence)") {
    val root = fresh()
    val store = new FaultyObjectStore(new MemoryObjectStore)
    val be = new ConditionalPutBackend(store)
    store.duplicateDeliveries.set(1)
    be.publish(root, 0L, stage(root, 1L, "a"))
    assert(be.currentVersion(root) == 1L)
    be.publish(root, 1L, stage(root, 2L, "b"))
    assert(be.currentVersion(root) == 2L)
  }

  test("crashed winner: a landed record with un-rolled artifacts completes on the next probe") {
    val root = fresh()
    val store = new MemoryObjectStore
    val be = new ConditionalPutBackend(store)
    be.publish(root, 0L, stage(root, 1L, "a"))
    // model a winner SIGKILLed between its record put and its roll-forward:
    // stage v2 by hand, enrich the record exactly as publish would, put it,
    // and DIE (no renames, no hint advance)
    val sc = stage(root, 2L, "crash")
    val uid = java.util.UUID.randomUUID().toString
    sc.record.put("commitUid", uid)
    val arr = sc.record.putArray("commitArtifacts")
    (sc.dirMoves.map(m => (m, true)) ++ sc.fileMoves.map(m => (m, false)))
      .foreach { case ((t, f), d) =>
        val o = arr.addObject()
        o.put("tmp", t.toString); o.put("final", f.toString); o.put("dir", d); ()
      }
    assert(store.putIfAbsent(recordPath(root, 2L).toString,
      mapper.writeValueAsBytes(sc.record)))
    // hint still says 1; artifacts still at staged names
    assert(new String(store.read(Paths.get(root, "_current").toString).get,
      StandardCharsets.UTF_8).trim == "1")
    assert(!Files.exists(fixedManifest(root, 2L)))
    // ANY process's version probe rolls the commit forward
    assert(be.currentVersion(root) == 2L)
    assert(Files.exists(fixedManifest(root, 2L)))
    assert(Files.exists(fixedSchema(root, 2L)))
    assert(!Files.exists(sc.dirMoves.head._1), "staged dir consumed by the roll-forward")
    assert(new String(store.read(Paths.get(root, "_current").toString).get,
      StandardCharsets.UTF_8).trim == "2", "hint advanced by the roll-forward")
    // and the NEXT committer bases on the rolled-forward version
    be.publish(root, 2L, stage(root, 3L, "c"))
    assert(be.currentVersion(root) == 3L)
  }

  test("roll-forward is idempotent: repeated probes after completion change nothing") {
    val root = fresh()
    val store = new MemoryObjectStore
    val be = new ConditionalPutBackend(store)
    be.publish(root, 0L, stage(root, 1L, "a"))
    val bytes1 = Files.readAllBytes(fixedManifest(root, 1L).resolve("part-0.parquet"))
    (1 to 3).foreach(_ => assert(be.currentVersion(root) == 1L))
    assert(Files.readAllBytes(fixedManifest(root, 1L).resolve("part-0.parquet"))
      .sameElements(bytes1))
  }

  test("lock-era crash ARTIFACT orphan: publish clears it and commits (never pairs a record with stale artifacts)") {
    val root = fresh()
    val store = new MemoryObjectStore
    val be = new ConditionalPutBackend(store)
    be.publish(root, 0L, stage(root, 1L, "a"))
    // a lock-backend writer crashed inside its lock at v2: schema moved to
    // its fixed name, no record, pointer never swapped — provably not a
    // conditional-put winner's artifact (its record lands before any move),
    // so publish SELF-HEALS: clears it and lands OUR artifact
    Files.write(fixedSchema(root, 2L), "stale".getBytes(StandardCharsets.UTF_8))
    be.publish(root, 1L, stage(root, 2L, "b"))
    assert(be.currentVersion(root) == 2L)
    assert(new String(Files.readAllBytes(fixedSchema(root, 2L)),
      StandardCharsets.UTF_8) == "schema-b",
      "the stale lock-era schema must be replaced by the commit's own")
  }

  test("lock-era crashed RECORD above the pointer: not a commit, and the next publish reclaims the version") {
    val root = fresh()
    val store = new MemoryObjectStore
    val be = new ConditionalPutBackend(store)
    be.publish(root, 0L, stage(root, 1L, "a"))
    // a lock-mode crash can leave the RECORD itself above the pointer —
    // such records carry no commitArtifacts field and are unpublished by
    // that backend's contract; the probe must stop below them …
    val lockEra = mapper.createObjectNode()
    lockEra.put("version", 2L); lockEra.put("kind", "append")
    store.put(recordPath(root, 2L).toString, mapper.writeValueAsBytes(lockEra))
    assert(be.currentVersion(root) == 1L,
      "a lock-era record above the pointer is an orphan, not a commit")
    // … and the next committer CLEARS it and wins the version through the
    // ordinary put-if-absent (the lock backend's own orphan-overwrite
    // semantics, carried over)
    be.publish(root, 1L, stage(root, 2L, "b"))
    assert(be.currentVersion(root) == 2L)
    val rec = mapper.readTree(store.read(recordPath(root, 2L).toString).get)
    assert(rec.get("tag").asText() == "b")
  }

  test("LocalFsObjectStore: putIfAbsent is atomic create-or-fail with full content") {
    val dir = Files.createTempDirectory("graft-fsstore")
    val key = dir.resolve("obj").toString
    assert(LocalFsObjectStore.read(key).isEmpty)
    assert(LocalFsObjectStore.putIfAbsent(key, "first".getBytes(StandardCharsets.UTF_8)))
    assert(!LocalFsObjectStore.putIfAbsent(key, "second".getBytes(StandardCharsets.UTF_8)))
    assert(new String(LocalFsObjectStore.read(key).get, StandardCharsets.UTF_8) == "first")
    // many threads race one key: exactly one creator
    val key2 = dir.resolve("obj2").toString
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (0 until 16).map { i =>
      val t = new Thread(() => {
        if (LocalFsObjectStore.putIfAbsent(key2,
            s"t$i".getBytes(StandardCharsets.UTF_8))) { wins.incrementAndGet(); () }
      })
      t.start(); t
    }
    threads.foreach(_.join())
    assert(wins.get() == 1, s"exactly one creator must win, got ${wins.get()}")
    // no staging leftovers
    val list = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      val staged = list.iterator().asScala.map(_.getFileName.toString)
        .filter(_.contains(".staging-")).toSeq
      assert(staged.isEmpty, s"staging leftovers: $staged")
    } finally list.close()
  }

  test("a conditional-put commit costs a FLAT store-op budget (the RTT-bound at 100 TB)") {
    // every store op is a round-trip on a real object store (20-50 ms) —
    // the commit protocol must cost O(1) ops regardless of table size or
    // history length, or commit rate collapses. Pin the budget.
    val counting = new CommitObjectStore {
      val inner = new MemoryObjectStore
      val ops = new java.util.concurrent.atomic.AtomicLong(0L)
      def read(key: String) = { ops.incrementAndGet(); inner.read(key) }
      def putIfAbsent(key: String, bytes: Array[Byte]) = {
        ops.incrementAndGet(); inner.putIfAbsent(key, bytes) }
      def put(key: String, bytes: Array[Byte]) = {
        ops.incrementAndGet(); inner.put(key, bytes) }
      def delete(key: String) = { ops.incrementAndGet(); inner.delete(key) }
      def list(prefix: String) = { ops.incrementAndGet(); inner.list(prefix) }
    }
    val root = fresh()
    val be = new ConditionalPutBackend(counting)
    (1L to 20L).foreach(v => be.publish(root, v - 1, stage(root, v, s"c$v")))
    val total = counting.ops.get()
    val perCommit = total.toDouble / 20.0
    // currentVersion (hint + probe) + locked record check + put-if-absent
    // + roll-forward hint read/put ≈ 6; anything O(history) would blow this
    assert(perCommit <= 8.0,
      s"a commit must cost a flat store-op budget, measured $perCommit ops/commit")
    // and a plain read-side version probe costs ≤ 2 ops (hint + one record miss)
    counting.ops.set(0L)
    (1 to 10).foreach(_ => be.currentVersion(root))
    assert(counting.ops.get() <= 20L,
      s"a version probe must cost ≤ 2 ops, measured ${counting.ops.get() / 10.0}")
  }

  test("16 threads race 8 versions through one MemoryObjectStore: gap-free, exactly-once") {
    val root = fresh()
    val store = new MemoryObjectStore
    val be = new ConditionalPutBackend(store)
    val landed = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val threads = (0 until 16).map { i =>
      val t = new Thread(() => {
        var done = false
        var attempts = 0
        while (!done && attempts < 200) {
          attempts += 1
          val base = be.currentVersion(root)
          if (base >= 8L) done = true
          else {
            val sc = stage(root, base + 1, s"t$i-v${base + 1}")
            try { be.publish(root, base, sc); landed.add(base + 1); () }
            catch { case _: ConcurrentPublishException => () }
          }
        }
      })
      t.start(); t
    }
    threads.foreach(_.join())
    assert(be.currentVersion(root) == 8L)
    import scala.jdk.CollectionConverters._
    val got = landed.iterator().asScala.toSeq.sorted
    assert(got == (1L to 8L), s"versions must land exactly once, gap-free: $got")
    (1L to 8L).foreach { v =>
      assert(Files.exists(fixedManifest(root, v)), s"v$v manifest missing")
      assert(Files.exists(fixedSchema(root, v)), s"v$v schema missing")
    }
  }
}
