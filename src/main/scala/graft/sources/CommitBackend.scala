package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path => NioPath, Paths, StandardCopyOption}

import com.fasterxml.jackson.databind.node.ObjectNode

/** The PLUGGABLE COMMIT SEAM (VERDICT r13 #1): every cow-table commit ends
  * in one tiny critical decision — "does version `expected+1` land, given
  * the table was at `expected` when this statement derived?" — and ADR-001
  * has always named the advisory-file-lock spelling of that decision as a
  * sandbox stand-in for what a cloud deployment actually has: CONDITIONAL
  * PUTS (S3 `If-None-Match:*`/`If-Match`, GCS `ifGenerationMatch`, ABFS
  * ETags). This trait extracts the decision behind an interface with two
  * implementations:
  *
  *  - [[LockCommitBackend]] (default): the existing protocol, bit-for-bit —
  *    version re-check + fixed-name renames + pointer swap under the
  *    table's exclusive `_commit.lock` ([[TablePointer.withCommitLock]]).
  *    The POINTER is the source of published truth; artifacts above it are
  *    crashed-attempt orphans.
  *
  *  - [[ConditionalPutBackend]]: no lock anywhere. The commit RECORD is the
  *    atom — whoever creates `m<v>.commit.json` via PUT-IF-ABSENT owns
  *    version v (the protocol Delta Lake uses for multi-writer S3 commits
  *    now that S3 supports conditional writes: the log entry's conditional
  *    create IS the arbitration). The record embeds the staged→final
  *    artifact move list, so the commit is SELF-SUFFICIENT the instant the
  *    record lands: any process (the winner, a later committer, a reader's
  *    version probe, vacuum) can ROLL IT FORWARD — complete the renames and
  *    advance the pointer — idempotently. `_current` demotes to a monotonic
  *    HINT: [[ConditionalPutBackend.currentVersion]] reads it, then probes
  *    one record past it (one existence check per call, the documented
  *    price of hint-based pointers on object stores).
  *
  * Same-JVM and cross-process writers race through the SAME primitive in
  * both backends; [[graft.sources.ConcurrentPublishException]] and the
  * rebase/re-derive protocol above this seam are backend-agnostic.
  *
  * Backend selection: `-Dgraft.commit.backend=cput` (or env
  * `GRAFT_COMMIT_BACKEND` where JVM flags are fixed) — process-global, the
  * deployment model: every CONCURRENT writer of a table must use the same
  * backend (the lock backend treats above-pointer artifacts as deletable
  * orphans, which under conditional-put are committed-but-unpointed
  * versions mid-roll-forward). SWITCHING a quiesced table is safe in both
  * directions, including over a crash: [[ConditionalPutBackend.publish]]
  * self-heals lock-era crash debris — a record without `commitArtifacts`
  * was provably never a conditional-put commit, and a fixed-name artifact
  * sighted while the record (re-)reads absent provably is not a
  * conditional-put winner's (its record lands before any move) — clearing
  * both before re-racing the put-if-absent, exactly the recovery the lock
  * backend's own orphan-overwrite gives.
  */
private[graft] trait CommitBackend {
  def name: String

  /** The object-store client this backend's commit decisions ride.
    * Cross-table transaction markers and their sealed ledger MUST use the
    * same substrate (VERDICT r15 #1): the txn decision file is the
    * cross-table COMMIT POINT, and on a cloud deployment it has to land
    * on the same conditional-put store as the per-table commit records —
    * not silently on the coordinator's local filesystem. */
  def store: CommitObjectStore

  /** Current published version of the cow table at `root`. */
  def currentVersion(root: String): Long

  /** Land `staged` as version `staged.next` iff the table is still at
    * `expected`; a loser deletes its staged temps and throws
    * [[ConcurrentPublishException]]. On success the staged artifacts sit at
    * their fixed names, the commit record is readable at
    * `staged.recordPath`, the pointer resolves `staged.next`, and
    * `staged.onCommitted` has run exactly once (in this JVM). */
  def publish(root: String, expected: Long, staged: StagedCommit): Unit
}

private[graft] object CommitBackend {
  /** Test seam: force a backend for the current JVM (suites run
    * sequentially; always restore in a finally). */
  @volatile private[graft] var forced: Option[CommitBackend] = None

  def active: CommitBackend = forced.getOrElse {
    // system property first (per-process, what the forked harnesses set);
    // env var as the spelling for contexts whose JVM flags are fixed
    // (running the whole sbt suite under conditional-put)
    val sel = Option(System.getProperty("graft.commit.backend"))
      .orElse(Option(System.getenv("GRAFT_COMMIT_BACKEND")))
    if (sel.contains("cput")) ConditionalPutBackend.default
    else LockCommitBackend
  }
}

/** Everything a commit stages before the critical decision. Temps are
  * writer-unique (`*.staging-<uid>` / `m<v>.staging-<uid>`), so contending
  * writers never collide before the backend decides. */
private[graft] final case class StagedCommit(
    next: Long,
    /** The commit record (WITHOUT backend bookkeeping — the conditional-put
      * backend adds its `commitUid`/`commitArtifacts` fields). */
    record: ObjectNode,
    /** Fixed name of the commit record (`m<next>.commit.json`). */
    recordPath: NioPath,
    /** Fixed-name DIRECTORIES a lock-era crashed attempt may occupy —
      * the lock backend clears them under its lock before moving. */
    orphanDirs: Seq[NioPath],
    /** Staged directory → fixed name (manifest checkpoint / delta slice). */
    dirMoves: Seq[(NioPath, NioPath)],
    /** Staged file → fixed name (schema / props / dv JSONs); files replace. */
    fileMoves: Seq[(NioPath, NioPath)],
    /** Fixed names to delete when this commit OMITS the optional artifact
      * (props/dv) — clears a crashed lock-era attempt's leftover. */
    absentCleanups: Seq[NioPath],
    /** Post-commit JVM-local bookkeeping (cache seed, checkpoint cursor). */
    onCommitted: () => Unit) {

  /** A loser's hygiene: its temps are unreferenced by construction. */
  def cleanupTemps(): Unit = {
    dirMoves.foreach { case (t, _) => FileCow.deleteTree(t) }
    fileMoves.foreach { case (t, _) => Files.deleteIfExists(t) }
  }
}

/** The advisory-lock protocol, exactly as it has shipped since round 9:
  * check-then-rename-then-swap under `_commit.lock`, with the JVM monitor
  * serializing same-process committers (file locks don't nest). */
private[graft] object LockCommitBackend extends CommitBackend {
  val name = "lock"

  /** The lock protocol's artifacts live on a POSIX filesystem by
    * definition (advisory locks, atomic renames) — its store is the
    * local-FS client. */
  def store: CommitObjectStore = LocalFsObjectStore

  def currentVersion(root: String): Long = TablePointer.current(root)

  def publish(root: String, expected: Long, sc: StagedCommit): Unit =
    TablePointer.withCommitLock(root) {
      val cur = TablePointer.current(root)
      if (cur != expected) {
        sc.cleanupTemps()
        throw new ConcurrentPublishException(root, expected, cur)
      }
      // orphans from a crashed attempt at this version (provably
      // unpublished — the pointer never reached it)
      sc.orphanDirs.foreach(FileCow.deleteTree)
      sc.dirMoves.foreach { case (t, f) =>
        Files.move(t, f, StandardCopyOption.ATOMIC_MOVE)
      }
      val recTmp = sc.recordPath.resolveSibling(
        sc.recordPath.getFileName.toString +
          s".staging-${java.util.UUID.randomUUID().toString.take(8)}")
      Files.write(recTmp, FileCow.jsonMapper.writeValueAsBytes(sc.record))
      Files.move(recTmp, sc.recordPath, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      sc.fileMoves.foreach { case (t, f) =>
        Files.move(t, f, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
      }
      sc.absentCleanups.foreach(Files.deleteIfExists(_))
      TablePointer.swap(root, sc.next)
      sc.onCommitted()
    }
}

/** Thrown by a [[CommitObjectStore]] when an operation's RESPONSE was lost
  * (timeout, dropped connection) — the op may or may not have applied
  * server-side. The protocol's only sound reaction is to READ BACK and
  * decide by content ([[ConditionalPutBackend.publish]]'s uid check). */
private[graft] class TransientStoreException(msg: String)
    extends RuntimeException(msg)

/** The minimal conditional-write object-store surface the commit protocol
  * needs — the slice of S3 (`PutObject` + `If-None-Match: *`, strong
  * read-after-write since 2020), GCS (`ifGenerationMatch=0`) and ABFS
  * (`If-None-Match` ETags) it models. Keys are path strings; values are
  * whole-object bytes (commit records and the pointer hint — always tiny).
  * REQUIRED of a real implementation: `putIfAbsent` atomic, `read` strongly
  * consistent after this client's own successful put (every store above
  * provides both). */
private[graft] trait CommitObjectStore {
  /** Full object bytes, None when absent. */
  def read(key: String): Option[Array[Byte]]
  /** Create `key` with `bytes` iff absent — ATOMIC. True = this call
    * created it; false = the key already existed. May throw
    * [[TransientStoreException]] even when the put APPLIED. */
  def putIfAbsent(key: String, bytes: Array[Byte]): Boolean
  /** Unconditional last-writer-wins put — used ONLY for the pointer HINT,
    * whose loss or reordering the probe-forward read path self-heals. */
  def put(key: String, bytes: Array[Byte]): Unit
  /** Delete `key` — used ONLY to clear a lock-era crashed attempt's
    * record (provably never a conditional-put commit) before re-racing
    * the put-if-absent; arbitration stays with the put. */
  def delete(key: String): Unit

  /** Keys that start with `prefix` — S3/GCS/ABFS `ListObjects` with a
    * key prefix. Used ONLY by ops surfaces (SHOW/VACUUM GRAFT
    * TRANSACTIONS), never on a commit path, so eventual list consistency
    * is tolerable: a just-created marker missing from one listing shows
    * in the next. */
  def list(prefix: String): Seq[String]
}

/** [[CommitObjectStore]] over the local filesystem — the integration
  * backend the killsweep/stress harnesses fork real processes against.
  * `putIfAbsent` is `Files.createLink` of a fully-written temp onto the
  * target: hard-link creation is an atomic create-or-fail on POSIX, so a
  * racer never observes partial bytes and exactly one creator wins —
  * a faithful local model of a conditional PUT. */
private[graft] object LocalFsObjectStore extends CommitObjectStore {
  def read(key: String): Option[Array[Byte]] = {
    val p = Paths.get(key)
    try { if (Files.exists(p)) Some(Files.readAllBytes(p)) else None }
    catch { case _: java.nio.file.NoSuchFileException => None }
  }

  def putIfAbsent(key: String, bytes: Array[Byte]): Boolean = {
    val target = Paths.get(key)
    Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(target.getFileName.toString +
      s".staging-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, bytes)
    try { Files.createLink(target, tmp); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
    finally Files.deleteIfExists(tmp)
  }

  def put(key: String, bytes: Array[Byte]): Unit = {
    val target = Paths.get(key)
    Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(target.getFileName.toString +
      s".staging-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, bytes)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  def delete(key: String): Unit = { Files.deleteIfExists(Paths.get(key)); () }

  /** `prefix` here is a path prefix whose parent directory is listed
    * non-recursively — the flat-namespace shape every caller (marker
    * dirs, sealed ledgers) has. */
  def list(prefix: String): Seq[String] = {
    val p = Paths.get(prefix)
    val dir = if (Files.isDirectory(p)) p else p.getParent
    if (dir == null || !Files.isDirectory(dir)) return Nil
    val l = Files.list(dir)
    try {
      val it = l.iterator()
      val b = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val k = it.next().toString
        if (k.startsWith(prefix)) b += k
      }
      b.toSeq
    } finally l.close()
  }
}

/** In-memory [[CommitObjectStore]] — the protocol-spec double. Thread-safe;
  * keeps each key's PREVIOUS value so [[FaultyObjectStore]] can serve a
  * genuinely stale read. */
private[graft] final class MemoryObjectStore extends CommitObjectStore {
  private val objects = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
  private val previous = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()

  def read(key: String): Option[Array[Byte]] = Option(objects.get(key))
  private[graft] def priorValue(key: String): Option[Array[Byte]] =
    Option(previous.get(key))

  def putIfAbsent(key: String, bytes: Array[Byte]): Boolean =
    objects.putIfAbsent(key, bytes) == null

  def put(key: String, bytes: Array[Byte]): Unit = {
    val old = objects.put(key, bytes)
    if (old != null) previous.put(key, old)
    ()
  }

  def delete(key: String): Unit = {
    val old = objects.remove(key)
    if (old != null) previous.put(key, old)
    ()
  }

  def list(prefix: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    objects.keySet().asScala.filter(_.startsWith(prefix)).toSeq.sorted
  }
}

/** Fault-injecting decorator over any [[CommitObjectStore]] — the failure
  * modes a network object store actually has, injectable one call at a
  * time so a spec can pin the protocol's reaction to each:
  *  - LOST RESPONSE: the op applies server-side, the caller gets
  *    [[TransientStoreException]] (a timeout after the write landed);
  *  - DUPLICATE DELIVERY: the op applies twice (a retried request whose
  *    first attempt also landed);
  *  - STALE READ: `read` serves the key's previous value (or absence)
  *    once, then heals — the eventual-consistency window pre-2020 S3 had. */
private[graft] final class FaultyObjectStore(inner: CommitObjectStore)
    extends CommitObjectStore {
  val lostPutResponses = new java.util.concurrent.atomic.AtomicInteger(0)
  val duplicateDeliveries = new java.util.concurrent.atomic.AtomicInteger(0)
  val staleReads = new java.util.concurrent.atomic.AtomicInteger(0)
  /** Last value each key held BEFORE the most recent put through THIS
    * decorator (absence modeled as null sentinel handled in read). */
  private val prior = new java.util.concurrent.ConcurrentHashMap[String, Option[Array[Byte]]]()

  private def takeFault(c: java.util.concurrent.atomic.AtomicInteger): Boolean = {
    while (true) {
      val v = c.get()
      if (v <= 0) return false
      if (c.compareAndSet(v, v - 1)) return true
    }
    false
  }

  def read(key: String): Option[Array[Byte]] =
    if (takeFault(staleReads) && prior.containsKey(key)) prior.get(key)
    else inner.read(key)

  def putIfAbsent(key: String, bytes: Array[Byte]): Boolean = {
    prior.put(key, inner.read(key))
    val dup = takeFault(duplicateDeliveries)
    val created = inner.putIfAbsent(key, bytes)
    if (dup) inner.putIfAbsent(key, bytes) // retransmit: if-absent, a no-op
    if (takeFault(lostPutResponses))
      throw new TransientStoreException(
        s"response lost for conditional put of $key (op may have applied)")
    created
  }

  def put(key: String, bytes: Array[Byte]): Unit = {
    prior.put(key, inner.read(key))
    inner.put(key, bytes)
    if (takeFault(duplicateDeliveries)) inner.put(key, bytes)
    if (takeFault(lostPutResponses))
      throw new TransientStoreException(
        s"response lost for put of $key (op may have applied)")
  }

  def delete(key: String): Unit = {
    prior.put(key, inner.read(key))
    inner.delete(key)
    if (takeFault(lostPutResponses))
      throw new TransientStoreException(
        s"response lost for delete of $key (op may have applied)")
  }

  def list(prefix: String): Seq[String] = inner.list(prefix)
}

/** Latency-injecting decorator over any [[CommitObjectStore]] — the
  * HTTP-REALISTIC arm (VERDICT r14 #4): every store op sleeps `perOpMs`
  * (the ~30 ms RTT of a same-region S3/GCS request) and counts itself,
  * so a harness can MEASURE sustained commits/s/table instead of deriving
  * it from the op budget. See [[graft.tools.StressCommitRate]]. */
private[graft] final class LatencyObjectStore(inner: CommitObjectStore,
    perOpMs: Long) extends CommitObjectStore {
  val ops = new java.util.concurrent.atomic.AtomicLong(0L)
  private def pay(): Unit = {
    ops.incrementAndGet()
    if (perOpMs > 0L) Thread.sleep(perOpMs)
  }
  def read(key: String): Option[Array[Byte]] = { pay(); inner.read(key) }
  def putIfAbsent(key: String, bytes: Array[Byte]): Boolean = {
    pay(); inner.putIfAbsent(key, bytes)
  }
  def put(key: String, bytes: Array[Byte]): Unit = { pay(); inner.put(key, bytes) }
  def delete(key: String): Unit = { pay(); inner.delete(key) }
  def list(prefix: String): Seq[String] = { pay(); inner.list(prefix) }
}

/** The CONDITIONAL-PUT commit protocol (see [[CommitBackend]] scaladoc for
  * the design): record put-if-absent is the commit point; artifacts roll
  * forward idempotently; the pointer is a monotonic hint. */
private[graft] final class ConditionalPutBackend(val store: CommitObjectStore)
    extends CommitBackend {
  val name = "cput"

  private def pointerKey(root: String): String =
    TablePointer.pointer(root).toString

  private def hint(root: String): Long =
    store.read(pointerKey(root))
      .map(b => new String(b, StandardCharsets.UTF_8).trim.toLong)
      .getOrElse(0L)

  /** Hint, then probe one commit record past it per iteration — each found
    * record rolls forward (renames completed, hint advanced) before the
    * version is exposed, so a reader never resolves a version whose
    * artifacts are still at staged names. A record WITHOUT the
    * `commitArtifacts` field is a lock-era crashed attempt (moved under the
    * lock, pointer never swapped — unpublished by that backend's contract):
    * it is NOT a commit and the probe stops below it. */
  def currentVersion(root: String): Long = {
    var v = hint(root)
    while (true) {
      store.read(FileCow.commitInfoFile(root, v + 1).toString) match {
        case Some(bytes) =>
          val n = FileCow.jsonMapper.readTree(bytes)
          if (!n.has("commitArtifacts")) return v
          rollForward(root, v + 1, n)
          v += 1
        case None => return v
      }
    }
    v
  }

  /** Complete a landed record's renames + hint advance. Idempotent — any
    * process may run it, any number of times. The rename loop runs under
    * the table's advisory file lock: NOT for commit arbitration (that is
    * the record's put-if-absent, decided before anyone gets here) but to
    * serialize the LOCAL-FS RENAME MECHANICS — same-record rollers
    * coordinate via staged-temp consumption, and lock-era crash DEBRIS at
    * a fixed directory name needs a delete-then-move that must not
    * interleave with another roller's completed move (the check and the
    * replace are one critical section; files replace atomically and need
    * no such care). On a real object store "directories" are key
    * prefixes and every artifact lands as whole-object atomic puts, so
    * this serialization has no analog to need. */
  private def rollForward(root: String, v: Long,
      rec: com.fasterxml.jackson.databind.JsonNode): Unit = {
    val arts = rec.get("commitArtifacts")
    TablePointer.withCommitLock(root) {
      (0 until arts.size()).foreach { i =>
        val a = arts.get(i)
        if (a.path("absent").asBoolean(false)) {
          // a DELETE-type artifact (ADVICE r14): this commit OMITS the
          // optional artifact (props/dv) at this fixed name, so anything
          // sitting there is a crashed lock-era attempt's leftover. The
          // record embeds the cleanup so ANY roller completes it — a
          // winner dying between its record landing and its cleanups no
          // longer strands stale-readable debris. Per-version fixed names
          // are never legitimately re-created, so the delete is idempotent
          // and can never hit a real artifact.
          Files.deleteIfExists(Paths.get(a.get("final").asText()))
          ()
        } else {
        val tmp = Paths.get(a.get("tmp").asText())
        val fin = Paths.get(a.get("final").asText())
        if (Files.exists(tmp)) {
          if (a.get("dir").asBoolean()) {
            // inside the lock, tmp-present is authoritative: an occupied
            // final is NOT this record's completed move (that consumes
            // tmp) — it is lock-era crash debris; replace it
            FileCow.deleteTree(fin)
            Files.move(tmp, fin, StandardCopyOption.ATOMIC_MOVE)
          } else
            Files.move(tmp, fin, StandardCopyOption.ATOMIC_MOVE,
              StandardCopyOption.REPLACE_EXISTING)
          ()
        } else if (!Files.exists(fin))
          sys.error(s"commit v$v of $root is recorded but artifact $fin is " +
            s"gone along with its staged copy $tmp — reclaimed by an " +
            "age-0 vacuum racing an in-flight commit?")
        }
        FileCow.CommitHooks.afterRollForwardArtifact(root, v, i)
      }
    }
    if (hint(root) < v)
      try store.put(pointerKey(root), v.toString.getBytes(StandardCharsets.UTF_8))
      catch { case _: TransientStoreException => () } // probe self-heals
  }

  /** Read back `recordPath` and decide whether OUR put landed (uid match).
    * Requires the store's documented read-after-write strength; tolerates
    * a bounded stale-absence window by re-reading. None = key provably
    * absent across the retries (our put did not apply). */
  private def readBackMine(key: String, uid: String): Option[Boolean] = {
    var i = 0
    while (i < 3) {
      store.read(key) match {
        case Some(b) =>
          return Some(FileCow.jsonMapper.readTree(b)
            .path("commitUid").asText("") == uid)
        case None => i += 1
      }
    }
    None
  }

  def publish(root: String, expected: Long, sc: StagedCommit): Unit = {
    val uid = java.util.UUID.randomUUID().toString
    val recordKey = sc.recordPath.toString
    val cur = currentVersion(root)
    if (cur != expected) {
      sc.cleanupTemps()
      throw new ConcurrentPublishException(root, expected, cur)
    }
    // lock-era crash hygiene (self-healing, matching the lock backend's
    // own orphan-overwrite semantics): a lock-backend writer SIGKILLed
    // inside its lock can leave the RECORD at `next` with the pointer
    // never swapped — unpublished by that backend's contract, and
    // PROVABLY never a conditional-put commit (ours always embeds
    // `commitArtifacts`). Clear it so the put-if-absent below can decide
    // the version; the check-and-delete runs under the advisory lock so a
    // concurrent winner's REAL record (landed between our read and our
    // delete) can never be the thing deleted — its put happens outside
    // any lock, but this locked read re-establishes which record is
    // present at delete time, and a real record here is an ordinary lost
    // CAS. Artifact debris at fixed names needs no preflight: the
    // winner's [[rollForward]] replaces it under the same lock.
    var lostToReal = false
    TablePointer.withCommitLock(root) {
      store.read(recordKey).foreach { b =>
        if (FileCow.jsonMapper.readTree(b).has("commitArtifacts")) lostToReal = true
        else store.delete(recordKey)
      }
    }
    if (lostToReal) {
      sc.cleanupTemps()
      throw new ConcurrentPublishException(root, expected, currentVersion(root))
    }
    // enrich the record into a SELF-SUFFICIENT commit: uid (so a retry
    // after a lost response can recognize its own write) + the move list
    // AND the absent-artifact cleanups (so any process can roll the
    // commit forward COMPLETELY — moves and debris deletes both)
    sc.record.put("commitUid", uid)
    val arr = sc.record.putArray("commitArtifacts")
    (sc.dirMoves.map(m => (m, true)) ++ sc.fileMoves.map(m => (m, false)))
      .foreach { case ((t, f), isDir) =>
        val o = arr.addObject()
        o.put("tmp", t.toString); o.put("final", f.toString); o.put("dir", isDir)
        ()
      }
    sc.absentCleanups.foreach { f =>
      val o = arr.addObject()
      o.put("final", f.toString); o.put("absent", true)
      ()
    }
    val bytes = FileCow.jsonMapper.writeValueAsBytes(sc.record)
    // the commit point: put-if-absent of the record, with lost responses
    // settled by reading back our uid and a bounded retry while the
    // outcome is provably "did not apply"
    var won = false
    var settled = false
    var attempts = 0
    while (!settled) {
      attempts += 1
      try { won = store.putIfAbsent(recordKey, bytes); settled = true }
      catch {
        case e: TransientStoreException =>
          readBackMine(recordKey, uid) match {
            case Some(mine) => won = mine; settled = true
            case None => if (attempts >= 3) throw e // outcome unknowable
          }
      }
    }
    if (!won && !readBackMine(recordKey, uid).contains(true)) {
      sc.cleanupTemps()
      throw new ConcurrentPublishException(root, expected, currentVersion(root))
    }
    // committed: complete our own record (any other process could, too —
    // the record carries moves AND cleanups, so there is no winner-only
    // step left after this line)
    FileCow.CommitHooks.afterCommitRecordPut(root, sc.next)
    rollForward(root, sc.next, sc.record)
    sc.onCommitted()
  }
}

private[graft] object ConditionalPutBackend {
  val default = new ConditionalPutBackend(LocalFsObjectStore)
}
