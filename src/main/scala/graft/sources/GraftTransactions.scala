package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Paths

import org.apache.spark.sql.SparkSession

/** CROSS-TABLE TRANSACTIONS (VERDICT r14 #3): N single-table commits made
  * atomically visible by ONE conditional-put decision.
  *
  * The reference's orchestrator writes fact + summary + audit in sequence
  * and gets multi-table consistency only by convention
  * (main_orchestrator.py:18-36); Delta has the same gap (its
  * multi-statement transactions are catalog-side). This seam closes it
  * with the same primitive the commit protocol already trusts:
  *
  *  - `run { body }` creates a PENDING txn marker, then every graft commit
  *    the body issues (FileCow API or SQL DML — the driver-side commit
  *    path runs on the calling thread) lands through the NORMAL per-table
  *    CAS but with the record stamped `txnMarker`. A stamped version is
  *    a real commit that is NOT YET VISIBLE.
  *  - The marker's decision file (`<base>.final.json`) is written via
  *    PUT-IF-ABSENT — one atomic decision, committed or aborted, exactly
  *    the arbitration model of [[ConditionalPutBackend]]. That put is THE
  *    cross-table commit point: the instant it lands, every stamped
  *    version everywhere flips visible together.
  *  - Readers resolve tables at [[visibleVersion]]: the newest version
  *    whose gating txn (if any) is COMMITTED. Clean and
  *    committed-gated versions cache as permanently visible (the states
  *    are immutable), so steady-state resolution costs one map lookup;
  *    only a table with an open txn pays a marker read per resolution.
  *  - Writers never build on invisible data: the statement derive loop
  *    reads the visible version, and [[checkGate]] (run before every
  *    commit attempt) refuses — loudly, with the cure — while a foreign
  *    txn is open on the table. A txn dead past
  *    `graft.txn.timeoutMs` is broken by the same put-if-absent (decision
  *    = aborted), and aborted-gated heads are healed by a `txn_revert`
  *    commit (restore-shaped: the last clean version's manifest, schema,
  *    props and DV registry — metadata-sized, no data file rewritten)
  *    before the writer's own commit proceeds.
  *
  * Single-process coordination, multi-process safety: the BODY runs in one
  * JVM on one thread (the reference's orchestrator shape), but crash
  * recovery, visibility, stale-break and heal are all cross-process —
  * any reader/writer of any participating table enforces them from the
  * marker files alone. A graft commit issued from ANOTHER thread of the
  * same JVM (a Future, a parallel collection) while a txn that already
  * touched its table is open refuses loudly ([[assertCoordinatedCommit]])
  * instead of landing an ungated, immediately-visible write the body
  * believed was part of the transaction.
  *
  * Object-store deployment (VERDICT r15 #1): ALL marker IO — the pending
  * file, the decision put-if-absent, the ops listing, the sealed ledger —
  * rides the ACTIVE commit backend's [[CommitObjectStore]], the same
  * substrate the per-table commit records land on (S3 `If-None-Match: *`
  * under [[ConditionalPutBackend]]). The decision put handles a LOST
  * RESPONSE like the commit record's does: read the final path back and
  * decide by content. Gating adds zero store ops to the uncontended
  * per-commit path (the stamp rides inside the commit record that already
  * lands); a txn pays one tiny put per NEW participating table (the
  * pending file's participant list — the ops/GC surface).
  *
  * Marker retention (ADVICE r15): decided markers are TABLE METADATA —
  * a committed-gated version stays visible only while its decision is
  * readable — so `_txns/` must never be hand-pruned. The supported
  * retention path is [[vacuumMarkers]]: decided markers older than the
  * retention window CONSOLIDATE into the dir's sealed ledger
  * (`_sealed.<gen>.json`, advanced by put-if-absent so racing vacuums
  * never lose entries), and [[state]] falls back to the ledger when both
  * marker files are gone — outcomes stay exact forever at O(1) files.
  */
object GraftTransactions {

  sealed trait TxnState
  case object Committed extends TxnState
  case object Aborted extends TxnState
  /** Open; `startMs` drives the stale-break timeout. */
  final case class Pending(startMs: Long) extends TxnState

  /** A coordinator's live transaction: the marker base path plus the
    * participant versions its commits landed (root -> landed versions,
    * in landing order — the heal set if the txn aborts). `roots` is the
    * normalized participant set, readable from OTHER threads (the
    * same-JVM coordinator-thread guard). */
  private final class ActiveTxn(val markerBase: String,
      val joined: Boolean = false) {
    val participants =
      new scala.collection.mutable.LinkedHashMap[String, scala.collection.mutable.ArrayBuffer[Long]]()
    val roots = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  }

  private val active = new ThreadLocal[ActiveTxn]

  /** Every open txn of THIS JVM by marker base — what
    * [[assertCoordinatedCommit]] scans so a commit from a non-coordinator
    * thread on a touched table fails loudly instead of landing ungated.
    * Entries unbind with the txn; a decided-but-never-unbound entry (a
    * coordinator thread that died) is pruned on sight. */
  private val openInJvm =
    new java.util.concurrent.ConcurrentHashMap[String, ActiveTxn]()

  /** A [[consistentRead]] scope. Two pins make it a snapshot at its own
    * start instant:
    *  - marker decisions memoize (ONE observation per marker), and any
    *    decision STAMPED AFTER the scope began reads as still pending —
    *    a whole transaction that begins and decides between two of the
    *    scope's table resolutions can never show on the later table only;
    *  - each root's VISIBLE VERSION memoizes at first touch (ADVICE r15),
    *    and that first resolution walks below any version whose record
    *    was stamped after the scope began — so a clean commit landing
    *    mid-scope (whose cumulative manifest may embed a txn the scope
    *    pinned as pending) never tears the snapshot either.
    * (`decidedMs`/`commitMs` are stamped by their writers; cross-host
    * clock skew shifts the snapshot instant by the skew, never tears a
    * single marker's observation.) */
  private final class Snapshot(val startMs: Long) {
    val memo = new java.util.HashMap[String, TxnState]()
    val heads = new java.util.HashMap[String, Long]()
  }
  private val readSnapshot = new ThreadLocal[Snapshot]

  /** Final marker decisions are immutable — cache them forever, WITH
    * their decision stamp (scopes need it to place the flip in time). */
  private val decidedCache =
    new java.util.concurrent.ConcurrentHashMap[String, (TxnState, Long)]()

  /** (root @ version) -> permanently visible: clean records (no marker)
    * and committed-gated records never change state. Bounded: cleared
    * wholesale if it ever grows past metadata size — the single guarded
    * put below is the ONLY writer (ADVICE r15: an unbounded branch). */
  private val visibleCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  private def cacheVisible(key: String): Unit = {
    if (visibleCache.size > 100000) visibleCache.clear()
    visibleCache.put(key, true)
    ()
  }

  /** Test seam: drop every in-JVM memo so the next resolution re-reads
    * the marker files / sealed ledger — what a FRESH process would see. */
  private[graft] def resetCachesForTest(): Unit = {
    decidedCache.clear()
    visibleCache.clear()
  }

  /** Test seam: wrap or replace the marker store (the FaultyObjectStore
    * specs inject lost responses into the DECISION put). Production
    * resolution is the active commit backend's store. */
  @volatile private[graft] var markerStoreOverride: Option[CommitObjectStore] = None
  private def store: CommitObjectStore =
    markerStoreOverride.getOrElse(CommitBackend.active.store)

  private def pendingPath(base: String) = base + ".json"
  private def finalPath(base: String) = base + ".final.json"
  private def markerName(base: String) =
    Paths.get(base).getFileName.toString

  /** A JOINED participant's root registration (put-if-absent, one tiny
    * object per (txn, table)): a foreign process can't rewrite the
    * coordinator's pending root list without a read-modify-write race,
    * so its first touch of a table registers through an absent-put side
    * record instead — same price, no lost update. */
  private def rootSidePath(base: String, root: String): String = {
    val h = java.security.MessageDigest.getInstance("SHA-1")
      .digest(normalizeRoot(root).getBytes(StandardCharsets.UTF_8))
      .take(4).map(b => f"$b%02x").mkString
    s"$base.root.$h.json"
  }

  /** Roots registered by JOINED participants (side records). */
  private def sideRoots(base: String): Seq[String] =
    store.list(base + ".root.").flatMap { k =>
      store.read(k).map(b =>
        FileCow.jsonMapper.readTree(b).path("root").asText(""))
    }.filter(_.nonEmpty)

  /** Roots in the coordinator's pending record. */
  private def pendingRoots(base: String): Seq[String] =
    store.read(pendingPath(base)).toSeq.flatMap { b =>
      val arr = FileCow.jsonMapper.readTree(b).path("roots")
      (0 until arr.size).map(i => arr.get(i).asText(""))
    }.filter(_.nonEmpty)

  /** EVERY participant root any decider can see: this JVM's map, the
    * coordinator's pending list, and joined-process side records — the
    * heal set. */
  private def allRoots(t: ActiveTxn): Seq[String] =
    (t.synchronized { t.participants.keys.toSeq } ++
      pendingRoots(t.markerBase) ++ sideRoots(t.markerBase)).distinct

  private def timeoutMs: Long =
    Option(System.getProperty("graft.txn.timeoutMs")).map(_.toLong)
      .getOrElse(900000L)

  // ------------------------------------------------------- marker state

  /** The marker's state, one tiny read (final states cached forever).
    * Inside a [[consistentRead]] scope the observation is memoized AND
    * time-pinned: a decision stamped after the scope began reads as
    * still pending (the scope's snapshot instant is its start). */
  def state(markerBase: String): TxnState = {
    val snap = readSnapshot.get()
    if (snap != null && snap.memo.containsKey(markerBase))
      return snap.memo.get(markerBase)
    val (st, decidedMs) = freshState(markerBase)
    if (snap == null) st
    else {
      val effective =
        if (decidedMs > snap.startMs) Pending(decidedMs) // decided after the scope began
        else st
      snap.memo.put(markerBase, effective)
      effective
    }
  }

  /** Marker state with NO scope pinning — the writer-side read (VERDICT
    * r15 #3): [[checkGate]] and the stale-break age check are
    * freshness-critical, and a commit issued inside a `consistentRead`
    * body must see a just-decided foreign gate as decided, not as the
    * scope's pinned Pending (which would spin every re-derive into a
    * lost CAS until the statement dies). */
  private[graft] def stateFresh(markerBase: String): TxnState =
    freshState(markerBase)._1

  private def freshState(markerBase: String): (TxnState, Long) =
    Option(decidedCache.get(markerBase)).getOrElse {
      store.read(finalPath(markerBase)) match {
        case Some(b) =>
          val entry = parseDecision(b)
          decidedCache.put(markerBase, entry)
          entry
        case None =>
          sealedOutcome(markerBase) match {
            case Some(entry) =>
              decidedCache.put(markerBase, entry)
              entry
            case None =>
              val startMs = store.read(pendingPath(markerBase))
                .map(b => FileCow.jsonMapper.readTree(b).path("startMs").asLong(0L))
                .getOrElse(0L)
              (Pending(startMs), 0L)
          }
      }
    }

  private def parseDecision(bytes: Array[Byte]): (TxnState, Long) = {
    val f = FileCow.jsonMapper.readTree(bytes)
    (if (f.path("outcome").asText("") == "committed") Committed else Aborted,
      f.path("decidedMs").asLong(0L))
  }

  private def readDecision(markerBase: String): Option[(TxnState, Long)] =
    store.read(finalPath(markerBase)).map(parseDecision)

  /** Decide the txn — the atomic cross-table commit point. True = OUR
    * decision stands (an `aborted` already put by a stale-breaker counts:
    * same outcome, same effect). A lost response from the conditional put
    * settles by reading the final path back (ADVICE r15) — the decision
    * may have applied server-side, and only the content can say. */
  private def decide(markerBase: String, outcome: String,
      participants: Seq[(String, Seq[Long])] = Nil): Boolean = {
    val now = System.currentTimeMillis()
    val n = FileCow.jsonMapper.createObjectNode()
    n.put("outcome", outcome)
    n.put("decidedMs", now)
    if (participants.nonEmpty) {
      val arr = n.putArray("participants")
      participants.foreach { case (root, versions) =>
        val o = arr.addObject()
        o.put("root", root)
        val vs = o.putArray("versions")
        versions.foreach(vs.add)
        ()
      }
    }
    val bytes = FileCow.jsonMapper.writeValueAsBytes(n)
    val key = finalPath(markerBase)
    var won = false
    var settled = false
    var attempts = 0
    while (!settled) {
      attempts += 1
      try { won = store.putIfAbsent(key, bytes); settled = true }
      catch {
        case e: TransientStoreException =>
          readDecision(markerBase) match {
            case Some((st, _)) =>
              // a decision stands — ours iff the outcome matches (only
              // the coordinator ever writes `committed`; a matching
              // `aborted` from a stale-breaker is the same decision)
              won = (st == Committed) == (outcome == "committed")
              settled = true
            case None => if (attempts >= 3) throw e // outcome unknowable
          }
      }
    }
    if (won && !decidedCache.containsKey(markerBase))
      decidedCache.put(markerBase,
        (if (outcome == "committed") Committed else Aborted, now))
    else if (!won)
      readDecision(markerBase).foreach(decidedCache.put(markerBase, _))
    if (won) FileCow.CommitHooks.afterTxnDecision(markerBase, outcome)
    won
  }

  /** Abort an open txn by marker path (the ops escape hatch for a dead
    * coordinator; also what the stale-break does). True = this call
    * decided the abort. */
  def abort(markerBase: String): Boolean = decide(markerBase, "aborted")

  /** The marker the CURRENT thread's open transaction stamps, if any. */
  private[graft] def activeMarker: Option[String] =
    Option(active.get()).map(_.markerBase)

  /** Run a CATALOG-MEDIATED bootstrap with the thread's open txn
    * SUSPENDED (G41): a `CREATE TABLE` inside a transaction lands its
    * version-1 files CLEAN (unstamped — v1 has no clean version to
    * revert to, the reason bare bootstraps refuse), because the NAME
    * carries the transaction's atomicity instead: the catalog binding is
    * marker-stamped and resolves only at the decision. Only the CREATE
    * execution paths call this; a bare `FileCow.create` inside a txn
    * still refuses with the cure. */
  private[graft] def withoutTxn[T](body: => T): T = {
    val saved = active.get()
    if (saved == null) body
    else { active.remove(); try body finally active.set(saved) }
  }

  /** Record a landed commit as a participant of the thread's open txn.
    * First touch of a NEW table also records the root into the pending
    * marker (one tiny put per table per txn) — the ops surface a dead
    * coordinator leaves behind: which tables are gated, without scanning
    * the warehouse. Synchronized on the txn: joined worker threads
    * ([[TxnHandle.join]]) register through the same structure. */
  private[sources] def registerParticipant(root: String, version: Long): Unit = {
    val t = active.get()
    if (t != null) t.synchronized {
      t.participants.getOrElseUpdate(root,
        scala.collection.mutable.ArrayBuffer.empty[Long]) += version
      if (t.roots.add(normalizeRoot(root))) {
        if (t.joined) {
          // a foreign participant must not rewrite the coordinator's
          // pending list (read-modify-write race) — absent-put a side
          // record instead; a duplicate first touch just loses the put
          val pn = FileCow.jsonMapper.createObjectNode()
          pn.put("root", root)
          store.putIfAbsent(rootSidePath(t.markerBase, root),
            FileCow.jsonMapper.writeValueAsBytes(pn))
        } else {
          val startMs = store.read(pendingPath(t.markerBase))
            .map(b => FileCow.jsonMapper.readTree(b).path("startMs").asLong(0L))
            .getOrElse(0L)
          val pn = FileCow.jsonMapper.createObjectNode()
          pn.put("startMs", startMs)
          val arr = pn.putArray("roots")
          t.participants.keys.foreach(r => arr.add(r))
          store.put(pendingPath(t.markerBase),
            FileCow.jsonMapper.writeValueAsBytes(pn))
        }
      }
      ()
    }
  }

  /** A capability to opt ANOTHER thread of this JVM into the current
    * thread's open transaction — the sanctioned spelling of what the
    * coordinator-thread guard refuses by default (a Future / parallel
    * collection / foreachBatch body issuing commits it believes are
    * transactional). The coordinator captures the handle inside its body;
    * a worker runs `handle.join { … }` and every graft commit in the
    * block gates behind the SAME marker, flipping with the txn. The
    * coordinator must not decide (return from `run` / COMMIT) while a
    * joined block is still running — its commits would race the decision;
    * `join` refuses once the txn has decided. */
  final class TxnHandle private[GraftTransactions] (t: ActiveTxn) {
    def marker: String = t.markerBase
    def join[T](body: => T): T = {
      require(active.get() == null,
        "TxnHandle.join: this thread already has an open transaction")
      stateFresh(t.markerBase) match {
        case Pending(_) => ()
        case _ => sys.error(s"TxnHandle.join: cross-table transaction " +
          s"${t.markerBase} has already decided — nothing to join")
      }
      active.set(t)
      try body finally active.remove()
    }
  }

  /** The current thread's open transaction as a hand-off capability —
    * see [[TxnHandle]]. */
  def handle: TxnHandle = new TxnHandle(Option(active.get()).getOrElse(
    sys.error("GraftTransactions.handle: no open transaction on this " +
      "thread to hand off")))

  /** Join an open cross-table transaction FROM ANOTHER PROCESS (or any
    * JVM) by its marker base path — the multi-process participant
    * spelling (round 16). The reference's pipeline runs each stage as
    * its own OS process (bp_etl.sh → main_orchestrator.py); `join` lets
    * such a stage's commits gate behind the coordinator's marker, so the
    * whole multi-process pipeline flips visible with ONE decision:
    *
    *  - every graft commit inside `body` lands stamped with the SAME
    *    marker (the normal per-table CAS, invisible until the decision);
    *  - first touch of a NEW table registers through a put-if-absent
    *    side record (`<base>.root.<h>.json`) — a foreign process never
    *    rewrites the coordinator's pending list, so registration is
    *    race-free by construction;
    *  - a `body` failure ABORTS the transaction (the put-if-absent
    *    decision — the coordinator's later COMMIT loses and heals): a
    *    dead or failed participant can never let half a pipeline publish;
    *  - the coordinator must not decide while a joined body is running
    *    (the same contract as [[TxnHandle.join]]) — wait for the
    *    participant process to exit before COMMIT.
    *
    * Refuses when the marker does not exist or has already decided. */
  def join[T](spark: SparkSession, markerBase: String)(body: => T): T = {
    val base = joinSession(markerBase)
    val t = active.get()
    try body
    catch {
      case e: Throwable =>
        if (active.get() != null) {
          try {
            unbind(t)
            decide(base, "aborted", participantsOf(t))
            if (stateFresh(base) == Aborted) healParticipants(spark, t)
          } catch { case scala.util.control.NonFatal(_) => () }
        }
        throw e
    } finally {
      if (active.get() != null) unbind(t)
    }
  }

  /** Bind this thread INTO an open foreign transaction, unbracketed —
    * the SQL spelling `JOIN GRAFT TRANSACTION '<marker>'`. Every graft
    * commit until detach gates behind the marker. Detach with
    * [[leaveActive]] (`LEAVE GRAFT TRANSACTION`) once this session's
    * share of the work is done — the COORDINATOR decides; `ROLLBACK
    * GRAFT TRANSACTION` from a participant aborts the WHOLE transaction
    * (a participant that knows the work is bad must be able to stop the
    * publish); `COMMIT GRAFT TRANSACTION` from a participant refuses.
    * Refuses when the marker does not exist or has already decided. */
  def joinSession(markerBase: String): String = {
    require(active.get() == null,
      "cross-table transactions do not nest (an open transaction is " +
        "already bound to this thread)")
    val base = Paths.get(markerBase).toAbsolutePath.normalize.toString
    stateFresh(base) match {
      case Pending(_) =>
        if (store.read(pendingPath(base)).isEmpty)
          sys.error(s"JOIN GRAFT TRANSACTION: no transaction marker at " +
            s"$base (begin one with GraftTransactions.begin / BEGIN GRAFT " +
            "TRANSACTION, or check the marker path)")
      case _ => sys.error(s"JOIN GRAFT TRANSACTION: cross-table " +
        s"transaction $base has already decided — nothing to join")
    }
    val t = new ActiveTxn(base, joined = true)
    active.set(t)
    openInJvm.put(base, t)
    base
  }

  /** Detach a JOINED participant from its transaction WITHOUT deciding —
    * the SQL spelling `LEAVE GRAFT TRANSACTION`. The commits it landed
    * stay gated; the coordinator's decision flips them. Refuses on a
    * coordinating thread (an abandoned coordinator txn would gate its
    * tables until the stale-break — commit or roll back instead). */
  def leaveActive(): String = {
    val t = Option(active.get()).getOrElse(sys.error(
      "LEAVE GRAFT TRANSACTION: no open transaction on this thread"))
    if (!t.joined)
      sys.error(s"LEAVE GRAFT TRANSACTION: this thread COORDINATES " +
        s"${t.markerBase} — leaving would abandon the open gate on every " +
        "participant table until the stale-break; COMMIT or ROLLBACK " +
        "GRAFT TRANSACTION instead")
    unbind(t)
    t.markerBase
  }

  private def normalizeRoot(root: String): String =
    Paths.get(root).toAbsolutePath.normalize.toString

  /** The same-JVM coordinator-thread guard (VERDICT r15 #4): while a txn
    * is open ANYWHERE in this JVM, a graft commit from a thread with NO
    * bound txn, on a table that txn already touched, refuses loudly —
    * silently landing it would write an ungated, immediately-visible
    * commit the body believed was transactional. Zero cost with no open
    * txn (one empty-map check); a match re-reads the marker fresh so a
    * decided-but-not-yet-unbound txn (or a dead coordinator thread after
    * the stale-break) never blocks legitimate writers. */
  private[sources] def assertCoordinatedCommit(root: String): Unit = {
    if (active.get() != null || openInJvm.isEmpty) return
    val norm = normalizeRoot(root)
    val it = openInJvm.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val t = e.getValue
      if (t.roots.contains(norm)) stateFresh(t.markerBase) match {
        case Pending(_) =>
          throw new GraftOpenTransactionException(
            s"table $root was written by the OPEN cross-table transaction " +
              s"${t.markerBase}, coordinated by ANOTHER thread of this " +
              "JVM — commits that belong to the transaction must run on " +
              "its coordinating thread or opt in via " +
              "GraftTransactions.handle.join { … } (a bare Future/" +
              "parallel-collection commit inside the body does not gate); " +
              "commits that do not belong must wait for its decision")
        case _ => openInJvm.remove(e.getKey) // decided: unbind the ghost
      }
    }
  }

  /** Run `body` as one cross-table transaction. Every graft commit the
    * body issues on THIS thread gates behind the txn's marker; on normal
    * return the marker commits (one conditional put — all participants
    * flip visible atomically); on exception the marker aborts and every
    * participating table is healed with a `txn_revert` commit before the
    * exception rethrows. `markerDir` must be a location all readers and
    * writers of the participating tables can reach (a warehouse `_txns/`
    * dir is the natural home). */
  def run[T](spark: SparkSession, markerDir: String)(body: => T): T = {
    begin(markerDir)
    try {
      val result = body
      commitActive(spark)
      result
    } catch {
      case e: Throwable =>
        // no-op when commitActive already decided (it unbinds the thread
        // before throwing — e.g. lost to a stale-break, already healed)
        if (active.get() != null) {
          try rollbackActive(spark)
          catch { case scala.util.control.NonFatal(_) => () }
        }
        throw e
    }
  }

  /** Open an UNBRACKETED transaction on this thread — the SQL spelling
    * (`BEGIN GRAFT TRANSACTION`); pair with [[commitActive]] /
    * [[rollbackActive]]. Returns the marker base path (the handle
    * `SHOW GRAFT TRANSACTIONS` lists and [[abort]] takes from another
    * process). */
  def begin(markerDir: String): String = {
    require(active.get() == null,
      "cross-table transactions do not nest (an open transaction is " +
        "already bound to this thread)")
    val base = Paths.get(markerDir)
      .resolve(s"txn-${java.util.UUID.randomUUID().toString}")
      .toAbsolutePath.normalize.toString
    val pn = FileCow.jsonMapper.createObjectNode()
    pn.put("startMs", System.currentTimeMillis())
    store.put(pendingPath(base), FileCow.jsonMapper.writeValueAsBytes(pn))
    val t = new ActiveTxn(base)
    active.set(t)
    openInJvm.put(base, t)
    base
  }

  private def unbind(t: ActiveTxn): Unit = {
    active.remove()
    openInJvm.remove(t.markerBase)
    ()
  }

  /** The decision record's participant list: this JVM's landed versions
    * plus any roots only the marker files know (foreign joined
    * participants) — the final file is the complete ops surface. */
  private def participantsOf(t: ActiveTxn): Seq[(String, Seq[Long])] = {
    val own =
      t.synchronized { t.participants.toSeq.map { case (r, vs) => (r, vs.toSeq) } }
    val known = own.map(p => normalizeRoot(p._1)).toSet
    own ++ (pendingRoots(t.markerBase) ++ sideRoots(t.markerBase))
      .filterNot(r => known.contains(normalizeRoot(r)))
      .distinct.map(r => (r, Seq.empty[Long]))
  }

  /** Decide the thread's open transaction COMMITTED (the atomic
    * cross-table visibility flip) and unbind it. Throws
    * [[GraftTransactionAbortedException]] — after healing the
    * participants — when a stale-breaker decided an abort first. */
  def commitActive(spark: SparkSession): String = {
    val t = Option(active.get()).getOrElse(sys.error(
      "COMMIT GRAFT TRANSACTION: no open transaction on this thread"))
    if (t.joined)
      sys.error(s"COMMIT GRAFT TRANSACTION: this session JOINED " +
        s"${t.markerBase} as a participant — only the coordinating " +
        "session commits; LEAVE GRAFT TRANSACTION to detach, ROLLBACK " +
        "to abort the whole transaction")
    unbind(t)
    if (!decide(t.markerBase, "committed", participantsOf(t)))
      stateFresh(t.markerBase) match {
        case Committed => () // a duplicate decision of ours — idempotent
        case _ =>
          healParticipants(spark, t)
          throw new GraftTransactionAbortedException(t.markerBase)
      }
    t.markerBase
  }

  /** Decide the thread's open transaction ABORTED, heal every
    * participating table with a `txn_revert`, and unbind it. */
  def rollbackActive(spark: SparkSession): String = {
    val t = Option(active.get()).getOrElse(sys.error(
      "ROLLBACK GRAFT TRANSACTION: no open transaction on this thread"))
    unbind(t)
    decide(t.markerBase, "aborted", participantsOf(t)) // a prior stale-break just confirms
    if (stateFresh(t.markerBase) == Aborted) healParticipants(spark, t)
    t.markerBase
  }

  /** Heal EVERY participant the decider can see — this JVM's map plus
    * the marker's pending list and joined-process side records, so a
    * coordinator heals a foreign participant's tables too (and vice
    * versa). Tables the union misses still heal lazily at next touch
    * ([[checkGate]]). */
  private def healParticipants(spark: SparkSession, t: ActiveTxn): Unit =
    allRoots(t).foreach { r =>
      try revertAborted(spark, r)
      catch { case scala.util.control.NonFatal(_) => () }
    }

  // --------------------------------------------------------- ops surface

  /** The LIVE markers under `markerDir` as rows: (marker, status,
    * started_ms, decided_ms) — the `SHOW GRAFT TRANSACTIONS` ops surface.
    * Markers consolidated into the sealed ledger by [[vacuumMarkers]] have
    * aged out of the listing (their outcomes stay readable via [[state]]
    * forever) — the same retention semantics as DESCRIBE HISTORY after a
    * vacuum. */
  def listTransactions(markerDir: String): Seq[(String, String, Long, Long)] =
    listTransactionsDetailed(markerDir)
      .map { case (base, status, startMs, decidedMs, _) =>
        (base, status, startMs, decidedMs) }

  /** [[listTransactions]] plus each txn's PARTICIPANT roots — for an
    * open txn the union of the coordinator's pending list and joined-
    * process side records (the heal/ops set a dead coordinator leaves
    * behind); for a decided one the final record's own list. The
    * `participants` column of `SHOW GRAFT TRANSACTIONS`. */
  def listTransactionsDetailed(markerDir: String)
      : Seq[(String, String, Long, Long, Seq[String])] = {
    val dirPrefix = Paths.get(markerDir).toAbsolutePath.normalize.toString
    val names = store.list(dirPrefix)
      .map(markerName)
      .filter(f => f.startsWith("txn-") && f.endsWith(".json") &&
        !f.endsWith(".final.json") && !f.contains(".root."))
      .map(_.stripSuffix(".json"))
    names.sorted.map { n =>
      val base = Paths.get(dirPrefix).resolve(n).toString
      val startMs = store.read(pendingPath(base))
        .map(b => FileCow.jsonMapper.readTree(b).path("startMs").asLong(0L))
        .getOrElse(0L)
      val (status, decidedMs, decidedRoots) = store.read(finalPath(base)) match {
        case Some(b) =>
          val f = FileCow.jsonMapper.readTree(b)
          val arr = f.path("participants")
          val roots = (0 until arr.size).map(i =>
            arr.get(i).path("root").asText("")).filter(_.nonEmpty)
          (f.path("outcome").asText("aborted"),
            f.path("decidedMs").asLong(0L), roots)
        case None => ("open", 0L, Seq.empty[String])
      }
      val roots =
        if (status == "open") (pendingRoots(base) ++ sideRoots(base)).distinct
        else decidedRoots
      (base, status, startMs, decidedMs, roots.sorted.toSeq)
    }
  }

  // ---------------------------------------------- sealed ledger (GC)

  private def sealedPrefix(markerDir: String): String =
    Paths.get(markerDir).resolve("_sealed.").toString

  private def sealedFile(markerDir: String, gen: Long): String =
    sealedPrefix(markerDir) + gen + ".json"

  /** (generation, name -> (state, decidedMs)) of the dir's newest sealed
    * ledger; (0, empty) when none exists. */
  private def readLedger(markerDir: String): (Long, Map[String, (TxnState, Long)]) = {
    val prefix = sealedPrefix(markerDir)
    val gens = store.list(prefix).flatMap { k =>
      val tail = k.stripPrefix(prefix)
      if (tail.endsWith(".json")) tail.stripSuffix(".json").toLongOption else None
    }
    if (gens.isEmpty) return (0L, Map.empty)
    val gen = gens.max
    store.read(sealedFile(markerDir, gen)) match {
      case None => (gen, Map.empty) // raced a cleanup of an older gen
      case Some(b) =>
        val n = FileCow.jsonMapper.readTree(b)
        val entries = Map.newBuilder[String, (TxnState, Long)]
        val e = n.path("entries")
        e.properties().forEach { kv =>
          val v = kv.getValue
          entries += kv.getKey ->
            (if (v.path("outcome").asText("") == "committed") Committed
             else Aborted,
              v.path("decidedMs").asLong(0L))
        }
        (gen, entries.result())
    }
  }

  /** Outcome of a marker whose live files were consolidated into its
    * dir's sealed ledger. One ledger read per UNKNOWN marker per JVM —
    * the hit lands in `decidedCache` permanently. */
  private def sealedOutcome(markerBase: String): Option[(TxnState, Long)] = {
    val dir = Paths.get(markerBase).getParent
    if (dir == null) None
    else readLedger(dir.toString)._2.get(markerName(markerBase))
  }

  /** Marker GC (ADVICE r15): consolidate DECIDED markers older than
    * `retainMs` into the dir's sealed ledger and delete their files.
    * Visibility stays exact forever — [[state]] reads the ledger when
    * both marker files are gone — so gated versions never flip invisible
    * and a later stale-break can never put-if-absent `aborted` into a
    * vacant final path of a committed txn. The ledger generation advances
    * by PUT-IF-ABSENT: racing vacuums never lose each other's entries
    * (the loser re-reads and re-merges). Open markers are never touched.
    * Returns the number of markers sealed by THIS call. */
  def vacuumMarkers(markerDir: String,
      retainMs: Long = 7L * 24 * 3600 * 1000): Int = {
    val now = System.currentTimeMillis()
    val toSeal = listTransactions(markerDir).collect {
      case (base, status, _, decidedMs)
        if status != "open" && now - decidedMs >= retainMs =>
          markerName(base) -> (if (status == "committed") Committed else Aborted,
            decidedMs)
    }
    if (toSeal.isEmpty) return 0
    var sealedCount = 0
    var done = false
    while (!done) {
      val (gen, existing) = readLedger(markerDir)
      val fresh = toSeal.filterNot { case (name, _) => existing.contains(name) }
      if (fresh.isEmpty) { done = true }
      else {
        val merged = existing ++ fresh
        val n = FileCow.jsonMapper.createObjectNode()
        n.put("generation", gen + 1)
        val e = n.putObject("entries")
        merged.toSeq.sortBy(_._1).foreach { case (name, (st, ms)) =>
          val o = e.putObject(name)
          o.put("outcome", if (st == Committed) "committed" else "aborted")
          o.put("decidedMs", ms)
          ()
        }
        if (store.putIfAbsent(sealedFile(markerDir, gen + 1),
            FileCow.jsonMapper.writeValueAsBytes(n))) {
          sealedCount = fresh.size
          // this generation supersedes every older one; keep the previous
          // generation as the fallback a concurrent reader mid-listing may
          // still be reading, drop the rest
          if (gen >= 2L) (1L until gen).foreach(g =>
            store.delete(sealedFile(markerDir, g)))
          done = true
        } // else: lost the generation CAS — re-read and re-merge
      }
    }
    // entries are durably in the ledger: the marker files can go
    // (including joined-participant side records — outcome decided,
    // their registration has served its heal/ops purpose)
    toSeal.foreach { case (name, entry) =>
      val base = Paths.get(markerDir).resolve(name).toString
      decidedCache.put(base, entry)
      store.delete(finalPath(base))
      store.delete(pendingPath(base))
      store.list(base + ".root.").foreach(store.delete)
    }
    sealedCount
  }

  // ------------------------------------------------- reader resolution

  /** Resolve every graft read inside `body` against ONE snapshot instant
    * (the scope's start): each txn marker observes once and decisions
    * stamped mid-scope read as pending; each root's visible version pins
    * at first touch and never admits a commit stamped mid-scope. Two
    * tables gated by the same marker resolve all-pre or all-post, never
    * a mix, even if the marker commits mid-body — and a CLEAN commit that
    * builds on a mid-scope txn can't leak the txn in sideways. WRITE
    * statements inside the scope are exempt on their own table ([[
    * stateFresh]] / [[withoutSnapshot]]): a commit must derive against
    * the real head or it can never land. */
  def consistentRead[T](body: => T): T = {
    require(readSnapshot.get() == null, "consistentRead does not nest")
    readSnapshot.set(new Snapshot(System.currentTimeMillis()))
    try body finally readSnapshot.remove()
  }

  /** Run `body` with this thread's [[consistentRead]] scope SUSPENDED —
    * the writer-side escape (VERDICT r15 #3): a statement's derive loop
    * must see the table's real visible head, not the scope's pin, or its
    * CAS re-derives against a frozen version until it dies. */
  private[graft] def withoutSnapshot[T](body: => T): T = {
    val saved = readSnapshot.get()
    if (saved == null) body
    else {
      readSnapshot.remove()
      try body finally readSnapshot.set(saved)
    }
  }

  /** The newest VISIBLE version at or below `head`: walk below versions
    * gated by a non-committed txn. The walk is O(1) steady-state (clean /
    * committed versions cache permanently; only an open txn's suffix
    * re-reads its marker). A thread's OWN open txn reads its writes.
    * Inside a [[consistentRead]] scope the result memoizes per root at
    * first touch — see [[Snapshot]]. */
  private[sources] def visibleVersion(root: String, head: Long): Long = {
    val snap = readSnapshot.get()
    if (snap == null) {
      var v = head
      while (v >= 1L && !versionVisible(root, v)) v -= 1
      v
    } else {
      val pinned: Long =
        if (snap.heads.containsKey(root)) snap.heads.get(root)
        else {
          var v = head
          while (v >= 1L && !scopedVisible(root, v, snap)) v -= 1
          snap.heads.put(root, v)
          v
        }
      // the thread's own open txn still reads its writes above the pin
      var v = head
      while (v > pinned && !ownGated(root, v)) v -= 1
      v
    }
  }

  private def ownGated(root: String, v: Long): Boolean =
    FileCow.commitInfo(root, v).flatMap(_.txnMarker).exists(activeMarker.contains)

  /** Scope-pinned visibility of one version: own-txn writes always read;
    * anything stamped after the scope began is out; a txn gate resolves
    * through the scope's pinned marker observation. */
  private def scopedVisible(root: String, v: Long, snap: Snapshot): Boolean =
    FileCow.commitInfo(root, v) match {
      case None => true // pre-log: predates any scope
      case Some(ci) =>
        if (ci.txnMarker.exists(activeMarker.contains)) true
        else if (ci.commitMs > snap.startMs) false // landed after the scope began
        else ci.txnMarker match {
          case None => true
          case Some(m) => state(m) == Committed // memoized + decidedMs-pinned
        }
    }

  private[graft] def versionVisible(root: String, v: Long): Boolean = {
    val snap = readSnapshot.get()
    if (snap != null) return scopedVisible(root, v, snap)
    val key = s"$root@$v"
    if (visibleCache.containsKey(key)) return true
    FileCow.commitInfo(root, v) match {
      case None => cacheVisible(key); true // pre-log: no gate
      case Some(ci) => ci.txnMarker match {
        case None => cacheVisible(key); true
        case Some(m) if activeMarker.contains(m) => true // read-your-writes
        case Some(m) => state(m) match {
          case Committed => cacheVisible(key); true
          case _ => false // pending or aborted: below the gate
        }
      }
    }
  }

  /** Refuse a version the caller named explicitly (time travel) when it
    * was gated by a txn that is not committed. */
  private[graft] def requireReadable(root: String, v: Long): Unit =
    FileCow.commitInfo(root, v).flatMap(_.txnMarker)
      .filterNot(activeMarker.contains).foreach { m =>
        state(m) match {
          case Committed => ()
          case Aborted => sys.error(s"version $v of $root belongs to an " +
            s"ABORTED cross-table transaction ($m) — it was never visible")
          case Pending(_) => sys.error(s"version $v of $root belongs to an " +
            s"OPEN cross-table transaction ($m) — not yet visible " +
            "(commit or abort the transaction first)")
        }
      }

  // --------------------------------------------------- writer-side gate

  /** The writer-side gate (run from the commit conflict handler):
    * `expected` is the version the statement derived against (the VISIBLE
    * head), `head` the raw head its CAS just lost to; anything between is
    * either a plain lost race (handled by re-derive) or a txn gate to
    * resolve — break a stale txn, heal an aborted one (the `txn_revert`
    * commit), refuse loudly on a live open one. Marker reads here are
    * FRESH ([[stateFresh]]): a consistentRead scope must never pin this
    * freshness-critical path (VERDICT r15 #3). */
  private[sources] def checkGate(spark: SparkSession, root: String,
      expected: Long, head: Long): Unit = {
    if (head <= expected) return
    var sawAborted = false
    var v = head
    while (v > math.max(expected, 0L)) {
      FileCow.commitInfo(root, v).flatMap(_.txnMarker)
        .filterNot(activeMarker.contains).foreach { m =>
          stateFresh(m) match {
            case Committed => ()
            case Aborted => sawAborted = true
            case Pending(startMs) =>
              val age = System.currentTimeMillis() - startMs
              if (age > timeoutMs) {
                decide(m, "aborted") // break the stale txn (CAS; loser reads back)
                if (stateFresh(m) == Aborted) sawAborted = true
              } else throw new GraftOpenTransactionException(root, m, v)
          }
        }
      v -= 1
    }
    if (sawAborted) revertAborted(spark, root)
  }

  /** Heal an aborted-gated head: ONE `txn_revert` commit whose manifest,
    * schema, properties and DV registry are the last clean version's —
    * restore-shaped, metadata-sized, no data file read or written. Any
    * process may heal; a lost CAS means another healer (or writer) got
    * there first and the caller re-derives. Runs snapshot-free: healing
    * is a write path. */
  private[sources] def revertAborted(spark: SparkSession, root: String): Unit =
   withoutSnapshot {
    val head = FileCow.currentVersion(root)
    var clean = head
    while (clean >= 1L && {
      FileCow.commitInfo(root, clean).flatMap(_.txnMarker)
        .exists(m => stateFresh(m) == Aborted)
    }) clean -= 1
    if (clean == head || clean < 1L) return
    // the aborted suffix is contiguous by construction: writers refuse to
    // commit atop an unresolved gate, so nothing clean sits above it
    val target = FileCow.manifest(spark, root, clean)
    val current = FileCow.manifest(spark, root, head)
    val added = target.join(current, Seq("file"), "left_anti")
    val removed = current.join(target, Seq("file"), "left_anti")
    val regCur = FileCow.dvRegistryOf(root, head)
    val regTgt = FileCow.dvRegistryOf(root, clean)
    val dvChanged = (regCur.keySet ++ regTgt.keySet)
      .filter(b => regCur.get(b) != regTgt.get(b)).toSeq
    val delta =
      if (target.columns.toSeq == current.columns.toSeq)
        FileCow.AddedSlice(added)
      else FileCow.FullManifest(target)
    try FileCow.commit(spark, root, head, delta,
      FileCow.schemaOf(root, clean),
      FileCow.CommitAction("txn_revert", FileCow.filePaths(added),
        FileCow.filePaths(removed), dvFiles = dvChanged),
      props = Some(FileCow.tableProps(root, clean)),
      dvRegistry = Some(regTgt))
    catch { case _: ConcurrentPublishException => () } // someone else healed
    ()
  }
}

/** A commit refused because the table's head is gated by a LIVE open
  * cross-table transaction — the writer must wait for its decision (or
  * abort it via [[GraftTransactions.abort]] / let the
  * `graft.txn.timeoutMs` stale-break run). */
class GraftOpenTransactionException(message: String)
    extends RuntimeException(message) {
  def this(root: String, marker: String, version: Long) =
    this(s"table $root is gated by an OPEN cross-table transaction " +
      s"(version $version, marker $marker): commit or abort the " +
      "transaction, or wait for the graft.txn.timeoutMs stale-break")
}

/** The coordinator's own txn was aborted out from under it (stale-break
  * raced a long-running body). */
class GraftTransactionAbortedException(marker: String)
    extends RuntimeException(
      s"cross-table transaction $marker was aborted by another process " +
        "(stale-break?) before its commit decision — its writes were " +
        "reverted and are not visible")
