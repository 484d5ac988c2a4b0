package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan}
import org.apache.spark.sql.functions.{coalesce, col, count, lit, when}
import org.apache.spark.sql.types.StructType

import graft.sources.{FileCow, Versioned}

/** `MERGE INTO` over [[graft.sources.Versioned]] snapshot tables — the
  * reference's incremental merge (dw3_merge_inc.py:109-118) as REAL Spark
  * SQL, built from the three public extension points the ADR-001 gap left
  * unexercised while the ACID formats stay offline-absent:
  *
  *  - a resolution [[Rule]] ([[GraftMergeRule]]) intercepts the parser's
  *    `MergeIntoTable` when the target names a registered graft table and
  *    lowers it to [[GraftMergeCommand]];
  *  - a [[org.apache.spark.sql.execution.SparkStrategy]]
  *    ([[GraftMergeStrategy]]) plans the command;
  *  - a physical [[GraftMergeExec]] runs the upsert and publishes the
  *    result as the next immutable snapshot (so every MERGE is time-
  *    travelable and CDF-diffable through the existing G11/G17 machinery —
  *    the same commit model Delta gives MERGE, at this layout's scale).
  *
  * SUPPORTED SHAPE (the reference's, checked loudly, everything else falls
  * through untouched so real formats keep owning their tables):
  * `ON` a conjunction of same-name column equalities, `WHEN MATCHED THEN
  * UPDATE SET *`, `WHEN NOT MATCHED THEN INSERT *`, optional `WHEN NOT
  * MATCHED BY SOURCE THEN DELETE`. Duplicate source keys are rejected
  * (Delta's multiple-matches error) — a nondeterministic last-writer merge
  * must fail, not pick.
  *
  * Scale: the rewrite is source ∪ (current ⟕anti source) on the key — one
  * equi-join, broadcastable when the increment is small (the common case),
  * and the snapshot write is the same full-copy publish the format's
  * copy-on-write path performs; a file-level format narrows the copy to
  * touched files, which is exactly the ADR-001 seam.
  */
object GraftTables {

  /** root + layout kind: `cow = false` → [[graft.sources.Versioned]]
    * snapshot-level COW; `cow = true` → [[graft.sources.FileCow]]
    * file-level COW (same SQL surface, commit cost O(touched files)). */
  final case class Entry(root: String, cow: Boolean)

  /** JVM-local bindings — the pre-warehouse behavior, kept for embedded/
    * test use: register without a warehouse and the binding lives (only)
    * as long as the process. */
  private val tables = new ConcurrentHashMap[String, Entry]()

  /** Mirror of the attached warehouse's DURABLE registry
    * ([[graft.sources.CatalogStore]]), refreshed whenever the store's
    * pointer moves — so a name CREATEd by another driver process resolves
    * here without any registration call, and a DROP there stops resolving
    * here. An IMMUTABLE map swapped by reference: a clear-then-repopulate
    * mutable mirror would let a concurrent lookup transiently MISS a
    * registered name mid-refresh. */
  @volatile private var stored: Map[String, Entry] = Map.empty
  @volatile private var wh: Option[String] = None
  @volatile private var loadedVersion: Long = -1L

  /** Pointer-read throttle (VERDICT r12 #6): every lookup MISS used to
    * stat the `_catalog` pointer file, so with a warehouse attached every
    * non-graft relation and statement-intercept probe in every analyzer
    * fixpoint iteration paid filesystem I/O — a GET-per-name storm on an
    * object store. The mirror now re-checks the pointer at most once per
    * [[refreshTtlMs]]; another process's registration becomes visible
    * within the TTL (documented cross-process visibility latency), while
    * THIS process's own registrations/drops bypass it (refresh(force))
    * and stay read-your-writes. */
  @volatile private var lastPointerCheckMs = 0L
  private[graft] var refreshTtlMs: Long = 100L
  /** Test seam: pointer stats actually performed (CrossProcessCatalogSpec
    * pins ≤1 per statement under a long TTL). */
  private[graft] val pointerReads = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Attach the durable registry under `dir` (`<dir>/_catalog/`):
    * registrations write through to it (CAS-committed under the same
    * advisory-lock seam as table commits), lookups see every other
    * process's registrations, and a restarted driver re-attaches to find
    * its tables still bound. Deployment spelling:
    * `--conf spark.graft.warehouse=<dir>` (picked up at session build by
    * [[graft.GraftExtensions]]). */
  def attachWarehouse(dir: String): Unit = this.synchronized {
    wh = Some(dir); loadedVersion = -1L; refresh(force = true)
  }

  /** Detach (embedded/test use): durable bindings stop resolving here;
    * the store itself is untouched. */
  def detachWarehouse(): Unit = this.synchronized {
    wh = None; stored = Map.empty; loadedVersion = -1L
  }

  def warehouse: Option[String] = wh

  /** Re-mirror the store when its pointer moved — at most one tiny
    * pointer read per [[refreshTtlMs]] (per lookup miss before r13), a
    * snapshot load only on change. `force` bypasses the TTL for this
    * process's own mutations (read-your-writes). */
  private def refresh(force: Boolean = false): Unit = wh.foreach { d =>
    val now = System.currentTimeMillis()
    if (force || now - lastPointerCheckMs >= refreshTtlMs) {
      lastPointerCheckMs = now
      pointerReads.incrementAndGet()
      val v = graft.sources.CatalogStore.currentVersion(d)
      if (v != loadedVersion) this.synchronized {
        if (v != loadedVersion) {
          stored = graft.sources.CatalogStore.load(d, v)
            .map { case (k, b) => k -> Entry(b.root, b.cow) }
          loadedVersion = v
        }
      }
    }
  }

  /** Register `name` as a MERGE-able versioned table rooted at `root`. */
  def register(name: String, root: String): Unit =
    put(name, Entry(root, cow = false))

  /** Register `name` as a FILE-LEVEL COW table rooted at `root` (a
    * [[graft.sources.FileCow]] layout — created via `FileCow.create`). */
  def registerCow(name: String, root: String): Unit =
    put(name, Entry(root, cow = true))

  private def put(name: String, e: Entry): Unit = wh match {
    case Some(d) =>
      graft.sources.CatalogStore.commit(d)(m =>
        m + (normalize(name) -> graft.sources.CatalogStore.Binding(e.root, e.cow)))
      refresh(force = true)
    case None => tables.put(normalize(name), e); ()
  }

  def unregister(name: String): Unit = {
    tables.remove(normalize(name))
    wh.foreach { d =>
      graft.sources.CatalogStore.commit(d)(m => m - normalize(name))
      refresh(force = true)
    }
  }

  /** Re-bind `from`'s entry under `to` — ONE catalog commit (a racing
    * reader sees the old name or the new, never neither). DSv2
    * `ALTER TABLE RENAME TO` lands here. The target-collision check runs
    * INSIDE the store's lock-held RMW (a pre-check outside it would let a
    * racing CREATE's binding be silently clobbered), and the JVM-local
    * map follows only after the durable commit succeeded — a loud-failing
    * store must not leave this process renamed while every other process
    * still resolves the old name. */
  def rename(from: String, to: String): Unit = {
    val f = normalize(from); val t = normalize(to)
    wh.foreach { d =>
      graft.sources.CatalogStore.commit(d) { m =>
        m.get(f) match {
          case Some(b) =>
            require(!m.contains(t),
              s"rename $from -> $to: '$to' is already bound")
            m - f + (t -> b)
          case None => m
        }
      }
      refresh(force = true)
    }
    Option(tables.get(f)).foreach { e =>
      require(!tables.containsKey(t), s"rename $from -> $to: '$to' is already bound")
      tables.put(t, e); tables.remove(f); ()
    }
  }

  def rootOf(name: String): Option[String] = entryOf(name).map(_.root)

  def entryOf(name: String): Option[Entry] = {
    val k = normalize(name)
    Option(tables.get(k)).orElse { refresh(); stored.get(k) }
  }

  /** Every registered (name, entry), name-sorted — `SHOW GRAFT TABLES`.
    * Local bindings shadow same-named durable ones (matching [[entryOf]]'s
    * precedence). */
  def all(): Seq[(String, Entry)] = {
    import scala.jdk.CollectionConverters._
    // force: a LISTING is a rare, explicitly-metadata statement — one
    // pointer read for an exact answer beats a TTL-stale table list
    refresh(force = true)
    (stored ++ tables.asScala).toSeq.sortBy(_._1)
  }

  private def normalize(name: String): String = name.toLowerCase(java.util.Locale.ROOT)

  /** Multipart identifier → registry key: parts join with `.` (the
    * registry is flat — `db.t` is a NAME, registered as such; an exact
    * key either resolves or the statement falls through loudly to Spark's
    * catalog, never to a silent shadow). */
  def keyFor(multipart: Seq[String]): Option[String] =
    if (multipart.nonEmpty) Some(normalize(multipart.mkString("."))) else None

  /** Strip a leading DSv2-catalog segment from a statement name:
    * `graft.db.t` and `db.t` bind/resolve to the SAME flat registry key,
    * so both spellings of CREATE land one binding (a catalog-qualified
    * registration would otherwise be invisible to `SHOW TABLES IN graft`,
    * which lists by the flat key). Backticked rests (path tables) keep
    * the prefix — `graft.&#96;/p&#96;` is the path spelling, not a key. */
  def stripCatalog(name: String): String = {
    val i = name.indexOf('.')
    if (i > 0 && i + 1 < name.length && name.charAt(i + 1) != '`' &&
        graft.sources.GraftCatalog.isCatalogName(name.substring(0, i)))
      name.substring(i + 1)
    else name
  }

  /** PATH tables — Delta's `delta.&#96;/path&#96;` spelling: the namespace
    * part names the layout and the (path-shaped, so a registered dotted
    * name `graft.t` can never collide) second part IS the root. No
    * registration; one definition shared by the resolution rule and the
    * statement intercepts. */
  def pathEntry(parts: Seq[String]): Option[Entry] = parts match {
    case Seq(ns, path) if ns.equalsIgnoreCase("graft_cow") && path.contains('/') =>
      Some(Entry(path, cow = true))
    case Seq(ns, path) if ns.equalsIgnoreCase("graft") && path.contains('/') =>
      Some(Entry(path, cow = false))
    case _ => None
  }

  private val PathName = """^([A-Za-z_][A-Za-z0-9_]*)\.`([^`]+)`$""".r

  /** A statement-intercept name string → entry: the registry binding, the
    * `ns.&#96;/path&#96;` spelling, or a DSv2-catalog-qualified name
    * (`graft.db.t` — the leading segment names a registered
    * [[graft.sources.GraftCatalog]], stripped before the flat-key lookup). */
  def resolveName(name: String): Option[Entry] = name match {
    case PathName(ns, path) => pathEntry(Seq(ns, path))
    case _ => entryOf(name).orElse {
      val i = name.indexOf('.')
      if (i > 0 && graft.sources.GraftCatalog.isCatalogName(name.substring(0, i)))
        resolveName(name.substring(i + 1))
      else None
    }
  }
}

/** Non-Expression holder: DML conditions/assignments captured at parse
  * time reference table columns that resolve only against the snapshot
  * read at EXECUTION time, so they must ride the command without being
  * walked by `TreeNode.expressions` (an unresolved expression field would
  * fail CheckAnalysis before our exec ever runs). */
final case class ExprHolder(e: Expression)
final case class AssignHolder(column: String, value: Expression)

/** The full Delta-style MERGE clause surface, captured as opaque holders
  * (same CheckAnalysis-dodging contract as [[ExprHolder]]): matched
  * clauses apply FIRST-MATCH-WINS per row; a matched row no clause claims
  * stays unchanged; an unmatched source row no insert clause claims is
  * dropped. */
sealed trait MergeMatched { def cond: Option[ExprHolder] }
final case class MUpdateStar(cond: Option[ExprHolder]) extends MergeMatched
final case class MUpdate(cond: Option[ExprHolder],
    assigns: Seq[AssignHolder]) extends MergeMatched
final case class MDelete(cond: Option[ExprHolder]) extends MergeMatched
sealed trait MergeNotMatched { def cond: Option[ExprHolder] }
final case class MInsertStar(cond: Option[ExprHolder]) extends MergeNotMatched
final case class MInsert(cond: Option[ExprHolder],
    assigns: Seq[AssignHolder]) extends MergeNotMatched

/** Lowers upsert-shaped [[MergeIntoTable]], single-table DELETE/UPDATE,
  * bare SELECT, and `VERSION AS OF` time travel on registered graft
  * tables. Top-down ([[LogicalPlan.resolveOperatorsDown]]) so a DML
  * node claims its target relation before the bare-relation case would. */
class GraftMergeRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // V2 write commands (AppendData/OverwriteByExpression riding the DSv2
    // catalog's V1Write fallback) need their target relation INTACT — only
    // read-positioned GraftV2Table relations swap to the v1 scan plan.
    // LAZY: the collection walk only runs when the plan actually contains
    // a GraftV2Table relation (the guard's first evaluation), so the vast
    // majority of rule invocations pay nothing extra per fixpoint iteration
    lazy val writeTargets: java.util.Set[LogicalPlan] = {
      val s = java.util.Collections.newSetFromMap(
        new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
      plan.foreach {
        case w: V2WriteCommand => s.add(w.table); ()
        case _ => ()
      }
      s
    }
    plan.resolveOperatorsDown(lower(() => writeTargets))
  }

  private def lower(writeTargets: () => java.util.Set[LogicalPlan])
      : PartialFunction[LogicalPlan, LogicalPlan] = {
    case m @ MergeIntoTable(target, source, cond, matched, notMatched, bySource,
        withSchemaEvolution) =>
      registered(target) match {
        case Some((name, entry)) =>
          val keys = equalityKeys(cond).getOrElse(fail(
            s"graft MERGE INTO $name: ON must be a conjunction of t.col = s.col equalities with matching column names"))
          // a DSv2-catalog-resolved target means the analyzer may already
          // have resolved clause attributes against the relation we are
          // about to drop — re-unresolve them (keeping the last qualifier
          // for t./s. disambiguation) so they re-resolve at execution
          def h(e: Expression): ExprHolder = ExprHolder(reUnresolve(e))
          def asgn(assignments: Seq[Assignment]): Seq[AssignHolder] =
            assignments.map {
              case Assignment(k: UnresolvedAttribute, v) =>
                AssignHolder(k.nameParts.last, reUnresolve(v))
              case Assignment(k: Attribute, v) =>
                AssignHolder(k.name, reUnresolve(v))
              case other =>
                fail(s"graft MERGE INTO $name: unsupported assignment target: $other")
            }
          val matchedH: Seq[MergeMatched] = matched.map {
            case UpdateStarAction(c) => MUpdateStar(c.map(h))
            case UpdateAction(c, assignments, _) =>
              MUpdate(c.map(h), asgn(assignments))
            case DeleteAction(c) => MDelete(c.map(h))
            case other => fail(s"graft MERGE INTO $name: unsupported MATCHED action: $other")
          }
          val notMatchedH: Seq[MergeNotMatched] = notMatched.map {
            case InsertStarAction(c) => MInsertStar(c.map(h))
            case InsertAction(c, assignments) =>
              MInsert(c.map(h), asgn(assignments))
            case other => fail(s"graft MERGE INTO $name: unsupported NOT MATCHED action: $other")
          }
          val bySourceH: Seq[MergeMatched] = bySource.map {
            case DeleteAction(c) => MDelete(c.map(h))
            case UpdateAction(c, assignments, _) =>
              MUpdate(c.map(h), asgn(assignments))
            case other => fail(s"graft MERGE INTO $name: unsupported NOT MATCHED BY SOURCE action: $other")
          }
          GraftMergeCommand(name, entry.root, keys, bySourceH, source,
            entry.cow, matchedH, notMatchedH, quals(target), quals(source),
            schemaEvolution = withSchemaEvolution)
        case None => m // not ours — leave for DSv2 resolution
      }

    case i @ InsertIntoStatement(target, partitionSpec, userCols, query,
        overwrite, _, byName) =>
      registered(target) match {
        case Some((name, entry)) =>
          if (partitionSpec.nonEmpty)
            fail(s"graft INSERT INTO $name: PARTITION spec unsupported")
          if (byName && userCols.nonEmpty)
            fail(s"graft INSERT INTO $name: BY NAME cannot combine with an " +
              "explicit column list")
          GraftInsertCommand(name, entry.root, query, overwrite, entry.cow,
            userCols = userCols, byName = byName)
        case None => i
      }

    case d @ DeleteFromTable(target, cond) =>
      registered(target) match {
        case Some((name, entry)) =>
          GraftDeleteCommand(name, entry.root, ExprHolder(stripQualifiers(cond)), entry.cow)
        case None => d
      }

    case u @ UpdateTable(target, assignments, cond) =>
      registered(target) match {
        case Some((name, entry)) =>
          val assigns = assignments.map {
            case Assignment(k: UnresolvedAttribute, v) =>
              AssignHolder(k.nameParts.last, stripQualifiers(v))
            case Assignment(k: Attribute, v) =>
              AssignHolder(k.name, stripQualifiers(v))
            case other => fail(s"graft UPDATE $name: unsupported assignment target: $other")
          }
          GraftUpdateCommand(name, entry.root, assigns,
            cond.map(c => ExprHolder(stripQualifiers(c))), entry.cow)
        case None => u
      }

    case tt @ org.apache.spark.sql.catalyst.analysis.RelationTimeTravel(
        rel: UnresolvedRelation, ts, version) =>
      resolveParts(rel.multipartIdentifier) match {
        case Some((name, entry)) =>
          val v = (ts, version) match {
            case (None, Some(ver)) => ver.toLong
            case (Some(tsExpr), None) =>
              val ms = evalTimestampMs(tsExpr).getOrElse(fail(
                s"graft time travel on $name: TIMESTAMP AS OF must be a literal timestamp, got $tsExpr"))
              if (entry.cow) FileCow.versionAtTimestamp(entry.root, ms)
              else Versioned.versionAtTimestamp(entry.root, ms)
            case _ => fail(s"graft time travel on $name: VERSION AS OF or TIMESTAMP AS OF required")
          }
          if (entry.cow) snapshotPlan(FileCow.readVersion(spark, entry.root, v))
          else snapshotPlan(Versioned.readVersion(spark, entry.root, v))
        case None => tt
      }

    case ac @ AddColumns(t: org.apache.spark.sql.catalyst.analysis.UnresolvedTable, cols) =>
      resolveParts(t.multipartIdentifier) match {
        case Some((name, entry)) if entry.cow =>
          val fields = cols.map { c =>
            if (c.path.nonEmpty) fail(s"graft ALTER TABLE $name: nested column paths unsupported")
            if (c.position.nonEmpty) fail(s"graft ALTER TABLE $name: column position unsupported")
            org.apache.spark.sql.types.StructField(c.colName, c.dataType, c.nullable)
          }
          // ADD COLUMN … DEFAULT <literal>: Iceberg-v3 initial-default
          // semantics on this layout — pre-ALTER files fill the default on
          // read, omitting writes materialize it (CowDefaults)
          val defaults = cols.flatMap(c =>
            c.default.map(d => c.colName -> d.originalSQL)).toMap
          GraftAddColumnsCommand(name, entry.root, fields, defaults)
        case Some((name, _)) =>
          fail(s"graft ALTER TABLE $name: ADD COLUMNS is a cow-table operation " +
            "(a snapshot table takes its schema from each publish)")
        case None => ac
      }

    case dc @ DropColumns(t: org.apache.spark.sql.catalyst.analysis.UnresolvedTable,
        cols, _) =>
      resolveParts(t.multipartIdentifier) match {
        case Some((name, entry)) if entry.cow =>
          val names = cols.map {
            case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFieldName =>
              if (f.name.length != 1)
                fail(s"graft ALTER TABLE $name: nested column paths unsupported")
              f.name.head
            case other => fail(s"graft ALTER TABLE $name: unsupported drop target: $other")
          }
          GraftDropColumnsCommand(name, entry.root, names)
        case Some((name, _)) =>
          fail(s"graft ALTER TABLE $name: DROP COLUMNS is a cow-table operation " +
            "(a snapshot table takes its schema from each publish)")
        case None => dc
      }

    case t @ TruncateTable(child) =>
      commandTarget(child) match {
        case Some((name, entry)) => GraftTruncateCommand(name, entry.root, entry.cow)
        case None => t
      }

    case d @ DropTable(child, _, _) =>
      commandTarget(child) match {
        // registry-bound name: DROP is a catalog-lite operation — the
        // binding goes away, the data dirs stay (external-table semantics:
        // the root was caller-provided; reclaim is vacuum's job)
        case Some((name, _)) => GraftDropTableCommand(name)
        case None => d
      }

    // a relation the DSv2 catalog resolved ([[graft.sources.GraftCatalog]]
    // loadTable → GraftV2Table): swap in the SAME manifest-pruned v1 scan
    // plan every other read path uses (deletion vectors, defaults fill,
    // column mapping, metadata-only aggregates all apply — one read path,
    // no drift), preserving the relation's output attribute ids so
    // already-resolved references above stay valid
    case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
        if r.table.isInstanceOf[graft.sources.GraftV2Table] &&
          !writeTargets().contains(r) =>
      swapV2Scan(r)

    // `spark.readStream.table("graft.t")`: the catalog resolved a
    // STREAMING read to our table — swap in the PROVEN V1 graft-cow
    // source (the format("graft-cow") table stream: schema pinning,
    // vacuum-protection registration, rate limits, AvailableNow), output
    // ids preserved. Reader options pass through (root is ours).
    case s: org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
        if s.table.isInstanceOf[graft.sources.GraftV2Table] =>
      val g = s.table.asInstanceOf[graft.sources.GraftV2Table]
      require(g.entry.cow, s"${g.name()}: streaming reads are a cow-table " +
        "surface (snapshot-level tables re-publish whole versions; stream " +
        "the cow layout or the change feed)")
      require(g.pinned.isEmpty,
        s"${g.name()}: a stream reads forward — VERSION/TIMESTAMP AS OF " +
          "cannot combine with readStream (use startingVersion)")
      import scala.jdk.CollectionConverters._
      val opts = s.extraOptions.asScala.toMap + ("root" -> g.entry.root)
      val ds = org.apache.spark.sql.execution.datasources.DataSource(
        org.apache.spark.sql.classic.SparkSession.active,
        className = "graft-cow", options = opts)
      org.apache.spark.sql.execution.streaming.runtime.StreamingRelation(
        ds, "graft-cow", s.output)

    case rel: UnresolvedRelation =>
      resolveParts(rel.multipartIdentifier) match {
        case Some((_, entry)) if entry.cow && FileCow.currentVersion(entry.root) > 0 =>
          snapshotPlan(FileCow.read(spark, entry.root))
        case Some((_, entry)) if !entry.cow && Versioned.currentVersion(entry.root) > 0 =>
          snapshotPlan(Versioned.read(spark, entry.root))
        // a PATH-spelled table that does not exist must fail loudly — the
        // namespace claimed graft explicitly, there is nothing sane to
        // fall through to (Delta's "not a delta table" contract)
        case Some((name, entry))
            if GraftTables.keyFor(rel.multipartIdentifier)
              .flatMap(GraftTables.entryOf).isEmpty =>
          sys.error(s"$name: no published graft table under '${entry.root}'")
        case _ => rel // registered-but-empty (no snapshot to scan)
      }
  }

  /** Current/travel snapshot as an analyzed scan plan (pointer resolved at
    * plan time — the same read-committed semantics as Versioned.read). */
  private def snapshotPlan(df: org.apache.spark.sql.DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  /** [[graft.sources.GraftV2Table]] relation → the v1 scan plan, with the
    * v2 relation's output ids preserved through an aliasing Project (the
    * analyzer may already have resolved references against them in the
    * same fixpoint iteration that created the relation). */
  private def swapV2Scan(
      r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation)
      : LogicalPlan = {
    val g = r.table.asInstanceOf[graft.sources.GraftV2Table]
    val df = (g.entry.cow, g.pinned) match {
      case (true, Some(v)) => FileCow.readVersion(spark, g.entry.root, v)
      case (true, None) => FileCow.read(spark, g.entry.root)
      case (false, Some(v)) => Versioned.readVersion(spark, g.entry.root, v)
      case (false, None) => Versioned.read(spark, g.entry.root)
    }
    val fresh = snapshotPlan(df)
    val byName = fresh.output.map(a =>
      a.name.toLowerCase(java.util.Locale.ROOT) -> a).toMap
    val cols = r.output.map { old =>
      val now = byName.getOrElse(old.name.toLowerCase(java.util.Locale.ROOT),
        fail(s"${g.name()}: column '${old.name}' vanished between catalog " +
          "resolution and scan planning (concurrent schema change) — re-run"))
      require(now.dataType == old.dataType, s"${g.name()}: column " +
        s"'${old.name}' changed type between catalog resolution and scan " +
        s"planning (${old.dataType.simpleString} → ${now.dataType.simpleString}) — re-run")
      org.apache.spark.sql.catalyst.expressions.Alias(now, old.name)(
        exprId = old.exprId)
    }
    Project(cols, fresh)
  }

  /** Resolved references captured into command holders must re-unresolve:
    * the relation they resolved against is dropped with the statement, and
    * the holder re-resolves against the execution-time snapshot frame. The
    * LAST qualifier part survives (`t.k` stays `t.k`) so MERGE's
    * target/source disambiguation keeps working. */
  private def reUnresolve(e: Expression): Expression = e.transform {
    case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
      UnresolvedAttribute(a.qualifier.takeRight(1) :+ a.name)
  }

  /** Registry binding, the DSv2-catalog-qualified spelling (leading
    * segment names a registered [[graft.sources.GraftCatalog]] — stripped),
    * or the path-table spelling ([[GraftTables.pathEntry]]); registered
    * names always win. */
  private def resolveParts(parts: Seq[String]): Option[(String, GraftTables.Entry)] =
    GraftTables.keyFor(parts).flatMap(k => GraftTables.entryOf(k).map((k, _)))
      .orElse {
        if (parts.length > 1 && graft.sources.GraftCatalog.isCatalogName(parts.head))
          GraftTables.keyFor(parts.tail).flatMap(k =>
            GraftTables.entryOf(k).map((k, _)))
        else None
      }
      .orElse(GraftTables.pathEntry(parts).map(e =>
        (s"${parts.head.toLowerCase(java.util.Locale.ROOT)}.`${parts(1)}`", e)))

  private def registered(target: LogicalPlan): Option[(String, GraftTables.Entry)] =
    targetName(target).flatMap(resolveParts)

  /** The registry entry a catalog-command target names — commands wrap the
    * name in `UnresolvedTable` / `UnresolvedIdentifier` /
    * `UnresolvedTableOrView` depending on the statement. */
  private def commandTarget(child: LogicalPlan): Option[(String, GraftTables.Entry)] = {
    val parts = child match {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
        Some(u.multipartIdentifier)
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier =>
        Some(u.nameParts)
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView =>
        Some(u.multipartIdentifier)
      // DROP's identifier resolves eagerly (existence not required), so by
      // the time this rule runs the name rides a ResolvedIdentifier; a bare
      // statement name lands in the session catalog's default namespace
      case r: org.apache.spark.sql.catalyst.analysis.ResolvedIdentifier
          if r.identifier.namespace.isEmpty ||
            r.identifier.namespace.sameElements(Array("default")) =>
        Some(Seq(r.identifier.name))
      // the DSv2 catalog resolved the command target to our own table —
      // claim it so the intercepted semantics (one commit, registry DROP,
      // snapshot TRUNCATE) stay identical across both spellings
      case r: org.apache.spark.sql.catalyst.analysis.ResolvedTable
          if r.table.isInstanceOf[graft.sources.GraftV2Table] =>
        Some(r.table.asInstanceOf[graft.sources.GraftV2Table].nameParts)
      case r: org.apache.spark.sql.catalyst.analysis.ResolvedIdentifier
          if r.catalog.isInstanceOf[graft.sources.GraftCatalog] =>
        Some((r.catalog.name() +: r.identifier.namespace.toSeq) :+
          r.identifier.name)
      case _ => None
    }
    parts.flatMap(resolveParts)
  }

  /** `t.k` → `k`: single-table DML conditions resolve against the snapshot
    * frame, which does not carry the statement's alias. An
    * already-RESOLVED reference (DSv2-catalog-resolved target) strips the
    * same way — re-unresolved to its bare name. */
  private def stripQualifiers(e: Expression): Expression = e.transform {
    case a: UnresolvedAttribute if a.nameParts.length > 1 =>
      UnresolvedAttribute(Seq(a.nameParts.last))
    case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
      UnresolvedAttribute(Seq(a.name))
  }

  private def fail(msg: String): Nothing = sys.error(msg)

  /** Fold a literal `TIMESTAMP AS OF` operand to epoch millis: the parser
    * hands a string/timestamp literal; a cast + eval resolves it without
    * needing the analyzer (the expression never joins a plan). The cast's
    * zone is the SESSION timezone — Spark/Delta resolve time-travel
    * timestamps in `spark.sql.session.timeZone`, so a zoneless literal in a
    * non-UTC session must not silently shift by the offset. */
  private def evalTimestampMs(e: Expression): Option[Long] = {
    val cast = org.apache.spark.sql.catalyst.expressions.Cast(
      e, org.apache.spark.sql.types.TimestampType,
      Some(spark.sessionState.conf.sessionLocalTimeZone))
    if (!e.foldable) None
    else Option(cast.eval(null)).map(micros => micros.asInstanceOf[Long] / 1000L)
  }

  private def targetName(plan: LogicalPlan): Option[Seq[String]] = plan match {
    case u: UnresolvedRelation => Some(u.multipartIdentifier)
    case SubqueryAlias(_, child) => targetName(child)
    case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      r.table match {
        case g: graft.sources.GraftV2Table => Some(g.nameParts)
        case _ => None
      }
    case _ => None
  }

  /** Qualifiers a clause expression may use for this side: the alias if
    * one was written, plus the bare table name (SQL allows either). */
  private def quals(plan: LogicalPlan): Seq[String] = plan match {
    case SubqueryAlias(id, child) => id.name +: quals(child)
    case u: UnresolvedRelation => Seq(u.multipartIdentifier.last)
    case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      r.table match {
        case g: graft.sources.GraftV2Table => Seq(g.ident.name)
        case _ => Nil
      }
    case _ => Nil
  }

  /** ON t.k1 = s.k1 AND t.k2 = s.k2 → Seq(k1, k2); None if any conjunct is
    * not a same-name attribute equality. A resolved side (DSv2-resolved
    * target) contributes its bare attribute name. */
  private def equalityKeys(cond: Expression): Option[Seq[String]] = {
    def nameOf(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.nameParts.last)
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
        Some(a.name)
      case _ => None
    }
    cond match {
      case And(l, r) => for (a <- equalityKeys(l); b <- equalityKeys(r)) yield a ++ b
      case EqualTo(l, r) =>
        for (a <- nameOf(l); b <- nameOf(r) if a.equalsIgnoreCase(b)) yield Seq(a)
      case _ => None
    }
  }
}

/** Resolved logical MERGE on a graft table; child = the source relation.
  * `matched`/`notMatched` carry the full clause list (first-match-wins);
  * the star pair (`UPDATE SET *` + `INSERT *`, unconditioned) takes the
  * original touched-file fast path. */
case class GraftMergeCommand(
    table: String,
    root: String,
    keys: Seq[String],
    bySource: Seq[MergeMatched],
    source: LogicalPlan,
    cow: Boolean = false,
    matched: Seq[MergeMatched] = Seq(MUpdateStar(None)),
    notMatched: Seq[MergeNotMatched] = Seq(MInsertStar(None)),
    tQuals: Seq[String] = Nil,
    sQuals: Seq[String] = Nil,
    schemaEvolution: Boolean = false) extends UnaryNode with Command {
  override def child: LogicalPlan = source
  override def output: Seq[Attribute] = Nil
  def starShape: Boolean = matched == Seq(MUpdateStar(None)) &&
    notMatched == Seq(MInsertStar(None))
  /** The star fast path's bySource shape: plain unconditioned DELETE. */
  def deleteUnmatched: Boolean = bySource == Seq(MDelete(None))
  override protected def withNewChildInternal(newChild: LogicalPlan): GraftMergeCommand =
    copy(source = newChild)
}

/** `CREATE TABLE t AS SELECT …` on a REGISTERED graft name: materialize the
  * query as version 1 (cow: [[graft.sources.FileCow.create]] with stats on
  * every min/max-able column, Delta's default stats discipline; snapshot:
  * [[graft.sources.Versioned.publish]]). Fails if the table already has a
  * version — CREATE means create. */
case class GraftCtasCommand(table: String, root: String, query: LogicalPlan,
    cow: Boolean = false, ifNotExists: Boolean = false,
    orReplace: Boolean = false,
    /** Same contract as [[GraftCreateTableCommand.autoRegister]]: the
      * statement claimed an unregistered name via `USING graft[-cow]`;
      * the binding commits only after the create succeeds. */
    autoRegister: Boolean = false)
    extends UnaryNode with Command {
  override def child: LogicalPlan = query
  override def output: Seq[Attribute] = Nil
  override protected def withNewChildInternal(newChild: LogicalPlan): GraftCtasCommand =
    copy(query = newChild)
}

/** Plain `CREATE TABLE t (col type [NOT NULL], …)` on a registered graft
  * name — an EMPTY table with a DECLARED schema (the front door Delta and
  * Iceberg both treat as the migration entry; CTAS covers only the user
  * whose first statement already has a seed query). `statsCols` empty =
  * derive the prune columns from the schema ([[GraftWriteSupport
  * .statsEligible]]), exactly as CTAS does. Planned by
  * [[GraftMergeStrategy]]; mechanism = [[graft.sources.FileCow
  * .createEmpty]] (cow) / an empty [[graft.sources.Versioned]] publish. */
case class GraftCreateTableCommand(table: String, root: String,
    declaredSchema: StructType, cow: Boolean, ifNotExists: Boolean,
    statsCols: Seq[String], props: Map[String, String],
    /** True when the statement itself claimed an UNREGISTERED name via
      * `USING graft|graft-cow` — the binding commits (durably, when a
      * warehouse is attached) only AFTER the create succeeds, so a failed
      * create never leaves a dangling name. */
    autoRegister: Boolean = false)
    extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** `INSERT INTO t [(a, b, …)] SELECT …` / `INSERT OVERWRITE t SELECT …` on
  * a graft table: positional column resolution with casts to the table's
  * declared types (ANSI INSERT), then an append-only commit (cow: new data
  * files, every current file kept by reference — O(increment); snapshot:
  * publish current ∪ increment) or a full replace under OVERWRITE. An
  * explicit column list (`userCols`) maps the query's columns to the named
  * table columns positionally; omitted columns pad NULL — refusing loudly
  * when the omitted column is NOT NULL (ANSI semantics, Delta's contract).
  * An INSERT into a never-created table creates it (the same bootstrap
  * courtesy the first MERGE extends) — column lists need a declared schema
  * to resolve against, so they refuse on the bootstrap path. */
case class GraftInsertCommand(table: String, root: String, query: LogicalPlan,
    overwrite: Boolean, cow: Boolean = false, userCols: Seq[String] = Nil,
    /** `INSERT INTO t BY NAME SELECT …` (Delta's spelling): the query's
      * columns map to same-named table columns; omitted nullable/defaulted
      * columns pad, unknown columns refuse. */
    byName: Boolean = false)
    extends UnaryNode with Command {
  override def child: LogicalPlan = query
  override def output: Seq[Attribute] = Nil
  override protected def withNewChildInternal(newChild: LogicalPlan): GraftInsertCommand =
    copy(query = newChild)
}

/** `DELETE FROM t WHERE cond` on a graft table: publish current ⊖ cond. */
case class GraftDeleteCommand(table: String, root: String, cond: ExprHolder,
    cow: Boolean = false) extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** `TRUNCATE TABLE t`: one commit that empties the table — the schema and
  * the version history survive (time travel still reads pre-truncate
  * snapshots; vacuum reclaims them on its own schedule). */
case class GraftTruncateCommand(table: String, root: String,
    cow: Boolean = false) extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** `DROP TABLE t` on a registry-bound name: removes the catalog-lite
  * binding only. Data dirs remain on disk (external-table semantics — the
  * root was the caller's path); a later `registerCow`/`register` of the
  * same root re-attaches the full history. */
case class GraftDropTableCommand(table: String) extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** `ALTER TABLE t ADD COLUMNS (…)` on a cow table: ONE metadata-only
  * commit ([[graft.sources.FileCow.addColumns]]); `defaults` carries each
  * `DEFAULT <literal>` clause's original SQL. */
case class GraftAddColumnsCommand(table: String, root: String,
    fields: Seq[org.apache.spark.sql.types.StructField],
    defaults: Map[String, String] = Map.empty)
    extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** `ALTER TABLE t DROP COLUMNS (…)` on a cow table: ONE metadata-only
  * commit ([[graft.sources.FileCow.dropColumns]]). */
case class GraftDropColumnsCommand(table: String, root: String,
    names: Seq[String]) extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** `UPDATE t SET col = v, … [WHERE cond]` on a graft table. */
case class GraftUpdateCommand(
    table: String,
    root: String,
    assignments: Seq[AssignHolder],
    cond: Option[ExprHolder],
    cow: Boolean = false) extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** Shared lowering helpers for the SQL write path (CTAS / INSERT). */
object GraftWriteSupport {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.types.StructType

  /** Columns whose per-file [min, max] the manifest can track and
    * [[graft.sources.FileCow]]'s admission can prune on — one definition,
    * shared with the `format("graft-cow")` writer. */
  def statsEligible(schema: StructType): Seq[String] =
    FileCow.statsEligible(schema)

  /** ANSI positional INSERT resolution: same arity, each source column cast
    * to the table column's declared type and renamed to it. */
  def positional(src: DataFrame, schema: StructType): DataFrame = {
    require(src.columns.length == schema.length,
      s"INSERT arity mismatch: query produces ${src.columns.length} columns, " +
        s"table has ${schema.length}")
    // rename by POSITION first: source names can collide (`SELECT 7, 7`)
    // or contain dots (`SELECT 2.5`), so name-based selection would be
    // ambiguous or parse as field extraction
    src.toDF(schema.indices.map(i => s"_ins_c$i"): _*)
      .select(schema.fields.zipWithIndex.map { case (f, i) =>
        col(s"_ins_c$i").cast(f.dataType).as(f.name)
      }.toSeq: _*)
  }

  /** Explicit-column-list INSERT resolution: the query's i-th column feeds
    * the i-th NAMED table column; omitted columns pad the column's DEFAULT
    * when one is declared ([[graft.sources.FileCow.defaultSqlOf]]), else
    * typed NULL — unless NOT NULL, which refuses loudly (padding NULL into
    * it would poison reads; the same contract as MERGE's INSERT pad). */
  def positional(src: DataFrame, schema: StructType, userCols: Seq[String],
      defaults: Map[String, String] = Map.empty): DataFrame =
    if (userCols.isEmpty) positional(src, schema)
    else {
      def lc(s: String) = s.toLowerCase(java.util.Locale.ROOT)
      val names = userCols.map(lc)
      require(names.distinct.length == names.length,
        s"INSERT column list repeats a column: ${userCols.mkString(", ")}")
      val tableCols = schema.fields.map(f => lc(f.name)).toSet
      val unknown = userCols.filterNot(c => tableCols(lc(c)))
      require(unknown.isEmpty,
        s"INSERT column list names unknown column(s): ${unknown.mkString(", ")}")
      require(src.columns.length == userCols.length,
        s"INSERT arity mismatch: query produces ${src.columns.length} " +
          s"columns, column list names ${userCols.length}")
      val srcPos = names.zipWithIndex.toMap // table column (lc) → query position
      val tmp = src.toDF(userCols.indices.map(i => s"_ins_c$i"): _*)
      tmp.select(schema.fields.toSeq.map { f =>
        srcPos.get(lc(f.name)) match {
          case Some(i) => col(s"_ins_c$i").cast(f.dataType).as(f.name)
          case None => pad(src, f, defaults.get(lc(f.name)), "INSERT")
        }
      }: _*)
    }

  /** `INSERT INTO t BY NAME SELECT …` resolution: the query's columns map
    * to SAME-NAMED table columns (any order), each cast to the declared
    * type; unknown source columns refuse loudly; omitted table columns
    * pad DEFAULT/NULL with the column-list contract. */
  def byName(src: DataFrame, schema: StructType,
      defaults: Map[String, String] = Map.empty): DataFrame = {
    def lc(s: String) = s.toLowerCase(java.util.Locale.ROOT)
    val srcNames = src.columns.map(lc)
    require(srcNames.distinct.length == srcNames.length,
      s"INSERT BY NAME: the query repeats column(s) " +
        srcNames.diff(srcNames.distinct).distinct.mkString(", "))
    val tableCols = schema.fields.map(f => lc(f.name)).toSet
    val unknown = src.columns.filterNot(c => tableCols(lc(c)))
    require(unknown.isEmpty, s"INSERT BY NAME: the query names unknown " +
      s"column(s): ${unknown.mkString(", ")}")
    val srcPos = srcNames.zipWithIndex.toMap
    val tmp = src.toDF(src.columns.indices.map(i => s"_ins_c$i"): _*)
    tmp.select(schema.fields.toSeq.map { f =>
      srcPos.get(lc(f.name)) match {
        case Some(i) => col(s"_ins_c$i").cast(f.dataType).as(f.name)
        case None => pad(src, f, defaults.get(lc(f.name)), "INSERT BY NAME")
      }
    }: _*)
  }

  /** The one omitted-column pad: DEFAULT when declared, else typed NULL,
    * refusing loudly on NOT NULL. */
  private def pad(src: DataFrame, f: org.apache.spark.sql.types.StructField,
      defaultSql: Option[String], what: String): org.apache.spark.sql.Column =
    defaultSql match {
      case Some(sql) =>
        graft.sources.FileCow.defaultColumn(src.sparkSession, sql, f).as(f.name)
      case None =>
        require(f.nullable, s"$what omits column ${f.name}, which is " +
          "NOT NULL — nothing to pad with")
        lit(null).cast(f.dataType).as(f.name)
    }

  /** CTAS/bootstrap layout — [[graft.sources.FileCow.rangedByLead]]. */
  def ranged(df: DataFrame, statsCols: Seq[String]): DataFrame =
    FileCow.rangedByLead(df, statsCols)
}

/** Plans the graft DML commands; everything else declined. */
object GraftMergeStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case c: GraftMergeCommand => GraftMergeExec(c) :: Nil
    case c: GraftCtasCommand => GraftCtasExec(c) :: Nil
    case c: GraftCreateTableCommand => GraftCreateTableExec(c) :: Nil
    case c: GraftInsertCommand => GraftInsertExec(c) :: Nil
    case c: GraftDeleteCommand if c.cow => GraftCowExec(c.table, { spark =>
      FileCow.delete(spark, c.root, GraftBridge.column(c.cond.e)); ()
    }) :: Nil
    case c: GraftDeleteCommand => GraftDmlExec(c.table, c.root, { (spark, current) =>
      // a NULL condition must KEEP the row (SQL DELETE matches only TRUE;
      // !NULL is NULL and filter would drop it) — same coalesce as the cow
      // twin's rewriteWhere, so both layouts answer alike
      current.filter(!coalesce(GraftBridge.column(c.cond.e), lit(false)))
    }) :: Nil
    case c: GraftVacuumCommand => GraftVacuumExec(c) :: Nil
    case c: GraftRestoreCommand => GraftCowExec(c.table, { spark =>
      FileCow.restore(spark, c.root, c.toVersion); ()
    }) :: Nil
    case c: GraftConvertCommand => GraftCowExec(c.table, { spark =>
      FileCow.convert(spark, c.root, c.sourceDir, c.statsCols); ()
    }) :: Nil
    case c: GraftBloomIndexCommand => GraftCowExec(c.table, { spark =>
      FileCow.buildBloomIndex(spark, c.root, c.cols)
    }) :: Nil
    case c: GraftCloneCommand => GraftCowExec(c.table, { spark =>
      FileCow.shallowClone(spark, c.srcRoot, c.root, c.versionAsOf); ()
    }) :: Nil
    case c: GraftConstraintCommand => GraftCowExec(c.table, { spark =>
      c.check match {
        case Some(sql) => FileCow.addConstraint(spark, c.root, c.name, sql)
        case None => FileCow.dropConstraint(spark, c.root, c.name)
      }
      ()
    }) :: Nil
    case c: GraftPropsCommand => GraftCowExec(c.table, { spark =>
      if (c.set.nonEmpty) FileCow.setTableProperties(spark, c.root, c.set)
      if (c.unset.nonEmpty) FileCow.unsetTableProperties(spark, c.root, c.unset)
      ()
    }) :: Nil
    case c: GraftRenameColumnCommand => GraftCowExec(c.table, { spark =>
      FileCow.renameColumn(spark, c.root, c.from, c.to); ()
    }) :: Nil
    case c: GraftCopyIntoCommand => GraftCowExec(c.table, { spark =>
      FileCow.copyInto(spark, c.root, c.sourceDir); ()
    }) :: Nil
    case c: GraftOptimizeCommand => GraftCowExec(c.table, { spark =>
      (c.zorder, c.where) match {
        case (Some((a, b)), _) => FileCow.compactZOrder(spark, c.root, c.targetFiles, a, b)
        case (None, Some(w)) =>
          FileCow.compactWhere(spark, c.root, c.targetFiles, GraftBridge.column(w.e))
        case (None, None) => FileCow.compact(spark, c.root, c.targetFiles)
      }
      ()
    }) :: Nil
    case c: GraftAddColumnsCommand => GraftCowExec(c.table, { spark =>
      FileCow.addColumns(spark, c.root, c.fields, c.defaults); ()
    }) :: Nil
    case c: GraftDropColumnsCommand => GraftCowExec(c.table, { spark =>
      FileCow.dropColumns(spark, c.root, c.names); ()
    }) :: Nil
    case c: GraftTruncateCommand if c.cow => GraftCowExec(c.table, { spark =>
      FileCow.delete(spark, c.root, lit(true)); ()
    }) :: Nil
    case c: GraftTruncateCommand => GraftDmlExec(c.table, c.root, { (_, current) =>
      current.limit(0)
    }) :: Nil
    case c: GraftDropTableCommand => GraftCowExec(c.table, { _ =>
      GraftTables.unregister(c.table); ()
    }) :: Nil
    case c: GraftUpdateCommand if c.cow => GraftCowExec(c.table, { spark =>
      FileCow.update(spark, c.root,
        set = c.assignments.map(a => a.column -> GraftBridge.column(a.value)),
        cond = c.cond.map(h => GraftBridge.column(h.e)).getOrElse(lit(true)))
      ()
    }) :: Nil
    case c: GraftUpdateCommand => GraftDmlExec(c.table, c.root, { (spark, current) =>
      val assigned = c.assignments.map(a => a.column.toLowerCase -> a.value).toMap
      val gate = c.cond.map(h => GraftBridge.column(h.e)).getOrElse(lit(true))
      current.select(current.columns.toSeq.map { name =>
        assigned.get(name.toLowerCase) match {
          case Some(v) => when(gate, GraftBridge.column(v)).otherwise(col(name)).as(name)
          case None => col(name)
        }
      }: _*)
    }) :: Nil
    case _ => Nil
  }
}

/** Physical node for FILE-COW DML: [[graft.sources.FileCow]] owns the COW
  * file scoping and the CAS+retry commit; the exec just runs it once. */
case class GraftCowExec(table: String, run: SparkSession => Unit) extends LeafExecNode {
  override def output: Seq[Attribute] = Nil
  private lazy val done: Unit = run(session)
  protected override def doExecute(): RDD[InternalRow] = { done; sparkContext.emptyRDD }
  override def executeCollect(): Array[InternalRow] = { done; Array.empty }
}

/** Shared physical node for snapshot-rewriting DML: reads the current
  * snapshot, applies `rewrite`, publishes the next version. Runs once. */
case class GraftDmlExec(
    table: String,
    root: String,
    rewrite: (SparkSession, org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame)
    extends LeafExecNode {

  override def output: Seq[Attribute] = Nil

  private lazy val done: Unit = {
    require(Versioned.currentVersion(root) > 0,
      s"graft DML on $table: table has no published snapshot")
    val spark = session
    GraftCommit.retrying(root, s"graft DML on $table") { version =>
      rewrite(spark, Versioned.readVersion(spark, root, version))
    }
    ()
  }

  protected override def doExecute(): RDD[InternalRow] = { done; sparkContext.emptyRDD }
  override def executeCollect(): Array[InternalRow] = { done; Array.empty }
}

/** The optimistic-concurrency commit loop shared by every snapshot-writing
  * command: read the current version, derive the next snapshot FROM THAT
  * VERSION, CAS-publish; on [[graft.sources.ConcurrentPublishException]]
  * re-derive against the winner's version and retry (bounded — livelock
  * means something is systematically wrong, fail loudly). Correct because
  * each DML's `derive` is a pure function of the base snapshot: re-running
  * it on the newer base applies both writers' intents exactly once. */
object GraftCommit {
  private val MaxAttempts = 8

  def retrying(root: String, what: String)(
      derive: Long => org.apache.spark.sql.DataFrame): Long = {
    var attempt = 0
    while (true) {
      val version = Versioned.currentVersion(root)
      try {
        return Versioned.publishIf(derive(version), root, version)
      } catch {
        case e: graft.sources.ConcurrentPublishException =>
          attempt += 1
          if (attempt >= MaxAttempts)
            throw new IllegalStateException(
              s"$what: lost the commit race $MaxAttempts times — giving up", e)
      }
    }
    -1L // unreachable
  }

  /** Is this failure the CONCURRENT-SCHEMA-CHANGE contract firing? A
    * statement raced by another writer's rename/drop fails LOUDLY by
    * design (the Delta ConcurrentTransaction analog) — the client's move
    * is to re-derive against the new schema and retry, which
    * [[retryingSchema]] packages. Classified by TYPE
    * ([[graft.sources.GraftConcurrentSchemaChange]], causes walked) —
    * every drift/rename guard throws it — with ONE message-shape
    * fallback: the ANALYZER's unresolved-column error, which a racing
    * drop surfaces when the statement's column references resolve, and
    * which we cannot type (ADVICE r12: matching broad shapes like
    * "drifted" burned a 12-attempt budget of whole Spark jobs on plain
    * user typos and misclassified unrelated errors). */
  def isSchemaRace(t: Throwable): Boolean = {
    def chain(x: Throwable): Seq[Throwable] =
      if (x == null) Nil else x +: chain(x.getCause)
    chain(t).exists {
      case _: graft.sources.GraftConcurrentSchemaChange => true
      case x => Option(x.getMessage).exists(_.contains("UNRESOLVED_COLUMN"))
    }
  }

  /** Run `body` (a whole statement DERIVATION + commit — it must re-read
    * the live schema each attempt, e.g. re-resolve column names before
    * building its source frame) until it lands or fails for a reason that
    * is NOT a concurrent schema change. The budget is generous by design:
    * under CAS contention one merge attempt can span seconds, so several
    * renames can land across its retries — a real client re-derives until
    * the schema holds still. Anything else propagates untouched. This is
    * the helper every multi-writer deployment re-invents (usually wrong —
    * catching too much and retrying non-races); the cross-process race
    * harness ([[graft.tools.StressMultiWriter]]) drives this exact code. */
  def retryingSchema[T](what: String, maxAttempts: Int = 12)(body: => T): T = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case e: Exception if attempt < maxAttempts && isSchemaRace(e) =>
          attempt += 1
      }
    }
    sys.error(s"$what: unreachable")
  }
}

/** Materializes a CTAS as version 1. Runs once per command instance. */
case class GraftCtasExec(cmd: GraftCtasCommand) extends LeafExecNode {
  override def output: Seq[Attribute] = Nil

  private lazy val done: Unit = {
    val spark = session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val exists =
      if (cmd.cow) FileCow.currentVersion(cmd.root) > 0L
      else Versioned.currentVersion(cmd.root) > 0L
    if (cmd.ifNotExists && exists) () // IF NOT EXISTS: silently keep the table
    else {
    val df = GraftBridge.ofRows(spark, cmd.query)
    if (cmd.cow && cmd.orReplace && exists) {
      // OR REPLACE on an existing cow table: one replace commit — history
      // and time travel survive (Delta's CREATE OR REPLACE contract),
      // unlike DROP + CREATE which would orphan the version chain
      val schema = FileCow.schemaOf(cmd.root, FileCow.currentVersion(cmd.root))
      require(df.schema.map(f => (f.name, f.dataType)) ==
          schema.map(f => (f.name, f.dataType)),
        s"graft CREATE OR REPLACE ${cmd.table}: new schema " +
          s"${df.schema.simpleString} must match ${schema.simpleString} " +
          "(schema change goes through ALTER TABLE)")
      FileCow.overwrite(spark, cmd.root, df)
      ()
    } else if (cmd.cow) {
      val stats = GraftWriteSupport.statsEligible(df.schema)
      require(stats.nonEmpty, s"graft CREATE TABLE ${cmd.table}: no column is " +
        "stats-eligible (atomic orderable) — a cow table needs at least one " +
        "for file pruning")
      FileCow.create(spark, cmd.root, GraftWriteSupport.ranged(df, stats),
        statsCols = stats)
    } else if (cmd.orReplace && exists) {
      Versioned.publish(df, cmd.root)
    } else {
      require(Versioned.currentVersion(cmd.root) == 0L,
        s"graft CREATE TABLE ${cmd.table}: table already exists (v" +
          s"${Versioned.currentVersion(cmd.root)}) — INSERT or MERGE into it")
      Versioned.publish(df, cmd.root)
    }
    }
    // statement-claimed name (USING graft CTAS): commit the binding only
    // after the create succeeded — same contract as the declared-schema exec
    if (cmd.autoRegister) {
      if (cmd.cow) GraftTables.registerCow(cmd.table, cmd.root)
      else GraftTables.register(cmd.table, cmd.root)
    }
    ()
  }

  protected override def doExecute(): RDD[InternalRow] = { done; sparkContext.emptyRDD }
  override def executeCollect(): Array[InternalRow] = { done; Array.empty }
}

/** Runs the declared-schema empty create once. */
case class GraftCreateTableExec(cmd: GraftCreateTableCommand) extends LeafExecNode {
  override def output: Seq[Attribute] = Nil

  private lazy val done: Unit = {
    val spark = session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val exists =
      if (cmd.cow) FileCow.currentVersion(cmd.root) > 0L
      else Versioned.currentVersion(cmd.root) > 0L
    if (cmd.ifNotExists && exists) () // IF NOT EXISTS: silently keep the table
    else if (exists && cmd.autoRegister) {
      // a statement-claimed name over a root that ALREADY holds a table is
      // the external-table re-attach (Delta's CREATE … USING delta
      // LOCATION over existing data; also what replaying an exported SHOW
      // CREATE after DROP TABLE means): adopt the data, but only when the
      // declared schema matches the live one — silently re-binding a
      // different shape would corrupt every later positional INSERT
      val live =
        if (cmd.cow) FileCow.schemaOf(cmd.root, FileCow.currentVersion(cmd.root))
        else Versioned.read(spark, cmd.root).schema
      def key(s: StructType, withNull: Boolean) = s.fields.toSeq.map(f =>
        (f.name.toLowerCase(java.util.Locale.ROOT), f.dataType,
          if (withNull) f.nullable else true))
      // snapshot layouts read back through parquet (nullability is not a
      // kept contract there — declared NOT NULL is refused at create)
      require(key(live, cmd.cow) == key(cmd.declaredSchema, cmd.cow),
        s"graft CREATE TABLE ${cmd.table}: the LOCATION already holds a " +
          s"table with schema ${live.simpleString}, which does not match " +
          s"the declared ${cmd.declaredSchema.simpleString} — declare the " +
          "matching schema to adopt it, or point LOCATION elsewhere")
    }
    else {
      require(!exists, s"graft CREATE TABLE ${cmd.table}: table already " +
        "exists — INSERT or MERGE into it, or CREATE OR REPLACE … AS to " +
        "replace its contents")
      if (cmd.cow) {
        val stats =
          if (cmd.statsCols.nonEmpty) cmd.statsCols
          else GraftWriteSupport.statsEligible(cmd.declaredSchema)
        require(stats.nonEmpty, s"graft CREATE TABLE ${cmd.table}: no column " +
          "is stats-eligible (atomic orderable) — a cow table needs at least " +
          "one for file pruning; declare one with STATS (col, …)")
        require(stats.forall(cmd.declaredSchema.fieldNames.contains),
          s"graft CREATE TABLE ${cmd.table}: STATS columns " +
            s"${stats.filterNot(cmd.declaredSchema.fieldNames.contains).mkString(",")} " +
            "are not in the declared schema")
        // an explicitly declared prune column must also be a type the
        // manifest can min/max — catching it here beats a mid-create
        // aggregate error
        val eligible = GraftWriteSupport.statsEligible(cmd.declaredSchema).toSet
        require(stats.forall(eligible.contains),
          s"graft CREATE TABLE ${cmd.table}: STATS columns " +
            s"${stats.filterNot(eligible.contains).mkString(",")} are not " +
            "stats-eligible (atomic orderable types only)")
        try {
          FileCow.createEmpty(spark, cmd.root, cmd.declaredSchema, stats,
            props = cmd.props)
          ()
        } catch {
          // IF NOT EXISTS must be idempotent ACROSS drivers too: two
          // concurrent bootstraps both pass the exists check and the
          // loser either loses the CAS (ConcurrentPublishException) or —
          // when the winner fully lands first — trips create's own
          // already-exists require. Either way the contract is "silently
          // keep the table", decided by whether a table NOW exists, not
          // by which window the race resolved in.
          case e @ (_: graft.sources.ConcurrentPublishException |
                    _: IllegalArgumentException)
              if cmd.ifNotExists && FileCow.currentVersion(cmd.root) > 0L => ()
        }
      } else {
        require(cmd.props.isEmpty, s"graft CREATE TABLE ${cmd.table}: " +
          "TBLPROPERTIES is a cow-table surface (snapshot-level tables " +
          "carry no property map)")
        // declared contracts the snapshot layout cannot keep must refuse,
        // not silently drop: there is no stats manifest to prune on and no
        // constraint seam to enforce NOT NULL with
        require(cmd.statsCols.isEmpty, s"graft CREATE TABLE ${cmd.table}: " +
          "STATS is a cow-table surface (snapshot-level tables have no " +
          "per-file stats manifest)")
        require(cmd.declaredSchema.fields.forall(_.nullable),
          s"graft CREATE TABLE ${cmd.table}: NOT NULL is enforced through " +
            "the cow-table constraint seam; the snapshot layout cannot " +
            "keep that contract — register the table as cow, or drop the " +
            "NOT NULL")
        val empty = spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], cmd.declaredSchema)
        try { Versioned.publish(empty, cmd.root); () }
        catch {
          // same cross-driver IF NOT EXISTS contract as the cow branch
          // (plain publish is last-wins, but a racing loser can still trip
          // on the other's staging/move window)
          case _: Exception if cmd.ifNotExists
              && Versioned.currentVersion(cmd.root) > 0L => ()
        }
      }
    }
    // statement-claimed name: commit the binding only now, after every
    // path above succeeded (incl. the IF-NOT-EXISTS keep — re-running an
    // exported CREATE after a registry wipe re-attaches the binding)
    if (cmd.autoRegister) {
      if (cmd.cow) GraftTables.registerCow(cmd.table, cmd.root)
      else GraftTables.register(cmd.table, cmd.root)
    }
    ()
  }

  protected override def doExecute(): RDD[InternalRow] = { done; sparkContext.emptyRDD }
  override def executeCollect(): Array[InternalRow] = { done; Array.empty }
}

/** Runs the INSERT append/overwrite commit. Runs once per command instance. */
case class GraftInsertExec(cmd: GraftInsertCommand) extends LeafExecNode {
  override def output: Seq[Attribute] = Nil

  private lazy val done: Unit = {
    val spark = session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val src = GraftBridge.ofRows(spark, cmd.query)
    def requireNoColsOnBootstrap(): Unit = {
      require(cmd.userCols.isEmpty, s"graft INSERT INTO ${cmd.table}: an " +
        "explicit column list needs a declared table schema to resolve " +
        "against — CREATE the table first (this INSERT would bootstrap it)")
      require(!cmd.byName, s"graft INSERT INTO ${cmd.table}: BY NAME needs " +
        "a declared table schema to resolve against — CREATE the table " +
        "first (this INSERT would bootstrap it)")
    }
    def align(schema: StructType, defaults: Map[String, String]) =
      if (cmd.byName) GraftWriteSupport.byName(src, schema, defaults)
      else GraftWriteSupport.positional(src, schema, cmd.userCols, defaults)
    if (cmd.cow) {
      if (FileCow.currentVersion(cmd.root) == 0L) {
        // first INSERT into a never-created table bootstraps it (the same
        // courtesy the first MERGE extends)
        requireNoColsOnBootstrap()
        val stats = GraftWriteSupport.statsEligible(src.schema)
        require(stats.nonEmpty, s"graft INSERT INTO ${cmd.table}: no " +
          "stats-eligible column to bootstrap the cow table with")
        FileCow.create(spark, cmd.root, GraftWriteSupport.ranged(src, stats),
          statsCols = stats)
      } else {
        val v = FileCow.currentVersion(cmd.root)
        val aligned = align(FileCow.schemaOf(cmd.root, v),
          FileCow.defaultSqlOf(cmd.root, v))
        if (cmd.overwrite) FileCow.overwrite(spark, cmd.root, aligned)
        else FileCow.append(spark, cmd.root, aligned)
      }
    } else {
      if (Versioned.currentVersion(cmd.root) == 0L) {
        requireNoColsOnBootstrap()
        Versioned.publish(src, cmd.root)
      }
      else GraftCommit.retrying(cmd.root, s"graft INSERT INTO ${cmd.table}") { version =>
        val current = Versioned.readVersion(spark, cmd.root, version)
        val aligned = align(current.schema, Map.empty)
        if (cmd.overwrite) aligned else current.unionByName(aligned)
      }
    }
    ()
  }

  protected override def doExecute(): RDD[InternalRow] = { done; sparkContext.emptyRDD }
  override def executeCollect(): Array[InternalRow] = { done; Array.empty }
}

/** Runs the upsert and publishes the next snapshot. Runs ONCE per command
  * instance (commands are eagerly executed by the session; a re-collect of
  * the returned frame must not publish twice). */
/** Row-level evaluator for the general MERGE clause surface. One joined
  * pass: target rows LEFT-join the source on the merge keys with source
  * columns carried under a `__s_` prefix (so same-named columns never
  * collide); each matched clause condition is rewritten against that
  * frame (t-alias → bare column, s-alias → prefixed) and folded into a
  * FIRST-MATCH-WINS clause index; per table column, the applicable
  * clause's value or the unchanged column. Inserts evaluate on the
  * anti-joined source alone (SQL scoping: INSERT values may reference
  * only the source). Everything stays one declarative plan — Catalyst
  * sees a join + projections, so pushdown/broadcast/AQE all apply. */
private[plans] object GraftMergeClauses {

  private def lc(s: String) = s.toLowerCase(java.util.Locale.ROOT)

  private def fail(msg: String): Nothing = sys.error(msg)

  private def rewrite(table: String, e: Expression, tSet: Set[String],
      sSet: Set[String], tCols: Set[String], sCols: Set[String],
      insertContext: Boolean): org.apache.spark.sql.Column =
    GraftBridge.column(e.transform {
      case a: UnresolvedAttribute => a.nameParts match {
        case Seq(q, c) if sSet(lc(q)) && sCols(lc(c)) =>
          UnresolvedAttribute(Seq(if (insertContext) c else "__s_" + c))
        case Seq(q, c) if tSet(lc(q)) && !insertContext && tCols(lc(c)) =>
          UnresolvedAttribute(Seq(c))
        case Seq(q, c) if tSet(lc(q)) && insertContext =>
          fail(s"graft MERGE INTO $table: INSERT values may reference only " +
            s"the source, got $q.$c")
        case Seq(c) if !insertContext && tCols(lc(c)) && sCols(lc(c)) =>
          fail(s"graft MERGE INTO $table: ambiguous column $c in a MERGE " +
            "clause — qualify it with the target or source alias")
        case Seq(c) if sCols(lc(c)) =>
          UnresolvedAttribute(Seq(if (insertContext) c else "__s_" + c))
        case Seq(c) if !insertContext && tCols(lc(c)) => a
        case parts =>
          fail(s"graft MERGE INTO $table: unknown column ${parts.mkString(".")} " +
            "in a MERGE clause")
      }
    })

  def combine(table: String, schema: org.apache.spark.sql.types.StructType,
      keys: Seq[String], matched: Seq[MergeMatched],
      notMatched: Seq[MergeNotMatched], bySource: Seq[MergeMatched],
      tQuals: Seq[String], sQuals: Seq[String], evolution: Boolean = false,
      defaults: Map[String, String] = Map.empty)(
      base: org.apache.spark.sql.DataFrame,
      source: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.coalesce
    val tCols = schema.fieldNames.map(lc).toSet
    val sCols = source.columns.map(lc).toSet
    val tSet = tQuals.map(lc).toSet
    val sSet = sQuals.map(lc).toSet
    def m(e: Expression) = rewrite(table, e, tSet, sSet, tCols, sCols, insertContext = false)
    def ins(e: Expression) = rewrite(table, e, tSet, sSet, tCols, sCols, insertContext = true)
    // NOT MATCHED BY SOURCE scope: the source does not exist for the row,
    // so its columns are simply unknown here (loud unknown-column error)
    def tOnly(e: Expression) =
      rewrite(table, e, tSet, Set.empty, tCols, Set.empty, insertContext = false)
    keys.foreach(k => require(sCols(lc(k)),
      s"graft MERGE INTO $table: source lacks merge key $k"))

    val sPref = source.select(source.columns.map(c => col(c).as("__s_" + c)): _*)
    val joined = base.join(sPref,
      keys.map(k => col(k) === col("__s_" + k)).reduce(_ && _), "left_outer")
    val hasMatch = col("__s_" + keys.head).isNotNull
    // first-match-wins clause indexes; -1 = no clause claims the row.
    // matched clauses see the joined row; by-source clauses the target only
    def idx(clauses: Seq[MergeMatched], rw: Expression => org.apache.spark.sql.Column) =
      clauses.zipWithIndex.foldRight(lit(-1)) { case ((cl, i), acc) =>
        when(cl.cond.map(h => coalesce(rw(h.e), lit(false))).getOrElse(lit(true)),
          lit(i)).otherwise(acc)
      }
    val appliedM = when(hasMatch, idx(matched, m)).otherwise(lit(-1))
    val appliedB = when(!hasMatch, idx(bySource, tOnly)).otherwise(lit(-1))
    def isDelete(clauses: Seq[MergeMatched], applied: org.apache.spark.sql.Column) =
      clauses.zipWithIndex.collect { case (MDelete(_), i) => lit(i) }
        .foldLeft(lit(false))((acc, i) => acc || applied === i)
    val keep = when(hasMatch, !isDelete(matched, appliedM))
      .otherwise(!isDelete(bySource, appliedB))

    val outCols = schema.fields.toSeq.map { f =>
      def branches(clauses: Seq[MergeMatched],
          applied: org.apache.spark.sql.Column,
          rw: Expression => org.apache.spark.sql.Column,
          star: Boolean) = clauses.zipWithIndex.flatMap {
        case (MUpdateStar(_), i) if star =>
          // under schema evolution, UPDATE SET * sets only the columns the
          // source HAS; a source-missing column keeps the target's value
          if (sCols(lc(f.name))) Seq((applied === lit(i)) -> col("__s_" + f.name))
          else if (evolution) Nil
          else fail(s"graft MERGE INTO $table: UPDATE SET * " +
            s"needs source column ${f.name}")
        case (MUpdateStar(_), _) =>
          fail(s"graft MERGE INTO $table: UPDATE SET * is meaningless " +
            "in NOT MATCHED BY SOURCE (there is no source row)")
        case (MUpdate(_, assigns), i) =>
          assigns.filter(a => lc(a.column) == lc(f.name))
            .map(a => (applied === lit(i)) -> rw(a.value))
        case (MDelete(_), _) => Nil
      }
      val perClause = branches(matched, appliedM, m, star = true) ++
        branches(bySource, appliedB, tOnly, star = false)
      perClause.foldRight(col(f.name)) { case ((hit, v), acc) =>
        when(hit, v).otherwise(acc)
      }.cast(f.dataType).as(f.name)
    }
    val kept = joined.filter(keep).select(outCols: _*)

    val inserts = if (notMatched.isEmpty) kept.limit(0) else {
      val unmatchedSrc = source.join(base.select(keys.map(col): _*), keys, "left_anti")
      val iIdx = notMatched.zipWithIndex.foldRight(lit(-1)) { case ((cl, i), acc) =>
        when(cl.cond.map(h => coalesce(ins(h.e), lit(false))).getOrElse(lit(true)),
          lit(i)).otherwise(acc)
      }
      // an omitted column pads its DEFAULT when one is declared
      // (CowDefaults — same contract as the INSERT column-list pad),
      // else typed NULL, refusing loudly on NOT NULL
      def mergePad(f: org.apache.spark.sql.types.StructField,
          what: String): org.apache.spark.sql.Column =
        defaults.get(lc(f.name)) match {
          case Some(sql) =>
            graft.sources.FileCow.defaultColumn(source.sparkSession, sql, f)
          case None =>
            require(f.nullable, s"graft MERGE INTO $table: $what omits " +
              s"column ${f.name}, which is NOT NULL — nothing to pad with")
            lit(null)
        }
      val insCols = schema.fields.toSeq.map { f =>
        val perClause = notMatched.zipWithIndex.map {
          case (MInsertStar(_), i) if !sCols(lc(f.name)) && evolution =>
            // evolution: INSERT * pads the source-missing column
            i -> mergePad(f, "INSERT *")
          case (MInsertStar(_), i) =>
            require(sCols(lc(f.name)), s"graft MERGE INTO $table: INSERT * " +
              s"needs source column ${f.name}")
            i -> col(f.name)
          case (MInsert(_, assigns), i) =>
            i -> assigns.filter(a => lc(a.column) == lc(f.name))
              .map(a => ins(a.value))
              .headOption.getOrElse(mergePad(f, "INSERT"))
        }
        perClause.foldRight(lit(null).cast(f.dataType): org.apache.spark.sql.Column) {
          case ((i, v), acc) => when(col("__graft_ins") === lit(i), v).otherwise(acc)
        }.cast(f.dataType).as(f.name)
      }
      unmatchedSrc.withColumn("__graft_ins", iIdx)
        .filter(col("__graft_ins") >= 0).select(insCols: _*)
    }
    kept.unionByName(inserts)
  }
}

case class GraftMergeExec(cmd: GraftMergeCommand) extends LeafExecNode {

  override def output: Seq[Attribute] = Nil

  private lazy val done: Unit = run()

  private def run(): Unit = {
    val spark = session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val src = GraftBridge.ofRows(spark, cmd.source)

    val dups = src.groupBy(cmd.keys.map(col): _*)
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).limit(1).count()
    require(dups == 0,
      s"graft MERGE INTO ${cmd.table}: duplicate source rows on key (${cmd.keys.mkString(", ")}) — " +
        "a multi-match merge is nondeterministic (same contract as Delta's multiple-matches error)")

    def combine(schema: org.apache.spark.sql.types.StructType) = {
      // cow tables pad omitted INSERT columns with their declared DEFAULT
      // (snapshot layouts carry no property map, hence no defaults)
      val defaults =
        if (cmd.cow) FileCow.defaultSqlOf(cmd.root, FileCow.currentVersion(cmd.root))
        else Map.empty[String, String]
      GraftMergeClauses.combine(cmd.table, schema, cmd.keys, cmd.matched,
        cmd.notMatched, cmd.bySource, cmd.tQuals, cmd.sQuals,
        evolution = cmd.schemaEvolution, defaults = defaults) _
    }

    def freshCols(tableCols: Seq[String]): Seq[org.apache.spark.sql.types.StructField] = {
      val tLower = tableCols.map(_.toLowerCase).toSet
      src.schema.fields.toSeq.filterNot(f => tLower(f.name.toLowerCase))
        .map(_.copy(nullable = true))
    }

    if (cmd.cow) {
      // FILE-COW path: FileCow owns the touched-file scoping and the
      // CAS+retry commit — O(touched files), not O(table).
      if (FileCow.currentVersion(cmd.root) == 0L) {
        // first merge into an empty table: becomes CREATE, stats on the keys
        require(cmd.starShape, s"graft MERGE INTO ${cmd.table}: a merge that " +
          "bootstraps a non-existent table must be UPDATE SET * / INSERT * " +
          "(there is no table schema for clause expressions to resolve against)")
        FileCow.create(spark, cmd.root, src, statsCols = cmd.keys)
        return
      }
      // WITH SCHEMA EVOLUTION: source-only columns widen the table schema
      // INSIDE the merge commit itself (FileCow's evolveTo — one atomic
      // transaction, so a merge that fails its NULL-key/constraint checks
      // cannot leave the schema evolved behind a failed statement, matching
      // Delta and the snapshot-layout branch below). The general combinator
      // pads and projects — UPDATE SET * touches only columns the source
      // has, INSERT * pads the rest NULL (Delta's evolution semantics).
      val current = graft.sources.FileCow.schemaOf(cmd.root,
        graft.sources.FileCow.currentVersion(cmd.root))
      val evolveTo =
        if (!cmd.schemaEvolution) None
        else {
          val fresh = freshCols(current.fieldNames.toSeq)
          if (fresh.isEmpty) None
          else Some(org.apache.spark.sql.types.StructType(current.fields ++ fresh))
        }
      val schema = evolveTo.getOrElse(current)
      if (cmd.starShape && !cmd.schemaEvolution &&
          (cmd.bySource.isEmpty || cmd.deleteUnmatched)) {
        require(src.columns.sorted.sameElements(schema.map(_.name).sorted),
          s"graft MERGE INTO ${cmd.table}: source columns ${src.columns.mkString(",")} " +
            s"must match table columns ${schema.map(_.name).mkString(",")} (UPDATE/INSERT *)")
        val aligned = src.select(schema.map(f => col(f.name)): _*)
        if (cmd.deleteUnmatched) graft.sources.FileCow.overwrite(spark, cmd.root, aligned)
        else graft.sources.FileCow.merge(spark, cmd.root, aligned, cmd.keys)
      } else if (cmd.bySource.nonEmpty) {
        // NOT MATCHED BY SOURCE clauses touch every file by definition —
        // an honest full rewrite through the clause combinator. The base
        // read happens INSIDE the overwrite's retry body at the attempt's
        // version: a commit landing between a pre-loop base read and the
        // CAS would otherwise be silently discarded (lost update) — the
        // retry must recompute from the winner's rows, like the star path.
        graft.sources.FileCow.overwriteWith(spark, cmd.root,
            evolveTo = evolveTo) { (s, version) =>
          val base0 = FileCow.readVersion(s, cmd.root, version)
          val base = evolveTo.fold(base0) { _ =>
            freshCols(current.fieldNames.toSeq).foldLeft(base0)((df, f) =>
              df.withColumn(f.name, lit(null).cast(f.dataType)))
          }
          combine(schema)(base, src)
        }
      } else {
        // general clauses, touched-file scoped: FileCow prunes files by the
        // source keys and hands (affected base, source) to the combinator
        graft.sources.FileCow.merge(spark, cmd.root, src, cmd.keys,
          combine = combine(schema), evolveTo = evolveTo)
      }
      return
    }

    // Conflict-retry commit (the Delta/Iceberg loop): compute the merge
    // against the CURRENT version, CAS-publish; a concurrent winner means
    // recompute against its result and try again — an upsert re-derived
    // from the newer base applies both writers' rows exactly once.
    GraftCommit.retrying(cmd.root, s"graft MERGE INTO ${cmd.table}") { version =>
      if (version == 0) {
        require(cmd.starShape, s"graft MERGE INTO ${cmd.table}: a merge that " +
          "bootstraps a non-existent table must be UPDATE SET * / INSERT *")
        src
      } else {
        val current0 = Versioned.readVersion(spark, cmd.root, version)
        // snapshot-layout evolution: pad the current frame with the
        // source-only columns (NULL) — the publish carries the wider schema
        val current =
          if (!cmd.schemaEvolution) current0
          else freshCols(current0.columns.toSeq).foldLeft(current0)((df, f) =>
            df.withColumn(f.name, lit(null).cast(f.dataType)))
        if (cmd.starShape && !cmd.schemaEvolution &&
            (cmd.bySource.isEmpty || cmd.deleteUnmatched)) {
          require(current.columns.sorted.sameElements(src.columns.sorted),
            s"graft MERGE INTO ${cmd.table}: source columns ${src.columns.mkString(",")} " +
              s"must match table columns ${current.columns.mkString(",")} (UPDATE/INSERT *)")
          if (cmd.deleteUnmatched) src
          else src.unionByName(current.join(src.select(cmd.keys.map(col): _*), cmd.keys, "left_anti"))
        } else combine(current.schema)(current, src)
      }
    }
  }

  protected override def doExecute(): RDD[InternalRow] = {
    done
    sparkContext.emptyRDD
  }

  override def executeCollect(): Array[InternalRow] = {
    done
    Array.empty
  }
}
