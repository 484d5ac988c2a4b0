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
          if (entry.cow) {
            // a version gated by an open/aborted cross-table txn was
            // never visible — refuse instead of serving phantom state
            graft.sources.GraftTransactions.requireReadable(entry.root, v)
            snapshotPlan(FileCow.readVersion(spark, entry.root, v))
          } else snapshotPlan(Versioned.readVersion(spark, entry.root, v))
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
        case Some((name, entry)) if entry.cow && FileCow.currentVersion(entry.root) > 0 =>
          stampCatalogMeta(snapshotPlan(FileCow.read(spark, entry.root)), name, entry)
        case Some((name, entry)) if !entry.cow && Versioned.currentVersion(entry.root) > 0 =>
          stampCatalogMeta(snapshotPlan(Versioned.read(spark, entry.root)), name, entry)
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
      case (true, Some(v)) =>
        graft.sources.GraftTransactions.requireReadable(g.entry.root, v)
        FileCow.readVersion(spark, g.entry.root, v)
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
    // carry the table's catalog metadata onto the v1 relations: Spark's
    // Catalog.refreshTable (run by the streaming engine after every
    // toTable batch) walks the analyzed plan and reads
    // LogicalRelation.catalogTable.get — a bare swap would None.get there
    stampMeta(Project(cols, fresh), g.catalogTableMeta)
  }

  /** Attach v1 catalog metadata to every bare [[LogicalRelation]] in a
    * resolved table scan (see [[swapV2Scan]]'s refreshTable note — the
    * registry-name intercept needs the same stamp, since refreshTable
    * re-resolves through it). */
  private def stampMeta(plan: LogicalPlan,
      meta: org.apache.spark.sql.catalyst.catalog.CatalogTable): LogicalPlan =
    plan.transform {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
          if lr.catalogTable.isEmpty =>
        lr.copy(catalogTable = Some(meta))
    }

  private def stampCatalogMeta(plan: LogicalPlan, name: String,
      entry: GraftTables.Entry): LogicalPlan =
    stampMeta(plan, org.apache.spark.sql.catalyst.catalog.CatalogTable(
      // display-only identifier (the name may be a dotted registry key)
      identifier = org.apache.spark.sql.catalyst.TableIdentifier(name),
      tableType = org.apache.spark.sql.catalyst.catalog.CatalogTableType.EXTERNAL,
      storage = org.apache.spark.sql.catalyst.catalog.CatalogStorageFormat.empty
        .copy(locationUri = Some(java.nio.file.Paths.get(entry.root).toUri)),
      schema = org.apache.spark.sql.types.StructType(
        plan.output.map(a => org.apache.spark.sql.types.StructField(
          a.name, a.dataType, a.nullable))),
      provider = Some(if (entry.cow) "graft-cow" else "graft")))

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

