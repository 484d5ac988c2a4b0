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

/** The EXECUTION half of the graft SQL engine: shared write-path lowering
  * helpers, the planner strategy, the physical command execs, the general
  * MERGE clause evaluator, and the optimistic-concurrency commit loop.
  * (Split out of GraftMerge.scala in round 13 purely along the
  * logical/physical seam; the behavior and the private surface are
  * unchanged — [[GraftMerge]] keeps the resolution rule and the logical
  * commands it lowers to.)
  */
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
    case c: GraftTxnCommand => GraftTxnExec(c) :: Nil
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
    case c: GraftOptimizeAutoCommand => GraftCowExec(c.table, { spark =>
      val props = FileCow.tableProps(c.root, FileCow.visibleVersion(c.root))
      graft.sources.CowAutoMaintenance.compactSmall(spark, c.root,
        smallBytes = props.get(graft.sources.CowAutoMaintenance.SmallBytesProp)
          .map(_.toLong).getOrElse(32L * 1024 * 1024),
        minFiles = props.get(graft.sources.CowAutoMaintenance.MinFilesProp)
          .map(_.toInt).getOrElse(2),
        maxPerTrigger = props.get(graft.sources.CowAutoMaintenance.MaxPerTriggerProp)
          .map(_.toInt).getOrElse(32))
      ()
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

  /** Cross-table transaction (VERDICT r14 #3) — the discoverable alias
    * onto [[graft.sources.GraftTransactions.run]]: every graft commit
    * the body issues on this thread lands gated behind ONE
    * conditional-put marker decision, visible all together or (on
    * exception) not at all. SQL spellings: `BEGIN/COMMIT/ROLLBACK GRAFT
    * TRANSACTION`, `SHOW GRAFT TRANSACTIONS`. */
  def multiTable[T](spark: SparkSession, markerDir: String)(body: => T): T =
    graft.sources.GraftTransactions.run(spark, markerDir)(body)

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
      val schema = FileCow.schemaOf(cmd.root, FileCow.visibleVersion(cmd.root))
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
      // inside a cross-table txn the NAME carries the atomicity (G41):
      // v1 lands clean, the binding below is marker-stamped
      graft.sources.GraftTransactions.withoutTxn {
        FileCow.create(spark, cmd.root, GraftWriteSupport.ranged(df, stats),
          statsCols = stats)
      }
    } else if (cmd.orReplace && exists) {
      Versioned.publish(df, cmd.root)
    } else {
      require(Versioned.currentVersion(cmd.root) == 0L,
        s"graft CREATE TABLE ${cmd.table}: table already exists (v" +
          s"${Versioned.currentVersion(cmd.root)}) — INSERT or MERGE into it")
      graft.sources.GraftTransactions.withoutTxn {
        Versioned.publish(df, cmd.root)
      }
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
        if (cmd.cow) FileCow.schemaOf(cmd.root, FileCow.visibleVersion(cmd.root))
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
          // G41: the binding below carries the txn gate; v1 lands clean
          graft.sources.GraftTransactions.withoutTxn {
            FileCow.createEmpty(spark, cmd.root, cmd.declaredSchema, stats,
              props = cmd.props)
          }
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
        try {
          graft.sources.GraftTransactions.withoutTxn {
            Versioned.publish(empty, cmd.root)
          }
          ()
        }
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
        val v = FileCow.visibleVersion(cmd.root)
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
        if (cmd.cow) FileCow.defaultSqlOf(cmd.root, FileCow.visibleVersion(cmd.root))
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
        graft.sources.FileCow.visibleVersion(cmd.root))
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

