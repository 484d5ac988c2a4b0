package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{Command, LeafNode, LogicalPlan}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan}
import org.apache.spark.sql.types.{DataType, StructType}

import graft.sources.Versioned

/** Parser extension for the one statement Spark's grammar cannot carry for
  * us: `VACUUM <table> RETAIN <n> VERSIONS [OLDER THAN <h> HOURS]` —
  * snapshot retention on graft tables (the Delta VACUUM / Iceberg
  * expire_snapshots analog; ours
  * retains a snapshot COUNT because Versioned's unit of garbage is the
  * immutable snapshot dir). Registered via
  * `SparkSessionExtensions.injectParser`; every other statement — and
  * every non-plan parse path — delegates verbatim to the session's parser,
  * so the extension is invisible outside its one prefix.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private val Vacuum =
    """(?is)\s*VACUUM\s+([A-Za-z_][A-Za-z0-9_]*(?:\.(?:[A-Za-z_][A-Za-z0-9_]*|`[^`]+`))*)\s+RETAIN\s+(\d+)\s+VERSIONS(?:\s+OLDER\s+THAN\s+(\d+)\s+HOURS)?(\s+DRY\s+RUN)?\s*;?\s*""".r

  private val History =
    """(?is)\s*DESCRIBE\s+HISTORY\s+([A-Za-z_][A-Za-z0-9_]*(?:\.(?:[A-Za-z_][A-Za-z0-9_]*|`[^`]+`))*)\s*;?\s*""".r

  private val Optimize =
    """(?is)\s*OPTIMIZE\s+([A-Za-z_][A-Za-z0-9_]*(?:\.(?:[A-Za-z_][A-Za-z0-9_]*|`[^`]+`))*)\s+INTO\s+(\d+)\s+FILES(?:\s+ZORDER\s+BY\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*,\s*([A-Za-z_][A-Za-z0-9_]*)\s*\))?(?:\s+WHERE\s+(.+?))?\s*;?\s*""".r

  /** `OPTIMIZE t AUTO` — ONE bounded small-file compaction priced by the
    * table's `graft.maintenance.*` properties (the manual trigger of the
    * G36 auto-maintenance step; same planner, same bound, no hook). */
  private val OptimizeAuto =
    """(?is)\s*OPTIMIZE\s+([A-Za-z_][A-Za-z0-9_]*(?:\.(?:[A-Za-z_][A-Za-z0-9_]*|`[^`]+`))*)\s+AUTO\s*;?\s*""".r

  private val Restore =
    """(?is)\s*RESTORE\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*(?:\.(?:[A-Za-z_][A-Za-z0-9_]*|`[^`]+`))*)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""".r
  /** `RESTORE TABLE t TO TIMESTAMP AS OF '<ts>'` — the version live at
    * that instant (same session-timezone resolution as read-side
    * TIMESTAMP AS OF), then the ordinary restore commit. */
  private val RestoreTs =
    """(?is)\s*RESTORE\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*(?:\.(?:[A-Za-z_][A-Za-z0-9_]*|`[^`]+`))*)\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*""".r

  /** `CONVERT TO GRAFT <registered> FROM '<dir>' STATS (c, …)` — adopt an
    * existing plain-parquet directory as the named cow table (the Delta
    * `CONVERT TO DELTA` analog): files are renamed in, one stats scan
    * runs, no byte is rewritten. */
  private val Convert =
    """(?is)\s*CONVERT\s+TO\s+GRAFT\s+([A-Za-z_][A-Za-z0-9_]*(?:\.(?:[A-Za-z_][A-Za-z0-9_]*|`[^`]+`))*)\s+FROM\s+'([^']+)'\s+STATS\s*\(\s*([A-Za-z_][A-Za-z0-9_]*(?:\s*,\s*[A-Za-z_][A-Za-z0-9_]*)*)\s*\)\s*;?\s*""".r

  /** `DESCRIBE DETAIL t` — the cow table's FILE-LEVEL metadata as a
    * relation (Delta `DESCRIBE DETAIL` / Iceberg `.files`): one row per
    * current data file with bytes, rows, and per-stats-column [min, max]
    * — the layout-inspection surface OPTIMIZE/ZORDER decisions read. */
  private val Detail =
    """(?is)\s*DESCRIBE\s+DETAIL\s+([A-Za-z_][A-Za-z0-9_]*(?:\.(?:[A-Za-z_][A-Za-z0-9_]*|`[^`]+`))*)\s*;?\s*""".r

  /** `DESCRIBE STREAMS t` — the registered streaming consumers pinning the
    * cow table's retention (VERDICT r13 #4): delivered version, lag in
    * versions/bytes, liveness, and whether each still floors vacuum under
    * `graft.streams.maxLagVersions`. The ops surface for "who is holding
    * my history". */
  private val Streams =
    """(?is)\s*DESCRIBE\s+STREAMS\s+([A-Za-z_][A-Za-z0-9_]*(?:\.(?:[A-Za-z_][A-Za-z0-9_]*|`[^`]+`))*)\s*;?\s*""".r

  /** `CREATE TABLE <registered> AS <query>` — the migrating user's first
    * statement. The prefix claims ONLY names pre-registered via
    * [[GraftTables]] (the catalog-lite binding of name → root, which is
    * also where the layout kind lives); any other CREATE TABLE — and any
    * column-list/USING/OPTIONS spelling — delegates verbatim, so real
    * catalogs keep owning their tables. */
  private val Ctas =
    """(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)\s+AS\s+(.+?)\s*;?\s*""".r

  /** The CTAS spelling of the SQL front door: `CREATE TABLE t USING
    * graft|graft-cow [LOCATION '…'] AS <query>` on an UNREGISTERED name
    * registers the binding itself (root from LOCATION or the attached
    * warehouse — same contract as the declared-schema form); on a
    * registered name USING/LOCATION validate against the registration.
    * The LOCATION literal's inner pattern is escape-aware (`''`, `\'`,
    * `\\`) and unescapes through the shared lexer. Non-graft USING falls
    * through to Spark untouched. */
  private val CtasUsing =
    ("""(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+(IF\s+NOT\s+EXISTS\s+)?""" +
      """([A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)\s+USING\s+""" +
      """(graft(?:[-_]cow)?)(?![\w\-])\s*(?:LOCATION\s*('(?:[^'\\]|\\.|'')*'))?""" +
      """\s*AS\s+(.+?)\s*;?\s*""").r

  /** `CREATE TABLE <tgt> SHALLOW CLONE <src> [VERSION AS OF n]` — Delta's
    * zero-copy clone on cow tables: one metadata commit naming the
    * source's files; see [[graft.sources.FileCow.shallowClone]]. */
  private val Clone =
    """(?is)\s*CREATE\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)\s+SHALLOW\s+CLONE\s+([A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*""".r

  /** `SHOW GRAFT TABLES` — the catalog-lite listing as a composable
    * relation: (name, root, layout, version). The GRAFT keyword keeps
    * Spark's own SHOW TABLES untouched. */
  private val ShowTables = """(?is)\s*SHOW\s+GRAFT\s+TABLES\s*;?\s*""".r

  /** Cross-table transactions, SQL spelling (VERDICT r14 #3): `BEGIN
    * GRAFT TRANSACTION [AT '<dir>']` binds a txn to the session's
    * driver thread (markers default under the attached warehouse's
    * `_txns/`), every graft DML until the decision lands gated, `COMMIT
    * GRAFT TRANSACTION` is the atomic visibility flip and `ROLLBACK
    * GRAFT TRANSACTION` aborts + heals. `SHOW GRAFT TRANSACTIONS` lists
    * the markers (the handle a survivor aborts a dead coordinator by). */
  private val TxnBegin =
    """(?is)\s*BEGIN\s+GRAFT\s+TRANSACTION(?:\s+AT\s+'([^']+)')?\s*;?\s*""".r
  private val TxnCommit = """(?is)\s*COMMIT\s+GRAFT\s+TRANSACTION\s*;?\s*""".r
  private val TxnRollback = """(?is)\s*ROLLBACK\s+GRAFT\s+TRANSACTION\s*;?\s*""".r
  /** Multi-process participants (round 16): `JOIN GRAFT TRANSACTION
    * '<marker>'` binds this session INTO a foreign coordinator's open
    * txn (its DML gates behind the same marker); `LEAVE GRAFT
    * TRANSACTION` detaches without deciding. */
  private val TxnJoin =
    """(?is)\s*JOIN\s+GRAFT\s+TRANSACTION\s+'([^']+)'\s*;?\s*""".r
  private val TxnLeave = """(?is)\s*LEAVE\s+GRAFT\s+TRANSACTION\s*;?\s*""".r
  private val TxnShow =
    """(?is)\s*SHOW\s+GRAFT\s+TRANSACTIONS(?:\s+IN\s+'([^']+)')?\s*;?\s*""".r
  /** Marker retention (ADVICE r15): consolidate decided markers older
    * than RETAIN into the dir's sealed ledger — outcomes stay readable
    * forever, the per-txn files age out. Default retention 168 h. */
  private val TxnVacuum =
    """(?is)\s*VACUUM\s+GRAFT\s+TRANSACTIONS(?:\s+IN\s+'([^']+)')?(?:\s+RETAIN\s+(\d+)\s+HOURS)?\s*;?\s*""".r

  /** CHECK constraints + table properties (cow tables): the Delta
    * `ADD CONSTRAINT … CHECK` surface. Spark's grammar has no ADD
    * CONSTRAINT, so these are prefix intercepts like VACUUM. */
  private val AddConstraint =
    """(?is)\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*(?:\.(?:[A-Za-z_][A-Za-z0-9_]*|`[^`]+`))*)\s+ADD\s+CONSTRAINT\s+([A-Za-z_][A-Za-z0-9_]*)\s+CHECK\s*\((.+)\)\s*;?\s*""".r
  private val DropConstraint =
    """(?is)\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*(?:\.(?:[A-Za-z_][A-Za-z0-9_]*|`[^`]+`))*)\s+DROP\s+CONSTRAINT\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*""".r
  private val SetProps =
    """(?is)\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*(?:\.(?:[A-Za-z_][A-Za-z0-9_]*|`[^`]+`))*)\s+SET\s+TBLPROPERTIES\s*\(\s*(.+?)\s*\)\s*;?\s*""".r
  private val UnsetProps =
    """(?is)\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*(?:\.(?:[A-Za-z_][A-Za-z0-9_]*|`[^`]+`))*)\s+UNSET\s+TBLPROPERTIES\s*\(\s*(.+?)\s*\)\s*;?\s*""".r
  private val ShowProps =
    """(?is)\s*SHOW\s+TBLPROPERTIES\s+([A-Za-z_][A-Za-z0-9_]*(?:\.(?:[A-Za-z_][A-Za-z0-9_]*|`[^`]+`))*)\s*;?\s*""".r

  /** `SHOW CREATE TABLE t` on a REGISTERED graft name — the migration
    * artifact a user exports: columns + layout + location + properties
    * (CHECK constraints ride them) + the bloom-index statement when one is
    * declared. Spark's own SHOW CREATE TABLE keeps unregistered names. */
  private val ShowCreate =
    """(?is)\s*SHOW\s+CREATE\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)\s*;?\s*""".r

  /** `COPY INTO t FROM '<dir>'` — Delta's idempotent landing-zone loader
    * on cow tables: each run appends only the directory's parquet files
    * not already recorded in a prior copy_into commit. */
  private val CopyInto =
    """(?is)\s*COPY\s+INTO\s+([A-Za-z_][A-Za-z0-9_]*(?:\.(?:[A-Za-z_][A-Za-z0-9_]*|`[^`]+`))*)\s+FROM\s+'([^']+)'\s*;?\s*""".r

  /** `CREATE BLOOMFILTER INDEX ON [TABLE] t FOR COLUMNS (c, …)` — Delta's
    * spelling: backfill-sketch every current data file in one scan (no
    * rewrite) and keep sketching on every future commit. */
  private val BloomIndex =
    """(?is)\s*CREATE\s+BLOOMFILTER\s+INDEX\s+ON\s+(?:TABLE\s+)?([A-Za-z_][A-Za-z0-9_]*(?:\.(?:[A-Za-z_][A-Za-z0-9_]*|`[^`]+`))*)\s+FOR\s+COLUMNS\s*\(\s*(.+?)\s*\)\s*;?\s*""".r

  /** `ALTER TABLE t RENAME COLUMN a TO b` — on a graft cow table this is
    * a full-rewrite commit (read-by-name layout, no column-mapping ids);
    * unregistered names delegate to Spark's own RENAME COLUMN. */
  private val RenameCol =
    """(?is)\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*(?:\.(?:[A-Za-z_][A-Za-z0-9_]*|`[^`]+`))*)\s+RENAME\s+COLUMN\s+([A-Za-z_][A-Za-z0-9_]*)\s+TO\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*""".r

  /** `CREATE TABLE [IF NOT EXISTS] t (col type [NOT NULL], …)` on a
    * REGISTERED graft name — the migrating user's actual first statement:
    * an EMPTY table with a declared schema, before any seed query exists
    * to CTAS from. Matched by a PREFIX + balanced-paren scan (column types
    * carry parens — `DECIMAL(10,2)`, `STRUCT<…>` — so a single regex
    * cannot bound the column list); the column list itself parses through
    * the delegate's own `parseTableSchema`, so every type/NOT NULL/COMMENT
    * spelling Spark accepts is accepted here. Tail clauses, any order:
    * `USING graft|graft-cow` (validated against the registered layout),
    * `LOCATION '…'` (validated against the registered root — registration
    * is the binding), `STATS (c, …)` (explicit prune columns; also
    * accepted as the `-- STATS (…)` comment SHOW CREATE emits, so the
    * exported DDL replays verbatim), `TBLPROPERTIES ('k' = 'v', …)`.
    * Unregistered names fall through untouched — real catalogs keep
    * owning their CREATE TABLE. */
  private val CreateSchemaPrefix =
    """(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)\s*\(""".r

  /** Default root for a statement-claimed name: `<warehouse>/<parts>`. */
  private def warehouseRoot(name: String): Option[String] =
    GraftTables.warehouse.map(wh => java.nio.file.Paths.get(wh,
      name.toLowerCase(java.util.Locale.ROOT).split('.').toSeq: _*).toString)

  private def createSchema(sqlText: String): Option[LogicalPlan] = {
    val m = CreateSchemaPrefix.findPrefixMatchOf(sqlText).getOrElse(return None)
    // a DSv2-catalog-qualified spelling registers under the FLAT key
    // (graft.db.t and db.t are the same binding — GraftTables.stripCatalog)
    val name = GraftTables.stripCatalog(m.group(3))
    val preRegistered = GraftTables.entryOf(name)
    val open = m.end - 1
    val close = GraftSqlLex.balancedClose(sqlText, open)
    if (preRegistered.isEmpty) {
      // an UNREGISTERED name is claimed only when the statement SAYS graft
      // (`USING graft|graft-cow` after a balanced column list) — the SQL
      // front door that registers the binding itself (durably when a
      // warehouse is attached). Anything else delegates verbatim, so real
      // catalogs keep owning their CREATE TABLE; until the claim is
      // decided, nothing here may error.
      if (close <= open + 1) return None
      // peek through the LEXER's eyes: a property value or comment
      // carrying the words "USING graft" must not claim a foreign CREATE
      val peek = GraftSqlLex.stripLiteralsAndComments(sqlText.substring(close + 1))
      if ("""(?is)\bUSING\s+graft(?:[-_]cow)?(?![\w\-])""".r
          .findFirstIn(peek).isEmpty) return None
    }
    // a column-list OR REPLACE on a CLAIMED name must not fall through:
    // Spark's catalog would create a shadow table while the registry keeps
    // serving the graft one — the most confusing failure shape possible
    if (m.group(1) != null) sys.error(s"CREATE OR REPLACE TABLE $name: a " +
      "declared-schema replace is not supported on a graft table — replace " +
      s"the CONTENTS with CREATE OR REPLACE TABLE $name AS SELECT …, and " +
      "evolve the SCHEMA with ALTER TABLE (ADD/DROP/RENAME COLUMN)")
    require(close > open + 1, s"CREATE TABLE $name: empty or unbalanced column list")
    val colList = sqlText.substring(open + 1, close)
    var tail = sqlText.substring(close + 1)
    if ("""(?is)^\s*AS\b""".r.findFirstIn(tail).isDefined)
      sys.error(s"CREATE TABLE $name: a column list cannot combine with AS " +
        "on a graft table — CREATE the declared schema, then INSERT INTO " +
        s"$name SELECT … (or drop the column list for plain CTAS)")
    // Every keyword scan below runs over the MASK (literal contents and
    // comments blanked, lengths preserved — GraftSqlLex.mask) and splices
    // the ORIGINAL by the match offsets, so no clause keyword can ever
    // anchor inside another clause's quoted literal REGARDLESS of scan
    // order (ADVICE r12: a LOCATION path containing "TBLPROPERTIES ("
    // anchored the props scan mid-literal because the splice order was
    // load-bearing; with mask-scanning it is not).
    def take(re: scala.util.matching.Regex, keepComments: Boolean = false)
        : Option[scala.util.matching.Regex.Match] =
      re.findFirstMatchIn(GraftSqlLex.mask(tail, keepComments)).map { mm =>
        tail = tail.substring(0, mm.start) + tail.substring(mm.end); mm
      }
    // TBLPROPERTIES with the BALANCED scan, not a lazy regex: a property
    // value is arbitrary quoted text (CHECK constraints ride properties),
    // so `(.+?)\)` would truncate at the first ')' inside a predicate
    // like '(a > 0) AND (b > 0)' and corrupt a SHOW CREATE round-trip
    val props = "(?is)TBLPROPERTIES\\s*\\(".r.findFirstMatchIn(GraftSqlLex.mask(tail))
      .map { mm =>
        val o = mm.end - 1
        val c = GraftSqlLex.balancedClose(tail, o)
        require(c > o, s"CREATE TABLE $name: unbalanced TBLPROPERTIES")
        val inner = tail.substring(o + 1, c)
        tail = tail.substring(0, mm.start) + tail.substring(c + 1)
        GraftSqlLex.parsePropPairs(inner)
      }
      .getOrElse(Map.empty[String, String])
    // LOCATION's literal parses through the same quoted()/unescape
    // machinery as property values — SHOW CREATE emits it through q()
    // (doubling quotes and backslashes), so a raw `'([^']*)'` regex would
    // either fail to match or compare the ESCAPED spelling against the
    // raw registered root, breaking the verbatim-replay contract for
    // roots carrying ' or \
    val locationDecl = "(?is)LOCATION\\s*'".r.findFirstMatchIn(GraftSqlLex.mask(tail))
      .map { mm =>
        val (loc, after) = GraftSqlLex.quotedLiteral(tail, mm.end - 1)
        tail = tail.substring(0, mm.start) + tail.substring(after)
        loc
      }
    // keepComments: SHOW CREATE emits STATS as a `-- STATS (…)` comment
    // (so foreign engines replaying the DDL skip it); the replay here must
    // still see it — literals stay blanked either way
    val stats = take("""(?is)(?:--\s*)?STATS\s*\(\s*([A-Za-z0-9_\s,]*?)\s*\)""".r,
        keepComments = true)
      .map(_.group(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    val usingDecl = take("""(?is)USING\s+(graft(?:[-_]cow)?)(?![\w\-])""".r)
      .map(g => g.group(1).equalsIgnoreCase("graft-cow") ||
        g.group(1).equalsIgnoreCase("graft_cow"))
    require(tail.replaceAll("[;\\s]", "").isEmpty,
      s"CREATE TABLE $name: unrecognized trailing clause: ${tail.trim}")
    val (e, autoRegister) = preRegistered match {
      case Some(e0) =>
        usingDecl.foreach(declaredCow =>
          require(declaredCow == e0.cow, s"CREATE TABLE $name: USING " +
            s"${if (declaredCow) "graft-cow" else "graft"} but '$name' is registered as " +
            s"${if (e0.cow) "graft-cow (file-level)" else "graft (snapshot-level)"}"))
        locationDecl.foreach(loc =>
          require(loc == e0.root, s"CREATE TABLE $name: LOCATION " +
            s"'$loc' conflicts with the registered root '${e0.root}' — " +
            "registration is the binding; re-register the name to move it"))
        (e0, false)
      case None =>
        // the statement-claimed layout (the peek above guarantees USING is
        // present outside literals); the root comes from LOCATION or the
        // attached warehouse
        val cow = usingDecl.getOrElse(sys.error(s"CREATE TABLE $name: " +
          "internal: USING graft peeked but not parsed — report this statement"))
        val root = locationDecl
          .orElse(warehouseRoot(name))
          .getOrElse(sys.error(s"CREATE TABLE $name: USING " +
            s"${if (cow) "graft-cow" else "graft"} on an unregistered name " +
            "needs a LOCATION clause or an attached graft warehouse " +
            "(spark.graft.warehouse) to place the table"))
        (GraftTables.Entry(root, cow), true)
    }
    val schema = delegate.parseTableSchema(colList)
    Some(GraftCreateTableCommand(name, e.root, schema, e.cow,
      ifNotExists = m.group(2) != null, statsCols = stats, props = props,
      autoRegister = autoRegister))
  }

  /** Register the DSv2 catalog conf on the parser's FIRST use — catalog
    * plugins resolve lazily from SQLConf, so landing the class name before
    * the first statement analyzes makes `spark.sql.extensions` the only
    * conf a deployment needs (an explicit spark.sql.catalog.graft wins).
    * Deliberately NOT in the parser factory: that runs inside sessionState
    * construction, where touching session.conf recurses into the build. */
  private lazy val ensureCatalog: Unit = {
    // auto-registration must not HIJACK two-part resolution for a
    // deployment whose session catalog has a database literally named
    // `graft` — their existing `graft.t` queries resolve there today and
    // must keep doing so; such a deployment opts in with an explicit
    // spark.sql.catalog.<name> conf under a non-colliding name. The probe
    // goes through the INTERNAL SessionCatalog: the public Catalog API
    // parses identifiers, which would re-enter this very lazy init.
    if (session.conf.getOption("spark.sql.catalog.graft").isEmpty &&
        !session.sessionState.catalog.databaseExists("graft"))
      session.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.GraftCatalog].getName)
    // seed the intercepts' catalog-prefix strip before the plugin's lazy
    // first load: `CREATE TABLE graft.t` must register the flat key from
    // statement one
    session.conf.getAll.foreach { case (k, v) =>
      val rest = k.stripPrefix("spark.sql.catalog.")
      if (k.startsWith("spark.sql.catalog.") && !rest.contains(".") &&
          v == classOf[graft.sources.GraftCatalog].getName)
        graft.sources.GraftCatalog.preRegister(rest)
    }
  }

  override def parsePlan(sqlText: String): LogicalPlan = {
    ensureCatalog
    createSchema(sqlText).getOrElse(parsePlanRest(sqlText))
  }

  /** Marker location for the txn statements: explicit AT/IN '<dir>', else
    * the attached warehouse's `_txns/`. */
  private def txnDir(explicit: String): String =
    Option(explicit).getOrElse(GraftTables.warehouse
      .map(w => java.nio.file.Paths.get(w).resolve("_txns").toString)
      .getOrElse(sys.error("graft transactions: no attached graft " +
        "warehouse (GraftTables.attachWarehouse / spark.graft.warehouse) — " +
        "name the marker location explicitly: ... GRAFT TRANSACTION[S] " +
        "AT/IN '<dir>'")))

  private def parsePlanRest(sqlText: String): LogicalPlan = sqlText match {
    case Vacuum(name, n, hours, dryRun) =>
      GraftTables.resolveName(name) match {
        case Some(e) if dryRun != null && e.cow =>
          // DRY RUN is a RELATION (file, bytes, age_ms): what a real vacuum
          // with these parameters would delete — composable, zero deletions
          val age = Option(hours).map(_.toLong * 3600000L)
            .getOrElse(GraftVacuumExec.DefaultAgeMs)
          val rows = graft.sources.FileCow.vacuumPlan(session, e.root, n.toInt, age)
          import session.implicits._
          rows.toDF("file", "bytes", "age_ms").queryExecution.analyzed
        case Some(e) if dryRun != null =>
          sys.error(s"VACUUM DRY RUN: '$name' is a snapshot-level table — " +
            "its vacuum drops whole version dirs; DRY RUN reports cow data files")
        case Some(e) =>
          GraftVacuumCommand(name, e.root, n.toInt, e.cow,
            olderThanMs = Option(hours).map(_.toLong * 3600000L))
        case None => sys.error(s"VACUUM: '$name' is not a registered graft table")
      }
    case History(name) =>
      GraftTables.resolveName(name) match {
        // relation, not command: the history frame's analyzed plan drops
        // straight in, so DESCRIBE HISTORY composes (WHERE/ORDER BY/joins)
        case Some(e) if e.cow =>
          graft.sources.FileCow.history(session, e.root).queryExecution.analyzed
        case Some(e) =>
          graft.sources.Versioned.history(session, e.root).queryExecution.analyzed
        case None => sys.error(s"DESCRIBE HISTORY: '$name' is not a registered graft table")
      }
    case OptimizeAuto(name) =>
      GraftTables.resolveName(name) match {
        case Some(e) if e.cow => GraftOptimizeAutoCommand(name, e.root)
        case Some(_) => sys.error(s"OPTIMIZE AUTO: '$name' is a snapshot-level " +
          "table — every publish already rewrites it; OPTIMIZE applies to cow tables")
        case None => sys.error(s"OPTIMIZE AUTO: '$name' is not a registered graft table")
      }
    case Optimize(name, n, za, zb, where) =>
      GraftTables.resolveName(name) match {
        case Some(e) if e.cow =>
          require(za == null || where == null,
            "OPTIMIZE: ZORDER BY and WHERE cannot combine — Z-ordering " +
              "re-clusters the whole table by construction")
          GraftOptimizeCommand(name, e.root, n.toInt,
            zorder = Option(za).map(a => (a, zb)),
            where = Option(where).map(w =>
              ExprHolder(delegate.parseExpression(w))))
        case Some(_) => sys.error(s"OPTIMIZE: '$name' is a snapshot-level table — " +
          "every publish already rewrites it; OPTIMIZE applies to cow tables")
        case None => sys.error(s"OPTIMIZE: '$name' is not a registered graft table")
      }
    case BloomIndex(name, cols) =>
      GraftTables.resolveName(name) match {
        case Some(e) if e.cow =>
          GraftBloomIndexCommand(name, e.root,
            cols.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        case Some(_) => sys.error(s"CREATE BLOOMFILTER INDEX: '$name' is a " +
          "snapshot-level table — the per-file index applies to cow tables")
        case None => sys.error(
          s"CREATE BLOOMFILTER INDEX: '$name' is not a registered graft table")
      }
    case Convert(name, dir, cols) =>
      GraftTables.resolveName(name) match {
        case Some(e) if e.cow =>
          GraftConvertCommand(name, e.root, dir, cols.split(",").map(_.trim).toSeq)
        case Some(_) => sys.error(s"CONVERT TO GRAFT: '$name' is registered as a " +
          "snapshot-level table; conversion-in-place targets cow tables")
        case None => sys.error(s"CONVERT TO GRAFT: '$name' is not a registered graft table")
      }
    case Restore(name, v) =>
      GraftTables.resolveName(name) match {
        case Some(e) if e.cow => GraftRestoreCommand(name, e.root, v.toLong)
        case Some(_) => sys.error(s"RESTORE TABLE: '$name' is a snapshot-level " +
          "table — re-publish the old version's frame; RESTORE applies to cow tables")
        case None => sys.error(s"RESTORE TABLE: '$name' is not a registered graft table")
      }
    case RestoreTs(name, ts) =>
      GraftTables.resolveName(name) match {
        case Some(e) if e.cow =>
          // session-timezone resolution, same contract as TIMESTAMP AS OF
          val cast = org.apache.spark.sql.catalyst.expressions.Cast(
            org.apache.spark.sql.catalyst.expressions.Literal(ts),
            org.apache.spark.sql.types.TimestampType,
            Some(session.sessionState.conf.sessionLocalTimeZone))
          val ms = Option(cast.eval(null)).map(_.asInstanceOf[Long] / 1000L)
            .getOrElse(sys.error(s"RESTORE TABLE: cannot parse timestamp '$ts'"))
          GraftRestoreCommand(name, e.root,
            graft.sources.FileCow.versionAtTimestamp(e.root, ms))
        case Some(_) => sys.error(s"RESTORE TABLE: '$name' is a snapshot-level " +
          "table — re-publish the old version's frame; RESTORE applies to cow tables")
        case None => sys.error(s"RESTORE TABLE: '$name' is not a registered graft table")
      }
    case Streams(name) =>
      GraftTables.resolveName(name) match {
        // relation, not command (same reasoning as DESCRIBE HISTORY):
        // composes with WHERE/ORDER BY — "lagging streams" is one filter
        case Some(e) if e.cow =>
          graft.sources.FileCow.streamRegistrations(session, e.root)
            .queryExecution.analyzed
        case Some(_) => sys.error(s"DESCRIBE STREAMS: '$name' is a " +
          "snapshot-level table (streams and their registrations are a " +
          "cow-table surface)")
        case None => sys.error(s"DESCRIBE STREAMS: '$name' is not a registered graft table")
      }
    case Detail(name) =>
      GraftTables.resolveName(name) match {
        // relation, not command (same reasoning as DESCRIBE HISTORY):
        // composes with WHERE/ORDER BY/aggregates
        case Some(e) if e.cow =>
          graft.sources.FileCow.detail(session, e.root,
            graft.sources.FileCow.visibleVersion(e.root)).queryExecution.analyzed
        case Some(_) => sys.error(s"DESCRIBE DETAIL: '$name' is a snapshot-level " +
          "table (no per-file manifest); use DESCRIBE HISTORY")
        case None => sys.error(s"DESCRIBE DETAIL: '$name' is not a registered graft table")
      }
    case AddConstraint(name, cname, check) if GraftTables.resolveName(name).isDefined =>
      cowOnly("ALTER TABLE ADD CONSTRAINT", name)(e =>
        GraftConstraintCommand(name, e.root, cname, Some(check)))
    case DropConstraint(name, cname) if GraftTables.resolveName(name).isDefined =>
      cowOnly("ALTER TABLE DROP CONSTRAINT", name)(e =>
        GraftConstraintCommand(name, e.root, cname, None))
    case SetProps(name, pairs) if GraftTables.resolveName(name).isDefined =>
      // same ''-aware pair parser as CREATE: a value carrying a string
      // literal (a CHECK predicate) must survive, not truncate
      val kv = GraftSqlLex.parsePropPairs(pairs)
      require(kv.nonEmpty, s"SET TBLPROPERTIES: no 'k' = 'v' pairs in ($pairs)")
      cowOnly("ALTER TABLE SET TBLPROPERTIES", name)(e =>
        GraftPropsCommand(name, e.root, set = kv, unset = Nil))
    case UnsetProps(name, keys) if GraftTables.resolveName(name).isDefined =>
      val ks = """'([^']+)'""".r.findAllMatchIn(keys).map(_.group(1)).toSeq
      require(ks.nonEmpty, s"UNSET TBLPROPERTIES: no 'k' keys in ($keys)")
      cowOnly("ALTER TABLE UNSET TBLPROPERTIES", name)(e =>
        GraftPropsCommand(name, e.root, set = Map.empty, unset = ks))
    case CopyInto(name, dir) =>
      cowOnly("COPY INTO", name)(e => GraftCopyIntoCommand(name, e.root, dir))
    case RenameCol(name, from, to) if GraftTables.resolveName(name).isDefined =>
      cowOnly("ALTER TABLE RENAME COLUMN", name)(e =>
        GraftRenameColumnCommand(name, e.root, from, to))
    case ShowCreate(name) if GraftTables.entryOf(name).isDefined =>
      val e = GraftTables.entryOf(name).get
      // ANSI '' doubling: a CHECK predicate with a string literal must
      // round-trip through the quoted property value, not corrupt it
      // '' doubling for quotes AND \\ doubling for backslashes — the exact
      // inverse of parsePropPairs' unescaping, so emitted DDL replays to
      // the identical stored value (a CHECK predicate carrying a regex
      // keeps its backslashes through the round-trip)
      def q(s: String): String = GraftSqlLex.q(s)
      val v =
        if (e.cow) graft.sources.FileCow.visibleVersion(e.root)
        else Versioned.currentVersion(e.root)
      if (v < 1L) sys.error(s"SHOW CREATE TABLE: '$name' is registered " +
        s"but has no published version yet (CREATE/CTAS it first)")
      val schema =
        if (e.cow) graft.sources.FileCow.schemaOf(e.root, v)
        else Versioned.read(session, e.root).schema
      val cols = schema.fields.map { f =>
        s"  ${f.name} ${f.dataType.sql}${if (f.nullable) "" else " NOT NULL"}"
      }.mkString(",\n")
      val props =
        if (!e.cow) Map.empty[String, String]
        // strip the defaults' __since/__files bookkeeping: they describe
        // THIS instance's file vintages (sidecar refs) and must not replay
        // into a fresh table — the write-side 'graft.default.<col>' itself
        // replays (and the CREATE validation would refuse internal keys)
        else graft.sources.FileCow.tableProps(e.root, v).filterNot { case (k, _) =>
          k.startsWith("graft.default.") &&
            (k.endsWith(".__since") || k.endsWith(".__files"))
        }
      val propsDdl =
        if (props.isEmpty) ""
        else props.toSeq.sortBy(_._1)
          .map { case (k, value) => s"'${q(k)}' = '${q(value)}'" }
          .mkString("\nTBLPROPERTIES (\n  ", ",\n  ", "\n)")
      // the manifest's prune columns: not re-playable DDL (CTAS collects
      // stats itself) but essential migration information — as a comment
      val statsDdl =
        if (!e.cow) ""
        else {
          val sc = graft.sources.FileCow.statsColsOf(session, e.root, v)
          if (sc.isEmpty) "" else s"\n-- STATS (${sc.mkString(", ")})"
        }
      val blooms =
        if (!e.cow) Nil
        else graft.sources.BloomStore.columns(e.root)
      val bloomDdl =
        if (blooms.isEmpty) ""
        else s";\nCREATE BLOOMFILTER INDEX ON $name FOR COLUMNS " +
          s"(${blooms.mkString(", ")})"
      val using = if (e.cow) "graft-cow" else "graft"
      val ddl = s"CREATE TABLE $name (\n$cols\n)\n" +
        s"USING $using\nLOCATION '${q(e.root)}'$propsDdl$statsDdl$bloomDdl"
      import session.implicits._
      Seq(ddl).toDF("createtab_stmt").queryExecution.analyzed
    case ShowProps(name) if GraftTables.resolveName(name).exists(_.cow) =>
      val e = GraftTables.resolveName(name).get
      val rows = graft.sources.FileCow
        .tableProps(e.root, graft.sources.FileCow.visibleVersion(e.root))
        .toSeq.sortBy(_._1)
      import session.implicits._
      rows.toDF("key", "value").queryExecution.analyzed
    case TxnBegin(dir) => GraftTxnCommand("begin", Some(txnDir(dir)))
    case TxnCommit() => GraftTxnCommand("commit", None)
    case TxnRollback() => GraftTxnCommand("rollback", None)
    case TxnJoin(m) => GraftTxnCommand("join", Some(m))
    case TxnLeave() => GraftTxnCommand("leave", None)
    case TxnShow(dir) =>
      val rows =
        graft.sources.GraftTransactions.listTransactionsDetailed(txnDir(dir))
      import session.implicits._
      rows.toDF("marker", "status", "started_ms", "decided_ms", "participants")
        .queryExecution.analyzed

    case TxnVacuum(dir, hours) =>
      val retainMs = Option(hours).map(_.toLong * 3600000L)
        .getOrElse(168L * 3600000L)
      val sealedCount =
        graft.sources.GraftTransactions.vacuumMarkers(txnDir(dir), retainMs)
      import session.implicits._
      Seq(sealedCount).toDF("markers_sealed").queryExecution.analyzed

    case ShowTables() =>
      val rows = GraftTables.all().map { case (name, e) =>
        val version =
          if (e.cow) graft.sources.FileCow.visibleVersion(e.root)
          else Versioned.currentVersion(e.root)
        (name, e.root, if (e.cow) "cow" else "snapshot", version)
      }
      import session.implicits._
      rows.toDF("name", "root", "layout", "version").queryExecution.analyzed
    case Clone(tgt0, src0, v) if GraftTables.entryOf(GraftTables.stripCatalog(tgt0)).isDefined ||
        GraftTables.entryOf(GraftTables.stripCatalog(src0)).isDefined =>
      val tgt = GraftTables.stripCatalog(tgt0); val src = GraftTables.stripCatalog(src0)
      (GraftTables.entryOf(tgt), GraftTables.entryOf(src)) match {
        case (Some(t), Some(s)) if t.cow && s.cow =>
          GraftCloneCommand(tgt, t.root, src, s.root, Option(v).map(_.toLong))
        case (Some(_), Some(_)) => sys.error("SHALLOW CLONE: both tables must " +
          "be cow-layout graft tables (snapshot tables re-publish whole " +
          "versions — copy the frame instead)")
        case _ => sys.error(s"SHALLOW CLONE: both '$tgt' and '$src' must be " +
          "registered graft tables")
      }
    case CtasUsing(orReplace, ifNotExists, name0, using, locLit, query) =>
      val name = GraftTables.stripCatalog(name0)
      require(orReplace == null || ifNotExists == null,
        "CREATE OR REPLACE TABLE and IF NOT EXISTS cannot combine")
      // the regex admits both `graft-cow` and `graft_cow` (DSv2 provider
      // spellings can't carry a dash) — normalize before the layout check,
      // mirroring the declared-schema path above
      val declaredCow = using.replace('_', '-').equalsIgnoreCase("graft-cow")
      val location = Option(locLit).map(l => GraftSqlLex.quotedLiteral(l, 0)._1)
      val preRegistered = GraftTables.resolveName(name)
      val e = preRegistered match {
        case Some(e0) =>
          require(declaredCow == e0.cow, s"CREATE TABLE $name: USING " +
            s"${if (declaredCow) "graft-cow" else "graft"} but '$name' is registered as " +
            s"${if (e0.cow) "graft-cow (file-level)" else "graft (snapshot-level)"}")
          location.foreach(loc =>
            require(loc == e0.root, s"CREATE TABLE $name: LOCATION " +
              s"'$loc' conflicts with the registered root '${e0.root}' — " +
              "registration is the binding; re-register the name to move it"))
          e0
        case None =>
          val root = location.orElse(warehouseRoot(name)).getOrElse(sys.error(
            s"CREATE TABLE $name: USING ${if (declaredCow) "graft-cow" else "graft"} " +
              "on an unregistered name needs a LOCATION clause or an attached " +
              "graft warehouse (spark.graft.warehouse) to place the table"))
          GraftTables.Entry(root, declaredCow)
      }
      GraftCtasCommand(name, e.root, delegate.parsePlan(query), e.cow,
        ifNotExists = ifNotExists != null, orReplace = orReplace != null,
        autoRegister = preRegistered.isEmpty)

    case Ctas(orReplace, ifNotExists, name0, query)
        if GraftTables.entryOf(GraftTables.stripCatalog(name0)).isDefined =>
      val name = GraftTables.stripCatalog(name0)
      require(orReplace == null || ifNotExists == null,
        "CREATE OR REPLACE TABLE and IF NOT EXISTS cannot combine")
      val e = GraftTables.entryOf(name).get
      GraftCtasCommand(name, e.root, delegate.parsePlan(query), e.cow,
        ifNotExists = ifNotExists != null, orReplace = orReplace != null)
    case _ => delegate.parsePlan(sqlText)
  }

  private def cowOnly(what: String, name: String)(
      mk: GraftTables.Entry => LogicalPlan): LogicalPlan =
    GraftTables.resolveName(name) match {
      case Some(e) if e.cow => mk(e)
      case Some(_) => sys.error(s"$what: '$name' is a snapshot-level table — " +
        "constraints/properties are a cow-table surface")
      case None => sys.error(s"$what: '$name' is not a registered graft table")
    }

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] = {
    ensureCatalog // spark.table/spark.catalog enter here, not parsePlan
    delegate.parseMultipartIdentifier(sqlText)
  }
  override def parseTableSchema(sqlText: String): StructType = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType = delegate.parseRoutineParam(sqlText)
}

/** `VACUUM t RETAIN n VERSIONS [OLDER THAN h HOURS]` — planned by
  * [[GraftMergeStrategy]]. `olderThanMs` is the cow-table data-file age
  * floor; when the statement omits it, [[GraftVacuumExec.DefaultAgeMs]]
  * (7 days, Delta's default) applies — an age-0 vacuum deletes the fresh
  * still-unreferenced data files of any commit in flight, so 0 must be
  * asked for explicitly (`OLDER THAN 0 HOURS`), never defaulted into. */
/** Cross-table transaction control (VERDICT r14 #3): `op` is begin /
  * commit / rollback; `markerDir` only for begin (the marker location —
  * explicit AT '<dir>' or the warehouse's `_txns/`). The txn binds the
  * session's driver thread — the same thread every `spark.sql` statement
  * of an orchestrator runs on. */
case class GraftTxnCommand(op: String, markerDir: Option[String])
    extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

case class GraftTxnExec(cmd: GraftTxnCommand) extends LeafExecNode {
  override def output: Seq[Attribute] = Nil
  private lazy val done: Unit = {
    cmd.op match {
      case "begin" => graft.sources.GraftTransactions.begin(cmd.markerDir.get)
      case "commit" => graft.sources.GraftTransactions.commitActive(session)
      case "rollback" => graft.sources.GraftTransactions.rollbackActive(session)
      case "join" => graft.sources.GraftTransactions.joinSession(cmd.markerDir.get)
      case "leave" => graft.sources.GraftTransactions.leaveActive()
    }
    ()
  }
  protected override def doExecute(): RDD[InternalRow] = { done; sparkContext.emptyRDD }
  override def executeCollect(): Array[InternalRow] = { done; Array.empty }
}

case class GraftVacuumCommand(table: String, root: String, retainLast: Int,
    cow: Boolean = false, olderThanMs: Option[Long] = None)
    extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** Runs the retention cleanup once. */
case class GraftVacuumExec(cmd: GraftVacuumCommand) extends LeafExecNode {
  override def output: Seq[Attribute] = Nil
  private lazy val done: Unit = {
    if (cmd.cow) graft.sources.FileCow.vacuum(session, cmd.root, cmd.retainLast,
      minAgeMs = cmd.olderThanMs.getOrElse(GraftVacuumExec.DefaultAgeMs))
    // snapshot layout: an explicit OLDER THAN is honored (time-travel
    // window); the 7-day default is cow-only — version dirs are
    // self-contained, there is no in-flight-commit file race to guard
    else Versioned.vacuum(cmd.root, cmd.retainLast,
      minAgeMs = cmd.olderThanMs.getOrElse(0L))
    ()
  }
  protected override def doExecute(): RDD[InternalRow] = { done; sparkContext.emptyRDD }
  override def executeCollect(): Array[InternalRow] = { done; Array.empty }
}

/** `CONVERT TO GRAFT t FROM '<dir>' STATS (c, …)` — adopt a plain-parquet
  * directory as cow table `t` ([[graft.sources.FileCow.convert]]); planned
  * by [[GraftMergeStrategy]]. */
case class GraftConvertCommand(table: String, root: String, sourceDir: String,
    statsCols: Seq[String]) extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** `CREATE BLOOMFILTER INDEX ON t FOR COLUMNS (c, …)` — backfill-sketch
  * the table's current files and declare the columns for every future
  * commit ([[graft.sources.FileCow.buildBloomIndex]]); planned by
  * [[GraftMergeStrategy]]. */
case class GraftBloomIndexCommand(table: String, root: String,
    cols: Seq[String]) extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** `RESTORE TABLE t TO VERSION AS OF n` — one shared-files commit that
  * rewinds a cow table ([[graft.sources.FileCow.restore]]); planned by
  * [[GraftMergeStrategy]]. */
case class GraftRestoreCommand(table: String, root: String, toVersion: Long)
    extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** `CREATE TABLE tgt SHALLOW CLONE src [VERSION AS OF n]` — zero-copy
  * clone ([[graft.sources.FileCow.shallowClone]]); planned by
  * [[GraftMergeStrategy]]. */
case class GraftCloneCommand(table: String, root: String, srcTable: String,
    srcRoot: String, versionAsOf: Option[Long]) extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** `ALTER TABLE t ADD CONSTRAINT name CHECK (expr)` (`check = Some`) /
  * `DROP CONSTRAINT name` (`check = None`) — [[graft.sources.FileCow
  * .addConstraint]]/[[graft.sources.FileCow.dropConstraint]]; planned by
  * [[GraftMergeStrategy]]. */
case class GraftConstraintCommand(table: String, root: String, name: String,
    check: Option[String]) extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** `ALTER TABLE t SET/UNSET TBLPROPERTIES (…)` — one metadata commit per
  * statement; planned by [[GraftMergeStrategy]]. */
case class GraftPropsCommand(table: String, root: String,
    set: Map[String, String], unset: Seq[String]) extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** `ALTER TABLE t RENAME COLUMN a TO b` — a full-rewrite commit
  * ([[graft.sources.FileCow.renameColumn]]); planned by
  * [[GraftMergeStrategy]]. */
case class GraftRenameColumnCommand(table: String, root: String,
    from: String, to: String) extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** `COPY INTO t FROM '<dir>'` — idempotent landing-zone load
  * ([[graft.sources.FileCow.copyInto]]); planned by
  * [[GraftMergeStrategy]]. */
case class GraftCopyIntoCommand(table: String, root: String,
    sourceDir: String) extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

object GraftVacuumExec {
  /** Data-file age floor when VACUUM omits OLDER THAN: 7 days, mirroring
    * Delta's retention default and for the same in-flight-commit race. */
  val DefaultAgeMs: Long = 7L * 24 * 3600000L
}

/** `OPTIMIZE t INTO n FILES [ZORDER BY (a, b)]` — file-level compaction on
  * a cow table (the Delta OPTIMIZE / OPTIMIZE ZORDER analog; layout-only
  * commit, planned by [[GraftMergeStrategy]]; mechanism =
  * [[graft.sources.FileCow.compact]] or
  * [[graft.sources.FileCow.compactZOrder]]). */
/** `OPTIMIZE t AUTO` — the bounded G36 maintenance step on demand,
  * thresholds from the table's `graft.maintenance.*` properties (defaults
  * when unset: 32 MiB small-file bar, 2-file floor, 32 per trigger). */
case class GraftOptimizeAutoCommand(table: String, root: String)
    extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

case class GraftOptimizeCommand(table: String, root: String, targetFiles: Int,
    zorder: Option[(String, String)] = None,
    where: Option[ExprHolder] = None)
    extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}
