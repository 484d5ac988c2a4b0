package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** AUTO-MAINTENANCE (VERDICT r14 #5): the closed loop between G13's
  * "where has the layout fragmented" planning and G18's OPTIMIZE
  * execution — the Databricks auto-compaction analog, so a deployment no
  * longer has to cron its own OPTIMIZE.
  *
  * Opt-in per table: `ALTER TABLE t SET TBLPROPERTIES
  * ('graft.maintenance.auto' = 'true')`. After every DATA commit the
  * post-commit hook prices the small-file debt from the (cached) manifest
  * rows — a driver-side fold, no file opened — and when at least
  * `minSmallFiles` files sit under `smallFileBytes`, lands ONE bounded
  * layout-only commit: the smallest ≤ `maxFilesPerTrigger` small files
  * rewritten into ~`smallFileBytes`-sized bins (kind `compact`, row
  * neutral — the change feed across it is empty and the table stream
  * skips it). Bounded per trigger by construction: a fragmented landing
  * workload CONVERGES (each trigger retires up to `maxFilesPerTrigger`
  * small files and adds back ~1), while a well-laid-out table prices the
  * debt at zero and pays only the manifest fold.
  *
  * The hook must never fail or slow-fail the user's statement beyond its
  * own bounded rewrite: maintenance losing a commit race (or any other
  * maintenance failure) is swallowed — the debt is still there and the
  * next data commit re-prices it. Never triggers on maintenance commits
  * (no self-feedback), never inside an open cross-table transaction
  * (gated data is not yet anyone's to rewrite; the txn's own commits
  * trigger it after the marker decides — on their NEXT data commit). */
object CowAutoMaintenance {

  val AutoProp = "graft.maintenance.auto"
  /** A file below this byte size counts as fragmentation debt (and the
    * rewrite bins output to roughly this size). Default 32 MiB. */
  val SmallBytesProp = "graft.maintenance.smallFileBytes"
  /** Trigger only when at least this many small files stand. Default 8. */
  val MinFilesProp = "graft.maintenance.minSmallFiles"
  /** Rewrite at most this many files per trigger (the bound that keeps
    * maintenance latency off the ingest path). Default 32. */
  val MaxPerTriggerProp = "graft.maintenance.maxFilesPerTrigger"

  /** Commit kinds that never trigger maintenance: the maintenance
    * rewrites themselves (no self-feedback), metadata-only commits
    * (nothing new to fragment), and txn heals. Unknown future kinds
    * trigger — the planner no-ops when there is no debt. */
  private val SkipKinds = Set("compact", "zorder", "txn_revert", "restore",
    "clone", "rename_column", "set_properties", "unset_properties",
    "add_columns", "drop_columns", "add_constraint", "drop_constraint",
    "delete_dv")

  private val healing = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = false
  }

  /** Post-commit hook (called by [[CowWritePath.commit]] after a publish
    * wins). Prices the debt and lands at most ONE bounded compact. */
  private[sources] def afterCommit(spark: SparkSession, root: String,
      kind: String, landed: Long): Unit = {
    if (healing.get()) return
    if (SkipKinds(kind)) return
    if (GraftTransactions.activeMarker.isDefined) return
    healing.set(true)
    // EVERYTHING below sits inside the guard (VERDICT r15 #2): the user's
    // commit has already landed, so no hook failure — a maintenance race,
    // a MALFORMED property ('32MB' where a long is expected) — may escape
    // and fail a statement whose write is durable (an app-level retry of
    // that "failure" would double-commit). A bad property just means the
    // debt re-prices, unserved, on every commit until it is fixed.
    try {
      // price props at the version WE landed (known — no version probe, so
      // the hook adds zero store ops to the commit path)
      val props = FileCow.tableProps(root, landed)
      if (props.get(AutoProp).contains("true")) {
        val smallBytes = props.get(SmallBytesProp).map(_.toLong)
          .getOrElse(32L * 1024 * 1024)
        val minFiles = props.get(MinFilesProp).map(_.toInt).getOrElse(8)
        val maxPer = props.get(MaxPerTriggerProp).map(_.toInt).getOrElse(32)
        compactSmall(spark, root, smallBytes, minFiles, maxPer)
        ()
      }
    }
    catch { case scala.util.control.NonFatal(_) => () } // debt re-prices next commit
    finally healing.set(false)
  }

  /** ONE bounded small-file compaction: rewrite the smallest
    * ≤ `maxPerTrigger` files under `smallBytes` into
    * ~`smallBytes`-sized bins — a no-op commit-free return when fewer
    * than `minFiles` qualify. Also the manual spelling for a deployment
    * that wants the planner's bounded step without the per-commit hook. */
  def compactSmall(spark: SparkSession, root: String, smallBytes: Long,
      minFiles: Int, maxPerTrigger: Int): FileCow.Commit =
    FileCow.retrying(root, "FileCow.compactSmall") { version =>
      val schema = FileCow.schemaOf(root, version)
      val statsCols = FileCow.statsColsOf(spark, root, version)
      val (ms, rows) = CowManifestCache.rowsOf(spark, root, version)
      val fIdx = ms.fieldIndex("file")
      val bIdx = ms.fieldIndex("bytes")
      val small = rows.filter(_.getLong(bIdx) < smallBytes)
        .sortBy(_.getLong(bIdx)).take(maxPerTrigger)
      if (small.length < math.max(minFiles, 2))
        FileCow.Commit(version, filesKept = rows.length.toLong,
          filesRewritten = 0L, filesAdded = 0L)
      else {
        val affected = small.map(_.getString(fIdx))
        val total = small.map(_.getLong(bIdx)).sum
        val target = math.max(1, math.ceil(total.toDouble / smallBytes).toInt)
        val data = FileCow.readFilesWithDv(spark, root, version, schema,
            affected.toSeq)
          .repartitionByRange(target, col(statsCols.head))
        val added = FileCow.writeDataFiles(spark, root, data, statsCols, 0L,
          declaredSchema = Some(schema))
        val addedPaths = FileCow.filePaths(added)
        FileCow.commit(spark, root, version, FileCow.AddedSlice(added), schema,
          FileCow.CommitAction("compact", addedPaths, affected.toSeq))
        FileCow.Commit(version + 1,
          filesKept = (rows.length - affected.length).toLong,
          filesRewritten = affected.length.toLong,
          filesAdded = addedPaths.size.toLong)
      }
    }
}
