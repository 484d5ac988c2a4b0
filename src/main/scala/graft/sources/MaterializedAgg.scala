package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** G20: INCREMENTAL MATERIALIZED-VIEW MAINTENANCE from the change feed —
  * the consumer the G17/G19 CDF scaladocs promise ("the row-level delta an
  * incremental consumer applies instead of rescanning the table"), closing
  * the loop: q54 proved the mergeable-aggregate algebra, G19 produces a
  * row-level delta whose cost ∝ changed data, and this component wires one
  * to the other.
  *
  * The view is a grouped SUM/COUNT table over a [[FileCow]] source. Each
  * [[refresh]]:
  *
  *  1. reads `FileCow.changesBetween(lastApplied, current)` — scans ONLY
  *     the files the two versions do not share;
  *  2. converts the feed to SIGNED contributions (insert/update_post → +x,
  *     +1; delete/update_pre → −x, −1) and collapses them with one hash
  *     aggregate — a delta-sized shuffle;
  *  3. folds the delta into the stored view by group-key merge (sums add —
  *     the q54 algebra), dropping groups whose live row count reaches 0;
  *  4. publishes the view as the next [[Versioned]] snapshot (view tables
  *     are group-count-sized — snapshot-level publish is the right cost
  *     model there).
  *
  * Crash safety is the write-ahead-intent protocol, because "publish
  * landed, bookkeeping didn't" must NOT re-apply the delta (sums would
  * double-count — a replayed MERGE is idempotent, a replayed += is not):
  * the applied-source-version marker stores (srcVersion, viewVersion);
  * refresh first writes an INTENT (the srcVersion it is about to apply),
  * then publishes, then finalizes the marker. Recovery compares the
  * view's actual version against the marker's: if the view advanced, the
  * intent's interval IS applied — finalize and continue from there;
  * otherwise the intent is stale — ignore it. Every crash point lands in
  * exactly one of those two states, so each source interval folds in
  * exactly once.
  *
  * Nothing ever rescans the source: refresh cost is O(changed data +
  * view) — the difference between a maintainable dashboard and a nightly
  * full recompute at 100 TB. [[initialize]] is the bootstrap and the
  * spec's oracle — incremental == recompute after every DML mix.
  *
  * Contract: `keys` identify source rows (FileCow's own contract);
  * aggregates are the mergeable SUM/COUNT family (avg = sum/cnt at read
  * time; min/max are NOT maintainable under deletes without a rescan —
  * the standard IVM boundary, stated rather than hidden).
  */
object MaterializedAgg {

  /** The maintained row-count column (also the group liveness test). */
  val CountCol = "n_rows"

  private def markerPath(viewRoot: String) = Paths.get(viewRoot, "_applied")
  private def intentPath(viewRoot: String) = Paths.get(viewRoot, "_intent")

  /** (applied source version, view version it landed as); (0,0) if never
    * initialized. Recovers a crashed refresh's finalize step first. */
  def applied(viewRoot: String): (Long, Long) = {
    recover(viewRoot)
    readMarker(viewRoot)
  }

  private def readMarker(viewRoot: String): (Long, Long) =
    if (Files.exists(markerPath(viewRoot))) {
      val Array(s, v) = new String(Files.readAllBytes(markerPath(viewRoot)),
        StandardCharsets.UTF_8).trim.split(" ")
      (s.toLong, v.toLong)
    } else (0L, 0L)

  /** If a refresh published but crashed before finalizing, the view's real
    * version is ahead of the marker's — the intent interval IS in the
    * view: finalize it. A stale intent with no published version behind it
    * is discarded. */
  private def recover(viewRoot: String): Unit = {
    val (_, viewV) = readMarker(viewRoot)
    val actual = Versioned.currentVersion(viewRoot)
    if (actual > viewV && Files.exists(intentPath(viewRoot))) {
      val srcTo = new String(Files.readAllBytes(intentPath(viewRoot)),
        StandardCharsets.UTF_8).trim.toLong
      writeMarker(viewRoot, srcTo, actual)
    }
    Files.deleteIfExists(intentPath(viewRoot))
  }

  private def writeMarker(viewRoot: String, srcV: Long, viewV: Long): Unit = {
    Files.createDirectories(Paths.get(viewRoot))
    val tmp = markerPath(viewRoot).resolveSibling("_applied.tmp")
    Files.write(tmp, s"$srcV $viewV".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, markerPath(viewRoot), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def aggregate(rows: DataFrame, groupCols: Seq[String],
      sumCols: Seq[String]): DataFrame =
    rows.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as(CountCol),
        sumCols.map(c => sum(col(c)).as(s"sum_$c")): _*)

  /** Bootstrap: full aggregate of the source's CURRENT version → view v1.
    * Returns the source version the view now reflects. */
  def initialize(spark: SparkSession, srcRoot: String, viewRoot: String,
      groupCols: Seq[String], sumCols: Seq[String]): Long = {
    require(applied(viewRoot) == (0L, 0L), s"view already initialized at $viewRoot")
    val srcV = FileCow.visibleVersion(srcRoot)
    val viewV = Versioned.publish(
      aggregate(FileCow.readVersion(spark, srcRoot, srcV), groupCols, sumCols), viewRoot)
    writeMarker(viewRoot, srcV, viewV)
    srcV
  }

  /** Fold every source change since the last refresh into the view.
    * Returns (fromVersion, toVersion) applied; a no-op when current.
    * SINGLE refresher per view by contract (the view's own `publish`
    * single-writer contract) — the scheduled-maintenance shape; SOURCE
    * writers stay fully concurrent, that is the point of the CDF. */
  def refresh(spark: SparkSession, srcRoot: String, viewRoot: String,
      keys: Seq[String], groupCols: Seq[String], sumCols: Seq[String]): (Long, Long) = {
    val (from, _) = applied(viewRoot)
    require(from > 0L, s"view at $viewRoot was never initialized")
    val to = FileCow.visibleVersion(srcRoot)
    if (to == from) return (from, to)
    val feed = FileCow.changesBetween(spark, srcRoot, keys, from, to)
    foldFeed(spark, feed, viewRoot, groupCols, sumCols, srcTo = to)
    (from, to)
  }

  /** The ONE fold: signed contributions → delta-sized aggregate → group-key
    * merge into the stored view → intent-protected publish. Shared by
    * [[refresh]] (pull: feed computed from `changesBetween`) and the F21
    * streaming sink (push: feed arrives as a CDF micro-batch) so the
    * scheduled and the live view cannot drift on the algebra or on the
    * exactly-once protocol. An uninitialized view (applied == 0) folds its
    * first feed against the empty view — the streaming-genesis bootstrap. */
  private[graft] def foldFeed(spark: SparkSession, feed: DataFrame,
      viewRoot: String, groupCols: Seq[String], sumCols: Seq[String],
      srcTo: Long): Unit = {
    // signed contributions: one delta-sized aggregate
    val sign = when(col("_change_type").isin("insert", "update_post"), 1L).otherwise(-1L)
    val delta = feed.groupBy(groupCols.map(col): _*)
      .agg(sum(sign).as(CountCol),
        sumCols.map(c => sum(col(c) * sign).as(s"sum_$c")): _*)
    val stored =
      if (Versioned.currentVersion(viewRoot) > 0) Versioned.read(spark, viewRoot)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], delta.schema)
    val merged = stored.unionByName(delta)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col(CountCol)).as(CountCol),
        sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")): _*)
      .filter(col(CountCol) > 0) // groups whose last row was deleted vanish
    // write-ahead intent → publish → finalize (see scaladoc)
    val tmp = intentPath(viewRoot).resolveSibling("_intent.tmp")
    Files.createDirectories(Paths.get(viewRoot))
    Files.write(tmp, srcTo.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, intentPath(viewRoot), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    val viewV = Versioned.publish(merged.localCheckpoint(), viewRoot)
    writeMarker(viewRoot, srcTo, viewV)
    Files.deleteIfExists(intentPath(viewRoot))
  }

  /** The view relation (current snapshot). */
  def read(spark: SparkSession, viewRoot: String): DataFrame =
    Versioned.read(spark, viewRoot)
}
