package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** G14: PAGED-INGEST LANDING — the offline re-expression of a cursor-paged
  * API pull feeding an incremental merge.
  *
  * Reference: dw2_wc_increment.py:152-189 — an initial request reads the
  * total from a response header, `page_max = ceil(total/100)`, then a
  * `while page_ct < page_max` loop fetches page by page and the increment
  * DataFrame is built once after the loop. That shape has three implicit
  * failure modes this component makes explicit and survivable:
  *
  *   - a fetch that dies mid-window loses the whole pull (no resume) — here
  *     every page attempt lands durably and [[missingPages]] is the exact
  *     retry worklist: resume refetches ONLY what never committed;
  *   - a retried page lands twice — here attempts are append-only and
  *     versioned, the assembler takes the latest COMMITTED attempt per page
  *     (per-page idempotence), and a record that drifted across a page
  *     boundary between attempts is deduplicated by key (latest page wins);
  *   - a fetch truncated mid-write looks like data — here the commit point
  *     is an atomic manifest-marker publish AFTER the page's bytes are
  *     written and checksummed (the G8 write-audit-publish discipline at
  *     page granularity), so a crash between data and marker leaves an
  *     uncommitted orphan the assembler never reads.
  *
  * Layout under the landing dir:
  * {{{
  *   data/page=[n]/attempt=[a]/  page bytes as parquet (partition columns!)
  *   manifest/page-[n]-attempt-[a].json  commit marker: n_rows + checksum
  * }}}
  *
  * Scale: a page is API-bounded (the reference's per_page=100), so a 31-day
  * window is thousands of pages, not millions — the manifest is a bounded
  * driver-side metadata pass (the adjudicated G9/G13 class). [[assemble]]
  * reads ONLY the winning attempts' files (explicit path list with a
  * basePath, so partition columns survive and losing attempts cost zero
  * IO), verifies count + checksum per page against the manifest in one
  * grouped aggregate, and dedupes by key with one window — everything else
  * is the increment-sized scan itself.
  */
object PagedIngest {

  /** The reference's `page_max = math.ceil(order_total/100)`. */
  def pageCount(totalRecords: Long, perPage: Int): Int =
    math.ceil(totalRecords.toDouble / perPage).toInt

  private def dataDir(dir: String, page: Int, attempt: Int): Path =
    Paths.get(dir, "data", s"page=$page", s"attempt=$attempt")

  private def markerPath(dir: String, page: Int, attempt: Int): Path =
    Paths.get(dir, "manifest", s"page-$page-attempt-$attempt.json")

  /** Order-independent checksum of the landed data columns (page/attempt
    * partition columns excluded, column order fixed by sorting names):
    * XOR of per-row xxhash64 — overflow-free under ANSI arithmetic, and
    * rows within a page are unique by construction (`fetch_seq`). */
  private def checksumExpr(names: Seq[String]): org.apache.spark.sql.Column =
    coalesce(expr(s"bit_xor(xxhash64(${names.sorted.mkString(", ")}))"), lit(0L))

  private def checksum(df: DataFrame): Long =
    df.agg(checksumExpr(df.columns.toSeq)).head().getLong(0)

  /** Land one fetched page durably. `page` must carry a `fetch_seq` column —
    * the record's position within the page as the API returned it (the
    * flatten loop's index in the reference) — so assembly can reproduce the
    * pull order without trusting any data column.
    *
    * Idempotent per (pageNo, attempt): a marker already present means this
    * exact fetch committed before and the call is a no-op; an orphan data
    * dir without a marker (a crashed previous try) is cleaned and rewritten.
    */
  def landPage(page: DataFrame, dir: String, pageNo: Int, attempt: Int): Unit = {
    require(page.columns.contains("fetch_seq"),
      "page must carry fetch_seq (position within the page as fetched)")
    val marker = markerPath(dir, pageNo, attempt)
    if (Files.exists(marker)) return // committed already — exact-retry no-op
    val data = dataDir(dir, pageNo, attempt)
    deleteTree(data) // crashed previous try: uncommitted bytes, safe to drop
    page.coalesce(1).write.mode(SaveMode.Overwrite).parquet(data.toString)
    // Audit the LANDED bytes (not the input plan), then publish the marker
    // atomically — the commit point. Crash before this line = orphan.
    val landed = page.sparkSession.read.parquet(data.toString)
    val (n, sum) = (landed.count(), checksum(landed))
    Files.createDirectories(marker.getParent)
    val tmp = marker.resolveSibling(marker.getFileName.toString + ".tmp")
    Files.write(tmp,
      s"""{"page_no": $pageNo, "attempt": $attempt, "n_rows": $n, "checksum": $sum}"""
        .getBytes("UTF-8"))
    Files.move(tmp, marker, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Committed fetch log: one (page_no, attempt, n_rows, checksum) per
    * marker. Driver-side bounded metadata pass. */
  def manifest(dir: String): Seq[(Int, Int, Long, Long)] = {
    val mdir = Paths.get(dir, "manifest")
    if (!Files.exists(mdir)) return Nil
    val P = """\{"page_no": (\d+), "attempt": (\d+), "n_rows": (\d+), "checksum": (-?\d+)\}""".r
    val out = Seq.newBuilder[(Int, Int, Long, Long)]
    Files.list(mdir).sorted().forEach { p =>
      if (p.getFileName.toString.endsWith(".json"))
        new String(Files.readAllBytes(p), "UTF-8").trim match {
          case P(pg, at, n, cs) => out += ((pg.toInt, at.toInt, n.toLong, cs.toLong))
          case other => throw new IllegalStateException(s"unparseable marker $p: $other")
        }
    }
    out.result()
  }

  /** Pages of 1..totalPages with no committed attempt — the resume/retry
    * worklist. Orphan data dirs (crashed fetches) do NOT count as landed. */
  def missingPages(dir: String, totalPages: Int): Seq[Int] = {
    val committed = manifest(dir).map(_._1).toSet
    (1 to totalPages).filterNot(committed)
  }

  /** End-to-end pull: the reference's `while page_ct < page_max` fetch loop
    * (dw2_wc_increment.py:152-189) with the HTTP client injected at the one
    * seam this sandbox cannot exercise — `fetchPage` is the
    * `requests.get(page=n)` call, everything around it is real and durable.
    *
    * Drives [[missingPages]] → fetch → [[landPage]] with bounded per-page
    * retries: a fetch (or landing) failure is retried up to `maxAttempts`
    * times with a fresh attempt number; a page still missing after that
    * fails the pull loudly, naming the page. Because the worklist comes from
    * [[missingPages]], a resumed pull (previous run crashed mid-window)
    * refetches ONLY what never committed, and the assembled result is
    * identical to one uninterrupted pull (per-page idempotence + latest-
    * attempt wins — spec-pinned against a flaky fetcher).
    *
    * Contract-violation errors (a page without `fetch_seq`) are NOT retried:
    * that is a caller bug, not transience.
    */
  def fetchAndLand(spark: SparkSession, dir: String, totalPages: Int,
      keyCol: String, fetchPage: Int => DataFrame, maxAttempts: Int = 3): DataFrame = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    // Land every page that will land before failing: a dead page must not
    // block the others from committing, so the NEXT run's missingPages
    // worklist is exactly the still-dead pages, nothing more.
    val failed = Seq.newBuilder[(Int, Throwable)]
    missingPages(dir, totalPages).foreach { pageNo =>
      var attempt = 1
      var landed = false
      var lastErr: Throwable = null
      while (!landed && attempt <= maxAttempts) {
        try {
          landPage(fetchPage(pageNo), dir, pageNo, attempt)
          landed = true
        } catch {
          case e: IllegalArgumentException => throw e // contract bug — no retry
          case scala.util.control.NonFatal(e) => lastErr = e; attempt += 1
        }
      }
      if (!landed) failed += ((pageNo, lastErr))
    }
    val dead = failed.result()
    if (dead.nonEmpty)
      throw new IllegalStateException(
        dead.map { case (p, _) => s"page $p failed after $maxAttempts attempts" }
          .mkString("; "), dead.head._2)
    assemble(spark, dir, totalPages, keyCol)
  }

  /** Assemble the exactly-once, pull-ordered increment from a complete
    * landing. Fails fast — naming the retry worklist — if any page never
    * committed; fails if a winning page's bytes disagree with its marker.
    *
    * Output = data columns + provenance (`page_no`, `fetch_seq`), one row
    * per distinct `keyCol` (a record fetched on two pages — pagination
    * drift between attempts — keeps its latest (page, attempt) instance),
    * ordered by (page_no, fetch_seq) = the order one uninterrupted pull
    * would have produced.
    */
  def assemble(spark: SparkSession, dir: String, totalPages: Int,
      keyCol: String): DataFrame = {
    val missing = missingPages(dir, totalPages)
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"landing incomplete — refetch pages ${missing.mkString(", ")}")
    val winners = manifest(dir)
      .filter { case (p, _, _, _) => p >= 1 && p <= totalPages }
      .groupBy(_._1).map { case (_, as) => as.maxBy(_._2) }.toSeq
    val winnerPaths = winners.map { case (p, a, _, _) => dataDir(dir, p, a).toString }
    val raw = spark.read.option("basePath", s"$dir/data").parquet(winnerPaths: _*)
      .withColumn("page_no", col("page").cast("int"))
    // One grouped pass: every winning page's landed bytes must still match
    // its commit marker (count and checksum) before any row is trusted.
    val dataCols = raw.columns.filterNot(Set("page", "attempt", "page_no")).toSeq
    val seen = raw.groupBy(col("page_no"))
      .agg(count(lit(1)).as("n"), checksumExpr(dataCols).as("cs"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    winners.foreach { case (p, a, n, cs) =>
      val (gotN, gotCs) = seen.getOrElse(p, (0L, 0L))
      if (gotN != n || gotCs != cs)
        throw new IllegalStateException(
          s"page $p attempt $a: landed bytes disagree with marker " +
            s"(rows $gotN vs $n, checksum $gotCs vs $cs)")
    }
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("page_no").desc, col("attempt").desc, col("fetch_seq").desc)
    raw.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk", "page", "attempt")
      .orderBy(col("page_no"), col("fetch_seq"))
  }

  private def deleteTree(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
}
