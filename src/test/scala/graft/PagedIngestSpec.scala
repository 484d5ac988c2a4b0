package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.PagedIngest

/** G14: paged-ingest landing — a replayed landing with out-of-order pages,
  * duplicate attempts, a truncated (uncommitted) fetch, and a record that
  * drifted across a page boundary must assemble to EXACTLY the rows and
  * order of one uninterrupted pull, and the failure path must name the
  * retry worklist rather than ship a partial increment.
  */
class PagedIngestSpec extends SparkSpec {

  private val perPage = 100

  /** The "API": the recent-orders window in pull order, pre-sliced into
    * pages with per-page fetch positions — what the reference's while-loop
    * sees page by page. */
  private lazy val pull: DataFrame = {
    val w = Window.orderBy(col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1997-06-01"))
      .withColumn("__pos", row_number().over(w) - 1)
      .withColumn("page_no", (col("__pos") / perPage).cast("int") + 1)
      .withColumn("fetch_seq", (col("__pos") % perPage).cast("int"))
      .drop("__pos")
      .localCheckpoint()
  }

  private def page(n: Int): DataFrame =
    pull.filter(col("page_no") === n).drop("page_no")

  test("G14 chaos landing assembles to exactly the uninterrupted pull") {
    val dir = Files.createTempDirectory("graft-paged").toString
    val total = pull.count()
    val nPages = PagedIngest.pageCount(total, perPage)
    assert(nPages >= 4, s"window too small for the scenario: $nPages pages")

    // land out of order; page 2 fetched twice (retry after a timeout)
    ((1 to nPages).reverse.filterNot(_ == 3)).foreach { n =>
      PagedIngest.landPage(page(n), dir, n, attempt = 1)
    }
    PagedIngest.landPage(page(2), dir, 2, attempt = 2)
    // page 3's fetch died mid-write: bytes on disk, NO commit marker
    page(3).limit(40).coalesce(1).write
      .parquet(Paths.get(dir, "data", "page=3", "attempt=1").toString)

    // the truncated page is invisible: it IS the retry worklist
    assert(PagedIngest.missingPages(dir, nPages) == Seq(3))
    val ex = intercept[IllegalStateException] {
      PagedIngest.assemble(spark, dir, nPages, "o_orderkey")
    }
    assert(ex.getMessage.contains("refetch pages 3"))

    // resume: refetch ONLY page 3 — as attempt 2, with one record that
    // drifted in from page 4 (the API shifted between fetches)
    val drifted = page(4).orderBy("fetch_seq").limit(1)
      .withColumn("fetch_seq", lit(perPage - 1) + 1) // appended past the page
    PagedIngest.landPage(page(3).unionByName(drifted), dir, 3, attempt = 2)
    assert(PagedIngest.missingPages(dir, nPages).isEmpty)

    val got = PagedIngest.assemble(spark, dir, nPages, "o_orderkey")
    // exactly-once: the drifted record appears ONCE (page 4's instance wins)
    assert(got.count() == total)
    assert(got.groupBy("o_orderkey").count().filter(col("count") > 1).isEmpty)
    // row set == the clean pull's
    val dataCols = got.columns.filterNot(Set("page_no", "fetch_seq")).map(col).toSeq
    assert(got.select(dataCols: _*).exceptAll(pull.select(dataCols: _*)).isEmpty)
    assert(pull.select(dataCols: _*).exceptAll(got.select(dataCols: _*)).isEmpty)
    // ordered: collected (page_no, fetch_seq) is the pull order, keys sorted
    val keys = got.select("o_orderkey").collect().map(_.getLong(0))
    assert(keys.sameElements(keys.sorted), "assembly must reproduce pull order")
  }

  test("G14 exact retry of a committed page is a no-op (idempotent landing)") {
    val dir = Files.createTempDirectory("graft-paged-idem").toString
    PagedIngest.landPage(page(1), dir, 1, attempt = 1)
    val before = PagedIngest.manifest(dir)
    PagedIngest.landPage(page(1), dir, 1, attempt = 1) // replayed fetch
    assert(PagedIngest.manifest(dir) == before)
    val got = PagedIngest.assemble(spark, dir, 1, "o_orderkey")
    assert(got.count() == page(1).count())
  }

  test("G14 corrupted committed bytes are caught by the marker checksum") {
    val dir = Files.createTempDirectory("graft-paged-corrupt").toString
    PagedIngest.landPage(page(1), dir, 1, attempt = 1)
    // tamper: rewrite the committed data dir with one row missing
    val data = Paths.get(dir, "data", "page=1", "attempt=1")
    val kept = spark.read.parquet(data.toString).filter(col("fetch_seq") =!= 0)
      .localCheckpoint() // read fully before overwriting the source files
    kept.coalesce(1).write.mode("overwrite").parquet(data.toString)
    val ex = intercept[IllegalStateException] {
      PagedIngest.assemble(spark, dir, 1, "o_orderkey")
    }
    assert(ex.getMessage.contains("disagree with marker"))
  }

  test("G14 fetchAndLand with a flaky fetcher assembles == one clean pull") {
    val dir = Files.createTempDirectory("graft-paged-fetch").toString
    val total = pull.count()
    val nPages = PagedIngest.pageCount(total, perPage)
    // the injected "HTTP client": page 3 times out twice, then succeeds
    val calls = scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)
    def flaky(n: Int): DataFrame = {
      calls(n) += 1
      if (n == 3 && calls(n) <= 2) throw new RuntimeException(s"socket timeout on page $n")
      page(n)
    }
    val got = PagedIngest.fetchAndLand(spark, dir, nPages, "o_orderkey", flaky, maxAttempts = 3)
    assert(calls(3) == 3, s"page 3 must be fetched 3 times, got ${calls(3)}")
    assert((1 to nPages).filterNot(_ == 3).forall(calls(_) == 1),
      "healthy pages must be fetched exactly once")
    assert(got.count() == total)
    val dataCols = got.columns.filterNot(Set("page_no", "fetch_seq")).map(col).toSeq
    assert(got.select(dataCols: _*).exceptAll(pull.select(dataCols: _*)).isEmpty)
    assert(pull.select(dataCols: _*).exceptAll(got.select(dataCols: _*)).isEmpty)
    // resume is a no-op: everything committed, the fetcher is never called
    val got2 = PagedIngest.fetchAndLand(spark, dir, nPages, "o_orderkey",
      n => throw new AssertionError(s"unexpected refetch of page $n"))
    assert(got2.count() == total)
  }

  test("G14 fetchAndLand fails loudly when a page exhausts its attempts") {
    val dir = Files.createTempDirectory("graft-paged-dead").toString
    val nPages = PagedIngest.pageCount(pull.count(), perPage)
    def dead(n: Int): DataFrame =
      if (n == 2) throw new RuntimeException("connection refused") else page(n)
    val ex = intercept[IllegalStateException] {
      PagedIngest.fetchAndLand(spark, dir, nPages, "o_orderkey", dead, maxAttempts = 2)
    }
    assert(ex.getMessage.contains("page 2 failed after 2 attempts"))
    assert(ex.getCause.getMessage.contains("connection refused"))
    // the healthy pages DID land durably — the resume worklist is page 2 only
    assert(PagedIngest.missingPages(dir, nPages) == Seq(2))
  }

  test("G14 assembled increment drives the q06-shape merge") {
    // the landing's output IS the `inc` side of the incremental merge:
    // base rows not in the increment survive, increment rows replace.
    val dir = Files.createTempDirectory("graft-paged-merge").toString
    val nPages = PagedIngest.pageCount(pull.count(), perPage)
    (1 to nPages).foreach(n => PagedIngest.landPage(page(n), dir, n, 1))
    val inc = PagedIngest.assemble(spark, dir, nPages, "o_orderkey")
      .drop("page_no", "fetch_seq")
    val base = Tables.orders(spark, sfDir)
    val merged = base.join(inc.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
      .unionByName(inc)
    assert(merged.count() == base.count()) // pure upsert of existing keys
    assert(merged.groupBy("o_orderkey").count().filter(col("count") > 1).isEmpty)
  }
}
