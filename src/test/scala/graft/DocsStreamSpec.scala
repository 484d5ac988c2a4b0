package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{Doc, DocsStream, DupMatch}

/** F6 streaming near-dup detection: emitted matches must equal a driver-side
  * reference computing the same MinHash+LSH math over the same arrival
  * order — including matches against state built in EARLIER micro-batches. */
class DocsStreamSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  // ---- independent reference implementation (pure Scala) -----------------
  private val M = 1000000007L
  private def clean(s: String): String =
    s.toLowerCase.replaceAll("[^a-z0-9\\s]", " ").replaceAll("\\s+", " ").trim
  private def hash(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % M)
  private def shingles(c: String): Seq[String] = {
    val t = c.split(" ", -1)
    if (t.length < 3) Seq(c)
    else (0 to t.length - 3).map(i => t.slice(i, i + 3).mkString(" ")).distinct
  }
  private def sig(text: String): IndexedSeq[Long] = {
    val hs = shingles(clean(text)).map(hash)
    graft.functions.TextPrep.minhashPerms.map { case (a, b) =>
      hs.map(h => (a * h + b) % M).min
    }.toIndexedSeq
  }
  private def refMatches(docs: Seq[Doc]): Set[DupMatch] = {
    val sigs = docs.map(d => d -> sig(d.text))
    val ordered = sigs.sortBy { case (d, _) => (d.ts.getTime, d.doc_id) }
    val out = Set.newBuilder[DupMatch]
    for (j <- ordered.indices; i <- 0 until j) {
      val (dj, sj) = ordered(j)
      val (di, si) = ordered(i)
      val agree = (0 until 8).count(k => sj(k) == si(k))
      val bands = (0 until 4).filter(b =>
        sj(2 * b) == si(2 * b) && sj(2 * b + 1) == si(2 * b + 1))
      if (agree >= 4 && bands.nonEmpty)
        out += DupMatch(dj.doc_id, di.doc_id, bands.head, agree / 8.0)
    }
    out.result()
  }
  // -----------------------------------------------------------------------

  test("F6 matches == reference, with cross-batch bucket state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima mike november oscar papa quebec romeo sierra tango"
    val d1 = Doc(1L, ts(1), base)
    val d2 = Doc(2L, ts(2), base) // exact duplicate
    val d3 = Doc(3L, ts(12), base.replace("kilo", "zulu")) // near-dup, later batch
    val d4 = Doc(4L, ts(13), "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen seventeen")
    val all = Seq(d1, d2, d3, d4)

    val want = refMatches(all)
    // The planted corpus must actually exercise the detector: the exact dup
    // matches d1, and the near-dup matches at least d1 cross-batch.
    assert(want.exists(m => m.doc_id == 2L && m.dup_of == 1L && m.est_sim == 1.0))
    assert(want.exists(m => m.doc_id == 3L && m.dup_of == 1L))
    assert(!want.exists(m => m.doc_id == 4L), "the unique doc must not match")

    val input = MemoryStream[Doc]
    val query = DocsStream.nearDupMatches(input.toDS())
      .writeStream.format("memory").queryName("f6_neardup")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Seq(d1, d2))
      query.processAllAvailable()
      // d3 must match state from batch 1; d1 is REDELIVERED (at-least-once
      // source) and must produce no self-match and no duplicate emissions.
      input.addData(Seq(d3, d4, d1))
      query.processAllAvailable()
    } finally query.stop()

    val got = spark.table("f6_neardup").as[DupMatch].collect().toSet
    assert(got == want, s"stream=$got\nreference=$want")
  }

  test("F6 emits exactly one row per colliding pair (first-match band)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val text = "papa quebec romeo sierra tango uniform victor whiskey xray " +
      "yankee zulu alpha bravo charlie delta echo"
    val docs = Seq(Doc(10L, ts(1), text), Doc(11L, ts(2), text))
    val input = MemoryStream[Doc]
    val query = DocsStream.nearDupMatches(input.toDS())
      .writeStream.format("memory").queryName("f6_once")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(docs)
      query.processAllAvailable()
    } finally query.stop()

    val got = spark.table("f6_once").as[DupMatch].collect().toSeq
    // Identical docs collide in ALL 4 bands; first-match keeps band 0 only.
    assert(got == Seq(DupMatch(11L, 10L, 0, 1.0)))
  }
}
