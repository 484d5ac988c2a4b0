package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import scala.util.Random

/** dd19 (exact repeated-span detection) pinned against an INDEPENDENT
  * token-level reference: a maximal run of m ≥ minSpan equal consecutive
  * tokens on a pair's diagonal produces exactly one dd19 row with
  * span_tokens = m (m − W + 1 matched windows), so the reference below —
  * which never builds windows or hashes anything, it just walks the token
  * equality diagonals of each doc pair — must agree row-for-row on corpora
  * with no df-hot windows. Plus targeted contracts: offsets, multiple
  * spans per pair, sub-threshold rejection, and the df-cap's bound on
  * boilerplate fan-out.
  */
class RepeatedSpansSpec extends SparkSpec {

  private val W = 10
  private val MinSpan = 20

  /** Write a corpus as a documents.parquet the operator can read. */
  private def writeDocs(docs: Seq[(Long, String)]): String = {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-dd19").toString
    docs.toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("spec"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** Independent reference: maximal equal-token diagonal runs ≥ MinSpan. */
  private def refSpans(docs: Seq[(Long, Array[String])]): Set[(Long, Long, Long, Long, Long)] = {
    val out = scala.collection.mutable.Set[(Long, Long, Long, Long, Long)]()
    for {
      (ida, ta) <- docs; (idb, tb) <- docs if ida < idb
      diag <- -(ta.length - 1) to (tb.length - 1)
    } {
      // walk the diagonal pb = pa + diag
      var pa = math.max(0, -diag)
      var run = 0
      var startA = 0
      def emit(): Unit =
        if (run >= MinSpan)
          out += ((ida, idb, startA.toLong, (startA + diag).toLong, run.toLong))
      while (pa < ta.length && pa + diag < tb.length) {
        if (ta(pa) == tb(pa + diag)) { if (run == 0) startA = pa; run += 1 }
        else { emit(); run = 0 }
        pa += 1
      }
      emit()
    }
    out.toSet
  }

  private def runDd19(dir: String): Set[(Long, Long, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    graft.operators.Dedup.dd19.build(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
  }

  test("planted 30-token overlap at different offsets found with exact bounds") {
    val rnd = new Random(3)
    def tok(i: Int) = s"w${rnd.nextInt(1 << 24)}x$i"
    val shared = (0 until 30).map(i => s"shared$i")
    val a = (0 until 7).map(tok) ++ shared ++ (40 until 55).map(tok)
    val b = (100 until 118).map(tok) ++ shared ++ (160 until 170).map(tok)
    val dir = writeDocs(Seq(1L -> a.mkString(" "), 2L -> b.mkString(" ")))
    assert(runDd19(dir) == Set((1L, 2L, 7L, 18L, 30L)))
  }

  test("two disjoint spans between one pair yield two rows; 15-token overlap rejected") {
    val rnd = new Random(5)
    def tok(i: Int) = s"v${rnd.nextInt(1 << 24)}y$i"
    val s1 = (0 until 22).map(i => s"one$i")
    val s2 = (0 until 25).map(i => s"two$i")
    val sub = (0 until 15).map(i => s"sub$i") // below MinSpan
    val a = s1 ++ (0 until 5).map(tok) ++ s2 ++ (10 until 15).map(tok) ++ sub
    val b = (20 until 26).map(tok) ++ s1 ++ (30 until 34).map(tok) ++ s2 ++
      (40 until 52).map(tok) ++ sub
    val dir = writeDocs(Seq(10L -> a.mkString(" "), 11L -> b.mkString(" ")))
    val got = runDd19(dir)
    assert(got == Set(
      (10L, 11L, 0L, 6L, 22L),
      (10L, 11L, 27L, 32L, 25L)))
  }

  test("randomized corpora: dd19 == token-level diagonal reference") {
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val vocabSize = 1 << 20
      def freshDoc(n: Int) = Array.fill(n)(s"t${rnd.nextInt(vocabSize)}")
      val base = (0 until 12).map(i => (i.toLong, freshDoc(40 + rnd.nextInt(40))))
      // plant overlaps: copy a random slice of one doc into another
      val docs = base.map { case (id, t) =>
        if (id % 3 == 2 && id > 0) {
          val (srcId, src) = base(rnd.nextInt(id.toInt))
          val len = MinSpan + rnd.nextInt(15)
          if (src.length > len) {
            val from = rnd.nextInt(src.length - len)
            val at = rnd.nextInt(math.max(1, t.length - 1))
            (id, (t.take(at) ++ src.slice(from, from + len) ++ t.drop(at)).toArray)
          } else (id, t)
        } else (id, t)
      }
      val dir = writeDocs(docs.map { case (id, t) => id -> t.mkString(" ") })
      val expected = refSpans(docs)
      val got = runDd19(dir)
      assert(got == expected,
        s"seed=$seed diff: extra=${got -- expected} missing=${expected -- got}")
      assert(expected.nonEmpty, s"seed=$seed planted no spans — vacuous")
    }
  }

  test("dd20 trims later occurrences, unions overlapping masks, keeps first") {
    // Y (latest id) shares [0,30) with A and [20,50) with B: overlapping
    // masks must UNION to [0,50) — 50 removed, not 60 — and the first
    // occurrences (A, B in full) survive untouched. A∩B is 10 tokens,
    // below the span threshold, so no spurious pair.
    val y = (0 until 60).map(i => s"y$i")
    val a = y.slice(0, 30)
    val b = y.slice(20, 50)
    val dir = writeDocs(Seq(1L -> a.mkString(" "), 2L -> b.mkString(" "), 3L -> y.mkString(" ")))
    val s = spark
    import s.implicits._
    val got = graft.operators.Dedup.dd20.build(spark, dir)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 30L, 0L, a.mkString(" "))))  // first occurrence intact
    assert(got(2L) == ((2L, 30L, 0L, b.mkString(" "))))  // 10-token overlap: untouched
    assert(got(3L) == ((3L, 60L, 50L, y.slice(50, 60).mkString(" "))))
  }

  test("dd20 exact-dup later copy trims to empty; token conservation holds") {
    val rnd = new Random(17)
    val base = (0 until 40).map(i => s"b$i")
    val other = (0 until 35).map(i => s"o${rnd.nextInt(1 << 20)}x$i")
    val dir = writeDocs(Seq(5L -> base.mkString(" "), 6L -> other.mkString(" "),
      7L -> base.mkString(" "))) // 7 is a byte-identical later copy of 5
    val s = spark
    import s.implicits._
    val rows = graft.operators.Dedup.dd20.build(spark, dir)
      .as[(Long, Long, Long, String)].collect()
    val byId = rows.map(r => r._1 -> r).toMap
    assert(byId(7L)._3 == 40L && byId(7L)._4 == "")  // fully covered → empty
    assert(byId(5L)._4 == base.mkString(" "))        // keeper intact
    assert(byId(6L)._3 == 0L)
    // conservation: kept tokens + removed == original, every doc
    rows.foreach { case (id, nTok, nRem, text) =>
      val kept = if (text.isEmpty) 0 else text.split(" ").length
      assert(kept + nRem == nTok, s"doc $id: $kept + $nRem != $nTok")
    }
  }

  test("df-cap bounds boilerplate: a window shared by 20 docs yields no spans") {
    // 20 docs, each = unique prefix ++ the SAME 25 boilerplate tokens:
    // every boilerplate window has df = 20 > 16, so all are capped and no
    // span may be emitted — the fan-out bound, not a recall claim (the
    // drop is the documented cost of the cap, as in dd13).
    val rnd = new Random(9)
    val boiler = (0 until 25).map(i => s"boiler$i")
    val docs = (0 until 20).map { i =>
      i.toLong -> ((0 until 15).map(j => s"u${i}_${j}_${rnd.nextInt(1 << 20)}") ++ boiler).mkString(" ")
    }
    val dir = writeDocs(docs)
    assert(runDd19(dir).isEmpty)
  }
}
