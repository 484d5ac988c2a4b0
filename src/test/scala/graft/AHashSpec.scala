package graft

import org.apache.spark.sql.functions._
import scala.util.Random

/** Properties of the AHash64 perceptual fingerprint (mm06) and its
  * pigeonhole pair retrieval. The DuckDB oracle pins all 64×N fingerprint
  * bits at sf0.01; these tests pin the CONTRACT: declarative equivalence,
  * brightness-shift invariance, and planted-near-dup retrieval.
  */
class AHashSpec extends SparkSpec {

  private def reference(bytes: Array[Byte]): Array[Long] = {
    // independent spelling of the block-mean comparison
    val n = bytes.length.toLong
    val sums = (0 until 64).map { b =>
      val (lo, hi) = ((b * n / 64).toInt, ((b + 1) * n / 64).toInt)
      bytes.slice(lo, hi).map(x => (x & 0xff).toLong).sum
    }
    val total = sums.sum
    val pieces = new Array[Long](4)
    for (b <- 0 until 64) {
      val nb = (b + 1) * n / 64 - b * n / 64
      if (sums(b) * n > total * nb) pieces(b / 16) |= (1L << (b % 16))
    }
    pieces
  }

  private def pieces(bytes: Array[Byte]): Array[Long] =
    functions.AHash64.compute(bytes).toLongArray()

  test("ahash64 equals the declarative block-mean composition on random payloads") {
    val rnd = new Random(7)
    for (_ <- 1 to 200) {
      val n = 64 + rnd.nextInt(4000)
      val b = Array.fill(n)(rnd.nextInt(256).toByte)
      assert(pieces(b).toSeq == reference(b).toSeq)
    }
  }

  test("ahash64 is invariant under uniform brightness shift (no clipping)") {
    val rnd = new Random(11)
    for (_ <- 1 to 100) {
      val n = 64 + rnd.nextInt(2000)
      val base = Array.fill(n)(rnd.nextInt(200).toByte) // headroom for +55
      val c = 1 + rnd.nextInt(55)
      val shifted = base.map(x => ((x & 0xff) + c).toByte)
      assert(pieces(base).toSeq == pieces(shifted).toSeq)
    }
  }

  test("mm06 emits one verified fingerprint per document, hex consistent with pieces") {
    val fp = multimodal.Multimodal.mm06.build(spark, sfDir).cache()
    assert(fp.count() == Tables.documents(spark, sfDir).count())
    val rehex = fp.withColumn("h2",
      format_string("%04x%04x%04x%04x", col("p3"), col("p2"), col("p1"), col("p0")))
    assert(rehex.filter(col("phash") =!= col("h2")).isEmpty)
    fp.unpersist()
  }

  test("phashPairs retrieves exactly the brute-force hamming<=3 pairs on planted payloads") {
    val rnd = new Random(23)
    val base = Array.fill(2048)(rnd.nextInt(200).toByte)
    val bright = base.map(x => ((x & 0xff) + 30).toByte) // hamming 0 vs base
    val edited = base.clone() // a burst inside one cell: few bits move
    for (i <- 100 until 116) edited(i) = ((edited(i) & 0xff) ^ 0x7f).toByte
    val others = (0 until 20).map(_ => Array.fill(2048)(rnd.nextInt(200).toByte))
    val all = (Seq(base, bright, edited) ++ others).zipWithIndex
      .map { case (b, i) => (i.toLong, b) }
    import spark.implicits._
    val fp = all.toDF("doc_id", "payload")
      .select(col("doc_id"), functions.AHash64.ahash64(col("payload")).as("ps"))
      .select(col("doc_id"),
        element_at(col("ps"), 1).as("p0"), element_at(col("ps"), 2).as("p1"),
        element_at(col("ps"), 3).as("p2"), element_at(col("ps"), 4).as("p3"))
      .cache()
    val got = multimodal.Multimodal.phashPairs(fp)
      .select("id_a", "id_b", "hamming")
    // brute force over the 23 fingerprints
    val local = fp.collect().map(r =>
      (r.getLong(0), Seq(1, 2, 3, 4).map(i => r.getLong(i)))).toSeq
    val brute = for {
      (ia, pa) <- local; (ib, pb) <- local if ia < ib
      h = pa.zip(pb).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      if h <= 3
    } yield (ia, ib, h.toLong)
    val gotSet = got.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotSet == brute.toSet)
    // the planted brightness twin is in, at hamming 0
    assert(gotSet.contains((0L, 1L, 0L)))
    fp.unpersist()
  }
}
