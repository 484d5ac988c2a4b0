package graft

import org.apache.spark.sql.functions._
import scala.util.Random

/** Recall proof for dd03's pigeonhole blocking: on fingerprint corpora with
  * PLANTED hamming<=4 pairs, the 5-block candidate generation must recover
  * exactly the brute-force O(n²) hamming<=4 pair set — the pigeonhole bound
  * (4 differing bits cannot touch all 5 disjoint blocks) guarantees no
  * qualifying pair is ever dropped.
  */
class SimhashRecallSpec extends SparkSpec {

  /** n random 60-bit fingerprints plus planted near-dups: for every third
    * fingerprint, a copy with k in 1..4 RANDOM bit positions flipped —
    * including high bits, the case the old single-prefix blocking missed. */
  private def corpus(seed: Int, n: Int): Seq[(Long, Long)] = {
    val rnd = new Random(seed)
    val bases = Seq.fill(n)(rnd.nextLong() & ((1L << 60) - 1))
    val planted = bases.zipWithIndex.collect { case (fp, i) if i % 3 == 0 =>
      val k = 1 + rnd.nextInt(4)
      val flipped = (1 to k).foldLeft(fp)((f, _) => f ^ (1L << rnd.nextInt(60)))
      flipped
    }
    (bases ++ planted).zipWithIndex.map { case (fp, i) => (i.toLong, fp) }
  }

  for (seed <- Seq(11, 12, 13)) {
    test(s"dd03 pigeonhole blocking == brute-force hamming<=4 (seed $seed)") {
      val s = spark
      import s.implicits._
      val fp = corpus(seed, 90).toDF("doc_id", "fingerprint")

      val fast = operators.Dedup.simhashPairs(fp)
        .select("id_a", "id_b", "hamming")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq.sorted

      val brute = fp.select(col("doc_id").as("id_a"), col("fingerprint").as("fp_a"))
        .crossJoin(fp.select(col("doc_id").as("id_b"), col("fingerprint").as("fp_b")))
        .filter(col("id_a") < col("id_b"))
        .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long"))
        .filter(col("hamming") <= 4)
        .select("id_a", "id_b", "hamming")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq.sorted

      assert(brute.nonEmpty, "corpus must plant at least one hamming<=4 pair")
      // Pairs differing in a HIGH bit must be present — the exact case the
      // old `fingerprint // 16` single-block scheme could never recall.
      val fps = fp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val highBitPair = brute.exists { case (a, b, _) =>
        ((fps(a) ^ fps(b)) >> 48) != 0L
      }
      assert(highBitPair, "corpus must include a pair differing in a high bit")
      assert(fast == brute)
    }
  }
}
