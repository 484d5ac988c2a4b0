package graft

import org.apache.spark.sql.functions._
import scala.util.Random

import graft.functions.{BloomFilters, BloomMightContainLong}
import org.apache.spark.sql.catalyst.expressions.Literal

/** dd18 (Bloom-prefiltered decontamination) contracts:
  *  1. no false negatives — every inserted key passes the sketch, so the
  *     prefilter → exact-verify pipeline is lossless by construction;
  *  2. frame equality — dd18's output equals dd09's bit-for-bit on real
  *     testdata (the property the shared oracle SQL rests on);
  *  3. the prefilter actually prunes — the candidate gram count admitted by
  *     the sketch is hit-rate-plus-fpp-sized, not corpus-sized (the 100 TB
  *     shuffle argument, asserted at test scale);
  *  4. the expression survives both eval paths (interpreted + codegen) and
  *     nulls.
  */
class BloomDecontamSpec extends SparkSpec {

  test("bloom filter admits every inserted key (no false negatives)") {
    val rnd = new Random(7)
    val keys = Seq.fill(5000)(rnd.nextLong())
    import spark.implicits._
    val df = keys.toDF("k")
    val bf = BloomFilters.buildLong(df, "k", keys.size.toLong, 0.01)
    keys.foreach { k => assert(bf.mightContainLong(k), s"false negative on $k") }
  }

  test("realized fpp on disjoint probes stays near the configured 1%") {
    val rnd = new Random(11)
    val inserted = Seq.fill(20000)(rnd.nextLong() | 1L) // odd keys
    import spark.implicits._
    val bf = BloomFilters.buildLong(inserted.toDF("k"), "k", inserted.size.toLong, 0.01)
    val probes = Seq.fill(20000)(rnd.nextLong() & ~1L) // even keys — disjoint
    val fp = probes.count(bf.mightContainLong)
    assert(fp < probes.size * 0.03, s"fpp too high: $fp/${probes.size}")
  }

  test("dd18 output equals dd09 output bit-for-bit on testdata") {
    val a = graft.operators.Dedup.dd09.build(spark, sfDir)
    val b = graft.operators.Dedup.dd18.build(spark, sfDir)
    assert(a.schema.fieldNames.toSeq == b.schema.fieldNames.toSeq)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "bloom-prefiltered decontamination diverged from the exact plan")
    assert(a.count() > 0, "vacuous equality: dd09 returned zero rows")
  }

  test("prefilter admits hits plus ~fpp, not the corpus") {
    import spark.implicits._
    val rnd = new Random(13)
    val evalGrams = Seq.fill(2000)(rnd.nextLong() | 1L)
    val trainHits = Seq.fill(100)(evalGrams(rnd.nextInt(evalGrams.size)))
    val trainMiss = Seq.fill(50000)(rnd.nextLong() & ~1L)
    val train = (trainHits ++ trainMiss).toDF("gh")
    val bf = BloomFilters.buildLong(evalGrams.toDF("gh"), "gh", 2000L, 0.01)
    val admitted = train.filter(BloomFilters.mightContainLong(col("gh"), bf)).count()
    // 100 true hits + ≤3% of 50k misses; far below the 50100-row corpus.
    assert(admitted >= 100, s"dropped true hits: $admitted")
    assert(admitted < 100 + 50000 * 0.03, s"prefilter not pruning: $admitted of ${train.count()}")
  }

  test("expression: interpreted eval matches sketch; null in -> null out") {
    import spark.implicits._
    val bf = BloomFilters.buildLong(Seq(42L, 99L).toDF("k"), "k", 2L, 0.01)
    val bytes = {
      val out = new java.io.ByteArrayOutputStream()
      bf.writeTo(out)
      out.toByteArray
    }
    val e42 = BloomMightContainLong(Literal(42L), bytes)
    assert(e42.eval(null) == true)
    val eNull = BloomMightContainLong(
      Literal.create(null, org.apache.spark.sql.types.LongType), bytes)
    assert(eNull.eval(null) == null)
  }

  test("codegen path: filter works inside whole-stage codegen over a real scan") {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"))
    import spark.implicits._
    val wanted = docs.limit(5).as[Long].collect().toSeq
    val bf = BloomFilters.buildLong(wanted.toDF("doc_id"), "doc_id", wanted.size.toLong, 0.001)
    val admitted = docs.filter(BloomFilters.mightContainLong(col("doc_id"), bf))
      .as[Long].collect().toSet
    assert(wanted.toSet.subsetOf(admitted), "codegen filter dropped an inserted key")
    assert(admitted.size < docs.count(), "filter admitted everything")
  }
}
