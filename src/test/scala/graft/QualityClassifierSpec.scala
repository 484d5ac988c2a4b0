package graft

import org.apache.spark.sql.functions._

import graft.functions.QualityClassifier

/** tx21: the trained quality classifier (CCNet/GPT-3-style classifier
  * filter). Three contracts:
  *
  *   1. RETRAIN DETERMINISM — the same corpus trains to bit-identical
  *      coefficients (single-partition, key-sorted gradient order), the
  *      reproducibility property that lets the shipped model be pinned
  *      constants at all;
  *   2. the shipped fixed-coefficient model AGREES with the tx08 gate it
  *      was distilled from on a corpus it never saw (the spec's sf0.001,
  *      trained on sf0.01) — a smooth 3-feature sigmoid cannot reproduce
  *      an OR of sharp thresholds exactly, but it must stay close;
  *   3. the decision column is exactly `margin >= 0` — the oracle-shared
  *      arithmetic, not a second scoring path.
  */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("retraining on the same corpus bit-reproduces the coefficients") {
    val docs = Tables.documents(spark, sfDir)
    val (b1, w1) = QualityClassifier.train(spark, docs)
    val (b2, w2) = QualityClassifier.train(spark, docs)
    assert(b1 == b2 && w1 == w2,
      s"nondeterministic training: ($b1, $w1) vs ($b2, $w2)")
    assert(w1.size == 3 && w1.forall(x => !x.isNaN && !x.isInfinite))
  }

  test("over-ceiling corpora train on a deterministic hash sample") {
    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    val cap = 100L
    assert(n > cap, s"spec premise: corpus ($n) must exceed the cap ($cap)")
    // deterministic under the cap: two capped trains bit-agree
    val (b1, w1) = QualityClassifier.train(spark, docs, cap)
    val (b2, w2) = QualityClassifier.train(spark, docs, cap)
    assert(b1 == b2 && w1 == w2,
      s"nondeterministic capped training: ($b1, $w1) vs ($b2, $w2)")
    // the cap really trips, and on exactly the documented hash sample:
    // training the pre-filtered frame (under the default ceiling, so no
    // second resample) reproduces the capped coefficients bit-for-bit
    val rateBp = math.max(1L, cap * 10000L / n)
    val kept = docs.filter(graft.functions.TextPrep.charHash(
      concat(lit("qct:"), col("doc_id").cast("string"))) % 10000L < rateBp)
    val keptN = kept.count()
    assert(keptN > 0L && keptN < n,
      s"hash sample should be a strict non-empty subset, got $keptN of $n")
    val (b3, w3) = QualityClassifier.train(spark, kept)
    assert(b1 == b3 && w1 == w3,
      s"capped train is not the hash-sample train: ($b1, $w1) vs ($b3, $w3)")
  }

  test("shipped model agrees with the gate on a held-out corpus") {
    val scored = QualityClassifier.tx21.build(spark, sfDir)
    val labeled = QualityClassifier.features(Tables.documents(spark, sfDir))
      .select(col("doc_id"), col("label"))
    val j = scored.join(labeled, "doc_id").cache()
    val n = j.count()
    val agree = j.filter((col("pred") && col("label") === 1.0) ||
      (!col("pred") && col("label") === 0.0)).count()
    assert(n == 500L)
    assert(agree.toDouble / n >= 0.8,
      s"shipped model agreement ${agree.toDouble / n} below 0.8")
    j.unpersist()
  }

  test("pred is exactly margin >= 0; margin uses the pinned coefficients") {
    val scored = QualityClassifier.tx21.build(spark, sfDir).cache()
    assert(scored.filter(col("pred") =!= (col("margin") >= 0.0)).isEmpty)
    // one row recomputed by hand against the pinned constants
    val r = scored.orderBy("doc_id").limit(1)
      .select("alpha_ratio", "stop_ratio", "tok_sat", "margin")
      .as[(Double, Double, Double, Double)].head()
    val expect = BigDecimal(QualityClassifier.Intercept
      + QualityClassifier.WAlpha * r._1 + QualityClassifier.WStop * r._2
      + QualityClassifier.WSat * r._3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r._4 - expect) < 1e-9, s"margin ${r._4} vs $expect")
    scored.unpersist()
  }
}
