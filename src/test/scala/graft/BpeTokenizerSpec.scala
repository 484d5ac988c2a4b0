package graft

import org.apache.spark.sql.functions._

import graft.functions.{BpeTokenizer, TextPrep}

/** tx23/tx24: the deterministic BPE tokenizer. Contracts:
  *
  *   1. TRAIN DETERMINISM — the same corpus trains to identical merge
  *      rules (the property that lets the shipped vocabulary be pinned);
  *   2. the PINNED ARTIFACT — retraining on the reference corpus (sf0.01)
  *      reproduces [[BpeTokenizer.Merges]] rule-for-rule;
  *   3. ENCODE == the rules, literally — the production encoder (repeated
  *      lowest-rank merge) equals a naive reference that applies every
  *      rule once in rank order, left-to-right (the equivalence the
  *      DuckDB nested-replace oracle rests on), on both in-vocabulary
  *      and UNSEEN words;
  *   4. ROUND-TRIP — tokens concatenate back to the cleaned text with
  *      spaces removed (BPE merges only ever concatenate, so decode is
  *      lossless by construction — pinned anyway).
  */
class BpeTokenizerSpec extends SparkSpec {
  import spark.implicits._

  test("training on the same corpus reproduces identical merge rules") {
    val docs = Tables.documents(spark, sfDir)
    val r1 = BpeTokenizer.train(spark, docs)
    val r2 = BpeTokenizer.train(spark, docs)
    assert(r1 == r2, "nondeterministic BPE training")
    assert(r1.nonEmpty && r1.size <= BpeTokenizer.NumMerges)
  }

  test("retraining on the reference corpus reproduces the pinned merges") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val rules = BpeTokenizer.train(spark, docs)
    assert(rules == BpeTokenizer.Merges,
      s"shipped merges drifted from the trainer:\n got  $rules\n want ${BpeTokenizer.Merges}")
  }

  /** The naive reference: every pinned rule once, in rank order, each pass
    * merging left-to-right non-overlapping — the literal nested-replace
    * semantics the oracle SQL executes. */
  private def referenceEncode(w: String): Seq[String] = {
    var syms = w.split("").filter(_.nonEmpty).toSeq
    BpeTokenizer.Merges.foreach { case (a, b) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += a + b; i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.toSeq
    }
    syms
  }

  test("the production encoder equals the in-order reference, unseen words included") {
    // every distinct word of the held-out corpus, plus words the training
    // corpus never saw (character fallback + partial merges)
    val corpus = Tables.documents(spark, sfDir)
      .select(explode(split(TextPrep.clean(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct().as[String].collect().toSeq
    val unseen = Seq("keyword", "tokenizer", "zzz", "a", "aaaa", "bpe",
      "streamline", "x9y", "partition", "databases")
    (corpus ++ unseen).foreach { w =>
      val got = BpeTokenizer.encodeWord(w).toSeq
      val want = referenceEncode(w)
      assert(got == want, s"encode('$w'): $got != reference $want")
    }
  }

  test("tokens round-trip: concatenation restores the cleaned text") {
    val docs = Tables.documents(spark, sfDir)
      .select(TextPrep.clean(col("text")).as("c"))
      .withColumn("joined", concat_ws("", BpeTokenizer.bpeTokens(col("c"))))
      .withColumn("squashed", regexp_replace(col("c"), " ", ""))
    assert(docs.filter(col("joined") =!= col("squashed")).isEmpty,
      "BPE decode must be lossless")
  }

  test("the distinct-word ceiling guards the driver collect") {
    val docs = Tables.documents(spark, sfDir)
    val e = intercept[IllegalArgumentException] {
      BpeTokenizer.train(spark, docs, maxVocabWords = 3L)
    }
    assert(e.getMessage.contains("ceiling"))
  }
}
