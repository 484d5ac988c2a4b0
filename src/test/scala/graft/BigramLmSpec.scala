package graft

import org.apache.spark.sql.functions._

import graft.functions.BigramLm

/** tx22: the interpolated bigram LM scored by the operator must equal an
  * INDEPENDENT plain-Scala reimplementation (driver-side maps over the
  * sf0.001 corpus) — same λ, same counts, same mean — and docs with < 2
  * tokens carry the (0, 0.0) contract.
  */
class BigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def cleanTokens(text: String): Seq[String] =
    text.toLowerCase.replaceAll("[^a-z0-9\\s]", " ").replaceAll("\\s+", " ")
      .trim.split(" ").toSeq.filter(_.nonEmpty)

  test("operator matches an independent reimplementation at sf0.001") {
    val got = BigramLm.tx22.build(spark, sfDir)
      .select("doc_id", "n_bigrams", "avg_logp")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

    // independent: plain Scala over the collected corpus
    val corpus = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> cleanTokens(Option(t).getOrElse("")) }
    val uni = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val big = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    corpus.foreach { case (_, toks) =>
      toks.foreach(w => uni(w) += 1)
      toks.sliding(2).filter(_.size == 2).foreach(p => big((p(0), p(1))) += 1)
    }
    val n = uni.values.sum.toDouble
    val want = corpus.map { case (id, toks) =>
      val lps = toks.sliding(2).filter(_.size == 2).map { p =>
        math.log(0.75 * big((p(0), p(1))) / uni(p(0)) + 0.25 * uni(p(1)) / n)
      }.toSeq
      val avg = if (lps.isEmpty) 0.0
        else BigDecimal(lps.sum / lps.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      id -> ((lps.size.toLong, avg))
    }.toMap

    assert(got.keySet == want.keySet)
    assert(want.exists(_._2._1 > 0L), "corpus must exercise real bigrams")
    want.foreach { case (id, (wn, wavg)) =>
      val (gn, gavg) = got(id)
      assert(gn == wn, s"$id: n_bigrams $gn != $wn")
      assert(math.abs(gavg - wavg) <= 1e-4, s"$id: avg_logp $gavg != $wavg")
    }
  }

  test("a fluent doc outscores its own shuffled tokens (the signal tx10 cannot see)") {
    // same unigram bag, destroyed transitions: under the bigram model the
    // shuffled twin must score strictly worse on average
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .as[(Long, String)].collect().filter(_._2 != null)
    val toks = docs.map { case (_, t) => cleanTokens(t) }.filter(_.size >= 5)
    assert(toks.nonEmpty)
    val uni = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val big = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    toks.foreach { ts => ts.foreach(w => uni(w) += 1)
      ts.sliding(2).filter(_.size == 2).foreach(p => big((p(0), p(1))) += 1) }
    val n = uni.values.sum.toDouble
    def score(ts: Seq[String]): Double = {
      val lps = ts.sliding(2).filter(_.size == 2).map { p =>
        // an unseen (shuffled) bigram backs off to the unigram term alone
        math.log(0.75 * big((p(0), p(1))) / uni(p(0)) + 0.25 * uni(p(1)) / n)
      }.toSeq
      lps.sum / lps.size
    }
    val rng = new scala.util.Random(7)
    val fluent = toks.map(score).sum / toks.length
    val shuffled = toks.map(ts => score(rng.shuffle(ts))).sum / toks.length
    assert(fluent > shuffled,
      s"fluent mean $fluent must beat shuffled mean $shuffled")
  }
}
