package graft

import org.apache.spark.sql.functions._

/** The containment df-cap (dd13/dd14's quadratic-hot-key guard): a shingle
  * whose document frequency exceeds containmentMaxDf must not generate
  * candidate pairs, the loss must be recall-only (genuine rare-shingle
  * containment untouched), and the audit relation must name what was
  * dropped. Planted data — the corpus's own max df (7 at sf0.01) never
  * reaches the cap, so only a synthetic boilerplate shingle exercises it.
  */
class ContainmentCapSpec extends SparkSpec {

  private def planted = {
    import spark.implicits._
    val hotDocs = (0L until 100L).map(i => (i, Seq("the same footer", s"unique body $i")))
    // One genuine contained pair, all shingles rare: 200's set ⊂ 201's.
    val real = Seq(
      (200L, Seq("rare alpha one", "rare beta two")),
      (201L, Seq("rare alpha one", "rare beta two", "rare gamma three", "rare delta four")))
    (hotDocs ++ real).toDF("doc_id", "shs")
  }

  test("a df-hot shingle generates no pairs; rare-shingle containment survives") {
    val pairs = operators.Dedup.containmentPairs(planted).cache()
    // Uncapped, the 100 footer docs would emit C(100,2)=4950 pairs at
    // containment 1/2 = 0.5; the cap (df=100 > 64) removes them all.
    assert(pairs.filter(col("id_a") < 200).isEmpty)
    // The genuine pair is found with exact capped-side arithmetic: shared
    // count over surviving shingles, denominators over ORIGINAL sizes.
    val row = pairs.filter(col("id_a") === 200 && col("id_b") === 201).collect()
    assert(row.length == 1)
    assert(row.head.getAs[Long]("n_shared") == 2L)
    assert(row.head.getAs[Long]("sz_a") == 2L && row.head.getAs[Long]("sz_b") == 4L)
    assert(row.head.getAs[Double]("containment") == 1.0)
    pairs.unpersist()
  }

  test("the cap is the only reason the hot pairs vanish (raising it restores them)") {
    val uncapped = operators.Dedup.containmentPairs(planted, maxDf = 200)
    assert(uncapped.filter(col("id_a") < 200).count() == 100L * 99L / 2)
  }

  test("the 8-byte shingle proxy is injective on the test corpus — results " +
      "bit-identical to the string-keyed spelling") {
    // containmentPairs keys its window/join/aggregate on xxhash64(tok)
    // instead of the shingle string (guide §2.3). The rewrite is an exact
    // isomorphism iff the hash is injective on the data: equal distinct
    // counts ⇒ no collision ⇒ every df count, join match and group is
    // identical to the string-keyed plan the oracle still computes.
    val toks = Tables.documents(spark, sfDir).select(
      explode(functions.WordShingles3.shingles3(
        functions.TextPrep.clean(col("text")))).as("tok"))
    val Array(nTok, nHash) = toks
      .agg(countDistinct(col("tok")), countDistinct(xxhash64(col("tok"))))
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    assert(nTok == nHash, s"xxhash64 collision on the corpus: $nTok toks vs $nHash hashes")
  }

  test("the audit relation names the dropped shingle with its df") {
    val hot = operators.Dedup.containmentHotShingles(planted).collect()
    assert(hot.length == 1)
    assert(hot.head.getAs[String]("tok") == "the same footer")
    assert(hot.head.getAs[Long]("df") == 100L)
    // and it is empty on the real corpus at test scale — the cap is
    // headroom there, not behavior change
    assert(operators.Dedup.containmentHotShingles(
      Tables.documents(spark, sfDir).select(col("doc_id"),
        functions.WordShingles3.shingles3(functions.TextPrep.clean(col("text"))).as("shs"))).isEmpty)
  }
}
