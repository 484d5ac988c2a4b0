package graft

import org.apache.spark.sql.functions._

/** Losslessness proof for the PPJoin/cosine prefix filters in q10/q11: with
  * the prefix index active, output must equal the brute-force formulation
  * (cross join for q10, unrestricted token join for q11) on the real test
  * tables — the candidate pruning may never drop a qualifying pair. */
class MatchingEquivalenceSpec extends SparkSpec {

  private def master = Tables.part(spark, sfDir)
    .filter(col("p_partkey") % 4 === 0)
    .select(lower(col("p_name")).as("master_title")).distinct()

  private def test_ = Tables.part(spark, sfDir)
    .select(lower(concat(col("p_name"), lit(" "), col("p_type"))).as("test_title")).distinct()

  test("q10 prefix-filtered inverted index == brute-force cross join") {
    val fast = SparkEntry.queries("q10_cross_join_match")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq.sorted

    val brute = master.withColumn("ma", array_distinct(split(col("master_title"), " ")))
      .crossJoin(test_.withColumn("ta", array_distinct(split(col("test_title"), " "))))
      .withColumn("jaccard",
        round(size(array_intersect(col("ma"), col("ta"))).cast("double") /
              size(array_union(col("ma"), col("ta"))).cast("double"), 6))
      .filter(col("jaccard") >= 0.5)
      .select("master_title", "test_title", "jaccard")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq.sorted

    assert(brute.nonEmpty, "test data must produce at least one match")
    assert(fast == brute)
  }

  test("q11 cosine prefix filter == unrestricted inverted index") {
    val fast = SparkEntry.queries("q11_tfidf_match")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq.sorted

    // Same TF-IDF formula, candidates from ALL shared tokens (no prefix).
    val corpus = master.select(col("master_title").as("title"))
      .union(test_.select(col("test_title").as("title"))).distinct()
    val tf = corpus.select(col("title"),
        explode(regexp_extract_all(col("title"), lit("[a-z0-9]{2,}"), lit(0))).as("tok"))
      .groupBy("title", "tok").agg(count(lit(1)).as("cnt"))
    val nDocs = corpus.agg(count(lit(1)).as("n_docs"))
    val dfTab = tf.groupBy("tok").agg(countDistinct("title").as("df"))
    val w = tf.join(dfTab, "tok").crossJoin(broadcast(nDocs))
      .select(col("title"), col("tok"),
        (col("cnt") * (log((lit(1.0) + col("n_docs")) / (lit(1.0) + col("df"))) + lit(1.0))).as("w"))
    val norms = w.groupBy("title").agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val wm = w.join(master, col("title") === col("master_title"), "left_semi")
      .select(col("title").as("m_title"), col("tok"), col("w").as("wm"))
    val wt = w.join(test_, col("title") === col("test_title"), "left_semi")
      .select(col("title").as("t_title"), col("tok"), col("w").as("wt"))
    val brute = wm.join(wt, "tok")
      .groupBy("m_title", "t_title")
      .agg(sum(col("wm") * col("wt")).as("dot"))
      .join(norms.select(col("title").as("m_title"), col("nrm").as("nm")), "m_title")
      .join(norms.select(col("title").as("t_title"), col("nrm").as("nt")), "t_title")
      .select(col("m_title"), col("t_title"),
        round(col("dot") / (col("nm") * col("nt")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= 0.7)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq.sorted

    assert(brute.nonEmpty, "test data must produce at least one match")
    assert(fast == brute)
  }
}
