package graft

import org.apache.spark.sql.functions._
import graft.functions.TextPrep

/** Properties of the round-5 second-wave operators: dd13 containment
  * dedup, ann11 kNN graph, q41 peak concurrency, tx11 vocabulary stats,
  * tx12 PMI collocations. Semantic invariants only — the DuckDB
  * hash-compare pins exact values.
  */
class Round5bOpsSpec extends SparkSpec {

  // ------------------------------------------------------ dd13 containment
  test("dd13: emitted pairs equal the brute-force containment>=0.5 set") {
    val got = operators.Dedup.dd13.build(spark, sfDir)
      .select("id_a", "id_b", "n_shared", "containment")
    val sh = Tables.documents(spark, sfDir)
      .select(col("doc_id"), functions.WordShingles3.shingles3(TextPrep.clean(col("text"))).as("shs"))
    val a = sh.select(col("doc_id").as("id_a"), col("shs").as("sa"))
    val b = sh.select(col("doc_id").as("id_b"), col("shs").as("sb"))
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("n_shared", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("containment", round(col("n_shared").cast("double") /
        least(size(col("sa")), size(col("sb"))).cast("double"), 6))
      .filter(col("containment") >= 0.5)
      .select("id_a", "id_b", "n_shared", "containment")
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty)
  }

  test("dd13: containment dominates Jaccard on every pair (the asymmetry it exists for)") {
    // C = inter/min >= inter/union = J always; equality only when |A|=|B|.
    val p = operators.Dedup.dd13.build(spark, sfDir)
      .withColumn("jaccard", col("n_shared").cast("double") /
        (col("sz_a") + col("sz_b") - col("n_shared")).cast("double"))
    assert(p.filter(col("containment") < col("jaccard")).isEmpty)
  }

  // --------------------------------------------------------- ann11 kNN graph
  test("ann11: edges are the exact in-cell top-3, cosines verified, <=3 per source") {
    val g = operators.SimilaritySearch.ann11.build(spark, sfDir).cache()
    assert(g.filter(col("rank") < 1 || col("rank") > 3).isEmpty)
    assert(g.groupBy("src_id").count().filter(col("count") > 3).isEmpty)
    // recompute each edge's cosine from the raw vectors
    val n = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", functions.VectorMath.l2norm(col("v")))
    val chk = g
      .join(n.select(col("vec_id").as("src_id"), col("v").as("va"), col("nrm").as("na")), "src_id")
      .join(n.select(col("vec_id").as("dst_id"), col("v").as("vb"), col("nrm").as("nb")), "dst_id")
      .withColumn("cos", round(functions.VectorMath.dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
    assert(chk.filter(col("cos") =!= col("cos_sim")).isEmpty)
    g.unpersist()
  }

  test("ann11: mutual flag is exactly reverse-edge membership") {
    val g = operators.SimilaritySearch.ann11.build(spark, sfDir).cache()
    val edges = g.select(col("src_id"), col("dst_id"))
    val rev = edges.select(col("dst_id").as("src_id"), col("src_id").as("dst_id"))
      .withColumn("r", lit(1))
    val joined = g.join(rev, Seq("src_id", "dst_id"), "left")
    assert(joined.filter((col("mutual") === 1) =!= col("r").isNotNull).isEmpty)
    // mutuality is symmetric: the mutual subgraph equals its own transpose
    val m = g.filter(col("mutual") === 1).select("src_id", "dst_id")
    val mt = m.select(col("dst_id").as("src_id"), col("src_id").as("dst_id"))
    assert(m.exceptAll(mt).isEmpty)
    g.unpersist()
  }

  // ------------------------------------------------- q41 peak concurrency
  test("q41: the reported peak is attained and never exceeded at any session start") {
    val peaks = etl.Windowing.q41.build(spark, sfDir).cache()
    val sess = etl.Windowing.q19.build(spark, sfDir)
      .select(col("start_sec"), col("end_sec")).cache()
    // concurrency AT peak_sec equals max_concurrent
    val atPeak = peaks.join(sess,
        sess("start_sec") <= peaks("peak_sec") && sess("end_sec") >= peaks("peak_sec"), "left")
      .groupBy(peaks("day_date"), peaks("max_concurrent"))
      .agg(count(sess("start_sec")).as("n_active"))
    assert(atPeak.filter(col("n_active") =!= col("max_concurrent")).isEmpty)
    // no candidate instant in the day beats the reported max. Candidates are
    // the +1 boundaries of the day-split segments: session starts AND each
    // day's midnight (where sessions carried over from the previous day
    // stack — a peak no session start can witness).
    val starts = sess.select(col("start_sec").as("t"))
      .unionAll(sess.filter(expr("end_sec div 86400") > expr("start_sec div 86400"))
        .select(explode(sequence(expr("start_sec div 86400") + 1, expr("end_sec div 86400"))).as("day"))
        .select((col("day") * 86400).as("t")))
      .distinct()
      .withColumn("day_date", date_format(timestamp_seconds(expr("t div 86400") * 86400), "yyyy-MM-dd"))
    val cnt = starts.join(sess, sess("start_sec") <= col("t") && sess("end_sec") >= col("t"))
      .groupBy("day_date", "t").agg(count(lit(1)).as("c"))
    val worst = cnt.groupBy("day_date").agg(max(col("c")).as("brute_max"))
    val cmp = peaks.join(worst, "day_date")
    assert(cmp.filter(col("brute_max") =!= col("max_concurrent")).isEmpty)
    peaks.unpersist(); sess.unpersist()
  }

  test("q41: n_sessions counts the sessions overlapping each day") {
    val peaks = etl.Windowing.q41.build(spark, sfDir)
    val sess = etl.Windowing.q19.build(spark, sfDir)
    val perDay = sess.select(explode(sequence(expr("start_sec div 86400"), expr("end_sec div 86400"))).as("day"))
      .groupBy(date_format(timestamp_seconds(col("day") * 86400), "yyyy-MM-dd").as("day_date"))
      .agg(count(lit(1)).as("expected"))
    assert(peaks.join(perDay, "day_date").filter(col("expected") =!= col("n_sessions")).isEmpty)
  }

  // ---------------------------------------------------- tx11 vocab profile
  test("tx11: per-source totals reconcile with the raw token stream") {
    val stats = functions.TextAnalysis.tx11.build(spark, sfDir).cache()
    val toks = Tables.documents(spark, sfDir)
      .select(col("source"), explode(split(TextPrep.clean(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0).cache()
    val expected = toks.groupBy("source").agg(
      count(lit(1)).as("e_tokens"), countDistinct(col("w")).as("e_types"))
    val j = stats.join(expected, "source")
    assert(j.filter(col("n_tokens") =!= col("e_tokens") || col("n_types") =!= col("e_types")).isEmpty)
    // the dominant token really is an argmax of the per-source counts
    val top = toks.groupBy("source", "w").agg(count(lit(1)).as("c"))
      .groupBy("source").agg(max(col("c")).as("best"))
    assert(stats.join(top, "source").filter(col("top_count") =!= col("best")).isEmpty)
    assert(stats.filter(col("n_hapax") > col("n_types")).isEmpty)
    stats.unpersist(); toks.unpersist()
  }

  // ---------------------------------------------------- q42 exact moments
  test("q42: exact integer-sum statistics agree with Spark's float estimators") {
    val got = etl.Reporting.q42.build(spark, sfDir)
    val net = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val ref = Tables.lineitem(spark, sfDir)
      .join(broadcast(Tables.part(spark, sfDir)), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        round(col("l_quantity")).cast("long").cast("double").as("x"),
        (round(net * 100).cast("long").cast("double") / 100.0).as("y"))
      .groupBy("brand")
      .agg(corr(col("x"), col("y")).as("r"), covar_pop(col("x"), col("y")).as("cv"),
        stddev_pop(col("x")).as("dx"), stddev_pop(col("y")).as("dy"))
    val j = got.join(ref, "brand")
    assert(j.filter(
      abs(col("corr_qty_rev") - col("r")) > 1e-5 ||
      abs(col("covar_pop") - col("cv")) > 1e-4 ||
      abs(col("stddev_qty") - col("dx")) > 1e-5 ||
      abs(col("stddev_rev") - col("dy")) > 1e-2).isEmpty)
    assert(got.filter(abs(col("corr_qty_rev")) > 1).isEmpty)
  }

  // ------------------------------------------------------ tx12 PMI bigrams
  test("tx12: pair counts are bounded by both unigram counts and PMI recomputes") {
    val pmi = functions.TextAnalysis.tx12.build(spark, sfDir).cache()
    assert(pmi.filter(col("n_pair") > least(col("n_first"), col("n_second"))).isEmpty)
    // recompute the unigram counts independently and check the join carried
    // the right values for both words of every pair
    val u = Tables.documents(spark, sfDir)
      .select(explode(split(TextPrep.clean(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
    val chk = pmi
      .withColumn("wa", split(col("bigram"), " ").getItem(0))
      .withColumn("wb", split(col("bigram"), " ").getItem(1))
      .join(u.select(col("w").as("wa"), col("c").as("ca")), "wa")
      .join(u.select(col("w").as("wb"), col("c").as("cb")), "wb")
    assert(chk.filter(col("n_first") =!= col("ca") || col("n_second") =!= col("cb")).isEmpty)
    pmi.unpersist()
  }
}
