package graft

import org.apache.spark.sql.functions._

/** Properties of the round-5 operators: q38 point-in-time join, dd11
  * semantic dedup, ann08 product quantization, tx10 unigram LM scoring.
  * Semantic invariants only — the DuckDB hash-compare pins exact values.
  */
class Round5OpsSpec extends SparkSpec {

  // ------------------------------------------------------------- q38 PIT
  test("q38: every order matches exactly one dimension interval") {
    val pit = etl.Dimensional.q38.build(spark, sfDir).cache()
    val orders = Tables.orders(spark, sfDir)
    // total bijection: one output row per order, none dropped by the interval
    assert(pit.count() == orders.count())
    assert(pit.groupBy("order_key").count().filter(col("count") =!= 1).isEmpty)
    pit.unpersist()
  }

  test("q38: the attribute at order time is the order's own day observation when one exists") {
    val pit = etl.Dimensional.q38.build(spark, sfDir)
    // the day-winning order's priority IS the observation — the PIT join
    // must return exactly it for that order
    val dayWinner = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey").as("custkey"), to_date(col("o_orderdate")).as("order_date"))
      .agg(max_by(struct(col("o_orderkey"), col("o_orderpriority")), col("o_orderkey")).as("w"))
      .select(col("custkey"), col("order_date"),
        col("w.o_orderkey").as("order_key"), col("w.o_orderpriority").as("obs_attr"))
    val j = pit.join(dayWinner, Seq("custkey", "order_date", "order_key"))
    assert(j.filter(col("priority_at_order") =!= col("obs_attr")).isEmpty)
  }

  // --------------------------------------------------------- dd11 semdedup
  test("dd11: removals are sound (real above-threshold pair, keeper has smaller id, same cell)") {
    val removed = operators.Dedup.dd11.build(spark, sfDir).cache()
    assert(removed.filter(col("keeper_id") >= col("removed_id")).isEmpty)
    assert(removed.filter(col("max_sim") < 0.25).isEmpty)
    // keeper must genuinely share the removed vector's cell and clear the
    // threshold — recompute the keeper pair's cosine brute-force
    val n = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", functions.VectorMath.l2norm(col("v")))
    val a = n.select(col("vec_id").as("keeper_id"), col("v").as("va"), col("nrm").as("na"))
    val b = n.select(col("vec_id").as("removed_id"), col("v").as("vb"), col("nrm").as("nb"))
    val recomputed = removed.join(a, "keeper_id").join(b, "removed_id")
      .withColumn("cos", round(functions.VectorMath.dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
    assert(recomputed.filter(col("cos") < 0.25).isEmpty)
    removed.unpersist()
  }

  test("dd11: survivors have no smaller-id above-threshold neighbor in their cell (completeness)") {
    // brute force within cells must flag exactly the removed set
    val removed = operators.Dedup.dd11.build(spark, sfDir)
      .select(col("removed_id").as("vec_id"))
    val n = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", functions.VectorMath.l2norm(col("v")))
    val cent = n.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("nrm").as("cn"))
    val assigned = n.crossJoin(broadcast(cent))
      .withColumn("cos_c", round(functions.VectorMath.dot(col("v"), col("cv")) / (col("nrm") * col("cn")), 6))
      .groupBy("vec_id")
      .agg(max_by(struct(col("cent_id"), col("v"), col("nrm")),
        struct(col("cos_c"), (-col("cent_id")).as("t"))).as("b"))
      .select(col("vec_id"), col("b.v").as("v"), col("b.nrm").as("nrm"), col("b.cent_id").as("cell"))
    val x = assigned.select(col("vec_id").as("ia"), col("v").as("va"), col("nrm").as("na"), col("cell"))
    val y = assigned.select(col("vec_id").as("ib"), col("v").as("vb"), col("nrm").as("nb"), col("cell"))
    val bruteRemoved = x.join(y, Seq("cell")).filter(col("ia") < col("ib"))
      .withColumn("cos", round(functions.VectorMath.dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("cos") >= 0.25)
      .select(col("ib").as("vec_id")).distinct()
    assert(removed.exceptAll(bruteRemoved).isEmpty && bruteRemoved.exceptAll(removed.distinct()).isEmpty)
  }

  // ------------------------------------------------------------ ann08 PQ
  private lazy val pq = operators.SimilaritySearch.ann08.build(spark, sfDir).cache()

  test("ann08: three ranked rows per query, ranks dense, distances non-decreasing") {
    val perQuery = pq.groupBy("query_id").agg(
      count(lit(1)).as("n"),
      min("rank").as("r0"), max("rank").as("r1"))
    assert(perQuery.filter(col("n") =!= 3 || col("r0") =!= 1 || col("r1") =!= 3).isEmpty)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy("rank")
    assert(pq.withColumn("prev", lag(col("approx_dist"), 1).over(w))
      .filter(col("prev").isNotNull && col("approx_dist") < col("prev")).isEmpty)
  }

  test("ann08: ADC ranking carries true-similarity signal far above chance") {
    // This corpus has NO planted near-neighbors for the query set (measured:
    // max exact top-1 cosine 0.43, random-vector regime), so exact-top-3
    // recall is the wrong gauge for 64× compression — tiny cosine gaps
    // between random vectors are below PQ's quantization floor by design.
    // The property PQ DOES promise is rank correlation with true similarity:
    // its picks' average true cosine must sit far above the all-pairs
    // average (~0.002 here; measured pick average ~0.15, exact-top-3
    // ceiling ~0.35).
    val n = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", functions.VectorMath.l2norm(col("v")))
    val q = n.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = n.filter(col("vec_id") % 20 =!= 0)
      .select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"))
    val chance = broadcast(q).crossJoin(c)
      .select(avg(functions.VectorMath.dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("m"))
      .head().getDouble(0)
    val picked = pq.select(avg(col("cos_sim"))).head().getDouble(0)
    assert(picked > chance + 0.05,
      s"PQ picks' avg true cosine $picked not above chance $chance")
  }

  // ----------------------------------------------------- ann09 PQ rerank
  test("ann09: candidates come from PQ's top-10, and reranking only improves pick quality") {
    val reranked = operators.SimilaritySearch.ann09.build(spark, sfDir).cache()
    // funnel containment: every reranked candidate was a stage-1 pick
    assert(reranked.filter(col("pq_rank") > 10).isEmpty)
    // rank is dense 1..3 ordered by exact cosine
    val perQuery = reranked.groupBy("query_id").agg(
      count(lit(1)).as("n"), min("rank").as("r0"), max("rank").as("r1"))
    assert(perQuery.filter(col("n") =!= 3 || col("r0") =!= 1 || col("r1") =!= 3).isEmpty)
    // reranking top-10 ⊇ top-3 by the true metric, so per query the WORST
    // reranked pick is at least as good as the worst raw-PQ pick
    val worstReranked = reranked.groupBy("query_id").agg(min("cos_sim").as("w_rr"))
    val worstRaw = pq.groupBy("query_id").agg(min("cos_sim").as("w_pq"))
    assert(worstReranked.join(worstRaw, "query_id")
      .filter(col("w_rr") < col("w_pq")).isEmpty)
    reranked.unpersist()
  }

  // ----------------------------------------------------- ann10 filtered ANN
  test("ann10: every neighbor satisfies the filter, and k is delivered when the label allows") {
    val f = operators.SimilaritySearch.ann10.build(spark, sfDir).cache()
    val n = Tables.embeddings(spark, sfDir)
    // pre-filtering: result labels all match the query's (the output label
    // column is the shared join key, so cross-check against the raw table)
    val lbl = n.select(col("vec_id").as("query_id"), col("label").as("qlabel"))
    assert(f.join(lbl, "query_id").filter(col("label") =!= col("qlabel")).isEmpty)
    // a query whose label has >= 3 corpus members gets exactly 3 rows —
    // the under-delivery post-filtering suffers cannot happen
    val corpusPerLabel = n.filter(col("vec_id") % 20 =!= 0)
      .groupBy("label").agg(count(lit(1)).as("n_corpus"))
    val delivered = f.groupBy("query_id", "label").agg(count(lit(1)).as("k"))
      .join(corpusPerLabel, "label")
    assert(delivered.filter(col("n_corpus") >= 3 && col("k") =!= 3).isEmpty)
    f.unpersist()
  }

  // -------------------------------------------------- dd12 minhash calibration
  test("dd12: estimates are k/8 grid values and banded candidates match ≥2 components") {
    val cal = operators.Dedup.dd12.build(spark, sfDir).cache()
    // est is a multiple of 1/8 in [0,1]; true jaccard in [0,1]; err consistent
    assert(cal.filter(col("est_jaccard") * 8 =!= round(col("est_jaccard") * 8, 0)).isEmpty)
    assert(cal.filter(col("true_jaccard") < 0 || col("true_jaccard") > 1).isEmpty)
    assert(cal.filter(round(col("est_jaccard") - col("true_jaccard"), 6) =!= col("err")).isEmpty)
    // sharing an LSH band means 2 equal signature rows ⇒ est ≥ 2/8 for
    // EVERY candidate — the structural floor band-blocking guarantees
    assert(cal.filter(col("est_jaccard") < 0.25).isEmpty)
    cal.unpersist()
  }

  // ------------------------------------------------------- tx10 unigram LM
  test("tx10: scores are well-formed and rarity orders them") {
    val lm = functions.TextAnalysis.tx10.build(spark, sfDir).cache()
    // every doc scored, log-probs strictly negative (p(w) < 1 always since
    // the vocabulary has more than one token), hapax within token count
    assert(lm.count() == Tables.documents(spark, sfDir).count())
    assert(lm.filter(col("avg_logp") >= 0.0).isEmpty)
    assert(lm.filter(col("n_hapax") > col("n_tokens")).isEmpty)
    // a doc that is pure hapax tokens must score below the corpus median of
    // docs with none — rare text reads as less typical
    val med = lm.stat.approxQuantile("avg_logp", Array(0.5), 0.0)(0)
    val pureHapax = lm.filter(col("n_hapax") === col("n_tokens") && col("n_tokens") > 0)
    if (pureHapax.count() > 0)
      assert(pureHapax.filter(col("avg_logp") > med).isEmpty)
    lm.unpersist()
  }
}
