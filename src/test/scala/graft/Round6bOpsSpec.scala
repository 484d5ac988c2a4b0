package graft

import org.apache.spark.sql.functions._
import graft.functions.TextPrep

/** Properties of the round-6 new operators. Semantic invariants only — the
  * DuckDB hash-compare pins exact values. */
class Round6bOpsSpec extends SparkSpec {

  // ------------------------------------------------- dd15 incremental dedup
  test("dd15: one verdict per increment doc; matches are base docs; jaccard bounded") {
    val r = operators.Dedup.dd15.build(spark, sfDir).cache()
    val nInc = Tables.documents(spark, sfDir).filter(col("doc_id") % 5 === 4).count()
    assert(r.count() == nInc)
    assert(r.select("doc_id").distinct().count() == nInc)
    assert(r.filter(!col("verdict").isin("exact_dup", "near_dup", "new")).isEmpty)
    // a match is always a BASE doc, never another increment doc or itself
    assert(r.filter(col("match_id").isNotNull && col("match_id") % 5 === 4).isEmpty)
    assert(r.filter(col("match_id") === col("doc_id")).isEmpty)
    // verdict 'new' carries no match; dup verdicts always carry one
    assert(r.filter(col("verdict") === "new" && col("match_id").isNotNull).isEmpty)
    assert(r.filter(col("verdict") =!= "new" && col("match_id").isNull).isEmpty)
    assert(r.filter(col("verdict") === "near_dup" &&
      (col("jaccard") < 0.5 || col("jaccard") > 1.0)).isEmpty)
    assert(r.filter(col("verdict") === "exact_dup" && col("jaccard") =!= 1.0).isEmpty)
    r.unpersist()
  }

  test("dd15: 'new' verdicts have no base content-hash match (no false admits)") {
    val r = operators.Dedup.dd15.build(spark, sfDir)
    val doc = Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(TextPrep.clean(col("text"))).as("h"))
    val baseH = doc.filter(col("doc_id") % 5 =!= 4).select("h").distinct()
    val incWithBaseMatch = doc.filter(col("doc_id") % 5 === 4)
      .join(baseH, "h").select("doc_id")
    assert(r.filter(col("verdict") === "new")
      .join(incWithBaseMatch, Seq("doc_id"), "left_semi").isEmpty)
  }

  test("dd15: exact branch fires at sf0.1 (the scale that plants exact dups) " +
    "and agrees with a direct hash join") {
    val d = "/root/testdata/sf0.1"
    val r = operators.Dedup.dd15.build(spark, d).cache()
    val doc = Tables.documents(spark, d)
      .select(col("doc_id"), md5(TextPrep.clean(col("text"))).as("h"))
    val expected = doc.filter(col("doc_id") % 5 === 4)
      .join(doc.filter(col("doc_id") % 5 =!= 4)
        .groupBy("h").agg(min(col("doc_id")).as("want")), "h")
      .select(col("doc_id"), col("want"))
    assert(expected.count() > 0, "sf0.1 must plant cross-split exact dups")
    val got = r.filter(col("verdict") === "exact_dup").select("doc_id", "match_id")
    assert(got.count() == expected.count())
    assert(got.join(expected, "doc_id").filter(col("match_id") =!= col("want")).isEmpty)
    r.unpersist()
  }

  // ------------------------------------------- tx18 perplexity buckets
  test("tx18: buckets are score-ordered within every source and scores match tx10") {
    val b = functions.TextAnalysis.tx18.build(spark, sfDir).cache()
    assert(b.filter(!col("bucket").isin("head", "middle", "tail")).isEmpty)
    // every tx10-scored doc gets a bucket, with the same 4-dp score
    val lm = functions.TextAnalysis.tx10.build(spark, sfDir)
      .select(col("doc_id"), col("avg_logp").as("want"))
    assert(b.count() == lm.count())
    assert(b.join(lm, "doc_id").filter(col("avg_logp") =!= col("want")).isEmpty)
    // ordering: every head doc scores >= every middle doc of its source, etc.
    val agg = b.groupBy("source").pivot("bucket").agg(
      min(col("avg_logp")).as("mn"), max(col("avg_logp")).as("mx"))
    assert(agg.filter(col("head_mn") < col("middle_mx")).isEmpty)
    assert(agg.filter(col("middle_mn") < col("tail_mx")).isEmpty)
    b.unpersist()
  }

  // ------------------------------------------------ ann15 probe sweep
  test("ann15: three depths per query; hits bounded; recall monotone in nprobe") {
    val f = operators.SimilaritySearch.ann15.build(spark, sfDir).cache()
    val nq = Tables.embeddings(spark, sfDir).filter(col("vec_id") % 20 === 0).count()
    assert(f.count() == nq * 3)
    assert(f.filter(col("n_hits") > col("n_exact") || col("n_hits") < 0).isEmpty)
    assert(f.filter(col("recall_at_3") < 0 || col("recall_at_3") > 1).isEmpty)
    // monotone: adding a probe can only add candidates
    val byP = f.groupBy("query_id").pivot("nprobe", Seq(1, 2, 3))
      .agg(first(col("n_hits")))
    assert(byP.filter(col("1") > col("2") || col("2") > col("3")).isEmpty)
    // frontier endpoint consistency: nprobe=1 equals ann05's shape of
    // "own cell only" — hits can never exceed the exact top-3 size of 3
    assert(f.filter(col("n_exact") > 3).isEmpty)
    f.unpersist()
  }

  // --------------------------------------- tx19 source overlap matrix
  test("tx19: full ordered matrix, symmetric shared counts, bounded containment") {
    val m = functions.TextAnalysis.tx19.build(spark, sfDir).cache()
    val nSrc = Tables.documents(spark, sfDir).select("source").distinct().count()
    assert(m.count() == nSrc * (nSrc - 1))
    assert(m.filter(col("n_shared") > col("n_grams_a")).isEmpty)
    assert(m.filter(col("overlap_frac") < 0 || col("overlap_frac") > 1).isEmpty)
    // |A ∩ B| is symmetric even though the fraction is directional
    val rev = m.select(col("src_b").as("src_a"), col("src_a").as("src_b"),
      col("n_shared").as("rev_shared"))
    assert(m.join(rev, Seq("src_a", "src_b"))
      .filter(col("n_shared") =!= col("rev_shared")).isEmpty)
    m.unpersist()
  }

  // ------------------------------------------------ ann16 rebalance plan
  test("ann16: sizes partition the corpus; nn is the exact argmin; decisions match the integer rule") {
    val r = operators.SimilaritySearch.ann16.build(spark, sfDir).cache()
    val total = Tables.embeddings(spark, sfDir).count()
    assert(r.agg(sum(col("n_members"))).head().getLong(0) == total)
    val k = r.count()
    assert(r.filter(!col("decision").isin("split", "merge", "keep")).isEmpty)
    assert(r.filter(col("nn_cell") === col("cell")).isEmpty)
    // re-derive every decision from (n_members, k, total)
    val bad = r.filter(
      (col("n_members") * k > total * 2 && col("decision") =!= "split") ||
      (col("n_members") * k * 2 < total && col("decision") =!= "merge") ||
      (col("n_members") * k <= total * 2 && col("n_members") * k * 2 >= total
        && col("decision") =!= "keep"))
    assert(bad.isEmpty)
    // nn_dist_sq is the true minimum over the centroid set (k is tiny)
    val cents = Tables.embeddings(spark, sfDir).filter(col("vec_id") % 50 === 0)
      .select(col("vec_id"),
        transform(col("embedding"), x => round(x.cast("double") * 1e6).cast("long")).as("v"))
      .collect().map(row => row.getLong(0) -> row.getSeq[Long](1)).toMap
    r.collect().foreach { row =>
      val (cell, nnCell, nnD) = (row.getLong(0), row.getAs[Long]("nn_cell"),
        row.getAs[Long]("nn_dist_sq"))
      val dists = (cents - cell).map { case (c2, v2) =>
        c2 -> cents(cell).zip(v2).map { case (a, b) => (a - b) * (a - b) }.sum }
      val (bestC, bestD) = dists.minBy { case (c2, dd) => (dd, c2) }
      assert(bestC == nnCell && bestD == nnD, s"cell $cell: got ($nnCell,$nnD) want ($bestC,$bestD)")
    }
    r.unpersist()
  }

  // --------------------------------------------- ann17 codec frontier
  test("ann17: float baseline is exact; recall never rises as bytes shrink") {
    val f = operators.SimilaritySearch.ann17.build(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(f("float32").getAs[Long]("recall_ppm") == 1000000L,
      "the float row is the definitionally-exact baseline")
    assert(f.values.forall(r => r.getAs[Long]("n_hits") <= r.getAs[Long]("n_exact")))
    val byBytes = f.values.toSeq.sortBy(-_.getAs[Long]("bytes_per_vec"))
      .map(_.getAs[Long]("recall_ppm"))
    assert(byBytes.zip(byBytes.tail).forall { case (hi, lo) => hi >= lo },
      s"recall must be nonincreasing along the compression axis: $byBytes")
  }

  // --------------------------------------------- dd16 dedup impact report
  test("dd16: classes partition every source and exact counts agree with dd01") {
    val r = operators.Dedup.dd16.build(spark, sfDir).cache()
    assert(r.filter(col("n_exact_dup") + col("n_near_dup") + col("n_kept")
      =!= col("n_docs")).isEmpty, "exact/near/kept must partition each source")
    assert(r.agg(sum(col("n_docs"))).head().getLong(0) ==
      Tables.documents(spark, sfDir).count())
    // total exact casualties == dd01's non-keeper copies
    val dd01Cas = operators.Dedup.dd01.build(spark, sfDir)
      .agg(sum(col("n_copies") - 1)).head().getLong(0)
    assert(r.agg(sum(col("n_exact_dup"))).head().getLong(0) == dd01Cas)
    // removed_ppm re-derivable from the counts
    assert(r.filter(expr("(n_exact_dup + n_near_dup) * 1000000 div n_docs") =!= col("removed_ppm")).isEmpty)
    r.unpersist()
  }

  // ----------------------------------------------- q56 grouping sets
  test("q56: every margin level sums to the grand total; gid partitions the levels") {
    val g = etl.Reporting.q56.build(spark, sfDir).cache()
    val total = g.filter(col("gid") === 3).select("n_orders").head().getLong(0)
    for (gid <- Seq(0, 1, 2)) {
      assert(g.filter(col("gid") === gid).agg(sum(col("n_orders"))).head().getLong(0) == total,
        s"gid=$gid margin must conserve the order count")
    }
    // null pattern must match the grouping level exactly
    assert(g.filter(col("gid") === 0 &&
      (col("o_orderpriority").isNull || col("o_orderstatus").isNull)).isEmpty)
    assert(g.filter(col("gid") === 1 && col("o_orderstatus").isNotNull).isEmpty)
    assert(g.filter(col("gid") === 2 && col("o_orderpriority").isNotNull).isEmpty)
    g.unpersist()
  }

  // --------------------------------------- q54 incremental summary merge
  test("q54: merging archive + increment partials equals the one-pass summary") {
    val got = etl.RelationalCore.q54.build(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    assert(li.filter(col("l_orderkey") % 10 === 7).count() > 0,
      "increment split must be non-empty for the merge to be exercised")
    val full = li
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast("long").as("qty"),
        functions.Exact.cents(col("l_extendedprice")).as("pc"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("qty")).as("sum_qty"), sum(col("pc")).as("sum_price_cents"),
        count(lit(1)).as("n_rows"), min(col("qty")).as("min_qty"),
        max(col("qty")).as("max_qty"))
      .withColumn("avg_qty", round(col("sum_qty").cast("double") / col("n_rows"), 4))
    assert(got.exceptAll(full).isEmpty && full.exceptAll(got).isEmpty,
      "partial-aggregate merge must be exactly lossless")
  }

  // -------------------------------------------------- mm09 energy trim
  test("mm09: trims partition the frame axis and the kept span is never empty") {
    val t = multimodal.Multimodal.mm09.build(spark, sfDir).cache()
    val expectDocs = Tables.documents(spark, sfDir)
      .filter(length(col("text")) >= 64).count()
    assert(t.count() == expectDocs)
    // the integer threshold cannot silence every frame (summing the
    // inequality over all frames is a contradiction)
    assert(t.filter(col("n_silent") >= col("n_frames")).isEmpty)
    assert(t.filter(col("kept_span") < 1).isEmpty)
    // lead + kept + tail tile the frame axis exactly
    assert(t.filter(col("lead_trim") + col("kept_span") + col("tail_trim")
      =!= col("n_frames")).isEmpty)
    assert(t.filter(col("lead_trim") < 0 || col("tail_trim") < 0).isEmpty)
    t.unpersist()
  }

  test("dd15: every dd02 near-dup pair that crosses the split is caught") {
    // dd02's within-corpus verified pairs, restricted to (base, inc) — any
    // such pair means the increment doc must NOT be admitted as 'new'.
    val pairs = operators.Dedup.dd02.build(spark, sfDir)
    val flagged = pairs
      .select(explode(array(
        struct(col("id_a").as("x"), col("id_b").as("y")),
        struct(col("id_b").as("x"), col("id_a").as("y")))).as("p"))
      .filter(col("p.x") % 5 === 4 && col("p.y") % 5 =!= 4)
      .select(col("p.x").as("doc_id")).distinct()
    val admitted = operators.Dedup.dd15.build(spark, sfDir)
      .filter(col("verdict") === "new").select("doc_id")
    assert(admitted.join(flagged, Seq("doc_id"), "left_semi").isEmpty)
  }
}
