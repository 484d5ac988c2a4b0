package graft

import org.apache.spark.sql.functions._

/** Properties of the round-5 third-wave operators: q43 cohort retention,
  * q44 conversion funnel. Semantic invariants only — the DuckDB
  * hash-compare pins exact values.
  */
class Round6OpsSpec extends SparkSpec {

  // ----------------------------------------------------- q43 cohort retention
  test("q43: offset-0 cohort sizes partition the user base; events conserved") {
    val m = etl.Windowing.q43.build(spark, sfDir).cache()
    val ev = Tables.events(spark, sfDir)
    val totalUsers = ev.select(countDistinct(col("user_id"))).head().getLong(0)
    val totalEvents = ev.count()
    // every user belongs to exactly one cohort and is active in week 0
    val week0 = m.filter(col("week_offset") === 0)
      .agg(sum(col("active_users"))).head().getLong(0)
    assert(week0 == totalUsers)
    // the matrix double-counts no event
    assert(m.agg(sum(col("n_events"))).head().getLong(0) == totalEvents)
    assert(m.filter(col("week_offset") < 0).isEmpty)
    m.unpersist()
  }

  test("q43: a cohort's later-week actives never exceed its week-0 size") {
    val m = etl.Windowing.q43.build(spark, sfDir)
    val w0 = m.filter(col("week_offset") === 0)
      .select(col("cohort_start"), col("active_users").as("cohort_size"))
    val bad = m.join(w0, "cohort_start")
      .filter(col("active_users") > col("cohort_size"))
    assert(bad.isEmpty)
  }

  // ----------------------------------------------------------- q44 funnel
  test("q44: three stages, monotone non-increasing, matches the join-cascade brute force") {
    val f = etl.Windowing.q44.build(spark, sfDir).cache()
    assert(f.count() == 3)
    val byStage = f.orderBy("stage").select("n_users").collect().map(_.getLong(0))
    assert(byStage(0) >= byStage(1) && byStage(1) >= byStage(2))

    // brute force via explicit join cascade (the oracle's shape, in Spark)
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), expr("ts div 1000000000").as("sec"))
    val s1 = ev.groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("sec"))).as("v"))
      .filter(col("v").isNotNull)
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("sec") > col("v"))
      .groupBy("user_id").agg(min(col("sec")).as("c"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("sec") > col("c"))
      .groupBy("user_id").agg(min(col("sec")).as("p"))
    assert(byStage(0) == s1.count())
    assert(byStage(1) == s2.count())
    assert(byStage(2) == s3.count())
    f.unpersist()
  }

  // ------------------------------------------------------ tx13 dup n-grams
  test("tx13: n-gram counts match token arithmetic; fractions in [0,1]") {
    val p = functions.TextAnalysis.tx13.build(spark, sfDir).cache()
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(split(functions.TextPrep.clean(col("text")), " ")).as("n_tok"))
    val j = p.join(toks, "doc_id")
    assert(j.filter(col("n_bigrams") =!= greatest(col("n_tok") - 1, lit(0))).isEmpty)
    assert(j.filter(col("n_trigrams") =!= greatest(col("n_tok") - 2, lit(0))).isEmpty)
    assert(p.filter(col("dup_bigram_frac") < 0 || col("dup_bigram_frac") > 1
      || col("dup_trigram_frac") < 0 || col("dup_trigram_frac") > 1).isEmpty)
    assert(p.count() == Tables.documents(spark, sfDir).count())
    p.unpersist()
  }

  // ------------------------------------------------------ tx14 seq packing
  test("tx14: per-source sequence count is ceil(total/512); spans chain without gaps") {
    val p = functions.TextAnalysis.tx14.build(spark, sfDir).cache()
    // budget arithmetic: last sequence id + 1 == ceil(total tokens / 512)
    val per = p.groupBy("source")
      .agg(sum(col("n_toks")).as("tot"), max(col("seq_last")).as("last"))
      .filter((col("last") + 1) =!= ceil(col("tot").cast("double") / 512).cast("long"))
    assert(per.isEmpty)
    assert(p.filter(col("n_seqs") =!= col("seq_last") - col("seq_first") + 1).isEmpty)
    assert(p.filter(col("seq_first") > col("seq_last")).isEmpty)
    // doc N+1 starts in the sequence doc N ends in, or the next one
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val chained = p.withColumn("prev_last", lag(col("seq_last"), 1).over(w))
      .filter(col("prev_last").isNotNull)
      .filter(col("seq_first") =!= col("prev_last") && col("seq_first") =!= col("prev_last") + 1)
    assert(chained.isEmpty)
    p.unpersist()
  }

  // ------------------------------------------------------ ann12 k-means
  test("ann12: full 8x64 grid, membership partitions the corpus, centroids in data range") {
    val m = operators.SimilaritySearch.ann12.build(spark, sfDir).cache()
    assert(m.count() == 8 * 64)
    assert(m.select(countDistinct(col("cell"))).head().getLong(0) == 8)
    // n_members is per-cell constant and partitions the corpus
    val perCell = m.groupBy("cell").agg(countDistinct(col("n_members")).as("nv"),
      max(col("n_members")).as("n"))
    assert(perCell.filter(col("nv") =!= 1).isEmpty)
    val total = perCell.agg(sum(col("n"))).head().getLong(0)
    assert(total == Tables.embeddings(spark, sfDir).count())
    // every centroid coordinate sits inside the data's per-dim range
    val dims = Tables.embeddings(spark, sfDir)
      .select(posexplode(transform(col("embedding"),
        x => round(x.cast("double") * 1e6).cast("long"))).as(Seq("p", "x")))
      .groupBy((col("p") + 1).as("dim"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    val bad = m.join(dims, "dim")
      .filter(col("c_scaled") < col("lo") - 1 || col("c_scaled") > col("hi"))
    assert(bad.isEmpty)
    m.unpersist()
  }

  // ------------------------------------------------- mm07 phash clusters
  test("mm07: identity groups cover the corpus exactly once; sizes consistent") {
    val g = multimodal.Multimodal.mm07.build(spark, sfDir).cache()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(g.count() == nDocs)
    assert(g.select(countDistinct(col("doc_id"))).head().getLong(0) == nDocs)
    // cluster sizes are consistent with the actual group populations
    val recount = g.groupBy("cluster_id").agg(count(lit(1)).as("actual"))
    assert(g.join(recount, "cluster_id").filter(col("cluster_size") =!= col("actual")).isEmpty)
    // exactly one canonical doc per cluster, and it owns the min doc_id
    val canon = g.groupBy("cluster_id")
      .agg(sum(when(col("is_canonical"), 1).otherwise(0)).as("nc"), min(col("doc_id")).as("lo"))
    assert(canon.filter(col("nc") =!= 1).isEmpty)
    assert(canon.filter(col("cluster_id") =!= col("lo")).isEmpty)
    g.unpersist()
  }

  test("mm07 mechanism: planted perceptual near-dups form one group (CC over phashPairs)") {
    import spark.implicits._
    // p-pieces planted directly: docs 1,2,3 within Hamming<=3 chain, 9 isolated
    val fp = Seq(
      (1L, 255L, 7L, 0L, 0L),
      (2L, 254L, 7L, 0L, 0L),   // hamming(1,2)=1
      (3L, 254L, 5L, 0L, 0L),   // hamming(2,3)=1, hamming(1,3)=2
      (9L, 0L, 0L, 1L << 15, 65535L)
    ).toDF("doc_id", "p0", "p1", "p2", "p3")
    val pairs = multimodal.Multimodal.phashPairs(fp)
    assert(pairs.count() == 3) // (1,2),(2,3),(1,3)
    val cc = operators.Dedup.connectedComponents(pairs)
    val labels = cc.select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  // ---------------------------------------------------- q45 sliding window
  test("q45: every window's aggregate equals the brute-force interval count") {
    val w = etl.Windowing.q45.build(spark, sfDir).cache()
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("ts div 1000000000").as("sec"))
    // 4 windows cover each event (1h length / 15min slide)
    val total = ev.count()
    assert(w.agg(sum(col("n_events"))).head().getLong(0) == 4 * total)
    // brute force: windows × events containment join
    val brute = w.select(col("window_start"), col("event_type"))
      .join(ev, Seq("event_type"))
      .filter(col("sec") >= col("window_start") && col("sec") < col("window_start") + 3600)
      .groupBy("window_start", "event_type").agg(count(lit(1)).as("expect"))
    val bad = w.join(brute, Seq("window_start", "event_type"))
      .filter(col("n_events") =!= col("expect"))
    assert(bad.isEmpty)
    w.unpersist()
  }

  // --------------------------------------------------- q46 trailing window
  test("q46: trailing-30-day spend equals the brute-force self-join") {
    val t = etl.Windowing.q46.build(spark, sfDir).cache()
    val o = Tables.orders(spark, sfDir).select(
      col("o_orderkey"), col("o_custkey"),
      datediff(col("o_orderdate").cast("date"), to_date(lit("1970-01-01"))).cast("long").as("od"),
      expr("CAST(ROUND(o_totalprice*100) AS BIGINT)").as("cents"))
    val brute = o.select(col("o_orderkey"), col("o_custkey"), col("od"))
      .join(o.select(col("o_custkey"), col("od").as("od2"), col("cents")), "o_custkey")
      .filter(col("od2") >= col("od") - 29 && col("od2") <= col("od"))
      .groupBy("o_orderkey")
      .agg((sum(col("cents")) / 100.0).as("expect_spend"), count(lit(1)).as("expect_n"))
    val bad = t.join(brute, "o_orderkey")
      .filter(col("spend_30d") =!= col("expect_spend") || col("n_orders_30d") =!= col("expect_n"))
    assert(bad.isEmpty)
    assert(t.count() == o.count())
    t.unpersist()
  }

  // ------------------------------------------------------ tx16 outlier docs
  test("tx16: every doc screened; z sign matches deviation; flags match |z|>3.5") {
    val o = functions.TextAnalysis.tx16.build(spark, sfDir).cache()
    assert(o.count() == Tables.documents(spark, sfDir).count())
    // robust z agrees in sign with the raw deviation
    assert(o.filter(col("mad_q") =!= 0)
      .filter(signum(col("robust_z")) =!= signum(col("quality") - col("med_q"))
        && col("robust_z") =!= 0).isEmpty)
    // the flag is exactly the |z| > 3.5 rule when MAD is positive
    assert(o.filter(col("mad_q") =!= 0)
      .filter(col("is_outlier") =!= (abs(col("robust_z")) > 3.5)).isEmpty)
    o.unpersist()
  }

  // --------------------------------------------------------- mm08 entropy
  test("mm08: histogram arithmetic consistent; uniform and constant payloads bound entropy") {
    val e = multimodal.Multimodal.mm08.build(spark, sfDir).cache()
    assert(e.count() == Tables.documents(spark, sfDir).count())
    // entropy bounded by [0, ln(distinct_chars)]; dominant share consistent
    assert(e.filter(col("entropy_nats") < 0).isEmpty)
    assert(e.filter(col("entropy_nats") > log(col("distinct_chars").cast("double")) + 1e-9).isEmpty)
    assert(e.filter(col("top_frac") * col("n_chars") < 1).isEmpty)
    assert(e.filter(col("distinct_chars") > col("n_chars") || col("distinct_chars") < 1).isEmpty)
    e.unpersist()
  }

  // ------------------------------------------------ q52/q53 pipeline
  test("q53: funnel is monotone and the splits partition the survivors") {
    val f = etl.Pipeline.q53.build(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(f("0_all") >= f("1_corpus"))
    assert(f("1_corpus") >= f("2_quality"))
    assert(f("2_quality") >= f("3_exact_dedup"))
    assert(f("3_exact_dedup") >= f("4_decontaminated"))
    val splits = f.filterKeys(_.startsWith("5_")).values.sum
    assert(splits == f("4_decontaminated"))
  }

  test("q52: pipeline agrees with its standalone operators (tx17 splits, dd09 leaks)") {
    val p = etl.Pipeline.q52.build(spark, sfDir).cache()
    // the pipeline's split assignment IS tx17's (same content-hash rule)
    val t17 = functions.TextAnalysis.tx17.build(spark, sfDir)
      .select(col("doc_id"), col("split").as("expect_split"))
    assert(p.join(t17, "doc_id").filter(col("split") =!= col("expect_split")).isEmpty)
    // no document dd09 flags as leaking survives the pipeline
    val leaks = operators.Dedup.dd09.build(spark, sfDir).select("doc_id")
    assert(p.join(leaks, "doc_id").isEmpty)
    // packing arithmetic holds per (source, split)
    val per = p.groupBy("source", "split")
      .agg(sum(col("n_tokens")).as("tot"), max(col("seq_last")).as("last"))
      .filter((col("last") + 1) =!= ceil(col("tot").cast("double") / 512).cast("long"))
    assert(per.isEmpty)
    p.unpersist()
  }

  // ---------------------------------------------- q49 distribution ranks
  test("q49: rank bounds hold and quartiles are balanced within each brand") {
    val r = etl.Reporting.q49.build(spark, sfDir).cache()
    assert(r.count() == Tables.part(spark, sfDir).count())
    assert(r.filter(col("pct_rank") < 0 || col("pct_rank") > 1
      || col("cume") <= 0 || col("cume") > 1).isEmpty)
    assert(r.filter(!col("quartile").isin(1L, 2L, 3L, 4L)).isEmpty)
    // ntile balance: quartile sizes within a brand differ by at most 1
    val sizes = r.groupBy("p_brand", "quartile").count()
    val spread = sizes.groupBy("p_brand")
      .agg((max(col("count")) - min(col("count"))).as("d"))
      .filter(col("d") > 1)
    assert(spread.isEmpty)
    r.unpersist()
  }

  // --------------------------------------------------------- q50 histogram
  test("q50: buckets partition the orders and conserve revenue") {
    val h = etl.Reporting.q50.build(spark, sfDir).cache()
    val o = Tables.orders(spark, sfDir)
    assert(h.agg(sum(col("n_orders"))).head().getLong(0) == o.count())
    val total = o.agg((sum(expr("CAST(ROUND(o_totalprice*1000000) AS BIGINT)")) / 1e6).as("t"))
      .head().getDouble(0)
    assert(math.abs(h.agg(sum(col("revenue"))).head().getDouble(0) - total) < 1e-6)
    assert(h.filter(col("lo") =!= col("bucket") * 60000).isEmpty)
    assert(h.filter(col("bucket") =!= 9 && col("hi") =!= (col("bucket") + 1) * 60000).isEmpty)
    h.unpersist()
  }

  // ----------------------------------------------------------- q51 streaks
  test("q51: streak accounting matches the distinct (user, day) grid") {
    val s51 = etl.Windowing.q51.build(spark, sfDir).cache()
    val grid = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("(ts div 1000000000) div 86400").as("day")).distinct()
    val perUser = grid.groupBy("user_id").agg(count(lit(1)).as("expect_days"),
      max(col("day")).as("expect_last"))
    val j = s51.join(perUser, "user_id")
    assert(j.filter(col("active_days") =!= col("expect_days")).isEmpty)
    assert(j.filter(col("last_active_day") =!= col("expect_last")).isEmpty)
    assert(s51.filter(col("longest_streak") > col("active_days")
      || col("longest_streak") < 1).isEmpty)
    assert(s51.count() == grid.select("user_id").distinct().count())
    s51.unpersist()
  }

  // ------------------------------------------------------ tx17 split assign
  test("tx17: every doc split by the bucket rule; identical content shares a split") {
    val t = functions.TextAnalysis.tx17.build(spark, sfDir).cache()
    assert(t.count() == Tables.documents(spark, sfDir).count())
    assert(t.filter(
      (col("bucket") < 80 && col("split") =!= "train") ||
      (col("bucket") >= 80 && col("bucket") < 90 && col("split") =!= "val") ||
      (col("bucket") >= 90 && col("split") =!= "test")).isEmpty)
    // content-addressed: byte-identical cleaned text never straddles splits
    val withKey = t.join(
      Tables.documents(spark, sfDir).select(col("doc_id"),
        md5(functions.TextPrep.clean(col("text"))).as("k")), "doc_id")
    val straddle = withKey.groupBy("k")
      .agg(countDistinct(col("split")).as("n")).filter(col("n") > 1)
    assert(straddle.isEmpty)
    t.unpersist()
  }

  // ---------------------------------------------------- q48 unpivot/melt
  test("q48: melt preserves the full grid and conserves total revenue") {
    val m = etl.Reporting.q48.build(spark, sfDir).cache()
    val statuses = Tables.orders(spark, sfDir)
      .select(countDistinct(col("o_orderstatus"))).head().getLong(0)
    assert(m.count() == statuses * 3) // every (status, class) cell, zeros kept
    assert(m.groupBy("o_orderstatus", "prio_class").count()
      .filter(col("count") =!= 1).isEmpty)
    val total = Tables.orders(spark, sfDir)
      .agg((sum(expr("CAST(ROUND(o_totalprice*1000000) AS BIGINT)")) / 1e6).as("t"))
      .head().getDouble(0)
    val melted = m.agg(sum(col("revenue"))).head().getDouble(0)
    assert(math.abs(melted - total) < 1e-6)
    m.unpersist()
  }

  // ------------------------------------------------- dd14 multi-signal
  test("dd14: refines never splits — dd06's LSH clusters stay together; signals well-formed") {
    val m = operators.Dedup.dd14.build(spark, sfDir).cache()
    // more edges can only coarsen: any two docs dd06 clusters together
    // must map to one dd14 cluster
    val lshOnly = operators.Dedup.dd06.build(spark, sfDir)
      .select(col("doc_id"), col("cluster_id").as("lsh_cluster"))
    val split = lshOnly.join(m.select(col("doc_id"), col("cluster_id")), "doc_id")
      .groupBy("lsh_cluster")
      .agg(countDistinct(col("cluster_id")).as("n"))
      .filter(col("n") =!= 1)
    assert(split.isEmpty)
    assert(m.filter(!col("signals").isin("lsh", "containment", "containment+lsh")).isEmpty)
    val recount = m.groupBy("cluster_id").agg(count(lit(1)).as("actual"))
    assert(m.join(recount, "cluster_id").filter(col("cluster_size") =!= col("actual")).isEmpty)
    m.unpersist()
  }

  // ---------------------------------------------------- ann14 graph rank
  test("ann14: one score per mutual-graph node, base mass floor, global mass bounded") {
    val g = operators.SimilaritySearch.ann14.build(spark, sfDir).cache()
    val medges = operators.SimilaritySearch.ann11.build(spark, sfDir)
      .filter(col("mutual") === 1)
    val nodes = medges.select(col("src_id")).distinct().count()
    assert(g.count() == nodes)
    // every node keeps at least the random-jump base mass
    assert(g.filter(col("score") < 150000).isEmpty)
    // floors only lose mass: the total never exceeds the initial allocation
    assert(g.agg(sum(col("score"))).head().getLong(0) <= nodes * 1000000L)
    // degree column matches the actual mutual out-degree
    val deg = medges.groupBy(col("src_id").as("vec_id")).agg(count(lit(1)).as("expect"))
    assert(g.join(deg, "vec_id").filter(col("degree") =!= col("expect")).isEmpty)
    g.unpersist()
  }

  // ---------------------------------------------------- ann13 index drift
  test("ann13: membership partitions the corpus; an unchanged cell has zero drift") {
    val m = operators.SimilaritySearch.ann13.build(spark, sfDir).cache()
    val total = m.agg(sum(col("n_base") + col("n_new"))).head().getLong(0)
    assert(total == Tables.embeddings(spark, sfDir).count())
    assert(m.filter(col("growth_ppm") < 0 || col("growth_ppm") > 1000000).isEmpty)
    assert(m.filter(col("drift_sq") < 0).isEmpty)
    // no delta arrivals -> the mean cannot have moved (exact, not epsilon)
    assert(m.filter(col("n_new") === 0 && col("drift_sq") =!= 0).isEmpty)
    m.unpersist()
  }

  // ------------------------------------------------------- q47 reconcile
  test("q47: classes partition both tables; referential integrity visible in output") {
    val r = etl.RelationalCore.q47.build(spark, sfDir).cache()
    val nOrders = Tables.orders(spark, sfDir).count()
    val liOrders = Tables.lineitem(spark, sfDir)
      .select(countDistinct(col("l_orderkey"))).head().getLong(0)
    assert(r.count() == nOrders) // right_only is empty, so keys == orders
    val byStatus = r.groupBy("status").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(byStatus.getOrElse("right_only", 0L) == 0L)
    assert(byStatus.getOrElse("left_only", 0L) == nOrders - liOrders)
    assert(byStatus.getOrElse("matched", 0L) + byStatus.getOrElse("drift", 0L) == liOrders)
    // diff arithmetic holds row-wise
    assert(r.filter(col("status") === "matched" && col("diff_micros") =!= 0).isEmpty)
    assert(r.filter(col("status") === "left_only")
      .filter(col("diff_micros") =!= col("order_micros")).isEmpty)
    r.unpersist()
  }

  // --------------------------------------------------------- tx15 zipf fit
  test("tx15: Zipfian slopes negative, r2 in [0,1], n_types agrees with tx11") {
    val z = functions.TextAnalysis.tx15.build(spark, sfDir).cache()
    assert(z.filter(col("slope") >= 0).isEmpty)
    assert(z.filter(col("r2") < 0 || col("r2") > 1).isEmpty)
    val v = functions.TextAnalysis.tx11.build(spark, sfDir)
      .select(col("source"), col("n_types").as("expect_types"))
    assert(z.join(v, "source").filter(col("n_types") =!= col("expect_types")).isEmpty)
    z.unpersist()
  }
}
