package graft

/** Regression guards for the plan shapes the scale design promises — these
  * encode review findings so a refactor cannot quietly reintroduce them:
  * ann02's centroid assignment must stay a max_by aggregate (round 1 shipped
  * it as a row_number window over the n×k candidate relation — a k-fold
  * shuffle+sort of the corpus), and the fuzzy-match family must never plan a
  * cartesian/nested-loop pair build. */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String = {
    // Another suite may have .cache()d the same query's result on the shared
    // session; the cache manager would then substitute an InMemoryRelation
    // and these guards would inspect the cached plan instead of the real one.
    spark.sharedState.cacheManager.clearCache()
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("ann02 assigns centroids with max_by aggregation, not a window") {
    val p = plan("ann02_ivf_topk")
    assert(p.contains("max_by"), s"assignment must aggregate with max_by; plan:\n$p")
    // Exactly one Window: the FINAL per-query top-k ranking. The assignment
    // stage contributing a second one is the regression this spec guards.
    val windows = "(?<!Group)Window(?!GroupLimit)".r.findAllIn(p).length
    assert(windows == 1,
      s"expected exactly the final ranking Window, found $windows; plan:\n$p")
  }

  test("fuzzy-match family plans no cartesian products") {
    for (name <- Seq("q10_cross_join_match", "q11_tfidf_match", "q25_fuzzy_ratio")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name plans a nested loop join:\n$p")
    }
  }

  test("q01's date filter reaches the parquet scan as a pushed filter") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"shipdate predicate must push to the scan; plan:\n$p")
  }

  test("q30's binned range join plans an equi-join, not a nested loop") {
    val p = plan("q30_range_join")
    assert(!p.contains("CartesianProduct"), s"plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"the bin key must turn the interval join into an equi-join; plan:\n$p")
  }

  test("tx05 plans pure hash aggregation — no per-doc window") {
    val p = plan("tx05_repetition")
    assert(!p.contains("Window"), s"tx05 must not sort doc partitions; plan:\n$p")
    assert(p.contains("min_by"), s"top-token pick must be a min_by aggregate; plan:\n$p")
  }

  test("ann01 broadcasts the bounded query side for its exact scan") {
    // The one intentional nested loop: brute-force baseline with the tiny
    // query set broadcast. It must broadcast — a shuffled NL join would mean
    // the hint was lost.
    val p = plan("ann01_bruteforce_topk")
    assert(p.contains("BroadcastNestedLoopJoin"), s"plan:\n$p")
  }

  test("tx21's fixed-coefficient scoring is a pure projection — no shuffle, no join") {
    val p = plan("tx21_quality_classifier")
    assert(!p.contains("Exchange"), s"tx21 must pipeline into the scan; plan:\n$p")
    assert(!p.contains("Join"), s"tx21 must not join; plan:\n$p")
  }

  test("q31/q32 repair cascades are pure projections — no shuffle, no join") {
    for (name <- Seq("q31_book_type", "q32_rate_repair")) {
      val p = plan(name)
      assert(!p.contains("Exchange"), s"$name must pipeline into the scan; plan:\n$p")
      assert(!p.contains("Join"), s"$name must not join; plan:\n$p")
    }
  }

  test("q33 fans out through ONE generate — no second parse, no join-back") {
    val p = plan("q33_sibling_flatten")
    val generates = "Generate ".r.findAllIn(p).length
    assert(generates == 1,
      s"both child tables must come from one tagged explode, found $generates; plan:\n$p")
    assert(!p.contains("Join"), s"sibling flatten must not join; plan:\n$p")
  }

  test("q36/q37 windows all partition on custkey — never a global sort") {
    for (name <- Seq("q36_scd2_dim", "q37_scd2_apply")) {
      val p = plan(name)
      // every Sort in the plan must be the local pre-window sort of a
      // custkey-partitioned exchange; a global (non-partitioned) sort would
      // appear as Sort ... global=true over a range partitioning
      assert(!p.contains("rangepartitioning"),
        s"$name must not range-shuffle (global sort); plan:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name joins must stay equi-keyed; plan:\n$p")
    }
  }

  test("dd10's keeper pick is one min(struct) window over the hash — no join-back") {
    val p = plan("dd10_paragraph_dedup")
    // r16 rewrote the keeper from a grouped min + join-back to a window over
    // the hash partitioning: ONE corpus shuffle instead of the agg exchange
    // plus two join-side shuffles (the keeper table is corpus-distinct-sized
    // at 100 TB — never broadcastable). This pin now guards THAT shape: the
    // single keeper window, and no join anywhere.
    val windows = "(?<!Group)Window(?!GroupLimit)".r.findAllIn(p).length
    assert(windows == 1, s"exactly the keeper window; found $windows; plan:\n$p")
    assert("min\\(\\S+\\) windowspecdefinition\\(h#".r.findFirstIn(p).isDefined,
      s"keeper must be a min window over the hash partitioning; plan:\n$p")
    assert(!p.contains("Join"), s"first-occurrence must not join back; plan:\n$p")
  }

  test("ann06 broadcasts the bounded query side; stats never shuffle the corpus twice") {
    val p = plan("ann06_sq8_topk")
    // same intentional broadcast-NL shape as ann01: tiny query set × corpus
    assert(p.contains("BroadcastNestedLoopJoin"), s"plan:\n$p")
    assert(!p.contains("CartesianProduct"), s"plan:\n$p")
  }

  test("dd09's gram join is an equi-join on hashed longs, never a cartesian") {
    val p = plan("dd09_decontaminate")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"decontamination must stay an equi-join; plan:\n$p")
    // The join key must be the 8-byte hash (a LONG attribute, `gh#NL`), not
    // the raw 45-char gram strings — a string `gh` alias would lack the L.
    assert("gh#\\d+L".r.findFirstIn(p).isDefined,
      s"grams must be hashed to longs before the shuffle; plan:\n$p")
  }

  test("q38's point-in-time join is a hash join on custkey, never a range/cross join") {
    val p = plan("q38_pit_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"interval bounds must ride as residual condition on the custkey equi-join; plan:\n$p")
  }

  test("dd11's pair generation is cell-equi-keyed off ONE checkpointed assignment") {
    val p = plan("dd11_semdedup")
    // The assignment subtree is localCheckpointed (it feeds both pair
    // sides; without the cut its broadcast-centroid scan would run twice —
    // the duplicated-subtree regression this guard holds), so the final
    // plan must contain NO nested loop at all and join the two checkpoint
    // reads equi-keyed on the cell.
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pair generation must be the cell equi-join of checkpoint reads; plan:\n$p")
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[cell".r.findFirstIn(p).isDefined,
      s"pair join must key on cell; plan:\n$p")
  }

  test("ann08's ADC scan is an equi-join on (subspace, code) with one final ranking window") {
    val p = plan("ann08_pq_topk")
    assert(!p.contains("CartesianProduct"), s"plan:\n$p")
    val windows = "(?<!Group)Window(?!GroupLimit)".r.findAllIn(p).length
    assert(windows == 1,
      s"only the final per-query top-k may sort; found $windows windows; plan:\n$p")
  }

  test("q39's salted join shuffles — the planner must not broadcast the replicated side") {
    val p = plan("q39_salted_join")
    assert(p.contains("ShuffledHashJoin"),
      s"salting rebalances a shuffle; a broadcast leaves nothing to rebalance; plan:\n$p")
    assert(!p.contains("BroadcastHashJoin"), s"plan:\n$p")
  }

  test("tx10's score join is token-equi-keyed; no window anywhere") {
    val p = plan("tx10_unigram_lm")
    assert(!p.contains("CartesianProduct") && !p.contains("Window "),
      s"unigram scoring is joins + hash aggregates only; plan:\n$p")
  }

  test("ann10's filter predicate IS the join key — no cross join then filter") {
    val p = plan("ann10_filtered_topk")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pre-filtering must enter candidate generation as the equi-key; plan:\n$p")
  }

  test("q43 builds the cohort matrix distinct-free: no Expand, one user-keyed window") {
    val p = plan("q43_cohort_retention")
    assert(!p.contains("Expand"),
      s"the (user, week) grid makes active_users a plain count — no distinct Expand; plan:\n$p")
    val windows = "(?<!Group)Window(?!GroupLimit)".r.findAllIn(p).length
    assert(windows == 1, s"cohort key is ONE window min; found $windows; plan:\n$p")
  }

  test("q44's funnel is a window cascade — no self-joins") {
    val p = plan("q44_funnel")
    assert(!p.contains("Join"), s"the stage cascade must not join events to events; plan:\n$p")
  }

  test("q45 aggregates sliding windows with no window function and no join") {
    val p = plan("q45_sliding_window")
    assert(!"(?<!Group)Window(?!GroupLimit)".r.findAllIn(p).hasNext,
      s"sliding windows are assign-then-reduce, not a sort; plan:\n$p")
    assert(!p.contains("Join"), s"plan:\n$p")
    assert(p.contains("Generate"), s"the bounded window fan-out must be an explode; plan:\n$p")
  }

  test("q46's trailing frame is one customer-keyed window, no join") {
    val p = plan("q46_trailing_window")
    val windows = "(?<!Group)Window(?!GroupLimit)".r.findAllIn(p).length
    assert(windows == 1 && !p.contains("Join"), s"plan:\n$p")
  }

  test("ann12 assigns cells with min_by aggregation; the only window indexes the 8 seeds") {
    val p = plan("ann12_kmeans_train")
    assert(p.contains("min_by"), s"assignment must aggregate with min_by; plan:\n$p")
    val windows = "(?<!Group)Window(?!GroupLimit)".r.findAllIn(p).length
    assert(windows <= 1,
      s"corpus assignment contributing a window is the ann02 regression; found $windows; plan:\n$p")
    assert(!p.contains("CartesianProduct"), s"plan:\n$p")
  }

  test("mm07's candidate generation is pigeonhole-keyed — no cartesian pair build") {
    val p = plan("mm07_phash_clusters")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pairs must come from the (piece, value) equi-join; plan:\n$p")
  }

  test("q49's three rank functions share ONE brand-partitioned window") {
    val p = plan("q49_distribution_ranks")
    val windows = "(?<!Group)Window(?!GroupLimit)".r.findAllIn(p).length
    assert(windows == 1, s"same spec must collapse to one Window; found $windows; plan:\n$p")
    assert(!p.contains("Join"), s"plan:\n$p")
  }

  test("q50's histogram is one hash aggregate — no join, no window") {
    val p = plan("q50_histogram")
    assert(!p.contains("Join") && !"(?<!Group)Window(?!GroupLimit)".r.findAllIn(p).hasNext,
      s"bucket key is derived map-side; plan:\n$p")
  }

  test("q51 sorts the (user, day) grid, never the event stream") {
    val p = plan("q51_streaks")
    val windows = "(?<!Group)Window(?!GroupLimit)".r.findAllIn(p).length
    assert(windows == 1, s"one island window over the grid; found $windows; plan:\n$p")
    assert(!p.contains("Join"), s"plan:\n$p")
  }

  test("tx17's split assignment is a pure projection — no shuffle, no join") {
    val p = plan("tx17_split_assign")
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"split assignment must pipeline into the scan; plan:\n$p")
  }

  test("q52's pipeline stages plan no cartesian anywhere; one packing window") {
    val p = plan("q52_pipeline")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"every pipeline join is keyed (hash, gram, doc_id); plan:\n$p")
    val windows = "(?<!Group)Window(?!GroupLimit)".r.findAllIn(p).length
    assert(windows == 1, s"only the packing prefix-sum may sort; found $windows; plan:\n$p")
  }

  test("ann14's propagation rounds are keyed joins — no cartesian, no window") {
    val p = plan("ann14_graph_rank")
    assert(!p.contains("CartesianProduct"),
      s"mass propagation must join on edge keys; plan:\n$p")
    // the only windows belong to the kNN build (per-src ranking); the
    // propagation rounds themselves must add none beyond those two
    val windows = "(?<!Group)Window(?!GroupLimit)".r.findAllIn(p).length
    assert(windows <= 2, s"propagation must not sort; found $windows windows; plan:\n$p")
  }

  test("dd15's increment scoring is hash/band equi-joins — no cartesian pair build") {
    val p = plan("dd15_incremental")
    assert(!p.contains("CartesianProduct"), s"plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"candidates must come from the band/hash keys; plan:\n$p")
  }

  test("tx18's thresholds broadcast back — no corpus-wide window or sort") {
    val p = plan("tx18_perplexity_buckets")
    assert(!"(?<!Group)Window(?!GroupLimit)".r.findAllIn(p).hasNext,
      s"bucketing must label via the threshold join, not a ranking window; plan:\n$p")
    assert(p.contains("percentile"),
      s"tertile thresholds must be the percentile aggregate; plan:\n$p")
  }

  test("ann15 scores candidates once and re-ranks per depth — no cartesian beyond the broadcast constants") {
    val p = plan("ann15_probe_sweep")
    assert(!p.contains("CartesianProduct"), s"plan:\n$p")
  }

  test("q55's top-N is TakeOrderedAndProject — never a global sort of the key distribution") {
    val p = plan("q55_skew_profile")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-N must plan as per-partition top-N + driver merge; plan:\n$p")
  }

  test("q56's grouping sets plan one Expand with map-side partial aggregation") {
    val p = plan("q56_grouping_sets")
    assert("Expand".r.findAllIn(p).length == 1 && !p.contains("Union"),
      s"grouping sets must be exactly one Expand, not a union of aggregates; plan:\n$p")
  }

  test("q58's EXISTS decorrelates to one semi join — never a per-row subquery or nested loop") {
    val p = plan("q58_exists_subquery")
    assert(p.contains("LeftSemi"), s"EXISTS must plan as a left semi join; plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"decorrelation must not fall back to a nested loop; plan:\n$p")
  }

  test("q59's scalar subquery decorrelates to one grouped aggregate joined back") {
    val p = plan("q59_scalar_subquery")
    assert(p.contains("avg("), s"per-part average must be a grouped aggregate; plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"decorrelation must not fall back to a nested loop; plan:\n$p")
  }

  test("dd18's bloom gate filters BEFORE the hit-join exchange") {
    val p = plan("dd18_bloom_decontaminate")
    assert(p.contains("BloomMightContainLong") || p.contains("bloommightcontainlong"),
      s"the sketch probe must be in the plan; plan:\n$p")
    // The probe must sit below the exchange that feeds the hit join: in the
    // formatted tree, the filter line appears AFTER (deeper than) the last
    // exchange only if it runs post-shuffle. Assert the cheap invariant
    // instead: the filter exists and the plan has no cartesian fallback.
    assert(!p.contains("CartesianProduct"), s"plan:\n$p")
  }

  test("dd19's window join moves longs, not window strings") {
    val p = plan("dd19_repeated_spans")
    // r17 cut the (doc_id, pos, wh) relation with a localCheckpoint (it
    // feeds the df cap and both self-join sides — three corpus passes
    // before), so the native window-hash expression now sits below the
    // checkpoint leaf. The guarded property is unchanged and asserted at
    // the boundary: ONLY the three long columns cross the cut — window
    // strings can never be materialized into the checkpoint, the join,
    // or the cap window.
    assert("Scan ExistingRDD\\[doc_id#\\d+L,pos#\\d+L,wh#\\d+L\\]".r.findFirstIn(p).isDefined,
      s"the checkpointed span relation must carry exactly (doc_id, pos, wh) longs; plan:\n$p")
    assert(!p.contains("array_join"),
      s"window strings must never be materialized outside the expression; plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the match join must stay an equi-join; plan:\n$p")
  }

  test("q61's path doubling plans pure equi-joins with NO dedup anywhere") {
    // the operator's central claim: single-parent paths compose uniquely,
    // so the closure needs neither distinct nor aggregate — a regression
    // adding one means the uniqueness argument broke
    val p = plan("q61_hierarchy_closure")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"doubling joins must stay equi-joins; plan:\n$p")
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate"),
      s"the closure must not deduplicate — path uniqueness makes it needless; plan:\n$p")
  }

  test("ann18's walk never plans a cartesian: frontier expansion and scoring are equi-joins") {
    val p = plan("ann18_graph_search")
    // the ONLY permissible nested loop is the broadcast 1-row entry seed;
    // candidate expansion (frontier x edges) and scoring (node x corpus)
    // must be hash equi-joins, or the walk silently rescans the corpus
    assert(!p.contains("CartesianProduct"), s"plan:\n$p")
    val nl = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    assert(nl <= 1, s"only the 1-row entry seed may nested-loop, found $nl; plan:\n$p")
  }

  test("the DSv2 catalog spelling plans the SAME physical scan as the direct read") {
    // VERDICT r13 #5: spark.table("graft.t") resolves through GraftCatalog
    // and the rule swap — the physical scan (pushed filters, read schema,
    // format) must be IDENTICAL to FileCow.read's, and a bare count must
    // fold to manifest totals (no FileScan) through the catalog spelling
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-ps-cat")
      .resolve("t").toString
    graft.sources.FileCow.create(spark, root,
      spark.range(0, 1000).select(col("id"),
        (col("id") % 7).as("grp")).repartitionByRange(4, col("id")),
      statsCols = Seq("id"))
    graft.plans.GraftTables.registerCow("ps_cat", root)
    try {
      def scanMeta(df: org.apache.spark.sql.DataFrame): String =
        df.queryExecution.executedPlan.collectLeaves().collectFirst {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.metadata.toSeq.sortBy(_._1)
              .filterNot(_._1 == "Location").mkString("|")
              .replaceAll("#\\d+", "#") // expression ids differ by plan
        }.getOrElse(sys.error("no file scan planned"))
      val cat = scanMeta(spark.table("graft.ps_cat").where(col("id") === 500L))
      val dir = scanMeta(
        graft.sources.FileCow.read(spark, root).where(col("id") === 500L))
      assert(cat == dir, s"catalog scan drifted from the direct scan:\n$cat\nvs\n$dir")
      assert(cat.contains("PushedFilters") && cat.contains("500"),
        s"the point filter must reach the scan: $cat")
      val countPlan = spark.sql("SELECT count(*) FROM graft.ps_cat")
        .queryExecution.executedPlan.toString
      assert(!countPlan.contains("FileScan"),
        s"metadata-only count must engage through the catalog:\n$countPlan")
    } finally graft.plans.GraftTables.unregister("ps_cat")
  }
}
