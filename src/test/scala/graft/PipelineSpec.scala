package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Sources

/** End-to-end pipeline integration: the reference's dw2→dw5 flow chained
  * through this library's operators on real test tables — flatten ingest,
  * anti-join incremental merge, fact build, near-dup corpus pruning, and a
  * partition-pruned fact landing. Guards cross-module integration beyond the
  * per-operator oracle checks. */
class PipelineSpec extends SparkSpec {

  test("ingest -> merge -> fact -> partitioned landing conserves rows") {
    // 1. Ingest: flatten nested line-item documents (dw2 analog).
    val flat = SparkEntry.queries("q23_json_flatten")(spark, sfDir)
    val nLineitems = Tables.lineitem(spark, sfDir).count()
    assert(flat.count() == nLineitems, "flatten must recover every line item")

    // 2. Incremental merge (dw3): archive ∪ increment with anti-join, no key dupes.
    val merged = SparkEntry.queries("q06_incremental_merge")(spark, sfDir)
    val nOrders = Tables.orders(spark, sfDir).count()
    assert(merged.count() == nOrders)
    assert(merged.select("o_orderkey").distinct().count() == nOrders)

    // 3. Fact build (dw5): line-item grain with dims attached.
    val fact = SparkEntry.queries("q02_fact_order")(spark, sfDir)
    assert(fact.count() == nLineitems, "fact is line-item grain")

    // 4. Partitioned landing: month partitions, pruned reads agree with source.
    val out = Files.createTempDirectory("graft-pipeline").toString
    Sources.writeFactPartitioned(
      Tables.orders(spark, sfDir), "o_orderdate", out)
    val landed = Sources.readFact(spark, out)
    assert(landed.count() == nOrders)
    val byMonth = landed.groupBy("part_month").count()
    assert(byMonth.agg(sum("count")).head.getLong(0) == nOrders)
  }

  test("dim-match -> bundle-attribution flow (dw4 -> dw5 analog)") {
    // dw4: fuzzy dim matching. Independent recall expectation: the test-title
    // construction plants, for every master with p_partkey % 4 == 0 (always
    // even, so the % 2 == 0 last-char-drop branch applies), the pair
    // (m, m minus its last char) at lev = 1 — which clears ratio >= 95
    // whenever 1/(2L-1) <= 0.05, i.e. len(m) >= 11. Every such planted pair
    // must be recalled through the blocking + verify pipeline.
    val ratio = SparkEntry.queries("q25_fuzzy_ratio")(spark, sfDir)
    val planted = Tables.part(spark, sfDir).filter(col("p_partkey") % 4 === 0)
      .select(lower(col("p_name")).as("master_title")).distinct()
      .filter(length(col("master_title")) >= 11)
      .withColumn("test_title",
        expr("substring(master_title, 1, length(master_title) - 1)"))
    val nPlanted = planted.count()
    assert(nPlanted > 0, "corpus must plant last-char-drop matches")
    val missed = planted.join(ratio, Seq("master_title", "test_title"), "left_anti")
    assert(missed.count() == 0, "q25 must recall every planted lev-1 pair")

    // dw5: bundle attribution consumes the fact flow; spot-check the global
    // invariant (per-order conservation is BundleConservationSpec's job):
    // total attributed revenue equals the sum of bundle totals of orders
    // that have at least one component line.
    val attr = SparkEntry.queries("q26_bundle_attribution")(spark, sfDir)
    val attributedTotal = attr.agg(sum("attributed")).head.getDouble(0)
    import graft.functions.Exact.micros
    val li = Tables.lineitem(spark, sfDir)
    val withComponents = li.filter(col("l_linenumber") > 1)
      .select(col("l_orderkey")).distinct()
    val bundleTotal = li.filter(col("l_linenumber") === 1)
      .groupBy("l_orderkey")
      .agg((min(micros(col("l_extendedprice") * (lit(1) - col("l_discount")))) / 1e6).as("t"))
      .join(withComponents, Seq("l_orderkey"), "left_semi")
      .agg(sum("t")).head.getDouble(0)
    assert(math.abs(attributedTotal - bundleTotal) < 1.0,
      s"attributed=$attributedTotal vs bundles=$bundleTotal")
  }

  test("near-dup swap-in narrows the pipeline and drops exactly the cluster casualties") {
    val base = etl.Pipeline.curated(spark, sfDir).cache()
    val nd = etl.Pipeline.curated(spark, sfDir, nearDup = true).cache()
    // with-neardup ⊆ without: stage 3b only removes docs
    assert(nd.join(base, Seq("doc_id"), "left_anti").isEmpty)
    assert(nd.count() < base.count(), "test corpus plants near-dups the swap-in must prune")
    // the removed set is EXACTLY base ∩ (clustered non-survivors)
    val survivors = SparkEntry.queries("dd07_keep_best")(spark, sfDir)
      .select(col("survivor_id").as("doc_id"))
    val casualties = SparkEntry.queries("dd06_dup_clusters")(spark, sfDir)
      .select("doc_id").join(survivors, Seq("doc_id"), "left_anti")
    val removed = base.select("doc_id").join(nd.select("doc_id"), Seq("doc_id"), "left_anti")
    val expected = base.select("doc_id").join(casualties, Seq("doc_id"), "left_semi")
    assert(removed.exceptAll(expected).isEmpty && expected.exceptAll(removed).isEmpty)
    // surviving rows are untouched in content: same (source, split, n_tokens)
    assert(nd.exceptAll(base.join(nd.select("doc_id"), Seq("doc_id"), "left_semi")).isEmpty)
    base.unpersist(); nd.unpersist()
  }

  test("dedup stage prunes the corpus to canonical docs only") {
    val docs = Tables.documents(spark, sfDir)
    val clusters = SparkEntry.queries("dd06_dup_clusters")(spark, sfDir)
    // Corpus after dedup: drop non-canonical members of every near-dup cluster.
    val drop = clusters.filter(!col("is_canonical")).select(col("doc_id"))
    val kept = docs.join(drop, Seq("doc_id"), "left_anti")
    val nDocs = docs.count()
    val nDrop = drop.count()
    assert(nDrop > 0, "test corpus plants near-dups")
    assert(kept.count() == nDocs - nDrop)
    // Every cluster keeps exactly one canonical representative.
    val perCluster = clusters.groupBy("cluster_id")
      .agg(sum(when(col("is_canonical"), 1).otherwise(0)).as("canon"))
    assert(perCluster.filter(col("canon") =!= 1).count() == 0)
  }
}
