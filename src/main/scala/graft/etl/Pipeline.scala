package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.functions.{TextAnalysis, TextPrep, WordShinglesN}
import graft.functions.TextPrep.{charHash, charHashSql, clean, cleanSql}

/** A52/A53: the END-TO-END corpus curation pipeline — the proof that the
  * engine's operators are composable primitives, not isolated demos. One
  * DataFrame program chains the stages a training corpus actually passes
  * through, each stage the SAME logic as its standalone operator:
  *
  *   eval holdout (dd09's doc_id % 17 split)
  *   → quality gate (tx08's ordered thresholds over tx02's signals)
  *   → exact dedup, first-occurrence-wins (dd01's content-hash keep rule)
  *   → benchmark decontamination (dd09's 8-gram overlap vs the holdout)
  *   → train/val/test assignment (tx17's content-hash buckets)
  *   → sequence packing (tx14's prefix-sum grid, per (source, split))
  *
  * q52 emits the curated, packed corpus — the relation a trainer reads;
  * q53 emits the funnel (per-stage survivor counts + final split sizes),
  * the ops dashboard for the same run. Near-dup clustering (dd06/dd07)
  * slots in between stages 3 and 4 as a swap-in — `curated(nearDup =
  * true)`, exercised by PipelineSpec — while the oracled default keeps the
  * pipeline's oracle a non-recursive CTE chain.
  *
  * Scale: every stage is the standalone operator's plan — gate and split
  * are scan projections, dedup is one content-hash aggregate + semi-join,
  * decontamination is a broadcast gram join, packing is a per-(source,
  * split) prefix sum. The stages pipeline: nothing materializes between
  * them except the one shared checkpoint of the gated relation (consumed
  * by the dedup keep-set AND the survivor join).
  */
object Pipeline {

  /** Stage flags + final columns for every corpus doc. Checkpointed pieces
    * are the ones consumed by more than one downstream stage.
    *
    * `nearDup = true` enables the swap-in the header promises: stage 3b,
    * between exact dedup and decontamination, drops every LSH-clustered doc
    * that is not its cluster's dd07 survivor (quality-best, min-id tie).
    * Strictly narrowing — the variant's survivors are a subset of the
    * default pipeline's at every later stage (PipelineSpec pins this). The
    * oracled q52/q53 run the default; the variant shares every stage's
    * code, so the swap-in is one boolean away in deployment, not a fork. */
  private[graft] def curated(
      s: SparkSession, d: String, nearDup: Boolean = false): DataFrame = {
    val doc = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("text"), clean(col("text")).as("c"))
    // Stage 1: the eval split never enters the training corpus.
    val corp = doc.filter(col("doc_id") % 17 =!= 0)
    // Stage 2: tx08's quality gates over tx02's signals.
    val gated = TextAnalysis.withQualitySignals(corp)
      .filter(col("pass"))
      .select(col("doc_id"), col("source"), col("c"), col("n_tokens"))
    // Stage 3: exact dedup — lowest doc_id per content hash survives (dd01),
    // resolved as a window over the content-hash partitioning instead of a
    // keep-set aggregate joined back on doc_id: one corpus shuffle replaces
    // the agg exchange + two join-side shuffles, and `gated` drops to a
    // single consumer so its checkpoint goes too (guide §2.4).
    val ddExact = gated
      .withColumn("keep", min(col("doc_id")).over(Window.partitionBy(md5(col("c")))))
      .filter(col("doc_id") === col("keep"))
      .drop("keep")
    // Stage 3b (swap-in): near-dup pruning — every clustered doc except
    // its cluster's dd07 survivor is dropped; unclustered docs pass. The
    // cluster relation is built ONCE and both the survivor pick (dd07's
    // quality/min-id rule) and the casualty set derive from it — dd07's
    // own build would run the whole shingle→LSH→CC pipeline a second time.
    val dd = (
      if (!nearDup) ddExact
      else {
        val cl = graft.operators.Dedup.clusters(s, d)
          .localCheckpoint() // survivor pick AND casualty anti-join
        val casualties = cl.select("doc_id")
          .join(graft.operators.Dedup.survivorsFrom(cl, s, d), Seq("doc_id"), "left_anti")
        ddExact.join(casualties, Seq("doc_id"), "left_anti")
      }
    // TWO consumers — the contamination gram explode AND the anti-join's
    // left side — so without this cut the whole gate + keeper-window
    // subtree (the regex-heavy quality signals included) is recomputed
    // twice per execution (r16 dropped the checkpoint on a single-consumer
    // claim that was wrong; the r16 after-plan shows the duplicated Window
    // subtree). Lazy: the first action materializes the blocks.
    ).localCheckpoint(eager = false)
    // Stage 4: decontamination — any 8-gram shared with the holdout flags
    // the doc. Strict 8-grams on BOTH sides: gated docs carry >= 20 tokens
    // by stage 2, and eval docs are explicitly gated to >= 8 tokens so
    // shinglesN's whole-doc fallback for short strings cannot plant a
    // sub-8-gram the oracle's ev0 (WHERE len(t) >= 8) never sees.
    val evalGrams = doc.filter(col("doc_id") % 17 === 0)
      .filter(size(split(col("c"), " ")) >= 8)
      .select(explode(WordShinglesN.shinglesN(col("c"), 8)).as("gram"))
      .select(charHash(col("gram")).as("gh")).distinct()
    val contaminated = dd
      .select(col("doc_id"), explode(WordShinglesN.shinglesN(col("c"), 8)).as("gram"))
      .select(col("doc_id"), charHash(col("gram")).as("gh"))
      .join(broadcast(evalGrams), "gh")
      .select("doc_id").distinct()
    val cleaned = dd.join(contaminated, Seq("doc_id"), "left_anti")
    // Stage 5: content-hash split assignment (tx17).
    cleaned
      .withColumn("bucket", charHash(concat(lit("split:"), col("c"))) % 100)
      .withColumn("split",
        when(col("bucket") < 80, "train").when(col("bucket") < 90, "val").otherwise("test"))
      .select(col("doc_id"), col("source"), col("split"), col("n_tokens"))
  }

  /** Shared DuckDB CTE chain — stage for stage the standalone operators'
    * own oracle spellings, ending in `labeled`. */
  private val chainSql: String = {
    val feat =
      s"""SELECT doc_id, source, c,
         |  CAST(length(text) AS BIGINT) AS n_raw,
         |  CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
         |  CAST(len(string_split(c, ' ')) AS BIGINT) AS n_tokens,
         |  CAST(len(list_intersect(list_distinct(string_split(c, ' ')), ${TextAnalysis.sqlList(TextAnalysis.stopEn)})) AS BIGINT) AS stop_hits
         |FROM corp""".stripMargin
    s"""doc AS (SELECT doc_id, source, text, $cleanSql AS c FROM documents),
       |corp AS (SELECT * FROM doc WHERE doc_id % 17 <> 0),
       |feat AS ($feat),
       |gated AS (SELECT doc_id, source, c, n_tokens FROM feat
       |  WHERE n_tokens >= 20
       |    AND ROUND(CAST(n_alpha AS DOUBLE) / CAST(n_raw AS DOUBLE), 6) >= 0.8
       |    AND ROUND(CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) >= 0.02
       |    AND ${TextAnalysis.qualityFormulaSql("n_alpha", "n_raw", "n_tokens", "stop_hits")} >= 0.5),
       |keep AS (SELECT MIN(doc_id) AS doc_id FROM gated GROUP BY md5(c)),
       |dd AS (SELECT g.* FROM gated g JOIN keep k ON g.doc_id = k.doc_id),
       |tg0 AS (SELECT doc_id, string_split(c, ' ') AS t FROM dd),
       |tg AS (SELECT doc_id, ${charHashSql("gram")} AS gh FROM (
       |  SELECT doc_id, unnest(list_distinct(list_transform(range(0, len(t)-7), i -> array_to_string(t[i+1:i+8], ' ')))) AS gram
       |  FROM tg0 WHERE len(t) >= 8)),
       |ev0 AS (SELECT string_split(c, ' ') AS t FROM doc WHERE doc_id % 17 = 0),
       |evg AS (SELECT DISTINCT ${charHashSql("gram")} AS gh FROM (
       |  SELECT unnest(list_distinct(list_transform(range(0, len(t)-7), i -> array_to_string(t[i+1:i+8], ' ')))) AS gram
       |  FROM ev0 WHERE len(t) >= 8)),
       |contaminated AS (SELECT DISTINCT t.doc_id FROM tg t JOIN evg e ON t.gh = e.gh),
       |cleaned AS (SELECT dd.* FROM dd LEFT JOIN contaminated x ON dd.doc_id = x.doc_id
       |            WHERE x.doc_id IS NULL),
       |labeled AS (SELECT doc_id, source, n_tokens,
       |    CASE WHEN ${charHashSql("'split:' || c")} % 100 < 80 THEN 'train'
       |         WHEN ${charHashSql("'split:' || c")} % 100 < 90 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM cleaned)""".stripMargin
  }

  // ---------------------------------------------------------------- A52
  /** The curated, packed corpus — what the trainer reads. */
  val q52 = Q(
    "q52_pipeline",
    s"""WITH $chainSql,
      |cum AS (SELECT doc_id, source, split, n_tokens,
      |    SUM(n_tokens) OVER (PARTITION BY source, split ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cume
      |  FROM labeled)
      |SELECT doc_id, source, split, n_tokens,
      |  CAST((cume - n_tokens) // 512 AS BIGINT) AS seq_first,
      |  CAST((cume - 1) // 512 AS BIGINT) AS seq_last
      |FROM cum""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("source"), col("split")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    curated(s, d)
      .withColumn("cume", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("source"), col("split"), col("n_tokens"),
        expr("(cume - n_tokens) div 512").as("seq_first"),
        expr("(cume - 1) div 512").as("seq_last"))
  }

  // ---------------------------------------------------------------- A53
  /** The funnel — per-stage survivor counts plus final split sizes: the
    * run's ops dashboard, and the regression alarm (a threshold or dedup
    * change shows up here before anyone reads loss curves). */
  val q53 = Q(
    "q53_pipeline_funnel",
    s"""WITH $chainSql
      |SELECT stage, n_docs FROM (
      |  SELECT '0_all' AS stage, CAST((SELECT COUNT(*) FROM doc) AS BIGINT) AS n_docs
      |  UNION ALL SELECT '1_corpus', (SELECT COUNT(*) FROM corp)
      |  UNION ALL SELECT '2_quality', (SELECT COUNT(*) FROM gated)
      |  UNION ALL SELECT '3_exact_dedup', (SELECT COUNT(*) FROM dd)
      |  UNION ALL SELECT '4_decontaminated', (SELECT COUNT(*) FROM cleaned)
      |  UNION ALL SELECT '5_' || split, COUNT(*) FROM labeled GROUP BY split)""".stripMargin) { (s, d) =>
    val doc = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("text"), clean(col("text")).as("c"))
    val corp = doc.filter(col("doc_id") % 17 =!= 0)
    // Funnel from ONE flagged relation instead of one checkpoint per stage:
    // the gated relation carries its dd01 keeper (window over the content
    // hash, as in `curated`) so stage-2 and stage-3 counts read the same
    // materialization, and the decontamination verdict rides as a flag so
    // stage-4 and the split sizes share the other. 19 jobs → ~9 at
    // identical per-stage semantics (the flags are the stages' own
    // predicates; counts over flag filters ≡ counts over the old
    // per-stage DataFrames).
    val gated = TextAnalysis.withQualitySignals(corp)
      .filter(col("pass"))
      .select(col("doc_id"), col("source"), col("c"), col("n_tokens"))
      .withColumn("keep", min(col("doc_id")).over(Window.partitionBy(md5(col("c")))))
      .localCheckpoint() // consumed by the stage-2 count AND the dd chain
    val dd = gated.filter(col("doc_id") === col("keep"))
    val evalGrams = doc.filter(col("doc_id") % 17 === 0)
      .filter(size(split(col("c"), " ")) >= 8) // mirror ev0's len(t) >= 8 gate
      .select(explode(WordShinglesN.shinglesN(col("c"), 8)).as("gram"))
      .select(charHash(col("gram")).as("gh")).distinct()
    val contaminated = dd
      .select(col("doc_id"), explode(WordShinglesN.shinglesN(col("c"), 8)).as("gram"))
      .select(col("doc_id"), charHash(col("gram")).as("gh"))
      .join(broadcast(evalGrams), "gh")
      .select("doc_id").distinct()
    // flagged = EVERY gated row with its keeper and contamination verdict:
    // stage 2 = all rows, stage 3 = keepers, stage 4 = clean keepers —
    // the old per-stage DataFrames as flag predicates over one relation.
    val flagged = gated
      .join(contaminated.withColumn("contam", lit(1)), Seq("doc_id"), "left")
      .localCheckpoint() // stage-2/3/4 counts AND the split rollup
    val labeled = flagged
      .filter(col("doc_id") === col("keep") && col("contam").isNull)
      .withColumn("bucket", charHash(concat(lit("split:"), col("c"))) % 100)
      .withColumn("split",
        when(col("bucket") < 80, "train").when(col("bucket") < 90, "val").otherwise("test"))
    // Stages 0+1 fold into ONE conditional aggregate over the corpus scan
    // and stages 2+3+4 into ONE over the flagged relation (the stage
    // predicates become sum(when(...)) arms — identical counts, 6 count
    // jobs → 2 + the split rollup). The 2-row/3-row stacks come out of an
    // inline explode, never a second pass.
    val s01 = doc.agg(count(lit(1)).as("n0"),
        sum(when(col("doc_id") % 17 =!= 0, 1L).otherwise(0L)).as("n1"))
      .select(explode(array(
        struct(lit("0_all").as("stage"), col("n0").as("n_docs")),
        struct(lit("1_corpus").as("stage"), col("n1").as("n_docs")))).as("r"))
      .select(col("r.stage").as("stage"), col("r.n_docs").as("n_docs"))
    val kept = col("doc_id") === col("keep")
    val s234 = flagged.agg(count(lit(1)).as("n2"),
        sum(when(kept, 1L).otherwise(0L)).as("n3"),
        sum(when(kept && col("contam").isNull, 1L).otherwise(0L)).as("n4"))
      .select(explode(array(
        struct(lit("2_quality").as("stage"), col("n2").as("n_docs")),
        struct(lit("3_exact_dedup").as("stage"), col("n3").as("n_docs")),
        struct(lit("4_decontaminated").as("stage"), col("n4").as("n_docs")))).as("r"))
      .select(col("r.stage").as("stage"), col("r.n_docs").as("n_docs"))
    s01.unionByName(s234)
      .unionByName(labeled.groupBy(concat(lit("5_"), col("split")).as("stage"))
        .agg(count(lit(1)).as("n_docs")))
  }

  val queries: Seq[Q] = Seq(q52, q53)
}
