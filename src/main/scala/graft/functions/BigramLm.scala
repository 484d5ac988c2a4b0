package graft.functions

import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.functions.TextPrep._

/** tx22: interpolated BIGRAM language-model scoring — the CCNet/Wenzek et
  * al. 2020 perplexity filter at order 2 (their production filter is a
  * 5-gram KenLM; the modality is identical: score every document by its
  * cross-entropy under an n-gram LM trained on the corpus, then gate or
  * bucket on the score). tx10 covers the unigram floor; this adds the
  * CONTEXT term that actually separates fluent text from bag-of-words spam
  * — a document whose unigrams are all common but whose transitions are
  * improbable (shuffled text, keyword stuffing) scores well under tx10 and
  * badly here.
  *
  * Model: Jelinek–Mercer interpolation with a fixed λ (the closed-form
  * member of the KenLM smoothing family that both engines can replay
  * bit-for-bit — Kneser–Ney's discount bookkeeping would add nothing to
  * the pipeline semantics):
  *
  *   P(w | prev) = λ·c(prev,w)/c(prev) + (1−λ)·c(w)/N,   λ = 0.75
  *
  * Both counts come from the corpus itself (self-scoring, like tx10), so
  * every observed bigram has c(prev,w) ≥ 1 and the interpolation never
  * needs an OOV floor. Per document: the mean ln P over its bigram
  * positions (counted WITH multiplicity). Docs with < 2 tokens carry
  * (0, 0.0) — no transitions, no evidence, same contract as tx13's
  * zero-gram docs.
  *
  * Scale: the token scan happens once; bigram formation is tx12's
  * zip-with-tail (no posexplode self-join); both count relations are
  * vocabulary-bounded hash aggregates (partial aggregation collapses each
  * scan partition before the shuffle); the scoring joins are equi-joins of
  * the position stream against those bounded relations, and the final
  * rollup is one doc-keyed aggregate. Nothing is ever all-pairs; nothing
  * collects to the driver.
  */
object BigramLm {

  val tx22 = Q(
    "tx22_bigram_lm",
    s"""WITH doc AS (SELECT doc_id, $cleanSql AS c FROM documents),
      |t AS (SELECT doc_id, list_filter(string_split(c, ' '), x -> len(x) > 0) AS t FROM doc),
      |pairs AS (SELECT doc_id,
      |    unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bg
      |  FROM t WHERE len(t) >= 2),
      |bcnt AS (SELECT bg, COUNT(*) AS c_ab FROM pairs GROUP BY bg),
      |tok AS (SELECT unnest(t) AS w FROM t),
      |ucnt AS (SELECT w, COUNT(*) AS c_u FROM tok GROUP BY w),
      |n1 AS (SELECT CAST(SUM(c_u) AS DOUBLE) AS total FROM ucnt),
      |scored AS (SELECT p.doc_id,
      |    ln(CAST(0.75 AS DOUBLE) * CAST(b.c_ab AS DOUBLE) / CAST(up.c_u AS DOUBLE)
      |       + CAST(0.25 AS DOUBLE) * CAST(uw.c_u AS DOUBLE) / total) AS lp
      |  FROM pairs p
      |  JOIN bcnt b ON p.bg = b.bg
      |  JOIN ucnt up ON string_split(p.bg, ' ')[1] = up.w
      |  JOIN ucnt uw ON string_split(p.bg, ' ')[2] = uw.w
      |  CROSS JOIN n1),
      |agg AS (SELECT doc_id, COUNT(*) AS n, SUM(lp) AS sl FROM scored GROUP BY doc_id)
      |SELECT d.doc_id, CAST(COALESCE(a.n, 0) AS BIGINT) AS n_bigrams,
      |  COALESCE(ROUND(a.sl / a.n, 4), CAST(0.0 AS DOUBLE)) AS avg_logp
      |FROM doc d LEFT JOIN agg a USING (doc_id)""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
      .select(col("doc_id"),
        filter(split(clean(col("text")), " "), x => length(x) > 0).as("t"))
      .localCheckpoint() // feeds tokens, pairs, and the doc spine
    val pairs = docs.filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => concat_ws(" ", a, b))).as("bg"))
    val bcnt = pairs.groupBy("bg").agg(count(lit(1)).as("c_ab"))
    val ucnt = docs.select(explode(col("t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c_u"))
      .localCheckpoint() // joined twice + totalled
    val n1 = ucnt.agg(sum(col("c_u")).cast("double").as("total"))
    val agg = pairs
      .join(bcnt, "bg")
      .withColumn("prev", split(col("bg"), " ").getItem(0))
      .withColumn("w", split(col("bg"), " ").getItem(1))
      .join(ucnt.select(col("w").as("prev"), col("c_u").as("c_prev")), "prev")
      .join(ucnt.select(col("w"), col("c_u").as("c_w")), "w")
      .crossJoin(broadcast(n1))
      .select(col("doc_id"),
        log(lit(0.75) * col("c_ab").cast("double") / col("c_prev").cast("double")
          + lit(0.25) * col("c_w").cast("double") / col("total")).as("lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), sum(col("lp")).as("sl"))
    docs.select("doc_id").join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n"), lit(0L)).cast("long").as("n_bigrams"),
        coalesce(round(col("sl") / col("n"), 4), lit(0.0)).as("avg_logp"))
  }
}
