package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.TextPrep._

/** Text-analysis operators over the documents table (SURVEY §2 D1–D4):
  * language ID, quality scoring, token counting, fingerprinting.
  * All single-pass, narrow (no shuffle except final writes), codegen-friendly
  * column expressions — exactly what survives a 100 TB scan.
  */
object TextAnalysis {

  import org.apache.spark.sql.Column

  private[graft] val stopEn = Seq("the", "a", "and", "of", "to", "in", "is", "on")
  private val stopEs = Seq("el", "la", "de", "y", "en", "que", "los", "se")
  private val stopDe = Seq("der", "die", "das", "und", "ist", "von", "mit", "den")
  private val stopFr = Seq("le", "la", "les", "de", "et", "est", "dans", "une")
  private[graft] def sqlList(xs: Seq[String]) = xs.map(x => s"'$x'").mkString("[", ", ", "]")

  /** THE quality formula — single definition shared by tx02's output column
    * and [[qualityScore]] (dd07's survivor ranking), so a weighting tweak can
    * never drift one copy away from the other. Mirror: [[qualityFormulaSql]]. */
  private def qualityFormula(nAlpha: Column, nRaw: Column, nTokens: Column, stopHits: Column): Column =
    round(lit(0.4) * (nAlpha.cast("double") / nRaw.cast("double"))
      + lit(0.3) * least(lit(1.0), nTokens.cast("double") / lit(50.0))
      + lit(0.3) * (stopHits.cast("double") / nTokens.cast("double")), 6)
  private[graft] def qualityFormulaSql(nAlpha: String, nRaw: String, nTokens: String, stopHits: String): String =
    s"""ROUND(0.4 * (CAST($nAlpha AS DOUBLE) / CAST($nRaw AS DOUBLE))
       |      + 0.3 * least(CAST(1.0 AS DOUBLE), CAST($nTokens AS DOUBLE) / 50.0)
       |      + 0.3 * (CAST($stopHits AS DOUBLE) / CAST($nTokens AS DOUBLE)), 6)""".stripMargin

  // ---------------------------------------------------------------- D1
  /** Stopword-overlap language ID with a CJK regex fast path. Deterministic
    * argmax with fixed tie order en > es > de > fr. The CJK test runs on the
    * RAW text — clean() maps every non-[a-z0-9\s] char (CJK included) to a
    * space, so testing the cleaned column could never fire. */
  val tx01 = Q(
    "tx01_lang_id",
    s"""WITH doc AS (SELECT doc_id, lang, text, $cleanSql AS c FROM documents),
      |scored AS (SELECT doc_id, lang,
      |  CAST(len(list_intersect(list_distinct(string_split(c, ' ')), ${sqlList(stopEn)})) AS BIGINT) AS s_en,
      |  CAST(len(list_intersect(list_distinct(string_split(c, ' ')), ${sqlList(stopEs)})) AS BIGINT) AS s_es,
      |  CAST(len(list_intersect(list_distinct(string_split(c, ' ')), ${sqlList(stopDe)})) AS BIGINT) AS s_de,
      |  CAST(len(list_intersect(list_distinct(string_split(c, ' ')), ${sqlList(stopFr)})) AS BIGINT) AS s_fr,
      |  CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 1 ELSE 0 END AS has_cjk
      |FROM doc)
      |SELECT doc_id, lang AS labeled_lang, s_en, s_es, s_de, s_fr,
      |  CASE WHEN has_cjk = 1 THEN 'zh'
      |       WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
      |       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
      |       WHEN s_de >= s_fr THEN 'de'
      |       ELSE 'fr' END AS pred_lang
      |FROM scored""".stripMargin) { (s, d) =>
    val toks = array_distinct(split(clean(col("text")), " "))
    def score(set: Seq[String]) =
      size(array_intersect(toks, typedLit(set))).cast("long")
    Tables.documents(s, d).select(
      col("doc_id"), col("lang").as("labeled_lang"),
      score(stopEn).as("s_en"), score(stopEs).as("s_es"),
      score(stopDe).as("s_de"), score(stopFr).as("s_fr"),
      when(regexp_like(col("text"), lit("[\\x{4e00}-\\x{9fff}]")), 1).otherwise(0).as("has_cjk"))
      .select(
        col("doc_id"), col("labeled_lang"), col("s_en"), col("s_es"), col("s_de"), col("s_fr"),
        when(col("has_cjk") === 1, "zh")
          .when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de") && col("s_en") >= col("s_fr"), "en")
          .when(col("s_es") >= col("s_de") && col("s_es") >= col("s_fr"), "es")
          .when(col("s_de") >= col("s_fr"), "de")
          .otherwise("fr").as("pred_lang"))
  }

  // ---------------------------------------------------------------- D2
  /** Quality scoring from character-class and stopword ratios — the classic
    * pre-training heuristics (length, alpha ratio, stopword density). */
  val tx02 = Q(
    "tx02_quality_score",
    s"""WITH doc AS (SELECT doc_id, text, $cleanSql AS c FROM documents),
      |feat AS (SELECT doc_id,
      |  CAST(length(text) AS BIGINT) AS n_raw,
      |  CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
      |  CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit,
      |  CAST(length(text) - length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS n_space,
      |  CAST(len(string_split(c, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(len(list_intersect(list_distinct(string_split(c, ' ')), ${sqlList(stopEn)})) AS BIGINT) AS stop_hits
      |FROM doc)
      |SELECT doc_id, n_raw, n_alpha, n_digit, n_space, n_tokens,
      |  n_raw - n_alpha - n_digit - n_space AS n_punct,
      |  ROUND(CAST(n_alpha AS DOUBLE) / CAST(n_raw AS DOUBLE), 6) AS alpha_ratio,
      |  ROUND(CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS stop_ratio,
      |  ${qualityFormulaSql("n_alpha", "n_raw", "n_tokens", "stop_hits")} AS quality
      |FROM feat""".stripMargin) { (s, d) =>
    val c = clean(col("text"))
    val feat = Tables.documents(s, d).select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_raw"),
      length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("long").as("n_alpha"),
      length(regexp_replace(col("text"), "[^0-9]", "")).cast("long").as("n_digit"),
      (length(col("text")) - length(regexp_replace(col("text"), "\\s", ""))).cast("long").as("n_space"),
      size(split(c, " ")).cast("long").as("n_tokens"),
      size(array_intersect(array_distinct(split(c, " ")), typedLit(stopEn))).cast("long").as("stop_hits"))
    feat.select(
      col("doc_id"), col("n_raw"), col("n_alpha"), col("n_digit"), col("n_space"), col("n_tokens"),
      (col("n_raw") - col("n_alpha") - col("n_digit") - col("n_space")).as("n_punct"),
      round(col("n_alpha").cast("double") / col("n_raw").cast("double"), 6).as("alpha_ratio"),
      round(col("stop_hits").cast("double") / col("n_tokens").cast("double"), 6).as("stop_ratio"),
      qualityFormula(col("n_alpha"), col("n_raw"), col("n_tokens"), col("stop_hits")).as("quality"))
  }

  // ---------------------------------------------------------------- D3
  /** Token counting: whitespace tokens, regex word/punct tokens (a BPE-ish
    * upper bound), and the chars-per-token estimate. */
  val tx03 = Q(
    "tx03_token_count",
    """SELECT doc_id,
      |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS re_tokens,
      |  CAST(ceil(CAST(length(text) AS DOUBLE) / 3.3) AS BIGINT) AS bpe_estimate,
      |  ROUND(CAST(length(text) AS DOUBLE) / CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT), 4) AS chars_per_token
      |FROM documents""".stripMargin) { (s, d) =>
    val ws = size(split(trim(col("text")), "\\s+")).cast("long")
    Tables.documents(s, d).select(
      col("doc_id"),
      ws.as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0))).cast("long").as("re_tokens"),
      ceil(length(col("text")).cast("double") / lit(3.3)).cast("long").as("bpe_estimate"),
      round(length(col("text")).cast("double") / ws, 4).as("chars_per_token"))
  }

  // ---------------------------------------------------------------- D4
  /** Document fingerprint: md5 of the sorted distinct token set (order- and
    * whitespace-insensitive content identity), plus fingerprint family size. */
  val tx04 = Q(
    "tx04_fingerprint",
    s"""WITH doc AS (SELECT doc_id, $cleanSql AS c FROM documents),
      |fp AS (SELECT doc_id,
      |  md5(array_to_string(list_sort(list_distinct(string_split(c, ' '))), ' ')) AS fingerprint
      |FROM doc)
      |SELECT doc_id, fingerprint,
      |  CAST(COUNT(*) OVER (PARTITION BY fingerprint) AS BIGINT) AS family_size
      |FROM fp""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    Tables.documents(s, d)
      .select(col("doc_id"),
        md5(array_join(array_sort(array_distinct(split(clean(col("text")), " "))), " ")).as("fingerprint"))
      .withColumn("family_size",
        count(lit(1)).over(Window.partitionBy(col("fingerprint"))).cast("long"))
  }

  // ---------------------------------------------------------------- D5
  /** Repetition profile — the Gopher-style most-common-word fraction plus
    * distinct-token ratio, the workhorse boilerplate/spam filter signals for
    * a training corpus. One explode + per-doc aggregate: shuffle keyed on
    * doc_id (high cardinality, even), partial-agg friendly. Deterministic
    * top-token tie-break: (count DESC, token ASC). */
  val tx05 = Q(
    "tx05_repetition",
    s"""WITH doc AS (SELECT doc_id, $cleanSql AS c FROM documents),
      |tok AS (SELECT doc_id, unnest(string_split(c, ' ')) AS t FROM doc),
      |tc AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY doc_id, t),
      |ranked AS (SELECT doc_id, t, cnt,
      |  row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, t) AS rn,
      |  CAST(SUM(cnt) OVER (PARTITION BY doc_id) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT) AS distinct_tokens
      |FROM tc)
      |SELECT doc_id, n_tokens, distinct_tokens, t AS top_token,
      |  cnt AS top_token_count,
      |  ROUND(CAST(cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS top_token_frac,
      |  ROUND(CAST(distinct_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS distinct_ratio
      |FROM ranked WHERE rn = 1""".stripMargin) { (s, d) =>
    // One min_by aggregate instead of the oracle's window formulation: the
    // top-token pick, token total, and distinct count all partial-aggregate
    // map-side; a per-doc window would sort and hold whole doc partitions.
    // Tie-break mirrors the oracle: cnt DESC then token ASC = min_by over
    // struct(-cnt, t).
    Tables.documents(s, d)
      .select(col("doc_id"), explode(split(clean(col("text")), " ")).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(
        sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("distinct_tokens"),
        min_by(struct(col("t").as("top_token"), col("cnt").as("top_token_count")),
          struct((-col("cnt")).as("neg"), col("t"))).as("top"))
      .select(col("doc_id"), col("n_tokens"), col("distinct_tokens"),
        col("top.top_token").as("top_token"), col("top.top_token_count").as("top_token_count"),
        round(col("top.top_token_count").cast("double") / col("n_tokens").cast("double"), 6).as("top_token_frac"),
        round(col("distinct_tokens").cast("double") / col("n_tokens").cast("double"), 6).as("distinct_ratio"))
  }

  /** doc_id → the tx02 quality score, for operators that rank docs by
    * quality (dd07 survivor selection). Same formula and 6-dp rounding as
    * tx02's `quality` column; [[qualityScoreSql]] is the oracle mirror. */
  private[graft] def qualityScore(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    val c = clean(col("text"))
    Tables.documents(s, d).select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_raw"),
      length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("long").as("n_alpha"),
      size(split(c, " ")).cast("long").as("n_tokens"),
      size(array_intersect(array_distinct(split(c, " ")), typedLit(stopEn))).cast("long").as("stop_hits"))
      .select(col("doc_id"),
        qualityFormula(col("n_alpha"), col("n_raw"), col("n_tokens"), col("stop_hits")).as("quality"))
  }

  /** DuckDB mirror of [[qualityScore]] as a CTE body over `documents`. */
  private[graft] val qualityScoreSql: String =
    s"""SELECT doc_id,
       |  ${qualityFormulaSql(
            "length(regexp_replace(text, '[^A-Za-z]', '', 'g'))",
            "length(text)",
            s"len(string_split($cleanSql, ' '))",
            s"len(list_intersect(list_distinct(string_split($cleanSql, ' ')), ${sqlList(stopEn)}))")} AS quality
       |FROM documents""".stripMargin

  // ---------------------------------------------------------------- D6
  /** Deterministic stratified sampling — the domain-mixing workhorse of a
    * training-data pipeline: each source gets a target rate and membership is
    * decided by an explicit content hash of the doc id, NOT rand(). That
    * makes the sample (a) reproducible run-to-run and engine-to-engine,
    * (b) stable under corpus growth (a doc's keep/drop never flips when
    * other docs arrive), and (c) a pure narrow single-pass filter — no
    * shuffle, no state, survives any scan size. Rates here: sources hashing
    * even keep 20%, odd keep 60% (basis points of the hash bucket). */
  /** Quality signals + gate decision appended to any (doc_id, text, ...)
    * relation — THE single definition shared by tx08 (batch) and the F9
    * admission stream, so the two can never drift. Stateless, shuffle-free,
    * codegen-friendly: safe under Structured Streaming. */
  private[graft] def withQualitySignals(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val c = clean(col("text"))
    df.withColumn("n_raw", length(col("text")).cast("long"))
      .withColumn("n_alpha", length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("long"))
      .withColumn("n_tokens", size(split(c, " ")).cast("long"))
      .withColumn("stop_hits",
        size(array_intersect(array_distinct(split(c, " ")), typedLit(stopEn))).cast("long"))
      .withColumn("alpha_ratio", round(col("n_alpha").cast("double") / col("n_raw").cast("double"), 6))
      .withColumn("stop_ratio", round(col("stop_hits").cast("double") / col("n_tokens").cast("double"), 6))
      .withColumn("quality", qualityFormula(col("n_alpha"), col("n_raw"), col("n_tokens"), col("stop_hits")))
      .withColumn("fail_reason",
        when(col("n_tokens") < 20, "too_short")
          .when(col("alpha_ratio") < 0.8, "low_alpha")
          .when(col("stop_ratio") < 0.02, "low_stopword")
          .when(col("quality") < 0.5, "low_quality")
          .otherwise(lit(null).cast("string")))
      .withColumn("pass", col("n_tokens") >= 20 && col("alpha_ratio") >= 0.8
        && col("stop_ratio") >= 0.02 && col("quality") >= 0.5)
  }

  /** tx06's deterministic sampling decision appended to any (doc_id,
    * source, ...) relation — shared by the batch sampler and F9. */
  private[graft] def withSampleDecision(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.withColumn("bucket", (charHash(concat(lit("smp:"), col("doc_id").cast("string"))) % 10000).cast("long"))
      .withColumn("rate_bp", when(charHash(clean(col("source"))) % 2 === 0, 2000L).otherwise(6000L))
      .withColumn("sampled", col("bucket") < col("rate_bp"))

  val tx06 = Q(
    "tx06_sample_stratified",
    s"""WITH doc AS (SELECT doc_id, source,
      |  ${charHashSql("'smp:' || CAST(doc_id AS VARCHAR)")} % 10000 AS bucket,
      |  CAST(CASE WHEN ${charHashSql(cleanSqlOf("source"))} % 2 = 0 THEN 2000 ELSE 6000 END AS BIGINT) AS rate_bp
      |FROM documents)
      |SELECT doc_id, source, CAST(bucket AS BIGINT) AS bucket, rate_bp
      |FROM doc WHERE bucket < rate_bp""".stripMargin) { (s, d) =>
    // Hash the CLEANED source: charHash's byte-loop == DuckDB ascii()-loop
    // contract holds only for ASCII input, and clean() maps any non-ASCII
    // byte to a space — so a future corpus with a non-ASCII source name
    // cannot silently split the two engines' keep/drop sets. (The doc_id
    // key is ASCII by construction.)
    withSampleDecision(Tables.documents(s, d))
      .filter(col("sampled"))
      .select(col("doc_id"), col("source"), col("bucket"), col("rate_bp"))
  }

  // ---------------------------------------------------------------- D7
  /** PII redaction — the scrub pass every training pipeline runs before
    * anything else sees the text: emails, dotted-quad IPs and US-style
    * phone numbers are counted and replaced with typed placeholder tags.
    * The regexes stay in the RE2 ∩ java.util.regex common dialect (char
    * classes, bounded repeats, \\b) so both engines match identically.
    *
    * The synthetic corpus contains no PII, so (q31/q32 pattern) the query
    * SYNTHESIZES it deterministically from doc_id — every doc_id % 5 == 0
    * gains an email, % 7 a phone, % 11 an IP, so the redactor sees docs
    * with zero, one, and multiple PII kinds. Redaction order email → phone
    * → IP (the patterns are mutually non-overlapping by construction:
    * the email local part is alphanumeric, phones are dashed, IPs dotted).
    *
    * Scale: a pure per-row projection chain — single pass, no shuffle; at
    * 100 TB this pipelines into the ingest scan like q21/q29. */
  val tx07 = Q(
    "tx07_pii_redact",
    """WITH pii AS (
      |  SELECT doc_id, text
      |    || CASE WHEN doc_id % 5 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com for details' ELSE '' END
      |    || CASE WHEN doc_id % 7 = 0 THEN ' or call 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
      |    || CASE WHEN doc_id % 11 = 0 THEN ' from host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) ELSE '' END
      |    AS t
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(t, '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
      |  CAST(len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
      |  regexp_replace(regexp_replace(regexp_replace(t,
      |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
      |    '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g'),
      |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g') AS redacted
      |FROM pii""".stripMargin) { (s, d) =>
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
    val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val t = concat(col("text"),
      when(col("doc_id") % 5 === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com for details"))).otherwise(""),
      when(col("doc_id") % 7 === 0,
        concat(lit(" or call 415-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).otherwise(""),
      when(col("doc_id") % 11 === 0,
        concat(lit(" from host 10.0."), (col("doc_id") % 256).cast("string"),
          lit("."), ((col("doc_id") * 7) % 256).cast("string"))).otherwise(""))
    Tables.documents(s, d)
      .select(col("doc_id"), t.as("t"))
      .select(col("doc_id"),
        regexp_count(col("t"), lit(emailRe)).cast("long").as("n_emails"),
        regexp_count(col("t"), lit(phoneRe)).cast("long").as("n_phones"),
        regexp_count(col("t"), lit(ipRe)).cast("long").as("n_ips"),
        regexp_replace(regexp_replace(regexp_replace(col("t"),
          emailRe, "[EMAIL]"), phoneRe, "[PHONE]"), ipRe, "[IP]").as("redacted"))
  }

  // ---------------------------------------------------------------- D8
  /** Composite quality FILTER — the keep/drop decision built from tx02's
    * signals, Gopher/Dolma style: ordered gates, FIRST failing gate is the
    * recorded reason (so corpus-health dashboards can histogram drop causes),
    * pass = survived all gates. Gates compare the same round-6 ratios both
    * engines compute, so the decision boundary is bit-identical.
    *
    * Scale: like tx02, a single-pass projection — the filter decision
    * pipelines into the ingest scan; downstream writers partition on `pass`
    * (or the reason) to land kept/dropped docs separately. */
  val tx08 = Q(
    "tx08_quality_filter",
    s"""WITH doc AS (SELECT doc_id, text, $cleanSql AS c FROM documents),
      |feat AS (SELECT doc_id,
      |  CAST(length(text) AS BIGINT) AS n_raw,
      |  CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
      |  CAST(len(string_split(c, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(len(list_intersect(list_distinct(string_split(c, ' ')), ${sqlList(stopEn)})) AS BIGINT) AS stop_hits
      |FROM doc),
      |scored AS (SELECT doc_id, n_tokens,
      |  ROUND(CAST(n_alpha AS DOUBLE) / CAST(n_raw AS DOUBLE), 6) AS alpha_ratio,
      |  ROUND(CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS stop_ratio,
      |  ${qualityFormulaSql("n_alpha", "n_raw", "n_tokens", "stop_hits")} AS quality
      |FROM feat)
      |SELECT doc_id, n_tokens, alpha_ratio, stop_ratio, quality,
      |  CASE WHEN n_tokens < 20 THEN 'too_short'
      |       WHEN alpha_ratio < 0.8 THEN 'low_alpha'
      |       WHEN stop_ratio < 0.02 THEN 'low_stopword'
      |       WHEN quality < 0.5 THEN 'low_quality'
      |       ELSE NULL END AS fail_reason,
      |  n_tokens >= 20 AND alpha_ratio >= 0.8 AND stop_ratio >= 0.02
      |    AND quality >= 0.5 AS pass
      |FROM scored""".stripMargin) { (s, d) =>
    withQualitySignals(Tables.documents(s, d))
      .select("doc_id", "n_tokens", "alpha_ratio", "stop_ratio", "quality",
        "fail_reason", "pass")
  }

  // ---------------------------------------------------------------- D9
  /** Domain MIXTURE weights — the planning step between corpus stats and
    * tx06's sampler: given per-source token counts and a target mixture
    * (uniform here; any literal target map drops in), compute each source's
    * actual token share, the reweighting factor toward the target, and the
    * epoch-bounded sampling rate (scaled so the most over-weighted source
    * samples at exactly 1.0 — no source is asked for more than one epoch of
    * itself, the standard single-epoch cap from the GPT-3/Pile recipes).
    * `expected_tokens` is the post-sampling budget per source.
    *
    * Scale: one partial-agg pass over the corpus (token counts collapse
    * map-side per source), then arithmetic on a sources-sized relation (tiny
    * — the two global scalars broadcast). The output IS the rate table
    * tx06-style hash samplers consume. */
  val tx09 = Q(
    "tx09_mixture_weights",
    """WITH d AS (SELECT source,
      |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_toks
      |FROM documents),
      |per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |               CAST(SUM(n_toks) AS BIGINT) AS n_tokens
      |        FROM d GROUP BY source),
      |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
      |               CAST(COUNT(*) AS BIGINT) AS n_sources FROM per),
      |w AS (SELECT per.source, per.n_docs, per.n_tokens,
      |  CAST(per.n_tokens AS DOUBLE) / CAST(tot.tot_tokens AS DOUBLE) AS actual_frac,
      |  (CAST(1.0 AS DOUBLE) / CAST(tot.n_sources AS DOUBLE)) /
      |    (CAST(per.n_tokens AS DOUBLE) / CAST(tot.tot_tokens AS DOUBLE)) AS weight
      |FROM per CROSS JOIN tot),
      |m AS (SELECT MAX(weight) AS max_w FROM w)
      |SELECT source, n_docs, n_tokens,
      |  ROUND(actual_frac, 6) AS actual_frac,
      |  ROUND(weight, 6) AS weight,
      |  ROUND(weight / max_w, 6) AS sample_rate,
      |  CAST(FLOOR(CAST(n_tokens AS DOUBLE) * (weight / max_w)) AS BIGINT) AS expected_tokens
      |FROM w CROSS JOIN m""".stripMargin) { (s, d) =>
    val per = Tables.documents(s, d)
      .select(col("source"), size(split(trim(col("text")), "\\s+")).cast("long").as("n_toks"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
    val tot = per.agg(sum(col("n_tokens")).as("tot_tokens"), count(lit(1)).as("n_sources"))
    val w = per.crossJoin(broadcast(tot))
      .withColumn("actual_frac", col("n_tokens").cast("double") / col("tot_tokens").cast("double"))
      .withColumn("weight",
        (lit(1.0) / col("n_sources").cast("double")) / col("actual_frac"))
    val m = w.agg(max(col("weight")).as("max_w"))
    w.crossJoin(broadcast(m))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("actual_frac"), 6).as("actual_frac"),
        round(col("weight"), 6).as("weight"),
        round(col("weight") / col("max_w"), 6).as("sample_rate"),
        floor(col("n_tokens").cast("double") * (col("weight") / col("max_w"))).cast("long")
          .as("expected_tokens"))
  }

  // ---------------------------------------------------------------- D10
  /** Corpus unigram language-model scoring — the perplexity-style quality
    * proxy CCNet (Wenzek et al. 2020) filters with, built from the corpus
    * itself: token probabilities p(w) = cnt(w)/total from one counting
    * pass, then each document scores the average log-probability of its
    * tokens (avg_logp = Σ ln cnt(w) / n − ln total; higher = more typical
    * text, lower = rare/garbled). n_hapax (corpus-frequency-1 tokens per
    * doc) rides along as the integer rarity signal.
    *
    * Scale: two hash aggregates and one equi-join on the token — the
    * vocabulary count collapses map-side (partial agg over a Zipf stream),
    * the score join is token-keyed (AQE handles the hot-stopword skew),
    * and the per-doc reduce is doc-keyed. No windows, no driver state; the
    * corpus-total scalar is a one-row broadcast. Cross-engine float note:
    * ln() of INTEGER counts on both sides, summed then rounded at 4 dp —
    * the engines' libm disagreement is ≤1 ulp (~1e-16 relative), far
    * below the rounding quantum. */
  val tx10 = Q(
    "tx10_unigram_lm",
    s"""WITH doc AS (SELECT doc_id, $cleanSql AS c FROM documents),
      |tok AS (SELECT doc_id, unnest(string_split(c, ' ')) AS w FROM doc),
      |tok2 AS (SELECT doc_id, w FROM tok WHERE len(w) > 0),
      |vocab AS (SELECT w, COUNT(*) AS cnt FROM tok2 GROUP BY w),
      |tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM vocab),
      |scored AS (SELECT t.doc_id, COUNT(*) AS n,
      |    SUM(ln(CAST(v.cnt AS DOUBLE))) AS sl,
      |    SUM(CASE WHEN v.cnt = 1 THEN 1 ELSE 0 END) AS hapax
      |  FROM tok2 t JOIN vocab v USING (w) GROUP BY t.doc_id)
      |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
      |  ROUND(sl / n - ln(total), 4) AS avg_logp,
      |  CAST(hapax AS BIGINT) AS n_hapax
      |FROM scored CROSS JOIN tot""".stripMargin) { (s, d) =>
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(clean(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
    val tot = vocab.agg(sum(col("cnt")).cast("double").as("total"))
    toks.join(vocab, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"),
        sum(log(col("cnt").cast("double"))).as("sl"),
        sum(when(col("cnt") === 1, 1).otherwise(0)).as("hapax"))
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("n").as("n_tokens"),
        round(col("sl") / col("n") - log(col("total")), 4).as("avg_logp"),
        col("hapax").cast("long").as("n_hapax"))
  }

  // ---------------------------------------------------------------- D11
  /** Per-source vocabulary profile — the corpus-composition dashboard a
    * mixture planner (tx09) reads next to its token shares: total tokens,
    * distinct types, type/token ratio, hapax fraction (the vocabulary-
    * growth signal), and the dominant token with its count. A source whose
    * TTR or hapax fraction is an outlier is boilerplate-heavy or
    * template-generated — the corpus-level screen that per-doc scoring
    * (tx02/tx05) cannot see.
    *
    * Scale: ONE hash aggregate over (source, token) — partial aggregation
    * collapses each scan partition to its local vocabulary before the
    * shuffle, so the wire carries |sources|×|vocab| rows, not the corpus.
    * The per-source rollup and the dominant-token pick then run on that
    * bounded relation (the row_number window partitions on source and
    * sorts vocabularies, not documents). */
  val tx11 = Q(
    "tx11_vocab_stats",
    s"""WITH doc AS (SELECT doc_id, source, $cleanSql AS c FROM documents),
      |tok AS (SELECT source, unnest(string_split(c, ' ')) AS w FROM doc),
      |tok2 AS (SELECT source, w FROM tok WHERE len(w) > 0),
      |vocab AS (SELECT source, w, COUNT(*) AS cnt FROM tok2 GROUP BY source, w),
      |ranked AS (SELECT source, w, cnt,
      |    row_number() OVER (PARTITION BY source ORDER BY cnt DESC, w) AS rn
      |  FROM vocab),
      |stats AS (SELECT source,
      |    SUM(cnt) AS n_tokens, COUNT(*) AS n_types,
      |    SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS n_hapax
      |  FROM vocab GROUP BY source)
      |SELECT s.source, CAST(s.n_tokens AS BIGINT) AS n_tokens,
      |  CAST(s.n_types AS BIGINT) AS n_types,
      |  ROUND(CAST(s.n_types AS DOUBLE) / CAST(s.n_tokens AS DOUBLE), 6) AS type_token_ratio,
      |  CAST(s.n_hapax AS BIGINT) AS n_hapax,
      |  r.w AS top_token, CAST(r.cnt AS BIGINT) AS top_count
      |FROM stats s JOIN ranked r ON s.source = r.source AND r.rn = 1""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val vocab = Tables.documents(s, d)
      .select(col("source"), explode(split(clean(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("source", "w").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // feeds the rollup AND the dominant-token pick
    val wTop = Window.partitionBy(col("source")).orderBy(col("cnt").desc, col("w"))
    val top = vocab.withColumn("rn", row_number().over(wTop)).filter(col("rn") === 1)
      .select(col("source"), col("w").as("top_token"), col("cnt").as("top_count"))
    vocab.groupBy("source")
      .agg(sum(col("cnt")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when(col("cnt") === 1, 1).otherwise(0)).as("n_hapax"))
      .join(top, "source")
      .select(col("source"), col("n_tokens"), col("n_types"),
        round(col("n_types").cast("double") / col("n_tokens").cast("double"), 6)
          .as("type_token_ratio"),
        col("n_hapax").cast("long").as("n_hapax"), col("top_token"), col("top_count"))
  }

  // ---------------------------------------------------------------- D12
  /** PMI collocation mining — which word pairs co-occur more than chance:
    * PMI(a,b) = ln(c_ab·N₁²/(N₂·c_a·c_b)) over CONSECUTIVE token pairs.
    * The classic phrase-discovery pass (word2vec's phrase pre-join, quality
    * n-gram lists); bigrams here are counted WITH multiplicity — a
    * different primitive from the dedup family's distinct-shingle sets
    * (WordShingles3), which is exactly why it earns its own operator.
    *
    * Scale: bigram formation is a zip of the token array with its own
    * tail (arrays_zip over two slices — no posexplode self-join); counting
    * is one hash aggregate per n-gram order, both partial-agg friendly;
    * the PMI join keys bigrams to their two unigram rows — equi-joins on a
    * relation bounded by vocabulary², not the corpus. The count≥5 floor is
    * applied BEFORE the unigram joins, so rare-pair noise never shuffles.
    * One ln() over a ratio of exact integers keeps cross-engine drift
    * below the 4-dp rounding quantum (same argument as tx10). */
  val tx12 = Q(
    "tx12_pmi_bigrams",
    s"""WITH doc AS (SELECT doc_id, $cleanSql AS c FROM documents),
      |t AS (SELECT doc_id, string_split(c, ' ') AS t FROM doc),
      |big AS (SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bg
      |        FROM t WHERE len(t) >= 2),
      |bcnt AS (SELECT bg, COUNT(*) AS c_ab FROM big GROUP BY bg),
      |tok AS (SELECT unnest(string_split(c, ' ')) AS w FROM doc),
      |ucnt AS (SELECT w, COUNT(*) AS c_u FROM tok WHERE len(w) > 0 GROUP BY w),
      |n1 AS (SELECT CAST(SUM(c_u) AS DOUBLE) AS total1 FROM ucnt),
      |n2 AS (SELECT CAST(SUM(c_ab) AS DOUBLE) AS total2 FROM bcnt),
      |j AS (SELECT b.bg, b.c_ab, ua.c_u AS c_a, ub.c_u AS c_b
      |  FROM bcnt b
      |  JOIN ucnt ua ON string_split(b.bg, ' ')[1] = ua.w
      |  JOIN ucnt ub ON string_split(b.bg, ' ')[2] = ub.w
      |  WHERE b.c_ab >= 5)
      |SELECT bg AS bigram, CAST(c_ab AS BIGINT) AS n_pair,
      |  CAST(c_a AS BIGINT) AS n_first, CAST(c_b AS BIGINT) AS n_second,
      |  ROUND(ln(CAST(c_ab AS DOUBLE) * total1 * total1 / (total2 * c_a * c_b)), 4) + 0.0 AS pmi
      |FROM j CROSS JOIN n1 CROSS JOIN n2""".stripMargin) { (s, d) =>
    // unrescued: adjudicated per VERDICT r16 item 6 — the driver measured
    // tx12 regressing 25% under the documents rescue (1.62 → 2.03 s) and a
    // 5-pair A/B on spark.graft.rescue confirms it (+0.67 s median with the
    // rescue on). Both of tx12's corpus passes collapse map-side into
    // vocabulary-sized aggregates, so the extra exchange buys nothing the
    // partial agg doesn't already parallelize.
    val docs = Tables.unrescued(s, d, "documents").select(split(clean(col("text")), " ").as("t"))
    val big = docs.filter(size(col("t")) >= 2)
      .select(explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => concat_ws(" ", a, b))).as("bg"))
    val bcnt = big.groupBy("bg").agg(count(lit(1)).as("c_ab"))
      .localCheckpoint() // feeds the bigram total AND the PMI join
    val ucnt = docs.select(explode(col("t")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c_u"))
      .localCheckpoint() // joined twice (first and second word of the pair)
    val n1 = ucnt.agg(sum(col("c_u")).cast("double").as("total1"))
    val n2 = bcnt.agg(sum(col("c_ab")).cast("double").as("total2"))
    bcnt.filter(col("c_ab") >= 5)
      .withColumn("wa", split(col("bg"), " ").getItem(0))
      .withColumn("wb", split(col("bg"), " ").getItem(1))
      .join(ucnt.select(col("w").as("wa"), col("c_u").as("c_a")), "wa")
      .join(ucnt.select(col("w").as("wb"), col("c_u").as("c_b")), "wb")
      .crossJoin(broadcast(n1)).crossJoin(broadcast(n2))
      .select(col("bg").as("bigram"), col("c_ab").as("n_pair"),
        col("c_a").as("n_first"), col("c_b").as("n_second"),
        // + 0.0 collapses IEEE −0.0 (a rounded −1e-9) to +0.0 in both engines
        (round(log(col("c_ab").cast("double") * col("total1") * col("total1") /
          (col("total2") * col("c_a") * col("c_b"))), 4) + lit(0.0)).as("pmi"))
  }

  // ---------------------------------------------------------------- D13
  /** Duplicate n-gram fractions — the Gopher repetition gates tx05's
    * most-common-word signal does not cover (Rae et al. 2021 §A1.1: "fraction
    * of tokens in duplicated n-grams"): per document, the share of bigrams /
    * trigrams that are repeats of an n-gram already seen IN THAT document.
    * Template spam and boilerplate score high here while passing tx05 (no
    * single dominant token, lots of repeated phrases).
    *
    * Scale: n-grams form by zipping the token array with its own slices
    * (tx12's zip-with-tail — no posexplode self-join), counting is one
    * (doc_id, gram) hash aggregate per order — doc-keyed, partial-agg
    * friendly, nothing crosses documents — and the two per-doc profiles
    * re-join the docs spine on doc_id. A doc with < n tokens contributes
    * zero n-grams and reports frac 0. */
  val tx13 = Q(
    "tx13_dup_ngrams",
    s"""WITH doc AS (SELECT doc_id, $cleanSql AS c FROM documents),
      |t AS (SELECT doc_id, string_split(c, ' ') AS t FROM doc),
      |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS g
      |       FROM t WHERE len(t) >= 2),
      |b2 AS (SELECT doc_id, g, COUNT(*) AS cnt FROM bg GROUP BY doc_id, g),
      |p2 AS (SELECT doc_id, SUM(cnt) AS n2, SUM(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS d2
      |       FROM b2 GROUP BY doc_id),
      |tg AS (SELECT doc_id, unnest(list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
      |       FROM t WHERE len(t) >= 3),
      |b3 AS (SELECT doc_id, g, COUNT(*) AS cnt FROM tg GROUP BY doc_id, g),
      |p3 AS (SELECT doc_id, SUM(cnt) AS n3, SUM(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS d3
      |       FROM b3 GROUP BY doc_id)
      |SELECT d.doc_id,
      |  CAST(COALESCE(p2.n2, 0) AS BIGINT) AS n_bigrams,
      |  CASE WHEN COALESCE(p2.n2, 0) = 0 THEN CAST(0 AS DOUBLE)
      |       ELSE ROUND(CAST(p2.d2 AS DOUBLE) / CAST(p2.n2 AS DOUBLE), 6) END AS dup_bigram_frac,
      |  CAST(COALESCE(p3.n3, 0) AS BIGINT) AS n_trigrams,
      |  CASE WHEN COALESCE(p3.n3, 0) = 0 THEN CAST(0 AS DOUBLE)
      |       ELSE ROUND(CAST(p3.d3 AS DOUBLE) / CAST(p3.n3 AS DOUBLE), 6) END AS dup_trigram_frac
      |FROM doc d LEFT JOIN p2 ON d.doc_id = p2.doc_id LEFT JOIN p3 ON d.doc_id = p3.doc_id""".stripMargin) { (s, d) =>
    val t = Tables.documents(s, d).select(col("doc_id"), split(clean(col("text")), " ").as("t"))
    def profile(n: Int, tot: String, dup: String) = {
      val grams =
        if (n == 2) zip_with(
          slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1),
          (a, b) => concat_ws(" ", a, b))
        else zip_with(
          slice(col("t"), lit(1), size(col("t")) - 2),
          zip_with(
            slice(col("t"), lit(2), size(col("t")) - 2),
            slice(col("t"), lit(3), size(col("t")) - 2),
            (a, b) => concat_ws(" ", a, b)),
          (a, b) => concat_ws(" ", a, b))
      t.filter(size(col("t")) >= n)
        .select(col("doc_id"), explode(grams).as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as(tot),
          sum(when(col("cnt") >= 2, col("cnt")).otherwise(0)).as(dup))
    }
    def frac(dup: Column, tot: Column) =
      when(coalesce(tot, lit(0L)) === 0, lit(0.0))
        .otherwise(round(dup.cast("double") / tot.cast("double"), 6))
    t.select(col("doc_id"))
      .join(profile(2, "n2", "d2"), Seq("doc_id"), "left")
      .join(profile(3, "n3", "d3"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n2"), lit(0L)).as("n_bigrams"),
        frac(col("d2"), col("n2")).as("dup_bigram_frac"),
        coalesce(col("n3"), lit(0L)).as("n_trigrams"),
        frac(col("d3"), col("n3")).as("dup_trigram_frac"))
  }

  // ---------------------------------------------------------------- D14
  /** Sequence-packing plan — concat-then-chunk at a fixed token budget
    * (B = 512), the layout step between a filtered corpus and a trainer:
    * documents stream per source in doc_id order, token counts accumulate,
    * and the budget grid chops the stream into fixed-size sequences
    * (documents DO straddle sequence boundaries — that is what concat
    * packing means). Each doc reports the sequence span it lands in; the
    * per-source sequence count and the residual padding of the last
    * sequence fall out of the same arithmetic.
    *
    * Scale: ONE prefix-sum window per source over doc-count rows (token
    * counts are a codegen scalar, no token explosion). The partition key is
    * the source — at 100 TB you pack per (source, shard) with the shard key
    * assigned by the same deterministic hash tx06 samples with, which keeps
    * every window bounded; the per-source spelling here IS that plan with
    * one shard. */
  val tx14 = Q(
    "tx14_seq_packing",
    """WITH d AS (SELECT doc_id, source,
      |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_toks
      |FROM documents),
      |cum AS (SELECT doc_id, source, n_toks,
      |  SUM(n_toks) OVER (PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cume
      |FROM d)
      |SELECT doc_id, source, n_toks,
      |  CAST((cume - n_toks) // 512 AS BIGINT) AS seq_first,
      |  CAST((cume - 1) // 512 AS BIGINT) AS seq_last,
      |  CAST((cume - 1) // 512 - (cume - n_toks) // 512 + 1 AS BIGINT) AS n_seqs
      |FROM cum""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_toks"))
      .withColumn("cume", sum(col("n_toks")).over(w))
      .select(col("doc_id"), col("source"), col("n_toks"),
        expr("(cume - n_toks) div 512").as("seq_first"),
        expr("(cume - 1) div 512").as("seq_last"),
        (expr("(cume - 1) div 512") - expr("(cume - n_toks) div 512") + 1).as("n_seqs"))
  }

  // ---------------------------------------------------------------- D15
  /** Per-source Zipf fit — the corpus-health regression behind tx11's raw
    * vocabulary numbers: least-squares slope/intercept/R² of ln(freq) on
    * ln(rank) over each source's rank-frequency spectrum. Natural text
    * tracks slope ≈ −1 (Zipf's law); template or machine-generated sources
    * bend the curve, which this screen catches while per-doc scores
    * (tx02/tx05/tx13) see nothing wrong with any individual document.
    *
    * Scale: the regression runs over VOCABULARIES, not the corpus — one
    * (source, token) hash aggregate bounds everything after it (tx11's
    * argument); the rank window partitions on source and sorts each
    * source's vocabulary once; the fit is closed-form from five exact
    * per-source sums. Cross-engine floats: ln() over integer ranks/counts,
    * summed then rounded at 4 dp — libm disagreement ≤ 1 ulp, far below
    * the quantum (tx10's argument, squared terms included). */
  val tx15 = Q(
    "tx15_zipf_fit",
    s"""WITH doc AS (SELECT doc_id, source, $cleanSql AS c FROM documents),
      |tok AS (SELECT source, unnest(string_split(c, ' ')) AS w FROM doc),
      |vocab AS (SELECT source, w, COUNT(*) AS cnt FROM tok WHERE len(w) > 0 GROUP BY source, w),
      |ranked AS (SELECT source, cnt,
      |    row_number() OVER (PARTITION BY source ORDER BY cnt DESC, w) AS rank
      |  FROM vocab),
      |pts AS (SELECT source, ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y FROM ranked),
      |sums AS (SELECT source, CAST(COUNT(*) AS DOUBLE) AS n,
      |    SUM(x) AS sx, SUM(y) AS sy, SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
      |  FROM pts GROUP BY source)
      |SELECT source, CAST(n AS BIGINT) AS n_types,
      |  ROUND((n*sxy - sx*sy) / (n*sxx - sx*sx), 4) AS slope,
      |  ROUND((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 4) AS intercept,
      |  ROUND((n*sxy - sx*sy) * (n*sxy - sx*sy) / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 4) AS r2
      |FROM sums""".stripMargin) { (s, d) =>
    val vocab = Tables.documents(s, d)
      .select(col("source"), explode(split(clean(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("source", "w").agg(count(lit(1)).as("cnt"))
    val wRank = Window.partitionBy(col("source")).orderBy(col("cnt").desc, col("w"))
    val pts = vocab.withColumn("rank", row_number().over(wRank))
      .select(col("source"),
        log(col("rank").cast("double")).as("x"), log(col("cnt").cast("double")).as("y"))
    val sums = pts.groupBy("source").agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    sums.select(col("source"), col("n").cast("long").as("n_types"),
      round(num / den, 4).as("slope"),
      round((col("sy") - (num / den) * col("sx")) / col("n"), 4).as("intercept"),
      round(num * num / (den * (col("n") * col("syy") - col("sy") * col("sy"))), 4).as("r2"))
  }

  // ---------------------------------------------------------------- D16
  /** Per-source document OUTLIER screen — a robust z-score (Iglewicz–Hoaglin
    * 0.6745·(x−median)/MAD, flag at |z| > 3.5) over tx02's quality signal,
    * computed per source: tx08's fixed gates catch globally bad documents;
    * this catches documents that are anomalous FOR THEIR SOURCE (a
    * boilerplate page in a curated corpus, a pristine page in a crawl),
    * with thresholds that adapt to each source's own distribution instead
    * of hand-set constants. Median/MAD, not mean/stddev — one wild doc
    * cannot drag the screen toward itself.
    *
    * Scale: the quality signal is tx02's single-pass projection; the two
    * robust statistics are grouped EXACT percentiles over sources (bounded
    * groups at any corpus size — and q27's GK sketch is the drop-in when a
    * group outgrows one buffer); both joins are source-keyed broadcasts
    * (sources-sized relations). */
  val tx16 = Q(
    "tx16_outlier_docs",
    s"""WITH doc AS (SELECT doc_id, source, text, $cleanSql AS c FROM documents),
      |feat AS (SELECT doc_id, source,
      |  CAST(length(text) AS BIGINT) AS n_raw,
      |  CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
      |  CAST(len(string_split(c, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(len(list_intersect(list_distinct(string_split(c, ' ')), ${sqlList(stopEn)})) AS BIGINT) AS stop_hits
      |FROM doc),
      |q AS (SELECT doc_id, source,
      |  ${qualityFormulaSql("n_alpha", "n_raw", "n_tokens", "stop_hits")} AS quality FROM feat),
      |med AS (SELECT source, ROUND(quantile_cont(quality, 0.5), 6) AS med_q FROM q GROUP BY source),
      |dev AS (SELECT q.doc_id, q.source, q.quality, m.med_q,
      |        ABS(q.quality - m.med_q) AS ad FROM q JOIN med m ON q.source = m.source),
      |mad AS (SELECT source, ROUND(quantile_cont(ad, 0.5), 6) AS mad_q FROM dev GROUP BY source)
      |SELECT d.doc_id, d.source, d.quality, d.med_q, m.mad_q,
      |  CASE WHEN m.mad_q = 0 THEN CAST(0 AS DOUBLE)
      |       ELSE ROUND(0.6745 * (d.quality - d.med_q) / m.mad_q, 4) END + 0.0 AS robust_z,
      |  CASE WHEN m.mad_q = 0 THEN d.quality <> d.med_q
      |       ELSE ABS(ROUND(0.6745 * (d.quality - d.med_q) / m.mad_q, 4)) > 3.5 END AS is_outlier
      |FROM dev d JOIN mad m ON d.source = m.source""".stripMargin) { (s, d) =>
    val q = withQualitySignals(Tables.documents(s, d))
      .select(col("doc_id"), col("source"), col("quality"))
      .localCheckpoint() // feeds med, dev and the final join — one corpus scan
    val med = q.groupBy("source")
      .agg(round(expr("percentile(quality, 0.5)"), 6).as("med_q"))
    val dev = q.join(broadcast(med), "source")
      .withColumn("ad", abs(col("quality") - col("med_q")))
    val mad = dev.groupBy("source")
      .agg(round(expr("percentile(ad, 0.5)"), 6).as("mad_q"))
    val z = round(lit(0.6745) * (col("quality") - col("med_q")) / col("mad_q"), 4)
    dev.join(broadcast(mad), "source")
      .select(col("doc_id"), col("source"), col("quality"), col("med_q"), col("mad_q"),
        (when(col("mad_q") === 0, lit(0.0)).otherwise(z) + lit(0.0)).as("robust_z"),
        when(col("mad_q") === 0, col("quality") =!= col("med_q"))
          .otherwise(abs(z) > 3.5).as("is_outlier"))
  }

  // ---------------------------------------------------------------- D17
  /** Deterministic train/val/test SPLIT assignment (80/10/10) — the step
    * between a filtered corpus and a trainer that everything downstream
    * must be able to REPRODUCE: the split key is a content hash of the
    * cleaned text (tx06's growth-stable idiom), so a document keeps its
    * split across corpus re-crawls, re-orderings and engine versions, and
    * an exact near-duplicate of a test document hashes into the same split
    * instead of leaking into train (the dedup family handles non-exact
    * leakage — dd09's decontamination is the cross-split audit for that).
    * rand()-based splitting has none of these properties.
    *
    * Scale: a pure per-row projection — the hash is the codegen PolyHash31
    * pass; no shuffle, no state, identical plan batch or streaming. */
  val tx17 = Q(
    "tx17_split_assign",
    s"""WITH doc AS (SELECT doc_id, source,
      |  ${charHashSql(s"'split:' || $cleanSql")} % 100 AS bucket
      |FROM documents)
      |SELECT doc_id, source, CAST(bucket AS BIGINT) AS bucket,
      |  CASE WHEN bucket < 80 THEN 'train'
      |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
      |FROM doc""".stripMargin) { (s, d) =>
    // unrescued: the whole query is a per-row projection — the rescue's
    // exchange would be its ONLY shuffle (PlanShapeSpec pins the plan
    // Exchange-free; guide §2.4).
    Tables.unrescued(s, d, "documents")
      .select(col("doc_id"), col("source"),
        (charHash(concat(lit("split:"), clean(col("text")))) % 100).as("bucket"))
      .select(col("doc_id"), col("source"), col("bucket"),
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test").as("split"))
  }

  // ---------------------------------------------------------------- D18
  /** CCNet-style perplexity BUCKETING (Wenzek et al. 2020) — the curation
    * decision tx10's score exists for: per source, split documents into
    * 'head' / 'middle' / 'tail' thirds of the LM-score distribution.
    * CCNet trains on head+middle and drops (or down-weights) the tail;
    * bucketing per SOURCE, not globally, is the part that matters — a
    * clean-but-small source would otherwise be drowned by a big noisy
    * one's score range. Thresholds are the per-source tertiles of tx10's
    * 4-dp avg_logp (interpolated percentile — the q17-proven cross-engine
    * primitive), re-rounded at 4 dp, so bucket edges are deterministic.
    *
    * Scale: tx10's two token aggregates + a per-source threshold aggregate
    * whose output is 2×|sources| values — broadcast back for the labeling
    * join; no corpus-wide window, no sort. Exact `percentile` buffers one
    * source's scores in the aggregation buffer; at 100 TB swap in
    * `percentile_approx` under q27's tolerance-gate contract (bucket edges
    * move by the sketch error; head/tail membership is threshold-stable
    * for all but edge-epsilon docs). */
  val tx18 = Q(
    "tx18_perplexity_buckets", {
      val (t1, t2) = (1.0 / 3, 2.0 / 3)
      s"""WITH doc AS (SELECT doc_id, source, $cleanSql AS c FROM documents),
        |tok AS (SELECT doc_id, unnest(string_split(c, ' ')) AS w FROM doc),
        |tok2 AS (SELECT doc_id, w FROM tok WHERE len(w) > 0),
        |vocab AS (SELECT w, COUNT(*) AS cnt FROM tok2 GROUP BY w),
        |tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM vocab),
        |scored AS (SELECT t.doc_id, COUNT(*) AS n, SUM(ln(CAST(v.cnt AS DOUBLE))) AS sl
        |  FROM tok2 t JOIN vocab v USING (w) GROUP BY t.doc_id),
        |lm AS (SELECT s.doc_id, d.source, ROUND(s.sl / s.n - ln(tot.total), 4) AS avg_logp
        |  FROM scored s CROSS JOIN tot JOIN doc d ON s.doc_id = d.doc_id),
        |th AS (SELECT source, ROUND(quantile_cont(avg_logp, $t1), 4) AS t1,
        |              ROUND(quantile_cont(avg_logp, $t2), 4) AS t2
        |       FROM lm GROUP BY source)
        |SELECT l.doc_id, l.source, l.avg_logp,
        |  CASE WHEN l.avg_logp >= h.t2 THEN 'head'
        |       WHEN l.avg_logp >= h.t1 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM lm l JOIN th h ON l.source = h.source""".stripMargin
    }) { (s, d) =>
    val (t1, t2) = (1.0 / 3, 2.0 / 3)
    val doc = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), clean(col("text")).as("c"))
    val toks = doc.select(col("doc_id"), explode(split(col("c"), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
    val tot = vocab.agg(sum(col("cnt")).cast("double").as("total"))
    val lm = toks.join(vocab, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), sum(log(col("cnt").cast("double"))).as("sl"))
      .crossJoin(broadcast(tot))
      .join(doc.select("doc_id", "source"), "doc_id")
      .select(col("doc_id"), col("source"),
        round(col("sl") / col("n") - log(col("total")), 4).as("avg_logp"))
      .localCheckpoint() // feeds the threshold aggregate AND the labeling join
    val th = lm.groupBy("source").agg(
      round(expr(s"percentile(avg_logp, $t1)"), 4).as("t1"),
      round(expr(s"percentile(avg_logp, $t2)"), 4).as("t2"))
    lm.join(broadcast(th), "source")
      .select(col("doc_id"), col("source"), col("avg_logp"),
        when(col("avg_logp") >= col("t2"), "head")
          .when(col("avg_logp") >= col("t1"), "middle")
          .otherwise("tail").as("bucket"))
  }

  // ---------------------------------------------------------------- D19
  /** Cross-source OVERLAP matrix — the audit a mixture planner (tx09) and
    * a dedup operator both need before trusting "source" as a mixing unit:
    * for every ordered source pair (A, B), how many of A's distinct
    * 8-gram shingles also appear in B, and what fraction of A's gram
    * vocabulary that is. A source that is largely a scrape or mirror of
    * another shows up as a high-containment row; near-symmetric high
    * overlap means the two sources should be merged (or deduped jointly)
    * before mixture weights mean anything. Grams use dd09's exact
    * spelling (8-token shingles, whole-doc fallback under 8 tokens), so
    * this matrix and the decontamination operator agree on what a "gram"
    * is.
    *
    * Scale: one (source, gram-hash) distinct aggregate bounds everything
    * downstream by per-source gram vocabularies; the pair counts come
    * from a gram-keyed self equi-join (each gram contributes at most
    * |sources touching it|² pair rows — |sources|-bounded, never
    * corpus-bounded); the final cross join is |sources|², driver-trivial,
    * and exists so ZERO-overlap pairs surface explicitly. */
  val tx19 = Q(
    "tx19_source_overlap",
    s"""WITH doc AS (SELECT doc_id, source, $cleanSql AS c FROM documents),
      |toks AS (SELECT source, string_split(c, ' ') AS t, c FROM doc),
      |g0 AS (SELECT source, CASE WHEN len(t) >= 8
      |    THEN list_distinct(list_transform(range(0, len(t)-7), i -> array_to_string(t[i+1:i+8], ' ')))
      |    ELSE [c] END AS gs FROM toks),
      |grams AS (SELECT DISTINCT source, ${charHashSql("gram")} AS gh
      |          FROM (SELECT source, unnest(gs) AS gram FROM g0)),
      |counts AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_grams FROM grams GROUP BY source),
      |shared AS (SELECT a.source AS src_a, b.source AS src_b, CAST(COUNT(*) AS BIGINT) AS n_shared
      |           FROM grams a JOIN grams b ON a.gh = b.gh AND a.source <> b.source
      |           GROUP BY a.source, b.source)
      |SELECT ca.source AS src_a, cb.source AS src_b,
      |  COALESCE(s.n_shared, CAST(0 AS BIGINT)) AS n_shared,
      |  ca.n_grams AS n_grams_a,
      |  ROUND(CAST(COALESCE(s.n_shared, 0) AS DOUBLE) / CAST(ca.n_grams AS DOUBLE), 6) AS overlap_frac
      |FROM counts ca CROSS JOIN counts cb
      |LEFT JOIN shared s ON ca.source = s.src_a AND cb.source = s.src_b
      |WHERE ca.source <> cb.source""".stripMargin) { (s, d) =>
    val grams = Tables.documents(s, d)
      .select(col("source"),
        explode(WordShinglesN.shinglesN(clean(col("text")), 8)).as("gram"))
      .select(col("source"), charHash(col("gram")).as("gh"))
      .distinct()
      .localCheckpoint() // vocabulary counts AND both sides of the pair join
    val counts = grams.groupBy("source").agg(count(lit(1)).as("n_grams"))
    val shared = grams.join(
        grams.select(col("source").as("src_b"), col("gh")),
        Seq("gh"))
      .filter(col("source") =!= col("src_b"))
      .groupBy(col("source").as("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    val ca = counts.select(col("source").as("src_a"), col("n_grams").as("n_grams_a"))
    val cb = counts.select(col("source").as("src_b"))
    ca.crossJoin(cb)
      .filter(col("src_a") =!= col("src_b"))
      .join(shared, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        col("n_grams_a"),
        round(coalesce(col("n_shared"), lit(0L)).cast("double") /
          col("n_grams_a").cast("double"), 6).as("overlap_frac"))
  }

  // ---------------------------------------------------------------- D20
  /** SPAN-CORRUPTION preprocessing (T5/UL2 denoising objective prep): each
    * document becomes an (input, target) pair — masked spans replaced by
    * numbered sentinels in the input, targets carrying sentinel-prefixed
    * span contents — the seq2seq pretraining example builder, downstream of
    * everything the pipeline curates (q52's chain ends exactly here).
    *
    * The mask is DETERMINISTIC ARITHMETIC, not RNG: token i of doc d is
    * masked iff (i + d) mod 7 < 2 (≈28.6% corruption in natural runs whose
    * boundary lengths vary per doc) — reproducible across re-crawls,
    * re-orders, and engines, the same determinism contract as tx06/tx17;
    * a production rate/length change is a constant change, not a design
    * change. Span ids come from gaps-and-islands over the mask (run start
    * = masked with unmasked predecessor — ARITHMETIC lookback, no lag
    * window), numbered by a per-doc running sum.
    *
    * Scale: one explode to token grain, ONE doc-partitioned window (the
    * running span count — bounded by doc length, tx14's class), one hash
    * aggregate back to docs via the dd17 stitch (sort_array + array_join);
    * sentinels cannot collide with content (clean() strips '<'/'>').
    * Empty-token docs survive via the documents LEFT JOIN.
    *
    * Oracle: the identical arithmetic + string_agg(ORDER BY) spelling. */
  val tx20 = Q(
    "tx20_span_corruption",
    s"""WITH doc AS (SELECT doc_id, $cleanSql AS c FROM documents),
      |d AS (SELECT doc_id, string_split(c, ' ') AS t FROM doc),
      |tok0 AS (SELECT doc_id, unnest(range(0, len(t))) AS pos, t FROM d),
      |tok AS (SELECT doc_id, pos, t[pos + 1] AS w,
      |  ((pos + doc_id) % 7) < 2 AS masked,
      |  pos > 0 AND ((pos - 1 + doc_id) % 7) < 2 AS prev_masked
      |  FROM tok0),
      |runs AS (SELECT doc_id, pos, w, masked,
      |  (masked AND NOT prev_masked) AS run_start,
      |  SUM(CASE WHEN masked AND NOT prev_masked THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) - 1 AS span
      |  FROM tok),
      |pieces AS (SELECT doc_id, pos, masked, run_start,
      |  CASE WHEN NOT masked THEN w
      |       WHEN run_start THEN '<extra_id_' || CAST(span AS BIGINT) || '>'
      |       ELSE NULL END AS in_piece,
      |  CASE WHEN NOT masked THEN NULL
      |       WHEN run_start THEN '<extra_id_' || CAST(span AS BIGINT) || '> ' || w
      |       ELSE w END AS tgt_piece
      |  FROM runs),
      |agg AS (SELECT doc_id,
      |  COALESCE(string_agg(in_piece, ' ' ORDER BY pos), '') AS input_text,
      |  COALESCE(string_agg(tgt_piece, ' ' ORDER BY pos), '') AS target_text,
      |  CAST(SUM(CASE WHEN run_start THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
      |  CAST(SUM(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_masked
      |  FROM pieces GROUP BY doc_id)
      |SELECT d.doc_id,
      |  COALESCE(a.input_text, '') AS input_text,
      |  COALESCE(a.target_text, '') AS target_text,
      |  COALESCE(a.n_spans, CAST(0 AS BIGINT)) AS n_spans,
      |  COALESCE(a.n_masked, CAST(0 AS BIGINT)) AS n_masked
      |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val tok = docs.select(col("doc_id"),
        posexplode(split(clean(col("text")), " ")).as(Seq("pos", "w")))
      .withColumn("masked", (col("pos") + col("doc_id")) % 7 < 2)
      .withColumn("prev_masked",
        col("pos") > 0 && (col("pos") - 1 + col("doc_id")) % 7 < 2)
      .withColumn("run_start", col("masked") && !col("prev_masked"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pieces = tok
      .withColumn("span",
        sum(when(col("run_start"), 1L).otherwise(0L)).over(w) - 1)
      .withColumn("sentinel",
        concat(lit("<extra_id_"), col("span").cast("string"), lit(">")))
      .withColumn("in_piece",
        when(!col("masked"), col("w"))
          .when(col("run_start"), col("sentinel")))
      .withColumn("tgt_piece",
        when(!col("masked"), lit(null).cast("string"))
          .when(col("run_start"), concat(col("sentinel"), lit(" "), col("w")))
          .otherwise(col("w")))
    def stitch(piece: String) = array_join(transform(
      sort_array(collect_list(when(col(piece).isNotNull,
        struct(col("pos"), col(piece).as("s"))))), x => x("s")), " ")
    val agg = pieces.groupBy("doc_id").agg(
      stitch("in_piece").as("input_text"),
      stitch("tgt_piece").as("target_text"),
      sum(when(col("run_start"), 1L).otherwise(0L)).as("n_spans"),
      sum(when(col("masked"), 1L).otherwise(0L)).as("n_masked"))
    docs.select("doc_id").join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("input_text"), lit("")).as("input_text"),
        coalesce(col("target_text"), lit("")).as("target_text"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"))
  }

  val queries: Seq[Q] =
    Seq(tx01, tx02, tx03, tx04, tx05, tx06, tx07, tx08, tx09, tx10,
      tx11, tx12, tx13, tx14, tx15, tx16, tx17, tx18, tx19, tx20,
      QualityClassifier.tx21, BigramLm.tx22)
}
