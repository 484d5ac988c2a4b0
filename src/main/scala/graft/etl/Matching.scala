package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Fuzzy-matching and text-normalization surface (SURVEY §2 A10/A11/A21).
  *
  * The reference builds its Book_Dim by CROSS-JOINING every source title with
  * every master title and scoring TF-IDF cosine similarity
  * (dw4_book_dim.py:96-99, 165-192). A cross join is O(n·m) and dies at
  * warehouse scale; the Spark-first re-expression is an inverted-index join
  * on shared tokens — identical results for any threshold that implies at
  * least one shared token, but the candidate-pair build is an equi-join that
  * shuffles on the token key. The DuckDB oracle keeps the naive cross-join
  * formulation, which doubles as an independent spec of the semantics.
  */
object Matching {

  /** "Master catalog": a sample of bare product names; "source titles": every
    * product name suffixed with its type string, mirroring how the reference's
    * source systems decorate titles ("Title - Paperback", dw3_merge_inc.py:143). */
  private val masterSql =
    "SELECT DISTINCT lower(p_name) AS master_title FROM part WHERE p_partkey % 4 = 0"
  private val testSql =
    "SELECT DISTINCT lower(p_name || ' ' || p_type) AS test_title FROM part"

  // ---------------------------------------------------------------- A10
  /** Token-set Jaccard match, threshold 0.5.
    * Reference analog: fuzzy-ratio bundle matching (dw4_book_dim.py:291-293). */
  val q10 = Q(
    "q10_cross_join_match",
    s"""WITH master AS ($masterSql),
      |test AS ($testSql),
      |pairs AS (
      |  SELECT m.master_title, t.test_title,
      |         list_distinct(string_split(m.master_title, ' ')) AS ma,
      |         list_distinct(string_split(t.test_title, ' ')) AS ta
      |  FROM master m CROSS JOIN test t),
      |scored AS (
      |  SELECT master_title, test_title,
      |         ROUND(CAST(len(list_intersect(ma, ta)) AS DOUBLE) /
      |               CAST(len(list_distinct(list_concat(ma, ta))) AS DOUBLE), 6) AS jaccard
      |  FROM pairs)
      |SELECT master_title, test_title, jaccard FROM scored WHERE jaccard >= 0.5""".stripMargin) { (s, d) =>
    val part = Tables.part(s, d)
    val master = part.filter(col("p_partkey") % 4 === 0)
      .select(lower(col("p_name")).as("master_title")).distinct()
      .withColumn("ma", array_distinct(split(col("master_title"), " ")))
    val test = part
      .select(lower(concat(col("p_name"), lit(" "), col("p_type"))).as("test_title")).distinct()
      .withColumn("ta", array_distinct(split(col("test_title"), " ")))
    // PPJoin prefix-filtered inverted index (Xiao et al., WWW'08): order every
    // token set by one global canonical order (df ASC, token ASC — rare
    // tokens first) and index only each title's first |x|-⌈t·|x|⌉+1 tokens.
    // Any pair with J >= t must share a token inside BOTH prefixes, so the
    // candidate equi-join is lossless while an ultra-common token ("the", a
    // publisher name) stops being a df² hot key — its occurrences past the
    // prefix boundary are never indexed. MatchingEquivalenceSpec proves
    // output equality with brute force.
    // One tagged token table → ONE df aggregation and ONE prefix window pass
    // (a per-side prefix() helper would duplicate the df subtree in the
    // plan); candidate dedup runs on the bare string pair (hash aggregate),
    // and the token arrays join back per candidate for the verify step.
    // localCheckpoint: the tagged token table feeds the df aggregation, the
    // prefix window, and both sides of the candidate join — unmaterialized,
    // the union+explode+distinct subtree would re-evaluate ~4×. Same pattern
    // as q11's weight table and dd04's shingle table.
    val toks = master.select(col("master_title").as("title"), col("ma").as("arr"),
        lit(true).as("is_m"))
      .union(test.select(col("test_title"), col("ta"), lit(false)))
      .select(col("title"), col("is_m"), col("arr"), explode(col("arr")).as("tok"))
      .localCheckpoint()
    val dfTab = toks.select("title", "tok").distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val wOrd = Window.partitionBy("title", "is_m").orderBy(col("df"), col("tok"))
    val pref = toks.join(dfTab, "tok")
      .withColumn("rn", row_number().over(wOrd))
      .filter(col("rn") <= size(col("arr")) - ceil(size(col("arr")) * 0.5) + 1)
      .select("title", "is_m", "tok")
    val cand = pref.filter(col("is_m")).select(col("title").as("master_title"), col("tok"))
      .join(pref.filter(!col("is_m")).select(col("title").as("test_title"), col("tok")), "tok")
      .select("master_title", "test_title").distinct()
    cand
      .join(master, "master_title")
      .join(test, "test_title")
      .withColumn("jaccard",
        round(size(array_intersect(col("ma"), col("ta"))).cast("double") /
              size(array_union(col("ma"), col("ta"))).cast("double"), 6))
      .filter(col("jaccard") >= 0.5)
      .select("master_title", "test_title", "jaccard")
  }

  // ---------------------------------------------------------------- A11
  /** TF-IDF cosine title matching, sklearn-equivalent weighting:
    * idf = ln((1+N)/(1+df)) + 1, raw-count tf, L2-normalized vectors,
    * threshold 0.7 — mirroring dw4_book_dim.py:165-192.
    * Scale path: weights live in an inverted index keyed by token; the
    * pair-dot-product is a token equi-join, never a cross join. */
  val q11 = Q(
    "q11_tfidf_match",
    s"""WITH master AS ($masterSql),
      |test AS ($testSql),
      |corpus AS (SELECT master_title AS title FROM master UNION SELECT test_title FROM test),
      |toks AS (SELECT title, unnest(regexp_extract_all(title, '[a-z0-9]{2,}')) AS tok FROM corpus),
      |tf AS (SELECT title, tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY title, tok),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM corpus),
      |df AS (SELECT tok, CAST(COUNT(DISTINCT title) AS BIGINT) AS df FROM tf GROUP BY tok),
      |w AS (SELECT tf.title, tf.tok, tf.cnt * (ln((1.0 + n.n_docs)/(1.0 + df.df)) + 1.0) AS w
      |      FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n),
      |norms AS (SELECT title, sqrt(SUM(w*w)) AS nrm FROM w GROUP BY title),
      |dots AS (
      |  SELECT wm.title AS master_title, wt.title AS test_title, SUM(wm.w * wt.w) AS dot
      |  FROM w wm JOIN w wt ON wm.tok = wt.tok
      |  WHERE wm.title IN (SELECT master_title FROM master)
      |    AND wt.title IN (SELECT test_title FROM test)
      |  GROUP BY wm.title, wt.title),
      |scored AS (
      |  SELECT d.master_title, d.test_title,
      |         ROUND(d.dot / (nm.nrm * nt.nrm), 6) AS cos_sim
      |  FROM dots d
      |  JOIN norms nm ON d.master_title = nm.title
      |  JOIN norms nt ON d.test_title = nt.title)
      |SELECT master_title, test_title, cos_sim FROM scored WHERE cos_sim >= 0.7""".stripMargin) { (s, d) =>
    val part = Tables.part(s, d)
    val master = part.filter(col("p_partkey") % 4 === 0)
      .select(lower(col("p_name")).as("title")).distinct()
    val test = part
      .select(lower(concat(col("p_name"), lit(" "), col("p_type"))).as("title")).distinct()
    val corpus = master.union(test).distinct()
    val toks = corpus.select(col("title"),
      explode(regexp_extract_all(col("title"), lit("[a-z0-9]{2,}"), lit(0))).as("tok"))
    val tf = toks.groupBy("title", "tok").agg(count(lit(1)).as("cnt"))
    val nDocs = corpus.agg(count(lit(1)).as("n_docs"))
    val dfTab = tf.groupBy("tok").agg(countDistinct("title").as("df"))
    // localCheckpoint: the weight table feeds the norm aggregation AND both
    // sides of the inverted-index dot-product join — unmaterialized, the
    // tf/df groupBys would run 3×. Checkpoint (not cache) so the blocks are
    // ContextCleaner-released when the plan dies instead of pinning the
    // cache manager for the rest of a Verify/Bench session.
    val w = tf.join(dfTab, "tok").crossJoin(broadcast(nDocs))
      .select(col("title"), col("tok"),
        (col("cnt") * (log((lit(1.0) + col("n_docs")) / (lit(1.0) + col("df"))) + lit(1.0))).as("w"))
      .localCheckpoint()
    val norms = w.groupBy("title").agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    // Cosine prefix filter (Bayardo et al., "Scaling Up All Pairs Similarity
    // Search", WWW'07): order tokens by the global canonical order (df ASC,
    // tok ASC) and keep, per title, only tokens where the L2 norm of the
    // NORMALIZED suffix starting at that token is >= t. If two titles share
    // no token inside both prefixes, their smallest-order shared token sits
    // in a suffix of norm < t on one side, so cos <= ||suffix|| < t — the
    // candidate equi-join on prefix tokens is lossless. The margin below t
    // absorbs the 6-dp output rounding plus double noise. The full dot
    // product is then computed per CANDIDATE pair over all shared tokens, so
    // an ultra-common token never becomes a df² shuffle key.
    val wSuf = Window.partitionBy("title").orderBy(col("df"), col("tok"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val pref = w.join(dfTab, "tok").join(norms, "title")
      .withColumn("wn", col("w") / col("nrm"))
      .withColumn("sufsq", sum(col("wn") * col("wn")).over(wSuf))
      .filter(sqrt(col("sufsq")) >= lit(0.7 - 2e-6))
      .select("title", "tok")
    val wm = w.join(master, Seq("title"), "left_semi")
      .select(col("title").as("master_title"), col("tok"), col("w").as("wm"))
    val wt = w.join(test, Seq("title"), "left_semi")
      .select(col("title").as("test_title"), col("tok"), col("w").as("wt"))
    val cand = pref.join(master, Seq("title"), "left_semi")
      .select(col("title").as("master_title"), col("tok"))
      .join(pref.join(test, Seq("title"), "left_semi")
        .select(col("title").as("test_title"), col("tok")), "tok")
      .select("master_title", "test_title").distinct()
    cand
      .join(wm, "master_title")
      .join(wt, Seq("test_title", "tok"))
      .groupBy("master_title", "test_title")
      .agg(sum(col("wm") * col("wt")).as("dot"))
      .join(norms.select(col("title").as("master_title"), col("nrm").as("nm")), "master_title")
      .join(norms.select(col("title").as("test_title"), col("nrm").as("nt")), "test_title")
      .select(col("master_title"), col("test_title"),
        round(col("dot") / (col("nm") * col("nt")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= 0.7)
  }

  // ---------------------------------------------------------------- A25
  /** Edit-distance fuzzy ratio matching — the reference's Bundle_Dim match is
    * `fuzz.ratio(master, test) >= 95` (dw4_book_dim.py:291-293), Levenshtein-
    * based: it catches within-token typos that token-set Jaccard (q10) cannot.
    * Ratio here is the indel-normalized variant
    * `100 * (1 - lev(a,b) / (|a|+|b|))` — both engines have a built-in
    * unit-cost `levenshtein`, and the 95 threshold keeps the same "nearly
    * identical strings" contract as fuzz.ratio.
    *
    * Scale: NO cross join. ratio >= 95 implies
    * lev <= 0.05*(|a|+|b|), and |len(a)-len(b)| <= lev, so a matching
    * master's length lies within ~10.6% of the test's — each test title
    * explodes to the few length-buckets (width 4) that can contain a match
    * and the candidate build is an equi-join on the bucket. The bound is
    * lossless: d = floor(0.11*len)+1 > 2/19*len covers every admissible
    * length difference. The DuckDB oracle keeps the naive cross join as an
    * independent spec of the semantics.
    *
    * Skew note: length buckets are LOW-cardinality keys, so a corpus whose
    * titles concentrate on few lengths pairs up within those buckets. The
    * content-keyed refinement is implemented as the selectable
    * `chunkBlocking` plan in [[fuzzyRatioPairs]] (PartEnum, Arasu et al.
    * VLDB'06 / Ed-Join, Xiao et al. VLDB'08): a qualifying pair must
    * contain one of the master's k+1 disjoint chunks verbatim within a ±k
    * position window, making the join key a substring (high-cardinality) at
    * ~(lengths×chunks×shifts) index fan-out. Same trade dd04's PPJoin
    * option measures empirically — bucket blocking is the fast default
    * here, the chunk plan the swap for length-concentrated corpora;
    * FuzzyBlockingSpec proves both produce identical output, including on a
    * single-length corpus. */
  private val W = 4 // length-bucket width

  private def fuzzyMaster(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).filter(col("p_partkey") % 4 === 0)
      .select(lower(col("p_name")).as("master_title")).distinct()
  private def fuzzyTest(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      when(col("p_partkey") % 10 === 1, lower(col("p_name")))
        .when(col("p_partkey") % 2 === 0,
          lower(col("p_name")).substr(lit(1), length(col("p_name")) - 1))
        .otherwise(lower(concat(col("p_name"), lit(" "), col("p_type"))))
        .as("test_title")).distinct()

  /** Exact verify shared by both candidate plans: unit-cost Levenshtein,
    * indel-normalized ratio, threshold 95. */
  private def fuzzyVerify(cand: DataFrame): DataFrame = cand
    .withColumn("lev", levenshtein(col("master_title"), col("test_title")).cast("long"))
    .withColumn("ratio", round(lit(100.0) * (lit(1.0) - col("lev").cast("double") /
      (length(col("master_title")) + length(col("test_title"))).cast("double")), 4))
    .filter(col("ratio") >= 95.0)
    .select("master_title", "test_title", "lev", "ratio")

  /** Fuzzy-ratio pair scoring with two lossless candidate plans.
    *
    * `chunkBlocking = false` (default): length-bucket blocking — each test
    * title explodes to the few width-4 buckets that can hold an admissible
    * master length (|len diff| <= floor(0.11·len)+1 ⊇ the 2/19 bound).
    *
    * `chunkBlocking = true`: PartEnum-style chunk pigeonholing. For master
    * length lm, any qualifying pair has lev <= (2/19)·lm < k :=
    * floor(2·lm/19)+1; split the master into k+1 disjoint chunks, then at
    * most lev < k chunks are touched by edits, so >= 2 survive verbatim in
    * the test string, shifted by at most the lev < k net indels. The index
    * key is (lm, chunk#, substring) — content-keyed, so a corpus where
    * every title has the same length still spreads across the shuffle.
    * Test titles enumerate admissible master lengths × chunks × shifts
    * (~lengths·k·(2k+1) keys each); masters emit k+1 keys. */
  private[graft] def fuzzyRatioPairs(s: SparkSession, d: String,
      chunkBlocking: Boolean): DataFrame = {
    val master = fuzzyMaster(s, d)
    val test = fuzzyTest(s, d)
    if (!chunkBlocking) {
      val m = master.withColumn("bucket", floor(length(col("master_title")) / W))
      val t = test
        .withColumn("lt", length(col("test_title")))
        .withColumn("d", floor(col("lt") * 11 / 100) + 1)
        .withColumn("bucket",
          explode(sequence(floor((col("lt") - col("d")) / W), floor((col("lt") + col("d")) / W))))
        .drop("lt", "d")
      fuzzyVerify(m.join(t, Seq("bucket")))
    } else {
      def chunkStart(lm: Column, k: Column, j: Column): Column = floor(j * lm / (k + 1))
      // Master side: its k+1 chunks at their own positions.
      val lm = length(col("master_title")).cast("long")
      val km = floor(lm * 2 / 19) + 1
      val mKeys = filter(
        transform(sequence(lit(0L), km), j => {
          val sj = chunkStart(lm, km, j)
          val lenj = chunkStart(lm, km, j + 1) - sj
          struct(lm.as("lm"), j.as("j"), sj.as("p"), lenj.as("len"))
        }),
        st => st.getField("len") > 0)
      val m = master.select(col("master_title"), explode(mKeys).as("ck"))
        .select(col("master_title"), col("ck.lm").as("lm"), col("ck.j").as("j"),
          col("master_title").substr((col("ck.p") + 1).cast("int"),
            col("ck.len").cast("int")).as("chunk"))
      // Test side: every admissible master length × chunk × ±k shift window.
      val lt = length(col("test_title")).cast("long")
      val dAdm = floor(lt * 11 / 100) + 1
      val tKeys = flatten(transform(sequence(lt - dAdm, lt + dAdm), lmc => {
        val k = floor(lmc * 2 / 19) + 1
        flatten(transform(sequence(lit(0L), k), j => {
          val sj = chunkStart(lmc, k, j)
          val lenj = chunkStart(lmc, k, j + 1) - sj
          filter(
            transform(sequence(sj - k, sj + k), p =>
              struct(lmc.as("lm"), j.as("j"), p.as("p"), lenj.as("len"))),
            st => st.getField("len") > 0 && st.getField("p") >= 0 &&
              st.getField("p") + st.getField("len") <= lt)
        }))
      }))
      val t = test.select(col("test_title"), explode(tKeys).as("ck"))
        .select(col("test_title"), col("ck.lm").as("lm"), col("ck.j").as("j"),
          col("test_title").substr((col("ck.p") + 1).cast("int"),
            col("ck.len").cast("int")).as("chunk"))
      fuzzyVerify(m.join(t, Seq("lm", "j", "chunk"))
        .select("master_title", "test_title").distinct())
    }
  }

  val q25 = Q(
    "q25_fuzzy_ratio",
    s"""WITH master AS ($masterSql),
      |test AS (SELECT DISTINCT CASE WHEN p_partkey % 10 = 1 THEN lower(p_name)
      |           WHEN p_partkey % 2 = 0
      |           THEN left(lower(p_name), length(p_name) - 1)
      |           ELSE lower(p_name || ' ' || p_type) END AS test_title
      |         FROM part),
      |scored AS (
      |  SELECT m.master_title, t.test_title,
      |    CAST(levenshtein(m.master_title, t.test_title) AS BIGINT) AS lev,
      |    ROUND(100.0 * (1.0 - CAST(levenshtein(m.master_title, t.test_title) AS DOUBLE)
      |          / (length(m.master_title) + length(t.test_title))), 4) AS ratio
      |  FROM master m CROSS JOIN test t)
      |SELECT master_title, test_title, lev, ratio FROM scored WHERE ratio >= 95.0""".stripMargin)(
    fuzzyRatioPairs(_, _, chunkBlocking = false))

  // ---------------------------------------------------------------- A21
  /** Regex text-normalization pipeline.
    * Reference: clean_text_column (wc_block2_helpers.py:101-128) — strip,
    * drop non-alphanumerics to spaces, collapse whitespace, strip again. */
  val q21 = Q(
    "q21_text_clean",
    """SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS clean_text,
      |  CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS BIGINT) AS clean_len
      |FROM documents""".stripMargin) { (s, d) =>
    val cleaned = trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9\\s]", " "), "\\s+", " "))
    Tables.documents(s, d).select(
      col("doc_id"),
      cleaned.as("clean_text"),
      length(cleaned).cast("long").as("clean_len"))
  }

  // ---------------------------------------------------------------- A29
  /** Ordered phrase-removal cleaning — the step that makes the reference's
    * fuzzy matching work on real data: dw4_book_dim.py:110-131 chains
    * str.replace calls in a FIXED order (multi-word phrases first
    * — 'digital only // out of print' — then word replacements ' the | and ',
    * then a char/phrase removal class, then whitespace collapse + strip).
    * Order is semantic: removing the single word 'scan' before the phrase
    * 'table scan' would leave a dangling 'table'. Mirrored here over the
    * documents corpus with corpus-relevant phrases; each step is one
    * codegen'd regexp_replace, single-pass, no shuffle — the DuckDB oracle
    * encodes the identical ordered chain. */
  val q29 = Q(
    "q29_phrase_clean",
    """SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(lower(text),
      |    'table scan', ' ', 'g'),
      |    '\s+\b(the|and)\b\s+', ' ', 'g'),
      |    'scan|batch|[():]', '', 'g'),
      |    '\s+', ' ', 'g')) AS phrase_clean,
      |  CAST(length(trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(lower(text),
      |    'table scan', ' ', 'g'),
      |    '\s+\b(the|and)\b\s+', ' ', 'g'),
      |    'scan|batch|[():]', '', 'g'),
      |    '\s+', ' ', 'g'))) AS BIGINT) AS clean_len
      |FROM documents""".stripMargin) { (s, d) =>
    val cleaned = trim(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(lower(col("text")), "table scan", " "),
            "\\s+\\b(the|and)\\b\\s+", " "),
          "scan|batch|[():]", ""),
        "\\s+", " "))
    Tables.documents(s, d).select(
      col("doc_id"),
      cleaned.as("phrase_clean"),
      length(cleaned).cast("long").as("clean_len"))
  }

  val queries: Seq[Q] = Seq(q10, q11, q21, q25, q29)
}
