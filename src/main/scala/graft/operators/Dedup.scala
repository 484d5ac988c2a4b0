package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.TextPrep._

/** Deduplication family (SURVEY §2 B1–B5): exact, MinHash+LSH, SimHash,
  * blocked n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design: no operator ever forms the full O(n²) pair set. Candidates
  * come from equi-join keys — content hash (B1), LSH band signatures (B2),
  * fingerprint prefix buckets (B3), length blocks (B4), cluster labels (B5) —
  * so the heavy step is always a shuffle-partitionable join whose fan-out is
  * bounded by bucket size, and only candidates pay the verification cost.
  * The DuckDB oracles run the *same* candidate generation, making recall
  * deterministic and cross-checked, not just precision.
  */
object Dedup {

  private def docsClean(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"), col("n_chars"), clean(col("text")).as("c"))
  private val docsCleanSql =
    s"SELECT doc_id, n_chars, $cleanSql AS c FROM documents"

  /** doc_id → distinct 3-word shingles (native single-pass expression —
    * see [[graft.functions.WordShingles3]]; ShingleProperties proves it
    * equals the declarative shingles3 ∘ tokens composition). */
  private[graft] def docShingles(s: SparkSession, d: String): DataFrame =
    docsClean(s, d).select(col("doc_id"),
      graft.functions.WordShingles3.shingles3(col("c")).as("shs"))
  private val docShinglesSql =
    s"""doc AS ($docsCleanSql),
       |toks AS (SELECT doc_id, n_chars, string_split(c, ' ') AS t, c FROM doc),
       |sh AS (SELECT doc_id, n_chars, ${shingles3Sql("t", "c")} AS shs FROM toks)""".stripMargin

  /** Default document-frequency cap for containment candidate generation.
    * 64 is far above any genuine-content shingle's df in the corpus
    * (measured max 7 at sf0.01) while bounding a boilerplate shingle's
    * join fan-out to 64² candidate pairs instead of (corpus df)² — the
    * difference between a skewed key and a job-killing quadratic one at
    * 100 TB. */
  private[graft] val containmentMaxDf = 64

  /** DuckDB mirror of [[containmentPairs]]' df-capped semantics, appended
    * after a chain ending in `sh (doc_id, …, shs)`; ends in
    * `contain1 (id_a, id_b, n_shared, sz_a, sz_b, containment)`. Shared by
    * dd13 and dd14 so the capped spelling cannot drift between them. */
  private def containChainSql(cap: Int): String =
    s"""csx AS (SELECT doc_id, unnest(shs) AS tok FROM sh),
       |cdf AS (SELECT tok FROM csx GROUP BY tok HAVING COUNT(*) <= $cap),
       |cshf AS (SELECT s.doc_id, list(s.tok) AS toks FROM csx s JOIN cdf USING (tok) GROUP BY s.doc_id),
       |csz AS (SELECT doc_id, len(shs) AS sz FROM sh),
       |contain1 AS (SELECT c.id_a, c.id_b, c.n_shared, za.sz AS sz_a, zb.sz AS sz_b,
       |    ROUND(CAST(c.n_shared AS DOUBLE) / CAST(LEAST(za.sz, zb.sz) AS DOUBLE), 6) AS containment
       |  FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |          len(list_intersect(a.toks, b.toks)) AS n_shared
       |        FROM cshf a JOIN cshf b ON a.doc_id < b.doc_id) c
       |  JOIN csz za ON c.id_a = za.doc_id JOIN csz zb ON c.id_b = zb.doc_id)""".stripMargin

  // ---------------------------------------------------------------- B1
  /** Exact dedup via normalized-content hash: groups share md5(clean text);
    * survivor = min doc_id (the reference's drop_duplicates keep-first,
    * dw3_merge_inc.py:110-113, content-addressed instead of positional). */
  val dd01 = Q(
    "dd01_exact",
    s"""WITH doc AS ($docsCleanSql)
      |SELECT md5(c) AS content_hash,
      |  CAST(MIN(doc_id) AS BIGINT) AS keep_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_copies
      |FROM doc GROUP BY md5(c)""".stripMargin) { (s, d) =>
    docsClean(s, d)
      .groupBy(md5(col("c")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
  }

  /** CTE fragment `shx → hashed → sig → bands` from a chain ending in `sh`:
    * the 8-permutation minhash signature and its 4 band keys per doc —
    * shared by the within-corpus pair chain (dd02/dd06/dd14) and the
    * cross-set incremental chain (dd15), so the signature spelling cannot
    * drift between them. */
  private val minhashBandsSql: String = {
    val minCols = minhashPerms.zipWithIndex.map { case ((a, b), k) =>
      s"MIN(($a*h + $b) % 1000000007) AS mh$k" }.mkString(",\n  ")
    val bandList = (0 until 4).map { bnd =>
      s"concat('b$bnd:', mh${2 * bnd}, ':', mh${2 * bnd + 1})" }.mkString("[", ", ", "]")
    s"""shx AS (SELECT doc_id, unnest(shs) AS s FROM sh),
      |hashed AS (SELECT doc_id, ${charHashSql("s")} AS h FROM shx),
      |sig AS (SELECT doc_id,
      |  $minCols
      |FROM hashed GROUP BY doc_id),
      |bands AS (SELECT doc_id, unnest($bandList) AS bk FROM sig)""".stripMargin
  }

  /** CTE chain ending in `scored` (id_a, id_b, jaccard) — the LSH-verified
    * near-dup pairs, shared by dd02's oracle and dd06's recursive closure. */
  private val lshScoredSql: String =
    s"""$docShinglesSql,
      |$minhashBandsSql,
      |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |         FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id),
      |scored AS (SELECT c.id_a, c.id_b, ${jaccardSql("sa.shs", "sb.shs")} AS jaccard
      |           FROM cand c JOIN sh sa ON c.id_a = sa.doc_id JOIN sh sb ON c.id_b = sb.doc_id)""".stripMargin

  /** Spark side of the same pair computation (see dd02 scaladoc).
    * The shingle table is localCheckpoint'ed, not cache()'d: it is read three
    * times (signatures + both sides of the verify join), but checkpoint
    * blocks are released by the ContextCleaner once the plan is unreferenced
    * — a long Verify/Bench session doesn't accumulate pinned cache entries.
    * The 8-permutation signature is a per-row SCALAR (the native
    * [[graft.functions.MinHashSig8]] codegen pass — each shingle hashed
    * once, 8 minima in registers): the old explode → groupBy min path put
    * every (doc, shingle) row through a shuffle just to take per-doc minima
    * the row already had locally. Same arithmetic, same values — the
    * oracle's exploded GROUP BY remains the independent spec. */
  private def lshPairs(s: SparkSession, d: String): DataFrame =
    // eager = false: the router's probe aggregate is the first action and
    // materializes the blocks itself — an eager checkpoint here is one
    // whole extra pass over the corpus scan (guide §1.2: fewer passes).
    lshPairsAuto(docShingles(s, d).localCheckpoint(eager = false))

  /** Routing threshold for [[lshPairsAuto]]: total intra-class pairs above
    * which the exact-collapse-first plan wins. Below it, duplicate classes
    * are small enough that the default plan's band join absorbs them and
    * the classed plan's extra array-keyed groupBy is pure overhead; above
    * it, the default plan pays Σ 4m² band rows PLUS m(m-1)/2 verify rows
    * carrying BOTH full shingle arrays per pair, while the classed plan
    * verifies each class pair once. Measured by [[graft.tools.StressDd02]]
    * on synth-sf1 (SCALING.md): parity at ~2.5e5 intra pairs (4.2 vs
    * 4.4 s), default 10.5× behind at 2.2e6 (36.0 vs 3.4 s). The threshold
    * sits BELOW parity because the risk is asymmetric: routing classed
    * early costs at most the bounded collapse overhead (≤ 1.5×, flat in
    * the dup fraction), while routing default late costs quadratically in
    * the class sizes. */
  private[graft] val lshClassedMinIntraPairs = 50000L

  /** LSH pairs with EXACT-COLLAPSE-FIRST candidate generation — the defense
    * for the regime [[lshPairsFrom]] cannot bound: mass-duplicate classes.
    * A real web corpus has classes of THOUSANDS of byte-identical documents
    * (empty pages, license boilerplate, error pages); each class of size m
    * shares every band key, so the default band self-join forms 4·m²
    * candidate rows and then verifies m(m-1)/2 pairs with full shingle
    * arrays — quadratic in the class size, per class. Production pipelines
    * collapse exact duplicates BEFORE near-dup detection for exactly this
    * reason (dd16 already does it at the report level; this pushes it into
    * the pair generator itself).
    *
    * Exactness: the minhash signature, the band keys, and the verify
    * jaccard are all functions of the shingle SET alone, so classing by
    * `array_sort(shs)` partitions docs into equivalence classes that the
    * whole pipeline cannot distinguish. Cross-class pairs are computed once
    * per class pair on representatives ([[lshPairsFrom]] unchanged) and
    * expanded to members (same jaccard, bands collide iff the reps'
    * did); intra-class pairs are jaccard 1.0 by definition (identical
    * nonempty sets — what the default verify computes for equal arrays),
    * with empty-set classes excluded because the default plan's NULL
    * signature (MinHashSig8 contract) never lets an empty doc pair.
    * DedupEquivalenceSpec proves classed == default row-for-row on planted
    * mass-dup corpora including empty and order-permuted documents.
    *
    * Scale shape: one array-keyed hash aggregate (the collapse) + the
    * default plan on CLASS REPRESENTATIVES + two long-keyed expansion
    * joins. A class of m docs costs m rows through the collapse and its
    * m(m-1)/2 OUTPUT rows — never m² band-join rows, never m² array
    * verifies. The intra expansion is skewed by construction (one hot rep
    * key per giant class) but carries only (long, long, double) rows — the
    * output contract itself is quadratic in m, which is dd06/dd16's
    * argument for clustering instead of pair-listing at deployment. */
  private[graft] def lshPairsClassed(sh: DataFrame): DataFrame = {
    val classes = sh
      .select(col("doc_id"), array_sort(col("shs")).as("key"))
      .groupBy(col("key"))
      .agg(min(col("doc_id")).as("rep"), collect_list(col("doc_id")).as("ids"))
      .localCheckpoint() // feeds reps, the member map, and intra expansion
    val repSh = classes.select(col("rep").as("doc_id"), col("key").as("shs"))
    val memberMap = classes.select(col("rep"), explode(col("ids")).as("member"))
    // cross-class pairs: the unchanged default plan, on representatives
    val repPairs = lshPairsFrom(repSh)
    val cross = repPairs
      .join(memberMap.select(col("rep").as("id_a"), col("member").as("ma")), Seq("id_a"))
      .join(memberMap.select(col("rep").as("id_b"), col("member").as("mb")), Seq("id_b"))
      .select(least(col("ma"), col("mb")).as("id_a"),
        greatest(col("ma"), col("mb")).as("id_b"), col("jaccard"))
    // intra-class pairs: identical NONEMPTY sets are jaccard 1.0 by
    // definition — exactly what the default plan's verify computes for two
    // equal arrays. Empty-set classes are excluded outright: the default
    // plan gives an empty doc a NULL signature (MinHashSig8's contract),
    // so it never pairs there, and Spark's NaN-sorts-greatest semantics
    // would otherwise let a jaccard(∅,∅) = NaN row PASS a ≥ 0.5 filter.
    val intra = classes
      .filter(size(col("ids")) > 1 && size(col("key")) > 0)
      .select(col("rep"), lit(1.0).as("jaccard"))
      .join(memberMap.select(col("rep"), col("member").as("ma")), Seq("rep"))
      .join(memberMap.select(col("rep"), col("member").as("mb")), Seq("rep"))
      .filter(col("ma") < col("mb"))
      .select(col("ma").as("id_a"), col("mb").as("id_b"), col("jaccard"))
    cross.unionByName(intra)
  }

  /** Measured router between [[lshPairsFrom]] and [[lshPairsClassed]] —
    * dd04's adaptive-router pattern applied to the mass-duplicate hazard.
    * The separating statistic is the corpus's total intra-class pair count
    * Σ m(m-1)/2, probed with an 8-BYTE HASH of the class key so the probe
    * shuffles longs, not shingle arrays; a hash collision can only inflate
    * the statistic and route to the classed plan, which re-keys on the
    * exact array — never a correctness risk. The router cannot change
    * results, only cost. */
  private[graft] def lshPairsAuto(sh: DataFrame): DataFrame = {
    val probe = sh
      .select(xxhash64(array_sort(col("shs"))).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("m"))
      .agg(coalesce(sum(expr("m * (m - 1) DIV 2")), lit(0L))).head().getLong(0)
    if (probe > lshClassedMinIntraPairs) lshPairsClassed(sh) else lshPairsFrom(sh)
  }

  /** LSH-verified pairs from an ALREADY-MATERIALIZED shingle table — the
    * seam dd14 threads a shared corpus pass through (its containment edge
    * generator reads the same table). */
  private[graft] def lshPairsFrom(sh: DataFrame): DataFrame = {
    val sig = sh.select(col("doc_id"), minhashSig(col("shs")).as("sig"))
    val bands = sig.select(col("doc_id"),
      explode(array(bandKeys(col("sig")): _*)).as("bk"))
    val a = bands.select(col("doc_id").as("id_a"), col("bk"))
    val b = bands.select(col("doc_id").as("id_b"), col("bk"))
    val cand = a.join(b, Seq("bk")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(sh.select(col("doc_id").as("id_a"), col("shs").as("sa")), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("shs").as("sb")), Seq("id_b"))
      .withColumn("jaccard", jaccard(col("sa"), col("sb")))
      .filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b", "jaccard")
  }

  // ---------------------------------------------------------------- B2
  /** MinHash + LSH banding: 8-permutation signature over 3-word shingles,
    * 4 bands × 2 rows; docs sharing a band become candidates; candidates are
    * verified with true shingle Jaccard >= 0.5. Candidate recall is the
    * standard LSH s-curve (1-(1-j²)⁴) but fully deterministic here because
    * the hash is an explicit arithmetic permutation both engines compute. */
  val dd02 = Q(
    "dd02_minhash_lsh",
    s"""WITH $lshScoredSql
      |SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.5""".stripMargin)(
    lshPairs)

  /** Distributed connected components via the large-star/small-star
    * alternation of Kiveris et al., "Connected Components in MapReduce and
    * Beyond" (SoCC'14). Input: undirected edges (id_a, id_b); output one row
    * per node touching an edge: (doc_id, cluster_id = component minimum,
    * is_canonical = owns the label).
    *
    * Each round is two join+partial-agg shuffles keyed on the node id:
    *   large-star: every node links its LARGER neighbors to the minimum of
    *     its neighborhood (incl. itself);
    *   small-star: every node links its smaller-or-equal neighbors (and
    *     itself) to that minimum.
    * The alternation provably converges in O(log² n) rounds REGARDLESS of
    * component diameter — a 10⁹-node chain takes ~30 rounds where min-label
    * propagation needs 10⁹ — to a star forest whose centers are the
    * component minima. Convergence stays exact (set equality, never an
    * iteration cap; the cap is a runaway backstop far above the log² bound)
    * but is detected cheaply: each round computes an order-independent
    * signature (count, Σhash, Σ(lo+hi)) of the new edge set in the SAME job
    * that materializes it, and the exact set-equality join runs only when
    * the signature repeats — equal sets always have equal signatures, so the
    * expensive confirm fires once, at convergence (plus vanishingly rare
    * hash coincidences, where it correctly rejects and the loop continues).
    * Each round is therefore ONE job: the new edge set is cut with a LAZY
    * localCheckpoint whose blocks materialize under the signature aggregate,
    * so no separate materialization or convergence job exists.
    * ConnectedComponentsSpec checks the result against driver-side
    * union-find on random graphs and on chain graphs of diameter ≫ the old
    * propagation cap. */
  private[graft] def connectedComponents(
      pairs: DataFrame, pairsCanonical: Boolean = false): DataFrame = {
    // Canonical undirected representation: (lo, hi), lo < hi.
    def canon(e: DataFrame): DataFrame = e
      .select(least(col("u"), col("v")).as("lo"), greatest(col("u"), col("v")).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct()
    // Both directions in a single pass: explode, not self-union — a union
    // would reference (and recompute) the input subtree twice.
    def bidir(e: DataFrame): DataFrame = e
      .select(explode(array(
        struct(col("lo").as("u"), col("hi").as("v")),
        struct(col("hi").as("u"), col("lo").as("v")))).as("p"))
      .select(col("p.u").as("u"), col("p.v").as("v"))
    // Order-independent edge-set signature; equal sets ⇒ equal signatures.
    def signature(e: DataFrame): (Long, Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(sum(hash(col("lo"), col("hi")).cast("long")), lit(0L)),
        coalesce(sum(col("lo") + col("hi")), lit(0L))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }

    val spark = pairs.sparkSession
    import spark.implicits.StringToColumn

    // A superseded round's checkpoint blocks are provably garbage the moment
    // the next round's blocks materialize (the lazy checkpoint cuts lineage),
    // but the ContextCleaner only frees them at the next driver GC — on a
    // dense graph the per-round block sets accumulate INSIDE one query and
    // squeeze the heap (dd14 runs the most rounds and paid 9× for it on the
    // 8 GiB bench JVM). Release them deterministically instead: the
    // checkpointed RDD sits behind the DataFrame's LogicalRDD leaf.
    // Releasing makes the superseded DataFrame permanently unrecomputable
    // (the checkpoint truncated its lineage), so release and replacement are
    // fused into ONE operation: the old reference is overwritten in the same
    // expression that frees its blocks, and no later statement can reach it.
    def retireAndAdvance(old: DataFrame, next: DataFrame): DataFrame = {
      old.queryExecution.logical match {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
        case _ => () // not a checkpointed leaf — nothing to free
      }
      next
    }

    // When the caller guarantees its pair set is already canonical
    // (id_a < id_b, distinct — true of every lshPairs* route, whose
    // candidates pass a DISTINCT), the initial canon's exchange is pure
    // overhead and is skipped (guide §2.4: a distinct on already-unique
    // data is an accidental shuffle).
    val pairsUV = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
    // eager = false: the signature aggregate right below is the first
    // action and materializes the blocks — same one-job-per-round shape as
    // the loop's own checkpoints.
    var edges = (if (pairsCanonical)
      pairsUV.select(col("u").as("lo"), col("v").as("hi"))
    else canon(pairsUV))
      .localCheckpoint(eager = false)
    var sig = signature(edges)
    var converged = sig._1 == 0L
    var iter = 0
    val maxIters = 64 // runaway backstop only; log²(n) ≪ this for any real n
    // Scale-adaptive loop configuration (guide §2: derive partitioning from
    // measured input size, never a constant). The signature already counted
    // the edge set exactly; when it is small enough that every round's
    // shuffles fit a handful of tasks, AQE's per-exchange re-plan jobs are
    // the DOMINANT cost of the loop (measured: ~6 stage-jobs × ~80 ms per
    // round on converging kilobyte edge sets) — so the loop plans its
    // rounds with AQE off and shuffle partitions sized from the count
    // (~250k edges ≈ 4 MB per task), and restores the session confs before
    // the result plan is returned. Above the threshold nothing changes:
    // AQE keeps coalescing and skew-splitting production-sized rounds.
    val conf = pairs.sparkSession.conf
    val tinyLoopEdges = 1000000L
    val savedAqe = conf.get("spark.sql.adaptive.enabled", "true")
    val savedParts = conf.get("spark.sql.shuffle.partitions")
    val savedCodegen = conf.get("spark.sql.codegen.wholeStage", "true")
    // spark.graft.cc.tinyLoop=false opts a deployment out of the tiny-loop
    // planning mode without a rebuild (e.g. when the session's AQE state is
    // shared with concurrent queries on the same thread).
    val tinyMode = !converged && sig._1 < tinyLoopEdges &&
      conf.get("spark.graft.cc.tinyLoop", "true") == "true"
    if (tinyMode) {
      conf.set("spark.sql.adaptive.enabled", "false")
      conf.set("spark.sql.shuffle.partitions",
        (1L + sig._1 / 250000L).toString)
      // Below the edge threshold the loop is stage-LATENCY-bound, and the
      // biggest per-stage fixed cost left after the AQE re-plan jobs is
      // whole-stage codegen: every round's plan is new (fresh checkpoint
      // RDD ids), so janino compiles each round's stages from scratch to
      // run them over kilobytes. Interpreted execution skips the compile
      // and is as fast on data this small (measured, paired: dd06
      // 2.9 s → 2.3 s, dd14 −0.3 s; above the threshold codegen stays on —
      // production-sized rounds are compute-bound and codegen earns its
      // compile there). Restored with the other confs in the finally.
      conf.set("spark.sql.codegen.wholeStage", "false")
    }
    try {
    while (!converged && iter < maxIters) {
      val adj = bidir(edges)
      // m(u) = min over the neighborhood of u, including u itself.
      val nbrMin = adj.groupBy($"u").agg(least(min($"v"), $"u").as("m"))
      // large-star: (v, m(u)) for every neighbor v > u. The intermediate
      // edge set feeds ONLY the small star's min-aggregation and join, both
      // of which are duplicate-insensitive (min is idempotent; duplicate
      // join fan-out collapses in the small star's final canon), so the
      // large star skips canon's distinct — one whole exchange less per
      // round (guide §2.4). No canon normalization needed either: m(u) ≤ u
      // < v makes every pair already (lo, hi)-ordered with lo < hi, so
      // self-loops cannot occur and both orientations are covered by the
      // bidir explode exactly as for a canon'd set.
      val large = adj.join(nbrMin, "u").filter($"v" > $"u")
        .select($"m".as("lo"), $"v".as("hi"))
      val adj2 = bidir(large)
      val nbrMin2 = adj2.groupBy($"u").agg(least(min($"v"), $"u").as("m"))
      // small-star: (v, m(u)) for every neighbor v <= u, plus (u, m(u)).
      val small = canon(
        adj2.join(nbrMin2, "u").filter($"v" <= $"u").select($"v".as("u"), $"m".as("v"))
          .union(nbrMin2.select($"u", $"m".as("v"))))
        .localCheckpoint(eager = false)
      // This aggregate is the round's one job: it computes the small-star
      // set, persists its checkpoint blocks, and folds the convergence
      // signature — no separate materialization or comparison pass.
      val newSig = signature(small)
      if (newSig == sig) {
        // Signature repeat: confirm with the exact one-job set-equality
        // check (both sides are distinct sets, so they differ iff some key
        // appears exactly once in the union-all). Runs once per execution.
        converged = small.unionAll(edges)
          .groupBy("lo", "hi").agg(count(lit(1)).as("c"))
          .filter(col("c") === 1).isEmpty
      }
      sig = newSig
      // newSig materialized small's blocks; the old round's are now garbage.
      // The convergence check above was the last read of the old `edges`.
      edges = retireAndAdvance(edges, small)
      iter += 1
    }
    } finally if (tinyMode) {
      conf.set("spark.sql.adaptive.enabled", savedAqe)
      conf.set("spark.sql.shuffle.partitions", savedParts)
      conf.set("spark.sql.codegen.wholeStage", savedCodegen)
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters star rounds — " +
          "input exceeds any plausible log² bound; investigate the edge set")
    // Converged: a star forest of (center=lo, satellite=hi) pairs — every
    // satellite appears in exactly ONE edge and a center is never a
    // satellite (Kiveris et al. §3: the fixpoint of the alternation is the
    // star graph rooted at each component's minimum; ConnectedComponentsSpec
    // re-proves it against driver-side union-find on random and chain
    // graphs). Labels therefore read straight off the edge set: satellites
    // are the edges themselves, centers the distinct lo side — replacing
    // the old defensive nodes-distinct + left-join + groupBy(min) tail
    // (3 exchanges) with a single distinct on the (tiny) center set.
    val sat = edges.select($"hi".as("doc_id"), $"lo".as("cluster_id"))
    val ctrs = edges.select($"lo".as("doc_id")).distinct()
      .select($"doc_id", $"doc_id".as("cluster_id"))
    sat.unionByName(ctrs)
      .select($"doc_id", $"cluster_id", ($"doc_id" === $"cluster_id").as("is_canonical"))
  }

  /** The shared cluster relation: LSH-verified near-dup pairs → connected
    * components — expressed ONCE and consumed by both dd06 (the relation
    * itself) and dd07 (survivor selection over it). In deployment this is a
    * materialized intermediate table: dd06's sink IS dd07's source, so the
    * shingle → minhash → band-join → verify → CC pipeline runs once per
    * corpus snapshot. The per-query harness keeps each query self-contained
    * end-to-end (no cross-query runtime caching — bench numbers stay honest
    * per-query costs), which is why dd07's cost ≈ dd06 + one equi-join. */
  private[graft] def clusters(s: SparkSession, d: String): DataFrame =
    connectedComponents(lshPairs(s, d).select("id_a", "id_b"), pairsCanonical = true)

  /** dd07's survivor rule over an ALREADY-BUILT cluster relation —
    * quality-best member, min-id tie — factored so consumers holding a
    * `clusters` result (Pipeline's swap-in, dd16's report) never run the
    * shingle→LSH→CC pipeline a second time just to pick survivors. */
  private[graft] def survivorsFrom(cl: DataFrame, s: SparkSession, d: String): DataFrame =
    cl.join(graft.functions.TextAnalysis.qualityScore(s, d), Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(max_by(col("doc_id"),
        struct(col("quality"), (-col("doc_id")).as("tie"))).as("doc_id"))
      .select("doc_id")

  // ---------------------------------------------------------------- B6
  /** Near-dup CLUSTER formation: connected components over the LSH-verified
    * pair graph — each doc's cluster_id is the smallest doc_id reachable
    * through near-dup edges, and the canonical survivor is the doc that owns
    * the label. This is the step that turns pairwise dedup signals into a
    * keep/drop decision for a training corpus.
    *
    * Engine: the [[connectedComponents]] large/small-star alternation —
    * logarithmic rounds independent of component diameter, every round ONE
    * job of equi-join + partial-agg shuffles keyed on node id, lineage cut
    * per round with a lazy localCheckpoint. The DuckDB oracle computes the
    * same fixpoint with a recursive CTE. */
  val dd06 = Q(
    "dd06_dup_clusters",
    s"""WITH RECURSIVE $lshScoredSql,
      |pairs AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.5),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |          UNION ALL SELECT id_b, id_a FROM pairs),
      |nodes AS (SELECT DISTINCT src AS id FROM edges),
      |reach(id, comp) AS (
      |  SELECT id, id FROM nodes
      |  UNION
      |  SELECT e.dst, r.comp FROM reach r JOIN edges e ON r.id = e.src),
      |labels AS (SELECT id, MIN(comp) AS comp FROM reach GROUP BY id)
      |SELECT id AS doc_id, comp AS cluster_id, id = comp AS is_canonical
      |FROM labels""".stripMargin)(clusters)

  // ---------------------------------------------------------------- B3
  /** Pigeonhole candidate generation for SimHash: split the 60 fingerprint
    * bits into 5 disjoint 12-bit blocks. A pair with hamming <= 4 has
    * its differing bits spread over at most 4 blocks, so AT LEAST one block
    * is bit-identical — indexing every doc under its 5 (block-id, block-value)
    * keys and equi-joining guarantees 100% recall (Gurmeet/Manku et al.,
    * "Detecting Near-Duplicates for Web Crawling", WWW'07 §3). Factored out
    * so SimhashRecallSpec can prove recall against brute-force hamming.
    * Scale: 5× index fan-out, candidates bounded by per-block bucket size —
    * never all-pairs. Block width is the scale lever: 12-bit keys give a
    * 4096-value space per block index, so random (non-near-dup) bucket
    * collisions are 2^7× rarer than the earlier 24-bit/5-bit-block scheme
    * whose ~144 corpus-wide buckets went quadratic at sf1 (SCALING.md). */
  private[graft] def simhashPairs(fp: DataFrame): DataFrame = {
    def blockVal(c: Column, j: Int): Column =
      shiftright(c, 12 * j) % 4096
    val blocks = fp.select(col("doc_id"), col("fingerprint"),
      posexplode(array((0 until 5).map(j => blockVal(col("fingerprint"), j)): _*))
        .as(Seq("bi", "bv")))
    val a = blocks.select(col("doc_id").as("id_a"), col("fingerprint").as("fp_a"), col("bi"), col("bv"))
    val b = blocks.select(col("doc_id").as("id_b"), col("fingerprint").as("fp_b"), col("bi"), col("bv"))
    // A pair sharing k blocks would surface k times; keep it only where it
    // FIRST matches (every earlier block differs) — a scalar predicate on
    // the two fingerprints, replacing a full shuffle-distinct of the
    // candidate set.
    val firstMatch = (0 until 5).foldLeft(lit(false)) { (acc, j) =>
      when(col("bi") === j,
        (0 until j).map(k => blockVal(col("fp_a"), k) =!= blockVal(col("fp_b"), k))
          .foldLeft(lit(true))(_ && _))
        .otherwise(acc)
    }
    a.join(b, Seq("bi", "bv")).filter(col("id_a") < col("id_b"))
      .filter(firstMatch)
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long"))
      .filter(col("hamming") <= 4)
      .select("id_a", "id_b", "fp_a", "fp_b", "hamming")
  }

  /** SimHash: 60-bit weighted-bit fingerprint over token hashes (two
    * independent 30-bit folds per token — see
    * [[graft.functions.SimHash60]]); pigeonhole 5×12-bit-block candidate
    * generation (see [[simhashPairs]]); near-dup when hamming <= 4 — full
    * recall at that radius by construction. */
  val dd03 = Q(
    "dd03_simhash",
    s"""WITH doc AS ($docsCleanSql),
      |tok AS (SELECT doc_id, unnest(string_split(c, ' ')) AS t FROM doc),
      |tc AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY doc_id, t),
      |th AS (SELECT doc_id, cnt,
      |  ${charHashSql("t")} + ${charHash2Sql("t")} * 1073741824 AS h FROM tc),
      |bits AS (SELECT doc_id, unnest(range(0, 60)) AS b, cnt, h FROM th),
      |contrib AS (SELECT doc_id, b,
      |  SUM(CASE WHEN (h // CAST(power(2, b) AS BIGINT)) % 2 = 1 THEN cnt ELSE -cnt END) AS w
      |FROM bits GROUP BY doc_id, b),
      |fp AS (SELECT doc_id,
      |  CAST(SUM(CASE WHEN w > 0 THEN CAST(power(2, b) AS BIGINT) ELSE 0 END) AS BIGINT) AS fingerprint
      |FROM contrib GROUP BY doc_id),
      |blocks AS (SELECT doc_id, fingerprint,
      |  unnest([0, 1, 2, 3, 4]) AS bi,
      |  unnest([fingerprint % 4096, (fingerprint // 4096) % 4096,
      |          (fingerprint // 16777216) % 4096, (fingerprint // 68719476736) % 4096,
      |          fingerprint // 281474976710656]) AS bv
      |FROM fp),
      |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.fingerprint AS fp_a, b.fingerprint AS fp_b
      |         FROM blocks a JOIN blocks b ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id)
      |SELECT id_a, id_b, fp_a, fp_b,
      |  CAST(bit_count(xor(fp_a, fp_b)) AS BIGINT) AS hamming
      |FROM cand WHERE bit_count(xor(fp_a, fp_b)) <= 4""".stripMargin) { (s, d) =>
    // The oracle counts per-(doc, distinct token) then weights by count; a
    // sum of count×(±1) over distinct tokens equals a sum of ±1 over raw
    // token OCCURRENCES, so the engine computes the whole fingerprint as
    // ONE scalar codegen pass over each document ([[graft.functions
    // .SimHash60]]): no token explode, no (doc, 60-sums) aggregate — the
    // fingerprint stage is now shuffle-free and the first exchange in the
    // plan is the (already one-row-per-doc) pigeonhole candidate join. The
    // oracle's unnest(range(0,60)) row explosion stays the independent spec.
    val fp = docsClean(s, d).select(col("doc_id"),
      graft.functions.SimHash60.simhash60(col("c")).as("fingerprint"))
    simhashPairs(fp).select("id_a", "id_b", "fp_a", "fp_b", "hamming")
  }

  // ---------------------------------------------------------------- B4
  /** n-gram Jaccard pair scoring, two selectable candidate plans — measured
    * on this corpus, reasoned for 100 TB:
    *
    * `prefixFilter = false` (default): explode distinct shingles,
    * self-equi-join on the shingle, COUNT shared shingles per pair — |A∩B| —
    * so J = inter/(|A|+|B|-inter) falls out of one hash aggregate. No
    * per-pair array intersection, no cross join; `shuffle_hash` makes the
    * second exploded side a ReusedExchange (the corpus is shingled once).
    * Fastest when shingle document frequencies are modest, which is the
    * common case after boilerplate stripping.
    *
    * `prefixFilter = true`: PPJoin (Xiao et al., WWW'08) — shingles ordered
    * by (df ASC, shingle ASC); only each doc's first |x|-⌈t·|x|⌉+1 shingles
    * are indexed (a J>=0.5 pair must share a shingle inside BOTH prefixes —
    * lossless); candidates then re-join the full index for the COUNT. This
    * bounds fan-out when a boilerplate shingle is shared by a large corpus
    * fraction (the df² hot-key case) at the price of a second verify join —
    * measured ~4× slower on THIS corpus (whose near-dup density makes the
    * candidate set large either way), which is why it is the documented
    * swap-in rather than the default. DedupEquivalenceSpec proves BOTH
    * plans equal brute force on planted corpora.
    *
    * Both prune with the lossless size-ratio bound (J>=0.5 ⇒ min>=max/2). */
  private[graft] def ngramJaccardPairs(s: SparkSession, d: String,
      prefixFilter: Boolean): DataFrame =
    ngramJaccardPairsFrom(docShingles(s, d), prefixFilter)

  /** Same, over an ALREADY-BUILT (doc_id, shs) shingle table — the seam the
    * hot-shingle stress harness (tools.StressDd04) feeds synthetic corpora
    * through without a parquet round-trip. */
  private[graft] def ngramJaccardPairsFrom(sh: DataFrame,
      prefixFilter: Boolean): DataFrame = {
    // explode_outer: plain explode pushes a `size(shs)>0` filter below the
    // projection chain, recomputing the regex+shingle expression per row;
    // shingle arrays are never empty (shingles3 falls back to [c]), so the
    // outer variant is semantics-identical and keeps the pipeline single-pass.
    val shx = sh.withColumn("sz", size(col("shs")))
      .select(col("doc_id"), col("sz"), explode_outer(col("shs")).as("tok"))
    def score(pairs: DataFrame): DataFrame = pairs
      .groupBy("id_a", "id_b", "sz_a", "sz_b")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b", "jaccard")
    val sizeRatio = col("id_a") < col("id_b") &&
      least(col("sz_a"), col("sz_b")) * 2 >= greatest(col("sz_a"), col("sz_b"))
    if (!prefixFilter) {
      score(shx.select(col("doc_id").as("id_a"), col("sz").as("sz_a"), col("tok"))
        .join(shx.select(col("doc_id").as("id_b"), col("sz").as("sz_b"), col("tok"))
          .hint("shuffle_hash"), Seq("tok"))
        .filter(sizeRatio))
    } else {
      val shc = shx.localCheckpoint() // feeds df table, prefix window, verify join
      val dfT = shc.groupBy("tok").agg(count(lit(1)).as("df"))
      val wOrd = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("df"), col("tok"))
      val pref = shc.join(dfT, "tok")
        .withColumn("rn", row_number().over(wOrd))
        .filter(col("rn") <= col("sz") - ceil(col("sz") * 0.5) + 1)
        .select("doc_id", "sz", "tok")
      val cand = pref.select(col("doc_id").as("id_a"), col("sz").as("sz_a"), col("tok"))
        .join(pref.select(col("doc_id").as("id_b"), col("sz").as("sz_b"), col("tok"))
          .hint("shuffle_hash"), Seq("tok"))
        .filter(sizeRatio)
        .select("id_a", "id_b", "sz_a", "sz_b").distinct()
      score(cand
        .join(shc.select(col("doc_id").as("id_a"), col("tok")), Seq("id_a"))
        .join(shc.select(col("doc_id").as("id_b"), col("tok")).hint("shuffle_hash"),
          Seq("id_b", "tok")))
    }
  }

  /** Hot-shingle plan selection, measured (tools.StressDd04, synth-sf1
    * 50 k docs, local[32]): the default shuffle-count plan costs
    * ~Σ df²/1.5e7 s and beats the prefix plan 2.5–7× on bounded-df corpora
    * (0% boilerplate: 2.5 s vs 18 s), but explodes when boilerplate makes
    * df ∝ N (30% stressed docs: Σ df² = 2.3e9 → 134 s vs the prefix
    * plan's FLAT 9 s). The two cost models cross where Σ df² ≈ 8× the
    * exploded row count E = Σ df (measured: ratio 1.07 → default wins big;
    * 10.7 → prefix edges ahead; 87 → prefix wins 14.5×). The ratio alone
    * is asymptotic — the prefix plan's fixed multi-stage overhead
    * dominates at toy scale (at sf0.1, ratio 10.7 but default still wins
    * 4×) — so the chooser also requires the join volume to be absolutely
    * expensive before paying for the prefix machinery. */
  private[graft] val HotShingleRatio = 8L
  private[graft] val HotShingleFloor = 100000000L // Σ df² below this: join is cheap either way

  /** Hot-shingle decision: true ⇒ the prefix (PPJoin) plan, when the
    * candidate volume Σ df² is both ratio-dominated (> 8× E) AND
    * absolutely large (> 1e8). One hash aggregate over the exploded
    * shingle table — at 100 TB this statistic is noise next to either
    * plan, and it is exactly the quantity that separates them. */
  private[graft] def chooseNgramPrefix(sh: DataFrame,
      ratio: Long = HotShingleRatio, floor: Long = HotShingleFloor): Boolean = {
    val r = sh.select(explode(col("shs")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
      .agg(sum(col("df") * col("df")).as("j"), sum(col("df")).as("e"))
      .head()
    r.getLong(0) > ratio * r.getLong(1) && r.getLong(0) > floor
  }

  /** Deployment entry for n-gram Jaccard: materializes the shingle pass
    * once, measures the hot-shingle statistic, and runs whichever
    * candidate plan that corpus actually wants. DedupEquivalenceSpec
    * proves both branches equal brute force; AdaptiveNgramSpec pins the
    * branch decision on clean vs boilerplate corpora. */
  def ngramJaccardPairsAuto(s: SparkSession, d: String): DataFrame = {
    val sh = docShingles(s, d).localCheckpoint()
    ngramJaccardPairsFrom(sh, prefixFilter = chooseNgramPrefix(sh))
  }

  /** See [[ngramJaccardPairs]]. The DuckDB oracle is the naive O(n²) cross
    * join with true list_intersect — an independent spec of the semantics.
    * The REGISTERED plan is the static default — the choice
    * [[chooseNgramPrefix]] itself makes for this corpus (Σ df² = 2.8e6 at
    * sf0.1, far under the volume floor); [[ngramJaccardPairsAuto]] is the
    * deployment entry that re-derives that choice per corpus. */
  val dd04 = Q(
    "dd04_ngram_jaccard",
    s"""WITH $docShinglesSql,
      |scored AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |                  ${jaccardSql("a.shs", "b.shs")} AS jaccard
      |           FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      |SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.5""".stripMargin)(
    ngramJaccardPairs(_, _, prefixFilter = false))

  // ---------------------------------------------------------------- B5
  /** Embedding-cosine near-dup, blocked by cluster label: the pairwise join
    * stays inside label partitions. Dot products are explicit left-folds in
    * double precision — bit-identical across engines. */
  val dd05 = Q(
    "dd05_embedding_cosine",
    s"""WITH e AS (SELECT vec_id, label, embedding AS v FROM embeddings),
      |n AS (SELECT vec_id, label, v,
      |  sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, len(v)+1), i -> CAST(v[i] AS DOUBLE) * CAST(v[i] AS DOUBLE))), (acc, x) -> acc + x)) AS nrm
      |FROM e),
      |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label,
      |  ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, len(a.v)+1), i -> CAST(a.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE))), (acc, x) -> acc + x) / (a.nrm * b.nrm), 6) AS cos_sim
      |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
      |SELECT id_a, id_b, label, cos_sim FROM pairs WHERE cos_sim >= 0.25""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("label"), col("embedding").as("v"))
    val n = e.withColumn("nrm", graft.functions.VectorMath.l2norm(col("v")))
    val a = n.select(col("vec_id").as("id_a"), col("label"), col("v").as("va"), col("nrm").as("na"))
    val b = n.select(col("vec_id").as("id_b"), col("label"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("label")).filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", round(
        graft.functions.VectorMath.dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("cos_sim") >= 0.25)
      .select("id_a", "id_b", "label", "cos_sim")
  }

  // ---------------------------------------------------------------- B7
  /** Survivor selection — the dedup endgame: within every near-dup cluster
    * (dd06's connected components), KEEP the member with the best tx02
    * quality score (tie-break lowest doc_id) and report the cluster size.
    * This is the decision a training pipeline actually executes: one
    * canonical document per duplicate set, chosen by content quality rather
    * than arrival order.
    *
    * Scale: clusters ⋈ quality is an equi-join on doc_id; the survivor pick
    * is a max_by hash aggregate keyed on cluster_id — partial-agg friendly,
    * no window over the membership relation. */
  val dd07 = Q(
    "dd07_keep_best",
    s"""WITH RECURSIVE $lshScoredSql,
      |pairs AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.5),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |          UNION ALL SELECT id_b, id_a FROM pairs),
      |nodes AS (SELECT DISTINCT src AS id FROM edges),
      |reach(id, comp) AS (
      |  SELECT id, id FROM nodes
      |  UNION
      |  SELECT e.dst, r.comp FROM reach r JOIN edges e ON r.id = e.src),
      |labels AS (SELECT id, MIN(comp) AS comp FROM reach GROUP BY id),
      |quality AS (${graft.functions.TextAnalysis.qualityScoreSql}),
      |ranked AS (SELECT l.comp AS cluster_id, l.id, q.quality,
      |  row_number() OVER (PARTITION BY l.comp ORDER BY q.quality DESC, l.id) AS rn,
      |  COUNT(*) OVER (PARTITION BY l.comp) AS n_members
      |FROM labels l JOIN quality q ON l.id = q.doc_id)
      |SELECT cluster_id, id AS survivor_id, quality AS best_quality,
      |  CAST(n_members AS BIGINT) AS n_members
      |FROM ranked WHERE rn = 1""".stripMargin) { (s, d) =>
    clusters(s, d).join(graft.functions.TextAnalysis.qualityScore(s, d), Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(
        max_by(col("doc_id"), struct(col("quality"), (-col("doc_id")).as("tie"))).as("survivor_id"),
        max(col("quality")).as("best_quality"),
        count(lit(1)).as("n_members"))
      .select("cluster_id", "survivor_id", "best_quality", "n_members")
  }

  // ---------------------------------------------------------------- B8
  /** Embedding-cosine near-dup, LSH-blocked — dd05 without the label crutch.
    * dd05's pairwise join is bounded only because the synthetic corpus has a
    * label column to block on; an unlabeled 100 TB corpus has no such gift.
    * Here the blocking key is [[SimilaritySearch]]'s deterministic 8-plane
    * hyperplane bucket (Charikar STOC'02): vectors with high cosine land in
    * the same bucket with probability (1-θ/π)^8, the pairwise verify join
    * stays inside buckets (corpus/256 expected bucket size), and the key is
    * data-independent — no training pass, churn-safe. The DuckDB oracle runs
    * the identical bucket partition, so recall is pinned cross-engine, and
    * ann03's single-probe contract applies: raise planes for precision,
    * multi-probe neighbor buckets for recall. */
  val dd08 = Q(
    "dd08_embedding_lsh",
    s"""WITH n AS (${SimilaritySearch.vecsSql}),
      |coded AS (SELECT vec_id, v, nrm, ${SimilaritySearch.bucketSql("v")} AS bucket FROM n),
      |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.bucket,
      |  ROUND(${SimilaritySearch.dotSql("a.v", "b.v")} / (a.nrm * b.nrm), 6) AS cos_sim
      |FROM coded a JOIN coded b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
      |SELECT id_a, id_b, bucket, cos_sim FROM pairs WHERE cos_sim >= 0.25""".stripMargin) { (s, d) =>
    val coded = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", graft.functions.VectorMath.l2norm(col("v")))
      .withColumn("bucket", SimilaritySearch.bucketCol(col("v")))
    val a = coded.select(col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na"), col("bucket"))
    val b = coded.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"), col("bucket"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", SimilaritySearch.cosine(col("va"), col("na"), col("vb"), col("nb")))
      .filter(col("cos_sim") >= 0.25)
      .select("id_a", "id_b", "bucket", "cos_sim")
  }

  // ---------------------------------------------------------------- B9
  /** Benchmark DECONTAMINATION — the training-corpus hygiene step next to
    * dedup: a training document that shares any n-word shingle with the
    * held-out eval split is flagged (with how many windows leaked and what
    * fraction of the doc they are), the standard n-gram-collision
    * decontamination of GPT-3 appendix C / Dolma. Here n=8 (sized to the
    * synthetic docs; 13 is the published default — one plan-time constant)
    * and the eval split is the deterministic doc_id % 17 == 0 slice.
    *
    * Scale: grams come from the [[graft.functions.WordShinglesN]] codegen
    * scan, are hashed to 8-byte keys ([[TextPrep.charHash]]) BEFORE the
    * shuffle — the join moves longs, not 45-char strings — and the eval side
    * of the hash-distinct is a fraction of the corpus: a classic
    * small-vs-huge equi-join that broadcasts at real scale. The gram table
    * is localCheckpoint'ed once and feeds eval/train/count uses without
    * re-scanning the corpus. */
  /** dd09/dd18 shared oracle: 8-gram membership of the train split against
    * the eval split's distinct gram-hash set. dd18 computes the SAME relation
    * through a Bloom-prefiltered plan (no false negatives + exact verify ⇒
    * identical output), so both queries pin to one SQL spelling. */
  private val decontamSql =
    s"""WITH doc AS ($docsCleanSql),
      |toks AS (SELECT doc_id, string_split(c, ' ') AS t, c FROM doc),
      |g0 AS (SELECT doc_id, CASE WHEN len(t) >= 8 THEN list_distinct(list_transform(range(0, len(t)-7), i -> array_to_string(t[i+1:i+8], ' '))) ELSE [c] END AS gs FROM toks),
      |g AS (SELECT doc_id, ${charHashSql("gram")} AS gh FROM (SELECT doc_id, unnest(gs) AS gram FROM g0)),
      |ev AS (SELECT DISTINCT gh FROM g WHERE doc_id % 17 = 0),
      |tr AS (SELECT doc_id, gh FROM g WHERE doc_id % 17 <> 0),
      |ng AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams FROM tr GROUP BY doc_id),
      |hits AS (SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared FROM tr t JOIN ev e ON t.gh = e.gh GROUP BY t.doc_id)
      |SELECT h.doc_id, h.n_shared, n.n_grams,
      |  ROUND(CAST(h.n_shared AS DOUBLE) / CAST(n.n_grams AS DOUBLE), 6) AS shared_frac
      |FROM hits h JOIN ng n ON h.doc_id = n.doc_id""".stripMargin

  /** doc_id → 8-gram hash, one row per (doc, distinct gram); the shared
    * front half of dd09/dd18. Checkpointed once: eval distinct, train
    * denominator, and the hit join all read it without re-scanning docs. */
  private def decontamGrams(s: SparkSession, d: String): DataFrame =
    docsClean(s, d)
      .select(col("doc_id"),
        explode(graft.functions.WordShinglesN.shinglesN(col("c"), 8)).as("gram"))
      .select(col("doc_id"), charHash(col("gram")).as("gh"))
      .localCheckpoint()

  val dd09 = Q("dd09_decontaminate", decontamSql) { (s, d) =>
    val g = decontamGrams(s, d)
    val ev = g.filter(col("doc_id") % 17 === 0).select("gh").distinct()
    val tr = g.filter(col("doc_id") % 17 =!= 0)
    val ng = tr.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val hits = tr.join(ev, "gh").groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    hits.join(ng, "doc_id")
      .select(col("doc_id"), col("n_shared"), col("n_grams"),
        round(col("n_shared").cast("double") / col("n_grams").cast("double"), 6).as("shared_frac"))
  }

  // ---------------------------------------------------------------- B18
  /** dd09's semantics through the 100 TB plan shape: the eval gram set is
    * collapsed into a fixed-size Bloom sketch (distributed treeAggregate
    * build — the driver holds the bitset, never the key set), shipped to
    * every train-side scan task as a plan-embedded codegen expression
    * ([[graft.functions.BloomMightContainLong]]), and only grams the sketch
    * admits reach the exchange + exact verify join. No false negatives +
    * exact verify ⇒ output is bit-identical to dd09 (same oracle SQL; the
    * spec also asserts frame equality directly), but the big-side exchange
    * now carries hits + ~1% fpp instead of the whole corpus: at a
    * sub-percent contamination rate that is a ~50-100× shuffle-volume cut,
    * and the sketch itself is ~9.6 bits/key where an exact broadcast hash
    * relation needs ~64+. The per-doc gram denominator still counts the
    * UNFILTERED train side — the sketch prunes the join input, not the
    * statistics. */
  val dd18 = Q("dd18_bloom_decontaminate", decontamSql) { (s, d) =>
    val g = decontamGrams(s, d)
    val ev = g.filter(col("doc_id") % 17 === 0).select("gh").distinct().localCheckpoint()
    val bf = graft.functions.BloomFilters.buildLong(ev, "gh", ev.count(), 0.01)
    val tr = g.filter(col("doc_id") % 17 =!= 0)
    val ng = tr.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val candidates = tr.filter(graft.functions.BloomFilters.mightContainLong(col("gh"), bf))
    val hits = candidates.join(ev, "gh").groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    hits.join(ng, "doc_id")
      .select(col("doc_id"), col("n_shared"), col("n_grams"),
        round(col("n_shared").cast("double") / col("n_grams").cast("double"), 6).as("shared_frac"))
  }

  // ---------------------------------------------------------------- B19
  /** EXACT REPEATED-SPAN detection — the "exact substring dedup" modality
    * (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    * Better"; RedPajama/Dolma run it suffix-array-based): find maximal
    * verbatim token spans ≥ [[spanMinTokens]] shared between document
    * PAIRS. Distinct from dd10, which dedups FIXED tumbling windows — a
    * long verbatim overlap that straddles window boundaries, or sits at a
    * different token offset in each doc, is invisible to dd10's keys but is
    * exactly what this operator emits (with per-doc start offsets, so a
    * trim/redact step can act on the span, not the whole doc).
    *
    * Plan shape (the suffix array re-expressed relationally): stride-1
    * sliding windows of [[spanWindow]] tokens are position-tagged and
    * hashed INSIDE a per-doc `transform` (one codegen pass; window strings
    * never leave the expression — only (pos, hash64-ish) longs explode);
    * boilerplate windows are df-capped (≤ [[spanMaxDf]], dd13's defense —
    * a window in k docs fans out to ≤ k² pairs, so the cap bounds the
    * self-join exactly as containmentMaxDf does); the window-hash self-join
    * yields (pair, pa, pb) match points, and maximal runs fall out of the
    * classic gaps-and-islands collapse on each pair's DIAGONAL
    * (pb − pa constant, pa consecutive): group by (pair, diag,
    * pa − row_number), one hash aggregate, span = run + W − 1. Everything
    * after the capped join is equi-keyed aggregation — no per-pair arrays,
    * no quadratic corpus step.
    *
    * Hash note: polyHash31's 30-bit space means cross-window collisions
    * exist at corpus scale, but both engines fold the identical hash, so
    * output stays oracle-identical; a spurious collision match forms a
    * span of exactly W < spanMinTokens and is filtered — only a collision
    * landing precisely in a same-diagonal gap could bridge runs, in both
    * engines alike. Production knob: swap in the 60-bit charHash+charHash2
    * combo (dd03's spelling) — one expression change on each side. */
  private val spanWindow = 10
  private val spanMaxDf = 16
  private val spanMinTokens = 20

  /** dd19/dd20 shared oracle chain: `doc` through qualifying `spans`
    * (id_a, id_b, start_a, start_b, span_tokens ≥ threshold). */
  private val spanChainSql =
    s"""doc AS ($docsCleanSql),
      |tk AS (SELECT doc_id, string_split(c, ' ') AS t FROM doc WHERE len(string_split(c, ' ')) >= $spanWindow),
      |w AS (SELECT doc_id,
      |  unnest(list_transform(range(0, len(t)-$spanWindow+1), p -> p)) AS pos,
      |  unnest(list_transform(range(0, len(t)-$spanWindow+1), p -> ${charHashSql(s"array_to_string(t[p+1:p+$spanWindow], ' ')")})) AS wh
      |FROM tk),
      |dfc AS (SELECT wh FROM w GROUP BY wh HAVING COUNT(*) <= $spanMaxDf),
      |wf AS (SELECT w.doc_id, w.pos, w.wh FROM w JOIN dfc USING (wh)),
      |m AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pa, b.pos AS pb
      |      FROM wf a JOIN wf b ON a.wh = b.wh AND a.doc_id < b.doc_id),
      |d AS (SELECT *, pb - pa AS diag,
      |        pa - row_number() OVER (PARTITION BY id_a, id_b, pb - pa ORDER BY pa) AS isl
      |      FROM m),
      |runs AS (SELECT id_a, id_b, MIN(pa) AS start_a, MIN(pb) AS start_b,
      |         COUNT(*) + $spanWindow - 1 AS span_tokens
      |         FROM d GROUP BY id_a, id_b, diag, isl),
      |spans AS (SELECT id_a, id_b, start_a, start_b, CAST(span_tokens AS BIGINT) AS span_tokens
      |          FROM runs WHERE span_tokens >= $spanMinTokens)""".stripMargin

  /** Qualifying repeated spans over any (doc_id, c) relation, df-cap as a
    * parameter — dd19/dd20's shared core and StressDd19's subject
    * (`maxDf = Int.MaxValue` skips the cap pass entirely, charging the
    * cap's own window-df aggregate to the capped arm only). */
  private[graft] def repeatedSpansFrom(docs: DataFrame, maxDf: Int = spanMaxDf): DataFrame = {
    val w = spanWindow
    // One codegen pass per doc: (pos, windowHash) longs are all that
    // explode — WindowHashProperties pins the expression equal to the
    // transform∘slice∘array_join∘polyHash31 composition the oracle spells;
    // sub-window docs yield an empty array (≡ the oracle's WHERE len ≥ w).
    // THREE consumers downstream (the df cap and both self-join sides), so
    // the corpus regex-clean + window-hash pass is cut here or it runs
    // three times per execution (measured: 3 × ~400 ms single-task stages
    // at sf0.1). The checkpointed rows are (doc_id, pos, wh) longs — the
    // lightweight proxy, never the text. Lazy: the first action
    // materializes the blocks.
    val wins = docs
      .select(col("doc_id"),
        posexplode(graft.functions.WordWindowHashes.windowHashes(col("c"), w)))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("wh"))
      .localCheckpoint(eager = false)
    // df cap as a count window over the wh partitioning (the containment
    // cap's shape): ONE exchange of wins replaces the grouped-df aggregate
    // plus the join-back's re-shuffle, and the window's partitioning is
    // what the self-join needs anyway (guide §2.4).
    val wf =
      if (maxDf == Int.MaxValue) wins
      else wins
        .withColumn("dfw", count(lit(1)).over(Window.partitionBy(col("wh"))))
        .filter(col("dfw") <= maxDf)
        .drop("dfw")
    val m = wf.as("a").join(wf.as("b"),
        col("a.wh") === col("b.wh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.pos").as("pa"), col("b.pos").as("pb"))
    val diag = m.withColumn("diag", col("pb") - col("pa"))
      .withColumn("isl", col("pa") - row_number().over(
        Window.partitionBy("id_a", "id_b", "diag").orderBy("pa")))
    diag.groupBy("id_a", "id_b", "diag", "isl")
      .agg(min("pa").as("start_a"), min("pb").as("start_b"),
        (count(lit(1)) + (w - 1)).as("span_tokens"))
      .filter(col("span_tokens") >= spanMinTokens)
      .select("id_a", "id_b", "start_a", "start_b", "span_tokens")
  }

  /** Qualifying repeated spans — dd19's relation, shared with dd20's apply. */
  private def repeatedSpans(s: SparkSession, d: String): DataFrame =
    repeatedSpansFrom(docsClean(s, d))

  val dd19 = Q(
    "dd19_repeated_spans",
    s"""WITH $spanChainSql
      |SELECT id_a, id_b, start_a, start_b, span_tokens FROM spans""".stripMargin)(
    repeatedSpans(_, _))

  // ---------------------------------------------------------------- B20
  /** Repeated-span APPLY — dd19's decision materialized as the trimmed
    * corpus (the second half of Lee et al. 2022's exact substring dedup,
    * as dd17 is dd10's): every LATER occurrence of a qualifying shared
    * span is removed token-by-token (keep-first = the lower-doc_id side
    * survives, dd01's rule at span granularity), overlapping spans union
    * into one removal mask, untouched docs pass through byte-equal, and a
    * fully-covered doc (the exact-dup b-side) survives as an empty string
    * with the count trail to show why.
    *
    * Scale: the mask is an explode of span POSITIONS (span-volume-sized,
    * not corpus-sized), removal is one (doc, pos) anti-join, and the
    * rebuild is dd17's stitch — token strings move once, inherent to
    * emitting text. */
  val dd20 = Q(
    "dd20_span_trim",
    s"""WITH $spanChainSql,
      |rem AS (SELECT DISTINCT doc_id, p FROM (
      |  SELECT id_b AS doc_id, unnest(range(start_b, start_b + span_tokens)) AS p FROM spans)),
      |toks AS (SELECT doc_id,
      |  unnest(list_transform(range(0, len(t)), i -> i)) AS p,
      |  unnest(t) AS tok
      |FROM (SELECT doc_id, string_split(c, ' ') AS t FROM doc)),
      |kept AS (SELECT k.doc_id, k.p, k.tok FROM toks k
      |         LEFT JOIN rem r ON k.doc_id = r.doc_id AND k.p = r.p
      |         WHERE r.p IS NULL),
      |rebuilt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
      |            string_agg(tok, ' ' ORDER BY p) AS clean_text
      |            FROM kept GROUP BY doc_id),
      |nrem AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_removed FROM rem GROUP BY doc_id)
      |SELECT d.doc_id, CAST(len(string_split(d.c, ' ')) AS BIGINT) AS n_tokens,
      |  COALESCE(n.n_removed, 0) AS n_removed,
      |  COALESCE(r.clean_text, '') AS clean_text
      |FROM doc d LEFT JOIN nrem n ON d.doc_id = n.doc_id
      |           LEFT JOIN rebuilt r ON d.doc_id = r.doc_id""".stripMargin) { (s, d) =>
    val spans = repeatedSpans(s, d)
    val rem = spans.select(col("id_b").as("doc_id"),
        explode(sequence(col("start_b"), col("start_b") + col("span_tokens") - 1)).as("p"))
      .distinct()
    val toks = docsClean(s, d)
      .select(col("doc_id"), posexplode(split(col("c"), " ")).as(Seq("p", "tok")))
      .select(col("doc_id"), col("p").cast("long").as("p"), col("tok"))
    val kept = toks.join(rem, Seq("doc_id", "p"), "left_anti")
    val rebuilt = kept.groupBy("doc_id").agg(
      array_join(transform(array_sort(collect_list(struct(col("p"), col("tok")))),
        x => x.getField("tok")), " ").as("clean_text"))
    val nrem = rem.groupBy("doc_id").agg(count(lit(1)).as("n_removed"))
    docsClean(s, d)
      .select(col("doc_id"), size(split(col("c"), " ")).cast("long").as("n_tokens"))
      .join(nrem, Seq("doc_id"), "left")
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  // ---------------------------------------------------------------- B10
  /** PARAGRAPH-level exact dedup — the sub-document granularity between dd01
    * (whole-doc) and dd02 (fuzzy): boilerplate that repeats across documents
    * (headers, license blocks, navigation chrome) is removed paragraph by
    * paragraph while the unique remainder of each document survives. This is
    * the Dolma/CCNet-style paragraph dedup step, keyed on a paragraph hash
    * with first-occurrence-wins semantics.
    *
    * The synthetic corpus is one unbroken line (no newlines), so "paragraph"
    * is synthesized deterministically as consecutive 20-token windows — the
    * same synthesize-missing-structure pattern as q31/q32/tx07; the
    * segmentation rule is one plan-time expression swap when real paragraph
    * breaks exist. Near-dup documents differing by token SUBSTITUTION keep
    * their unedited windows bit-identical, so the planted near-dup pairs
    * surface here as shared paragraphs.
    *
    * First occurrence = lowest (doc_id, position), resolved with ONE
    * `min(struct(doc_id, p))` hash aggregate per paragraph hash —
    * lexicographic struct ordering gives the two-level argmin in a single
    * partial-agg-friendly pass (the oracle spells the same thing as two
    * grouped MINs). Scale: paragraphs are an explode of the corpus scan;
    * the keeper table is an equi-join on the hash; nothing is ever pairwise. */
  val dd10 = Q(
    "dd10_paragraph_dedup",
    s"""WITH doc AS ($docsCleanSql),
      |t AS (SELECT doc_id, string_split(c, ' ') AS t FROM doc),
      |ch AS (SELECT doc_id,
      |  list_transform(range(0, CAST(ceil(len(t) / 20.0) AS BIGINT)), i -> i) AS ps,
      |  list_transform(range(0, CAST(ceil(len(t) / 20.0) AS BIGINT)),
      |                 i -> md5(array_to_string(t[i*20+1:i*20+20], ' '))) AS hs
      |FROM t),
      |para AS (SELECT doc_id, unnest(ps) AS p, unnest(hs) AS h FROM ch),
      |k1 AS (SELECT h, MIN(doc_id) AS kd FROM para GROUP BY h),
      |k2 AS (SELECT p.h, p.doc_id AS kd, MIN(p.p) AS kp
      |       FROM para p JOIN k1 ON p.h = k1.h AND p.doc_id = k1.kd
      |       GROUP BY p.h, p.doc_id),
      |flag AS (SELECT p.doc_id,
      |  CASE WHEN p.doc_id = k2.kd AND p.p = k2.kp THEN 0 ELSE 1 END AS is_dup
      |  FROM para p JOIN k2 ON p.h = k2.h)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_paras,
      |  CAST(SUM(is_dup) AS BIGINT) AS n_dups,
      |  ROUND(CAST(SUM(is_dup) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS dup_frac
      |FROM flag GROUP BY doc_id""".stripMargin) { (s, d) =>
    val para = docsClean(s, d)
      .select(col("doc_id"), split(col("c"), " ").as("t"))
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), (ceil(size(col("t")) / lit(20.0)) - 1).cast("int")),
        i => md5(array_join(slice(col("t"), i * 20 + 1, lit(20)), " "))))
        .as(Seq("p", "h")))
      .select(col("doc_id"), col("p").cast("long").as("p"), col("h"))
    // First occurrence = min(struct(doc_id, p)) per hash, resolved as a
    // WINDOW over the hash partitioning instead of a grouped aggregate
    // joined back on h: the window needs ONE corpus shuffle where the
    // agg+join needed the agg exchange plus a re-shuffle of both sides
    // (the keeper table is corpus-distinct-sized — never broadcastable at
    // 100 TB), and the single-consumer relation no longer needs a
    // checkpoint (guide §2.4).
    para
      .withColumn("k", min(struct(col("doc_id"), col("p")))
        .over(Window.partitionBy(col("h"))))
      .withColumn("is_dup",
        when(col("doc_id") === col("k.doc_id") && col("p") === col("k.p"), 0L).otherwise(1L))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_paras"), sum(col("is_dup")).as("n_dups"))
      .select(col("doc_id"), col("n_paras"), col("n_dups"),
        round(col("n_dups").cast("double") / col("n_paras").cast("double"), 6).as("dup_frac"))
  }

  // ---------------------------------------------------------------- B11
  /** SEMANTIC dedup, cluster-blocked (SemDeDup, Abbas et al. 2023): assign
    * every embedding to its nearest coarse centroid (the IVF assignment
    * ann02 ships), compare pairs ONLY within a cell, and remove the
    * higher-id member of every pair above the similarity threshold — the
    * keep-one-per-semantic-neighborhood policy that prunes paraphrases and
    * re-encodings exact/MinHash dedup (dd01/dd02) cannot see.
    *
    * Differs from dd08 in WHERE candidates come from: dd08 blocks on
    * data-independent hyperplane buckets (robust to churning corpora),
    * this blocks on learned cluster structure (tighter candidate sets when
    * the corpus clusters well) — the two ends of the embedding-dedup
    * design space. Output is the REMOVAL decision per dropped vector:
    * its cell, the surviving keeper (lowest-id qualifying neighbor — the
    * deterministic stand-in for SemDeDup's keep-one rule), how many
    * qualifying neighbors it had, and the strongest similarity.
    *
    * Scale: assignment is a broadcast-centroid max_by hash aggregate
    * (corpus shuffled once at its own size); the pair join is equi-keyed
    * on cell with per-cell size bounded by the centroid count knob; the
    * removal aggregate is a hash aggregate on the pair stream. No O(n²)
    * stage anywhere; the codegen dot product keeps the scans in
    * WholeStageCodegen. */
  val dd11 = Q(
    "dd11_semdedup",
    s"""WITH n AS (${SimilaritySearch.vecsSql}),
      |cent AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id % 50 = 0),
      |assign0 AS (
      |  SELECT n.vec_id, n.v, n.nrm, cent.cent_id,
      |    row_number() OVER (PARTITION BY n.vec_id ORDER BY ROUND(${SimilaritySearch.dotSql("n.v", "cent.cv")} / (n.nrm * cent.cn), 6) DESC, cent.cent_id) AS rn
      |  FROM n CROSS JOIN cent),
      |assigned AS (SELECT vec_id, v, nrm, cent_id AS cell FROM assign0 WHERE rn = 1),
      |pairs AS (SELECT a.vec_id AS keeper, b.vec_id AS removed, a.cell,
      |  ROUND(${SimilaritySearch.dotSql("a.v", "b.v")} / (a.nrm * b.nrm), 6) AS cos_sim
      |FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id)
      |SELECT removed AS removed_id, cell,
      |  MIN(keeper) AS keeper_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_dups,
      |  MAX(cos_sim) AS max_sim
      |FROM pairs WHERE cos_sim >= 0.25
      |GROUP BY removed, cell""".stripMargin) { (s, d) =>
    val n = SimilaritySearch.vecs(s, d)
    val cent = n.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("nrm").as("cn"))
    val assigned = n.crossJoin(broadcast(cent))
      .withColumn("cos_c",
        SimilaritySearch.cosine(col("v"), col("nrm"), col("cv"), col("cn")))
      .groupBy("vec_id")
      .agg(max_by(struct(col("cent_id"), col("v"), col("nrm")),
        struct(col("cos_c"), (-col("cent_id")).as("tie"))).as("best"))
      .select(col("vec_id"), col("best.v").as("v"),
        col("best.nrm").as("nrm"), col("best.cent_id").as("cell"))
      // referenced twice (both pair sides) — checkpoint so the broadcast
      // centroid assignment runs once, not once per reference (subtree
      // duplication gets no CSE)
      .localCheckpoint()
    val a = assigned.select(col("vec_id").as("keeper"), col("v").as("va"),
      col("nrm").as("na"), col("cell"))
    val b = assigned.select(col("vec_id").as("removed"), col("v").as("vb"),
      col("nrm").as("nb"), col("cell"))
    a.join(b, Seq("cell")).filter(col("keeper") < col("removed"))
      .withColumn("cos_sim",
        SimilaritySearch.cosine(col("va"), col("na"), col("vb"), col("nb")))
      .filter(col("cos_sim") >= 0.25)
      .groupBy(col("removed").as("removed_id"), col("cell"))
      .agg(min(col("keeper")).as("keeper_id"),
        count(lit(1)).as("n_dups"),
        max(col("cos_sim")).as("max_sim"))
  }

  // ---------------------------------------------------------------- B12
  /** MinHash CALIBRATION — the measurement half of the MinHash family,
    * as ann05 is for the ANN family: for every LSH band candidate pair
    * (unfiltered — the raw funnel dd02 thresholds), both the 8-permutation
    * signature ESTIMATE of Jaccard (matching components / 8) and the TRUE
    * shingle Jaccard, plus the signed error. This is the table that answers
    * "are 8 permutations enough, and where does the s-curve put my
    * threshold" before anyone trusts dd02's ≥0.5 cut on a new corpus —
    * E[est] = true Jaccard per the MinHash guarantee (Broder '97), with
    * stderr √(j(1−j)/8) visible directly in the dump.
    *
    * Scale: identical plan shape to dd02 (scalar signatures, band-key
    * equi-join, shingle join for the exact value) — the estimate column is
    * free (the signatures already rode along); the true-Jaccard join is the
    * expensive verify step this table exists to help TUNE (a calibrated
    * band/threshold config verifies fewer false candidates). */
  val dd12 = Q(
    "dd12_minhash_calibration",
    s"""WITH $lshScoredSql,
      |sigj AS (SELECT c.id_a, c.id_b,
      |    ROUND(CAST((CASE WHEN a.mh0 = b.mh0 THEN 1 ELSE 0 END +
      |      CASE WHEN a.mh1 = b.mh1 THEN 1 ELSE 0 END +
      |      CASE WHEN a.mh2 = b.mh2 THEN 1 ELSE 0 END +
      |      CASE WHEN a.mh3 = b.mh3 THEN 1 ELSE 0 END +
      |      CASE WHEN a.mh4 = b.mh4 THEN 1 ELSE 0 END +
      |      CASE WHEN a.mh5 = b.mh5 THEN 1 ELSE 0 END +
      |      CASE WHEN a.mh6 = b.mh6 THEN 1 ELSE 0 END +
      |      CASE WHEN a.mh7 = b.mh7 THEN 1 ELSE 0 END) AS DOUBLE) / 8.0, 6) AS est_jaccard
      |  FROM cand c JOIN sig a ON c.id_a = a.doc_id JOIN sig b ON c.id_b = b.doc_id)
      |SELECT s.id_a, s.id_b, g.est_jaccard, s.jaccard AS true_jaccard,
      |  ROUND(g.est_jaccard - s.jaccard, 6) AS err
      |FROM scored s JOIN sigj g ON s.id_a = g.id_a AND s.id_b = g.id_b""".stripMargin) { (s, d) =>
    val sh = docShingles(s, d).localCheckpoint()
    val sig = sh.select(col("doc_id"), minhashSig(col("shs")).as("sig"))
      .localCheckpoint() // feeds banding AND both estimate sides
    val bands = sig.select(col("doc_id"),
      explode(array(bandKeys(col("sig")): _*)).as("bk"))
    val cand = bands.select(col("doc_id").as("id_a"), col("bk"))
      .join(bands.select(col("doc_id").as("id_b"), col("bk")), Seq("bk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val matches = (0 until 8)
      .map(k => when(element_at(col("sa"), k + 1) === element_at(col("sb"), k + 1), 1)
        .otherwise(0))
      .reduce(_ + _)
    cand
      .join(sig.select(col("doc_id").as("id_a"), col("sig").as("sa")), Seq("id_a"))
      .join(sig.select(col("doc_id").as("id_b"), col("sig").as("sb")), Seq("id_b"))
      .join(sh.select(col("doc_id").as("id_a"), col("shs").as("ssa")), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("shs").as("ssb")), Seq("id_b"))
      .withColumn("est_jaccard", round(matches.cast("double") / 8.0, 6))
      .withColumn("true_jaccard", jaccard(col("ssa"), col("ssb")))
      .withColumn("err", round(col("est_jaccard") - col("true_jaccard"), 6))
      .select("id_a", "id_b", "est_jaccard", "true_jaccard", "err")
  }

  // ---------------------------------------------------------------- B13
  /** Containment near-dup (C4/RefinedWeb flavor): score pairs by
    * C = |A∩B| / min(|A|,|B|) — the fraction of the SMALLER document's
    * shingles found in the other. Jaccard (dd04) misses exactly these
    * pairs: a paragraph pasted into a 100× longer page has J ≈ |A|/|B| ≈ 0
    * but C ≈ 1. That asymmetry also kills dd04's size-ratio prune
    * (min ≥ max/2): a contained pair can have ANY size ratio, so no length
    * blocking is lossless here — which is what makes containment its own
    * operator rather than a dd04 threshold tweak.
    *
    * Scale: same shared-shingle COUNT plan as dd04 — explode distinct
    * shingles, self-equi-join on the shingle (shuffle_hash → the second
    * exploded side is a ReusedExchange), |A∩B| from ONE hash aggregate;
    * never a per-pair array intersect, never a cross join. Candidate
    * fan-out is bounded by shingle document frequency, and because the
    * PPJoin-style prefix bound does not transfer (containment has no
    * two-sided prefix guarantee), the bound is ENFORCED: shingles whose
    * document frequency exceeds [[containmentMaxDf]] are dropped from
    * candidate generation — see [[containmentPairs]] for the exact
    * semantics and recall trade, [[containmentHotShingles]] for the audit
    * relation. The oracle applies the identical cap (cdf/cshf CTEs), so
    * the capped semantics are what the gate checks, not an approximation
    * of an uncapped ideal. */
  val dd13 = Q(
    "dd13_containment",
    s"""WITH $docShinglesSql,
      |${containChainSql(containmentMaxDf)}
      |SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared,
      |  CAST(sz_a AS BIGINT) AS sz_a, CAST(sz_b AS BIGINT) AS sz_b, containment
      |FROM contain1
      |WHERE containment >= 0.5""".stripMargin)(
    (s, d) => containmentPairs(docShingles(s, d)))

  /** Containment pairs from a shingle table — dd13's body, factored so dd14
    * can feed both edge generators from ONE materialized corpus pass.
    *
    * The df-cap: shingles appearing in more than `maxDf` documents are
    * excluded from candidate generation AND from the shared-shingle count,
    * while denominators keep the documents' ORIGINAL shingle counts — so
    * containment is only ever UNDERestimated (precision intact, bounded
    * recall loss). The pair you lose is one whose overlap consists
    * entirely of corpus-hot boilerplate — exactly the overlap that should
    * not merge two documents. One extra tok-keyed window pass pays for
    * the bound; the window's partitioning is reused by the self-join. */
  private[graft] def containmentPairs(
      shTable: DataFrame, maxDf: Int = containmentMaxDf): DataFrame = {
    // 8-byte shingle proxy (guide §2.3: shuffle keys and metadata instead
    // of payloads): the df window, the self-join and the pair aggregate
    // only ever need shingle IDENTITY, never its characters, so each
    // ~25-byte 3-word shingle string is hashed to a long BEFORE the first
    // exchange — the tok-keyed shuffles ship 8-byte keys and every window
    // partition/join probe/group compare becomes a long op instead of a
    // string hash+compare (measured on dd14's candidate stage: shuffle
    // bytes 10.9 → 7.1 MB, task time 7.4 s → 5.6 s). explode_outer's null
    // (empty doc) is preserved as a
    // null proxy: xxhash64 never returns null, and a hashed "null bucket"
    // would suddenly equi-join empty docs together. A 64-bit collision
    // between two distinct shingles would overcount n_shared / df by one
    // (P ≈ n²/2⁻⁶⁴ per corpus); ContainmentCapSpec proves the hash is
    // injective on the planted corpus and the test tables, so the declared
    // results are bit-identical to the string-keyed spelling the oracle
    // still computes.
    val shx = shTable.withColumn("sz", size(col("shs")))
      .select(col("doc_id"), col("sz"), explode_outer(col("shs")).as("tok"))
      .select(col("doc_id"), col("sz"),
        when(col("tok").isNotNull, xxhash64(col("tok"))).as("th"))
    // maxDf = Int.MaxValue means UNCAPPED: skip the df window pass entirely
    // (StressDd13's baseline arm — the cap's overhead must not be charged
    // to the plan that doesn't use it).
    val capped = if (maxDf == Int.MaxValue) shx else shx
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("th"))))
      .filter(col("df") <= maxDf)
      .drop("df")
    capped.select(col("doc_id").as("id_a"), col("sz").as("sz_a"), col("th"))
      .join(capped.select(col("doc_id").as("id_b"), col("sz").as("sz_b"), col("th"))
        .hint("shuffle_hash"), Seq("th"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "sz_a", "sz_b")
      .agg(count(lit(1)).as("n_shared"))
      .withColumn("containment", round(col("n_shared").cast("double") /
        least(col("sz_a"), col("sz_b")).cast("double"), 6))
      .filter(col("containment") >= 0.5)
      .select(col("id_a"), col("id_b"), col("n_shared"),
        col("sz_a").cast("long").as("sz_a"), col("sz_b").cast("long").as("sz_b"),
        col("containment"))
  }

  /** Audit companion to the df-cap: the shingles [[containmentPairs]]
    * dropped, with their document frequencies — the "loud" record of what
    * the cap cost, for threshold tuning and upstream boilerplate-strip
    * (q21/q29) triage. Empty whenever the cap did not bite. */
  private[graft] def containmentHotShingles(
      shTable: DataFrame, maxDf: Int = containmentMaxDf): DataFrame =
    shTable.select(explode(col("shs")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)

  // ---------------------------------------------------------------- B14
  /** MULTI-SIGNAL dedup — what production corpus pipelines actually run:
    * no single near-dup detector catches everything (Jaccard is blind to
    * containment by construction — dd13's raison d'être — and containment
    * alone over-merges balanced partial overlaps), so the keep/drop
    * decision clusters the UNION of the signal families' edge sets. Here:
    * LSH-verified Jaccard ≥ 0.5 pairs ∪ containment ≥ 0.5 pairs →
    * connected components → every clustered doc labeled, with the cluster's
    * contributing signal families surfaced as a sorted `signals` tag
    * ('containment', 'lsh', or 'containment+lsh') — the audit column that
    * says WHY a cluster exists, which is how thresholds get tuned per
    * signal instead of per pipeline.
    *
    * Scale: both edge generators are the already-bounded keyed joins
    * (band-bucket, shared-shingle count); the union is edge-sized; CC is
    * dd06's large/small-star engine; the signal rollup is one hash
    * aggregate over edges. Nothing new shuffles the corpus. */
  val dd14 = Q(
    "dd14_multi_signal",
    s"""WITH RECURSIVE $lshScoredSql,
      |${containChainSql(containmentMaxDf)},
      |contain AS (SELECT id_a, id_b FROM contain1 WHERE containment >= 0.5),
      |sigedges AS (
      |  SELECT id_a, id_b, 'lsh' AS sig FROM scored WHERE jaccard >= 0.5
      |  UNION ALL SELECT id_a, id_b, 'containment' FROM contain),
      |edgeset AS (SELECT DISTINCT id_a, id_b FROM sigedges),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM edgeset
      |          UNION ALL SELECT id_b, id_a FROM edgeset),
      |nodes AS (SELECT DISTINCT src AS id FROM edges),
      |reach(id, comp) AS (
      |  SELECT id, id FROM nodes
      |  UNION
      |  SELECT e.dst, r.comp FROM reach r JOIN edges e ON r.id = e.src),
      |labels AS (SELECT id, MIN(comp) AS comp FROM reach GROUP BY id),
      |sized AS (SELECT comp, CAST(COUNT(*) AS BIGINT) AS sz FROM labels GROUP BY comp),
      |csig AS (SELECT l.comp,
      |    array_to_string(list_sort(list_distinct(list(s.sig))), '+') AS signals
      |  FROM sigedges s JOIN labels l ON s.id_a = l.id GROUP BY l.comp)
      |SELECT l.id AS doc_id, l.comp AS cluster_id, z.sz AS cluster_size,
      |  c.signals, l.id = l.comp AS is_canonical
      |FROM labels l JOIN sized z ON l.comp = z.comp
      |JOIN csig c ON l.comp = c.comp""".stripMargin) { (s, d) =>
    // eager = false on both: the router probe materializes the shingle
    // table; CC's first signature aggregate materializes the edge set —
    // two whole corpus/edge passes saved per execution.
    val sh = docShingles(s, d).localCheckpoint(eager = false) // ONE corpus pass, both generators
    val sigedges = lshPairsAuto(sh).select(col("id_a"), col("id_b"), lit("lsh").as("sig"))
      .unionByName(containmentPairs(sh).select(col("id_a"), col("id_b"),
        lit("containment").as("sig")))
      .localCheckpoint(eager = false) // feeds CC AND the per-cluster signal rollup
    val labels = connectedComponents(sigedges.select("id_a", "id_b"))
    val sizes = labels.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
    val sigs = sigedges
      .join(labels.select(col("doc_id").as("id_a"), col("cluster_id")), "id_a")
      .groupBy("cluster_id")
      .agg(array_join(array_sort(array_distinct(collect_list(col("sig")))), "+").as("signals"))
    labels.join(sizes, "cluster_id").join(sigs, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        col("signals"), col("is_canonical"))
  }

  // ---------------------------------------------------------------- B15
  /** INCREMENTAL dedup — the shape production corpus pipelines actually
    * run day to day: nobody re-clusters 100 TB when a batch lands; the
    * increment is scored AGAINST the standing corpus and only genuinely
    * new documents are admitted. Increment = doc_id % 5 = 4 (ann13's delta
    * batch convention); base = the rest. Per increment doc, one verdict:
    * 'exact_dup' (content hash already in the base), 'near_dup'
    * (LSH-verified shingle Jaccard ≥ 0.5 against a base doc), or 'new' —
    * plus the matched base doc (highest Jaccard, min-id tie) for audit.
    * Exact takes precedence over near: identical cleaned text is Jaccard 1
    * through the band join too, but the hash verdict is the cheaper and
    * stronger claim.
    *
    * Scale is the point: the base side of every join is what a deployment
    * stores as the dedup INDEX (content-hash set + minhash band table,
    * both incrementally maintainable — G-series sinks), so the per-batch
    * cost is |increment| signatures + equi-joins keyed on hash/band, never
    * a corpus×corpus pass; candidate verification touches only
    * band-colliding (increment, base) pairs. */
  val dd15 = Q(
    "dd15_incremental",
    s"""WITH $docShinglesSql,
      |$minhashBandsSql,
      |inc AS (SELECT doc_id FROM doc WHERE doc_id % 5 = 4),
      |bh AS (SELECT md5(c) AS h, MIN(doc_id) AS match_id
      |       FROM doc WHERE doc_id % 5 <> 4 GROUP BY md5(c)),
      |ex AS (SELECT d.doc_id, b.match_id FROM doc d JOIN bh b ON md5(d.c) = b.h
      |       WHERE d.doc_id % 5 = 4),
      |candx AS (SELECT DISTINCT a.doc_id, b.doc_id AS base_id
      |          FROM bands a JOIN bands b ON a.bk = b.bk
      |          WHERE a.doc_id % 5 = 4 AND b.doc_id % 5 <> 4),
      |nearv AS (SELECT c.doc_id, c.base_id, ${jaccardSql("sa.shs", "sb.shs")} AS j
      |          FROM candx c JOIN sh sa ON c.doc_id = sa.doc_id
      |          JOIN sh sb ON c.base_id = sb.doc_id),
      |near AS (SELECT doc_id, base_id AS match_id, j FROM (
      |  SELECT doc_id, base_id, j,
      |         row_number() OVER (PARTITION BY doc_id ORDER BY j DESC, base_id) AS rn
      |  FROM nearv WHERE j >= 0.5) WHERE rn = 1)
      |SELECT i.doc_id,
      |  CASE WHEN e.match_id IS NOT NULL THEN 'exact_dup'
      |       WHEN n.match_id IS NOT NULL THEN 'near_dup'
      |       ELSE 'new' END AS verdict,
      |  COALESCE(e.match_id, n.match_id) AS match_id,
      |  CASE WHEN e.match_id IS NOT NULL THEN CAST(1.0 AS DOUBLE) ELSE n.j END AS jaccard
      |FROM inc i LEFT JOIN ex e ON i.doc_id = e.doc_id
      |LEFT JOIN near n ON i.doc_id = n.doc_id""".stripMargin) { (s, d) =>
    val doc = docsClean(s, d).localCheckpoint() // hash set + increment spine
    val sh = docShingles(s, d).localCheckpoint() // signatures + verify join
    val isInc = col("doc_id") % 5 === 4
    val inc = doc.filter(isInc).select(col("doc_id"), md5(col("c")).as("h"))
      .join(sh.select("doc_id", "shs"), "doc_id")
    val (baseHashes, baseBands, baseSh) =
      dedupIndexRelations(doc.filter(!isInc), sh.filter(!isInc))
    incrementalVerdicts(inc, baseHashes, baseBands, baseSh)
  }

  /** The storable dedup index's three relations — content-hash set
    * (h → min owner), minhash band table (bk → member), verify shingle
    * sets — from a cleaned-doc relation (doc_id, c) and its shingle table
    * (doc_id, shs). ONE spelling, consumed by dd15's batch build and
    * [[graft.streaming.IncrementalDedupStream.index]], so the index half
    * of the batch/stream parity cannot drift either. */
  private[graft] def dedupIndexRelations(
      doc: DataFrame, sh: DataFrame): (DataFrame, DataFrame, DataFrame) = (
    doc.groupBy(md5(col("c")).as("h")).agg(min(col("doc_id")).as("em")),
    sh.select(col("doc_id").as("base_id"),
        explode(array(bandKeys(minhashSig(col("shs"))): _*)).as("bk"))
      .select("bk", "base_id"),
    sh.select(col("doc_id").as("base_id"), col("shs").as("sb")))

  /** dd15's decision core over explicit index relations — shared verbatim
    * with the ingest-time twin [[graft.streaming.IncrementalDedupStream]],
    * so the nightly batch and the streaming gate cannot drift. `inc` is
    * the arriving relation (doc_id, h = md5 of cleaned text, shs); the
    * three base relations are exactly what a deployment STORES as its
    * dedup index: the content-hash set (h → min owner), the minhash band
    * table (bk → member), and the shingle sets for candidate verification.
    * All joins are keyed on hash/band/doc — per-batch cost is the
    * increment's size against the touched index buckets. */
  private[graft] def incrementalVerdicts(
      inc: DataFrame, baseHashes: DataFrame,
      baseBands: DataFrame, baseSh: DataFrame): DataFrame = {
    val exact = inc.select(col("doc_id"), col("h"))
      .join(baseHashes, "h").select(col("doc_id"), col("em"))
    val bands = inc.select(col("doc_id"),
      explode(array(bandKeys(minhashSig(col("shs"))): _*)).as("bk"))
    val cand = bands.join(baseBands, Seq("bk"))
      .select("doc_id", "base_id").distinct()
    val near = cand
      .join(inc.select(col("doc_id"), col("shs").as("sa")), Seq("doc_id"))
      .join(baseSh, Seq("base_id"))
      .withColumn("j", jaccard(col("sa"), col("sb")))
      .filter(col("j") >= 0.5)
      .groupBy(col("doc_id"))
      .agg(min_by(struct(col("base_id").as("nm"), col("j").as("nj")),
        struct((-col("j")).as("negj"), col("base_id"))).as("m"))
      .select(col("doc_id"), col("m.nm").as("nm"), col("m.nj").as("nj"))
    inc.select("doc_id")
      .join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("em").isNotNull, "exact_dup")
          .when(col("nm").isNotNull, "near_dup")
          .otherwise("new").as("verdict"),
        coalesce(col("em"), col("nm")).as("match_id"),
        when(col("em").isNotNull, lit(1.0)).otherwise(col("nj")).as("jaccard"))
  }

  // ---------------------------------------------------------------- B16
  /** Per-source dedup IMPACT report — the dashboard that tells a corpus
    * owner what dedup actually cost each source: document count, exact-dup
    * casualties (non-keeper members of a content-hash group, dd01's rule),
    * near-dup casualties (clustered non-survivors by dd07's quality rule,
    * counted only among docs the exact rule didn't already remove —
    * precedence makes the three classes partition every source), kept
    * docs, and removed share in integer ppm. A source bleeding docs here
    * is a scrape or template farm; one losing nothing may be under-deduped
    * — either way this is the table that decision gets argued from (and
    * the per-source refinement of q53's global funnel).
    *
    * Scale: composes the already-bounded machinery — one content-hash
    * aggregate, ONE cluster build (dd06's CC engine) with survivors picked
    * from the same relation, then a doc-keyed flag join + per-source
    * rollup. Nothing new shuffles the corpus. */
  val dd16 = Q(
    "dd16_dedup_report",
    s"""WITH RECURSIVE $lshScoredSql,
      |pairs AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.5),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |          UNION ALL SELECT id_b, id_a FROM pairs),
      |nodes AS (SELECT DISTINCT src AS id FROM edges),
      |reach(id, comp) AS (
      |  SELECT id, id FROM nodes
      |  UNION
      |  SELECT e.dst, r.comp FROM reach r JOIN edges e ON r.id = e.src),
      |labels AS (SELECT id, MIN(comp) AS comp FROM reach GROUP BY id),
      |quality AS (${graft.functions.TextAnalysis.qualityScoreSql}),
      |ranked AS (SELECT l.comp, l.id,
      |  row_number() OVER (PARTITION BY l.comp ORDER BY q.quality DESC, l.id) AS rn
      |FROM labels l JOIN quality q ON l.id = q.doc_id),
      |surv AS (SELECT id FROM ranked WHERE rn = 1),
      |eh AS (SELECT md5(c) AS h, MIN(doc_id) AS keep FROM doc GROUP BY md5(c)),
      |ec AS (SELECT d.doc_id FROM doc d JOIN eh ON md5(d.c) = eh.h
      |       WHERE d.doc_id <> eh.keep),
      |nc AS (SELECT l.id AS doc_id FROM labels l
      |       WHERE l.id NOT IN (SELECT id FROM surv)
      |         AND l.id NOT IN (SELECT doc_id FROM ec)),
      |docsrc AS (SELECT doc_id, source FROM documents)
      |SELECT s.source,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup,
      |  CAST(SUM(CASE WHEN e.doc_id IS NULL AND n.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup,
      |  CAST(SUM(CASE WHEN e.doc_id IS NULL AND n.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN e.doc_id IS NOT NULL OR n.doc_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000
      |       // COUNT(*) AS BIGINT) AS removed_ppm
      |FROM docsrc s LEFT JOIN ec e ON s.doc_id = e.doc_id
      |LEFT JOIN nc n ON s.doc_id = n.doc_id
      |GROUP BY s.source""".stripMargin) { (s, d) =>
    // Exact-dup casualties = docs that are not their content-hash group's
    // minimum: one window over the hash partitioning replaces the grouped
    // keeper table + md5-keyed self-join (two exchanges and a corpus-sized
    // join side at scale), and the single-consumer relation no longer
    // needs its checkpoint (guide §2.4).
    // TWO consumers — the nearCas anti-join AND the final flag join — so
    // the corpus scan + md5 window subtree must be cut or it runs twice
    // per execution (the window rewrite's "single consumer" claim was
    // wrong for THIS query). Lazy: the first action materializes it.
    val exactCas = docsClean(s, d)
      .withColumn("keep", min(col("doc_id")).over(Window.partitionBy(md5(col("c")))))
      .filter(col("doc_id") =!= col("keep"))
      .select("doc_id")
      .localCheckpoint(eager = false)
    val cl = clusters(s, d).localCheckpoint() // survivor pick AND casualty set
    val nearCas = cl.select("doc_id")
      .join(survivorsFrom(cl, s, d), Seq("doc_id"), "left_anti")
      .join(exactCas, Seq("doc_id"), "left_anti")
    Tables.documents(s, d).select(col("doc_id"), col("source"))
      .join(exactCas.withColumn("ec", lit(1)), Seq("doc_id"), "left")
      .join(nearCas.withColumn("nc", lit(1)), Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("ec").isNotNull, 1).otherwise(0)).as("n_exact_dup"),
        sum(when(col("ec").isNull && col("nc").isNotNull, 1).otherwise(0)).as("n_near_dup"),
        sum(when(col("ec").isNull && col("nc").isNull, 1).otherwise(0)).as("n_kept"),
        expr("sum(case when ec is not null or nc is not null then 1 else 0 end) * 1000000 div count(1)")
          .as("removed_ppm"))
  }

  // ---------------------------------------------------------------- B17
  /** Paragraph-dedup APPLY — dd10's decision turned into the cleaned
    * corpus a trainer actually reads: duplicated paragraphs (first
    * occurrence kept, every later copy dropped) are removed and each
    * document's surviving windows are stitched back, in position order,
    * into its cleaned text. dd10 reports the damage; this ships the
    * repaired documents — the pair every stats-vs-apply family here keeps
    * (dd06→dd07, q55→q39). Same synthesized 20-token segmentation, same
    * min(struct(doc_id, p)) first-occurrence rule, so the two operators
    * cannot drift.
    *
    * A document that loses every window (all its paragraphs seen earlier)
    * survives as an EMPTY string — the row is the audit trail; dropping it
    * is tx08's call, not dedup's.
    *
    * Scale: unlike dd10 (which moves only hashes), apply must move the
    * window STRINGS once — that is inherent to materializing output text.
    * The keeper table stays hash-keyed and the rebuild is one corpus-sized
    * equi-join on the window hash + one doc-keyed aggregate whose
    * collect_list is bounded by the document's own window count (never
    * cross-document). */
  val dd17 = Q(
    "dd17_paragraph_apply",
    s"""WITH doc AS ($docsCleanSql),
      |t AS (SELECT doc_id, string_split(c, ' ') AS t FROM doc),
      |ch AS (SELECT doc_id,
      |  list_transform(range(0, CAST(ceil(len(t) / 20.0) AS BIGINT)), i -> i) AS ps,
      |  list_transform(range(0, CAST(ceil(len(t) / 20.0) AS BIGINT)),
      |                 i -> array_to_string(t[i*20+1:i*20+20], ' ')) AS ws
      |FROM t),
      |para AS (SELECT doc_id, unnest(ps) AS p, unnest(ws) AS w FROM ch),
      |ph AS (SELECT doc_id, p, w, md5(w) AS h FROM para),
      |k1 AS (SELECT h, MIN(doc_id) AS kd FROM ph GROUP BY h),
      |k2 AS (SELECT p.h, p.doc_id AS kd, MIN(p.p) AS kp
      |       FROM ph p JOIN k1 ON p.h = k1.h AND p.doc_id = k1.kd
      |       GROUP BY p.h, p.doc_id),
      |flag AS (SELECT p.doc_id, p.p, p.w,
      |  CASE WHEN p.doc_id = k2.kd AND p.p = k2.kp THEN 1 ELSE 0 END AS kept
      |  FROM ph p JOIN k2 ON p.h = k2.h)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_paras,
      |  CAST(SUM(kept) AS BIGINT) AS n_kept,
      |  COALESCE(string_agg(w, ' ' ORDER BY p) FILTER (WHERE kept = 1), '') AS clean_text
      |FROM flag GROUP BY doc_id""".stripMargin) { (s, d) =>
    val para = docsClean(s, d)
      .select(col("doc_id"), split(col("c"), " ").as("t"))
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), (ceil(size(col("t")) / lit(20.0)) - 1).cast("int")),
        i => array_join(slice(col("t"), i * 20 + 1, lit(20)), " ")))
        .as(Seq("p", "w")))
      .select(col("doc_id"), col("p").cast("long").as("p"), col("w"), md5(col("w")).as("h"))
    // Same window-over-hash rewrite as dd10 (one shuffle, no keeper join,
    // no checkpoint); here the window rows also carry the paragraph STRINGS
    // once — inherent to rebuilding text, exactly as the agg+join carried
    // them through the join before.
    para
      .withColumn("k", min(struct(col("doc_id"), col("p")))
        .over(Window.partitionBy(col("h"))))
      .withColumn("kept", col("doc_id") === col("k.doc_id") && col("p") === col("k.p"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_paras"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(
          sort_array(collect_list(when(col("kept"), struct(col("p"), col("w"))))),
          x => x.getField("w")), " ").as("clean_text"))
      .select(col("doc_id"), col("n_paras"), col("n_kept"), col("clean_text"))
  }

  val queries: Seq[Q] =
    Seq(dd01, dd02, dd03, dd04, dd05, dd06, dd07, dd08, dd09, dd10, dd11, dd12, dd13, dd14,
      dd15, dd16, dd17, dd18, dd19, dd20, UrlDedup.dd21)
}
