package graft.multimodal

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Multimodal binary-column plumbing (SURVEY §2 E1/E2).
  *
  * Media payloads are opaque `binary` columns with typed metadata. The real
  * media decode (image/audio libs) is STUBBED — this container ships no
  * codec — but everything Spark-side is real: binary casting, byte-level
  * slicing, per-frame explode fan-out, checksums, metadata schema. The
  * payload here is the document text's bytes (pure ASCII, verified), so the
  * DuckDB oracle can compute identical values on VARCHAR while Spark works
  * on BinaryType (DuckDB 1.0 lacks md5/substring over BLOB).
  */
object Multimodal {

  // ---------------------------------------------------------------- E1
  /** Binary payload + typed metadata: size, magic bytes, content checksum,
    * and a STUB decode (fake width/height derived deterministically from the
    * byte length — stands in for an image-header parse). */
  val mm01 = Q(
    "mm01_binary_meta",
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  upper(hex(encode(substring(text, 1, 4)))) AS magic,
      |  md5(text) AS checksum,
      |  CAST(octet_length(encode(text)) % 64 + 16 AS BIGINT) AS fake_width,
      |  CAST((octet_length(encode(text)) // 64) % 64 + 16 AS BIGINT) AS fake_height,
      |  CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS first_byte
      |FROM documents""".stripMargin) { (s, d) =>
    val bin = col("text").cast("binary")
    Tables.documents(s, d).select(
      col("doc_id"),
      octet_length(bin).cast("long").as("n_bytes"),
      upper(hex(substring(bin, 1, 4))).as("magic"),
      md5(bin).as("checksum"),
      // STUB decode: a real pipeline parses the media header here (e.g. via
      // a native Expression over the first KB); the fake is deterministic so
      // the plumbing stays testable.
      (octet_length(bin) % 64 + 16).cast("long").as("fake_width"),
      ((octet_length(bin) / 64).cast("long") % 64 + 16).cast("long").as("fake_height"),
      ascii(substring(col("text"), 1, 1)).cast("long").as("first_byte"))
  }

  // ---------------------------------------------------------------- E2
  /** Frame sampling: treat the payload as fixed 64-byte frames, sample every
    * 4th frame, hash each sampled frame — the shape of video frame-extract
    * fan-out (one input row → many frame rows) with deterministic content. */
  val mm02 = Q(
    "mm02_frame_sample",
    """WITH sized AS (
      |  SELECT doc_id, text, octet_length(encode(text)) // 64 AS n_frames FROM documents),
      |frames AS (
      |  SELECT doc_id, n_frames, unnest(range(0, n_frames, 4)) AS frame_idx FROM sized WHERE n_frames > 0)
      |SELECT f.doc_id, CAST(f.frame_idx AS BIGINT) AS frame_idx,
      |  CAST(f.n_frames AS BIGINT) AS n_frames,
      |  md5(substring(s.text, CAST(f.frame_idx*64 + 1 AS BIGINT), 64)) AS frame_md5,
      |  upper(hex(encode(substring(s.text, CAST(f.frame_idx*64 + 1 AS BIGINT), 4)))) AS frame_magic
      |FROM frames f JOIN sized s ON f.doc_id = s.doc_id""".stripMargin) { (s, d) =>
    val bin = col("text").cast("binary")
    Tables.documents(s, d)
      .select(col("doc_id"), bin.as("payload"),
        (octet_length(bin) / 64).cast("long").as("n_frames"))
      .filter(col("n_frames") > 0)
      .withColumn("frame_idx", explode(sequence(lit(0L), col("n_frames") - 1, lit(4L))))
      .withColumn("off", (col("frame_idx") * 64 + 1).cast("int"))
      .withColumn("frame_md5", md5(col("payload").substr(col("off"), lit(64))))
      .withColumn("frame_magic", upper(hex(col("payload").substr(col("off"), lit(4)))))
      .select("doc_id", "frame_idx", "n_frames", "frame_md5", "frame_magic")
  }

  // ---------------------------------------------------------------- E3
  /** Content-defined chunking of the binary payload ([[graft.functions
    * .CdcChunks]] Gear rolling hash): one row per chunk with its offset,
    * length and content hash — the content-addressed identity that makes
    * byte-shifted duplicate media dedupe, where mm02's fixed frames cannot.
    * A rolling hash is sequential per row and inexpressible in set-based
    * SQL naively; the oracle instead exploits that the cut test reads only
    * h mod 64 (six trailing bytes) — see CdcChunks.oracleCtes. Full
    * hash-checked; CdcChunksSpec additionally proves the
    * partition + shift-resync properties instead. */
  val mm03 = Q(
    "mm03_cdc_chunks",
    s"""WITH RECURSIVE ${graft.functions.CdcChunks.oracleCtes}
      |SELECT doc_id, chunk_idx, off, len, chunk_md5 FROM chunks""".stripMargin) { (s, d) =>
    val bin = col("text").cast("binary")
    Tables.documents(s, d)
      .select(col("doc_id"), graft.functions.CdcChunks.cdcChunks(bin).as("chunks"))
      .select(col("doc_id"), posexplode(col("chunks")).as(Seq("chunk_idx", "c")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("c.off").as("off"), col("c.len").as("len"),
        col("c.md5").as("chunk_md5"))
  }

  // ---------------------------------------------------------------- E4
  /** Corpus-level chunk dedup stats over mm03: group chunks by content
    * hash, count copies, and report the bytes a content-addressed store
    * saves — the measurement that justifies CDC. Near-dup documents share
    * most interior chunks, so the corpus' planted duplicates surface here
    * as n_copies > 1 groups. */
  val mm04 = Q(
    "mm04_chunk_dedup",
    s"""WITH RECURSIVE ${graft.functions.CdcChunks.oracleCtes}
      |SELECT chunk_md5, len, CAST(COUNT(*) AS BIGINT) AS n_copies,
      |  COUNT(*) > 1 AS is_dup,
      |  (CAST(COUNT(*) AS BIGINT) - 1) * len AS bytes_saved
      |FROM chunks GROUP BY chunk_md5, len""".stripMargin) { (s, d) =>
    mm03.build(s, d)
      .groupBy(col("chunk_md5"), col("len"))
      .agg(count(lit(1)).as("n_copies"))
      .select(col("chunk_md5"), col("len"), col("n_copies"),
        (col("n_copies") > 1).as("is_dup"),
        ((col("n_copies") - 1) * col("len")).as("bytes_saved"))
  }

  // ---------------------------------------------------------------- E5
  /** FIXED-BLOCK cross-document dedup stats — the measured baseline the CDC
    * pair (mm03/mm04) exists to beat. Every payload is cut into aligned
    * 64-byte frames (mm02's framing), frames dedup corpus-wide by content
    * hash with a deterministic first-occurrence winner (min (doc_id,
    * frame_idx) — dd10's paragraph rule applied to bytes), and each document
    * reports how many of its frames a content-addressed store would NOT
    * have to keep. Fixed-size blocking is what VDO/dedup filesystems do;
    * it catches aligned duplication but loses on byte-shifted copies,
    * which is precisely the gap content-defined chunking closes —
    * CdcChunksSpec proves the resync property, and this operator provides
    * the corpus-level numbers for the comparison.
    *
    * Unlike the CDC pair this IS set-SQL-expressible (no rolling state),
    * so it carries a full DuckDB hash oracle.
    *
    * Scale: one scan explodes ~50-byte (hash, position) tuples — payload
    * bytes never shuffle; the keeper table is one min-struct hash aggregate
    * on the hash key; the flag join is equi-keyed on the same hash. Same
    * shape as dd10, linear at any corpus size. */
  val mm05 = Q(
    "mm05_block_dedup",
    """WITH sized AS (
      |  SELECT doc_id, text, octet_length(encode(text)) // 64 AS n_frames FROM documents),
      |frames AS (
      |  SELECT doc_id, n_frames, unnest(range(0, n_frames)) AS f FROM sized WHERE n_frames > 0),
      |hashed AS (
      |  SELECT fr.doc_id, fr.n_frames, fr.f,
      |    md5(substring(s.text, CAST(fr.f*64 + 1 AS BIGINT), 64)) AS h
      |  FROM frames fr JOIN sized s ON fr.doc_id = s.doc_id),
      |keep AS (
      |  SELECT h, MIN({'d': doc_id, 'f': f}) AS k FROM hashed GROUP BY h),
      |flagged AS (
      |  SELECT hd.doc_id, hd.n_frames,
      |    CASE WHEN hd.doc_id = keep.k.d AND hd.f = keep.k.f THEN 0 ELSE 1 END AS is_dup
      |  FROM hashed hd JOIN keep ON hd.h = keep.h)
      |SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
      |  CAST(SUM(is_dup) AS BIGINT) AS n_dup_frames,
      |  CAST(SUM(is_dup) * 64 AS BIGINT) AS bytes_saved,
      |  ROUND(CAST(SUM(is_dup) AS DOUBLE) / CAST(n_frames AS DOUBLE), 6) AS dup_frac
      |FROM flagged GROUP BY doc_id, n_frames""".stripMargin) { (s, d) =>
    val bin = col("text").cast("binary")
    val hashed = Tables.documents(s, d)
      .select(col("doc_id"), bin.as("payload"),
        (octet_length(bin) / 64).cast("long").as("n_frames"))
      .filter(col("n_frames") > 0)
      .withColumn("f", explode(sequence(lit(0L), col("n_frames") - 1)))
      .withColumn("h", md5(col("payload").substr((col("f") * 64 + 1).cast("int"), lit(64))))
      .select(col("doc_id"), col("n_frames"), col("f"), col("h"))
      .localCheckpoint() // feeds the keeper aggregate AND the flag join
    val keep = hashed.groupBy("h")
      .agg(min(struct(col("doc_id"), col("f"))).as("k"))
      .select(col("h"), col("k.doc_id").as("kd"), col("k.f").as("kf"))
    hashed.join(keep, "h")
      .withColumn("is_dup",
        when(col("doc_id") === col("kd") && col("f") === col("kf"), 0L).otherwise(1L))
      .groupBy("doc_id", "n_frames")
      .agg(sum(col("is_dup")).as("n_dup_frames"))
      .select(col("doc_id"), col("n_frames"), col("n_dup_frames"),
        (col("n_dup_frames") * 64).as("bytes_saved"),
        round(col("n_dup_frames").cast("double") / col("n_frames").cast("double"), 6).as("dup_frac"))
  }

  // ---------------------------------------------------------------- E6
  /** Perceptual fingerprints for media payloads: 64-bit average-hash
    * (aHash) over the stub-decoded byte strip ([[graft.functions.AHash64]]
    * — one codegen pass, four 16-bit pieces). Content hashes (mm01) break
    * under ANY byte change; aHash survives uniform brightness shifts by
    * construction (the exact cross-multiplied mean comparison cancels
    * them) — the perceptual-identity contract in miniature. The query
    * emits the corpus FINGERPRINT TABLE — every one of the 64×N bits is
    * hash-checked against DuckDB's independent list-arithmetic spelling of
    * the same integer comparisons, the strongest cross-engine pin a native
    * expression gets. Pair retrieval at Hamming≤3 reuses dd03's pigeonhole
    * machinery on the four pieces; AHashSpec proves shift invariance,
    * edit locality, and the planted-near-dup pair join end-to-end (this
    * text-bytes corpus has no byte-position-near payloads, so the honest
    * corpus-level pair set is empty — the fingerprint table is the
    * artifact with information in it).
    *
    * Scale: a scalar projection on the scan — no shuffle, no fan-out; the
    * pair stage (when run) is the (piece-idx, piece-value) equi-join with
    * 100% recall at radius 3 by pigeonhole. */
  /** Shared DuckDB CTE chain ending in `ph(doc_id, n, p0..p3)` — the
    * list-arithmetic spelling of AHash64, consumed by mm06 (fingerprint
    * table) and mm07 (cluster formation) so the two oracles cannot drift. */
  private val phCtesSql: String = {
    val pieceExprs = (0 until 4).map { j =>
      (0 until 16).map { k =>
        val b = j * 16 + k
        s"(CASE WHEN sums[$b + 1] * n > total * ((($b + 1)*n)//64 - ($b*n)//64) THEN ${1 << k} ELSE 0 END)"
      }.mkString(" + ")
    }
    val pieceCols = pieceExprs.zipWithIndex
      .map { case (e, j) => s"CAST($e AS BIGINT) AS p$j" }.mkString(",\n      |  ")
    s"""sized AS (SELECT doc_id, text, CAST(octet_length(encode(text)) AS BIGINT) AS n FROM documents),
      |bs AS (SELECT doc_id, n,
      |  list_transform(range(0, 64), b ->
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range((b*n)//64 + 1, ((b+1)*n)//64 + 1),
      |                     i -> CAST(ascii(substring(text, i, 1)) AS BIGINT))),
      |      (a, x) -> a + x)) AS sums
      |  FROM sized),
      |tot AS (SELECT doc_id, n, sums, list_reduce(sums, (a, x) -> a + x) AS total FROM bs),
      |ph AS (SELECT doc_id, n,
      |  $pieceCols
      |  FROM tot)""".stripMargin
  }

  /** Shared Spark fingerprint relation (doc_id, n_bytes, p0..p3) — one
    * codegen AHash64 pass, consumed by mm06 and mm07. */
  private[graft] def fingerprints(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d).select(col("doc_id"),
      octet_length(col("text").cast("binary")).cast("long").as("n_bytes"),
      graft.functions.AHash64.ahash64(col("text").cast("binary")).as("ps"))
      .select(col("doc_id"), col("n_bytes"),
        element_at(col("ps"), 1).as("p0"), element_at(col("ps"), 2).as("p1"),
        element_at(col("ps"), 3).as("p2"), element_at(col("ps"), 4).as("p3"))

  val mm06 = Q(
    "mm06_phash",
    s"""WITH $phCtesSql
      |SELECT doc_id, n AS n_bytes,
      |  printf('%04x%04x%04x%04x', p3, p2, p1, p0) AS phash,
      |  p0, p1, p2, p3,
      |  CAST(bit_count(p0) + bit_count(p1) + bit_count(p2) + bit_count(p3) AS BIGINT) AS n_bright
      |FROM ph""".stripMargin) { (s, d) =>
    fingerprints(s, d)
      .select(col("doc_id"), col("n_bytes"),
        format_string("%04x%04x%04x%04x", col("p3"), col("p2"), col("p1"), col("p0")).as("phash"),
        col("p0"), col("p1"), col("p2"), col("p3"),
        (0 until 4).map(j => bit_count(col(s"p$j"))).reduce(_ + _).cast("long").as("n_bright"))
  }

  /** Hamming≤3 perceptual-pair retrieval over [[mm06]]'s fingerprint table
    * (columns doc_id, p0..p3): 4-piece pigeonhole candidates (≥1 piece
    * bit-identical — 100% recall at radius 3), first-match scalar dedup,
    * exact Hamming verify. dd03's machinery on the media fingerprint;
    * AHashSpec drives it end-to-end on planted near-identical payloads. */
  private[graft] def phashPairs(fp: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val blocks = fp.select(col("doc_id"), col("p0"), col("p1"), col("p2"), col("p3"),
      posexplode(array(col("p0"), col("p1"), col("p2"), col("p3"))).as(Seq("bi", "bv")))
    val a = blocks.select(col("doc_id").as("id_a"), col("bi"), col("bv"),
      col("p0").as("a0"), col("p1").as("a1"), col("p2").as("a2"), col("p3").as("a3"))
    val b = blocks.select(col("doc_id").as("id_b"), col("bi"), col("bv"),
      col("p0").as("b0"), col("p1").as("b1"), col("p2").as("b2"), col("p3").as("b3"))
    val firstMatch = (0 until 4).foldLeft(lit(false)) { (acc, j) =>
      when(col("bi") === j,
        (0 until j).map(k => col(s"a$k") =!= col(s"b$k"))
          .foldLeft(lit(true))(_ && _))
        .otherwise(acc)
    }
    val hamming = (0 until 4).map(j =>
      bit_count(col(s"a$j").bitwiseXOR(col(s"b$j")))).reduce(_ + _)
    a.join(b, Seq("bi", "bv")).filter(col("id_a") < col("id_b"))
      .filter(firstMatch)
      .withColumn("hamming", hamming.cast("long"))
      .filter(col("hamming") <= 3)
      .select("id_a", "id_b", "hamming")
  }

  // ---------------------------------------------------------------- E7
  /** Perceptual-identity GROUPS over the whole media corpus: connected
    * components of the Hamming≤3 aHash pair graph ([[phashPairs]] — 4-piece
    * pigeonhole, 100% recall at radius 3), with SINGLETONS kept, so every
    * payload lands in exactly one identity group and `cluster_size` says how
    * many perceptual copies exist. dd06's large/small-star CC engine on the
    * media fingerprint — the composition that turns pairwise perceptual
    * signals into a keep/drop decision for a multimodal corpus, exactly as
    * dd06/dd07 do for text. On THIS corpus the honest pair set is empty
    * (text-byte payloads: nearest pair sits at Hamming 8 — measured), so
    * the table is 500 singletons; AHashSpec drives the same pipeline over
    * planted near-identical payloads and proves groups actually form.
    *
    * Scale: fingerprint = one codegen scan; candidates = (piece, value)
    * equi-join (never all-pairs); CC = log² rounds of keyed joins; the
    * singleton join is doc-keyed. The DuckDB oracle recomputes everything
    * from bytes: brute-force pair scan + recursive-CTE fixpoint. */
  val mm07 = Q(
    "mm07_phash_clusters",
    s"""WITH RECURSIVE $phCtesSql,
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM ph a JOIN ph b ON a.doc_id < b.doc_id
      |    AND (a.p0 = b.p0 OR a.p1 = b.p1 OR a.p2 = b.p2 OR a.p3 = b.p3)
      |  WHERE bit_count(xor(a.p0, b.p0)) + bit_count(xor(a.p1, b.p1))
      |      + bit_count(xor(a.p2, b.p2)) + bit_count(xor(a.p3, b.p3)) <= 3),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |          UNION ALL SELECT id_b, id_a FROM pairs),
      |nodes AS (SELECT doc_id AS id FROM ph),
      |reach(id, comp) AS (
      |  SELECT id, id FROM nodes
      |  UNION
      |  SELECT e.dst, r.comp FROM reach r JOIN edges e ON r.id = e.src),
      |labels AS (SELECT id, MIN(comp) AS comp FROM reach GROUP BY id),
      |sized2 AS (SELECT comp, CAST(COUNT(*) AS BIGINT) AS sz FROM labels GROUP BY comp)
      |SELECT l.id AS doc_id, l.comp AS cluster_id, s.sz AS cluster_size,
      |  l.id = l.comp AS is_canonical
      |FROM labels l JOIN sized2 s ON l.comp = s.comp""".stripMargin) { (s, d) =>
    val fp = fingerprints(s, d).localCheckpoint() // feeds pair join AND spine
    // pairsCanonical: phashPairs emits each pair once (first-match block
    // predicate) with id_a < id_b — CC's initial canon exchange is skipped.
    val cc = graft.operators.Dedup.connectedComponents(phashPairs(fp), pairsCanonical = true)
      .select(col("doc_id"), col("cluster_id"))
    val labeled = fp.select(col("doc_id")).join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    val sizes = labeled.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    labeled.join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        (col("doc_id") === col("cluster_id")).as("is_canonical"))
  }

  // ---------------------------------------------------------------- E8
  /** Symbol-ENTROPY screen for payloads — the standard pre-decode router in
    * a media pipeline: Shannon entropy near the alphabet's maximum means
    * the payload is already compressed or encrypted (re-compressing or
    * feature-extracting it is wasted work), low entropy with a dominant
    * symbol means text or sparse raster data. Emits entropy (nats),
    * distinct symbol count, and the dominant symbol with its share.
    *
    * The unit is stated precisely, because char ≠ byte outside ASCII: this
    * query computes CHARACTER entropy of the text payload, grouping on the
    * character string itself — never on engine-specific numeric codes
    * (Spark's ascii() yields the first UTF-8 byte where DuckDB's yields the
    * codepoint, so a code-based histogram merges characters sharing a lead
    * byte). With string grouping the cross-engine contract holds for all
    * BMP content; supplementary-plane payloads differ only in segmentation
    * (Spark splits UTF-16 surrogate halves) and belong on the byte-level
    * path anyway: for true binary payloads the identical plan runs over
    * the decoded byte array at the mm01 decode seam (MediaDecode), where
    * bytes, not characters, are the symbols.
    *
    * Scale: the per-payload histogram is an explode + (doc, symbol) hash
    * aggregate — partial aggregation collapses each scan partition to at
    * most |alphabet| rows per document BEFORE the shuffle (the explode
    * itself pipelines inside the scan stage, never materialized). Entropy
    * is one ln() pass over exact integer counts, rounded at 4 dp (tx10's
    * cross-engine argument); the dominant symbol is a min_by aggregate
    * over (−count, char) with a deterministic tie (lexicographically
    * smallest character — binary UTF-8 order in both engines), mirrored
    * by the oracle's row_number. */
  val mm08 = Q(
    "mm08_entropy",
    """WITH sized AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n FROM documents),
      |b AS (SELECT doc_id, n,
      |  unnest(list_transform(range(1, n+1), i -> substring(text, i, 1))) AS ch
      |FROM sized),
      |c AS (SELECT doc_id, n, ch, CAST(COUNT(*) AS BIGINT) AS cnt FROM b GROUP BY doc_id, n, ch),
      |top AS (SELECT doc_id, ch AS top_ch, cnt AS top_cnt FROM (
      |  SELECT doc_id, ch, cnt,
      |         row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, ch) AS rn FROM c)
      |  WHERE rn = 1),
      |e AS (SELECT doc_id, n, CAST(COUNT(*) AS BIGINT) AS distinct_chars,
      |  SUM(CAST(cnt AS DOUBLE) * ln(CAST(cnt AS DOUBLE))) AS scl
      |FROM c GROUP BY doc_id, n)
      |SELECT e.doc_id, e.n AS n_chars, e.distinct_chars,
      |  ROUND(ln(CAST(e.n AS DOUBLE)) - e.scl / e.n, 4) + 0.0 AS entropy_nats,
      |  t.top_ch,
      |  ROUND(CAST(t.top_cnt AS DOUBLE) / CAST(e.n AS DOUBLE), 6) AS top_frac
      |FROM e JOIN top t ON e.doc_id = t.doc_id""".stripMargin) { (s, d) =>
    val c = Tables.documents(s, d)
      .select(col("doc_id"), length(col("text")).cast("long").as("n"),
        explode(split(col("text"), "")).as("ch"))
      .filter(length(col("ch")) === 1) // split("") may emit a trailing ""
      .groupBy(col("doc_id"), col("n"), col("ch"))
      .agg(count(lit(1)).as("cnt"))
    c.groupBy(col("doc_id"), col("n"))
      .agg(count(lit(1)).as("distinct_chars"),
        sum(col("cnt").cast("double") * log(col("cnt").cast("double"))).as("scl"),
        min_by(struct(col("ch").as("top_ch"), col("cnt").as("top_cnt")),
          struct((-col("cnt")).as("nc"), col("ch"))).as("top"))
      .select(col("doc_id"), col("n").as("n_chars"), col("distinct_chars"),
        (round(log(col("n").cast("double")) - col("scl") / col("n"), 4) + lit(0.0)).as("entropy_nats"),
        col("top.top_ch").as("top_ch"),
        round(col("top.top_cnt").cast("double") / col("n").cast("double"), 6).as("top_frac"))
  }

  // ---------------------------------------------------------------- E9
  /** Energy-based payload TRIM — the audio-preprocessing shape (silence
    * trim / crude VAD): frame the payload, compute per-frame energy,
    * mark frames whose energy falls below the payload's own mean, and
    * report the leading/trailing silent runs a trimmer would cut plus the
    * kept span. On real PCM this exact plan runs over decoded samples at
    * the mm01 decode seam (byte frames over the decoded array); here the
    * frames are CHARACTER frames of the ASCII payload — both engines index
    * characters (`length`/`substr`), and amplitude is (code − 32), exact
    * because the payload contract is ASCII (char = byte = codepoint; the
    * object header states the corpus guarantee).
    *
    * The silence test is INTEGER end-to-end: frame f is silent iff
    * 2·e(f)·n_frames < Σe — algebraically "energy below half the payload
    * mean" without ever forming the mean, so no float crosses engines
    * (ann12's playbook). A corollary the spec pins: at least one frame is
    * always loud (summing the inequality over all frames contradicts
    * itself), so the kept span is never empty.
    *
    * Scale: the frame explode pipelines inside the scan (64-byte frames,
    * fan-out n_bytes/64); the mean needs the doc total, so the plan is one
    * doc-keyed window sum followed by the doc-keyed trim aggregate — the
    * second reuses the first's partitioning, one shuffle total, partition
    * key = doc_id (high cardinality). */
  val mm09 = Q(
    "mm09_energy_trim",
    """WITH sized AS (SELECT doc_id, text,
      |    CAST(length(text) // 64 AS BIGINT) AS n_frames FROM documents),
      |fr AS (SELECT doc_id, n_frames, unnest(range(0, n_frames)) AS f, text
      |       FROM sized WHERE n_frames > 0),
      |fe AS (SELECT doc_id, n_frames, f,
      |  CAST(list_sum(list_transform(range(1, 65), i ->
      |    (ascii(substr(text, CAST(f*64 + i AS BIGINT), 1)) - 32)
      |      * (ascii(substr(text, CAST(f*64 + i AS BIGINT), 1)) - 32))) AS BIGINT) AS e
      |  FROM fr),
      |ft AS (SELECT doc_id, n_frames, f, e, SUM(e) OVER (PARTITION BY doc_id) AS tot FROM fe),
      |fl AS (SELECT doc_id, n_frames, f, 2 * e * n_frames < tot AS silent FROM ft)
      |SELECT doc_id, n_frames,
      |  CAST(SUM(CASE WHEN silent THEN 1 ELSE 0 END) AS BIGINT) AS n_silent,
      |  CAST(MIN(CASE WHEN NOT silent THEN f END) AS BIGINT) AS lead_trim,
      |  CAST(n_frames - 1 - MAX(CASE WHEN NOT silent THEN f END) AS BIGINT) AS tail_trim,
      |  CAST(MAX(CASE WHEN NOT silent THEN f END)
      |     - MIN(CASE WHEN NOT silent THEN f END) + 1 AS BIGINT) AS kept_span
      |FROM fl GROUP BY doc_id, n_frames""".stripMargin) { (s, d) =>
    val frames = Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        (length(col("text")) / 64).cast("long").as("n_frames"))
      .filter(col("n_frames") > 0)
      .withColumn("f", explode(sequence(lit(0L), col("n_frames") - 1)))
      .withColumn("frame", expr("substring(text, CAST(f*64 + 1 AS INT), 64)"))
      .withColumn("e", expr(
        "aggregate(sequence(1, 64), 0L, (acc, i) -> acc + " +
          "CAST((ascii(substring(frame, i, 1)) - 32) * (ascii(substring(frame, i, 1)) - 32) AS BIGINT))"))
    val flagged = frames
      .withColumn("tot", sum(col("e")).over(Window.partitionBy(col("doc_id"))))
      .withColumn("silent", col("e") * col("n_frames") * 2 < col("tot"))
    flagged.groupBy("doc_id", "n_frames")
      .agg(
        sum(when(col("silent"), 1L).otherwise(0L)).as("n_silent"),
        min(when(!col("silent"), col("f"))).as("first_loud"),
        max(when(!col("silent"), col("f"))).as("last_loud"))
      .select(col("doc_id"), col("n_frames"), col("n_silent"),
        col("first_loud").as("lead_trim"),
        (col("n_frames") - 1 - col("last_loud")).as("tail_trim"),
        (col("last_loud") - col("first_loud") + 1).as("kept_span"))
  }

  // ---------------------------------------------------------------- E10
  /** SHARD-PACKING manifest (WebDataset/tar-shard shape) — the layout step
    * between a curated multimodal corpus and a dataloader: payloads stream
    * per source in doc_id order and are packed WHOLE (no payload straddles
    * a shard — the tar contract) into ~8 KiB shards by the deterministic
    * rule `shard = floor(bytes_before_payload / 8192)`: a shard absorbs
    * the payload that crosses its byte budget and then closes, so every
    * shard is ≥ the budget except the last and assignment is a pure
    * prefix-sum — no sequential "close the shard" scan. Output is the
    * shard MANIFEST (payload count, exact bytes, doc-id span) the reader
    * uses to plan fetches — mm01's metadata relation aggregated to the
    * storage unit the trainer actually opens.
    *
    * Scale: tx14's argument byte-for-byte — ONE prefix-sum window per
    * source over payload-count rows (sizes are a codegen scalar; payload
    * BYTES never enter the shuffle), one hash aggregate to the manifest
    * grain. At 100 TB the window key grows the same deterministic hash
    * shard as tx14's packing grid. */
  val mm10 = Q(
    "mm10_shard_pack",
    """WITH sized AS (SELECT doc_id, source,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes FROM documents),
      |cum AS (SELECT doc_id, source, n_bytes,
      |  SUM(n_bytes) OVER (PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cume
      |FROM sized)
      |SELECT source, CAST((cume - n_bytes) // 8192 AS BIGINT) AS shard_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_payloads,
      |  CAST(SUM(n_bytes) AS BIGINT) AS shard_bytes,
      |  CAST(MIN(doc_id) AS BIGINT) AS first_doc,
      |  CAST(MAX(doc_id) AS BIGINT) AS last_doc
      |FROM cum GROUP BY source, (cume - n_bytes) // 8192""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        octet_length(col("text").cast("binary")).cast("long").as("n_bytes"))
      .withColumn("cume", sum(col("n_bytes")).over(w))
      .withColumn("shard_id", expr("(cume - n_bytes) div 8192"))
      .groupBy(col("source"), col("shard_id"))
      .agg(count(lit(1)).as("n_payloads"), sum(col("n_bytes")).as("shard_bytes"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .select(col("source"), col("shard_id"), col("n_payloads"), col("shard_bytes"),
        col("first_doc"), col("last_doc"))
  }

  val queries: Seq[Q] = Seq(mm01, mm02, mm03, mm04, mm05, mm06, mm07, mm08, mm09, mm10)
}
