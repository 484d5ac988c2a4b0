package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes a scaled-up derivative of a driver testdata directory for
  * EMPIRICAL scaling measurement (SCALING.md) — `/root/testdata` is
  * read-only and tops out at sf0.1, so the 10× point has to be derived.
  *
  * Construction: N key-shifted copies of the source tables, built to the
  * driver generator's own scaling laws (measured sf0.01 → sf0.1):
  *
  *   - facts and scaling dims (customer/supplier/part/orders/lineitem/
  *     events/documents) grow 10× per decade → N copies, every int64 key
  *     shifted by `k * 2,520,000,000` (divisible by every small modulus the
  *     queries use for deterministic splits, so `key % m` cohorts are
  *     preserved per copy; 10 copies stay far below Long overflow);
  *   - `region`/`nation` are fixed-size dims at every SF → single copy;
  *   - distinct `p_name` is SATURATED at 64 from sf0.01 on → names are NOT
  *     salted (a real bigger SF repeats names, so the matching queries'
  *     distinct-title inputs must stay constant-size);
  *   - `embeddings` grows ×4 per decade (500 → 2000 measured) → ⌈N·4/10⌉
  *     copies, each vector cyclically rotated by a per-copy offset: intra-
  *     copy dot products are EXACTLY preserved (both sides rotate), norms
  *     unchanged, cross-copy similarity decorrelated;
  *   - `documents.text` in copy k>0 gets a content-independent per-copy
  *     word RENAMING: every word w (at any position) becomes the length-|w|
  *     base-36 rendering of xxhash64(w, k). A function of the word alone
  *     maps equal texts to equal texts (exact-dup classes preserved) and
  *     maps each copy's shingle/token sets bijectively-in-distribution
  *     (intra-copy Jaccard EXACTLY preserved, token-hash signatures
  *     relabeled uniformly, Zipf shape and word-length profile preserved) —
  *     while the SAME text in two different copies shares neither shingles
  *     NOR token multisets, so copies do not interact in candidate
  *     generation for ANY signature family. The earlier word-POSITION
  *     permutation construction had exactly that flaw for order-INVARIANT
  *     signatures: SimHash sees the token multiset, which a position
  *     permutation preserves, so every doc's 10 copies were fingerprint-
  *     identical — dup classes grew 10× instead of staying constant-size,
  *     and dd03's measured growth was the synthetic corpus's, not the
  *     engine's. Constant dup rate with 10× classes is the defining
  *     property of a real 10× corpus; renaming delivers it for both
  *     order-sensitive and order-invariant signatures.
  *
  * Usage: ScaleSynth <srcDir> <outDir> <copies>
  */
object ScaleSynth {

  /** Divisible by lcm(1..10) = 2520 so key-modulo cohorts survive the shift. */
  val KeyStride = 2520000000L

  private val int64Keys: Map[String, Seq[String]] = Map(
    "customer"   -> Seq("c_custkey"),
    "supplier"   -> Seq("s_suppkey"),
    "part"       -> Seq("p_partkey"),
    "orders"     -> Seq("o_orderkey", "o_custkey"),
    "lineitem"   -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events"     -> Seq("event_id", "user_id"),
    "documents"  -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  private def shiftKeys(df: DataFrame, table: String, k: Int): DataFrame =
    int64Keys.getOrElse(table, Nil).foldLeft(df) { (d, c) =>
      d.withColumn(c, col(c) + lit(k * KeyStride))
    }

  /** Deterministic per-copy word renaming: every word becomes the
    * length-preserving base-36 rendering of its (word, copy)-hash, so
    * copies share no tokens while each copy's internal dup structure is an
    * exact relabeling of the original's. Identity for k = 0. Two hash
    * draws cover words longer than one base-36 long (~12 chars). */
  private def renameWords(textCol: String, k: Int): org.apache.spark.sql.Column =
    if (k == 0) col(textCol)
    else expr(
      s"""array_join(
         |  transform(split($textCol, ' '),
         |    w -> substring(
         |           rpad(concat(lower(conv(cast(abs(xxhash64(w, $k)) as string), 10, 36)),
         |                       lower(conv(cast(abs(xxhash64(w, $k + 7919)) as string), 10, 36))),
         |                length(w), '0'),
         |           1, length(w))),
         |  ' ')""".stripMargin)

  /** Cyclic rotation of a float vector by r positions; identity for r = 0. */
  private def rotateVec(vecCol: String, r: Int): org.apache.spark.sql.Column =
    if (r == 0) col(vecCol)
    else expr(s"concat(slice($vecCol, ${r + 1}, size($vecCol) - $r), slice($vecCol, 1, $r))")

  def synthesize(spark: SparkSession, srcDir: String, outDir: String, copies: Int,
                 tables: Set[String] = graft.Tables.all.toSet): Unit = {
    // Tables.load normalizes events.ts to the epoch-ns Long contract, so the
    // synthesized dir carries the normalized type no matter which generator
    // vintage (ns/micros) produced the source.
    def src(name: String): DataFrame = graft.Tables.load(spark, srcDir, name)
    def write(df: DataFrame, name: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$outDir/$name.parquet")

    // fixed dims: single copy
    Seq("region", "nation").filter(tables).foreach(n => write(src(n), n))

    // 10×-per-decade tables: `copies` key-shifted copies
    Seq("customer", "supplier", "part", "orders", "lineitem", "events")
      .filter(tables).foreach { n =>
      val base = src(n)
      write((0 until copies).map(k => shiftKeys(base, n, k)).reduce(_ unionAll _), n)
    }

    // documents: key shift + per-copy word renaming of the text
    if (tables("documents")) {
      val docs = src("documents")
      write((0 until copies).map { k =>
        shiftKeys(docs, "documents", k).withColumn("text", renameWords("text", k))
      }.reduce(_ unionAll _), "documents")
    }

    // embeddings: ×4 per decade (generator's own law: 500 → 2000 measured on
    // the 10× step), i.e. copies^log10(4) for a copies× step — 10 → 4,
    // 100 → 16. (The earlier `copies·4/10` spelling agrees at one decade but
    // overstates two: 40 vs the law's 16.)
    if (tables("embeddings")) {
      val embCopies = math.max(1, math.round(math.pow(copies, math.log10(4.0))).toInt)
      val emb = src("embeddings")
      val dim = emb.selectExpr("max(size(embedding))").head().getInt(0)
      write((0 until embCopies).map { k =>
        shiftKeys(emb, "embeddings", k)
          .withColumn("embedding", rotateVec("embedding", k * (dim / math.max(embCopies, 1))))
      }.reduce(_ unionAll _), "embeddings")
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, copiesStr) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional 4th arg: comma-separated table subset (default: all) — the
    // decade-2 campaign only re-measures the volume-bound text/dedup
    // queries, which read `documents` alone.
    val tables: Set[String] =
      if (args.length > 3) args(3).split(',').toSet else graft.Tables.all.toSet
    synthesize(spark, srcDir, outDir, copiesStr.toInt, tables)
    graft.Tables.all.filter(tables).foreach { n =>
      val c = spark.read.parquet(s"$outDir/$n.parquet").count()
      println(s"[synth] $n: $c rows")
    }
    spark.stop()
  }
}
