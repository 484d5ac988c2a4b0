package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-checked loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Reference analog: the reference enforces dtypes at load time via a
  * `dtype_spec` dict handed to its CSV reader (/root/reference/dw3_merge_inc.py:33-83).
  * Here the schema travels with the parquet footer; `expectColumns` asserts the
  * contract so a drifted upstream file fails fast instead of mid-query.
  *
  * Scale note: loaders only attach the path — column pruning and filter
  * pushdown happen at the scan because every downstream query stays
  * declarative (no collect, no rdd).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Scan-parallelism rescue keys (optimization guide §2.5: "one huge
    * unsplittable file … repartition immediately after the read").
    *
    * The driver-generated tables are SINGLE-ROW-GROUP parquet files; Spark
    * assigns a row group to the one byte-range split holding its midpoint,
    * so a scan of such a file — and the whole codegen pipeline fused onto
    * it (regex cleaning, JSON assembly, vector math, partial aggregation) —
    * runs on ONE core regardless of session cores (measured: q60's
    * scan+join+agg map stage = 1.3 s on 1 of 32 cores). The rescue
    * repartitions the table by its natural key immediately after the read:
    * hash partitioning (deterministic under task retry — no round-robin, no
    * sortBeforeRepartition pass) that downstream joins/aggregates on the
    * same key can reuse as their own exchange (§2.4).
    *
    * Scale-adaptive, not a local-mode constant: the rescue fires only when
    * the file bytes cannot fill one split per core at the session's
    * maxPartitionBytes — at production sizes (≥ cores × 128 MB per table)
    * the plan is bit-identical to the un-rescued one, and a mid-size table
    * pays at most one input-sized shuffle to go from "a few cores" to
    * "all cores". Dimension tables (region/nation/customer/supplier/part)
    * are broadcast targets and stay un-rescued: an exchange under a
    * BroadcastExchange only adds a stage to the broadcast build.
    *
    * Applied by default only to the two tables whose downstream pipelines
    * are CPU-heavy per input byte — documents (regex cleaning, shingling,
    * hashing) and embeddings (256-dim vector arithmetic) — where the
    * measured full-suite win is large (tx12 −0.6 s, tx16 −0.6 s, ann17
    * −1.0 s, dd03 −0.5 s, …). For the cheap-per-row relational tables
    * (lineitem/orders/events) the extra exchange costs more than the
    * parallelism buys on most of their ~40 consumers (measured +0.2–0.4 s
    * each on q05/q16/q34/q44/q54/q57); the one consumer whose fused
    * scan+5-way-join+7-sum map stage is long enough to flip that trade
    * (q60, 1.3 s single-core) opts in explicitly via [[rescued]]. */
  private val rescueKey: Map[String, String] = Map(
    "documents"  -> "doc_id",
    "embeddings" -> "vec_id")

  /** Explicit opt-in scan-parallelism rescue for a table `load` leaves
    * un-rescued by default — same size gate, same by-column (AQE-coalescible)
    * repartition. */
  def rescued(spark: SparkSession, dir: String, name: String, key: String): DataFrame =
    maybeRescue(spark, dir, name, key, load(spark, dir, name))

  /** Explicit opt-OUT of the rescue, for consumers whose whole pipeline is
    * a per-row projection (tx17/tx21): their only shuffle would BE the
    * rescue exchange — pure overhead at any scale, since a projection
    * pipelines into the scan at whatever parallelism the scan has and
    * produces output proportional to input either way (guide §2.4: remove
    * shuffles outright). PlanShapeSpec pins both plans Exchange-free. */
  def unrescued(spark: SparkSession, dir: String, name: String): DataFrame =
    loadChecked(spark, dir, name)

  /** Recursive byte size of a table path through the Hadoop FileSystem API,
    * so the rescue's size gate sees REAL bytes on every filesystem scheme.
    * (A java.io.File probe returns 0 for hdfs://, s3a://, even file: URIs —
    * which would invert the gate at exactly the production scales where the
    * scaladoc promises it is dead; TablesSpec pins the file:-URI case.) */
  private[graft] def tableBytes(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.getContentSummary(p).getLength
  }

  private val required: Map[String, Seq[String]] = Map(
    "region"     -> Seq("r_regionkey", "r_name"),
    "nation"     -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer"   -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier"   -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part"       -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "orders"     -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"),
    "lineitem"   -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
                        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
    "events"     -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
    "documents"  -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding", "label"))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = loadChecked(spark, dir, name)
    rescueKey.get(name) match {
      case Some(key) => maybeRescue(spark, dir, name, key, df)
      case None      => df
    }
  }

  /** The schema-checked scan with NO rescue applied — `load`'s body. */
  private def loadChecked(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts contract: downstream code always sees a raw epoch-NANOSECOND
    // Long. Generators have shipped the column as INT64 TIMESTAMP(NANOS)
    // (which Spark rejects unless read as a long) and as TIMESTAMP(MICROS)
    // (which Spark reads as a timestamp type); normalize both to the same
    // ns long here so every downstream `ts div 1e9` stays valid.
    val df0 =
      if (name == "events") {
        // nanosAsLong: consulted by the parquet reader at BOTH schema
        // conversion and page decode, so it cannot be save/restored around
        // this call — it stays set for the session. That is safe by contract:
        // it only affects INT64 TIMESTAMP(NANOS) columns, and this library's
        // contract for those is "raw ns long" everywhere.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        // inferTimestampNTZ is schema-inference-time only (the footer is read
        // eagerly inside spark.read.parquet), so scope it to this one read:
        // a future table with intentional NTZ columns must not be silently
        // widened to TimestampType because events was loaded earlier.
        // Micros event files are naive (isAdjustedToUTC=false) and must come
        // back as TimestampType, not NTZ, so unix_micros applies below.
        val key = "spark.sql.parquet.inferTimestampNTZ.enabled"
        val saved = spark.conf.getOption(key)
        spark.conf.set(key, "false")
        try spark.read.parquet(s"$dir/$name.parquet")
        finally saved match {
          case Some(v) => spark.conf.set(key, v)
          case None    => spark.conf.unset(key)
        }
      } else spark.read.parquet(s"$dir/$name.parquet")
    val df =
      if (name == "events" && df0.schema("ts").dataType != org.apache.spark.sql.types.LongType) {
        // The micros→ns normalization reads the internal epoch-micros value;
        // guard the session tz contract so a non-UTC session can't silently
        // shift any downstream wall-clock derivation (to_date, window()).
        require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
          "events.ts normalization requires spark.sql.session.timeZone=UTC " +
            s"(got ${spark.conf.get("spark.sql.session.timeZone")})")
        df0.withColumn("ts", org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts").cast("timestamp")) * 1000L)
      } else df0
    val missing = required.getOrElse(name, Nil).filterNot(df.columns.contains)
    require(missing.isEmpty, s"table $name missing columns: ${missing.mkString(",")}")
    df
  }

  /** The size-gated rescue repartition (see [[rescueKey]]'s scaladoc).
    * `spark.graft.rescue=false` opts a session out at runtime (same escape
    * hatch as `spark.graft.cc.tinyLoop`; also what the paired A/B harness
    * toggles to price the rescue per query). */
  private def maybeRescue(
      spark: SparkSession, dir: String, name: String,
      key: String, df: DataFrame): DataFrame = {
    if (spark.conf.get("spark.graft.rescue", "true") != "true") return df
    val cores = spark.sparkContext.defaultParallelism
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    val bytes = tableBytes(spark, s"$dir/$name.parquet")
    // Fires only when the scan cannot fill the cluster by itself; at
    // production table sizes this branch is dead and the plan unchanged.
    // Column-only repartition (REPARTITION_BY_COL): AQE picks the partition
    // count from the measured shuffle size, so the rescue inherits the same
    // adaptive sizing as every other exchange. A pinned REPARTITION_BY_NUM
    // here would exempt the exchange from AQE coalescing and cascade fixed
    // 32-task stages through the plan (measured: 20× per-task CPU inflation
    // on object-heavy aggregates once stage concurrency exceeds ~the
    // AQE-chosen level).
    if (bytes < cores.toLong * maxSplit)
      df.repartition(org.apache.spark.sql.functions.col(key))
    else df
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
