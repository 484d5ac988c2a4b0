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
    // events.ts contract: downstream code always sees a raw epoch-NANOSECOND
    // Long. Generators have shipped the column as INT64 TIMESTAMP(NANOS)
    // (which Spark rejects unless read as a long) and as TIMESTAMP(MICROS)
    // (which Spark reads as a timestamp type); normalize both to the same
    // ns long here so every downstream `ts div 1e9` stays valid.
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // micros files are naive (isAdjustedToUTC=false): read as TimestampType,
      // not NTZ, so unix_micros applies; session tz is UTC in every entry point.
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    }
    val df0 = spark.read.parquet(s"$dir/$name.parquet")
    val df =
      if (name == "events" && df0.schema("ts").dataType != org.apache.spark.sql.types.LongType)
        df0.withColumn("ts", org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts").cast("timestamp")) * 1000L)
      else df0
    val missing = required.getOrElse(name, Nil).filterNot(df.columns.contains)
    require(missing.isEmpty, s"table $name missing columns: ${missing.mkString(",")}")
    df
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
