package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed co-located joins (SURVEY §5 scale path for fact-fact joins).
  *
  * The one repeated shuffle a warehouse cannot afford at 100 TB is
  * lineitem⋈orders on the order key — every fact load pays it. Bucketing
  * both tables by the join key at WRITE time pre-shuffles them once: each
  * bucket file holds one hash-slice of the key space, so any later
  * equi-join on that key is planned with ZERO exchanges (and with `sortBy`,
  * zero sorts) — the join runs bucket-by-bucket, co-located.
  *
  * Reference analog: the reference re-merges increment and archive on the
  * synthetic order-item key every run (dw3_merge_inc.py); bucketing is the
  * Spark-native way to make that recurring merge shuffle-free.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted external table. `buckets` should
    * be sized so one bucket of the largest table fits an executor's memory
    * (e.g. 8192 buckets for a 100 TB fact ≈ 12 GB/bucket). */
  def writeBucketed(df: DataFrame, name: String, key: String, buckets: Int,
                    path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(name)

  /** Equi-join two same-bucketed tables on their bucket key — plans with no
    * exchange on either side when bucket counts match. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
