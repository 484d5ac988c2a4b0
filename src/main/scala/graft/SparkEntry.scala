package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) and §7 (plan). */
object SparkEntry {

  /** All engine capabilities, one Q per SURVEY.md §2 row. */
  def registry: Seq[Q] =
    etl.RelationalCore.queries ++ etl.Matching.queries ++
      etl.Windowing.queries ++ etl.Reporting.queries ++ etl.Ingest.queries ++
      etl.SourceRepair.queries ++ etl.Dimensional.queries ++ etl.Pipeline.queries ++
      operators.Dedup.queries ++ operators.SimilaritySearch.queries ++
      operators.Salting.queries ++
      functions.TextAnalysis.queries ++ functions.BpeTokenizer.queries ++
      multimodal.Multimodal.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    etl.RelationalCore.q02.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
