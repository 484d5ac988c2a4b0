package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared data-quality audit core (SURVEY §2 A57 / F16).
  *
  * One relation, many named checks, ONE aggregate scan: every predicate
  * check is a conditional sum and every key-uniqueness check a
  * count-minus-count-distinct over the same pass (Deequ's core trick —
  * metrics share the scan, they don't each re-read the table). The 1-row
  * aggregate then fans out to one row per check via a literal-struct
  * explode, so the check list never costs a second scan.
  *
  * Used by the batch audit (q57, plus its join-based referential checks)
  * and verbatim by the streaming audit gate ([[graft.streaming.AuditStream]])
  * — one spelling of the rules, zero batch/stream drift.
  */
object Expectations {

  /** Audit `df` in one aggregate pass.
    *
    * @param predicates (check_name, violation predicate) — a row matching
    *                   the predicate violates the check
    * @param uniqueKeys (check_name, key columns) — violations = rows in
    *                   excess of the distinct key count
    * @return one row per check: check_name, scanned, violations, status
    */
  def audit(
      df: DataFrame,
      predicates: Seq[(String, Column)],
      uniqueKeys: Seq[(String, Seq[String])] = Nil): DataFrame = {
    val pv = predicates.zipWithIndex.map { case ((_, p), i) =>
      sum(when(p, 1L).otherwise(0L)).as(s"vp$i")
    }
    val uv = uniqueKeys.zipWithIndex.map { case ((_, ks), i) =>
      (count(lit(1)) - countDistinct(ks.head, ks.tail: _*)).as(s"vu$i")
    }
    val aggCols = count(lit(1)).as("n") +: (pv ++ uv)
    val agg = df.agg(aggCols.head, aggCols.tail: _*)
    val named =
      predicates.zipWithIndex.map { case ((n, _), i) => (n, s"vp$i") } ++
        uniqueKeys.zipWithIndex.map { case ((n, _), i) => (n, s"vu$i") }
    agg.select(explode(array(named.map { case (name, v) =>
        struct(lit(name).as("check_name"), col("n").as("scanned"),
          col(v).as("violations"))
      }: _*)).as("c"))
      .select(col("c.check_name").as("check_name"), col("c.scanned").as("scanned"),
        col("c.violations").as("violations"))
      .withColumn("status", when(col("violations") === 0, "pass").otherwise("fail"))
  }
}
