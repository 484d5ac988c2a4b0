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
    // coalesce: SUM over ZERO rows is NULL, and the status derivation below
    // would turn that NULL into a spurious 'fail'. Batch callers never see an
    // empty relation, but AuditStream runs this per micro-batch and empty
    // batches (zero-data trigger, recovery replay) are routine — an audit of
    // nothing has zero violations, by definition.
    val pv = predicates.zipWithIndex.map { case ((_, p), i) =>
      coalesce(sum(when(p, 1L).otherwise(0L)), lit(0L)).as(s"vp$i")
    }
    // Multi-column uniqueness counts distinct KEY TUPLES (null fields
    // included) via a struct: Spark's countDistinct(k1, k2) silently skips
    // any tuple containing a null, while the audit's oracle spelling
    // COUNT(DISTINCT (k1, k2)) counts them — on null-keyed data the two
    // would diverge. A struct value is non-null even when its fields are
    // null, so both engines see the same tuple count. Single-column keys
    // keep plain countDistinct: there both engines already agree (null keys
    // are excluded from the distinct count, i.e. they count as violations).
    val uv = uniqueKeys.zipWithIndex.map { case ((_, ks), i) =>
      val distinctKeys =
        if (ks.length == 1) countDistinct(col(ks.head))
        else countDistinct(struct(ks.map(col): _*))
      (count(lit(1)) - distinctKeys).as(s"vu$i")
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
