package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** G8: WRITE–AUDIT–PUBLISH — the staged-commit discipline for pipeline
  * output that must never land half-wrong: write the candidate table to a
  * staging directory nobody reads, AUDIT the bytes actually written (read
  * them back — auditing the input DataFrame would miss writer bugs), and
  * only then publish with a directory rename. Readers see the old table or
  * the new table, never a mix; a failed audit leaves the live table
  * byte-untouched and surfaces the violation instead of shipping it.
  *
  * This is the pattern Iceberg/Delta formalize with snapshot isolation
  * (their WAP/branch workflow); on plain parquet the publish is an atomic
  * same-filesystem rename of the table directory with the previous version
  * retired first — the one non-transactional seam (a crash between the two
  * renames leaves the live path briefly absent) is the documented ADR-001
  * trade, closed by MERGE/commit protocols in deployment.
  *
  * Audits run as Spark jobs over the staged files (count + declarative
  * invariant predicates), so the gate scales with the cluster, not the
  * driver.
  */
object Wap {

  final case class AuditFailure(message: String) extends RuntimeException(message)

  /** Write `df` to staging, audit the STAGED bytes, publish to `tableDir`.
    *
    * @param invariants named row-level predicates that must hold for EVERY
    *                   staged row (e.g. "positive_price" -> col("price") > 0)
    * @param expectRows exact row count the staged table must have, when the
    *                   caller knows it (an increment of known size)
    * @throws AuditFailure leaving the live table untouched, staging removed
    */
  def writeAuditPublish(df: DataFrame, tableDir: String,
      invariants: Seq[(String, Column)] = Nil,
      expectRows: Option[Long] = None): Unit = {
    val live = Paths.get(tableDir)
    val staging = live.resolveSibling(live.getFileName.toString + ".staging")
    val retired = live.resolveSibling(live.getFileName.toString + ".retired")
    deleteTree(staging) // a previous crashed attempt must not pollute this one
    try {
      df.write.parquet(staging.toString)
      // AUDIT the staged files themselves, not the input plan.
      val staged = df.sparkSession.read.parquet(staging.toString)
      val checks = invariants.map { case (name, pred) =>
        sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)).as(name)
      }
      val row = staged.agg(count(lit(1)).as("__rows"), checks: _*).head()
      val n = row.getLong(0)
      expectRows.filter(_ != n).foreach { e =>
        throw AuditFailure(s"audit: expected $e rows, staged $n")
      }
      val violated = invariants.map(_._1).zipWithIndex
        .map { case (name, i) => name -> row.getLong(i + 1) }
        .filter(_._2 > 0)
      if (violated.nonEmpty)
        throw AuditFailure(violated.map { case (k, v) => s"audit: $v row(s) violate '$k'" }
          .mkString("; "))
      // PUBLISH: retire the old version, move the audited staging in.
      deleteTree(retired)
      if (Files.exists(live)) Files.move(live, retired, StandardCopyOption.ATOMIC_MOVE)
      Files.move(staging, live, StandardCopyOption.ATOMIC_MOVE)
      deleteTree(retired)
      df.sparkSession.catalog.refreshByPath(tableDir)
    } catch {
      case e: Throwable => deleteTree(staging); throw e
    }
  }

  private def deleteTree(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
}
