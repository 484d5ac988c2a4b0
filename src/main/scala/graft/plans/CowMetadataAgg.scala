package graft.plans

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.CowFileIndex

/** METADATA-ONLY AGGREGATES over cow tables — Delta's
  * `OptimizeMetadataOnlyDeltaQuery` analog: a global `COUNT(*)` / `MIN` /
  * `MAX` over an unfiltered cow-table scan is answered from the MANIFEST
  * (per-file row counts and [min, max] stats the table already maintains
  * for pruning) instead of scanning data. At 100 TB that's the difference
  * between a full-table scan and a driver-local fold over file-count-sized
  * metadata — and because the manifest rows are cached at planning time
  * ([[graft.sources.FileCow]]'s manifest cache), the rewrite submits ZERO
  * Spark jobs.
  *
  * Soundness bounds (the rule declines anything outside them):
  *   - global aggregate only: no grouping, no `Filter` anywhere below (a
  *     filter changes counts; it also breaks the match structurally), the
  *     child is the bare relation or an attribute-only `Project` of it;
  *   - `COUNT(non-null literal)` (the `COUNT(*)` spelling) — never
  *     `COUNT(col)`, whose null-skipping the manifest cannot see;
  *   - `MIN`/`MAX` of a column the manifest tracks stats for — min of
  *     per-file minima IS the global min (both sides skip nulls, so a file
  *     of all-null values contributes a null stat that the fold skips the
  *     same way the scan would);
  *   - no DISTINCT, no FILTER clause, every output a bare aggregate.
  *
  * String ordering folds via [[UTF8String]] comparison — byte-wise, the
  * exact ordering the scan-side `min`/`max` aggregate uses — never
  * `String.compareTo` (UTF-16 order disagrees on supplementary planes).
  */
class CowMetadataAggRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg @ Aggregate(groupingExprs, aggExprs, child, _) if groupingExprs.isEmpty =>
      cowIndex(child) match {
        case Some(idx) =>
          val answers = aggExprs.map(answer(_, idx))
          if (answers.forall(_.isDefined)) {
            val converted = answers.zip(aggExprs).map { case (v, ne) =>
              CatalystTypeConverters.createToCatalystConverter(ne.dataType)(v.get.orNull)
            }
            LocalRelation(agg.output, Seq(InternalRow.fromSeq(converted)))
          } else agg
        case None => agg
      }
  }

  /** The child qualifies iff it is a cow-table scan with nothing between
    * the aggregate and the relation but value-preserving projections: bare
    * attributes, or a SAME-NAME alias of one (the shape
    * [[graft.sources.FileCow]]'s field-id metadata strip produces — the
    * alias changes column METADATA only, never a value, so counts and
    * stats-column extremes are untouched). */
  private def cowIndex(plan: LogicalPlan): Option[CowFileIndex] = plan match {
    case Project(projectList, child) if projectList.forall {
        case _: AttributeReference => true
        case Alias(a: AttributeReference, name) => a.name == name
        case _ => false
      } => cowIndex(child)
    case LogicalRelation(HadoopFsRelation(idx: CowFileIndex, _, _, _, _, _), _, _, _, _)
        if !idx.hasDeletionVectors => // DV'd manifests over-count live rows
      Some(idx)
    case _ => None
  }

  /** Some(Some(value)) when the manifest answers this output exactly;
    * Some(None) is a legitimate NULL answer (min/max over no rows). */
  private def answer(ne: NamedExpression, idx: CowFileIndex): Option[Option[Any]] =
    ne match {
      case Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(children) if children.nonEmpty && children.forall {
              case l: Literal => l.value != null
              case _ => false
            } =>
            val rows = idx.manifestRows
            Some(Some(java.lang.Long.valueOf(
              rows.iterator.map(_.getAs[Long]("rows")).sum)))
          case Min(a: AttributeReference) if idx.statsColumns.contains(a.name) =>
            Some(extreme(idx.manifestRows, s"min_${a.name}", keepLeft = _ <= 0))
          case Max(a: AttributeReference) if idx.statsColumns.contains(a.name) =>
            Some(extreme(idx.manifestRows, s"max_${a.name}", keepLeft = _ >= 0))
          case _ => None
        }
      case _ => None
    }

  /** Fold the per-file stat column to a single extreme, skipping nulls the
    * way the scan-side aggregate would. */
  private def extreme(rows: Seq[Row], statCol: String,
      keepLeft: Int => Boolean): Option[Any] = {
    val vs = rows.iterator.map(_.getAs[Any](statCol)).filter(_ != null)
    if (!vs.hasNext) None
    else Some(vs.reduce((a, b) => if (keepLeft(compare(a, b))) a else b))
  }

  private def compare(a: Any, b: Any): Int = (a, b) match {
    case (x: String, y: String) =>
      UTF8String.fromString(x).compareTo(UTF8String.fromString(y))
    case (x, y) => x.asInstanceOf[Comparable[Any]].compareTo(y)
  }
}
