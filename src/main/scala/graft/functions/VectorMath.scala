package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** Ordered dot product of two numeric arrays as a native Catalyst expression.
  *
  * The interpreted alternative — `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)`
  * — evaluates two lambda closures per element per row outside codegen; for an
  * ANN scan that is the entire query cost. This expression compiles to a tight
  * primitive loop inside WholeStageCodegen.
  *
  * Exactness contract: accumulation is strictly left-to-right
  * (`acc += (double)a[i] * (double)b[i]`), the same IEEE evaluation order as
  * the DuckDB oracle's `list_reduce(list_transform(...))` fold, so both
  * engines produce bit-identical doubles and rounded comparisons never drift.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemOf(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => elemOf(e) match {
      case FloatType | DoubleType => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<float|double> inputs, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  private def get(e: Expression, arr: ArrayData, i: Int): Double = elemOf(e) match {
    case FloatType => arr.getFloat(i).toDouble
    case _ => arr.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += get(left, x, i) * get(right, y, i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getCode(e: Expression, arr: String, i: String): String = elemOf(e) match {
      case FloatType => s"(double)$arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${getCode(left, a, i)} * ${getCode(right, b, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorMath {
  /** Codegen'd ordered dot product; fold order matches the DuckDB oracle. */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** L2 norm as sqrt of the self-dot — same fold order as `dot`. */
  def l2norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dot(a, a))
}
