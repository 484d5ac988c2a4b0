package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The ENTIRE 24-bit SimHash fingerprint of a cleaned document as one native
  * codegen expression: tokenize at single spaces, PolyHash31 each token
  * occurrence, accumulate the ±1 per-bit weights, emit the sign vector as a
  * long — all in one pass over the document bytes.
  *
  * Replaces dd03's explode(tokens) → per-occurrence hash → 24-conditional-sum
  * hash aggregate, which put every token OCCURRENCE of the corpus through a
  * shuffle (the row count multiplies by the document length). As a scalar
  * projection the fingerprint now pipelines into the scan: zero shuffle,
  * zero fan-out, and the candidate stage starts from one row per doc.
  *
  * Exactness contract (same as [[PolyHash31]]): token semantics are
  * `split(c, " ")` — every single space separates, consecutive spaces yield
  * empty tokens (hash 0), the empty string yields one empty token — and the
  * weight of bit b is +1 when `(hash >> b) & 1 == 1` else -1 per occurrence,
  * fingerprint bit set when the summed weight is > 0. SimhashProperties
  * proves equality against the declarative explode/aggregate composition;
  * the DuckDB oracle (per-distinct-token counts × weights) remains the
  * independent cross-engine spec.
  */
case class SimHash24(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash24 expects STRING, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHash24.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash24.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash24 =
    copy(child = newChild)
}

object SimHash24 {
  /** Static so generated code can call it. */
  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    val counts = new Array[Int](24)
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        val acc = PolyHash.hashBytes(bytes, start, i)
        var b = 0
        while (b < 24) {
          if (((acc >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 24) { if (counts(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }

  def simhash24(c: Column): Column =
    GraftBridge.column(SimHash24(GraftBridge.expression(c)))
}
