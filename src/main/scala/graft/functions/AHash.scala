package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** 64-bit average-hash (aHash) perceptual fingerprint of a binary payload as
  * one native codegen expression, emitted as FOUR 16-bit pieces (low piece
  * first) so downstream pigeonhole blocking and Hamming arithmetic never
  * touch the sign bit of a packed 64-bit long.
  *
  * The "decode" here is the repo's deterministic media stub (the container
  * ships no codecs — see [[graft.multimodal.Multimodal]]): the payload is
  * read as a 64-cell strip, cell b covering bytes [b·n/64, (b+1)·n/64).
  * Bit b is set when cell b's byte mean exceeds the global mean, compared
  * in EXACT integer cross-multiplied form — sum_b·n > total·nb — so the
  * fingerprint is bit-identical in any engine with 64-bit integers (the
  * DuckDB oracle spells the same comparison; exact while 255·n² < 2⁶³,
  * i.e. payloads under ~190 MB). A real image pipeline swaps the byte
  * strip for decoded luma and keeps everything else.
  *
  * aHash's classic perceptual property holds by construction: a uniform
  * brightness shift adds c·nb to every cell sum and c·n to the total, and
  * the cross-multiplied comparison cancels both — AHashProperties proves
  * shift invariance and the declarative-composition equality on random
  * payloads.
  */
case class AHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"ahash64 expects BINARY, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    AHash64.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): AHash64 =
    copy(child = newChild)
}

object AHash64 {
  /** Static so generated code can call it — one pass over the payload. */
  def compute(bytes: Array[Byte]): ArrayData = {
    val n = bytes.length.toLong
    val sums = new Array[Long](64)
    var total = 0L
    var b = 0
    while (b < 64) {
      val lo = (b * n / 64).toInt
      val hi = ((b + 1) * n / 64).toInt
      var s = 0L
      var j = lo
      while (j < hi) { s += (bytes(j) & 0xff); j += 1 }
      sums(b) = s
      total += s
      b += 1
    }
    val pieces = new Array[Long](4)
    b = 0
    while (b < 64) {
      val nb = ((b + 1) * n / 64) - (b * n / 64)
      if (sums(b) * n > total * nb) pieces(b >> 4) |= (1L << (b & 15))
      b += 1
    }
    new GenericArrayData(pieces)
  }

  def ahash64(c: Column): Column =
    GraftBridge.column(AHash64(GraftBridge.expression(c)))
}
