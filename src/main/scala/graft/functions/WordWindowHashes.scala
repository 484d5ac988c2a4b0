package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Positional stride-1 window hashes in one codegen pass — dd19's front
  * half as a native expression: element p of the result is
  * `polyHash31("tok_p … tok_{p+w-1}")`, position = array index (posexplode
  * recovers it), length = nTokens − w + 1, empty when the doc is shorter
  * than one window.
  *
  * Equals the declarative
  * `transform(sequence(0, size(t)−w), i → polyHash31(array_join(slice(t, i+1, w), " ")))`
  * composition (WindowHashProperties pins it) because a window of w
  * consecutive tokens of a CLEANed string — single spaces guaranteed — is a
  * contiguous byte range of the input: the expression hashes each range
  * in place off one token-boundary scan, allocating nothing per window
  * (vs. the composition's per-window slice array + joined string + two
  * interpreted lambda closures — the measured dominant cost of dd19).
  */
case class WordWindowHashes(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"window width must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_window_hashes expects STRING, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordWindowHashes.compute(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordWindowHashes.compute($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): WordWindowHashes =
    copy(child = newChild)
}

object WordWindowHashes {
  /** Static so generated code can call it. */
  def compute(s: UTF8String, w: Int): ArrayData = {
    val bytes = s.getBytes
    var nTokens = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nTokens += 1; i += 1 }
    if (nTokens < w) return new GenericArrayData(Array.emptyLongArray)
    val starts = new Array[Int](nTokens)
    val ends = new Array[Int](nTokens)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = bytes.length
    val out = new Array[Long](nTokens - w + 1)
    i = 0
    while (i + w - 1 < nTokens) {
      out(i) = PolyHash.hashBytes(bytes, starts(i), ends(i + w - 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  def windowHashes(c: Column, w: Int): Column =
    GraftBridge.column(WordWindowHashes(GraftBridge.expression(c), w))
}
