package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 3-word shingles of a cleaned (single-space-separated) string as
  * one native expression.
  *
  * Semantics are EXACTLY TextPrep.shingles3 ∘ tokens:
  * `when(size(split(c," ")) >= 3, array_distinct(transform(sequence(0, n-3),
  * i => array_join(slice(toks, i+1, 3), " ")))).otherwise(array(c))` —
  * including the degenerate cases (empty string → [""], <3 tokens → [c],
  * consecutive spaces → empty tokens). ShingleProperties proves equivalence
  * against that composition on random inputs.
  *
  * Why native: the composed form evaluates three higher-order functions with
  * two lambda closures per shingle per row — allocation-heavy and outside
  * WholeStageCodegen — and it is the first stage of dd02/dd04/dd06/dd07,
  * i.e. the dominant scan cost of the dedup family. Because the separator
  * is a single space, a 3-token shingle IS a substring of the input: this
  * expression just scans for space offsets and emits zero-copy substring
  * views, deduped in first-occurrence order.
  */
case class WordShingles3(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_shingles3 expects STRING, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordShingles3.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles3.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles3 =
    copy(child = newChild)
}

object WordShingles3 {
  /** Static so generated code can call it — keeps the expression inside
    * WholeStageCodegen as a single method call per row. */
  def compute(s: UTF8String): ArrayData = WordShinglesN.compute(s, 3)

  def shingles3(c: Column): Column =
    GraftBridge.column(WordShingles3(GraftBridge.expression(c)))
}

/** [[WordShingles3]] generalized to n-word shingles — same semantics, same
  * zero-copy substring-view scan, with n a plan-time constant baked into the
  * generated call. n ≥ 13 is the usual benchmark-decontamination window
  * (GPT-3 appendix C); dd09 uses 8 to fit the synthetic corpus' doc length. */
case class WordShinglesN(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_shingles_n expects STRING, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordShinglesN.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShinglesN.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShinglesN =
    copy(child = newChild)
}

object WordShinglesN {
  /** Static so generated code can call it. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    // Token boundaries: split at EVERY single space (mirrors split(c, " "),
    // where consecutive spaces yield empty tokens).
    var nTokens = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nTokens += 1; i += 1 }
    if (nTokens < n) return new GenericArrayData(Array[Any](s))
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
    // Shingle i spans token i through token i+n-1 inclusive of the single
    // separator spaces — a contiguous byte range of the input.
    val seen = new java.util.LinkedHashSet[UTF8String]
    i = 0
    while (i + n - 1 < nTokens) {
      seen.add(UTF8String.fromBytes(bytes, starts(i), ends(i + n - 1) - starts(i)))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  def shinglesN(c: Column, n: Int): Column =
    GraftBridge.column(WordShinglesN(GraftBridge.expression(c), n))
}
