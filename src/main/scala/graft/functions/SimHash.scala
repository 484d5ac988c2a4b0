package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The ENTIRE 60-bit SimHash fingerprint of a cleaned document as one native
  * codegen expression: tokenize at single spaces, hash each token occurrence
  * with TWO independent 31-style folds (PolyHash31 for bits 0-29, the
  * base-131 fold for bits 30-59), accumulate the ±1 per-bit weights, emit
  * the sign vector as a long — all in one pass over the document bytes.
  *
  * Width rationale: the fingerprint feeds the 5-block pigeonhole candidate
  * join (Dedup.simhashPairs). A 24-bit fingerprint leaves 5-bit block keys —
  * ≈144 distinct buckets corpus-wide, so RANDOM (non-near-dup) collisions
  * grow as N²·5/32 and candidate generation goes quadratic; the sf1 scaling
  * campaign measured exactly that (SCALING.md, round 7). 60 bits gives five
  * 12-bit blocks (4096-value key space each): random block collisions drop
  * by 2^7 per block while the hamming<=4 pigeonhole recall guarantee is
  * unchanged. 60 = 2×30 is the most independent bits two bounded-modulus
  * folds can supply without overflowing DuckDB's checked BIGINT arithmetic.
  *
  * Replaces dd03's explode(tokens) → per-occurrence hash → per-bit
  * conditional-sum hash aggregate, which put every token OCCURRENCE of the
  * corpus through a shuffle. As a scalar projection the fingerprint
  * pipelines into the scan: zero shuffle, zero fan-out, and the candidate
  * stage starts from one row per doc.
  *
  * Exactness contract (same as [[PolyHash31]]): token semantics are
  * `split(c, " ")` — every single space separates, consecutive spaces yield
  * empty tokens (hash 0), the empty string yields one empty token — and the
  * weight of bit b is +1 when `(hash >> b) & 1 == 1` else -1 per occurrence,
  * where hash = h31 + (h131 << 30); fingerprint bit set when the summed
  * weight is > 0. SimhashProperties proves equality against the declarative
  * explode/aggregate composition; the DuckDB oracle (per-distinct-token
  * counts × weights) remains the independent cross-engine spec.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash60 expects STRING, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHash60.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash60.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {
  /** Static so generated code can call it. */
  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    val counts = new Array[Int](60)
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        val acc = PolyHash.hashBytes(bytes, start, i) |
          (PolyHash.hashBytes2(bytes, start, i) << 30)
        var b = 0
        while (b < 60) {
          if (((acc >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 60) { if (counts(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }

  def simhash60(c: Column): Column =
    GraftBridge.column(SimHash60(GraftBridge.expression(c)))
}
