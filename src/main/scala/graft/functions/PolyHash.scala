package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 31-base polynomial string hash mod 1e9+7 as a native codegen expression.
  *
  * Replaces the interpreted `aggregate(transform(sequence(1, length(s)), ...))`
  * fold, which allocates a per-character index array and evaluates two lambda
  * closures per character per row — the dominant cost of the minhash/simhash/
  * prefix-filter pipelines, whose inner loop hashes every shingle of every doc.
  *
  * Exactness contract: inputs are ASCII (the dedup pipeline hashes only
  * cleaned `[a-z0-9 ]` text), so iterating UTF-8 BYTES here equals the
  * `ascii(substr(s, i, 1))` per-CHARACTER fold the DuckDB oracle computes;
  * both engines fold left-to-right `acc = (acc*31 + c) % 1000000007`.
  */
case class PolyHash31(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"poly_hash31 expects STRING, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    PolyHash.hashBytes(bytes, 0, bytes.length)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      s"""
         |byte[] $bytes = $s.getBytes();
         |${ev.value} = graft.functions.PolyHash.hashBytes($bytes, 0, $bytes.length);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash31 =
    copy(child = newChild)
}

object PolyHash {
  def polyHash31(s: Column): Column =
    GraftBridge.column(PolyHash31(GraftBridge.expression(s)))

  /** Static hash for sibling expressions that loop over array elements. */
  def hashBytes(bytes: Array[Byte], from: Int, until: Int): Long = {
    var acc = 0L
    var i = from
    while (i < until) {
      acc = (acc * 31 + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    acc
  }

  /** Independent second fold (base 131, mod 998244353 — both < 2^30, so
    * `acc*131 + byte` never overflows a BIGINT in either engine): supplies
    * bits 30-59 of [[SimHash60]]'s per-token hash. Kept side by side with
    * [[hashBytes]] so the two folds share the exactness contract (cleaned
    * ASCII input ⇒ byte loop == DuckDB's per-character `ascii` fold). */
  def hashBytes2(bytes: Array[Byte], from: Int, until: Int): Long = {
    var acc = 0L
    var i = from
    while (i < until) {
      acc = (acc * 131 + (bytes(i) & 0xff)) % 998244353L
      i += 1
    }
    acc
  }
}

/** The full 8-permutation MinHash signature of a shingle array in ONE native
  * codegen pass: each shingle is hashed exactly once, and the 8 permutation
  * minima are tracked in registers — the signature every LSH operator
  * (dd02/dd06/dd07 batch, DocsStream streaming) starts from.
  *
  * Why native: the declarative `array_min(transform(hs, …))` ×8 form either
  * duplicates the hashing transform into all eight trees (higher-order
  * functions get no subexpression elimination — measured 2.9× slower on
  * dd02) or leans on a multi-referenced projection alias the optimizer must
  * happen to keep; and HOFs are CodegenFallback, so the hot loop stays
  * interpreted either way. Permutation constants come from
  * [[TextPrep.minhashPerms]] — one definition, both engines, all operators.
  * Semantics: min over the shingles of (a_k·hash+b_k) mod 1e9+7 per row k.
  * An EMPTY (or all-null-element) array yields a NULL signature — a min over
  * nothing is undefined, and a sentinel would make every empty doc LSH-
  * collide with every other; null elements are skipped. Neither occurs in
  * the shipped pipelines (the shingles3 contract falls back to [c]), but the
  * SQL-registered function must not mislabel empty inputs. */
case class MinHashSig8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig8 expects ARRAY<STRING>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHashSig8.compute(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.MinHashSig8.compute($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashSig8 =
    copy(child = newChild)
}

object MinHashSig8 {
  private val A = TextPrep.minhashPerms.map(_._1).toArray
  private val B = TextPrep.minhashPerms.map(_._2).toArray
  private val M = 1000000007L

  /** Static so generated code can call it; null for empty/all-null input. */
  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(A.length)(Long.MaxValue)
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen = true
        val bytes = arr.getUTF8String(i).getBytes
        val h = PolyHash.hashBytes(bytes, 0, bytes.length)
        var k = 0
        while (k < A.length) {
          val v = (A(k) * h + B(k)) % M
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    if (!seen) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  def minhashSig8(c: Column): Column =
    GraftBridge.column(MinHashSig8(GraftBridge.expression(c)))
}
