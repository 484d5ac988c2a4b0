package graft.functions

import org.apache.spark.sql.Column
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

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31 + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $s.getBytes();
         |long $acc = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $acc = ($acc * 31 + ($bytes[$i] & 0xff)) % 1000000007L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash31 =
    copy(child = newChild)
}

object PolyHash {
  def polyHash31(s: Column): Column =
    GraftBridge.column(PolyHash31(GraftBridge.expression(s)))
}
