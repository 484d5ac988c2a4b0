package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** Content-defined chunking (CDC) of a binary payload with a Gear rolling
  * hash — the content-addressed dedup primitive for OPAQUE media bytes,
  * complementing the text-side MinHash family. Boundaries are declared
  * where the rolling hash (whose value depends only on the previous ≤ 64
  * bytes) hits `hash & mask == 0`, so a byte region duplicated between two
  * payloads AT DIFFERENT OFFSETS re-synchronizes to the same interior
  * boundaries and hashes to the same chunk ids — the property fixed-size
  * framing (mm02) fundamentally lacks, and the reason every dedup store
  * (LBFS SOSP'01; FastCDC ATC'16) cuts content-defined chunks.
  *
  * Semantics (deterministic, plan-time constants): gear table from a
  * splitmix64 of the byte value; `h = (h << 1) + gear(b)` per byte (64-bit
  * wraparound); a cut after byte i when the chunk has ≥ MIN bytes and
  * `(h & MASK) == 0`, or unconditionally at MAX bytes; the tail is the
  * final chunk. MIN 16 / MASK 0x3F (avg ~64 B) / MAX 256 — sized to the
  * test payloads; production media would scale these ~1000×.
  *
  * Output: array<struct<off:int, len:int, md5:string>> covering the payload
  * exactly — the content hash is computed HERE, inside the same byte scan,
  * so the downstream explode ships ~50-byte structs instead of carrying the
  * whole payload into every chunk row for a later substr+md5 (measured 235k
  * rows × 3 KB payload duplication on the test corpus).
  * A rolling-hash scan is inherently sequential per row, inexpressible in
  * set-based SQL — the query built on this is rows-only checked, and
  * CdcChunksSpec proves the partition and shift-resync properties instead. */
case class CdcChunks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"cdc_chunks expects BINARY, got ${t.sql}")
  }

  override def dataType: DataType = CdcChunks.outType

  override def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcChunks.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  val outType: DataType = ArrayType(StructType(Seq(
    StructField("off", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("md5", StringType, nullable = false))), containsNull = false)

  private val MIN = 16
  private val MAX = 256
  private val MASK = 0x3FL

  /** splitmix64-derived gear table — deterministic everywhere. */
  private val gear: Array[Long] = Array.tabulate(256) { i =>
    var z = i.toLong * 0x9E3779B97F4A7C15L + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private val hex = "0123456789abcdef".toCharArray

  private def chunkRow(bytes: Array[Byte], off: Int, len: Int): InternalRow = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(bytes, off, len)
    val dig = md.digest()
    val s = new Array[Char](32)
    var i = 0
    while (i < 16) {
      s(2 * i) = hex((dig(i) >> 4) & 0xf)
      s(2 * i + 1) = hex(dig(i) & 0xf)
      i += 1
    }
    new GenericInternalRow(Array[Any](off, len,
      org.apache.spark.unsafe.types.UTF8String.fromString(new String(s))))
  }

  /** Static so generated code can call it. */
  def compute(bytes: Array[Byte]): GenericArrayData = {
    val out = new java.util.ArrayList[InternalRow]
    var start = 0
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h << 1) + gear(bytes(i) & 0xff)
      val len = i - start + 1
      if ((len >= MIN && (h & MASK) == 0L) || len >= MAX) {
        out.add(chunkRow(bytes, start, len))
        start = i + 1
      }
      i += 1
    }
    if (start < bytes.length || bytes.length == 0)
      out.add(chunkRow(bytes, start, bytes.length - start))
    new GenericArrayData(out.toArray)
  }

  def cdcChunks(c: Column): Column =
    GraftBridge.column(CdcChunks(GraftBridge.expression(c)))
}
