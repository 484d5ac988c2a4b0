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
  * The rolling-hash scan LOOKS inexpressible in set SQL, but the cut test
  * reads only h mod 64, which depends on just the trailing 6 bytes — so
  * the DuckDB oracle ([[oracleCtes]]) reproduces the chunking exactly and
  * the queries built on this are full hash-checked; CdcChunksSpec
  * additionally proves the partition and shift-resync properties. */
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

  /** DuckDB oracle for the chunking — a WITH-body (caller prefixes
    * `WITH RECURSIVE`) ending in a `chunks(doc_id, chunk_idx, off, len,
    * chunk_md5)` CTE over the ASCII `documents.text` payloads.
    *
    * Set SQL cannot run the rolling hash as written, but it doesn't have
    * to: the cut test `(h & 0x3F) == 0` reads only `h mod 64`, and since
    * `h = 2·h_prev + gear(b)` every byte older than 6 positions is
    * multiplied by 2⁶ ≡ 0 (mod 64) — so the flag at each position is a
    * SIX-BYTE window expression (gear table reduced mod 64), not a scan.
    * Chunk boundaries then follow from the flags with a recursive CTE
    * whose depth is the max chunks-per-doc (≤ len/MIN), stepping from each
    * cut to the next flagged position in [start+MIN-1, start+MAX-2] with
    * the unconditional MAX-length fallback — exactly [[compute]]'s loop.
    * The same MIN/MAX/gear constants are interpolated from this object, so
    * the two implementations cannot drift apart. */
  private[graft] def oracleCtes: String = {
    val g64 = gear.map(_ & 63L).mkString("[", ", ", "]")
    s"""sized AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
      |positions AS (SELECT doc_id, CAST(unnest(range(1, n + 1)) AS INT) AS pos FROM sized),
      |bytes AS (
      |  SELECT p.doc_id, p.pos,
      |    ($g64)[ascii(substring(s.text, CAST(p.pos AS BIGINT), 1)) + 1] AS g
      |  FROM positions p JOIN sized s ON p.doc_id = s.doc_id),
      |flags AS (
      |  SELECT doc_id, pos,
      |    ((g + 2*COALESCE(LAG(g, 1) OVER w, 0) + 4*COALESCE(LAG(g, 2) OVER w, 0)
      |        + 8*COALESCE(LAG(g, 3) OVER w, 0) + 16*COALESCE(LAG(g, 4) OVER w, 0)
      |        + 32*COALESCE(LAG(g, 5) OVER w, 0)) % 64) = 0 AS f
      |  FROM bytes WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      |nxt AS (
      |  SELECT doc_id, pos,
      |    MIN(CASE WHEN f THEN pos END) OVER (PARTITION BY doc_id ORDER BY pos DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nf
      |  FROM flags),
      |cuts AS (
      |  SELECT s.doc_id, s.n, CAST(1 AS INT) AS strt,
      |    CAST(CASE WHEN nf.nf IS NOT NULL AND nf.nf <= $MAX - 1 THEN nf.nf
      |         ELSE LEAST($MAX, s.n) END AS INT) AS fin,
      |    CAST(0 AS INT) AS chunk_idx
      |  FROM sized s LEFT JOIN nxt nf ON nf.doc_id = s.doc_id AND nf.pos = $MIN
      |  UNION ALL
      |  SELECT c.doc_id, c.n, CAST(c.fin + 1 AS INT),
      |    CAST(CASE WHEN nf.nf IS NOT NULL AND nf.nf <= c.fin + $MAX - 1 THEN nf.nf
      |         ELSE LEAST(c.fin + $MAX, c.n) END AS INT),
      |    CAST(c.chunk_idx + 1 AS INT)
      |  FROM cuts c LEFT JOIN nxt nf ON nf.doc_id = c.doc_id AND nf.pos = c.fin + $MIN
      |  WHERE c.fin < c.n),
      |chunks AS (
      |  SELECT c.doc_id, CAST(c.chunk_idx AS BIGINT) AS chunk_idx,
      |    CAST(c.strt - 1 AS INT) AS off,
      |    CAST(c.fin - c.strt + 1 AS INT) AS len,
      |    md5(substring(s.text, CAST(c.strt AS BIGINT), c.fin - c.strt + 1)) AS chunk_md5
      |  FROM cuts c JOIN sized s ON c.doc_id = s.doc_id)""".stripMargin
  }
}
