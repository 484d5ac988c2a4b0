package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Broadcast-Bloom semi-join pruning — the 100 TB decontamination plan shape.
  *
  * A plain `corpus ⋈ evalSet` semi-join on gram hashes shuffles (or hashes)
  * the FULL big side: every corpus gram pays exchange + probe cost even
  * though contamination is rare (sub-percent hit rates are the norm for
  * benchmark decontamination a la the reference's incremental anti-join,
  * dw3_merge_inc.py:109-118 generalized to n-gram membership). The classic
  * fix — the same one Spark's own runtime row-level filtering
  * (`InjectRuntimeFilter`) applies to shuffle joins — is to collapse the
  * small side into a fixed-size Bloom sketch, ship it to every scan task,
  * and drop non-members BEFORE the exchange. At 1% fpp the sketch costs
  * ~9.6 bits/key: a 10⁸-gram eval set that would need ~800 MB as an exact
  * hash relation travels as a ~115 MB bitset, and the downstream exact
  * verify join (which removes the ≤1% false positives) carries only the
  * survivors — hit-rate-sized, not corpus-sized.
  *
  * Exactness contract: a Bloom filter has NO false negatives, so
  * `prefilter → exact join` ≡ `exact join` bit-for-bit; [[graft.operators.Dedup.dd18]]
  * reuses dd09's DuckDB oracle verbatim on that ground, and
  * BloomDecontamSpec asserts frame-equality against dd09 directly.
  *
  * Build side uses the public distributed sketch builder
  * (`DataFrame.stat.bloomFilter`, a treeAggregate): executors fold their
  * partitions into partial bitsets, the driver ORs them — the only
  * driver-resident object is the fixed-size filter, never the key set.
  */
object BloomFilters {

  /** Distributed Bloom build over a LongType column. `expectedItems` sizes
    * the bitset; passing the exact distinct count (cheap on the small side)
    * pins the realized fpp at or below `fpp`. */
  def buildLong(smallSide: DataFrame, column: String, expectedItems: Long, fpp: Double): BloomFilter =
    smallSide.stat.bloomFilter(column, math.max(expectedItems, 1L), fpp)

  /** Membership-test Column backed by [[BloomMightContainLong]]. */
  def mightContainLong(c: Column, bf: BloomFilter): Column = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    GraftBridge.column(BloomMightContainLong(GraftBridge.expression(c), out.toByteArray))
  }
}

/** `bloom.mightContainLong(x)` as a native codegen expression over a
  * serialized filter (the filter rides the plan exactly as Spark's own
  * `BloomFilterMightContain` ships its sketch — as plan-embedded bytes,
  * deserialized once per task, probed per row with two multiplies and a
  * bitset read per hash function; no UDF, no closure serialization).
  */
case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bloom_might_contain_long expects BIGINT, got ${t.sql}")
  }

  override def dataType: DataType = BooleanType

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(input: Any): Any =
    bf.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("graftBloom", bf, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $bloomRef.mightContainLong($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}
