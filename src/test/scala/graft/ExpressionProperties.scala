package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.{DotProduct, MinHashSig8, PolyHash31, SimHash60}

/** Property tests for the native expressions, driven through Catalyst
  * interpreted eval (no Spark jobs — hundreds of cases run in ms). The
  * codegen path is covered by ExpressionSpec; interpreted-vs-reference here
  * pins the arithmetic contract both paths share. */
object ExpressionProperties extends Properties("graft.expressions") {

  // The documented PolyHash31 domain: cleaned ASCII text.
  private val asciiString: Gen[String] =
    Gen.listOf(Gen.frequency(
      (8, Gen.alphaLowerChar), (2, Gen.numChar), (3, Gen.const(' '))))
      .map(_.mkString)

  private def refHash(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)

  property("polyHash31 == 31-base fold, any ASCII input") =
    forAll(asciiString) { s =>
      PolyHash31(Literal(s)).eval(null) == refHash(s)
    }

  property("polyHash31 of null is null") = Prop {
    PolyHash31(Literal.create(null, StringType)).eval(null) == null
  }

  private val floatArray: Gen[Array[Float]] =
    Gen.listOf(Gen.chooseNum(-1e6f, 1e6f)).map(_.toArray)

  private def refDot(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  private def lit(a: Array[Float]) = Literal.create(a, ArrayType(FloatType))

  property("dotProduct == strict left fold, any float arrays") =
    forAll(floatArray, floatArray) { (a, b) =>
      val got = DotProduct(lit(a), lit(b)).eval(null).asInstanceOf[Double]
      // bit-exact, including signed zeros
      java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(refDot(a, b))
    }

  property("dotProduct self-dot is non-negative") =
    forAll(floatArray) { a =>
      DotProduct(lit(a), lit(a)).eval(null).asInstanceOf[Double] >= 0.0
    }

  property("dotProduct with a null side is null") = Prop {
    DotProduct(Literal.create(null, ArrayType(FloatType)), lit(Array(1f)))
      .eval(null) == null
  }

  /** Second reference fold (base 131 mod 998244353) — SimHash60's bits
    * 30-59. */
  private def refHash2(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * 131 + c.toLong) % 998244353L)

  /** Reference SimHash: split(" ", -1) token semantics (trailing/consecutive
    * empties kept — Spark's split default), per-occurrence ±1 bit weights
    * over the 60-bit combined token hash h31 | (h131 << 30). */
  private def refSimhash(s: String): Long = {
    val counts = new Array[Int](60)
    for (t <- s.split(" ", -1); b <- 0 until 60) {
      val h = refHash(t) | (refHash2(t) << 30)
      if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
    }
    (0 until 60).map(b => if (counts(b) > 0) 1L << b else 0L).sum
  }

  property("simHash60 == tokenize∘hash∘weight composition, any ASCII input") =
    forAll(asciiString) { s =>
      SimHash60(Literal(s)).eval(null) == refSimhash(s)
    }

  property("simHash60 of null is null") = Prop {
    SimHash60(Literal.create(null, StringType)).eval(null) == null
  }

  property("minHashSig8 == per-permutation min over hashed shingles") =
    forAll(Gen.nonEmptyListOf(asciiString)) { shs =>
      val got = MinHashSig8(Literal.create(shs, ArrayType(StringType)))
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
      val want = graft.functions.TextPrep.minhashPerms.map { case (a, b) =>
        shs.map(s => (a * refHash(s) + b) % 1000000007L).min
      }
      got == want
    }

  /** Reference for [[graft.functions.WordWindowHashes]]: the declarative
    * slice∘join∘hash composition it replaces in dd19 (split(" ", -1)
    * token semantics; docs shorter than one window yield no windows). */
  private def refWindowHashes(s: String, w: Int): Seq[Long] = {
    val t = s.split(" ", -1)
    if (t.length < w) Seq.empty
    else (0 to t.length - w).map(i => refHash(t.slice(i, i + w).mkString(" ")))
  }

  property("wordWindowHashes == slice∘join∘hash composition, any ASCII input") =
    forAll(asciiString, Gen.choose(1, 12)) { (s, w) =>
      val got = graft.functions.WordWindowHashes(Literal(s), w)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
      got == refWindowHashes(s, w)
    }

  property("wordWindowHashes of null is null") = Prop {
    graft.functions.WordWindowHashes(Literal.create(null, StringType), 5).eval(null) == null
  }
}
