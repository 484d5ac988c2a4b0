package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.{TextPrep, WordShingles3}

/** WordShingles3 (native expression) must equal the declarative
  * TextPrep.shingles3 ∘ tokens composition on arbitrary inputs — including
  * the degenerate shapes: empty string, <3 tokens, duplicate shingles,
  * consecutive spaces (empty tokens), unicode text. */
object ShingleProperties extends Properties("graft.shingles") {

  private lazy val spark = SparkSpec.spark

  private val word = Gen.oneOf(
    Gen.alphaLowerStr.map(_.take(6)),
    Gen.oneOf("alpha", "beta", "gamma", "", "übung", "数据"))
  private val text: Gen[String] = for {
    n <- Gen.choose(0, 12)
    ws <- Gen.listOfN(n, word)
  } yield ws.mkString(" ")

  private def viaSpark(inputs: Seq[String]): Seq[Seq[String]] = {
    val s = spark
    import s.implicits._
    val df = inputs.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "c")
    df.select(col("id"),
        WordShingles3.shingles3(col("c")).as("fast"),
        TextPrep.shingles3(TextPrep.tokens(col("c")), col("c")).as("ref"))
      .orderBy("id")
      .collect()
      .flatMap { r =>
        val fast = r.getSeq[String](1)
        val ref = r.getSeq[String](2)
        assert(fast == ref, s"input '${inputs(r.getInt(0))}': fast=$fast ref=$ref")
        Seq(fast)
      }.toSeq
  }

  property("native == declarative composition, batched random inputs") =
    forAll(Gen.listOfN(8, text)) { inputs =>
      viaSpark(inputs)
      true
    }

  property("degenerate shapes agree") = {
    viaSpark(Seq("", " ", "  ", "a", "a b", "a b c", "a b c d",
      "x x x x x", "a  b c", " a b c ", "dup dup dup dup"))
    true
  }
}
