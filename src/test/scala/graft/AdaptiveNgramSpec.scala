package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The dd04 adaptive plan chooser (Dedup.chooseNgramPrefix /
  * ngramJaccardPairsAuto): the Σ df² hot-shingle statistic must route
  * boilerplate-heavy corpora to the PPJoin prefix plan and bounded-df
  * corpora to the default shuffle-count plan — with the absolute volume
  * floor keeping toy corpora on the default plan no matter their ratio
  * (tools.StressDd04 measured the prefix plan's fixed overhead dominating
  * below ~1e8 candidate rows). Result equivalence of the two branches is
  * DedupEquivalenceSpec's theorem; this spec pins the ROUTING. */
class AdaptiveNgramSpec extends SparkSpec {

  /** n docs of distinct filler words; `hotEvery > 0` appends one shared
    * boilerplate sentence to every hotEvery-th doc; doc i with i % 9 == 1
    * repeats doc i-1's filler (planted near-dup pairs). */
  private def corpus(n: Int, hotEvery: Int): String = {
    val s = spark
    import s.implicits._
    val boiler = " all rights reserved unauthorized reproduction strictly prohibited"
    val rows = (0 until n).map { i =>
      val base = if (i % 9 == 1) i - 1 else i
      val words = (0 until 12).map(j => s"w${base}x$j").mkString(" ")
      val text = if (hotEvery > 0 && i % hotEvery == 0) words + boiler else words
      (i.toLong, text)
    }
    val dir = Files.createTempDirectory("adaptive-ngram").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("gen"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def shingles(dir: String) = Dedup.docShingles(spark, dir)

  test("clean corpus: ratio stays under threshold, default plan chosen") {
    val sh = shingles(corpus(120, hotEvery = 0))
    // distinct filler shingles: df = 1 everywhere, so dfsq == E and the
    // ratio test cannot trip regardless of the floor.
    assert(!Dedup.chooseNgramPrefix(sh, floor = 0L))
  }

  test("boilerplate corpus: ratio trips once the volume floor allows it") {
    val sh = shingles(corpus(120, hotEvery = 2))
    // 60 docs share the boilerplate shingles: those df = 60 rows push
    // dfsq ≈ 60× past the 8× ratio bound.
    assert(Dedup.chooseNgramPrefix(sh, floor = 0L))
  }

  test("volume floor keeps a toy corpus on the default plan despite its ratio") {
    val sh = shingles(corpus(120, hotEvery = 2))
    assert(!Dedup.chooseNgramPrefix(sh)) // default 1e8 floor: join is cheap
  }

  test("auto entry equals the statically-chosen plan's results") {
    val dir = corpus(90, hotEvery = 3)
    val auto = Dedup.ngramJaccardPairsAuto(spark, dir)
      .orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
    val static0 = Dedup.ngramJaccardPairs(spark, dir, prefixFilter = false)
      .orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
    assert(auto == static0)
    assert(auto.nonEmpty, "boilerplate suffix must create J>=0.5 pairs")
  }
}
