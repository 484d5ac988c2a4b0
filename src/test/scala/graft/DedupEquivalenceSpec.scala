package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import scala.util.Random

import graft.functions.TextPrep

/** Randomized lossless-ness check: the inverted-index Jaccard join (dd04)
  * must produce exactly the brute-force O(n²) pair set on corpora with
  * planted near-duplicates — the candidate pruning (shared-shingle + size
  * ratio) may never drop a qualifying pair. */
class DedupEquivalenceSpec extends SparkSpec {

  private val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")

  private def corpus(seed: Int, n: Int): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    val bases = Seq.fill(n / 3)(Seq.fill(8 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))))
    (0 until n).map { i =>
      val base = bases(rnd.nextInt(bases.size))
      val text = rnd.nextInt(3) match {
        case 0 => base // exact dup of a base
        case 1 => // near dup: mutate one word
          val j = rnd.nextInt(base.size)
          base.updated(j, vocab(rnd.nextInt(vocab.size)))
        case _ => Seq.fill(8 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
      }
      (i.toLong, text.mkString(" "))
    }
  }

  private def writeDocs(seed: Int): String = {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory(s"graft-dedup-$seed").toString
    corpus(seed, 60)
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("gen"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  for (seed <- Seq(1, 2, 3); prefix <- Seq(false, true)) {
    test(s"dd04 inverted-index (prefixFilter=$prefix) == brute force (seed $seed)") {
      val dir = writeDocs(seed)
      val fast = operators.Dedup.ngramJaccardPairs(spark, dir, prefixFilter = prefix)
        .orderBy("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

      val sh = Tables.documents(spark, dir)
        .select(col("doc_id"), TextPrep.clean(col("text")).as("c"))
        .select(col("doc_id"),
          TextPrep.shingles3(TextPrep.tokens(col("c")), col("c")).as("shs"))
      val brute = sh.select(col("doc_id").as("id_a"), col("shs").as("sa"))
        .crossJoin(sh.select(col("doc_id").as("id_b"), col("shs").as("sb")))
        .filter(col("id_a") < col("id_b"))
        .withColumn("jaccard", TextPrep.jaccard(col("sa"), col("sb")))
        .filter(col("jaccard") >= 0.5)
        .orderBy("id_a", "id_b")
        .select("id_a", "id_b", "jaccard")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

      assert(brute.nonEmpty, "corpus must plant at least one near-dup pair")
      assert(fast == brute)
    }
  }
}
