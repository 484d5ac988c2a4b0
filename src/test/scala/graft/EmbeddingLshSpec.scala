package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import scala.util.Random

/** dd08's bucket-blocking contract. The hyperplane partition is approximate
  * by design (s-curve recall on NEAR duplicates), but two properties are
  * exact and must hold:
  *   - identical vectors hash to the same bucket, so planted exact
  *     duplicates are ALWAYS recalled, at cos_sim 1.0;
  *   - blocking only ever drops candidates — every returned pair also
  *     appears, with the same score, in the unblocked all-pairs scoring
  *     (precision is never bought with wrong scores).
  */
class EmbeddingLshSpec extends SparkSpec {

  test("planted exact duplicates are always recalled at cos_sim 1.0") {
    val s = spark
    import s.implicits._
    val rnd = new Random(11)
    val base = (1 to 60).map { i =>
      (i.toLong, s"lab${i % 4}", Array.fill(8)(rnd.nextGaussian().toFloat))
    }
    // Clone every 5th vector under a new id: 12 planted exact-dup pairs.
    val dups = base.filter(_._1 % 5 == 0).map { case (id, lab, v) => (id + 1000L, lab, v) }
    val dir = Files.createTempDirectory("graft-lsh").toString
    (base ++ dups).toDF("vec_id", "label", "embedding")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")

    val out = SparkEntry.queries("dd08_embedding_lsh")(spark, dir)
      .select("id_a", "id_b", "cos_sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    for ((id, _, _) <- base if id % 5 == 0) {
      val got = out.get((id, id + 1000L))
      assert(got.contains(1.0), s"planted dup ($id, ${id + 1000L}) missing or mis-scored: $got")
    }
  }

  test("blocking only drops candidates; surviving scores match all-pairs") {
    val dd08 = SparkEntry.queries("dd08_embedding_lsh")(spark, sfDir)
      .select("id_a", "id_b", "cos_sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", functions.VectorMath.l2norm(col("v")))
    val allPairs = e.select(col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
      .crossJoin(e.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", round(
        functions.VectorMath.dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("cos_sim") >= 0.25)
      .select("id_a", "id_b", "cos_sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(dd08.nonEmpty)
    for ((pair, score) <- dd08)
      assert(allPairs.get(pair).contains(score),
        s"$pair scored $score by dd08 but ${allPairs.get(pair)} by all-pairs")
  }
}
