package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import scala.util.Random

/** Losslessness proof for q25's two candidate plans: length-bucket blocking
  * and PartEnum chunk pigeonholing must both equal the brute-force cross
  * join — on the real part table AND on a corpus where every title has the
  * SAME length (the shape that degrades bucket blocking and that the
  * content-keyed chunk plan exists for). */
class FuzzyBlockingSpec extends SparkSpec {

  private def results(d: String, chunk: Boolean): Seq[(String, String, Long, Double)] =
    etl.Matching.fuzzyRatioPairs(spark, d, chunkBlocking = chunk)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sorted

  private def brute(d: String): Seq[(String, String, Long, Double)] = {
    val part = Tables.part(spark, d)
    val master = part.filter(col("p_partkey") % 4 === 0)
      .select(lower(col("p_name")).as("master_title")).distinct()
    val test = part.select(
      when(col("p_partkey") % 10 === 1, lower(col("p_name")))
        .when(col("p_partkey") % 2 === 0,
          lower(col("p_name")).substr(lit(1), length(col("p_name")) - 1))
        .otherwise(lower(concat(col("p_name"), lit(" "), col("p_type"))))
        .as("test_title")).distinct()
    master.crossJoin(test)
      .withColumn("lev", levenshtein(col("master_title"), col("test_title")).cast("long"))
      .withColumn("ratio", round(lit(100.0) * (lit(1.0) - col("lev").cast("double") /
        (length(col("master_title")) + length(col("test_title"))).cast("double")), 4))
      .filter(col("ratio") >= 95.0)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sorted
  }

  test("bucket and chunk plans equal brute force on the real part table") {
    val want = brute(sfDir)
    assert(want.nonEmpty)
    assert(results(sfDir, chunk = false) == want)
    assert(results(sfDir, chunk = true) == want)
  }

  test("bucket and chunk plans equal brute force on a single-length corpus") {
    val s = spark
    import s.implicits._
    val rnd = new Random(5)
    // Every p_name exactly 20 chars; near-dup structure comes from the query's
    // own test-variant construction (exact copies, last-char drops, suffixes).
    val rows = (1 to 120).map { i =>
      val body = Seq.fill(3)("abcdefghij"(rnd.nextInt(10))).mkString
      val name = f"title $body%s code $i%04d" // 5+1+3+1+4+1+4 = 20 chars
      (i.toLong, name, "PROMO", "Brand#1", 10, 100.0)
    }
    val dir = Files.createTempDirectory("graft-fuzzy").toString
    rows.toDF("p_partkey", "p_name", "p_type", "p_brand", "p_size", "p_retailprice")
      .coalesce(1).write.parquet(s"$dir/part.parquet")

    val want = brute(dir)
    assert(want.nonEmpty, "same-length corpus must produce matches")
    assert(results(dir, chunk = false) == want)
    assert(results(dir, chunk = true) == want)
  }
}
