package graft

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._

import graft.multimodal.MediaDecode
import graft.multimodal.MediaDecode.{DecodedMedia, MediaRow}

/** E-series decode plumbing + SQL function registration. */
class MultimodalDecodeSpec extends SparkSpec {

  test("mapPartitions decode produces typed metadata for every payload") {
    val s = spark
    import s.implicits._
    val in = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRow]
    val out = MediaDecode.decode(in).cache()
    try {
      assert(out.count() == in.count())
      val row = out.filter(_.doc_id == 0L).head()
      assert(row.n_bytes > 0)
      assert(row.width >= 16 && row.width < 80)
      assert(row.height >= 16 && row.height < 80)
      assert(row.features.length == 8)
      assert(row.features.forall(f => f >= 0f && f <= 1f))
      // Deterministic: same payload → same features.
      val again = MediaDecode.decode(in).filter(_.doc_id == 0L).head()
      assert(again.features.toSeq == row.features.toSeq)
    } finally out.unpersist()
  }

  test("decode schema round-trips through a DataFrame boundary") {
    val s = spark
    import s.implicits._
    val in = Seq(MediaRow(1L, "hello world".getBytes("UTF-8"))).toDS()
    val df = MediaDecode.decode(in).toDF()
    assert(df.columns.toSeq == Seq("doc_id", "n_bytes", "width", "height", "features"))
    val back = df.as[DecodedMedia].head()
    assert(back.n_bytes == 11L)
  }

  test("extension-registered SQL functions resolve and compute") {
    GraftBridge.registerFunctions(spark, GraftExtensions.functions)
    val r = spark.sql(
      "SELECT poly_hash31('abc') AS h, dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
        "word_shingles3('a b c d') AS sh, word_shingles_n('a b c d', 2) AS sh2, " +
        "ahash64(cast('hello world' AS BINARY)) AS ph")
      .head
    val expected = Seq('a', 'b', 'c').foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    assert(r.getLong(0) == expected)
    assert(r.getDouble(1) == 11.0)
    assert(r.getSeq[String](2) == Seq("a b c", "b c d"))
    assert(r.getSeq[String](3) == Seq("a b", "b c", "c d"))
    // ahash64 yields the four 16-bit fingerprint pieces
    assert(r.getSeq[Long](4).length == 4)
  }
}
