package graft

import org.apache.spark.sql.functions._

import graft.functions._

/** The SQL registration surface (GraftExtensions.injectFunction): every
  * registered function name must run through `spark.sql` and agree with
  * its Column-API expression — the deployment path a pure-SQL user takes
  * (`--conf spark.sql.extensions=graft.GraftExtensions`, which SparkSpec's
  * session carries).
  */
class SqlFunctionsSpec extends SparkSpec {

  private def one[T](sql: String): T =
    spark.sql(sql).collect().head.get(0).asInstanceOf[T]

  private def oneSeq[T](sql: String): Seq[T] =
    spark.sql(sql).collect().head.getSeq[T](0).toSeq

  test("poly_hash31 / simhash60 via SQL equal the expression API") {
    val s = "the quick brown fox"
    assert(one[Long](s"SELECT poly_hash31('$s')") ==
      s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L))
    val viaCol = {
      val sess = spark
      import sess.implicits._
      Seq(s).toDF("t").select(SimHash60.simhash60(col("t"))).head().getLong(0)
    }
    assert(one[Long](s"SELECT simhash60('$s')") == viaCol)
  }

  test("word_shingles3 / word_shingles_n / word_window_hashes via SQL") {
    val t = "a b c d e"
    assert(oneSeq[String](s"SELECT word_shingles3('$t')") == Seq("a b c", "b c d", "c d e"))
    assert(oneSeq[String](s"SELECT word_shingles_n('$t', 4)") == Seq("a b c d", "b c d e"))
    val sess = spark
    import sess.implicits._
    val viaCol = Seq(t).toDF("t")
      .select(WordWindowHashes.windowHashes(col("t"), 2)).head().getSeq[Long](0).toSeq
    assert(oneSeq[Long](s"SELECT word_window_hashes('$t', 2)") == viaCol)
  }

  test("minhash_sig8 via SQL equals the expression API") {
    val sess = spark
    import sess.implicits._
    val df = Seq(Seq("aa", "bb", "cc")).toDF("shs")
    df.createOrReplaceTempView("mh_in")
    val viaSql = spark.sql("SELECT minhash_sig8(shs) FROM mh_in").head().getSeq[Long](0)
    val viaCol = df.select(MinHashSig8.minhashSig8(col("shs"))).head().getSeq[Long](0)
    assert(viaSql == viaCol)
  }

  test("cdc_chunks / ahash64 via SQL over binary columns") {
    val sess = spark
    import sess.implicits._
    val bytes = Array.tabulate(4096)(i => ((i * 131 + 7) % 251).toByte)
    val df = Seq(Tuple1(bytes)).toDF("payload")
    df.createOrReplaceTempView("bin_in")
    val chunksSql = spark.sql("SELECT cdc_chunks(payload) FROM bin_in").head().getSeq[Any](0).toSeq
    val chunksCol = df.select(CdcChunks.cdcChunks(col("payload"))).head().getSeq[Any](0).toSeq
    assert(chunksSql == chunksCol && chunksSql.nonEmpty)
    val hSql = spark.sql("SELECT ahash64(payload) FROM bin_in").head().getSeq[Long](0).toSeq
    val hCol = df.select(AHash64.ahash64(col("payload"))).head().getSeq[Long](0).toSeq
    assert(hSql == hCol && hSql.nonEmpty)
  }

  test("bloom_might_contain_long via SQL with an inline binary sketch") {
    val sess = spark
    import sess.implicits._
    val bf = BloomFilters.buildLong(Seq(42L, 777L).toDF("k"), "k", 2L, 0.001)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    val hex = out.toByteArray.map(b => f"${b & 0xff}%02X").mkString
    assert(one[Boolean](s"SELECT bloom_might_contain_long(42L, X'$hex')"))
    assert(one[Boolean](s"SELECT bloom_might_contain_long(777L, X'$hex')"))
    // a key far from the inserted two at 0.1% fpp: expect a miss
    assert(!one[Boolean](s"SELECT bloom_might_contain_long(123456789L, X'$hex')"))
  }

  test("dot_product via SQL equals the expression API") {
    val sess = spark
    import sess.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    df.createOrReplaceTempView("dp_in")
    val viaSql = spark.sql("SELECT dot_product(a, b) FROM dp_in").head().getDouble(0)
    assert(viaSql == 11.0)
  }
}
