package graft

import org.apache.spark.sql.functions._

import graft.operators.Salting

/** Salted join/agg must be result-identical to the plain forms while
  * splitting each hot key across `buckets` shuffle groups. */
class SaltingSpec extends SparkSpec {

  test("saltedJoin equals plain join on a skewed fact") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val ords = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderstatus")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(ords, "l_orderkey")
      .groupBy("l_orderkey").agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
    val salted = Salting.saltedJoin(li, ords, "l_orderkey", "l_linenumber", 8)
      .groupBy("l_orderkey").agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("saltedSum equals plain groupBy sum") {
    val li = Tables.lineitem(spark, sfDir)
    val plain = li.groupBy(col("l_returnflag").as("k"))
      .agg(sum("l_quantity").as("sum_l_quantity"))
      .withColumnRenamed("k", "l_returnflag")
    val salted = Salting.saltedSum(li, "l_returnflag", "l_orderkey", "l_quantity", 16)
    val a = plain.orderBy("l_returnflag").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val b = salted.orderBy("l_returnflag").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // Salted partial sums may differ in the last ulp from a different add
    // order; compare within a tight tolerance.
    assert(a.map(_._1) == b.map(_._1))
    a.zip(b).foreach { case ((_, x), (_, y)) => assert(math.abs(x - y) <= math.max(1e-9, 1e-12 * math.abs(x))) }
  }

  test("salting spreads a hot key over multiple salt values") {
    val s = spark
    import s.implicits._
    val hot = (1 to 1000).map(i => ("hotkey", i)).toDF("k", "line")
    val n = hot.withColumn("__salt", pmod(hash(col("line")), lit(8)))
      .select("__salt").distinct().count()
    assert(n == 8)
  }

  test("q55/skewProfile: planted hot key is flagged, uniform keys are not") {
    val s = spark
    import s.implicits._
    // key 1 carries 1000 of 1100 rows: 1000*32 > 4*1100 -> straggler
    val rows = ((1 to 1000).map(_ => 1L) ++ (2L to 11L).flatMap(k => Seq.fill(10)(k)))
      .toDF("k")
    val p = Salting.skewProfile(rows, "k", nPart = 32, topN = 20).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(p(1L).getAs[Boolean]("needs_salting"))
    assert(p(1L).getAs[Long]("rank") == 1L)
    assert(p(1L).getAs[Long]("share_ppm") == 1000L * 1000000L / 1100L)
    (2L to 11L).foreach(k => assert(!p(k).getAs[Boolean]("needs_salting")))
  }

  test("q55 on the real corpus: ranks are dense and counts nonincreasing") {
    val r = Salting.q55.build(spark, sfDir).orderBy("rank").collect()
    assert(r.length == 20)
    assert(r.map(_.getAs[Long]("rank")).toSeq == (1L to 20L))
    val cnts = r.map(_.getAs[Long]("cnt")).toSeq
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    assert(r.forall(x => x.getAs[Long]("share_ppm") >= 0 && x.getAs[Long]("share_ppm") <= 1000000))
  }
}
