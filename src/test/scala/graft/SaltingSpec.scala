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
}
