package graft

import org.apache.spark.sql.functions._

/** A31/A32/A33: messy-source repair and sibling-array flatten semantics,
  * checked against hand-computed expectations (the DuckDB oracle checks
  * cross-engine equality; these pin the REFERENCE semantics themselves —
  * cascade order, fillna-before-cascade, single-pass >1⇒/100, and
  * independent positional indices per child table). */
class SourceRepairSpec extends SparkSpec {

  test("q31: ordered cascade branch per synthesis cycle, fillna'd no-suffix rows") {
    val rows = SparkEntry.queries("q31_book_type")(spark, sfDir)
      .select("part_key", "book_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (k, bt) =>
      val expected = (k % 7) match {
        case 0 => "Hardcover"
        case 1 => "Audiobook"
        case 2 | 3 => "E-Book"
        case 4 => "Print"                         // paperback branch
        case 5 => if (k % 14 == 5) "E-Book" else "Print" // Title-side ebook / fillna default
        case 6 => "Print"                         // unmatched suffix -> default branch
      }
      assert(bt == expected, s"part $k: got $bt want $expected")
    }
    // Every branch of the cascade is actually exercised.
    assert(rows.values.toSet == Set("Hardcover", "Audiobook", "E-Book", "Print"))
  }

  test("q31: cascade order beats later branches (hardcover wins over e-book)") {
    // An input matching BOTH 'hardcover' and 'e-?book' must take the FIRST
    // matching branch, like the reference's np.select.
    import spark.implicits._
    val df = Seq((0L, "X - Hardcover e-book sampler")).toDF("p_partkey", "p_name")
    // Reuse the query's classifier by routing through a one-row part table:
    // the synthesized suffix for p_partkey % 7 == 0 is ' - Hardcover Edition',
    // so instead classify directly via the same column logic.
    val parts = split(col("name"), " - ", 2)
    val out = df.select(col("p_name").as("name"))
      .withColumn("title", get(parts, lit(0)))
      .withColumn("ts", coalesce(get(parts, lit(1)), lit("Print")))
      .select(
        when(lower(col("ts")).contains("hardcover"), "Hardcover")
          .when(lower(col("ts")).contains("audiobook"), "Audiobook")
          .when(col("ts").rlike("(?i)e-?book") || col("title").rlike("(?i)e-?book"), "E-Book")
          .when(col("ts").rlike("(?i)paperback|print"), "Print")
          .otherwise("Print").as("bt"))
    assert(out.head.getString(0) == "Hardcover")
  }

  test("q32: percent strip, string fillna, and single-pass >1 => /100") {
    val rows = SparkEntry.queries("q32_rate_repair")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), r.getDouble(3))).toMap
    rows.foreach { case (k, (raw, repaired)) =>
      val expected = (k % 8) match {
        case 0 => 0.25        // '25%'  -> 25 -> /100
        case 1 => 0.15        // '0.15'
        case 2 => 0.15        // '15'   -> /100
        case 3 => 0.15        // NULL   -> fillna '0.15'
        case 4 => 1.0         // '100%' -> 100 -> /100
        case 5 => 0.5         // '0.5%' -> 0.5, NOT >1: % sign != percent units
        case 6 => 1.5         // '150%' -> 150 -> /100 ONCE (not to fixpoint)
        case 7 => 1.0         // '1'    -> not strictly > 1
      }
      assert(repaired == expected, s"part $k raw=$raw: got $repaired want $expected")
      if (k % 8 == 3) assert(raw.isEmpty, s"part $k should synthesize NULL")
    }
  }

  test("q33: each child table independently conserves rows and 0..n-1 indices") {
    val out = SparkEntry.queries("q33_sibling_flatten")(spark, sfDir)
      .localCheckpoint()
    val li = Tables.lineitem(spark, sfDir)
    assert(out.filter(col("child") === "line_item").count() == li.count())
    assert(out.filter(col("child") === "refund").count() ==
      li.filter(col("l_returnflag") === "R").count())
    // Positional indices are dense per (order, child): max = count-1, min = 0.
    val bad = out.groupBy("order_key", "child")
      .agg(count(lit(1)).as("n"), min("item_index").as("lo"), max("item_index").as("hi"))
      .filter(col("lo") =!= 0 || col("hi") =!= col("n") - 1)
    assert(bad.isEmpty, "indices must be dense 0..n-1 within each child table")
    // Refund part_key is the tagged union's null slot; line items carry keys.
    assert(out.filter(col("child") === "refund" && col("part_key").isNotNull).isEmpty)
    assert(out.filter(col("child") === "line_item" && col("part_key").isNull).isEmpty)
  }
}
