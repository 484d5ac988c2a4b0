package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Properties of the round-7 operators: q57 expectations audit, dd17
  * paragraph-dedup apply, mm10 shard packing. Semantic invariants only —
  * the DuckDB hash-compare pins exact values.
  */
class Round7OpsSpec extends SparkSpec {

  // ------------------------------------------------------ q57 expectations
  test("q57: one row per named check, status consistent, RI checks match brute force") {
    val a = etl.RelationalCore.q57.build(spark, sfDir).cache()
    assert(a.count() == 9)
    assert(a.select("check_name").distinct().count() == 9)
    // status is derived, never contradicts the count
    assert(a.filter(col("violations") === 0 && col("status") =!= "pass").isEmpty)
    assert(a.filter(col("violations") > 0 && col("status") =!= "fail").isEmpty)
    assert(a.filter(col("violations") < 0 || col("scanned") <= 0).isEmpty)

    val o = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    def check(name: String): (Long, Long) = {
      val r = a.filter(col("check_name") === name).head()
      (r.getAs[Long]("scanned"), r.getAs[Long]("violations"))
    }
    // referential checks against the anti-join brute force
    val (chlScan, chlViol) = check("orders.has_lineitems")
    assert(chlScan == o.count())
    assert(chlViol == o.join(li.select("l_orderkey"),
      col("o_orderkey") === col("l_orderkey"), "left_anti").count())
    val (orScan, orViol) = check("lineitem.l_orderkey.ref_orders")
    assert(orScan == li.count())
    assert(orViol == li.join(o.select("o_orderkey"),
      col("l_orderkey") === col("o_orderkey"), "left_anti").count())
    // uniqueness checks against count-distinct brute force
    val (_, pkViol) = check("lineitem.pk.unique")
    assert(pkViol == li.count() -
      li.select("l_orderkey", "l_linenumber").distinct().count())
    val (_, okViol) = check("orders.o_orderkey.unique")
    assert(okViol == o.count() - o.select("o_orderkey").distinct().count())
    a.unpersist()
  }

  // -------------------------------------------------- dd17 paragraph apply
  test("dd17: agrees with dd10's per-doc damage report; kept windows = distinct hashes") {
    val ap = operators.Dedup.dd17.build(spark, sfDir).cache()
    val st = operators.Dedup.dd10.build(spark, sfDir)
    // same doc set, same window counts, kept = total - dups (the two
    // operators share segmentation and keeper rule, so they cannot drift)
    val j = ap.select(col("doc_id"), col("n_paras").as("ap_paras"), col("n_kept"))
      .join(st.select(col("doc_id"), col("n_paras").as("st_paras"), col("n_dups")), "doc_id")
      .cache()
    assert(j.count() == ap.count() && ap.count() == st.count())
    assert(j.filter(col("ap_paras") =!= col("st_paras")).isEmpty)
    assert(j.filter(col("n_kept") =!= col("ap_paras") - col("n_dups")).isEmpty)
    // globally, exactly one copy of every distinct window survives
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(functions.TextPrep.clean(col("text")), " ").as("t"))
    val distinctWindows = docs.select(explode(transform(
        sequence(lit(0), (ceil(size(col("t")) / lit(20.0)) - 1).cast("int")),
        i => array_join(slice(col("t"), i * 20 + 1, lit(20)), " "))).as("w"))
      .select("w").distinct().count()
    assert(ap.agg(sum("n_kept")).head().getLong(0) == distinctWindows)
    j.unpersist(); ap.unpersist()
  }

  test("dd17: an untouched document's clean_text is its cleaned original") {
    val ap = operators.Dedup.dd17.build(spark, sfDir)
    val full = ap.filter(col("n_kept") === col("n_paras"))
    assert(full.count() > 0) // corpus has unique docs
    val orig = Tables.documents(spark, sfDir)
      .select(col("doc_id"), functions.TextPrep.clean(col("text")).as("c"))
    assert(full.join(orig, "doc_id").filter(col("clean_text") =!= col("c")).isEmpty)
  }

  // ---------------------------------------------------- mm10 shard packing
  test("mm10: manifest conserves payloads and bytes; spans never interleave") {
    val m = multimodal.Multimodal.mm10.build(spark, sfDir).cache()
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        octet_length(col("text").cast("binary")).cast("long").as("b"))
    assert(m.agg(sum("n_payloads")).head().getLong(0) == docs.count())
    assert(m.agg(sum("shard_bytes")).head().getLong(0) ==
      docs.agg(sum("b")).head().getLong(0))
    assert(m.filter(col("shard_bytes") <= 0 || col("n_payloads") <= 0).isEmpty)
    assert(m.filter(col("first_doc") > col("last_doc")).isEmpty)
    // doc spans are disjoint and ordered with shard_id within each source
    val w = Window.partitionBy("source").orderBy("shard_id")
    assert(m.withColumn("prev_last", lag(col("last_doc"), 1).over(w))
      .filter(col("prev_last").isNotNull && col("first_doc") <= col("prev_last"))
      .isEmpty)
    // every non-final shard closed because its payloads crossed the budget:
    // cumulative bytes through shard k reach past (k's) boundary
    val cum = m.withColumn("cume", sum(col("shard_bytes")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("maxShard", max(col("shard_id")).over(Window.partitionBy("source")))
    assert(cum.filter(col("shard_id") < col("maxShard") &&
      col("cume") < (col("shard_id") + 1) * 8192).isEmpty)
    m.unpersist()
  }
}
