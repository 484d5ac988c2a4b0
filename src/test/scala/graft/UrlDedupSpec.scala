package graft

import org.apache.spark.sql.functions._

import graft.operators.UrlDedup

/** dd21: canonicalization must collapse every synthesized spelling variant
  * (host case, utm params, trailing slash, fragment) of the same page to
  * ONE canonical URL, and the keep flag must mark exactly one fetch per
  * canonical group (the lowest doc_id).
  */
class UrlDedupSpec extends SparkSpec {
  import spark.implicits._

  test("variants collapse; exactly one keeper per canonical URL") {
    val got = UrlDedup.dd21.build(spark, sfDir)
      .select("doc_id", "url_canon", "n_fetches", "keep")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))

    // canonical URLs carry none of the variant noise
    got.foreach { case (_, u, _, _) =>
      assert(!u.contains("utm_"), s"tracking param survived: $u")
      assert(!u.contains("#"), s"fragment survived: $u")
      assert(!u.contains("/?"), s"trailing slash survived: $u")
      assert(u.startsWith("https://www.example.com/"), s"host not lowered: $u")
    }
    // exactly one keeper per group, and it is the minimum doc_id
    got.groupBy(_._2).foreach { case (u, rows) =>
      val keepers = rows.filter(_._4)
      assert(keepers.length == 1, s"$u has ${keepers.length} keepers")
      assert(keepers.head._1 == rows.map(_._1).min, s"$u keeper is not min doc_id")
      assert(rows.forall(_._3 == rows.length.toLong), s"$u group size drifted")
    }
    // the synthesis makes real duplicates: docs sharing a page slot
    // (doc_id % 997) under the same source collapse
    val docs = Tables.documents(spark, sfDir).select("doc_id", "source")
      .as[(Long, String)].collect()
    val expectGroups = docs.map { case (id, src) => (src, id % 997) }.distinct.length
    assert(got.map(_._2).distinct.length == expectGroups,
      "one canonical URL per (source, page-slot)")
    assert(got.count(_._4) == expectGroups)
    assert(got.length == docs.length, "every fetch is classified")
  }
}
