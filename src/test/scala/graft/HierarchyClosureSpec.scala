package graft

import graft.etl.Dimensional

/** A59 q61: hierarchy closure by path doubling — pinned against an
  * independent driver-side chain walk (the recursion the operator refuses
  * to run row-at-a-time), plus the structural no-duplicates claim that
  * makes the doubling rewrite shuffle-free (no distinct anywhere).
  */
class HierarchyClosureSpec extends SparkSpec {

  test("q61 closure equals the driver-side recursive reference, no duplicate rows") {
    val got = Dimensional.q61.build(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    val keys = Tables.part(spark, sfDir).select("p_partkey")
      .collect().map(_.getLong(0)).toSet
    val expected = keys.iterator.flatMap { k =>
      Iterator.unfold((k, 0L)) { case (cur, s) =>
        if (cur < 10) None
        else { val a = cur / 10; Some(((k, a, s + 1), (a, s + 1))) }
      }
    }.toSet

    assert(got.length == got.toSet.size, "doubling emitted duplicate closure rows")
    assert(got.toSet == expected)
    // sanity: multi-step paths exist (the doubling rounds actually fired)
    assert(got.exists(_._3 >= 2))
  }

  test("q61 three doublings cover any chain the key space can produce") {
    // the synthesized hierarchy divides by 10 per level: depth ≤ log10(maxKey);
    // the operator unrolls to depth 8 ⇔ 10^8 keys — far beyond any test SF
    val maxKey = Tables.part(spark, sfDir).agg(org.apache.spark.sql.functions
      .max("p_partkey")).collect()(0).getLong(0)
    assert(math.log10(maxKey.toDouble) <= 8.0)
  }
}
