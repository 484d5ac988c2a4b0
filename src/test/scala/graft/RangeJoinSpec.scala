package graft

/** Losslessness proof for q30's bin bucketization: the binned equi-join plan
  * must equal the naive cross-join formulation — including windows straddling
  * a bin boundary and windows aligned exactly on one (the ≤2-bin explode's
  * edge cases). The sf0.001 events table has both shapes: purchase seconds
  * are uniform over a month, so wstart mod 3600 covers the straddle range.
  */
class RangeJoinSpec extends SparkSpec {

  private def results(binned: Boolean): Seq[(Long, Long, Long, Double)] =
    etl.Windowing.rangeJoinCounts(spark, sfDir, binned)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sorted

  test("binned range join equals the nested-loop baseline") {
    val want = results(binned = false)
    assert(want.nonEmpty, "baseline must produce attributed windows")
    assert(results(binned = true) == want)
  }
}
