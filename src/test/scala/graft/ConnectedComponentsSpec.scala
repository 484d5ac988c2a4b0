package graft

import scala.collection.mutable
import scala.util.Random

/** Correctness proof for the large/small-star connected components engine:
  * cluster labels must equal driver-side union-find (component minimum) on
  * random graphs, and the round count must stay logarithmic — a 300-node
  * chain (diameter 300, far beyond any per-round propagation budget)
  * converges in a handful of star rounds. */
class ConnectedComponentsSpec extends SparkSpec {

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // Contract matches the engine: self-loops carry no information, and a
    // node appears in the output only if it touches a real edge.
    val real = edges.filter(e => e._1 != e._2)
    real.foreach { case (a, b) => union(a, b) }
    val nodes = real.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(x => x -> find(x)).toMap
  }

  private def check(edges: Seq[(Long, Long)]): Unit = {
    val s = spark
    import s.implicits._
    val got = operators.Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSeq.sorted
    val want = unionFind(edges.size, edges).toSeq
      .map { case (id, comp) => (id, comp, id == comp) }.sorted
    assert(got == want)
  }

  test("random graphs match driver-side union-find") {
    for (seed <- Seq(7, 8, 9)) {
      val rnd = new Random(seed)
      val edges = Seq.fill(120)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
        .filter { case (a, b) => a != b }
      check(edges)
    }
  }

  test("chain of diameter 300 converges (logarithmic rounds, no cap exit)") {
    // Labels shuffled so the minimum sits mid-chain — the worst case for
    // min-label propagation, routine for star rounds.
    val perm = new Random(42).shuffle((0L until 300L).toVector)
    val edges = perm.sliding(2).map(p => (p(0), p(1))).toSeq
    check(edges)
  }

  test("empty edge set yields empty clusters") {
    val s = spark
    import s.implicits._
    assert(operators.Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b")).isEmpty)
  }

  test("self-loops and duplicate edges are ignored") {
    check(Seq((1L, 2L), (2L, 1L), (3L, 3L), (2L, 5L), (7L, 6L)))
  }
}
