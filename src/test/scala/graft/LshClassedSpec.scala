package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Exact-collapse-first LSH (the mass-duplicate defense): lshPairsClassed
  * must equal lshPairsFrom row-for-row on every corpus — the classed plan
  * is a cost choice, never a semantics choice — and the router must pick
  * the plan the corpus's duplicate profile calls for.
  */
class LshClassedSpec extends SparkSpec {

  private def realSh: DataFrame =
    Dedup.docShingles(spark, sfDir).localCheckpoint()

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  /** Plants mass-dup classes: every doc with doc_id % 5 == 0 has its
    * shingle set REPLACED by one of `k` class contents (the shingle sets of
    * the k lowest real docs), with a reversed-order copy for every other
    * member — same set, different array order, which the signature, bands,
    * and jaccard must all be blind to. Also plants three empty-set docs. */
  private def planted(k: Int): DataFrame = {
    val base = realSh
    val classContent = base.orderBy("doc_id").limit(k)
      .select(col("doc_id").as("cls"), col("shs").as("content"))
      .withColumn("cls", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("cls")) - 1)
    val massDup = base
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), pmod(col("doc_id") / 5, lit(k)).cast("int").as("cls"))
      .join(broadcast(classContent), "cls")
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 0, reverse(col("content")))
          .otherwise(col("content")).as("shs"))
    val untouched = base.filter(col("doc_id") % 5 =!= 0).select("doc_id", "shs")
    val empties = spark.range(3).select(
      (col("id") + 900000000L).as("doc_id"),
      array().cast("array<string>").as("shs"))
    untouched.unionByName(massDup).unionByName(empties).localCheckpoint()
  }

  test("classed == default on the real corpus (incidental small dup classes)") {
    val sh = realSh
    assert(pairSet(Dedup.lshPairsClassed(sh)) == pairSet(Dedup.lshPairsFrom(sh)))
  }

  test("classed == default on a planted mass-dup corpus (reversed-order members, empty sets)") {
    val sh = planted(k = 4)
    val classed = pairSet(Dedup.lshPairsClassed(sh))
    val default = pairSet(Dedup.lshPairsFrom(sh))
    assert(classed == default)
    // the planted classes really are mass-dup: intra pairs dominate
    val nPlanted = sh.filter(col("doc_id") % 5 === 0 && col("doc_id") < 900000000L).count()
    assert(nPlanted > 20)
    // every intra-class pair is present at jaccard 1.0
    assert(classed.count(_._3 == 1.0) >= (nPlanted / 4) * ((nPlanted / 4 - 1) / 2))
    // empty-set docs pair with nothing in either plan
    assert(!classed.exists(p => p._1 >= 900000000L || p._2 >= 900000000L))
  }

  test("router: default on the real corpus, classed when mass-dup classes appear") {
    // real corpus: incidental dup classes only — far below the threshold
    val realIntra = Dedup.docShingles(spark, sfDir)
      .select(xxhash64(array_sort(col("shs"))).as("h"))
      .groupBy("h").agg(count(lit(1)).as("m"))
      .agg(coalesce(sum(expr("m * (m - 1) DIV 2")), lit(0L))).head().getLong(0)
    assert(realIntra < Dedup.lshClassedMinIntraPairs)
    // router output equals both plans wherever it routes
    val sh = planted(k = 2)
    assert(pairSet(Dedup.lshPairsAuto(sh)) == pairSet(Dedup.lshPairsFrom(sh)))
  }
}
