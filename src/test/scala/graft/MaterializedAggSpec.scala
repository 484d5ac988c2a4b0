package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{FileCow, MaterializedAgg, Versioned}

/** G20: incremental materialized-view maintenance from the G19 change
  * feed. The load-bearing claims: incremental == full recompute after any
  * DML mix (the q54 oracle pattern), emptied groups vanish, a no-op
  * refresh is a no-op, and the write-ahead-intent protocol survives the
  * publish-then-crash window WITHOUT double-counting (a replayed += is
  * not idempotent — the protocol is what makes it exactly-once).
  */
class MaterializedAggSpec extends SparkSpec {

  private def fresh(): (String, String) = {
    val d = Files.createTempDirectory("graft-ivm")
    (d.resolve("src").toString, d.resolve("view").toString)
  }

  private def mkSource(root: String): Unit = {
    val base = spark.range(1, 401).select(col("id"),
      (col("id") % 5).as("grp"), (col("id") * 10).as("v"))
    FileCow.create(spark, root, base.repartitionByRange(4, col("id")), Seq("id"))
  }

  private def recompute(root: String): Map[Long, (Long, Long)] =
    FileCow.read(spark, root).groupBy("grp")
      .agg(count(lit(1)).as("n_rows"), sum("v").as("sum_v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def view(viewRoot: String): Map[Long, (Long, Long)] =
    MaterializedAgg.read(spark, viewRoot)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("G20 refresh after a DML mix equals the full recompute; no-op refresh is a no-op") {
    val (src, vw) = fresh()
    mkSource(src)
    MaterializedAgg.initialize(spark, src, vw, Seq("grp"), Seq("v"))
    assert(view(vw) == recompute(src))

    // updates + inserts, a delete, an update — three source versions
    FileCow.merge(spark, src, spark.range(1, 21).select(col("id"),
      (col("id") % 5).as("grp"), lit(0L).as("v"))
      .unionByName(spark.range(1001, 1051).select(col("id"),
        lit(7L).as("grp"), col("id").as("v"))), Seq("id"))
    FileCow.delete(spark, src, col("id").between(100, 160))
    FileCow.update(spark, src, Seq("v" -> (col("v") + 1)), col("id") > 380 && col("id") < 401)

    val (from, to) = MaterializedAgg.refresh(spark, src, vw, Seq("id"), Seq("grp"), Seq("v"))
    assert(from == 1L && to == 4L)
    assert(view(vw) == recompute(src))

    val vBefore = Versioned.currentVersion(vw)
    assert(MaterializedAgg.refresh(spark, src, vw, Seq("id"), Seq("grp"), Seq("v")) == (4L, 4L))
    assert(Versioned.currentVersion(vw) == vBefore, "no-op refresh published nothing")
  }

  test("G20 a group whose last row is deleted vanishes from the view") {
    val (src, vw) = fresh()
    mkSource(src)
    MaterializedAgg.initialize(spark, src, vw, Seq("grp"), Seq("v"))
    FileCow.delete(spark, src, col("id") % 5 === 3) // kill group 3 entirely
    MaterializedAgg.refresh(spark, src, vw, Seq("id"), Seq("grp"), Seq("v"))
    assert(!view(vw).contains(3L))
    assert(view(vw) == recompute(src))
  }

  test("G20 publish-then-crash window recovers without double-counting") {
    val (src, vw) = fresh()
    mkSource(src)
    MaterializedAgg.initialize(spark, src, vw, Seq("grp"), Seq("v"))
    val markerBefore = new String(Files.readAllBytes(Paths.get(vw, "_applied")),
      StandardCharsets.UTF_8)

    FileCow.delete(spark, src, col("id") <= 50)
    val (_, to) = MaterializedAgg.refresh(spark, src, vw, Seq("id"), Seq("grp"), Seq("v"))

    // reconstruct the crash state: publish landed, finalize didn't —
    // marker rolled back, intent still on disk naming the applied interval
    Files.write(Paths.get(vw, "_applied"),
      markerBefore.getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(vw, "_intent"),
      to.toString.getBytes(StandardCharsets.UTF_8))

    // next refresh must FINALIZE (not re-apply v1→v2), then fold only v2→v3
    FileCow.update(spark, src, Seq("v" -> (col("v") * 2)), col("id") > 390)
    val (from2, to2) = MaterializedAgg.refresh(spark, src, vw, Seq("id"), Seq("grp"), Seq("v"))
    assert(from2 == to && to2 == to + 1)
    assert(view(vw) == recompute(src), "crash recovery double-counted or lost an interval")
    assert(!Files.exists(Paths.get(vw, "_intent")))

    // a STALE intent (crash before publish) is discarded, not applied
    Files.write(Paths.get(vw, "_intent"), "99".getBytes(StandardCharsets.UTF_8))
    assert(MaterializedAgg.refresh(spark, src, vw, Seq("id"), Seq("grp"), Seq("v"))
      == (to2, to2))
    assert(view(vw) == recompute(src))
  }
}
