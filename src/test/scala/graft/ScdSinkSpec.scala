package graft

import java.nio.file.Files
import java.sql.Date

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.etl.Dimensional
import graft.streaming.ScdSink

/** F8: streaming SCD2 dimension maintenance — the streamed table must equal
  * the from-scratch rebuild over all observations delivered so far.
  */
case class Obs(custkey: Long, obs_date: Date, attr: String, seq: Long)

class ScdSinkSpec extends SparkSpec {

  private def d(s: String) = Date.valueOf(s)

  private def readDim(dir: String) =
    spark.read.parquet(dir).collect()
      .map(r => (r.getAs[Long]("custkey"), r.getAs[String]("attr"),
        r.getAs[Long]("version"), r.getAs[Date]("valid_from"),
        Option(r.getAs[Date]("valid_to")), r.getAs[Boolean]("is_current")))
      .sortBy(t => (t._1, t._3)).toSeq

  /** Oracle: full q36-style rebuild over the same observations. */
  private def rebuild(obs: Seq[Obs]) = {
    val s = spark
    import s.implicits._
    // same day-winner rule as the sink: max seq per (custkey, obs_date)
    val dayWinner = obs.groupBy(o => (o.custkey, o.obs_date))
      .map { case (_, os) => os.maxBy(_.seq) }.toSeq
    Dimensional.scd2(dayWinner.toDF()
      .select($"custkey", $"obs_date", $"attr")).collect()
      .map(r => (r.getAs[Long]("custkey"), r.getAs[String]("attr"),
        r.getAs[Long]("version"), r.getAs[Date]("valid_from"),
        Option(r.getAs[Date]("valid_to")), r.getAs[Boolean]("is_current")))
      .sortBy(t => (t._1, t._3)).toSeq
  }

  test("F8 streamed dimension equals the full rebuild across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val tableDir = Files.createTempDirectory("f8_dim").resolve("t").toString
    val ckptDir = Files.createTempDirectory("f8_ckpt").toString

    val b1 = Seq(
      Obs(1L, d("2024-01-01"), "LOW", 10L),
      Obs(1L, d("2024-01-05"), "HIGH", 11L),
      Obs(2L, d("2024-01-02"), "MED", 12L))
    val b2 = Seq(
      Obs(1L, d("2024-01-09"), "HIGH", 20L), // same attr: extends the run
      Obs(2L, d("2024-01-07"), "LOW", 21L), // change: closes MED, opens LOW
      Obs(3L, d("2024-01-03"), "MED", 22L)) // new key mid-stream

    val input = MemoryStream[Obs]
    val query = ScdSink.sink(input.toDF(), tableDir, ckptDir)
    try {
      input.addData(b1)
      query.processAllAvailable()
      assert(readDim(tableDir) == rebuild(b1))
      input.addData(b2)
      query.processAllAvailable()
      assert(readDim(tableDir) == rebuild(b1 ++ b2))
    } finally query.stop()

    // versions must be consecutive per key even though batch 2 went through
    // the incremental path with a version offset
    val dim = readDim(tableDir)
    assert(dim.filter(_._1 == 2L).map(_._3) == Seq(1L, 2L))
  }

  test("F8 applyBatch is replay-safe and handles same-day override and late data") {
    val s = spark
    import s.implicits._

    val tableDir = Files.createTempDirectory("f8_replay").resolve("t").toString
    val b1 = Seq(
      Obs(1L, d("2024-01-01"), "LOW", 1L),
      Obs(1L, d("2024-01-04"), "MED", 2L))
    ScdSink.applyBatch(b1.toDF(), tableDir)
    val after1 = readDim(tableDir)
    assert(after1 == rebuild(b1))

    // crash-recovery replay of the SAME batch: table unchanged
    ScdSink.applyBatch(b1.toDF(), tableDir)
    assert(readDim(tableDir) == after1)

    // same-day override: a louder seq on the open run's date wins the day
    val b2 = Seq(Obs(1L, d("2024-01-04"), "HIGH", 9L))
    ScdSink.applyBatch(b2.toDF(), tableDir)
    assert(readDim(tableDir) == rebuild(b1 ++ b2))
    // the corrected run replaced the open MED run at the same version slot
    assert(readDim(tableDir).map(_._2) == Seq("LOW", "HIGH"))

    // in-batch day-winner: two observations same key+day, max seq wins
    val b3 = Seq(
      Obs(1L, d("2024-01-08"), "LOW", 30L),
      Obs(1L, d("2024-01-08"), "MED", 31L))
    ScdSink.applyBatch(b3.toDF(), tableDir)
    assert(readDim(tableDir).filter(_._6).map(_._2) == Seq("MED"))

    // late data (older than the open run) is skipped, not spliced
    val before = readDim(tableDir)
    ScdSink.applyBatch(Seq(Obs(1L, d("2024-01-02"), "HIGH", 40L)).toDF(), tableDir)
    assert(readDim(tableDir) == before)
  }
}
