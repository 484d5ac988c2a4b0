package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.IncrementalDedupStream

case class IncDoc(doc_id: Long, text: String)

/** F14: streaming incremental dedup — streamed verdicts must equal the dd15
  * batch operator's on the identical corpus split, regardless of how the
  * increment is cut into micro-batches, and replays must never flip one.
  */
class IncrementalDedupStreamSpec extends SparkSpec {

  test("F14 streamed verdicts equal dd15's batch verdicts on the same split") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val ix = IncrementalDedupStream.index(docs.filter(col("doc_id") % 5 =!= 4))
    val incRows = docs.filter(col("doc_id") % 5 === 4)
      .as[(Long, String)].collect().map { case (i, t) => IncDoc(i, t) }
    assert(incRows.length > 1, "increment must be non-trivial")
    val (b1, b2) = incRows.splitAt(incRows.length / 2)

    val outDir = Files.createTempDirectory("graft-f14").toString
    val ckDir = Files.createTempDirectory("graft-f14-ck").toString
    val input = MemoryStream[IncDoc]
    val q = IncrementalDedupStream.sink(input.toDF(), ix, outDir, ckDir)
    try {
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(outDir)
    val batch = operators.Dedup.dd15.build(spark, sfDir)
    assert(streamed.count() == incRows.length)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "ingest gate and nightly batch must agree row for row")
  }

  test("F14 planted copies: an exact copy and a fresh doc get the right verdicts") {
    val s = spark
    import s.implicits._
    val base = Seq(
      IncDoc(1, "alpha beta gamma delta epsilon zeta eta theta"),
      IncDoc(2, "one two three four five six seven eight nine ten")).toDF()
    val ix = IncrementalDedupStream.index(base)
    val arriving = Seq(
      IncDoc(10, "alpha beta gamma delta epsilon zeta eta theta"), // copy of 1
      IncDoc(11, "completely novel content about tidal pools and limpets")).toDF()
    val v = IncrementalDedupStream.verdicts(arriving, ix).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("verdict"), Option(r.getAs[Any]("match_id")))).toMap
    assert(v(10L)._1 == "exact_dup" && v(10L)._2.contains(1L))
    assert(v(11L)._1 == "new" && v(11L)._2.isEmpty)
  }

  test("F14 durable index: save/load round-trip yields identical verdicts") {
    // The deployment path: localCheckpoint blocks are not fault-tolerant,
    // so a long-running ingest gate stores the index as parquet. Verdicts
    // computed against the reloaded index must equal the in-memory ones.
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val ix = IncrementalDedupStream.index(docs.filter(col("doc_id") % 5 =!= 4))
    val dir = Files.createTempDirectory("graft-f14-ix").toString
    IncrementalDedupStream.saveIndex(ix, dir)
    val reloaded = IncrementalDedupStream.loadIndex(spark, dir)
    val inc = docs.filter(col("doc_id") % 5 === 4)
    val mem = IncrementalDedupStream.verdicts(inc, ix)
    val dur = IncrementalDedupStream.verdicts(inc, reloaded)
    assert(mem.exceptAll(dur).isEmpty && dur.exceptAll(mem).isEmpty,
      "verdicts against the durable index must equal the checkpointed index's")
  }

  test("F14 verdicts are a pure function — replay produces identical rows") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val ix = IncrementalDedupStream.index(docs.filter(col("doc_id") % 5 =!= 4))
    val inc = docs.filter(col("doc_id") % 5 === 4)
    val once = IncrementalDedupStream.verdicts(inc, ix)
    val twice = IncrementalDedupStream.verdicts(inc, ix)
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }
}
