package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.DecontamStream

case class TrainDoc(doc_id: Long, text: String)

/** F11: streaming decontamination — streamed flags must equal the batch
  * operator's on identical rows, planted leaks must be caught, clean docs
  * must pass, and replays must never flip a verdict.
  */
class DecontamStreamSpec extends SparkSpec {

  private val evalText = "the quick brown fox jumps over the lazy dog while " +
    "seventeen astronomers catalogued the meteor shower above the quiet harbor town"
  private val cleanText = "completely unrelated prose about cooking seasonal " +
    "vegetables in a cast iron pan with garlic butter and fresh rosemary sprigs " +
    "until everything caramelizes evenly"
  // contains an 8-token span lifted verbatim from the eval split
  private val leakedText = "introductory padding words first then seventeen " +
    "astronomers catalogued the meteor shower above the quiet harbor town and " +
    "a long original tail that keeps the document from being a pure copy"

  private def mkEval = {
    val s = spark
    import s.implicits._
    DecontamStream.evalGrams(Seq((900L, evalText)).toDF("doc_id", "text"))
  }

  test("F11 streamed flags equal the batch operator's; planted leak caught") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val eval = mkEval
    val outDir = Files.createTempDirectory("graft-f11").toString
    val ckDir = Files.createTempDirectory("graft-f11-ck").toString

    val input = MemoryStream[TrainDoc]
    val q = DecontamStream.sink(input.toDF(), eval, outDir, ckDir)
    val b1 = Seq(TrainDoc(1, cleanText), TrainDoc(2, leakedText))
    val b2 = Seq(TrainDoc(3, cleanText + " with an extra token"), TrainDoc(4, evalText))
    try {
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(outDir)
    val batch = DecontamStream.flags((b1 ++ b2).toDF("doc_id", "text"), eval)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)

    val byId = streamed.select("doc_id", "contaminated").as[(Long, Boolean)].collect().toMap
    assert(!byId(1L) && !byId(3L))          // clean docs pass
    assert(byId(2L) && byId(4L))            // partial leak and full copy both flagged
  }

  test("F11 bloom-gated flags equal plain flags bit-for-bit") {
    val s = spark
    import s.implicits._
    val eval = mkEval
    val bf = DecontamStream.evalBloom(eval)
    val rows = Seq(TrainDoc(20, cleanText), TrainDoc(21, leakedText),
      TrainDoc(22, evalText), TrainDoc(23, cleanText + " trailing variance")).toDF("doc_id", "text")
    val plain = DecontamStream.flags(rows, eval)
    val gated = DecontamStream.flagsBloom(rows, eval, bf)
    assert(plain.exceptAll(gated).isEmpty && gated.exceptAll(plain).isEmpty,
      "bloom gate changed the decontamination verdicts")
    assert(plain.count() == 4)
  }

  test("F11 replayed batch appends exact duplicates only — no verdict flips") {
    val s = spark
    import s.implicits._
    val eval = mkEval
    val rows = Seq(TrainDoc(10, cleanText), TrainDoc(11, leakedText)).toDF("doc_id", "text")
    val once = DecontamStream.flags(rows, eval)
    val twice = DecontamStream.flags(rows, eval)
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }
}
