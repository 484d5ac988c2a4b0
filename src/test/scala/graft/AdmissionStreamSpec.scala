package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.AdmissionStream

/** F9: streaming admission — streamed decisions must equal the batch
  * operator's on identical rows, across batches and replays.
  */
case class SrcDoc(doc_id: Long, ts: Timestamp, source: String, text: String)

class AdmissionStreamSpec extends SparkSpec {

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  private val good = "the considerable institution maintained a wonderful library of " +
    "carefully preserved manuscripts and the researchers catalogued everything " +
    "during the extended winter season in the northern countryside"
  private val short = "too short"
  private val symbols = "@@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( )))) ____ ++++ " +
    "@@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( )))) ____ ++++ !!!! ~~~~"

  private def docs(ids: Seq[Long]): Seq[SrcDoc] = ids.map { i =>
    val text = (i % 3) match {
      case 0 => good + s" extra token number $i"
      case 1 => short
      case _ => symbols
    }
    SrcDoc(i, ts((i % 50).toInt), if (i % 2 == 0) "web" else "books", text)
  }

  test("F9 streamed admission equals the batch decision on the same rows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val input = MemoryStream[SrcDoc]
    val q = AdmissionStream.decide(input.toDF())
      .writeStream.format("memory").queryName("f9_out").outputMode("append").start()
    val batch1 = docs(1L to 30L)
    val batch2 = docs(31L to 60L)
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("f9_out")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val batch = AdmissionStream.decide((batch1 ++ batch2).toDF())
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    // the gate actually separates: some admitted, some quality-failed,
    // some sampled out — otherwise this spec proves nothing
    val byReason = spark.table("f9_out")
      .groupBy("pass", "sampled").count().collect()
    assert(byReason.length > 1, s"degenerate test corpus: ${byReason.toSeq}")
    assert(spark.table("f9_out").filter(col("admitted")).count() > 0)
  }

  test("F9 admission is deterministic: replaying rows yields identical decisions") {
    val s = spark
    import s.implicits._
    val rows = docs(1L to 40L)
    val once = AdmissionStream.admitted(rows.toDF()).collect().map(_.toSeq).toSet
    val again = AdmissionStream.admitted(rows.toDF()).collect().map(_.toSeq).toSet
    assert(once == again && once.nonEmpty)
    // admitted ⊆ pass ∩ sampled, and every admitted doc clears the bucket rate
    val full = AdmissionStream.decide(rows.toDF())
    assert(full.filter(col("admitted") && (!col("pass") || !col("sampled"))).isEmpty)
    assert(full.filter(col("admitted") && col("bucket") >= col("rate_bp")).isEmpty)
  }
}
