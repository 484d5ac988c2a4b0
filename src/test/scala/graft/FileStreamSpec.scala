package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventsStream

/** F1 via the real file source: events parquet landing in a directory is
  * picked up by readStream with the declared schema and windowed exactly as
  * the batch mirror computes on the same files. */
class FileStreamSpec extends SparkSpec {

  test("fromFiles windowedCounts over landed parquet equals batch") {
    val dir = Files.createTempDirectory("graft-stream").toString
    // Land two "micro-batches" of event files (nanos ts normalized to
    // TIMESTAMP so the stream schema matches a production landing zone).
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), (col("ts") / 1e9).cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
    ev.filter(col("event_id") % 2 === 0).write.parquet(s"$dir/batch0")
    ev.filter(col("event_id") % 2 === 1).write.parquet(s"$dir/batch1")

    val stream = EventsStream.fromFiles(spark, s"$dir/batch*")
    val query = EventsStream.windowedCounts(stream)
      .writeStream.format("memory").queryName("file_windowed")
      .outputMode(OutputMode.Complete).start()
    try query.processAllAvailable()
    finally query.stop()

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("window_start", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    val streamed = rows(spark.table("file_windowed"))
    val batch = rows(EventsStream.windowedCounts(ev.select("ts", "event_type", "value")))
    assert(streamed.nonEmpty && streamed.size == batch.size)
    streamed.zip(batch).foreach { case ((sw, st, sn, sv), (bw, bt, bn, bv)) =>
      assert(sw == bw && st == bt && sn == bn, s"group mismatch: $sw/$st vs $bw/$bt")
      // double sums may differ in the last ulp across partition add orders
      assert(math.abs(sv - bv) <= 1e-9 * math.max(1.0, math.abs(bv)))
    }
  }
}
