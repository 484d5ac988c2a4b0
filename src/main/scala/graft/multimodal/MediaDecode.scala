package graft.multimodal

import org.apache.spark.sql.Dataset

/** Typed per-partition media decode — the Scala analog of a pandas
  * `mapInPandas` batch UDF (SURVEY §2 E-series, decode path).
  *
  * Shape matters more than the stubbed codec: a real decoder (image/audio
  * libs are not in this container) is expensive to INITIALIZE, so the
  * idiomatic Spark plumbing is `mapPartitions` — one decoder instance per
  * partition, amortized over every row in it, never one per row. The stub
  * below stands exactly where `Decoder.open()` would; the schema, typed
  * Encoders, batch iteration, and fan-in/fan-out are the real article.
  *
  * Reference analog: the reference's per-row `np.select`/apply enrichment
  * (dw2_wc_increment.py) is this pattern's row-at-a-time ancestor.
  */
object MediaDecode {

  /** Input row: an opaque media payload plus its id. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Decoded output: typed metadata + a small feature vector. */
  final case class DecodedMedia(
      doc_id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      features: Array[Float])

  /** STUB decoder. A real implementation opens a codec here and parses the
    * header/stream; this deterministic fake derives the same fields from the
    * bytes so the pipeline is testable end-to-end. One instance per
    * PARTITION — construction is where codec init cost lives.
    */
  private final class StubDecoder {
    def decode(m: MediaRow): DecodedMedia = {
      val n = m.payload.length
      // ??? <- real codec call site (image header parse / audio probe).
      val width = n % 64 + 16
      val height = (n / 64) % 64 + 16
      val features = Array.tabulate(8) { i =>
        if (i < n) (m.payload(i) & 0xff).toFloat / 255f else 0f
      }
      DecodedMedia(m.doc_id, n.toLong, width, height, features)
    }
  }

  /** Decode a Dataset of media rows, one decoder per partition. */
  def decode(ds: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      val decoder = new StubDecoder // per-partition init, amortized
      rows.map(decoder.decode)
    }
  }
}
