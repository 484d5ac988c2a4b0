package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** D20 tx20: span-corruption preprocessing. The DuckDB oracle pins the full
  * output; these tests pin the CONTRACT against an independent driver-side
  * reimplementation, plus the invariants a trainer relies on: token
  * conservation (input content + target content == original tokens),
  * sentinel pairing (input sentinel n ↔ target sentinel n, each exactly
  * once), and determinism.
  */
class SpanCorruptionSpec extends SparkSpec {

  private def reference(docId: Long, text: String): (String, String, Long, Long) = {
    val toks = text.toLowerCase.replaceAll("[^a-z0-9\\s]", " ")
      .replaceAll("\\s+", " ").trim.split(" ", -1).toSeq
    val masked = toks.indices.map(i => ((i + docId) % 7) < 2)
    val in = new StringBuilder; val tgt = new StringBuilder
    var span = -1L; var nMasked = 0L
    for (i <- toks.indices) {
      if (!masked(i)) { if (in.nonEmpty) in += ' '; in ++= toks(i) }
      else {
        nMasked += 1
        val start = i == 0 || !masked(i - 1)
        if (start) {
          span += 1
          if (in.nonEmpty) in += ' '; in ++= s"<extra_id_$span>"
          if (tgt.nonEmpty) tgt += ' '; tgt ++= s"<extra_id_$span> ${toks(i)}"
        } else { tgt += ' '; tgt ++= toks(i) }
      }
    }
    (in.toString, tgt.toString, span + 1, nMasked)
  }

  test("tx20 equals an independent reimplementation on every sf0.001 document") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextAnalysis.tx20.build(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.keySet == docs.keySet)
    docs.foreach { case (id, text) =>
      assert(got(id) == reference(id, text), s"doc $id diverged")
    }
  }

  test("tx20 invariants: token conservation and sentinel pairing") {
    val sentinel = "<extra_id_\\d+>".r
    val nToks = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(split(graft.functions.TextPrep.clean(col("text")), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    TextAnalysis.tx20.build(spark, sfDir).collect().foreach { r =>
      val (id, in, tgt, nSpans, nMasked) =
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4))
      val inSent = sentinel.findAllIn(in).toSeq
      val tgtSent = sentinel.findAllIn(tgt).toSeq
      assert(inSent == tgtSent && inSent.length == nSpans,
        s"doc $id: sentinels must pair in order")
      assert(inSent == (0L until nSpans).map(n => s"<extra_id_$n>"),
        s"doc $id: sentinels must number densely from 0")
      // token conservation: non-sentinel content splits exactly into
      // (input keeps unmasked) + (target carries masked)
      val inToks = in.split(" ").count(t => t.nonEmpty && !sentinel.matches(t))
      val tgtToks = tgt.split(" ").count(t => t.nonEmpty && !sentinel.matches(t))
      assert(tgtToks.toLong == nMasked, s"doc $id: target must carry the masked tokens")
      assert(inToks.toLong + nMasked == nToks(id),
        s"doc $id: kept + masked must equal the original token count")
    }
  }
}
