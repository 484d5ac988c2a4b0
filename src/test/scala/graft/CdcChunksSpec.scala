package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.CdcChunks

/** E3/E4: content-defined chunking contracts — the chunks partition the
  * payload exactly, interior lengths respect [MIN, MAX], duplicated content
  * at DIFFERENT byte offsets re-synchronizes to identical chunk hashes (the
  * property fixed frames lack), and the codegen path equals interpreted
  * eval. */
class CdcChunksSpec extends SparkSpec {

  private def chunksOf(payload: Array[Byte]): Seq[(Int, Int)] = {
    val arr = CdcChunks.compute(payload)
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getInt(0), r.getInt(1))
    }
  }

  test("chunks partition the payload exactly, with bounded interior lengths") {
    val rnd = new Random(7)
    for (n <- Seq(0, 1, 15, 16, 17, 255, 256, 257, 4096, 10000)) {
      val payload = Array.fill(n)(rnd.nextInt(256).toByte)
      val cs = chunksOf(payload)
      assert(cs.nonEmpty)
      // Exact cover: starts at 0, contiguous, sums to n.
      assert(cs.head._1 == 0)
      cs.sliding(2).foreach {
        case Seq((o1, l1), (o2, _)) => assert(o1 + l1 == o2)
        case _ =>
      }
      assert(cs.last._1 + cs.last._2 == n)
      // Interior chunks (all but the tail) cut inside [16, 256].
      cs.dropRight(1).foreach { case (_, l) => assert(l >= 16 && l <= 256, s"len $l") }
      assert(cs.last._2 <= 256)
    }
  }

  test("duplicated content at different offsets re-syncs to the same chunks") {
    val rnd = new Random(11)
    val shared = Array.fill(2000)(rnd.nextInt(256).toByte)
    val prefixA = Array.fill(333)(rnd.nextInt(256).toByte)
    val prefixB = Array.fill(777)(rnd.nextInt(256).toByte)
    def hashes(payload: Array[Byte]): Seq[String] =
      chunksOf(payload).map { case (o, l) =>
        java.util.Arrays.hashCode(payload.slice(o, o + l)).toString
      }
    val hA = hashes(prefixA ++ shared).toSet
    val hB = hashes(prefixB ++ shared).toSet
    // The rolling hash depends on ≤64 prior bytes, so boundaries inside the
    // shared region re-align after a resync window; most of its ~30 chunks
    // must be common to both payloads despite the different offsets.
    val common = hA.intersect(hB)
    assert(common.size >= 15, s"expected resync, got ${common.size} shared chunks")
    // Control: fixed-size framing at these offsets would share NOTHING —
    // verify the offsets really are misaligned (different prefix lengths).
    assert(prefixA.length != prefixB.length)
  }

  test("codegen path equals interpreted compute, and mm03/mm04 hold corpus-wide") {
    val s = spark
    import s.implicits._
    val viaPlan = Seq("alpha bravo charlie " * 50).toDF("text")
      .select(CdcChunks.cdcChunks(col("text").cast("binary")).as("chunks"))
      .select(explode(col("chunks")).as("c")).select("c.off", "c.len", "c.md5")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSeq
    val payload = ("alpha bravo charlie " * 50).getBytes("UTF-8")
    val direct = chunksOf(payload)
    assert(viaPlan.map(t => (t._1, t._2)) == direct)
    // The emitted hash IS md5 of the chunk bytes.
    viaPlan.foreach { case (off, len, h) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(payload, off, len)
      assert(h == md.digest().map("%02x".format(_)).mkString)
    }

    val mm03 = SparkEntry.queries("mm03_cdc_chunks")(spark, sfDir).localCheckpoint()
    // Per-doc chunk lengths must sum to the payload size.
    val bad = mm03.groupBy("doc_id").agg(sum("len").as("total"))
      .join(Tables.documents(spark, sfDir)
        .select(col("doc_id"), octet_length(col("text").cast("binary")).as("n")), "doc_id")
      .filter(col("total") =!= col("n"))
    assert(bad.isEmpty, "chunk lengths must cover each payload exactly")
    // The corpus' planted near-dups must surface as duplicated chunks.
    val dups = SparkEntry.queries("mm04_chunk_dedup")(spark, sfDir)
      .filter(col("is_dup")).count()
    assert(dups > 0, "near-dup documents must share content-defined chunks")
  }
}
