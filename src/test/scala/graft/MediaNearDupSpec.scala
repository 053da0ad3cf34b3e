package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaItem

/** Perceptual media dedup: the 64-bit gradient signature must place a
  * lightly-edited REAL image within the banded join's hamming budget of
  * its original while keeping unrelated images far apart — the property
  * the whole `media_near_dups` operator rests on (the fallback byte path
  * is oracle-gated; this suite pins the live `javax.imageio` branch).
  */
class MediaNearDupSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkTestSession.spark

  private def pngBytes(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "png", out), "JDK has no png writer")
    out.toByteArray
  }

  /** 130×8 horizontal gradient (2 px per perceptual strip), optionally
    * with one strip overwritten white — a "small patch edit". */
  private def gradient(reversed: Boolean, patchedStrip: Int = -1): Array[Byte] = {
    val w = 130; val h = 8
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) {
      val g = if (reversed) (w - 1 - x) * 255 / (w - 1) else x * 255 / (w - 1)
      val v = if (patchedStrip >= 0 && x / 2 == patchedStrip) 0xffffff
              else (g << 16) | (g << 8) | g
      img.setRGB(x, y, v)
    }
    pngBytes(img)
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("a small patch edit of a real image stays within hamming 3 of its original") {
    val orig = gradient(reversed = false)
    val patched = gradient(reversed = false, patchedStrip = 30)
    val other = gradient(reversed = true)
    import spark.implicits._
    val sigs = Multimodal.perceptualHash(spark.createDataset(Seq(
        MediaItem(1L, "image", orig, orig.length.toLong),
        MediaItem(2L, "image", patched, patched.length.toLong),
        MediaItem(3L, "image", other, other.length.toLong))))
      .as[(Long, Long)].collect().toMap
    assert(hamming(sigs(1L), sigs(2L)) <= 3,
      s"patch edit drifted past the banded join's budget: " +
        s"${hamming(sigs(1L), sigs(2L))} bits")
    assert(hamming(sigs(1L), sigs(3L)) > 3,
      s"unrelated images must not collide: ${hamming(sigs(1L), sigs(3L))} bits")
    // the reversed gradient flips (almost) every gradient bit — proof the
    // signature came from decoded pixels, not from the payload bytes
    // (PNG bytes of the two gradients are near-identical in length but
    // wholly different content)
    assert(hamming(sigs(1L), sigs(3L)) >= 32, sigs.toString)
  }

  test("an exact image copy hashes identically; the byte fallback still covers non-images") {
    val orig = gradient(reversed = false)
    val text = "the same boilerplate sentence again and again".getBytes("UTF-8")
    import spark.implicits._
    val sigs = Multimodal.perceptualHash(spark.createDataset(Seq(
        MediaItem(1L, "image", orig, orig.length.toLong),
        MediaItem(2L, "image", orig.clone(), orig.length.toLong),
        MediaItem(3L, "audio", text, text.length.toLong))))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(3L) ===
      Multimodal.dHashCodePoints(new String(text, "UTF-8")),
      "non-image payloads must take the code-point dHash")
  }

  test("streamed media near-dup flags == batch media_near_dups, any micro-batching") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamMediaNearDup
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val sf = "/root/testdata/sf0.001"
    val batchFlagged = Multimodal.mediaNearDups(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(batchFlagged.nonEmpty, "gate corpus must contain planted media dups")

    // the batch gate table, replayed in doc_id order (ts follows id, so
    // the stream's first-seen original == the batch's smallest-id side)
    val base = 1700000000000L
    val items = Multimodal.mediaGateTable(spark, sf).collect()
      .sortBy(_.docId)
      .map(m => StreamMediaNearDup.MediaEvent(
        m.docId, m.mediaType, m.bytes, new java.sql.Timestamp(base + m.docId)))
      .toSeq

    val in = MemoryStream[StreamMediaNearDup.MediaEvent]
    val out = StreamMediaNearDup.candidates(
      in.toDS(), watermarkDelay = "0 seconds", retentionMs = 3600000L)
    val q = out.writeStream.format("memory").queryName("graft_media_stream")
      .outputMode("append").start()
    try {
      val (b1, rest) = items.splitAt(items.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      Seq(b1, b2, b3).foreach { b => in.addData(b); q.processAllAvailable() }
      val streamed = spark.table("graft_media_stream")
      val flagged = streamed.select("docId").collect().map(_.getLong(0)).toSet
      assert(flagged === batchFlagged,
        "at-ingestion media flags must equal the batch sweep's verdicts")
      // every verified hit respects the hamming budget and attributes an
      // earlier doc
      streamed.collect().foreach { r =>
        assert(r.getAs[Long]("hamming") <= 3L)
        assert(r.getAs[Long]("dupOf") < r.getAs[Long]("docId"))
      }
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS graft_media_stream")
    }
  }
}
