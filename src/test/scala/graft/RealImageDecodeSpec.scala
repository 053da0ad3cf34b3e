package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaItem

/** Pins the REAL image-decode path of [[Multimodal.decodeFeatures]]:
  * payloads that are genuine PNG/BMP bytes (encoded in-test via the same
  * JDK `javax.imageio` that decodes them) must come back with their true
  * dimensions and pooled-luma features, while non-image payloads — the
  * shape of the whole synthetic corpus — must take the deterministic
  * fallback the DuckDB oracles check. */
class RealImageDecodeSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkTestSession.spark

  /** w×h image filled with one RGB color, encoded with the given format. */
  private def imageBytes(w: Int, h: Int, rgb: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb)
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, format, out), s"JDK has no $format writer")
    out.toByteArray
  }

  private def decode(items: Seq[MediaItem]): Map[Long, Multimodal.MediaFeatures] = {
    import spark.implicits._
    Multimodal.decodeFeatures(spark.createDataset(items))
      .collect().map(f => f.docId -> f).toMap
  }

  test("real PNG and BMP payloads decode to true dimensions and luma features") {
    val png = imageBytes(32, 16, 0xffffff, "png") // white → luma 1.0
    val bmp = imageBytes(8, 8, 0x000000, "bmp")   // black → luma 0.0
    val out = decode(Seq(
      MediaItem(1L, "image", png, png.length.toLong),
      MediaItem(2L, "image", bmp, bmp.length.toLong)))
    val white = out(1L)
    assert((white.width, white.height, white.nFrames) === ((32, 16, 1)))
    assert(white.features.length === 8)
    assert(white.features.forall(f => math.abs(f - 1.0f) < 1e-4f),
      s"white image must pool to luma 1.0: ${white.features.toSeq}")
    val black = out(2L)
    assert((black.width, black.height, black.nFrames) === ((8, 8, 1)))
    assert(black.features.forall(f => math.abs(f) < 1e-4f),
      s"black image must pool to luma 0.0: ${black.features.toSeq}")
  }

  test("per-strip pooling sees horizontal structure, not one global mean") {
    // left half red (luma 1/3), right half white (luma 1.0), 8 strips
    val w = 32; val h = 4
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, if (x < w / 2) 0xff0000 else 0xffffff)
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "png", out))
    val bytes = out.toByteArray
    val f = decode(Seq(MediaItem(3L, "image", bytes, bytes.length.toLong)))(3L).features
    assert(f.take(4).forall(v => math.abs(v - 1.0f / 3.0f) < 1e-3f),
      s"left strips must be red-luma 1/3: ${f.toSeq}")
    assert(f.drop(4).forall(v => math.abs(v - 1.0f) < 1e-3f),
      s"right strips must be white-luma 1.0: ${f.toSeq}")
  }

  test("non-image payloads keep the deterministic oracle-checked fallback") {
    // text bytes under mediaType=image (the corpus stand-in shape) AND a
    // real PNG mislabeled audio: both must take the fallback
    val text = "not an image at all".getBytes("UTF-8")
    val png = imageBytes(4, 4, 0x808080, "png")
    val out = decode(Seq(
      MediaItem(10L, "image", text, text.length.toLong),
      MediaItem(11L, "audio", png, png.length.toLong)))
    val t = out(10L)
    assert(t.width === (64L + text.length % 1217L).toInt)
    assert(t.height === (64L + (text.length * 31L) % 719L).toInt)
    assert(t.features(0) === (((10L * 31 + 0) * 2654435761L) % 1000L) / 1000.0f)
    val a = out(11L)
    assert(a.width === (64L + png.length % 1217L).toInt,
      "audio payloads must not take the image path")
  }
}
