package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Corpus

/** Multimodal-column pipeline: image/audio/video payloads as opaque
  * `binary` columns with typed metadata (builder-prompt scale extension;
  * the reference has no media surface, so this is engine-native).
  *
  * The IMAGE decode is real — `javax.imageio` ships in the JDK
  * (PNG/BMP/GIF/JPEG), so decodable image payloads yield true dimensions
  * and pooled-luma features (`RealImageDecodeSpec`). Only audio/video —
  * codecs genuinely absent from this container — and undecodable
  * payloads (the synthetic corpus's text stand-in bytes) take the
  * deterministic fallback, which is what every media_* oracle checks.
  * Everything around the codec is real and tested either way: the
  * binary+metadata schema, the per-partition batched execution shape
  * (codec handle initialized once per partition, the `mapInPandas`/
  * `mapPartitions` production pattern), deterministic frame sampling via
  * binary slicing, and the metadata projection with its DuckDB oracle.
  *
  * Scale notes: payloads stay opaque bytes end-to-end — no shuffle ever
  * carries decoded frames; the decode is a narrow map over whatever
  * partitioning the scan provides, so at 100 TB it parallelizes per file
  * split with zero exchange. Metadata-only queries never touch `bytes`
  * (column pruning keeps the scan at the small columns).
  */
object Multimodal {

  final case class MediaItem(
      docId: Long,
      mediaType: String,
      bytes: Array[Byte],
      byteLen: Long)

  final case class MediaFeatures(
      docId: Long,
      mediaType: String,
      width: Int,
      height: Int,
      nFrames: Int,
      features: Array[Float])

  /** Opaque-payload media table derived from `documents`: the text bytes
    * stand in for an encoded media payload; modality cycles by id. */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaItem] = {
    import s.implicits._
    Corpus.documents(s, dir)
      .select(
        col("doc_id").as("docId"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("mediaType"),
        encode(col("text"), "UTF-8").as("bytes"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("byteLen"))
      .as[MediaItem]
  }

  /** Decoder with a REAL image path and a deterministic fallback.
    *
    * Image payloads go through `javax.imageio` first — the JDK ships
    * PNG/BMP/GIF/JPEG readers, no external codec needed — yielding true
    * dimensions and dim pooled luma features (mean brightness over
    * vertical strips: the simplest honest stand-in for a pooled visual
    * embedding). Payloads that are NOT a decodable image fall back to the
    * deterministic fake: that covers this container's entire synthetic
    * corpus (text bytes standing in for media) and the genuinely absent
    * codecs (audio/video), so every media_* oracle is fallback-shaped and
    * unchanged. A production swap replaces only [[fallback]] and the
    * audio/video branches; `RealImageDecodeSpec` pins the live path with
    * in-test PNG and BMP bytes. */
  private object Codec {
    def decode(item: MediaItem, dim: Int): MediaFeatures = {
      val img =
        if (item.mediaType == "image")
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(item.bytes))
          catch { case _: Throwable => null }
        else null
      if (img != null && img.getWidth > 0 && img.getHeight > 0) {
        val (w, h) = (img.getWidth, img.getHeight)
        val feats = new Array[Float](dim)
        var i = 0
        while (i < dim) {
          val x0 = i * w / dim
          val x1 = math.max(x0 + 1, (i + 1) * w / dim)
          var sum = 0.0; var n = 0
          var x = x0
          while (x < x1) {
            var y = 0
            while (y < h) {
              val rgb = img.getRGB(x, y)
              sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / (3.0 * 255.0)
              n += 1; y += 1
            }
            x += 1
          }
          feats(i) = if (n == 0) 0.0f else (sum / n).toFloat
          i += 1
        }
        MediaFeatures(item.docId, item.mediaType, w, h, nFrames = 1, feats)
      } else fallback(item, dim)
    }

    /** Deterministic fake for undecodable payloads — exact integer
      * arithmetic, recomputed by the DuckDB oracles. */
    def fallback(item: MediaItem, dim: Int): MediaFeatures = {
      val n = item.byteLen
      val feats = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        // stable per (doc, slot) pseudo-feature; a real codec returns
        // pooled embeddings here
        feats(i) = (((item.docId * 31 + i) * 2654435761L) % 1000L) / 1000.0f
        i += 1
      }
      MediaFeatures(item.docId, item.mediaType,
        width = (64L + n % 1217L).toInt,
        height = (64L + (n * 31L) % 719L).toInt,
        nFrames = ((n + 4095L) / 4096L).toInt,
        features = feats)
    }
  }

  /** Batched decode: one codec handle per partition, iterator-in /
    * iterator-out — the Spark-native equivalent of a `mapInPandas` batch
    * UDF. The plan stays a narrow map (no exchange). */
  def decodeFeatures(items: Dataset[MediaItem], dim: Int = 8): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      val codec = Codec // per-partition init point for heavier codecs
      it.map(codec.decode(_, dim))
    }
  }

  /** Deterministic frame sampling: fixed-stride binary slices of the
    * payload (a real pipeline slices at container keyframes; the plumbing
    * — binary substring on an opaque column, one row per frame — is
    * identical). */
  def frameSample(items: Dataset[MediaItem], frameBytes: Int = 1024, maxFrames: Int = 4): DataFrame =
    items.toDF()
      .select(col("docId"), col("mediaType"), col("byteLen"),
        explode(sequence(lit(0),
          least(lit(maxFrames - 1), ((col("byteLen") - 1) / frameBytes).cast("int"))))
          .as("frameIdx"),
        col("bytes"))
      .select(col("docId"), col("mediaType"), col("frameIdx"),
        expr(s"substring(bytes, frameIdx * $frameBytes + 1, $frameBytes)").as("frame"),
        octet_length(expr(s"substring(bytes, frameIdx * $frameBytes + 1, $frameBytes)"))
          .as("frameLen"))

  /** Metadata projection (oracle-checked): typed metadata of every media
    * item without ever reading the payload downstream — the fake decode's
    * deterministic dimensions restated declaratively. */
  def mediaMeta(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir).toDF()
      .select(col("docId").as("doc_id"), col("mediaType").as("media_type"),
        col("byteLen").as("byte_len"),
        (lit(64L) + col("byteLen") % 1217L).as("width"),
        (lit(64L) + (col("byteLen") * 31L) % 719L).as("height"),
        ((col("byteLen") + 4095L) / lit(4096L)).cast("long").as("n_frames"))

  val mediaMetaSql: String =
    """SELECT doc_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |  octet_length(encode(text)) AS byte_len,
      |  64 + octet_length(encode(text)) % 1217 AS width,
      |  64 + (octet_length(encode(text)) * 31) % 719 AS height,
      |  (octet_length(encode(text)) + 4095) // 4096 AS n_frames
      |FROM documents""".stripMargin

  /** Resize: downsample the opaque payload by an integer factor (a real
    * pipeline decodes, resamples pixels, re-encodes; the stub keeps every
    * factor-th byte — same per-partition batched execution shape, same
    * opaque-binary in/out contract, halved metadata dims). */
  def resize(items: Dataset[MediaItem], factor: Int = 2): Dataset[MediaItem] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        val src = m.bytes
        val out = new Array[Byte]((src.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = src(i * factor); i += 1 }
        MediaItem(m.docId, m.mediaType, out, out.length.toLong)
      }
    }
  }

  /** Oracle-checked resize query: the downsampled payload's length and the
    * halved dimensions, with the bytes projected away — the oracle derives
    * both arithmetically, pinning the stride indexing. */
  def mediaResize(s: SparkSession, dir: String): DataFrame =
    resize(mediaTable(s, dir)).toDF()
      .select(col("docId").as("doc_id"), col("mediaType").as("media_type"),
        col("byteLen").as("resized_len"))

  val mediaResizeSql: String =
    """SELECT doc_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |  (octet_length(encode(text)) + 1) // 2 AS resized_len
      |FROM documents""".stripMargin

  /** Oracle-checked feature-extraction query: drives the real batched
    * decode path ([[decodeFeatures]] — per-partition codec init, iterator
    * in/out) and exposes the per-slot features as scalar rows. The stub
    * codec's features are exact integer arithmetic, so the oracle
    * recomputes them — proving the mapPartitions plumbing delivers every
    * (doc, slot) exactly once with the right values, which is precisely
    * what a real-codec swap relies on. */
  def mediaFeatures(s: SparkSession, dir: String): DataFrame =
    decodeFeatures(mediaTable(s, dir)).toDF()
      .select(col("docId").as("doc_id"), col("mediaType").as("media_type"),
        posexplode(col("features")).as(Seq("slot", "feature")))
      .select(col("doc_id"), col("media_type"), col("slot").cast("long").as("slot"),
        round(col("feature").cast("double"), 4).as("feature"))

  val mediaFeaturesSql: String =
    """WITH f AS (
      |  SELECT doc_id,
      |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |    UNNEST(range(0, 8)) AS slot
      |  FROM documents)
      |SELECT doc_id, media_type, slot,
      |  round(CAST(((doc_id * 31 + slot) * 2654435761) % 1000 AS DOUBLE) / 1000.0, 4) AS feature
      |FROM f""".stripMargin

  /** Oracle-checked frame-sampling query: the binary-slicing plumbing of
    * [[frameSample]] (one row per sampled frame, fixed-stride substring of
    * the opaque payload) with the payload itself projected away. The
    * oracle derives each frame's length arithmetically — agreement proves
    * the slicing indexes are right without shipping blobs to DuckDB. */
  def mediaFrames(s: SparkSession, dir: String): DataFrame =
    frameSample(mediaTable(s, dir))
      .select(col("docId").as("doc_id"), col("mediaType").as("media_type"),
        col("frameIdx").cast("long").as("frame_idx"),
        col("frameLen").cast("long").as("frame_len"))

  val mediaFramesSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |    octet_length(encode(text)) AS byte_len
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, media_type, byte_len,
      |    UNNEST(range(0, LEAST(4, (byte_len - 1) // 1024 + 1))) AS frame_idx
      |  FROM m)
      |SELECT doc_id, media_type, frame_idx,
      |  LEAST(1024, byte_len - frame_idx * 1024) AS frame_len
      |FROM f""".stripMargin
}
