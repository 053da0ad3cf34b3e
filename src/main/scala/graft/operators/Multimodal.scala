package graft.operators

import graft.Materialize.MaterializeOps

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
      if (img != null && img.getWidth > 0 && img.getHeight > 0)
        MediaFeatures(item.docId, item.mediaType, img.getWidth, img.getHeight,
          nFrames = 1, lumaStrips(img, dim))
      else fallback(item, dim)
    }

    /** Mean luma over `dim` vertical strips — the pooled-grid pass shared
      * by [[decodeFeatures]] and the perceptual hash. */
    def lumaStrips(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
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
      feats
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

  // --------------------------------------------------------------------
  // Perceptual near-duplicate detection over the media payload itself —
  // the dedup family's missing modality (text and embeddings are covered
  // by Dedup/Similarity; nothing fingerprinted the binary column). A
  // multimodal training pipeline dedups images BEFORE captioning; the
  // shape below is the one that survives 100 TB: one narrow map computes
  // a 64-bit signature per item (no payload ever shuffles), then the
  // banded Hamming join reuses [[Dedup.simhashPairs]]'s 4×16-bit block
  // scheme — every pair within hamming distance 3 shares a block
  // (pigeonhole), so candidates come from an equi-join, never all-pairs.

  /** Number of strips in the perceptual grid: 65 strips → 64 adjacent
    * comparisons → a 64-bit dHash-style gradient signature. */
  private val phashStrips = 65

  /** dHash over unicode code points: the payload decoded as UTF-8, split
    * into 65 positional strips; bit i compares strip i's mean value to
    * strip i+1's via exact integer cross-multiplication (sum_i·n_{i+1} >
    * sum_{i+1}·n_i — no floating point, so DuckDB reproduces it bit-for-
    * bit). Gradient bits are LOCAL: corrupting a span inside one strip
    * flips at most the two bits touching it, which is what makes
    * near-copies land within the banded join's hamming budget. */
  private[graft] def dHashCodePoints(text: String): Long = {
    val sums = new Array[Long](phashStrips)
    val ns = new Array[Long](phashStrips)
    val total = text.codePointCount(0, text.length).toLong
    if (total == 0L) return 0L
    var j = 0L; var ci = 0
    while (ci < text.length) {
      val cp = text.codePointAt(ci)
      val s = ((j * phashStrips) / total).toInt
      sums(s) += cp; ns(s) += 1
      j += 1; ci += Character.charCount(cp)
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (sums(i) * ns(i + 1) > sums(i + 1) * ns(i)) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** 64-bit perceptual signature of one media item: decodable images go
    * through the REAL luma grid (65 strip means from `javax.imageio`
    * pixels, bit i = strip i brighter than strip i+1 — dHash proper);
    * everything else hashes the payload's code points ([[dHashCodePoints]]
    * — deterministic, byte-derived, oracle-recomputable). Both branches
    * are gradient hashes, so a near-copy of a payload — a small patch
    * edit, a re-encode with one region changed — flips only the bits
    * whose strips it touches. */
  private[graft] def pHashOf(item: MediaItem): Long = {
    val img =
      if (item.mediaType == "image")
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(item.bytes))
        catch { case _: Throwable => null }
      else null
    if (img != null && img.getWidth > 0 && img.getHeight > 0) {
      val m = Codec.lumaStrips(img, phashStrips)
      var sig = 0L
      var i = 0
      while (i < 64) { if (m(i) > m(i + 1)) sig |= (1L << i); i += 1 }
      sig
    } else dHashCodePoints(new String(item.bytes, java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Per-item signatures: a narrow map (per-partition codec init, same
    * contract as [[decodeFeatures]]) — payload bytes never shuffle. */
  def perceptualHash(items: Dataset[MediaItem]): DataFrame = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map(m => (m.docId, pHashOf(m)))
    }.toDF("doc_id", "phash")
  }

  /** Oracle-checked signature query over the plain media table. */
  def mediaPhash(s: SparkSession, dir: String): DataFrame =
    perceptualHash(mediaTable(s, dir))

  /** The shared CTE pipeline computing `sig(doc_id, phash)` from a named
    * `(doc_id, text)` relation — the oracle twin of [[dHashCodePoints]].
    * One row per code point, strip = (j·65)//L, exact cross-multiplied
    * gradient bits, bit 63's weight Long.MinValue (carry-free addition of
    * distinct powers of two — the [[Dedup.simhashSignaturesSql]]
    * convention). */
  private def phashCtesFor(rel: String): String = {
    val wt = (0 until 64)
      .map(j => s"WHEN $j THEN CAST(${1L << j} AS BIGINT)")
      .mkString(" ")
    s"""vals AS (
       |  SELECT doc_id, (j * $phashStrips) // L AS strip,
       |    unicode(substring(text, CAST(j AS INT) + 1, 1)) AS v
       |  FROM (SELECT doc_id, len(text) AS L, text,
       |          UNNEST(range(0, len(text))) AS j FROM $rel)),
       |strips AS (
       |  SELECT doc_id, strip, SUM(v) AS sv, COUNT(*) AS n
       |  FROM vals GROUP BY 1, 2),
       |grid AS (
       |  SELECT d.doc_id, r.i AS strip,
       |    COALESCE(st.sv, 0) AS sv, COALESCE(st.n, 0) AS n
       |  FROM (SELECT doc_id FROM $rel) d
       |  CROSS JOIN (SELECT UNNEST(range(0, $phashStrips)) AS i) r
       |  LEFT JOIN strips st ON st.doc_id = d.doc_id AND st.strip = r.i),
       |sig AS (
       |  SELECT g.doc_id,
       |    CAST(COALESCE(SUM(CASE WHEN g.sv * h.n > h.sv * g.n
       |      THEN CASE g.strip $wt END ELSE 0 END), 0) AS BIGINT) AS phash
       |  FROM grid g
       |  JOIN grid h ON h.doc_id = g.doc_id AND h.strip = g.strip + 1
       |  WHERE g.strip < 64
       |  GROUP BY 1)""".stripMargin
  }

  val mediaPhashSql: String =
    s"""WITH media AS (SELECT doc_id, text FROM documents),
       |${phashCtesFor("media")}
       |SELECT doc_id, phash FROM sig""".stripMargin

  /** The gate corpus for [[mediaNearDups]]: the synthetic corpus has no
    * natural payload near-dups, so docs past [[Dedup.snapshotCut]] replay
    * an earlier payload — id % 11 exactly (hamming 0), id % 7 with a
    * small span corrupted IN PLACE (length preserved, the span sits
    * inside one perceptual strip, so the planted pair lands at hamming
    * ≤ 2 — inside the banded join's ≤ 3 budget). LEFT join + null guard:
    * the [[Dedup.dedupIncremental]] sparse-corpus convention. */
  private[graft] def mediaGateTable(s: SparkSession, dir: String): Dataset[MediaItem] = {
    import s.implicits._
    val cut = Dedup.snapshotCut
    val docs = Corpus.documents(s, dir)
    val snapTexts = docs.where(col("doc_id") < cut)
      .select(col("doc_id").as("sid"), col("text").as("snap_text"))
    docs.select(col("doc_id"), col("text"))
      .join(broadcast(snapTexts),
        col("doc_id") >= cut && col("doc_id") % cut === col("sid"), "left")
      .select(col("doc_id"),
        when(col("doc_id") % 11 === 0 && col("snap_text").isNotNull, col("snap_text"))
          .when(col("doc_id") % 7 === 0 && col("snap_text").isNotNull,
            expr(s"""concat(
              substring(snap_text, 1, (33 * length(snap_text) + 64) div $phashStrips),
              repeat('x', greatest(1, length(snap_text) div 130)),
              substring(snap_text,
                (33 * length(snap_text) + 64) div $phashStrips
                  + greatest(1, length(snap_text) div 130) + 1))"""))
          .otherwise(col("text")).as("text"))
      .select(
        col("doc_id").as("docId"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("mediaType"),
        encode(col("text"), "UTF-8").as("bytes"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("byteLen"))
      .as[MediaItem]
  }

  /** Keep-one near-dup verdicts over the media payloads: 64-bit
    * perceptual signatures, banded into 4×16-bit blocks
    * ([[Dedup.simhashPairs]]'s scheme — hamming ≤ 3 pairs share a block
    * by pigeonhole, so candidates are an equi-join on (band, block), no
    * all-pairs), exact hamming on candidates, and one verdict row per
    * DROPPED doc: its smallest-id perceptual match and the best (lowest)
    * hamming seen. */
  def mediaNearDups(s: SparkSession, dir: String): DataFrame = {
    val sigs = perceptualHash(mediaGateTable(s, dir))
      // eager: the self-join below must not run the decode pass twice
      // (mapPartitions is opaque to Catalyst — same rule as simhashPairs)
      .graftCheckpoint()
    val bands = sigs.select(col("doc_id"), col("phash"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("phash"), b * 16).bitwiseAND(lit(65535L)).as("nib"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("phash"),
        col("bk.band").as("band"), col("bk.nib").as("nib"))
    val l = bands.as("l"); val r = bands.as("r")
    // first-colliding-band rule: exactly-once candidates, no distinct()
    val xorSig = expr("l.phash ^ r.phash")
    val firstBand = coalesce((0 until 4).map { b =>
      when(shiftright(xorSig, b * 16).bitwiseAND(lit(65535L)) === 0L, lit(b))
    }: _*)
    l.join(r,
        col("l.band") === col("r.band") && col("l.nib") === col("r.nib") &&
        col("l.doc_id") < col("r.doc_id"))
      .where(col("l.band") === firstBand)
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        bit_count(xorSig.cast("long")).cast("long").as("hamming"))
      .where(col("hamming") <= 3L)
      .groupBy(col("doc_b").as("doc_id"))
      .agg(min(col("doc_a")).as("dup_of"), min(col("hamming")).as("best_hamming"))
  }

  val mediaNearDupsSql: String = {
    val cut = Dedup.snapshotCut
    s"""WITH media AS (
       |  SELECT i.doc_id,
       |    CASE WHEN i.doc_id % 11 = 0 AND s.text IS NOT NULL THEN s.text
       |         WHEN i.doc_id % 7 = 0 AND s.text IS NOT NULL THEN
       |           substring(s.text, 1, (33 * len(s.text) + 64) // $phashStrips)
       |           || repeat('x', GREATEST(1, len(s.text) // 130))
       |           || substring(s.text, (33 * len(s.text) + 64) // $phashStrips
       |                + GREATEST(1, len(s.text) // 130) + 1)
       |         ELSE i.text END AS text
       |  FROM documents i
       |  LEFT JOIN documents s
       |    ON i.doc_id >= $cut AND s.doc_id = i.doc_id % $cut),
       |${phashCtesFor("media")},
       |bands AS (
       |  SELECT doc_id, phash, b.band AS band,
       |    (phash >> (b.band * 16)) & 65535 AS nib
       |  FROM sig CROSS JOIN (SELECT UNNEST([0,1,2,3]) AS band) b),
       |pairs AS (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
       |    CAST(bit_count(xor(l.phash, r.phash)) AS BIGINT) AS hamming
       |  FROM bands l JOIN bands r
       |    ON l.band = r.band AND l.nib = r.nib AND l.doc_id < r.doc_id)
       |SELECT doc_b AS doc_id, MIN(doc_a) AS dup_of, MIN(hamming) AS best_hamming
       |FROM pairs WHERE hamming <= 3 GROUP BY 1""".stripMargin
  }

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
