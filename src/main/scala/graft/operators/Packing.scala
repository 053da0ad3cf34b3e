package graft.operators

import graft.Materialize.MaterializeOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Corpus

/** Sequence packing for LLM pre-training (builder-prompt scale extension;
  * the reference has no training surface, so this is engine-native):
  * documents are conceptually concatenated in doc_id order and cut into
  * fixed-capacity token chunks ("concat-and-chunk"); [[packChunks]] reports
  * each document's chunk span, [[packShards]] materializes the chunks.
  *
  * The core is a RUNNING TOTAL over the whole corpus — the textbook
  * scale-killer if written as one global window (Spark moves every row to
  * a single partition). Here it is a hierarchical prefix sum instead:
  *  1. per-doc token counts aggregate into doc_id buckets (one shuffle of
  *     two-long rows; the text itself never moves);
  *  2. bucket totals — corpus_size / 4096 rows, a few thousand at 100 TB —
  *     take the global cumulative window on a frame small enough that the
  *     single partition is free;
  *  3. bucket offsets broadcast-join back and a PER-BUCKET window (fully
  *     parallel) finishes the per-doc offsets.
  * Every stage is bounded: no partition ever holds more than one bucket of
  * per-doc rows or the tiny bucket-total frame.
  *
  * Offsets stay exact in longs; chunk ids use floor division (offsets are
  * non-negative, and a 100 TB corpus is ~25 T tokens, far inside the long
  * range). Empty documents occupy one virtual token so every doc has a
  * well-defined chunk (mirrored in the oracle via GREATEST(n, 1)).
  */
object Packing {

  private val chunkTokens = 2048L // packing capacity (tokens per chunk)
  private val bucketDocs = 4096L  // prefix-sum fan-in per bucket

  /** The hierarchical prefix sum (steps 2-3 above): adds `start_offset` to
    * a frame carrying (doc_id, n_tokens, bucket). The input should be
    * materialized (localCheckpoint) — it feeds both the bucket-offsets
    * aggregate and the per-doc window. */
  private def withStartOffsets(counted: DataFrame): DataFrame = {
    val bucketOffsets = counted.groupBy(col("bucket"))
      .agg(sum(col("n_tokens")).as("btotal"))
      .withColumn("boffset",
        coalesce(sum(col("btotal")).over(
          Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("bucket"), col("boffset"))
    val local = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    counted
      .join(broadcast(bucketOffsets), Seq("bucket"))
      .withColumn("start_offset",
        col("boffset") + coalesce(sum(col("n_tokens")).over(local), lit(0L)))
  }

  def packChunks(s: SparkSession, dir: String): DataFrame = {
    // localCheckpoint: the counted frame (two longs + bucket per doc)
    // feeds two consumers inside withStartOffsets; an unshared subtree
    // would scan + tokenize the corpus twice, and a cache() would leak
    // this subtree into other queries' plans
    val counted = Corpus.documents(s, dir)
      .select(col("doc_id"),
        size(filter(TextAnalysis.tokensCol(col("text")),
          t => length(t) > 0)).cast("long").as("n_tokens"))
      .withColumn("bucket", (col("doc_id") / lit(bucketDocs)).cast("long"))
      .graftCheckpoint()
    val span = greatest(col("n_tokens"), lit(1L))
    withStartOffsets(counted)
      .select(col("doc_id"), col("n_tokens"), col("start_offset"),
        floor(col("start_offset") / lit(chunkTokens)).as("first_chunk"),
        floor((col("start_offset") + span - 1) / lit(chunkTokens)).as("last_chunk"),
        (floor((col("start_offset") + span - 1) / lit(chunkTokens)) -
          floor(col("start_offset") / lit(chunkTokens)) + 1).as("n_chunks"))
  }

  /** Per-writer packing offsets — [[packChunks]] with the sequence space
    * split by `source`: each source is an independent writer owning its
    * own token stream and chunk ids (the multi-writer layout a parallel
    * ingestion pipeline actually produces, and the batch anchor
    * [[graft.streaming.StreamPack]] is spec-pinned against — per-writer
    * counters are what make packing STREAMABLE, because a single global
    * offset would serialize every writer through one state row).
    *
    * Same hierarchical prefix sum, keys widened to (source, bucket); the
    * bucket-offset frame is source × bucket rows — corpus-proportional,
    * so it joins back WITHOUT a broadcast hint (the packInterleave r10
    * lesson: let AQE decide). */
  def packByWriter(s: SparkSession, dir: String): DataFrame = {
    val counted = Corpus.documents(s, dir)
      .select(col("source"), col("doc_id"),
        size(filter(TextAnalysis.tokensCol(col("text")),
          t => length(t) > 0)).cast("long").as("n_tokens"))
      .withColumn("bucket", (col("doc_id") / lit(bucketDocs)).cast("long"))
      .graftCheckpoint()
    val bucketOffsets = counted.groupBy(col("source"), col("bucket"))
      .agg(sum(col("n_tokens")).as("btotal"))
      .withColumn("boffset",
        coalesce(sum(col("btotal")).over(
          Window.partitionBy(col("source")).orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("source"), col("bucket"), col("boffset"))
    val local = Window.partitionBy(col("source"), col("bucket"))
      .orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)
    val span = greatest(col("n_tokens"), lit(1L))
    counted.join(bucketOffsets, Seq("source", "bucket"))
      .withColumn("start_offset",
        col("boffset") + coalesce(sum(col("n_tokens")).over(local), lit(0L)))
      .select(col("source"), col("doc_id"), col("n_tokens"), col("start_offset"),
        floor(col("start_offset") / lit(chunkTokens)).as("first_chunk"),
        floor((col("start_offset") + span - 1) / lit(chunkTokens)).as("last_chunk"),
        (floor((col("start_offset") + span - 1) / lit(chunkTokens)) -
          floor(col("start_offset") / lit(chunkTokens)) + 1).as("n_chunks"))
  }

  val packByWriterSql: String =
    s"""WITH d AS (
       |  SELECT source, doc_id,
       |    CAST(len(list_filter(${TextAnalysis.tokensSql}, t -> length(t) > 0))
       |      AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT source, doc_id, n_tokens,
       |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS start_offset
       |  FROM d)
       |SELECT source, doc_id, n_tokens, start_offset,
       |  start_offset // $chunkTokens AS first_chunk,
       |  (start_offset + GREATEST(n_tokens, 1) - 1) // $chunkTokens AS last_chunk,
       |  (start_offset + GREATEST(n_tokens, 1) - 1) // $chunkTokens
       |    - start_offset // $chunkTokens + 1 AS n_chunks
       |FROM c""".stripMargin

  /** The shared per-doc chunk-span epilogue over a (start_offset,
    * n_tokens) pair — kept in sync with [[packChunks]]/[[packByWriter]]
    * by being the SAME floor-division convention the streaming packer
    * re-implements in [[graft.streaming.StreamPack]] (longs, not
    * Columns, there). */
  private[graft] def chunkSpan(startOffset: Long, nTokens: Long): (Long, Long, Long) = {
    val span = math.max(nTokens, 1L)
    val first = startOffset / chunkTokens
    val last = (startOffset + span - 1) / chunkTokens
    (first, last, last - first + 1)
  }

  private[graft] val chunkTokensConst: Long = chunkTokens

  /** Materialized packed shards — the step the packing offsets exist to
    * feed: every token gets its global stream index (doc start offset +
    * position), tokens group by `idx / capacity` into chunks that cross
    * document boundaries exactly as concat-and-chunk training shards do,
    * and each chunk reports its token count plus an md5 of its
    * space-joined text (rows stay small; the hash pins the full content
    * and order). Tokenization happens ONCE: the checkpointed token frame
    * feeds both the prefix sum (via a narrow projection) and the explode.
    * Groups are bounded at [[chunkTokens]] tokens, so the in-group sort is
    * O(capacity log capacity) per chunk — collect_list alone is NOT
    * order-stable, hence the sort by index before joining. */
  def packShards(s: SparkSession, dir: String): DataFrame = {
    val toks = Corpus.documents(s, dir)
      .select(col("doc_id"),
        filter(TextAnalysis.tokensCol(col("text")), t => length(t) > 0).as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("bucket", (col("doc_id") / lit(bucketDocs)).cast("long"))
      .graftCheckpoint()
    val offs = withStartOffsets(toks.select(col("doc_id"), col("n_tokens"), col("bucket")))
      .select(col("doc_id"), col("start_offset"))
    val exploded = toks.join(offs, Seq("doc_id"))
      .select(col("start_offset"), posexplode(col("toks")).as(Seq("pos", "token")))
      .select((col("start_offset") + col("pos")).as("idx"), col("token"))
    exploded
      .groupBy(floor(col("idx") / lit(chunkTokens)).as("chunk_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("idx"), col("token")))),
            x => x.getField("token")), " ")).as("chunk_hash"))
  }

  /** Shared oracle CTE prefix: tokenized docs (`d`: doc_id, toks) and the
    * cumulative start offset (`c`) — ONE copy of the token filter and the
    * offset convention for both packing oracles. */
  private val packBaseSql: String =
    s"""d AS (
       |  SELECT doc_id, list_filter(${TextAnalysis.tokensSql}, t -> length(t) > 0) AS toks
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens,
       |    CAST(COALESCE(SUM(len(toks)) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS start_offset
       |  FROM d)""".stripMargin

  val packShardsSql: String =
    s"""WITH $packBaseSql,
       |e0 AS (SELECT start_offset, toks, UNNEST(range(0, len(toks))) AS i FROM c),
       |e AS (SELECT start_offset + i AS idx, toks[CAST(i + 1 AS INT)] AS token FROM e0)
       |SELECT idx // $chunkTokens AS chunk_id, COUNT(*) AS n_tokens,
       |  md5(string_agg(token, ' ' ORDER BY idx)) AS chunk_hash
       |FROM e GROUP BY 1""".stripMargin

  val packChunksSql: String =
    s"""WITH $packBaseSql
       |SELECT doc_id, n_tokens, start_offset,
       |  start_offset // $chunkTokens AS first_chunk,
       |  (start_offset + GREATEST(n_tokens, 1) - 1) // $chunkTokens AS last_chunk,
       |  (start_offset + GREATEST(n_tokens, 1) - 1) // $chunkTokens
       |    - start_offset // $chunkTokens + 1 AS n_chunks
       |FROM c""".stripMargin

  // ------------------------------------------------------------------
  // Deterministic weighted-interleave training order (`pack_interleave`):
  // the ORDER the packed stream should concatenate documents in.
  // Straight doc_id order (what packChunks assumes for simplicity) feeds
  // the model one source at a time — a curriculum nobody asked for.
  // Weighted fair queueing fixes it reproducibly: each doc gets a virtual
  // time vtime = src_rank × stride, where stride is inversely
  // proportional to the source's token share — reading the corpus in
  // vtime order interleaves sources proportionally to their volume, with
  // zero randomness, stable under reruns and corpus appends.
  //
  // Scale shape: the per-source rank is the SAME hierarchical prefix
  // trick as the token offsets (per-(source, bucket) counts → tiny
  // cumulative window → bounded per-bucket row_number — never a
  // corpus-wide single-partition window), and the global training order
  // is a distributed SORT by (vtime, source, doc_id) at write time, not
  // a row_number: the vtime column IS the deliverable. Strides are
  // integer (corpus_tokens div source_tokens), capped at 10⁶ so a
  // vanishing source cannot push vtime toward long overflow — below one
  // millionth of the corpus, interleave granularity saturates
  // (documented, harmless: such a source occupies < 1 ppm of any
  // window of the stream either way).

  private[graft] val interleaveMaxStride = 1000000L

  def packInterleave(s: SparkSession, dir: String): DataFrame = {
    val counted = Corpus.documents(s, dir)
      .select(col("doc_id"), col("source"),
        size(filter(TextAnalysis.tokensCol(col("text")),
          t => length(t) > 0)).cast("long").as("n_tokens"))
      .withColumn("bucket", (col("doc_id") / lit(bucketDocs)).cast("long"))
      .graftCheckpoint() // three consumers: ranks, source totals, join
    val bucketCounts = counted.groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("bcnt"))
      .withColumn("boffset",
        coalesce(sum(col("bcnt")).over(
          Window.partitionBy(col("source")).orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("source"), col("bucket"), col("boffset"))
    val local = Window.partitionBy(col("source"), col("bucket"))
      .orderBy(col("doc_id"))
    val srcTok = counted.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("src_tokens"))
    val total = srcTok.agg(sum(col("src_tokens")).as("corpus_tokens"))
    counted
      // no broadcast hint: bucketCounts is ~n/bucketDocs rows —
      // corpus-proportional, not bounded — so the offset join must stay
      // a shuffle join (or whatever AQE picks) at 10^10-doc scale
      .join(bucketCounts, Seq("source", "bucket"))
      .withColumn("src_rank", col("boffset") + row_number().over(local).cast("long"))
      .join(broadcast(srcTok), Seq("source"))
      .crossJoin(broadcast(total))
      .withColumn("stride",
        least(expr("corpus_tokens div greatest(src_tokens, 1)"),
          lit(interleaveMaxStride)))
      .select(col("doc_id"), col("source"), col("src_rank"), col("stride"),
        (col("src_rank") * col("stride")).as("vtime"))
  }

  val packInterleaveSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |    CAST(len(list_filter(${TextAnalysis.tokensSql}, x -> length(x) > 0))
       |      AS BIGINT) AS nt
       |  FROM documents),
       |r AS (SELECT doc_id, source, nt,
       |        CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)
       |          AS BIGINT) AS src_rank
       |      FROM t),
       |st AS (SELECT source, CAST(SUM(nt) AS BIGINT) AS src_tokens
       |       FROM t GROUP BY 1),
       |tot AS (SELECT CAST(SUM(nt) AS BIGINT) AS corpus_tokens FROM t)
       |SELECT doc_id, r.source, src_rank,
       |  LEAST(corpus_tokens // GREATEST(src_tokens, 1),
       |    $interleaveMaxStride) AS stride,
       |  src_rank * LEAST(corpus_tokens // GREATEST(src_tokens, 1),
       |    $interleaveMaxStride) AS vtime
       |FROM r JOIN st ON r.source = st.source CROSS JOIN tot""".stripMargin

  // Seeded deterministic global training order (`epoch_order`): each
  // epoch reads the corpus in a fresh pseudo-random permutation —
  // pos = global rank of md5(seed:doc_id) — so shuffling is
  // reproducible, resumable, and identical on every engine that can
  // compute md5, with zero stored state (the permutation IS the seed).
  //
  // Scale shape: the rank of a HASH needs no corpus-wide sort-window,
  // because the hash's own prefix is an order-aligned bucket key — the
  // first two hex chars split the corpus into EXACTLY ≤256 buckets
  // whose lexicographic order equals the full key's. Per-bucket counts
  // (a bounded frame, so the broadcast hint is correct here — unlike
  // the corpus-proportional bucketCounts above) take the tiny
  // cumulative window; a per-bucket row_number finishes the rank fully
  // parallel. Ties on the 32-char key break by doc_id in both engines.
  // At 10^10 docs each bucket holds ~n/256 rows — the same per-bucket
  // bound every other window in this file rides; widen the prefix to
  // 3-4 chars (4096/65536 buckets) when n/256 outgrows a partition.

  private[graft] val epochSeed = "ep1"

  def epochOrder(s: SparkSession, dir: String): DataFrame = {
    // two passes over a (doc_id)-only pruned scan + codegen'd md5 —
    // cheaper than materializing the keyed frame for its two consumers
    def keyed = Corpus.documents(s, dir)
      .select(col("doc_id"),
        md5(concat(lit(epochSeed), lit(":"), col("doc_id").cast("string")))
          .as("key"))
      .withColumn("bucket", substring(col("key"), 1, 2))
    val offsets = keyed.groupBy(col("bucket"))
      .agg(count(lit(1)).as("bcnt"))
      .withColumn("boffset",
        coalesce(sum(col("bcnt")).over(
          Window.orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("boffset"))
    val local = Window.partitionBy(col("bucket"))
      .orderBy(col("key"), col("doc_id"))
    keyed.join(broadcast(offsets), Seq("bucket"))
      .withColumn("pos",
        (col("boffset") + row_number().over(local)).cast("long"))
      .select(col("doc_id"), col("pos"))
  }

  val epochOrderSql: String =
    s"""WITH k AS (
       |  SELECT doc_id,
       |    md5('$epochSeed:' || CAST(doc_id AS VARCHAR)) AS key
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(row_number() OVER (ORDER BY key, doc_id) AS BIGINT) AS pos
       |FROM k""".stripMargin
}
