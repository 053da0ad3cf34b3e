package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Corpus

/** Persisted inverted index: build once, query many — [[IvfIndex]]'s
  * lifecycle discipline applied to the lexical-retrieval family (the
  * piece [[Retrieval.bm25Topk]] deliberately leaves out: its one-shot
  * query re-tokenizes the corpus every run, the right shape for an
  * oracle but not for production — its own scaladoc says a search system
  * would replace the full-scan term filter with exactly this index).
  *
  * Layout under `indexDir`:
  *  - `postings/` — (term, plist) **partitioned by superblock**
  *    (`sb = doc_id >> (blockBits + superBits)`, a doc-id RANGE). Block
  *    alone would be one directory per 64 docs — 10⁸ partitions at 10¹⁰
  *    docs; the superblock keeps the partition count bounded (2²⁰-doc
  *    dirs at the production default) while preserving the append
  *    property: an append-only ingest touches only the TAIL superblocks,
  *    so an append rewrites just those partitions under dynamic
  *    partition overwrite, exactly like [[IvfIndex.append]]'s
  *    touched-cell rewrites.
  *  - `docstats/` — one row of mergeable counters
  *    (n_docs, total_len, max_doc_id, super_bits): the BM25 globals plus
  *    the ingest watermark, updated by pure addition on append — never a
  *    corpus rescan ([[Dedup.boilerplateIncremental]]'s stored-counter
  *    discipline).
  *
  * Every posting entry carries (doc_id, tf, dl) — the denormalized
  * per-doc norm an impact-ordered index stores with the posting — so
  * query-time scoring is: one term-pruned index scan (`PushedFilters`
  * on `term`, plan-audited), two broadcast joins (per-term df, 1-row
  * stats), a TakeOrdered. The corpus text is never read at query time.
  */
object PostingsIndex {

  /** Production default: 2^(6+14) = 2^20 docs per partition directory. */
  private[graft] val defaultSuperBits = 14

  private def sbCol(superBits: Int) =
    shiftright(col("doc_id"), Retrieval.postingsBlockBits + superBits)

  /** Index state of a (doc_id, text) frame with the partition column
    * attached: (term, block, plist, sb). The plist's leading doc_id keeps
    * every entry's sb equal to the row's, so a (term, block) group never
    * straddles partitions (block ⊂ superblock by construction). */
  private def stateWithSb(docs: DataFrame, superBits: Int): DataFrame =
    Retrieval.postingsStateOf(docs)
      .withColumn("sb",
        shiftright(col("block"), superBits).cast("int"))

  private def writeStats(
      s: SparkSession, indexDir: String,
      nDocs: Long, totalLen: Long, maxDocId: Long, superBits: Int): Unit = {
    import s.implicits._
    Seq((nDocs, totalLen, maxDocId, superBits.toLong))
      .toDF("n_docs", "total_len", "max_doc_id", "super_bits")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/docstats")
  }

  private def readStats(s: SparkSession, indexDir: String): (Long, Long, Long, Int) = {
    val r = s.read.parquet(s"$indexDir/docstats").collect()(0)
    (r.getAs[Long]("n_docs"), r.getAs[Long]("total_len"),
      r.getAs[Long]("max_doc_id"), r.getAs[Long]("super_bits").toInt)
  }

  /** (count, length-sum, max-id) of a (doc_id, text) frame in ONE scan —
    * dl here is the same expression the posting entries carry, so the
    * stored totals and the entries can never disagree. */
  private def docAgg(docs: DataFrame): (Long, Long, Long) = {
    val toks = TextAnalysis.tokensCol(col("text"))
    val dlCol = when(length(TextAnalysis.normTextCol(col("text"))) === 0, 0L)
      .otherwise(size(toks).cast("long"))
    val r = docs.agg(count(lit(1)), coalesce(sum(dlCol), lit(0L)),
      coalesce(max(col("doc_id")), lit(-1L))).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** Build the index from a (doc_id, text) frame. Returns
    * (partitions written, posting rows). */
  def buildFrom(
      s: SparkSession, docs: DataFrame, indexDir: String,
      superBits: Int = defaultSuperBits): (Long, Long) = {
    stateWithSb(docs, superBits).write.mode("overwrite")
      .partitionBy("sb").parquet(s"$indexDir/postings")
    val (n, len, maxId) = docAgg(docs)
    writeStats(s, indexDir, n, len, maxId, superBits)
    val p = s.read.parquet(s"$indexDir/postings")
    (p.select(col("sb")).distinct().count(), p.count())
  }

  /** Append a (doc_id, text) batch, rewriting ONLY the touched tail
    * superblock partitions: docs at or below the stored ingest watermark
    * are dropped first (a replayed batch appends nothing — idempotent),
    * the batch's index state merges with JUST the touched partitions'
    * current rows (a statically pruned partition-column scan), and the
    * result lands under dynamic partition overwrite. Counters advance by
    * addition. Returns (docs appended, partitions rewritten). */
  def append(s: SparkSession, indexDir: String, incoming: DataFrame): (Long, Long) = {
    val (n0, len0, wm, superBits) = readStats(s, indexDir)
    val batch = incoming.where(col("doc_id") > wm).localCheckpoint()
    val (nb, lenb, maxb) = docAgg(batch)
    if (nb == 0L) (0L, 0L)
    else {
      val batchState = stateWithSb(batch, superBits).localCheckpoint()
      val touched = batchState.select(col("sb")).distinct()
        .collect().map(_.getInt(0)).sorted
      val existing = s.read.parquet(s"$indexDir/postings")
        .where(col("sb").isin(touched.map(Integer.valueOf): _*))
        .select(col("term"), col("block"), col("plist"))
      // the sides are doc-disjoint (watermark), so the merge is the
      // inline operator's concat+sort, re-keyed and written back
      val spark = s
      val merged = existing
        .unionByName(batchState.select(col("term"), col("block"), col("plist")))
        .groupBy(col("term"), col("block"))
        .agg(array_sort(flatten(collect_list(col("plist")))).as("plist"))
        .withColumn("sb", shiftright(col("block"), superBits).cast("int"))
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try
        merged.write.mode("overwrite").partitionBy("sb")
          .parquet(s"$indexDir/postings")
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      writeStats(s, indexDir, n0 + nb, len0 + lenb, math.max(wm, maxb), superBits)
      (nb, touched.length.toLong)
    }
  }

  /** Streaming ingestion into the persisted index: each micro-batch of
    * (doc_id, text) rows runs one [[append]] — the `foreachBatch`
    * at-least-once contract composes with append's watermark guard
    * ([[IvfIndex.appendStream]]'s discipline: a RETRIED micro-batch
    * re-appends nothing, because every doc in it sits at or below the
    * stored `max_doc_id`), so the index converges to exactly the
    * one-shot layout. The stream's only state is the sink checkpoint;
    * index growth is the touched-tail-partition rewrites. */
  def appendStream(
      s: SparkSession,
      indexDir: String,
      docs: DataFrame,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        append(s, indexDir, df.toDF())
        ()
      }
      .start()

  /** BM25 top-10 for [[Retrieval.queryTerms]] FROM THE INDEX: a
    * term-pruned postings scan explodes into the (doc_id, dl, token, tf)
    * frame and the stored counters supply the globals — then the scoring
    * epilogue is [[Retrieval.bm25Score]] verbatim, which is why this
    * entry shares `bm25_topk`'s oracle bit for bit. */
  def query(s: SparkSession, indexDir: String): DataFrame = {
    val tf = s.read.parquet(s"$indexDir/postings")
      .where(col("term").isin(Retrieval.queryTerms: _*))
      .select(col("term").as("token"), explode(col("plist")).as("e"))
      .select(col("e.doc_id").as("doc_id"), col("e.dl").as("dl"),
        col("token"), col("e.tf").as("tf"))
      .localCheckpoint()
    val stats = s.read.parquet(s"$indexDir/docstats")
      .select(col("n_docs"), col("total_len"))
    Retrieval.bm25Score(tf, stats)
  }

  /** Oracle-gated query entry (`bm25_indexed`): build-once/query-many
    * through the FULL lifecycle — bootstrap from the corpus prefix below
    * half the max doc id, then append the rest as an ingest increment
    * rewriting only tail partitions — sharing `bm25_topk`'s oracle
    * ([[IvfIndex.annIvfIndexed]]'s amortization + done-ness discipline:
    * marker keyed by corpus dir AND the documents table's leaf-file
    * fingerprint, so a regenerated corpus can never serve a stale
    * index). Gate superBits = 2 (256-doc partitions) keeps the
    * partition count non-vacuous at every test SF. */
  def bm25Indexed(s: SparkSession, dir: String): DataFrame =
    query(s, ensureLifecycleIndex(s, dir))

  private def ensureLifecycleIndex(s: SparkSession, dir: String): String = {
    val tag = (dir.hashCode.toLong * 31 +
      Corpus.fingerprint(s"$dir/documents.parquet")) & 0x7fffffffffffffffL
    val idx = s"/tmp/graft_postings_${java.lang.Long.toHexString(tag)}"
    if (!new java.io.File(s"$idx/_GRAFT_APPENDED").exists()) {
      val docs = Corpus.documents(s, dir).select(col("doc_id"), col("text"))
      val cut = docs.agg(max(col("doc_id"))).collect()(0).getLong(0) / 2
      buildFrom(s, docs.where(col("doc_id") < cut), idx, superBits = 2)
      append(s, idx, docs.where(col("doc_id") >= cut))
      new java.io.File(s"$idx/_GRAFT_APPENDED").createNewFile()
    }
    idx
  }
}
