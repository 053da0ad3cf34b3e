package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{IvfIndex, PostingsIndex, Retrieval}

/** Hybrid-search serving: a continuous stream of (query_id, terms, qv)
  * searches answered per micro-batch by fusing BOTH persisted indexes —
  * the composition of [[StreamBm25Serve]] (lexical leg: term-pruned
  * postings scan) and [[StreamAnnServe]] (semantic leg: DPP-pruned
  * probed-cell scan) through the single-sourced RRF tail
  * ([[Retrieval.rrfFuse]] — the same arithmetic `hybrid_rrf_indexed`'s
  * oracle gates), so the serving answer cannot drift from the batch
  * operator family.
  *
  * Same discipline as both parents, for the same reasons: `foreachBatch`
  * re-plans the batch kernels per trigger (the only shape that keeps the
  * data-dependent term pushdown AND dynamic partition pruning — each
  * needs a per-batch plan), index frames are constructed once per
  * index version (no per-trigger directory listings; appends to either
  * index land at the next trigger via the mutation-bumped stamp,
  * [[graft.operators.IndexVersion]]), and the only streaming state is the sink
  * checkpoint — at-least-once redelivery is idempotent for any sink
  * keyed by (query_id, rank). Per-trigger I/O: Σ df over the batch's
  * terms + nProbe/nCells of the members table. */
object StreamHybridServe {

  /** Serve `queries` (streaming frame: `query_id: long,
    * terms: array<string>, qv: array<double>`) against the two indexes.
    * `sink` receives each micro-batch's fused frame — (query_id, rank,
    * neighbor_id, rrf), top `k` per query — plus the batch id. */
  def serve(
      s: SparkSession,
      postingsIndexDir: String,
      ivfIndexDir: String,
      queries: DataFrame,
      checkpointDir: String,
      legK: Int = 10,
      k: Int = 5,
      nProbe: Int = 2)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    // retrain quiesce for the semantic leg ([[IvfIndex.retrain]]) —
    // checked at session start AND before every IVF-side refresh
    IvfIndex.requireNotRetraining(ivfIndexDir)
    // [[PinnedIndex]] × 2: both indexes watched independently; an
    // append to either becomes visible at the next trigger
    val pidx = new PinnedIndex(s, postingsIndexDir,
      Seq("postings", "termstats", "blockstats"))
    val vidx = new PinnedIndex(s, ivfIndexDir, Seq("centroids", "members"),
      onRefresh = () => IvfIndex.requireNotRetraining(ivfIndexDir))
    queries.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (df: Dataset[Row], batchId: Long) =>
        pidx.refreshIfStale()
        vidx.refreshIfStale()
        val (res, pinned) = fuseOn(pidx("postings"), pidx("termstats"),
          pidx("blockstats"), vidx("centroids"), vidx("members"),
          df.toDF(), legK, k, nProbe)
        sink(res, batchId)
        // sink has materialized the fused batch — release the lexical
        // leg's per-trigger profile pin ([[StreamBm25Serve]]'s leak
        // discipline; the semantic leg checkpoints nothing)
        org.apache.spark.sql.graft.Bridge.releaseCheckpoint(pinned)
        ()
      }
      .start()
  }

  /** The per-batch kernel — also the spec's batch comparand, so stream
    * ≡ batch holds by construction and the spec checks the PLUMBING
    * (micro-batch independence, per-trigger pruning), not arithmetic.
    * Returns (fused frame, pinned profile checkpoint) — the caller
    * releases the pin once the frame is materialized. */
  private[graft] def fuseOn(
      postings: DataFrame, termstats: DataFrame, blockstats: DataFrame,
      cents: DataFrame, members: DataFrame,
      queries: DataFrame, legK: Int, k: Int,
      nProbe: Int): (DataFrame, DataFrame) = {
    val qt = queries
      .select(col("query_id"), explode(col("terms")).as("term"))
      .distinct()
    val (lr0, pinned) = PostingsIndex
      .bm25BatchPinned(postings, termstats, blockstats, qt, legK,
        excludeSelf = false)
    val lr = lr0
      .select(col("query_id"), col("doc_id").as("neighbor_id"),
        col("r").as("lr"))
    val vr = IvfIndex
      .queryOn(cents, members, queries.select(col("query_id"), col("qv")),
        nProbe, legK)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("int").as("vr"))
    (Retrieval.rrfFuse(vr, lr, k), pinned)
  }
}
