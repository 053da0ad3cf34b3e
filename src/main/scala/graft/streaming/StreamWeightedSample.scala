package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming twin of [[graft.operators.Curation.weightedSample]]: the
  * Efraimidis–Spirakis weighted reservoir maintained continuously as
  * documents arrive, so the "current k-doc weight-proportional sample per
  * source" is always live instead of recomputed per corpus sweep.
  *
  * The bounded top-k aggregator buffer
  * ([[graft.functions.SampleFunctions.weightedTopK]]) IS the state-store
  * value: a streaming `groupBy(source).agg(...)` keeps exactly one
  * ≤2k-entry buffer per source FOREVER — no watermark needed, because
  * state never grows with volume, only with the number of sources (the
  * [[TopTermsStream]] contract; priorities are hash-derived, so late or
  * re-ordered arrival cannot change what the reservoir converges to).
  * Each micro-batch map-side-reduces its rows into partial buffers and
  * merges them into the stored one — the merge-order independence the
  * aggregator proves under a TOTAL order is exactly what makes the
  * incremental maintenance correct, and the pipeline is
  * [[graft.operators.Curation.weightedSampleFrom]] verbatim: one
  * definition for batch and stream, so the equivalence the spec pins
  * cannot drift.
  *
  * At 100 TB/day: state is `sources × 2k` (pri, id) pairs, the update
  * stream per batch is each touched source's current k picks, and the
  * text column never reaches the aggregation (the input projection keeps
  * only (source, pri, doc_id)).
  */
object StreamWeightedSample {

  /** docs: streaming frame with `source: string, doc_id: long,
    * n_chars: long` columns. Returns the touched sources' current picks
    * as `(source, doc_id, rk)` rows per micro-batch (update output
    * mode), rk 1..k by (priority desc, doc_id). */
  def picks(docs: DataFrame): DataFrame = {
    // per-stratum reservoirs whose stratum count grows with the corpus
    // (sf1->sf10 heap-store ratio 0.68, BASELINE matrix)
    StoreAdvisory.corpusCoupled(docs.sparkSession, "weighted-sample")
    graft.operators.Curation.weightedSampleFrom(docs)
  }
}
