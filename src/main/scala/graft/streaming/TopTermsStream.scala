package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming twin of [[graft.operators.Sketches.heavyHitters]]: the
  * Space-Saving sketch as an unbounded streaming aggregation, so per-source
  * top terms stay continuously current as documents arrive.
  *
  * The sketch buffer IS the state-store value: a streaming `groupBy(source)
  * .agg(graft_top_terms(token))` in update mode keeps exactly one
  * ≤`capacity`-slot buffer per source in the state store FOREVER — no
  * watermark needed, because the state never grows with volume, only with
  * the number of sources (the same bounded-state contract the batch sketch
  * proves per-shuffle). Each micro-batch map-side-reduces its new tokens
  * into partial sketches and merges them into the stored buffer — the
  * mergeable-summaries property is what makes the incremental computation
  * correct, and it is the SAME merge the batch/property specs pin down
  * ([[SketchFunctions.spaceSaving]]).
  *
  * At 100 TB/day this is the standard "trending terms" shape: state is
  * `sources × capacity` slots, the update stream per batch is the
  * per-source top-k deltas, and RocksDB holds the buffers (the spec suite
  * session pins the RocksDB provider).
  */
object TopTermsStream {

  /** docs: streaming frame with `source: string, text: string` columns.
    * Returns one updated `(source, top: array<struct<token,cnt,err>>)` row
    * per source per micro-batch (update output mode). The pipeline is
    * [[graft.operators.Sketches.sourceTokenSketch]] verbatim — one
    * definition for batch and stream, so the equivalence the spec pins
    * cannot drift. */
  def topTerms(docs: DataFrame): DataFrame =
    graft.operators.Sketches.sourceTokenSketch(docs)
}
