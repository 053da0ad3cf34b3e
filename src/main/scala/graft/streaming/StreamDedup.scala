package graft.streaming

import org.apache.spark.sql.Dataset

import graft.model.AdEvent

/** Streaming exact deduplication — the unbounded twin of the batch
  * `dedup_exact` operator (and of the reference's capped-semigroup dedup
  * effect, A1): duplicates are dropped on the key columns with state
  * bounded by the watermark, so the state store holds only keys newer
  * than `watermark − delay` instead of growing forever.
  *
  * Trade-off (inherent to bounded-state streaming dedup): a duplicate
  * arriving after its key was evicted is emitted again. At 100 TB the
  * state is RocksDB, partitioned by the dedup key — the same
  * even-key-distribution scaling contract as every other keyed operator.
  */
object StreamDedup {

  def dedupEvents(
      events: Dataset[AdEvent],
      watermarkDelay: String = "10 minutes"): Dataset[AdEvent] =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("id", "screenId", "action")
}
