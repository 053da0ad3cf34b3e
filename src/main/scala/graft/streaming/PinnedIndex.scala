package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.IndexVersion

/** Session-pinned index frames with the per-trigger staleness check —
  * the serving loops' ONE refresh kernel ([[StreamAnnServe]],
  * [[StreamBm25Serve]], [[StreamHybridServe]]). A `DataFrame` carries
  * its resolved file index, so pinning the frames skips the per-trigger
  * directory re-listing (a metadata storm at production partition
  * counts); [[refreshIfStale]] stats ONE file (the mutation-bumped
  * [[IndexVersion]] stamp) per trigger and re-opens the frames only
  * when it moved — an append/delete/compact/retrain becomes visible at
  * the next trigger without restarting the query, and an unchanged
  * index never pays a re-listing. `onRefresh` runs BEFORE the re-open
  * (the seam the IVF loops use to re-check the retrain quiesce marker,
  * so a refresh never lands on a torn layout).
  *
  * Single-threaded by design: foreachBatch callbacks run sequentially
  * on the stream execution thread, the only caller. */
private[streaming] final class PinnedIndex(
    s: SparkSession, indexDir: String, tables: Seq[String],
    onRefresh: () => Unit = () => ()) {

  private var stamp = IndexVersion.stamp(indexDir)
  private var frames = open()

  private def open(): Map[String, DataFrame] =
    tables.map(t => t -> s.read.parquet(s"$indexDir/$t")).toMap

  /** The pinned frame for `table`. */
  def apply(table: String): DataFrame = frames(table)

  /** Per-trigger staleness check: one file stat; re-open on change. */
  def refreshIfStale(): Unit = {
    val cur = IndexVersion.stamp(indexDir)
    if (cur != stamp) {
      onRefresh()
      frames = open()
      stamp = cur
    }
  }
}
