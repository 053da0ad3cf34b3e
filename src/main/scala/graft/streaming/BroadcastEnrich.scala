package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.{Publication, Screen}

/** Streaming variant of the reference's side-input (broadcast) join in the
  * global window (J1, `/root/reference/.../windowing/
  * ScreenGlobalWindowWithSideInputEnricher.scala:13-89`):
  * a Screen stream enriched against the Publication dimension, where the
  * dimension is pre-reduced to latest-version-per-id (the reference's
  * `TimestampCombiner.LATEST` + linear scan, re-expressed as a `max(struct)`
  * argmax) and broadcast to every task. Unmatched screens carry a null
  * version — callers split matched/DLQ with two filters (K5).
  *
  * The reference refreshes its side input every ~5 s with a 100 MB cache
  * bound; Spark's stream-static join re-reads the static side per
  * micro-batch (a file-backed dimension picks up updates), and the
  * broadcast keeps the join shuffle-free — the event stream never moves.
  */
object BroadcastEnrich {

  /** @param screens unbounded stream of screen views
    * @param publications bounded (static) dimension */
  def enrich(screens: Dataset[Screen], publications: Dataset[Publication]): DataFrame = {
    val latest = publications
      .groupBy(col("id"))
      .agg(max(struct(col("ts"), col("version"))).as("best"))
      .select(col("id").as("pub_id"), col("best.version").as("version"))
    screens.join(broadcast(latest),
        col("publicationId") === col("pub_id"), "left_outer")
      .select(col("id").as("screenId"), col("publicationId"),
        col("ts"), col("version"))
  }

  /** K5 split on the enriched stream: (matched, dlq). */
  def split(enriched: DataFrame): (DataFrame, DataFrame) =
    (enriched.where(col("version").isNotNull),
     enriched.where(col("version").isNull))
}
