package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.AdEvent

/** Structured-Streaming variant of the reference's fixed-window CTR
  * calculator (`/root/reference/.../windowing/AdCtrFixedWindowCalculator
  * .scala:30-40`, capped semigroup `model.scala:88-98`).
  *
  * Beam trigger/lateness mapping (SURVEY.md §7.5.1):
  *  - accumulating on-time + late panes (W6/W9) ⇒ `update` output mode —
  *    every micro-batch re-emits a group's row when (and only when) new
  *    events changed it, so a group's revision sequence in the sink is the
  *    pane sequence;
  *  - allowedLateness (W8) ⇒ the watermark delay: state for a window is
  *    kept until watermark ≥ window.end, so late rows within the delay
  *    revise the result and older rows are dropped by the aggregation.
  *
  * The plan is a streaming `HashAggregate(partial) → shuffle → StateStore →
  * HashAggregate(final)` — Beam's `Combine.perKey` lifting comes free, and
  * the shuffle carries one pre-combined row per (window, screen, ad) per
  * batch regardless of event volume.
  */
object CtrStream {

  def fixedWindowCtr(
      events: Dataset[AdEvent],
      windowDuration: String = "10 minutes",
      lateness: String = "0 seconds"): DataFrame =
    events
      .where(col("action") =!= "Unknown")
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowDuration).as("w"),
        col("screenId"), col("id").as("adId"))
      .agg(
        least(lit(1L), count(when(col("action") === "Click", 1))).as("clicks"),
        least(lit(1L), count(when(col("action") === "Impression", 1))).as("impressions"))
      .select(col("w.start").as("windowStart"), col("w.end").as("windowEnd"),
        col("screenId"), col("adId"), col("clicks"), col("impressions"))

  /** Sliding-window moving-average CTR per ad (W2/A2, reference
    * `AdCtrSlidingWindowCalculator.scala:33-39` with the total semigroup):
    * every event lands in duration/period windows; the un-capped sums give
    * the moving average. The reference's re-windowing of the output into
    * fixed windows (W3) is the `windowEnd` column here — each emitted row
    * is already stamped with its window bounds. */
  def slidingWindowCtr(
      events: Dataset[AdEvent],
      windowDuration: String = "20 minutes",
      slide: String = "10 minutes",
      lateness: String = "0 seconds"): DataFrame =
    events
      .where(col("action") =!= "Unknown")
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowDuration, slide).as("w"), col("id").as("adId"))
      .agg(
        count(when(col("action") === "Click", 1)).as("clicks"),
        count(when(col("action") === "Impression", 1)).as("impressions"))
      .select(col("w.start").as("windowStart"), col("w.end").as("windowEnd"),
        col("adId"), col("clicks"), col("impressions"),
        (col("clicks").cast("double") /
          nullif(col("impressions"), lit(0L)).cast("double")).as("ctr"))
}
