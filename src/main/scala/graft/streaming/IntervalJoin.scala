package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.{AdEvent, Screen}

/** Native stream-stream interval join — the Spark-first re-expression of
  * the reference's repeater-enriched windowed join (J2,
  * `/root/reference/.../windowing/AdEventFixedWindowWithRepeaterEnricher
  * .scala:12-71` + `RepeatDoFn.scala:42-120`).
  *
  * Beam lacks interval joins, so the reference re-emits every screen once
  * per fixed window for `screenTtl` (the `RepeatDoFn`) purely so that ads
  * in later windows can equi-join it. Spark expresses the intent directly:
  * an ad at time t matches a screen with the same screen id seen within
  * `[t − ttl, t]` — one join, no synthetic re-emission, state pruned by
  * the watermark + range condition. The faithful repeater lives in
  * [[Repeater]] for API parity; this operator is what a Spark user should
  * run, and is why J2 costs one shuffle here instead of `ttl/window`
  * duplicated rows.
  *
  * Left-outer: unmatched ads surface with null screen columns once the
  * watermark passes their match range — the reference's DLQ side output
  * (K5) falls out as a null filter.
  */
object IntervalJoin {

  def adScreenJoin(
      ads: Dataset[AdEvent],
      screens: Dataset[Screen],
      ttl: String = "10 minutes",
      watermarkDelay: String = "0 seconds"): DataFrame = {
    val a = ads.withWatermark("ts", watermarkDelay)
      .select(col("id").as("adId"), col("screenId"), col("action"), col("ts").as("adTs"))
    val sc = screens.withWatermark("ts", watermarkDelay)
      .select(col("id").as("sid"), col("publicationId"), col("ts").as("screenTs"))
    a.join(sc,
      expr(s"screenId = sid AND screenTs BETWEEN adTs - INTERVAL $ttl AND adTs"),
      "leftOuter")
      .select(col("adId"), col("screenId"), col("action"), col("adTs"),
        col("publicationId"), col("screenTs"))
  }

  /** K5 split: (matched, dlq). */
  def split(joined: DataFrame): (DataFrame, DataFrame) =
    (joined.where(col("publicationId").isNotNull),
     joined.where(col("publicationId").isNull))
}
