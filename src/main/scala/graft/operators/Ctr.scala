package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Corpus

/** Batch variants of the reference's CTR calculators.
  *
  * - fixed window + capped semigroup: reference
  *   `windowing/AdCtrFixedWindowCalculator.scala:30-40`, semigroup
  *   `model.scala:88-98`
  * - sliding window + total semigroup: `AdCtrSlidingWindowCalculator.scala:33-39`,
  *   semigroup `model.scala:100-110`
  * - custom merging ad-event window: `AdEventWindow.scala` /
  *   `AdEventWindowFn.scala`, approximated with a dynamic-gap session window
  *   (click 1 min, impression 10 min — `AdCtrCustomWindowCalculator.scala:13-14`).
  *
  * All aggregation is expressed in the column DSL so Catalyst plans a
  * partial+final HashAggregate (map-side combine) — the exact equivalent of
  * Beam's `Combine.perKey` lifting. At 100 TB the shuffle carries only one
  * pre-combined row per (window, screen, ad), not raw events.
  */
object Ctr {

  private def clicksCol: Column =
    count(when(col("action") === "Click", 1)).cast("long")
  private def imprsCol: Column =
    count(when(col("action") === "Impression", 1)).cast("long")

  /** CTR column: clicks/impressions, null when no impressions (the
    * reference's "undefined" CTR, model.scala:81-84). Both inputs are exact
    * longs so the double division is bit-deterministic across engines. */
  private def ctrCol(clicks: Column, imprs: Column): Column =
    (clicks.cast("double") / nullif(imprs, lit(0L)).cast("double")).as("ctr")

  /** Flagship: capped-semigroup CTR per (10-min fixed window, screen, ad). */
  def fixedWindow(s: SparkSession, dir: String): DataFrame = {
    val ev = Corpus.adEvents(s, dir).where(col("action") =!= "Unknown")
    ev.groupBy(window(col("ts"), "10 minutes").as("w"), col("screen_id"), col("ad_id"))
      .agg(least(lit(1L), clicksCol).as("clicks"),
           least(lit(1L), imprsCol).as("impressions"))
      .select(
        col("w.start").as("window_start"),
        col("screen_id"), col("ad_id"), col("clicks"), col("impressions"),
        ctrCol(col("clicks"), col("impressions")))
  }

  val fixedWindowSql: String =
    s"""WITH ad_events AS (${Corpus.adEventsSql})
       |SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
       |  screen_id, ad_id,
       |  LEAST(1, COUNT(CASE WHEN action = 'Click' THEN 1 END)) AS clicks,
       |  LEAST(1, COUNT(CASE WHEN action = 'Impression' THEN 1 END)) AS impressions,
       |  CAST(LEAST(1, COUNT(CASE WHEN action = 'Click' THEN 1 END)) AS DOUBLE)
       |    / NULLIF(LEAST(1, COUNT(CASE WHEN action = 'Impression' THEN 1 END)), 0) AS ctr
       |FROM ad_events WHERE action <> 'Unknown'
       |GROUP BY 1, 2, 3""".stripMargin

  /** Total-semigroup moving-average CTR per ad over 20-min windows sliding
    * every 10 min (W2/A2). Spark assigns each event to 2 windows; the
    * oracle reproduces that with an explicit 2-offset unnest. */
  def slidingWindow(s: SparkSession, dir: String): DataFrame = {
    val ev = Corpus.adEvents(s, dir).where(col("action") =!= "Unknown")
    ev.groupBy(window(col("ts"), "20 minutes", "10 minutes").as("w"), col("ad_id"))
      .agg(clicksCol.as("clicks"), imprsCol.as("impressions"))
      .select(
        col("w.start").as("window_start"),
        col("ad_id"), col("clicks"), col("impressions"),
        ctrCol(col("clicks"), col("impressions")))
  }

  val slidingWindowSql: String =
    s"""WITH ad_events AS (${Corpus.adEventsSql})
       |SELECT time_bucket(INTERVAL '10 minutes', ts)
       |         - o.off * INTERVAL '10 minutes' AS window_start,
       |  ad_id,
       |  COUNT(CASE WHEN action = 'Click' THEN 1 END) AS clicks,
       |  COUNT(CASE WHEN action = 'Impression' THEN 1 END) AS impressions,
       |  CAST(COUNT(CASE WHEN action = 'Click' THEN 1 END) AS DOUBLE)
       |    / NULLIF(COUNT(CASE WHEN action = 'Impression' THEN 1 END), 0) AS ctr
       |FROM ad_events CROSS JOIN (SELECT UNNEST([0, 1]) AS off) o
       |WHERE action <> 'Unknown'
       |GROUP BY 1, 2""".stripMargin

  /** Custom ad-event window (W5) as a dynamic-gap session window per
    * (screen, ad): a click keeps the session alive 1 minute, an impression
    * 10 minutes; overlapping event windows merge (reference
    * `AdEventWindow.scala:19-51`). Capped-semigroup aggregation on top. */
  def sessionWindow(s: SparkSession, dir: String): DataFrame = {
    val ev = Corpus.adEvents(s, dir).where(col("action") =!= "Unknown")
    val gap = when(col("action") === "Click", lit("1 minute"))
      .otherwise(lit("10 minutes"))
    ev.groupBy(session_window(col("ts"), gap).as("w"), col("screen_id"), col("ad_id"))
      .agg(least(lit(1L), clicksCol).as("clicks"),
           least(lit(1L), imprsCol).as("impressions"))
      .select(
        col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("screen_id"), col("ad_id"), col("clicks"), col("impressions"),
        ctrCol(col("clicks"), col("impressions")))
  }

  /** Sessionization in portable SQL: running max of per-event window ends;
    * an event at or past that max opens a new session (Spark's half-open
    * session semantics). */
  val sessionWindowSql: String =
    s"""WITH ad_events AS (${Corpus.adEventsSql}),
       |g AS (
       |  SELECT *, ts + CASE WHEN action = 'Click' THEN INTERVAL '1 minute'
       |                      ELSE INTERVAL '10 minutes' END AS w_end
       |  FROM ad_events WHERE action <> 'Unknown'),
       |m AS (
       |  SELECT *, MAX(w_end) OVER (PARTITION BY screen_id, ad_id ORDER BY ts
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
       |  FROM g),
       |sess AS (
       |  SELECT *, SUM(CASE WHEN prev_max IS NULL OR ts >= prev_max THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY screen_id, ad_id ORDER BY ts
       |          ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM m)
       |SELECT MIN(ts) AS session_start, MAX(w_end) AS session_end,
       |  screen_id, ad_id,
       |  LEAST(1, COUNT(CASE WHEN action = 'Click' THEN 1 END)) AS clicks,
       |  LEAST(1, COUNT(CASE WHEN action = 'Impression' THEN 1 END)) AS impressions,
       |  CAST(LEAST(1, COUNT(CASE WHEN action = 'Click' THEN 1 END)) AS DOUBLE)
       |    / NULLIF(LEAST(1, COUNT(CASE WHEN action = 'Impression' THEN 1 END)), 0) AS ctr
       |FROM sess
       |GROUP BY screen_id, ad_id, sid""".stripMargin
}
