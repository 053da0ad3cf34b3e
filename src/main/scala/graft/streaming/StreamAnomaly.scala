package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch `ingest_anomaly` report: per
  * (event_type, day) ingest-volume z-scores, emitted AS EACH DAY CLOSES
  * under the watermark instead of retrospectively over the full history.
  *
  * Semantics differ from the batch operator by exactly the information
  * available at emission time, and deliberately so: the batch report
  * judges every day against the WHOLE history (it runs after the fact);
  * the stream judges a day against the history UP TO AND INCLUDING
  * itself — the prospective verdict an ingest monitor can actually act
  * on (the batch `StreamLineScrub` running-df precedent: same statistic,
  * prefix-causal reading). The spec pins the stream against a
  * sequential day-ordered sweep with the same prefix semantics, under
  * arbitrary micro-batching.
  *
  * State per event type: the running moments (n, Σc, Σc²) — three longs,
  * exact integers, so the variance is identical no matter how the
  * history was micro-batched — plus the open-day counters still inside
  * the watermark (bounded by the watermark delay in days, not by
  * volume). Day closure is driven by the event-time watermark: on every
  * invocation the group folds any buffered day whose end has passed the
  * watermark into the moments (in day order) and emits its verdict; a
  * type with no new arrivals closes its buffered days through an
  * event-time timeout armed at the earliest open day's end. At 100 TB/day
  * the state is sources × (3 longs + ≤delay-days counters) and the only
  * shuffle is the event_type key exchange of (type, ts) pairs. */
object StreamAnomaly {

  final case class Ev(event_type: String, ts: java.sql.Timestamp)
  final case class Verdict(
      event_type: String, day: Long, n_events: Long,
      z: Option[Double], is_anomaly: Boolean)
  // NOT private: Spark's generated row (de)serializer must access it
  final case class St(n: Long, s: Long, s2: Long, open: Map[Long, Long])

  private val dayMs = 86400000L

  /** events: streaming frame with `event_type: string, ts: timestamp`.
    * Emits one verdict per (type, day) as the day closes. `wmDelay` is
    * the source's reordering allowance; rows later than it are dropped
    * by the watermark BEFORE the state op (standard event-time
    * semantics — with "0 seconds" even a timestamp TIE across a
    * micro-batch boundary is late). */
  def verdicts(events: DataFrame, wmDelay: String = "1 hour"): Dataset[Verdict] = {
    val sp = events.sparkSession
    import sp.implicits._
    events.select(col("event_type"), col("ts"))
      .withWatermark("ts", wmDelay)
      .as[Ev]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (et: String, rows: Iterator[Ev], st: GroupState[St]) => {
          var s = st.getOption.getOrElse(St(0L, 0L, 0L, Map.empty))
          rows.foreach { e =>
            val day = Math.floorDiv(e.ts.getTime, dayMs)
            s = s.copy(open = s.open.updated(day, s.open.getOrElse(day, 0L) + 1L))
          }
          val wm = st.getCurrentWatermarkMs()
          val closed = s.open.keys.filter(d => (d + 1) * dayMs <= wm).toSeq.sorted
          val out = closed.map { d =>
            val c = s.open(d)
            s = St(s.n + 1, s.s + c, s.s2 + c * c, s.open - d)
            val n = s.n.toDouble
            val mean = s.s / n
            val varr = (s.s2 - s.s.toDouble * s.s / n) / n
            val zRaw = if (varr > 0) Some((c - mean) / math.sqrt(varr)) else None
            Verdict(et, d, c,
              zRaw.map(z => math.rint(z * 10000.0) / 10000.0),
              zRaw.exists(z => math.abs(z) > 3.0))
          }
          st.update(s)
          // wake this type when the watermark passes its earliest open
          // day's end, even if no further events arrive for it
          s.open.keys.minOption.foreach(d =>
            st.setTimeoutTimestamp(math.max((d + 1) * dayMs, wm + 1)))
          out.iterator
        })
  }
}
