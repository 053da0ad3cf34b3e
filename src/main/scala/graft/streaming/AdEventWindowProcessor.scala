package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.model.{AdAction, AdEvent}
import graft.streaming.AdEventWindower.{CtrPane, WindowState}

/** `transformWithState` implementation of the custom merging ad-event
  * window — the Spark-4-native twin of [[AdEventWindower]] (same
  * observable semantics; reference:
  * `/root/reference/.../windowing/AdEventWindow.scala:19-51`,
  * `AdEventWindowFn.scala:18-37`). One `ValueState[WindowState]` holds the
  * single open window per (screenId, adId); the on-time/GC deadline is a
  * named timer that is re-registered whenever a merge moves the window
  * end. Both engines share the pane/merge arithmetic through the same
  * state type, and the scenario suite asserts they emit identically.
  */
class AdEventWindowProcessor(
    clickDurMs: Long,
    impressionDurMs: Long,
    latenessMs: Long)
  extends StatefulProcessor[(String, String), AdEvent, CtrPane] {

  @transient private var win: ValueState[WindowState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    win = getHandle.getValueState[WindowState](
      "window", Encoders.product[WindowState], TTLConfig.NONE)

  private def pane(key: (String, String), st: WindowState, emitMs: Long, late: Boolean): CtrPane =
    CtrPane(key._1, key._2, math.min(1, st.clicks), math.min(1, st.impressions),
      new Timestamp(st.startMs), new Timestamp(st.endMs), new Timestamp(emitMs), late)

  /** Fire the on-time pane / drop the window against the watermark; returns
    * the surviving state. Mirrors [[AdEventWindower]]'s settle. */
  private def settle(
      key: (String, String),
      stOpt: Option[WindowState],
      wm: Long,
      out: scala.collection.mutable.Builder[CtrPane, Seq[CtrPane]]): Option[WindowState] =
    stOpt.flatMap { st0 =>
      var st = st0
      if (!st.fired && wm >= st.endMs) {
        out += pane(key, st, st.endMs, late = false)
        st = st.copy(fired = true)
      }
      if (st.fired && wm >= st.endMs + latenessMs) None else Some(st)
    }

  private def persist(key: (String, String), stOpt: Option[WindowState]): Unit = stOpt match {
    case Some(w) =>
      win.update(w)
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(if (w.fired) w.endMs + latenessMs else w.endMs)
    case None =>
      if (win.exists()) win.clear()
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
  }

  override def handleInputRows(
      key: (String, String),
      rows: Iterator[AdEvent],
      timerValues: TimerValues): Iterator[CtrPane] = {
    val out = Seq.newBuilder[CtrPane]
    val wm = timerValues.getCurrentWatermarkInMs()
    var st: Option[WindowState] = settle(key, if (win.exists()) Some(win.get()) else None, wm, out)

    rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
      val tsMs = e.ts.getTime
      val dur = if (e.isClick) clickDurMs else impressionDurMs
      val evEnd = tsMs + dur - 1
      st match {
        case None =>
          if (wm < evEnd + latenessMs) {
            st = Some(WindowState(tsMs, evEnd, e.isClick,
              if (e.isClick) 1 else 0, if (e.isClick) 0 else 1, fired = false))
            st = settle(key, st, wm, out)
          }
        case Some(w) =>
          val newEnd =
            if (w.hasClick || e.isClick) math.max(w.startMs, tsMs) else math.max(w.endMs, evEnd)
          val merged = w.copy(
            startMs = math.min(w.startMs, tsMs),
            endMs = newEnd,
            hasClick = w.hasClick || e.isClick,
            clicks = w.clicks + (if (e.isClick) 1 else 0),
            impressions = w.impressions + (if (e.isClick) 0 else 1))
          if (merged.fired) out += pane(key, merged, merged.endMs, late = true)
          st = settle(key, Some(merged), wm, out)
      }
    }
    persist(key, st)
    out.result().iterator
  }

  override def handleExpiredTimer(
      key: (String, String),
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[CtrPane] = {
    val out = Seq.newBuilder[CtrPane]
    val wm = timerValues.getCurrentWatermarkInMs()
    val st = settle(key, if (win.exists()) Some(win.get()) else None, wm, out)
    persist(key, st)
    out.result().iterator
  }
}

object AdEventWindowProcessor {

  /** Drop-in alternative to [[AdEventWindower.ctrByScreen]] on the
    * `transformWithState` engine. */
  def ctrByScreen(
      events: Dataset[AdEvent],
      clickDurMs: Long = 60000L,
      impressionDurMs: Long = 600000L,
      latenessMs: Long = 0L,
      watermarkDelay: String = "0 seconds"): Dataset[CtrPane] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .where(col("action") =!= AdAction.Unknown)
      .withWatermark("ts", watermarkDelay)
      .groupByKey(e => (e.screenId, e.id))
      .transformWithState(
        new AdEventWindowProcessor(clickDurMs, impressionDurMs, latenessMs),
        TimeMode.EventTime(),
        OutputMode.Append(),
        implicitly[org.apache.spark.sql.Encoder[CtrPane]])
  }
}
