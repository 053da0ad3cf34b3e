package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.{AdAction, AdEvent}

/** Faithful re-expression of the reference's custom merging per-key
  * "ad-event window" (W5):
  * `/root/reference/.../windowing/AdEventWindow.scala:19-51` (merge rule),
  * `AdEventWindowFn.scala:18-37` (assign + merge-all-per-key),
  * `AdCtrCustomWindowCalculator.scala` (capped-semigroup CTR on top).
  *
  * Semantics, as pinned by `AdCtrCustomWindowCalculatorTest`:
  *  - an impression at t opens [t, t + 10 min − 1 ms]; a click at t opens
  *    [t, t + 1 min − 1 ms] (`AdEventWindow.scala:75-85`)
  *  - Beam's `mergeWindows` merges ALL live windows of a (screenId, adId)
  *    key — not only overlapping ones — so the per-key state is always a
  *    single open window. Merge: start = min(starts); end = max(starts) if
  *    either side is a click, else max(ends); isClick = either
  *    (`AdEventWindow.scala:29-42`). A click therefore snaps the window
  *    shut at the latest event time → low-latency emission.
  *  - the pane timestamp is the window's `maxTimestamp = end`
  *    (`AdEventWindow.scala:53`).
  *  - trigger ≙ W6: on-time pane when the watermark passes `end`; state
  *    retained `allowedLateness` past `end` for accumulating late panes
  *    (emitted immediately per late merge); beyond that the window is
  *    dropped and later events open fresh windows.
  *
  * Spark mapping: `flatMapGroupsWithState` keyed by (screenId, adId) with
  * event-time timeout at `end` (on-time pane) then `end + lateness` (GC).
  * Because Spark delivers new data and timeouts in separate activations,
  * the data path replays any due on-time-fire/expiry against the current
  * watermark before merging new events.
  *
  * At scale this is a key-partitioned state store with O(1) state per
  * (screen, ad) pair — the same "unlimited if keys are even" contract as
  * the reference's DoFn, with RocksDB state at production volumes.
  */
object AdEventWindower {

  /** One fired pane. `late` = accumulating refinement after the on-time
    * pane (Beam's late firing). */
  final case class CtrPane(
      screenId: String,
      adId: String,
      clicks: Int,
      impressions: Int,
      windowStart: Timestamp,
      windowEnd: Timestamp,
      emitTs: Timestamp,
      late: Boolean)

  final case class WindowState(
      startMs: Long,
      endMs: Long,
      hasClick: Boolean,
      clicks: Int,
      impressions: Int,
      fired: Boolean)

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
      .flatMapGroupsWithState[WindowState, CtrPane](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (String, String), rows: Iterator[AdEvent], state: GroupState[WindowState]) =>

        val (screenId, adId) = key
        val out = Seq.newBuilder[CtrPane]
        val wm = state.getCurrentWatermarkMs()

        def pane(st: WindowState, emitMs: Long, late: Boolean): CtrPane =
          CtrPane(screenId, adId, math.min(1, st.clicks), math.min(1, st.impressions),
            new Timestamp(st.startMs), new Timestamp(st.endMs), new Timestamp(emitMs), late)

        // Fire the on-time pane / drop the window if the watermark has
        // passed; shared by the timeout path and the pre-merge replay.
        def settle(stOpt: Option[WindowState]): Option[WindowState] = stOpt.flatMap { st0 =>
          var st = st0
          if (!st.fired && wm >= st.endMs) {
            out += pane(st, st.endMs, late = false)
            st = st.copy(fired = true)
          }
          if (st.fired && wm >= st.endMs + latenessMs) None else Some(st)
        }

        var st: Option[WindowState] = settle(state.getOption)

        if (!state.hasTimedOut) {
          rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val tsMs = e.ts.getTime
            val dur = if (e.isClick) clickDurMs else impressionDurMs
            val evEnd = tsMs + dur - 1
            st match {
              case None =>
                // open a fresh window unless it is already expired
                if (wm < evEnd + latenessMs) {
                  st = Some(WindowState(tsMs, evEnd, e.isClick,
                    if (e.isClick) 1 else 0, if (e.isClick) 0 else 1, fired = false))
                  st = settle(st) // a very late event may fire immediately
                }
              case Some(w) =>
                // AdEventWindow.merge: end = max(starts) if any click
                val newEnd =
                  if (w.hasClick || e.isClick) math.max(w.startMs, tsMs) else math.max(w.endMs, evEnd)
                val merged = w.copy(
                  startMs = math.min(w.startMs, tsMs),
                  endMs = newEnd,
                  hasClick = w.hasClick || e.isClick,
                  clicks = w.clicks + (if (e.isClick) 1 else 0),
                  impressions = w.impressions + (if (e.isClick) 0 else 1))
                if (merged.fired) {
                  // accumulating late pane, emitted at the new window end
                  out += pane(merged, merged.endMs, late = true)
                }
                st = settle(Some(merged))
            }
          }
        }

        st match {
          case Some(w) =>
            state.update(w)
            state.setTimeoutTimestamp(if (w.fired) w.endMs + latenessMs else w.endMs)
          case None =>
            if (state.exists) state.remove()
        }
        out.result().iterator
      }
  }
}
