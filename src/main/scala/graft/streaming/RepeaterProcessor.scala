package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.streaming.Repeater.Repeated

/** `transformWithState` implementation of the periodic repeater — the
  * Spark-4-native twin of [[Repeater]] (same observable semantics; the
  * reference contract is `RepeatDoFn`,
  * `/root/reference/.../windowing/RepeatDoFn.scala:42-120`). The state
  * cells map 1:1: `ValueState` cache (`:52-54`), `ValueState` lastSeen
  * (`:56-58`), and a real named event-time timer (`:60-61`) instead of
  * the single overloaded timeout slot — a timer registered once persists
  * until fired or deleted, so the data path never has to re-arm it.
  *
  * A fired timer catches up every due tick against the current watermark
  * (Spark evaluates timers once per micro-batch; Beam fires each timer
  * individually — observably identical given the catch-up loop).
  */
class RepeaterProcessor[K, V](
    intervalMs: Long,
    ttlMs: Long)(implicit vEnc: Encoder[V])
  extends StatefulProcessor[K, (K, V, Timestamp), Repeated[K, V]] {

  @transient private var cache: ValueState[V] = _
  @transient private var lastSeen: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    cache = getHandle.getValueState[V]("cache", vEnc, TTLConfig.NONE)
    lastSeen = getHandle.getValueState[Long]("lastSeen", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(
      key: K,
      rows: Iterator[(K, V, Timestamp)],
      timerValues: TimerValues): Iterator[Repeated[K, V]] = {
    val out = Seq.newBuilder[Repeated[K, V]]
    // One state read per (key, micro-batch), one write-back at the end:
    // every ValueState touch is a real store op (RocksDB get/put), so the
    // refresh loop runs on locals — same discipline as
    // [[LookupCacheProcessor.handleInputRows]].
    var cached = cache.exists()
    var lastLoc = if (cached) lastSeen.get() else Long.MinValue
    var valueLoc: Option[V] = None
    rows.toSeq.sortBy(_._3.getTime).foreach { case (_, v, ts) =>
      val tsMs = ts.getTime
      if (!cached) {
        // first sighting: emit immediately + arm at ts + interval (ref :75-80)
        out += Repeated(key, v, ts, repeated = false)
        cached = true
        lastLoc = tsMs
        getHandle.registerTimer(tsMs + intervalMs)
      } else {
        // refresh cache + lastSeen silently (ref :82-86)
        lastLoc = math.max(lastLoc, tsMs)
      }
      valueLoc = Some(v)
    }
    valueLoc.foreach(cache.update)
    if (valueLoc.isDefined) lastSeen.update(lastLoc)
    out.result().iterator
  }

  override def handleExpiredTimer(
      key: K,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[Repeated[K, V]] = {
    val out = Seq.newBuilder[Repeated[K, V]]
    val wm = timerValues.getCurrentWatermarkInMs()
    var fire = expiredTimerInfo.getExpiryTimeInMs()
    var live = cache.exists()
    while (live && fire <= wm) {
      // each tick emits first, THEN checks TTL (ref :99-113)
      out += Repeated(key, cache.get(), new Timestamp(fire), repeated = true)
      if (fire < lastSeen.get() + ttlMs) fire += intervalMs else live = false
    }
    if (!live) {
      cache.clear(); lastSeen.clear()
    } else {
      getHandle.registerTimer(fire)
    }
    out.result().iterator
  }
}

object RepeaterProcessor {

  /** Drop-in alternative to [[Repeater.repeat]] on the
    * `transformWithState` engine. Input must carry its watermark on `_3`. */
  def repeat[K, V](
      input: Dataset[(K, V, Timestamp)],
      intervalMs: Long,
      ttlMs: Long)(implicit
      kEnc: Encoder[K],
      vEnc: Encoder[V],
      outEnc: Encoder[Repeated[K, V]]): Dataset[Repeated[K, V]] =
    input
      .groupByKey(_._1)
      .transformWithState(
        new RepeaterProcessor[K, V](intervalMs, ttlMs),
        TimeMode.EventTime(),
        OutputMode.Append(),
        outEnc)
}
