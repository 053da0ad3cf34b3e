package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.streaming.LookupCacheJoin.{Enriched, Tagged}

/** `transformWithState` implementation of the TTL lookup-cache join — the
  * Spark-4-native twin of [[LookupCacheJoin]] (same observable semantics,
  * same reference: `/root/reference/.../windowing/LookupCacheDoFn
  * .scala:33-211`), using the `StatefulProcessor` API that maps 1:1 onto
  * the reference's state cells:
  *
  * | reference (`LookupCacheDoFn`)          | here                        |
  * |----------------------------------------|-----------------------------|
  * | `BagState[V]` buffered rows (`:64`)    | `ListState[V]` "buffer"     |
  * | `ValueState[(Instant, Lookup)]` (`:67`)| `ValueState` "latest"       |
  * | `CombiningState` max-ts (`:70-72`)     | `ValueState[Long]` "maxTs"  |
  * | event-time GC timer (`:74-75`)         | `registerTimer` (EventTime) |
  *
  * Why this beats `flatMapGroupsWithState` at 100 TB: the buffer is a
  * RocksDB ListState, so buffering one more row is an O(1) append
  * (`appendValue`), not a read-modify-write of one monolithic state blob;
  * and each state cell is read only when touched. The timer is a real
  * named timer — re-arming deletes the old one instead of overloading a
  * single timeout slot.
  */
class LookupCacheProcessor[K, V, L](
    ttlMs: Long)(implicit
    vEnc: Encoder[V],
    latestEnc: Encoder[(Long, L)])
  extends StatefulProcessor[K, Tagged[K, V, L], Enriched[K, V, L]] {

  @transient private var buffer: ListState[V] = _
  @transient private var latest: ValueState[(Long, L)] = _
  @transient private var maxTs: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buffer = getHandle.getListState[V]("buffer", vEnc, TTLConfig.NONE)
    latest = getHandle.getValueState[(Long, L)]("latest", latestEnc, TTLConfig.NONE)
    maxTs = getHandle.getValueState[Long]("maxTs", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(
      key: K,
      rows: Iterator[Tagged[K, V, L]],
      timerValues: TimerValues): Iterator[Enriched[K, V, L]] = {
    val out = Seq.newBuilder[Enriched[K, V, L]]

    // event-time order; lookups before values at equal ts (the cogrouped
    // element's resolve-then-emit order, ref :94-104)
    val sorted = rows.toSeq.sortBy(t => (t.ts.getTime, if (t.lookup.isDefined) 0 else 1))

    sorted.foreach { elem =>
      val tsMs = elem.ts.getTime
      elem.lookup.foreach { l =>
        val newer = !latest.exists() || tsMs >= latest.get()._1
        if (newer) latest.update((tsMs, l))
        if (latest.exists() && buffer.exists()) {
          val lk = Some(latest.get()._2)
          buffer.get().foreach { v => out += Enriched(key, v, lk, elem.ts) }
          buffer.clear()
        }
      }
      elem.value.foreach { v =>
        if (latest.exists()) {
          val lk = Some(latest.get()._2)
          if (buffer.exists()) {
            buffer.get().foreach { b => out += Enriched(key, b, lk, elem.ts) }
            buffer.clear()
          }
          out += Enriched(key, v, lk, elem.ts)
        } else {
          buffer.appendValue(v) // O(1) RocksDB append (ref :94-97)
        }
      }
      val newMax = math.max(if (maxTs.exists()) maxTs.get() else Long.MinValue, tsMs)
      maxTs.update(newMax)
    }

    // re-arm the GC timer at maxTsSeen + ttl (ref :195-209)
    if (maxTs.exists()) {
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(maxTs.get() + ttlMs)
    }
    out.result().iterator
  }

  override def handleExpiredTimer(
      key: K,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[Enriched[K, V, L]] = {
    // GC fire: flush buffer with None → DLQ, clear all state (ref :112-130)
    val fireTs = new Timestamp(expiredTimerInfo.getExpiryTimeInMs())
    val out = if (buffer.exists())
      buffer.get().map(v => Enriched[K, V, L](key, v, None, fireTs)).toSeq
    else Seq.empty
    buffer.clear(); latest.clear(); maxTs.clear()
    out.iterator
  }
}

object LookupCacheProcessor {

  /** Drop-in alternative to [[LookupCacheJoin.join]] on the
    * `transformWithState` engine. */
  def join[K, V, L](
      values: Dataset[(K, V, Timestamp)],
      lookups: Dataset[(K, L, Timestamp)],
      ttlMs: Long,
      watermarkDelay: String = "0 seconds")(implicit
      kEnc: Encoder[K],
      vEnc: Encoder[V],
      taggedEnc: Encoder[Tagged[K, V, L]],
      latestEnc: Encoder[(Long, L)],
      outEnc: Encoder[Enriched[K, V, L]]): Dataset[Enriched[K, V, L]] = {

    val taggedValues = values.map { case (k, v, ts) => Tagged[K, V, L](k, Some(v), None, ts) }
    val taggedLookups = lookups.map { case (k, l, ts) => Tagged[K, V, L](k, None, Some(l), ts) }
    val union = taggedValues.union(taggedLookups).withWatermark("ts", watermarkDelay)

    union
      .groupByKey(_.key)
      .transformWithState(
        new LookupCacheProcessor[K, V, L](ttlMs),
        TimeMode.EventTime(),
        OutputMode.Append(),
        outEnc)
  }
}
