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
  * single timeout slot. Two operational preconditions for the O(1) claim,
  * both load-bearing (each was found as a pegged single core in a bench):
  * `spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows=false`
  * (on, Spark's default, every merge GETs the whole accumulated list for
  * the numRows metric → n appends read O(n²) bytes; GraftSession sets it
  * off), and the per-key-batch ValueState discipline in
  * [[handleInputRows]] (every exists/get/update is a real store op).
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

    // Each ValueState cell is read ONCE per (key, micro-batch) and written
    // back at most once — every `exists()`/`get()`/`update()` here is a
    // real store op (a RocksDB get/put), and the first cut of this method
    // paid several per ELEMENT, which benched 2-6x slower than the fMGWS
    // twin's one-blob-per-key discipline instead of beating it. Only the
    // buffer appends stay per-element: that O(1) `appendValue` is the
    // ListState advantage this processor exists for.
    var latestLoc: Option[(Long, L)] = if (latest.exists()) Some(latest.get()) else None
    var latestDirty = false
    var bufEmpty = !buffer.exists()
    val hadMax = maxTs.exists()
    val maxAtEntry = if (hadMax) maxTs.get() else Long.MinValue
    var maxLoc = maxAtEntry

    def flushBuffer(lk: Some[L], ts: Timestamp): Unit = {
      buffer.get().foreach { v => out += Enriched(key, v, lk, ts) }
      buffer.clear()
      bufEmpty = true
    }

    sorted.foreach { elem =>
      val tsMs = elem.ts.getTime
      elem.lookup.foreach { l =>
        // cacheAndGetLookup: latest-wins on element timestamp (ref :135-161)
        if (latestLoc.forall(tsMs >= _._1)) {
          latestLoc = Some((tsMs, l)); latestDirty = true
        }
        // lookup arrival flushes the buffer at the lookup's ts (ref :98-101)
        if (!bufEmpty) flushBuffer(Some(latestLoc.get._2), elem.ts)
      }
      elem.value.foreach { v =>
        latestLoc match {
          case Some((_, l)) =>
            if (!bufEmpty) flushBuffer(Some(l), elem.ts)
            out += Enriched(key, v, Some(l), elem.ts)
          case None =>
            buffer.appendValue(v) // O(1) RocksDB append (ref :94-97)
            bufEmpty = false
        }
      }
      if (tsMs > maxLoc) maxLoc = tsMs
    }

    if (latestDirty) latest.update(latestLoc.get)
    if (!hadMax || maxLoc > maxAtEntry) maxTs.update(maxLoc)

    // re-arm the GC timer at maxTsSeen + ttl (ref :195-209) — only when a
    // timestamp was actually seen (prior state or this batch's rows): an
    // empty-iterator invocation for a stateless key would otherwise arm a
    // timer at Long.MinValue + ttl, which fires immediately.
    if (maxLoc != Long.MinValue) {
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(maxLoc + ttlMs)
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
    val union = LookupCacheJoin.observeArrivals(
      taggedValues.union(taggedLookups).withWatermark("ts", watermarkDelay))

    union
      .groupByKey(_.key)
      .transformWithState(
        new LookupCacheProcessor[K, V, L](ttlMs),
        TimeMode.EventTime(),
        OutputMode.Append(),
        outEnc)
  }
}
