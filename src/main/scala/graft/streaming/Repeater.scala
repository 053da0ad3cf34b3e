package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Periodic re-emission with TTL — the Spark-native re-expression of the
  * reference's `RepeatDoFn[K, V]`
  * (`/root/reference/.../windowing/RepeatDoFn.scala:42-120`):
  *
  *  - first sighting of a key: emit immediately and arm an event-time timer
  *    at `ts + interval` (reference `:75-80`)
  *  - every sighting: overwrite the cached value and lastSeen (`:82-86`)
  *  - timer fire at T: re-emit the cached value stamped T; re-arm at
  *    `T + interval` while `T < lastSeen + ttl`, else clear state (`:99-113`)
  *
  * Implemented with `flatMapGroupsWithState` + `EventTimeTimeout`: Spark
  * evaluates timeouts once per micro-batch against the watermark, so a
  * single timeout callback may cover several elapsed intervals — the loop
  * emits every due tick up to the current watermark (matching Beam's
  * timer-at-a-time behavior observably).
  *
  * State is one small case class per key; at scale this is a key-partitioned
  * state store (RocksDB in production) — the same "unlimited as long as keys
  * are distributed evenly" scaling as the reference claims for its DoFn.
  */
object Repeater {

  /** A repeated emission: `emitTs` is the element time (first emit) or the
    * timer tick (re-emits). */
  final case class Repeated[K, V](key: K, value: V, emitTs: Timestamp, repeated: Boolean)

  final case class RepeatState[K, V](key: K, value: V, lastSeenMs: Long, nextFireMs: Long)

  /** @param interval re-emission period (reference: the fixed-window size)
    * @param ttl      stop re-emitting once `timer > lastSeen + ttl` */
  def repeat[K, V](
      input: Dataset[(K, V, Timestamp)],
      intervalMs: Long,
      ttlMs: Long)(implicit
      kEnc: Encoder[K],
      stateEnc: Encoder[RepeatState[K, V]],
      outEnc: Encoder[Repeated[K, V]]): Dataset[Repeated[K, V]] = {

    // one timer + cached value per live key = state ∝ corpus key
    // cardinality (sf1->sf10 heap-store ratio 0.45, BASELINE matrix)
    StoreAdvisory.corpusCoupled(input.sparkSession, "repeat")
    input
      .groupByKey(_._1)
      .flatMapGroupsWithState[RepeatState[K, V], Repeated[K, V]](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: K, rows: Iterator[(K, V, Timestamp)], state: GroupState[RepeatState[K, V]]) =>

        val out = Seq.newBuilder[Repeated[K, V]]

        if (state.hasTimedOut) {
          // catch up every due tick; Beam fires these as individual timers.
          // Each tick emits first, THEN checks TTL (ref :99-113 — the expiry
          // tick still produces its emission before clearing state).
          val st = state.get
          val wm = state.getCurrentWatermarkMs()
          var fire = st.nextFireMs
          var live = true
          while (live && fire <= wm) {
            out += Repeated(st.key, st.value, new Timestamp(fire), repeated = true)
            if (fire < st.lastSeenMs + ttlMs) {
              fire += intervalMs
            } else {
              live = false
            }
          }
          if (!live) {
            state.remove()
          } else {
            state.update(st.copy(nextFireMs = fire))
            state.setTimeoutTimestamp(fire)
          }
        } else {
          // process sightings in event-time order (micro-batch may batch them)
          val sorted = rows.toSeq.sortBy(_._3.getTime)
          sorted.foreach { case (_, v, ts) =>
            val tsMs = ts.getTime
            if (!state.exists) {
              // first sighting only: emit now, arm at ts + interval (ref :75-80)
              out += Repeated(key, v, ts, repeated = false)
              state.update(RepeatState(key, v, tsMs, tsMs + intervalMs))
            } else {
              // refresh cache + lastSeen silently (ref :82-86)
              val st = state.get
              state.update(st.copy(value = v, lastSeenMs = math.max(st.lastSeenMs, tsMs)))
            }
          }
          if (state.exists) state.setTimeoutTimestamp(state.get.nextFireMs)
        }
        out.result().iterator
      }
  }
}
