package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Keyed lookup-cache join with TTL + GC timer — the Spark-native
  * re-expression of the reference's `LookupCacheDoFn[K, V, Lookup]`
  * (`/root/reference/.../windowing/LookupCacheDoFn.scala:33-211`):
  *
  *  - per keyed element, resolve the latest lookup with latest-wins
  *    timestamp compare (`cacheAndGetLookup`, ref `:135-161`)
  *  - no lookup known yet → buffer left rows (ref `:94-97`)
  *  - lookup known → flush buffered rows + current rows enriched, stamped
  *    at the current element time (ref `:98-104`, `outputCachedValues`)
  *  - GC timer at `maxTimestampSeen + ttl`: emit still-buffered rows with
  *    `None` (→ DLQ) and clear all state (ref `:112-130`)
  *
  * Beam cogroups both sides; here the two streams are unioned as tagged
  * rows, keyed, and processed in event-time order inside one
  * `flatMapGroupsWithState` group — a lookup sorts before a value at the
  * same timestamp, mirroring the cogrouped element's resolve-then-emit
  * order.
  *
  * The reference holds the output watermark at `maxTimestampSeen`
  * (`gcTimer.withOutputTimestamp`, ref `:209`); Spark has no user-level
  * watermark hold, so GC emissions are late relative to downstream
  * watermarks — keep this operator terminal or give downstream generous
  * delays (SURVEY.md §7.5.4).
  */
object LookupCacheJoin {

  /** Tagged union element: exactly one of `value` / `lookup` is set. */
  final case class Tagged[K, V, L](key: K, value: Option[V], lookup: Option[L], ts: Timestamp)

  /** Enriched output: `lookup = None` marks a DLQ row (GC-flushed). */
  final case class Enriched[K, V, L](key: K, value: V, lookup: Option[L], emitTs: Timestamp)

  final case class CacheState[K, V, L](
      key: K,
      buffered: List[V],
      lookupTsMs: Option[Long],
      lookupValue: Option[L],
      maxTsSeenMs: Long)

  /** @param watermarkDelay applied to the unioned tagged stream's `ts`; it
    *   must be set here (not upstream) because a typed `.map` erases the
    *   event-time column metadata Spark's event-time timeout requires. */
  def join[K, V, L](
      values: Dataset[(K, V, Timestamp)],
      lookups: Dataset[(K, L, Timestamp)],
      ttlMs: Long,
      watermarkDelay: String = "0 seconds")(implicit
      kEnc: Encoder[K],
      taggedEnc: Encoder[Tagged[K, V, L]],
      stateEnc: Encoder[CacheState[K, V, L]],
      outEnc: Encoder[Enriched[K, V, L]]): Dataset[Enriched[K, V, L]] = {

    // one TTL cache entry per live key = state ∝ corpus key cardinality
    // (sf1->sf10 heap-store ratios 0.56-0.66, BASELINE matrix)
    StoreAdvisory.corpusCoupled(values.sparkSession, "lookup-cache join")
    val taggedValues = values.map { case (k, v, ts) => Tagged[K, V, L](k, Some(v), None, ts) }
    val taggedLookups = lookups.map { case (k, l, ts) => Tagged[K, V, L](k, None, Some(l), ts) }
    val union = observeArrivals(
      taggedValues.union(taggedLookups).withWatermark("ts", watermarkDelay))

    union
      .groupByKey(_.key)
      .flatMapGroupsWithState[CacheState[K, V, L], Enriched[K, V, L]](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: K, rows: Iterator[Tagged[K, V, L]], state: GroupState[CacheState[K, V, L]]) =>

        val out = Seq.newBuilder[Enriched[K, V, L]]

        if (state.hasTimedOut) {
          // GC fire: flush buffer with None → DLQ, clear state (ref :112-130)
          val st = state.get
          val fireTs = new Timestamp(st.maxTsSeenMs + ttlMs)
          st.buffered.foreach { v => out += Enriched(key, v, None, fireTs) }
          state.remove()
        } else {
          var st = state.getOption.getOrElse(
            CacheState[K, V, L](key, Nil, None, None, Long.MinValue))

          // event-time order; lookups (tag 0) before values at equal ts,
          // matching the cogrouped element's resolve-then-emit order
          val sorted = rows.toSeq.sortBy(t => (t.ts.getTime, if (t.lookup.isDefined) 0 else 1))

          sorted.foreach { elem =>
            val tsMs = elem.ts.getTime
            elem.lookup.foreach { l =>
              // cacheAndGetLookup: latest-wins on element timestamp (ref :135-161)
              val newer = st.lookupTsMs.forall(cached => tsMs >= cached)
              if (newer) st = st.copy(lookupTsMs = Some(tsMs), lookupValue = Some(l))
              // lookup arrival flushes the buffer at the lookup's ts (ref :98-101)
              if (st.lookupValue.isDefined && st.buffered.nonEmpty) {
                st.buffered.reverse.foreach { v =>
                  out += Enriched(key, v, st.lookupValue, elem.ts)
                }
                st = st.copy(buffered = Nil)
              }
            }
            elem.value.foreach { v =>
              st.lookupValue match {
                case some @ Some(_) =>
                  // enrich immediately, flushing anything buffered first
                  st.buffered.reverse.foreach { b => out += Enriched(key, b, some, elem.ts) }
                  st = st.copy(buffered = Nil)
                  out += Enriched(key, v, some, elem.ts)
                case None =>
                  st = st.copy(buffered = v :: st.buffered) // ref :94-97
              }
            }
            st = st.copy(maxTsSeenMs = math.max(st.maxTsSeenMs, tsMs))
          }

          state.update(st)
          // GC timer keyed off max timestamp seen (ref :195-209)
          state.setTimeoutTimestamp(st.maxTsSeenMs + ttlMs)
        }
        out.result().iterator
      }
  }

  /** Name of the per-batch observed-metrics row both lookup-cache engines
    * attach to their unioned input ([[observeArrivals]]). */
  val arrivalsMetric = "graft_lookup_cache_arrivals"

  /** Attaches per-batch arrival counts to the tagged union: `n_values`,
    * `n_lookups`, and `min_ts`/`max_ts` (epoch ms) — read from
    * `StreamingQueryProgress.observedMetrics` under [[arrivalsMetric]].
    *
    * Why it exists: a lookup stamped behind the union's watermark is
    * dropped by the engine BEFORE the stateful function sees it (bench
    * defect, round 6: a 0 s delay let the value side's micro-batch
    * advance the watermark past batch-start-stamped lookups — the lookup
    * never resolved and every value buffered forever, with no visible
    * signal). The arrival counts plus [[lateDrops]] make that
    * misconfiguration observable per batch instead of a silent state
    * leak. */
  private[streaming] def observeArrivals[K, V, L](
      union: Dataset[Tagged[K, V, L]]): Dataset[Tagged[K, V, L]] = {
    import org.apache.spark.sql.functions._
    union.observe(arrivalsMetric,
      count(when(col("value").isNotNull, 1)).as("n_values"),
      count(when(col("lookup").isNotNull, 1)).as("n_lookups"),
      min(unix_millis(col("ts"))).as("min_ts"),
      max(unix_millis(col("ts"))).as("max_ts"))
  }

  /** Rows the engine dropped as late at this query's stateful operator(s)
    * in one progress — values and lookups combined (Spark's
    * `numRowsDroppedByWatermark` doesn't distinguish; pair it with the
    * [[arrivalsMetric]] counts to attribute). Nonzero on a lookup-cache
    * join means the watermark delay is too tight for the lookup side's
    * lag: enrichments quietly stop resolving and values buffer until GC.
    * Sum it across a run via a `StreamingQueryListener` or by polling
    * `query.recentProgress`. */
  def lateDrops(p: org.apache.spark.sql.streaming.StreamingQueryProgress): Long =
    p.stateOperators.map(_.numRowsDroppedByWatermark).sum
}
