package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** Streaming MinHash-LSH near-duplicate detection at ingestion — the
  * unbounded twin of the batch `minhash_lsh_pairs` sweep (and the fuzzy
  * sibling of [[StreamDedup]]'s exact path).
  *
  * A training-data pipeline at 100 TB cannot afford to re-run the batch
  * LSH self-join on every ingest increment; the streaming form keeps the
  * last `retention` of band keys as keyed state and flags each arriving
  * document whose signature collides with an already-seen document in any
  * band — the same candidate definition as the batch operator, under the
  * fast 64-bit hash family (`Dedup.fastSignatureOf`/`fastBandKeysOf`): the
  * batch surface hashes with md5 because its every stage is DuckDB-oracle
  * checked, but this path has no oracle leg — its contract is "stream
  * collisions ≡ a batch band sweep run with the SAME family", which
  * `StreamNearDupSpec` pins against a same-family driver-side sweep. The
  * fast kernel (numeric minima, long band keys, no per-shingle digest or
  * string allocation) is what makes at-ingestion detection keep up with
  * the other streaming legs instead of running ~10× below them.
  *
  * Scale shape: one doc → 4 band rows (constant fan-out), one shuffle on
  * the band key, state = one (docId, ts) pair per distinct band key seen
  * within retention, evicted by event-time timeout once the watermark
  * passes `firstSeenTs + retention`. Partitioned by band key — the same
  * even-distribution contract as every keyed operator here; band keys are
  * mixes of 2 full-width minhash minima, so hot keys only arise from
  * genuinely mass-duplicated content (boilerplate), which is exactly what
  * the detector exists to surface.
  *
  * Trade-offs (inherent to bounded state, mirroring [[StreamDedup]]):
  * a near-dup of a document older than `retention` is not flagged, and
  * the "original" is the earliest-by-(ts, docId) document seen so far —
  * out-of-order arrival within a micro-batch is resolved by sorting, but
  * an original arriving AFTER its duplicate's batch was processed cannot
  * retroactively re-attribute the hit.
  */
object StreamNearDup {

  /** One ingested document. */
  final case class DocEvent(docId: Long, text: String, ts: Timestamp)

  /** One (band key, doc) routing row — public because encoder codegen
    * must reach it from generated projections. `key` is the fast-family
    * 64-bit band key (band index mixed in first); `band` rides along so
    * hits can report which band collided without re-deriving it. */
  final case class BandRow(key: Long, band: Int, docId: Long, ts: Timestamp)

  /** First-seen doc per band key. */
  final case class SeenState(docId: Long, tsMs: Long)

  /** One band collision: `docId` shares `band`'s key with earlier
    * `dupOf`. A doc colliding in several bands emits one hit per band;
    * [[flagged]] collapses them to one verdict per doc. */
  final case class BandHit(docId: Long, dupOf: Long, band: Int, ts: Timestamp)

  /** Per-band collision events for an unbounded document stream.
    *
    * @param docs           ingest stream
    * @param watermarkDelay max out-of-orderness of `ts`
    * @param retentionMs    how long a band key can vouch for "seen";
    *                       state for a key is dropped once the watermark
    *                       passes firstSeen + retention
    */
  def candidates(
      docs: Dataset[DocEvent],
      watermarkDelay: String = "10 minutes",
      retentionMs: Long = 60L * 60L * 1000L): Dataset[BandHit] = {
    import docs.sparkSession.implicits._
    val bands = docs
      .mapPartitions { it =>
        it.flatMap { d =>
          val keys = Dedup.fastBandKeysOf(Dedup.fastSignatureOf(d.text))
          Iterator.tabulate(keys.length)(b => BandRow(keys(b), b, d.docId, d.ts))
        }
      }
      // watermark AFTER the typed map — a typed .map erases event-time
      // column metadata (same constraint as LookupCacheJoin.join)
      .withWatermark("ts", watermarkDelay)

    bands
      .groupByKey(_.key)
      .flatMapGroupsWithState[SeenState, BandHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[BandRow], state: GroupState[SeenState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val out = Seq.newBuilder[BandHit]
            // earliest-by-(ts, docId) is the original; sort restores
            // event-time order within the micro-batch (skipped for the
            // dominant singleton-group case)
            val existing = state.getOption.orNull
            var st = existing
            val seq = rows.toSeq
            val sorted =
              if (seq.sizeIs > 1) seq.sortBy(r => (r.ts.getTime, r.docId)) else seq
            sorted.foreach { r =>
              if (st == null) st = SeenState(r.docId, r.ts.getTime)
              else if (r.docId != st.docId)
                out += BandHit(r.docId, st.docId, r.band, r.ts)
            }
            // the original never changes once set, so an existing group's
            // state AND its timeout (firstSeen + retention) are already
            // right — write only on first sight, not per batch
            if (st ne existing) {
              state.update(st)
              state.setTimeoutTimestamp(st.tsMs + retentionMs)
            }
            out.result().iterator
          }
      }
  }

  /** One verdict per document: a doc's first band collision, collapsed to
    * a single row however many bands collide. Chains a second stateful
    * stage (dedup on docId) after the fMGWS stage; Spark's conservative
    * global-watermark check cannot prove fMGWS output timestamps are
    * watermark-safe and rejects the chain, so callers must set
    * `spark.sql.streaming.statefulOperator.checkCorrectness.enabled=false`
    * for this query. It IS safe here: every hit is stamped at the
    * triggering row's event time, which by upstream admission is within
    * `watermarkDelay` of the watermark — the downstream dedup never sees
    * a row it would discard as late (same reasoning as
    * [[LookupCacheJoin]]'s "keep terminal or give downstream generous
    * delays" contract, SURVEY.md §7.5.4). */
  def flagged(
      docs: Dataset[DocEvent],
      watermarkDelay: String = "10 minutes",
      retentionMs: Long = 60L * 60L * 1000L): Dataset[(Long, Long)] = {
    import docs.sparkSession.implicits._
    candidates(docs, watermarkDelay, retentionMs)
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("docId")
      .map(h => (h.docId, h.dupOf))
  }
}
