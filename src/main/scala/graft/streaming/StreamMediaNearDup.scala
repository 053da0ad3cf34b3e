package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Multimodal

/** Streaming perceptual near-duplicate detection for media payloads at
  * ingestion — the media-modality twin of [[StreamNearDup]] (text LSH)
  * and the unbounded form of the batch `media_near_dups` sweep: an
  * arriving image/audio/video payload is signed with the SAME 64-bit
  * gradient pHash ([[Multimodal.pHashOf]] — real `javax.imageio` luma
  * strips for decodable images, the deterministic code-point dHash
  * otherwise), banded into the batch operator's 4×16-bit blocks
  * (hamming ≤ 3 pairs share a block by pigeonhole), and flagged when a
  * band key was already seen within retention and the full-signature
  * hamming against that key's first-seen doc is within the budget.
  *
  * This completes the at-ingestion modality set: exact ([[StreamDedup]]),
  * fuzzy text ([[StreamNearDup]]), boilerplate lines
  * ([[StreamLineScrub]]), embeddings ([[StreamEmbedDedup]]),
  * contamination ([[ContaminationStream]]) — and now media payloads.
  *
  * Scale shape: the payload is consumed by the per-partition signature
  * map and NEVER shuffles — only (band, block, phash, docId, ts) rows do
  * (constant 4-row fan-out, ~40 bytes each, whatever the payload size).
  * State per band key is one (docId, tsMs, phash) triple — 24 bytes —
  * evicted by event-time timeout once the watermark passes
  * firstSeen + retention. Hamming verification happens IN the state
  * machine (the stored phash is the whole original, which is the luxury
  * a 64-bit signature family buys: [[StreamNearDup]] must trust its band
  * keys, this path confirms against the exact signature), so a chance
  * 16-bit block collision costs one popcount, not a false flag.
  *
  * Trade-offs (inherent to bounded state, shared with every detector
  * here): a near-dup of a payload older than retention is not flagged,
  * and each band key vouches only for its FIRST-seen doc — a doc whose
  * true near-original shares the block but arrived second behind a
  * chance collider is only caught through its other bands (hamming ≤ 3
  * leaves at least one of the 4 blocks intact by pigeonhole, so a miss
  * needs every such block pre-claimed by distinct chance colliders —
  * `MediaNearDupSpec` pins stream flags == batch verdicts on the gate
  * corpus under arbitrary micro-batching).
  */
object StreamMediaNearDup {

  /** One ingested media payload. */
  final case class MediaEvent(
      docId: Long, mediaType: String, bytes: Array[Byte], ts: Timestamp)

  /** One (band, block) routing row — the full signature rides along so
    * the collision check can verify exact hamming. */
  final case class BandRow(
      band: Int, nib: Long, docId: Long, phash: Long, ts: Timestamp)

  /** First-seen doc per band key, with its full signature. */
  final case class SeenState(docId: Long, tsMs: Long, phash: Long)

  /** One verified collision: `docId`'s payload is within `hamming` ≤ 3
    * signature bits of earlier `dupOf`, discovered via `band`. */
  final case class MediaHit(
      docId: Long, dupOf: Long, band: Int, hamming: Long, ts: Timestamp)

  /** Verified near-dup hits for an unbounded media stream. A doc may
    * emit one hit per colliding band; collapse on docId downstream for
    * per-doc verdicts (the [[StreamNearDup.flagged]] pattern).
    *
    * @param items          ingest stream of media payloads
    * @param watermarkDelay max out-of-orderness of `ts`
    * @param retentionMs    how long a band key vouches for "seen"
    * @param maxHamming     verification budget (the batch sweep's 3)
    */
  def candidates(
      items: Dataset[MediaEvent],
      watermarkDelay: String = "10 minutes",
      retentionMs: Long = 60L * 60L * 1000L,
      maxHamming: Long = 3L): Dataset[MediaHit] = {
    import items.sparkSession.implicits._
    val bands = items
      .mapPartitions { it =>
        it.flatMap { m =>
          // the payload dies here: only the 64-bit signature travels on
          val sig = Multimodal.pHashOf(
            Multimodal.MediaItem(m.docId, m.mediaType, m.bytes, m.bytes.length.toLong))
          Iterator.tabulate(4) { b =>
            BandRow(b, (sig >> (b * 16)) & 0xffffL, m.docId, sig, m.ts)
          }
        }
      }
      // watermark AFTER the typed map (the StreamNearDup constraint)
      .withWatermark("ts", watermarkDelay)

    bands
      .groupByKey(r => (r.band, r.nib))
      .flatMapGroupsWithState[SeenState, MediaHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, Long), rows: Iterator[BandRow], state: GroupState[SeenState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val out = Seq.newBuilder[MediaHit]
            val existing = state.getOption.orNull
            var st = existing
            val seq = rows.toSeq
            val sorted =
              if (seq.sizeIs > 1) seq.sortBy(r => (r.ts.getTime, r.docId)) else seq
            sorted.foreach { r =>
              if (st == null) st = SeenState(r.docId, r.ts.getTime, r.phash)
              else if (r.docId != st.docId) {
                val h = java.lang.Long.bitCount(r.phash ^ st.phash).toLong
                if (h <= maxHamming)
                  out += MediaHit(r.docId, st.docId, r.band, h, r.ts)
              }
            }
            // first-seen never changes once set (the StreamNearDup rule)
            if (st ne existing) {
              state.update(st)
              state.setTimeoutTimestamp(st.tsMs + retentionMs)
            }
            out.result().iterator
          }
      }
  }
}
