package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.VectorFunctions
import graft.operators.Dedup

/** Streaming embedding near-duplicate detection at ingestion — the
  * EMBEDDING modality of the at-ingestion curation set, next to
  * [[StreamDedup]] (exact text), [[StreamNearDup]] (fuzzy text),
  * [[StreamLineScrub]] (boilerplate lines) and [[ContaminationStream]]
  * (eval leakage): the unbounded twin of the batch
  * `embedding_near_dups` sweep.
  *
  * Each arriving vector is signed with the SAME deterministic ±1
  * hyperplane family the batch operator uses
  * ([[VectorFunctions.planesFor]] — 8 bands × `bitsPerBand` sign bits),
  * banded, and flagged when any band key was seen within retention. A
  * streamed collision is therefore exactly a batch band collision (at
  * the same `bitsPerBand`) restricted to the retention horizon — and
  * since the batch operator's VERIFIED pairs are a subset of its band
  * collisions, every batch near-dup pair whose earlier member arrived
  * first is guaranteed to surface here (candidate completeness; the
  * spec pins it against the real batch sweep).
  *
  * The guarantee is PER-`bitsPerBand`: the batch default self-sizes b
  * via `Similarity.bitsForCount` (2 at verification scale, up to 8 at
  * web scale), so a deployment running the batch sweep at a wider b
  * must pass the SAME b here — the default 2 mirrors the committed
  * batch/oracle parameterization, and a larger b narrows bands on both
  * sides identically (same planes, same bit layout).
  *
  * Like the batch candidates stage, this flags CANDIDATES: state per
  * band key is one (vecId, ts) pair — never the vector itself, so state
  * stays a few dozen bytes per distinct band key and exact-cosine
  * verification (which needs both vectors) runs downstream on the tiny
  * flagged stream, the same candidates-then-verify split the batch
  * pipeline is audited for.
  *
  * Scale shape: one vector → 8 band rows (constant fan-out), one
  * shuffle on the 64-bit band key, event-time eviction at
  * firstSeen + retention — the [[StreamNearDup]] contract, applied to
  * the embedding column.
  */
object StreamEmbedDedup {

  /** One ingested embedding. */
  final case class VecEvent(vecId: Long, embedding: Array[Double], ts: Timestamp)

  /** One (band key, vec) routing row. */
  final case class BandRow(key: Long, band: Int, vecId: Long, ts: Timestamp)

  /** First-seen vector per band key. */
  final case class SeenState(vecId: Long, tsMs: Long)

  /** One band collision: `vecId` shares `band`'s key with earlier
    * `dupOf`. */
  final case class BandHit(vecId: Long, dupOf: Long, band: Int, ts: Timestamp)

  private val nBands = 8

  /** Deterministic plane matrices by bits-per-band, flattened once per
    * JVM (plane-major; identical derivation to the batch operator's). */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Double]]]()

  private def planesAt(bitsPerBand: Int, bands: Int = nBands): Array[Array[Double]] =
    planeCache.computeIfAbsent(bands * 64 + bitsPerBand, { _ =>
      VectorFunctions.planesFor(bands * bitsPerBand, 64).map(_.toArray).toArray
    })

  /** Scala twin of the batch signature pass: one sign bit per plane. */
  private[graft] def signatureOf(
      v: Array[Double], bitsPerBand: Int = 2, bands: Int = nBands): Long = {
    val planes = planesAt(bitsPerBand, bands)
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      var dot = 0.0
      var d = 0
      val n = math.min(pl.length, v.length)
      while (d < n) { dot += pl(d) * v(d); d += 1 }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Band keys of one signature: band index mixed first, then the band's
    * sign bits — a cross-band coincidence needs a 64-bit collision (the
    * [[Dedup.fastBandKeysOf]] convention). */
  private[graft] def bandKeysOf(
      sig: Long, bitsPerBand: Int = 2, bands: Int = nBands): Array[Long] =
    Array.tabulate(bands) { b =>
      val bits = (sig >>> (b * bitsPerBand)) & ((1L << bitsPerBand) - 1)
      Dedup.fmix64(Dedup.fmix64(b + 0x243F_6A88_85A3_08D3L) ^ bits)
    }

  /** Per-band collision events for an unbounded embedding stream.
    * `bitsPerBand` must match the batch sweep this stream is meant to
    * cover (see the class docs); default = the committed batch/oracle
    * parameterization. */
  def candidates(
      vecs: Dataset[VecEvent],
      watermarkDelay: String = "10 minutes",
      retentionMs: Long = 60L * 60L * 1000L,
      bitsPerBand: Int = 2): Dataset[BandHit] =
    candidatesGrouped(vecs, watermarkDelay, retentionMs, bitsPerBand, nBands)

  /** [[candidates]] with the band COUNT exposed too. `EmbDedupProbe`'s
    * 4×4 variant (the same 16-plane signature regrouped as 4 bands ×
    * 4 bits — half the state rows AND half the shuffled rows, at the
    * standard (L, b) recall trade 1−(1−p⁴)⁴ vs 1−(1−p²)⁸) measures the
    * lever: only ~+6% ev/s — which REFUTES the simple "state-row-bound"
    * model. The probe's 4-layer decomposition (passthrough / bandsonly /
    * statefulnoop / detector, idle local[32]) shows the leg's ~86 µs/ev
    * is a STACK: ~11 µs MemoryStream ingestion of the 64-double row,
    * ~26 µs signature + 8-row fan-out + encoder, ~14 µs shuffle +
    * stateful-operator framework, ~35 µs state get/put — no single
    * term dominates enough for one lever to buy 2×; a material win
    * needs a narrower routing row AND fewer bands AND cheaper state
    * simultaneously. The floor is inherent to per-row stateful
    * streaming under the committed 8-band contract, not a plan flaw.
    * The default stays 8×2 because the completeness contract is against
    * the COMMITTED batch/oracle parameterization; a deployment that
    * re-sizes the batch sweep's banding passes the same (b, L) here. */
  private[graft] def candidatesGrouped(
      vecs: Dataset[VecEvent],
      watermarkDelay: String,
      retentionMs: Long,
      bitsPerBand: Int,
      bands: Int): Dataset[BandHit] = {
    import vecs.sparkSession.implicits._
    val bb = bitsPerBand
    val nb = bands
    val bandRows = vecs
      .mapPartitions { it =>
        it.flatMap { v =>
          val keys = bandKeysOf(signatureOf(v.embedding, bb, nb), bb, nb)
          Iterator.tabulate(keys.length)(b => BandRow(keys(b), b, v.vecId, v.ts))
        }
      }
      .withWatermark("ts", watermarkDelay)

    bandRows
      .groupByKey(_.key)
      .flatMapGroupsWithState[SeenState, BandHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[BandRow], state: GroupState[SeenState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val out = Seq.newBuilder[BandHit]
            val existing = state.getOption.orNull
            var st = existing
            val seq = rows.toSeq
            val sorted =
              if (seq.sizeIs > 1) seq.sortBy(r => (r.ts.getTime, r.vecId)) else seq
            sorted.foreach { r =>
              if (st == null) st = SeenState(r.vecId, r.ts.getTime)
              else if (r.vecId != st.vecId)
                out += BandHit(r.vecId, st.vecId, r.band, r.ts)
            }
            // first sight writes state + timeout; an existing group's
            // original never changes (the StreamNearDup discipline)
            if (st ne existing) {
              state.update(st)
              state.setTimeoutTimestamp(st.tsMs + retentionMs)
            }
            out.result().iterator
          }
      }
  }
}
