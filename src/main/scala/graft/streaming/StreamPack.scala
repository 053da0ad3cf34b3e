package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Packing

/** Sequence packing at ingestion — the streaming twin of
  * [[graft.operators.Packing.packByWriter]]: every arriving document is
  * assigned its packed-stream offset and chunk span the moment it lands,
  * so shard writers can emit fixed-capacity training chunks continuously
  * instead of waiting for a corpus sweep.
  *
  * One state row per writer (`source`), holding a single running token
  * offset — per-writer counters are exactly what make packing
  * streamable: a global offset would serialize every writer through one
  * state row, where per-source streams scale with the writer count and
  * the batch anchor splits the sequence space the same way. State is one
  * long per source FOREVER (no watermark needed — it never grows with
  * volume), and the emitted spans use the SAME floor-division chunk
  * convention ([[Packing.chunkSpan]]) as the batch operator, so stream
  * output ≡ batch output is a spec-pinned identity, not a coincidence.
  *
  * Ordering contract (documented trade): offsets depend on arrival
  * order. The packer assumes an in-order-per-source ingest (the shape a
  * partitioned log delivers — within-partition order is exactly what
  * Kafka-style sources guarantee); within a micro-batch, events sort by
  * doc_id so a batch boundary can never reorder a source's documents.
  * Out-of-order delivery ACROSS micro-batches packs docs in arrival
  * order instead of doc_id order — a different, still-valid packing
  * (every token still lands in exactly one chunk slot); only the
  * doc_id-keyed batch identity assumes the ordered ingest.
  */
object StreamPack {

  /** One ingested document: the post-tokenization event an ingestion
    * pipeline hands the packer (`nTokens` counted upstream, text already
    * dropped — the packer needs sizes, never payloads). */
  final case class DocEvent(source: String, docId: Long, nTokens: Long, ts: Timestamp)

  final case class PackState(offset: Long)

  final case class PackedDoc(
      source: String, doc_id: Long, n_tokens: Long, start_offset: Long,
      first_chunk: Long, last_chunk: Long, n_chunks: Long)

  /** Per-writer running offsets in append mode. */
  def offsets(docs: Dataset[DocEvent]): DataFrame = {
    import docs.sparkSession.implicits._
    // per-writer open-bin state tracks the key universe (sf1->sf10
    // heap-store ratio 0.25 — the worst collapse in the BASELINE matrix)
    StoreAdvisory.corpusCoupled(docs.sparkSession, "pack")
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[PackState, PackedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (source: String, events: Iterator[DocEvent], state: GroupState[PackState]) =>
          var off = state.getOption.map(_.offset).getOrElse(0L)
          val out = events.toIndexedSeq.sortBy(_.docId).map { d =>
            val (first, last, n) = Packing.chunkSpan(off, d.nTokens)
            val row = PackedDoc(source, d.docId, d.nTokens, off, first, last, n)
            off += d.nTokens
            row
          }
          state.update(PackState(off))
          out.iterator
      }
      .toDF()
  }
}
