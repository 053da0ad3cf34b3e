package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.{Dedup, TextAnalysis}

/** Streaming boilerplate line-scrub at ingestion — the unbounded twin of
  * the batch line-dedup family (`Dedup.boilerplateLines`/`lineScrub`,
  * the RefinedWeb line-df pass) and the fourth member of the at-ingestion
  * curation set next to [[StreamDedup]] (exact), [[StreamNearDup]]
  * (fuzzy) and [[ContaminationStream]].
  *
  * State is a DOCUMENT-FREQUENCY THRESHOLD per normalized line: each
  * arriving document contributes its distinct lines once; a line whose
  * running df reaches the cut is boilerplate, and every (doc, line)
  * occurrence from then on is flagged for scrubbing. Line identity goes
  * through the ONE canonical normalization
  * ([[TextAnalysis.normText]] ≡ the batch `normTextCol`), so a
  * stream-flagged line IS a batch boilerplate line.
  *
  * Scale shape: one doc → its distinct lines (template-bounded fan-out),
  * one shuffle on the normalized line, state = one (count, lastSeen)
  * pair per distinct line seen within retention — hot boilerplate lines
  * are exactly the ones that keep state small (millions of docs, one
  * state row). Eviction is an idle timeout: a line not seen for
  * `retention` of event time forgets its count once the watermark
  * passes lastSeen + retention.
  *
  * Inherent prefix trade-off (same as every df-threshold-at-ingestion
  * design): the first `dfCut - 1` documents carrying a template line
  * pass unflagged — the batch sweep, knowing the whole corpus, would
  * scrub them. `StreamLineScrubSpec` pins the exact contract: a (doc,
  * line) is flagged iff the line's running df at the doc's (ts, docId)
  * processing point has reached the cut, and the set of lines that EVER
  * cross equals the batch boilerplate set over the same corpus.
  *
  * At-least-once inputs: df counts documents, and batch counts DISTINCT
  * documents — so a source that redelivers documents would inflate df
  * and cross the cut early (a FALSE boilerplate flag, the worse error
  * direction). The state keeps the lexicographic (ts, docId)
  * high-water mark of the last row COUNTED and only counts rows
  * strictly above it: a replayed micro-batch — however many docs it
  * carries — re-delivers only rows at or below the mark and merges
  * nothing (`StreamLineScrubSpec` pins a full multi-doc batch replay
  * as a df no-op). The cost of the guard is the opposite, milder
  * direction: a genuinely NEW doc arriving out of order below the mark
  * (possible within the watermark delay) is not counted toward df —
  * an under-count bounded by the disorder window, which only DELAYS a
  * line's crossing; full distinctness without either error would need
  * a per-line doc set, i.e. unbounded state.
  */
object StreamLineScrub {

  /** One ingested document (raw text, real newlines). */
  final case class DocEvent(docId: Long, text: String, ts: Timestamp)

  /** One (normalized line, doc) routing row. */
  final case class LineRow(key: String, docId: Long, ts: Timestamp)

  /** Per-line df state: docs counted plus the lexicographic (ts, docId)
    * high-water mark of the last row counted — the replay guard (see
    * the class docs' trade-off list). */
  final case class DfState(nDocs: Long, lastMs: Long, lastDocId: Long)

  /** One scrub verdict: `line` in `docId` is boilerplate (`df` = the
    * line's running document frequency when the doc arrived). */
  final case class LineHit(docId: Long, line: String, df: Long, ts: Timestamp)

  /** Boilerplate-line hits for an unbounded document stream.
    *
    * @param docs           ingest stream
    * @param watermarkDelay max out-of-orderness of `ts`
    * @param retentionMs    idle horizon: a line unseen for this long
    *                       (by event time) drops its df state
    * @param dfCut          df threshold, default = the batch cut
    */
  def flagged(
      docs: Dataset[DocEvent],
      watermarkDelay: String = "10 minutes",
      retentionMs: Long = 60L * 60L * 1000L,
      dfCut: Long = Dedup.lineDfCut): Dataset[LineHit] = {
    import docs.sparkSession.implicits._
    val rows = docs
      .flatMap { d =>
        // distinct normalized lines, mirroring the batch distinct()
        // before the df count; split keeps trailing empties like the
        // batch split(text, "\n") column
        d.text.split("\n", -1).iterator
          .map(TextAnalysis.normText).toSet[String].iterator
          .map(k => LineRow(k, d.docId, d.ts))
      }
      // watermark AFTER the typed flatMap (the StreamNearDup constraint)
      .withWatermark("ts", watermarkDelay)

    rows
      .groupByKey(_.key)
      .flatMapGroupsWithState[DfState, LineHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, it: Iterator[LineRow], state: GroupState[DfState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val out = Seq.newBuilder[LineHit]
            var st = state.getOption
              .getOrElse(DfState(0L, Long.MinValue, Long.MinValue))
            val seq = it.toSeq
            val sorted =
              if (seq.sizeIs > 1) seq.sortBy(r => (r.ts.getTime, r.docId)) else seq
            sorted.foreach { r =>
              val t = r.ts.getTime
              // replay guard: count only rows strictly above the
              // (ts, docId) high-water mark — a redelivered batch sits
              // at or below it and merges nothing (batch df counts
              // DISTINCT docs; over-counting would false-flag early)
              if (t > st.lastMs || (t == st.lastMs && r.docId > st.lastDocId))
                st = DfState(st.nDocs + 1, t, r.docId)
              if (st.nDocs >= dfCut) out += LineHit(r.docId, key, st.nDocs, r.ts)
            }
            state.update(st)
            state.setTimeoutTimestamp(st.lastMs + retentionMs)
            out.result().iterator
          }
      }
  }
}
