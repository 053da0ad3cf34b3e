package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable bounded top-k-by-priority aggregate — the kernel of
  * weighted sampling without replacement (Efraimidis & Spirakis,
  * "Weighted random sampling with a reservoir", IPL 2006: keeping the k
  * largest u_i^(1/w_i) keys IS a weight-proportional sample).
  *
  * Per-group state is at most 2k entries no matter the input volume, the
  * reduce runs map-side, and partials merge associatively — the same
  * bounded-state discipline as the HLL/Space-Saving family in
  * [[SketchFunctions]]. Unlike Space-Saving, the result here is EXACT
  * under any merge order: each partial keeps a superset of its local
  * top-k under a TOTAL order (priority desc, id asc — ties cannot
  * survive), and the top-k of a union is the top-k of the partials'
  * top-k unions.
  */
object SampleFunctions {

  /** One candidate: the sampling priority and the row's unique id. */
  final case class WsEntry(pri: Double, id: Long)

  /** Buffer: unsorted candidates, compacted to the top k whenever it
    * grows past 2k — O(n log k) amortized without a per-row sort. */
  final case class WsBuf(entries: Seq[WsEntry])

  /** Total order: priority desc, then id asc. A total order is what
    * makes the result merge-order-independent. */
  private val byPriority: Ordering[WsEntry] =
    Ordering.by[WsEntry, (Double, Long)](e => (-e.pri, e.id))

  private def top(k: Int, es: Seq[WsEntry]): Seq[WsEntry] =
    es.sorted(byPriority).take(k)

  /** Top-k entries by (pri desc, id asc), returned in that order. */
  def weightedTopK(k: Int): Aggregator[WsEntry, WsBuf, Seq[WsEntry]] =
    new Aggregator[WsEntry, WsBuf, Seq[WsEntry]] {
      def zero: WsBuf = WsBuf(Vector.empty)
      def reduce(b: WsBuf, e: WsEntry): WsBuf = {
        val es = b.entries :+ e
        WsBuf(if (es.length > 2 * k) top(k, es) else es)
      }
      def merge(a: WsBuf, b: WsBuf): WsBuf = {
        val es = a.entries ++ b.entries
        WsBuf(if (es.length > 2 * k) top(k, es) else es)
      }
      def finish(r: WsBuf): Seq[WsEntry] = top(k, r.entries)
      def bufferEncoder: Encoder[WsBuf] = Encoders.product[WsBuf]
      def outputEncoder: Encoder[Seq[WsEntry]] = ExpressionEncoder[Seq[WsEntry]]()
    }
}
