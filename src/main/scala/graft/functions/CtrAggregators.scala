package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.model.AdCtr

/** Typed `Aggregator`s for the reference's two CTR semigroups
  * (`/root/reference/.../windowing/model.scala:88-110`), the Dataset-API
  * twin of the column-DSL `least(lit(1), sum(...))` form used on the
  * oracle-checked path.
  *
  * Beam's `Combine.perKey` lifts a semigroup into partial (pre-shuffle) +
  * final combine; Spark's `Aggregator` has exactly that contract —
  * `reduce` runs map-side, `merge` combines partials after the shuffle —
  * so associativity carries the same single-pre-combined-row-per-key
  * shuffle guarantee at scale. Usable on `KeyValueGroupedDataset.agg` via
  * `.toColumn`, or in SQL via `functions.udaf(...)` registration.
  */
object CtrAggregators {

  private def zero: AdCtr = AdCtr("", 0, 0)

  private def keep(a: AdCtr, b: AdCtr): String = if (a.id.nonEmpty) a.id else b.id

  /** Capped semigroup (model.scala:88-98): clamp at 1 — the dedup effect
    * making CTR per (ad, screen) 0, 1, or undefined. */
  val capped: Aggregator[AdCtr, AdCtr, AdCtr] = new Aggregator[AdCtr, AdCtr, AdCtr] {
    def zero: AdCtr = CtrAggregators.zero
    def reduce(acc: AdCtr, e: AdCtr): AdCtr =
      AdCtr(keep(acc, e), math.min(1, acc.clicks + e.clicks),
        math.min(1, acc.impressions + e.impressions))
    def merge(a: AdCtr, b: AdCtr): AdCtr =
      AdCtr(keep(a, b), math.min(1, a.clicks + b.clicks),
        math.min(1, a.impressions + b.impressions))
    def finish(r: AdCtr): AdCtr = r
    def bufferEncoder: Encoder[AdCtr] = Encoders.product[AdCtr]
    def outputEncoder: Encoder[AdCtr] = Encoders.product[AdCtr]
  }

  /** Total semigroup (model.scala:100-110): plain field-wise sum. */
  val total: Aggregator[AdCtr, AdCtr, AdCtr] = new Aggregator[AdCtr, AdCtr, AdCtr] {
    def zero: AdCtr = CtrAggregators.zero
    def reduce(acc: AdCtr, e: AdCtr): AdCtr =
      AdCtr(keep(acc, e), acc.clicks + e.clicks, acc.impressions + e.impressions)
    def merge(a: AdCtr, b: AdCtr): AdCtr =
      AdCtr(keep(a, b), a.clicks + b.clicks, a.impressions + b.impressions)
    def finish(r: AdCtr): AdCtr = r
    def bufferEncoder: Encoder[AdCtr] = Encoders.product[AdCtr]
    def outputEncoder: Encoder[AdCtr] = Encoders.product[AdCtr]
  }
}
