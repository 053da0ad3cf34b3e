package graft

import java.sql.Timestamp

/** Domain model re-expressed from the reference's streaming ad-tech domain
  * (`/root/reference/src/main/scala/org/mkuthan/beam/examples/model.scala:21-110`).
  *
  * Beam's implicit per-element timestamp becomes an explicit `ts` column
  * (SURVEY.md §1.5): Spark watermarks/windows key off a real column.
  */
object model {

  /** Ad action discriminator (model.scala:46-49 in the reference). */
  object AdAction {
    val Click = "Click"
    val Impression = "Impression"
    val Unknown = "Unknown"
  }

  /** Fact event stream element (reference model.scala:59-62). */
  final case class AdEvent(id: String, screenId: String, action: String, ts: Timestamp) {
    def isClick: Boolean = action == AdAction.Click
    def isImpression: Boolean = action == AdAction.Impression
  }

  /** Screen-view event (reference model.scala:41). */
  final case class Screen(id: String, publicationId: String, ts: Timestamp)

  /** Slowly-changing dimension row (reference model.scala:32). */
  final case class Publication(id: String, version: String, ts: Timestamp)

  /** CTR accumulator & result metric (reference model.scala:71-86). */
  final case class AdCtr(id: String, clicks: Int, impressions: Int) {
    def ctr: Option[Double] =
      if (impressions == 0) None else Some(clicks.toDouble / impressions)
  }

  object AdCtr {
    /** reference model.scala:75-79 */
    def fromAdEvent(e: AdEvent): AdCtr = e.action match {
      case AdAction.Click      => AdCtr(e.id, 1, 0)
      case AdAction.Impression => AdCtr(e.id, 0, 1)
      case _                   => AdCtr(e.id, 0, 0)
    }

    /** Capped semigroup (reference model.scala:88-98): clamp at 1 → dedup
      * effect, CTR per ad-on-screen is 0, 1, or undefined. */
    def plusCapped(a: AdCtr, b: AdCtr): AdCtr =
      AdCtr(a.id, math.min(1, a.clicks + b.clicks), math.min(1, a.impressions + b.impressions))

    /** Total semigroup (reference model.scala:100-110): field-wise sum. */
    def plusTotal(a: AdCtr, b: AdCtr): AdCtr =
      AdCtr(a.id, a.clicks + b.clicks, a.impressions + b.impressions)
  }
}
