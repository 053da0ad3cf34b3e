package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a keyless point-in-range join into the banded
  * equi-join [[graft.operators.RangeJoin.pointInRange]] builds by hand —
  * transparently, for ANY DataFrame/SQL inner join whose condition is
  * range predicates only.
  *
  * Without an equi conjunct Catalyst's only plan for
  * `A JOIN B ON b.s <= a.p AND a.p < b.e` is a BroadcastNestedLoopJoin —
  * |A|×|B| comparisons, the plan shape every operator in this repo is
  * audited NOT to produce. This rule (the library-side analog of
  * Databricks' range-join optimization, built on public Catalyst API)
  * detects the pattern, stamps each point row with `floor(p/w)`, explodes
  * each range into the bands `[floor(s/w), floor(e/w)]` it overlaps, and
  * re-joins on band equality with the ORIGINAL predicate retained as the
  * exact residual. Band assignment is monotone in the banded value, so
  * every qualifying pair still meets in exactly one band (a point has one
  * band; `sequence` emits distinct bands) — results are identical, row
  * for row, to the nested-loop plan.
  *
  * Opt-in via `spark.graft.rangeJoin.bandWidth` (band width in the
  * banded column's own units; unset/≤0 disables). Width is the caller's
  * cost lever: fan-out is len/w + 1 rows per range against per-band
  * candidate density — or derived from table statistics via
  * [[graft.operators.RangeJoin.autoBandWidth]] (range/NDV × a target
  * values-per-band), which writes this conf; a manually-set value is
  * the override.
  *
  * Granularity note: `bandOf` computes floor(x / w) through a DOUBLE
  * division, so above 2⁵³ in the banded column's own units (e.g. banding
  * raw nanosecond epochs) band ids coarsen to the double's ulp (~1024
  * nanos there). Correctness is unaffected — the rounding map stays
  * monotone and identical on both join sides, so every qualifying pair
  * still meets in a covered band and the exact residual decides it —
  * only the effective band granularity (and with it the fan-out tuning)
  * degrades; pick a width that keeps x / w well below 2⁵³ if band-width
  * precision matters at that magnitude. Applies only to INNER joins with a deterministic,
  * equi-free conjunction containing a `s ≤/< p` + `p </≤ e` sandwich on
  * numeric/timestamp columns; everything else is left untouched. The
  * rewritten join carries an equi conjunct, so the rule cannot re-fire on
  * its own output.
  *
  * Registered by [[graft.GraftExtensions]] (`injectOptimizerRule`) — the
  * seam this library reserves for whole-plan semantics Spark's built-ins
  * can't express (SURVEY.md §7.4).
  */
class BandedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val confKey = "spark.graft.rangeJoin.bandWidth"

  private def widthOpt: Option[Long] = {
    val v = conf.getConfString(confKey, "0")
    // fail loudly on an unparsable override (the autoBandWidth contract):
    // mapping a typo ('64k') to None would silently disable the banded
    // rewrite for every join in the session
    val w = scala.util.Try(v.toLong).getOrElse(
      throw new IllegalArgumentException(
        s"$confKey is set to '$v', which is not a long — " +
          "set a band width in the banded column's units, or <= 0 to disable"))
    Some(w).filter(_ > 0)
  }

  private def bandable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType
       | DoubleType | FloatType | TimestampType => true
    case _ => false
  }

  /** floor(x / w) as a LongType band id — monotone in x, identical form on
    * both sides of the rewritten join. */
  private def bandOf(x: Expression, w: Long): Expression =
    Floor(Divide(Cast(x, DoubleType), Literal(w.toDouble)))

  /** A conjunct `a ≤ b` / `a < b` normalized to (lower, upper). */
  private def asBound(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThanOrEqual(a, b) => Some((a, b))
    case LessThan(a, b)        => Some((a, b))
    case GreaterThanOrEqual(a, b) => Some((b, a))
    case GreaterThan(a, b)        => Some((b, a))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = widthOpt match {
    case None => plan
    case Some(w) =>
      plan.transformUp {
        case j @ Join(left, right, Inner, Some(cond), hint)
            if cond.deterministic && j.resolved =>
          val conjuncts = splitConjunctivePredicates(cond)
          val hasEqui = conjuncts.exists {
            case EqualTo(a, b) =>
              (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
              (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
            case _ => false
          }
          if (hasEqui) j
          else findSandwich(conjuncts, left, right) match {
            case Some((p, s, e, pOnLeft)) =>
              rewrite(j, left, right, cond, hint, p, s, e, pOnLeft, w)
            case None => j
          }
      }
  }

  /** Find `s ≤/< p` and `p </≤ e` with p referencing exactly one side and
    * both bounds the other — the point-in-range sandwich. */
  private def findSandwich(
      conjuncts: Seq[Expression],
      left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression, Boolean)] = {
    def sideOf(x: Expression): Option[Boolean] = // Some(true)=left
      if (x.references.nonEmpty && x.references.subsetOf(left.outputSet)) Some(true)
      else if (x.references.nonEmpty && x.references.subsetOf(right.outputSet)) Some(false)
      else None
    val bounds = conjuncts.flatMap(asBound)
    val candidates = for {
      (s, p1) <- bounds // s ≤ p
      (p2, e) <- bounds // p < e
      if p1.semanticEquals(p2)
      if bandable(p1.dataType) && bandable(s.dataType) && bandable(e.dataType)
      pSide <- sideOf(p1)
      sSide <- sideOf(s)
      eSide <- sideOf(e)
      if sSide == eSide && sSide != pSide
    } yield (p1, s, e, pSide)
    candidates.headOption
  }

  private def rewrite(
      j: Join,
      left: LogicalPlan,
      right: LogicalPlan,
      cond: Expression,
      hint: JoinHint,
      p: Expression,
      s: Expression,
      e: Expression,
      pOnLeft: Boolean,
      w: Long): LogicalPlan = {
    val (pSide, rSide) = if (pOnLeft) (left, right) else (right, left)
    // point side: one band per row
    val pBand = Alias(bandOf(p, w), "__graft_p_band")()
    val newPSide = Project(pSide.output :+ pBand, pSide)
    // range side: one row per overlapped band
    // Sequence is TimeZoneAware: without an explicit zone it stays
    // unresolved and the optimizer's plan validation rejects the rewrite
    val seq = Sequence(
      bandOf(s, w), bandOf(e, w), Some(Literal(1L)),
      Some(conf.sessionLocalTimeZone))
    val rBandAttr = AttributeReference(
      "__graft_r_band", LongType, nullable = seq.dataType.asInstanceOf[ArrayType].containsNull)()
    // an inverted range (e < s) matches nothing under the sandwich but
    // would make Sequence THROW — filter it below the Generate, which the
    // nested-loop plan also treats as no-match
    val guarded = Filter(LessThanOrEqual(bandOf(s, w), bandOf(e, w)), rSide)
    val newRSide = Generate(
      Explode(seq), unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(rBandAttr), child = guarded)
    val bandEq = EqualTo(pBand.toAttribute, rBandAttr)
    val (newLeft, newRight) =
      if (pOnLeft) (newPSide, newRSide) else (newRSide, newPSide)
    val newJoin = Join(newLeft, newRight, Inner, Some(And(bandEq, cond)), hint)
    Project(j.output, newJoin)
  }
}
