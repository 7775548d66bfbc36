package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.LongType

/** Catalyst optimizer rule: rewrite a range-ONLY inner join — the
  * point-in-interval shape `points ⋈ intervals ON p >= s AND p < e` that
  * Spark can only plan as a BroadcastNestedLoopJoin — into the binned
  * equi-join [[graft.operators.Ranges.binnedPointJoin]] builds by hand:
  *
  *   intervals ──Project(+bin_lo,bin_hi)──Generate(explode(sequence))──┐
  *                                                                join on __bin
  *   points ────Project(+bin_p)──────────────────────────────────────┘
  *                → Filter(original range predicate) → Project(original output)
  *
  * Declarative user code keeps its natural `BETWEEN`-style join; the plan
  * stops being O(|P|·|I|). The rewrite is semantics-preserving: a point's
  * bin is unique, an interval covers it iff the point can match, so every
  * qualifying pair surfaces exactly once and the exact predicate runs as a
  * post-filter. Bin arithmetic is the same remainder-subtract integral
  * `div` as the hand-built operator — exact LONG floor, negatives and
  * >2^53 included.
  *
  * Scope guards (deliberately conservative — this is an optimization of
  * last resort for a shape Catalyst has no native answer to):
  *  - fires only when `spark.graft.rangeJoin.binWidth` is set positive
  *    (the width is workload knowledge: pick ~ the typical interval
  *    length; intervals explode to ≈ length/width + 1 bin rows);
  *  - INNER joins whose condition is EXACTLY one lower bound (p ≥ s or
  *    p > s) and one upper bound (p < e or p ≤ e) over LongType columns,
  *    point side and interval side on opposite inputs — anything with an
  *    equality conjunct already equi-joins and is left alone;
  *  - the rewritten join's condition is a plain equality, so the rule
  *    cannot re-fire on its own output (fixed-point safe, including after
  *    later predicate pushdown folds the post-filter back into the join).
  *
  * Registered by [[graft.GraftExtensions]] via `injectOptimizerRule`, or
  * per-session with `spark.experimental.extraOptimizations`.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  val WidthConf = "spark.graft.rangeJoin.binWidth"

  private def width: Long =
    try SQLConf.get.getConfString(WidthConf, "0").toLong
    catch { case _: NumberFormatException => 0L }

  /** (point, lowerBound, lowerStrict) for `p >= s` / `p > s` spellings. */
  private def asLower(e: Expression): Option[(Expression, Expression, Boolean)] =
    e match {
      case GreaterThanOrEqual(p, s) => Some((p, s, false))
      case LessThanOrEqual(s, p)    => Some((p, s, false))
      case GreaterThan(p, s)        => Some((p, s, true))
      case LessThan(s, p)           => Some((p, s, true))
      case _                        => None
    }

  /** (point, upperBound, inclusive) for `p < e` / `p <= e` spellings. */
  private def asUpper(e: Expression): Option[(Expression, Expression, Boolean)] =
    e match {
      case LessThan(p, e2)           => Some((p, e2, false))
      case GreaterThan(e2, p)        => Some((p, e2, false))
      case LessThanOrEqual(p, e2)    => Some((p, e2, true))
      case GreaterThanOrEqual(e2, p) => Some((p, e2, true))
      case _                         => None
    }

  private def long(e: Expression): Boolean = e.dataType == LongType

  private def binOf(c: Expression, w: Long): Expression =
    IntegralDivide(Subtract(c, Pmod(c, Literal(w))), Literal(w))

  private def from(e: Expression, plan: LogicalPlan): Boolean =
    e.references.subsetOf(plan.outputSet) && e.references.nonEmpty && e.deterministic

  def apply(plan: LogicalPlan): LogicalPlan = {
    val w = width
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(And(c1, c2)), hint) =>
        val bounds = (for {
          (pL, s, lowerStrict) <- asLower(c1).toSeq
          (pU, e, upperIncl) <- asUpper(c2).toSeq
        } yield (pL, s, lowerStrict, pU, e, upperIncl)) ++ (for {
          (pL, s, lowerStrict) <- asLower(c2).toSeq
          (pU, e, upperIncl) <- asUpper(c1).toSeq
        } yield (pL, s, lowerStrict, pU, e, upperIncl))

        val rewrite = bounds.collectFirst {
          // the SAME point expression bounded both ways, all LONG, point
          // and interval anchored on opposite join inputs
          case (p1, s, lowStrict, p2, e, upIncl)
            if p1.semanticEquals(p2) && long(p1) && long(s) && long(e) &&
              ((from(p1, left) && from(s, right) && from(e, right)) ||
               (from(p1, right) && from(s, left) && from(e, left))) =>
            val pointOnLeft = from(p1, left)
            val (pointPlan, ivalPlan) = if (pointOnLeft) (left, right) else (right, left)

            // interval side: bin range, empty intervals dropped (they
            // cannot contain any point; also keeps sequence() ascending)
            val hiSrc = if (upIncl) e else Subtract(e, Literal(1L))
            val loA = Alias(binOf(s, w), "__graft_bin_lo")()
            val hiA = Alias(binOf(hiSrc, w), "__graft_bin_hi")()
            val nonEmpty = if (upIncl) GreaterThanOrEqual(e, s) else GreaterThan(e, s)
            val ivalProj = Project(ivalPlan.output :+ loA :+ hiA,
              Filter(nonEmpty, ivalPlan))
            val binAttr = AttributeReference("__graft_bin", LongType)()
            // Sequence is TimeZoneAwareExpression: the analyzer's
            // ResolveTimeZone has already run, so set the zone here or
            // the plan goes unresolved mid-optimization
            val gen = Generate(
              Explode(Sequence(loA.toAttribute, hiA.toAttribute, None,
                Some(SQLConf.get.sessionLocalTimeZone))),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(binAttr), child = ivalProj)

            // point side: its unique bin
            val pbA = Alias(binOf(p1, w), "__graft_bin_p")()
            val pointProj = Project(pointPlan.output :+ pbA, pointPlan)

            // original side hints don't survive the side swap — drop them
            val joined = Join(gen, pointProj, Inner,
              Some(EqualTo(binAttr, pbA.toAttribute)), JoinHint.NONE)
            Project(j.output, Filter(And(c1, c2), joined))
        }
        rewrite.getOrElse(j)
    }
  }
}
