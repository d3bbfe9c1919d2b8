package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule: rewrite an inequality-only (point-in-interval)
  * inner join into the binned equi-join form.
  *
  * A join whose condition is only range predicates — `p >= lo AND
  * p < hi` in any argument order / strictness — has no equi key, so
  * Spark plans a broadcast nested-loop join: every probe row tests
  * every interval, O(|probe|·|intervals|), the classic scale cliff.
  * The standard fix (shipped by engines as a "range join" hint) is bin
  * decomposition: each interval explodes into the fixed-width bins it
  * overlaps, each point row computes its ONE bin, candidates meet by
  * bin equi-join, and the original predicate re-verifies bin-mates.
  * [[graft.ops.Skew.binnedRangeJoin]] writes that by hand; this rule
  * derives it AUTOMATICALLY for any eligible plain theta join, so a
  * SQL user's `JOIN ... ON v >= lo AND v < hi` scales without knowing
  * the trick.
  *
  * Correctness does not depend on floating-point exactness: every bin
  * index is `floor(cast(x as double) / width)`, and double division
  * by a positive constant and the double cast are MONOTONE maps, so
  * for any matching pair `lo ≤/< p ≤/< hi` implies
  * `bin(lo) <= bin(p) <= bin(hi)` — the point's bin is always inside
  * the interval's exploded range, no pair is ever missed, and rounding
  * can only admit extra candidates that the residual predicate then
  * removes. A point lands in exactly one bin, so no dedup pass is
  * needed. Null points/bounds produce a null bin / null sequence and
  * drop, matching inner-join comparison semantics.
  *
  * Eligibility, kept deliberately narrow: INNER join; condition is a
  * conjunction containing one lower and one upper bound on the SAME
  * point expression (numeric), point referencing only one side and
  * both bounds only the other; and NO cross-side equality conjunct —
  * if an equi key exists Spark already hash-partitions on it and
  * binning would only add fan-out (this guard also makes the rule
  * idempotent: its own rewrite introduces a bin equality). Extra
  * conjuncts ride along in the join condition unchanged.
  *
  * Gated by the session conf `spark.graft.rangeJoin.binWidth`
  * (double, > 0; unset = rule off) — bin width is workload knowledge
  * (≈ the typical interval width keeps the per-interval explode
  * O(1)), the same contract as the hand-written operator and the
  * engine hints this mirrors. The conf is also the caller's assertion
  * that intervals are FINITE and roughly width-sized: an open-ended
  * sentinel bound (±Infinity) or an interval spanning more than
  * Spark's max array length makes the bin sequence fail LOUDLY at
  * runtime rather than silently wrong — pre-filter sentinel rows (or
  * widen the bin) before enabling the rule, exactly as with the
  * hand-written binned operators. Registered by
  * [[graft.GraftExtensions]] next to [[BandedLevenshteinRule]].
  */
object BinnedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val ConfKey = "spark.graft.rangeJoin.binWidth"

  private def binOf(e: Expression, w: Double): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(w)))

  /** (point, bound, pointIsLhs) for a comparison, or None. */
  private def sides(l: Expression, r: Expression,
                    left: LogicalPlan, right: LogicalPlan,
                    pointOnLeft: Boolean): Option[(Expression, Expression)] = {
    val (pointPlan, boundPlan) = if (pointOnLeft) (left, right) else (right, left)
    if (l.references.nonEmpty && l.references.subsetOf(pointPlan.outputSet) &&
        r.references.nonEmpty && r.references.subsetOf(boundPlan.outputSet))
      Some((l, r))
    else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(ConfKey, "0") match {
      case s => try s.toDouble catch { case _: NumberFormatException => 0.0 }
    }
    if (width <= 0.0 || width.isNaN || width.isInfinite) return plan

    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val crossEquality = conjuncts.exists {
          case EqualTo(a, b) =>
            // an equality touching BOTH sides = an existing equi key
            (a.references ++ b.references).intersect(left.outputSet).nonEmpty &&
              (a.references ++ b.references).intersect(right.outputSet).nonEmpty
          case _ => false
        }
        if (crossEquality) j else rewriteJoin(j, conjuncts, width)
    }
  }

  private def rewriteJoin(j: Join, conjuncts: Seq[Expression],
                          width: Double): LogicalPlan = {
    val Join(left, right, _, Some(cond), hint) = j: @unchecked
    {
        // try point on left first, then point on right
        val rewritten =
          Seq(true, false).view.flatMap { pointOnLeft =>
            // lower bounds: point >(=) bound; upper bounds: point <(=) bound
            val lowers = conjuncts.flatMap {
              case GreaterThanOrEqual(a, b) => sides(a, b, left, right, pointOnLeft)
              case GreaterThan(a, b)        => sides(a, b, left, right, pointOnLeft)
              case LessThanOrEqual(a, b)    => sides(b, a, left, right, pointOnLeft)
              case LessThan(a, b)           => sides(b, a, left, right, pointOnLeft)
              case _ => None
            }
            val uppers = conjuncts.flatMap {
              case LessThanOrEqual(a, b)    => sides(a, b, left, right, pointOnLeft)
              case LessThan(a, b)           => sides(a, b, left, right, pointOnLeft)
              case GreaterThanOrEqual(a, b) => sides(b, a, left, right, pointOnLeft)
              case GreaterThan(a, b)        => sides(b, a, left, right, pointOnLeft)
              case _ => None
            }
            (for {
              (p1, lo) <- lowers
              (p2, hi) <- uppers
              if p1.semanticEquals(p2)
              if p1.dataType.isInstanceOf[NumericType]
              if lo.dataType.isInstanceOf[NumericType]
              if hi.dataType.isInstanceOf[NumericType]
            } yield (p1, lo, hi, pointOnLeft)).headOption
          }.headOption.map { case (point, lo, hi, pointOnLeft) =>
            val (pointPlan, intervalPlan) =
              if (pointOnLeft) (left, right) else (right, left)
            val binAlias = Alias(binOf(point, width), "__graft_bin")()
            val pointP = Project(pointPlan.output :+ binAlias, pointPlan)
            val binAttr =
              AttributeReference("__graft_bin_x", LongType, nullable = true)()
            // Sequence is TimeZoneAwareExpression: without an explicit
            // zone it reports unresolved and plan validation rejects
            // the rewrite (integral sequences never consult it)
            val intervalG = Generate(
              Explode(Sequence(binOf(lo, width), binOf(hi, width), None,
                Some(conf.sessionLocalTimeZone))),
              Nil, outer = false, None, Seq(binAttr), intervalPlan)
            val newCond = And(EqualTo(binAlias.toAttribute, binAttr), cond)
            val newJoin =
              if (pointOnLeft) Join(pointP, intervalG, Inner, Some(newCond), hint)
              else Join(intervalG, pointP, Inner, Some(newCond), hint)
            Project(j.output, newJoin)
          }
        rewritten.orElse(overlapRewrite(j, conjuncts, width))
          .getOrElse(j)
    }
  }

  /** Interval-OVERLAP rewrite — the two-sided sibling: condition shape
    * `lLo ≤/< rHi AND rLo ≤/< lHi` (any argument order), both sides
    * interval sets. Both sides explode into their bins, candidates
    * meet by bin equi-join, the original predicate verifies, and the
    * `bin = greatest(bin(lLo), bin(rLo))` conjunct keeps each pair in
    * exactly ONE shared bin (the first) with no distinct pass — the
    * [[graft.ops.Skew.binnedIntervalJoin]] decomposition, derived
    * automatically. Exactly-once holds by monotonicity: for a matching
    * pair, `greatest(bin(lLo), bin(rLo))` is ≥ both explosions' start
    * bins by construction and ≤ both end bins via the residual
    * predicate (`rLo ≤ lHi ⇒ bin(rLo) ≤ bin(lHi)` and symmetrically),
    * so the chosen bin lies inside BOTH exploded ranges — found once,
    * kept once. Tried only when the single-explode point form does not
    * match (a point is the degenerate interval; one explode beats
    * two).
    */
  private def overlapRewrite(j: Join, conjuncts: Seq[Expression],
                             width: Double): Option[LogicalPlan] = {
    val Join(left, right, _, Some(cond), hint) = j: @unchecked
    def oneSide(e: Expression, p: LogicalPlan): Boolean =
      e.references.nonEmpty && e.references.subsetOf(p.outputSet) &&
        e.dataType.isInstanceOf[NumericType]
    // normalized L ≤/< R comparisons (a left-side expr bounded above
    // by a right-side expr) and their R ≤/< L mirrors
    def le(a: Expression, b: Expression): Option[(Expression, Expression)] =
      if (oneSide(a, left) && oneSide(b, right)) Some((a, b)) else None
    val lUpper = conjuncts.flatMap {   // lLo <= rHi
      case LessThanOrEqual(a, b)    => le(a, b)
      case LessThan(a, b)           => le(a, b)
      case GreaterThanOrEqual(a, b) => le(b, a)
      case GreaterThan(a, b)        => le(b, a)
      case _ => None
    }
    val rUpper = conjuncts.flatMap {   // rLo <= lHi
      case LessThanOrEqual(a, b)    => le(b, a).map(_.swap)
      case LessThan(a, b)           => le(b, a).map(_.swap)
      case GreaterThanOrEqual(a, b) => le(a, b).map(_.swap)
      case GreaterThan(a, b)        => le(a, b).map(_.swap)
      case _ => None
    }
    (for {
      (lLo, rHi) <- lUpper
      (rLo, lHi) <- rUpper
    } yield (lLo, lHi, rLo, rHi)).headOption.map { case (lLo, lHi, rLo, rHi) =>
      val tz = Some(conf.sessionLocalTimeZone)
      val lBin = AttributeReference("__graft_bin_l", LongType, nullable = true)()
      val rBin = AttributeReference("__graft_bin_r", LongType, nullable = true)()
      val leftG = Generate(
        Explode(Sequence(binOf(lLo, width), binOf(lHi, width), None, tz)),
        Nil, outer = false, None, Seq(lBin), left)
      val rightG = Generate(
        Explode(Sequence(binOf(rLo, width), binOf(rHi, width), None, tz)),
        Nil, outer = false, None, Seq(rBin), right)
      val firstSharedBin =
        EqualTo(lBin, Greatest(Seq(binOf(lLo, width), binOf(rLo, width))))
      val newCond = And(And(EqualTo(lBin, rBin), firstSharedBin), cond)
      Project(j.output, Join(leftG, rightG, Inner, Some(newCond), hint))
    }
  }
}
