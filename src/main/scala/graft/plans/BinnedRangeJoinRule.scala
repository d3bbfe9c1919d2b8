package graft.plans

import org.apache.spark.sql.{GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.{col, isnan, lit, max, percentile_approx}
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule: rewrite an inequality-only (point-in-interval)
  * join into the binned equi-join form.
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
  * drop, matching join comparison semantics.
  *
  * Join shapes, chosen so binning never duplicates a PRESERVED row
  * (the point side explodes to exactly one bin; the interval side to
  * many):
  *   - INNER: point on either side; plus the two-sided interval-
  *     overlap form ([[overlapRewrite]]).
  *   - LEFT OUTER with the point side on the LEFT, and RIGHT OUTER
  *     with the point side on the RIGHT: unmatched point rows (and
  *     null-point rows) surface once with null interval columns,
  *     exactly as in the un-rewritten plan, because the preserved
  *     side is never exploded. The mirror shapes (preserved interval
  *     side) would duplicate unmatched intervals per bin and stay
  *     un-rewritten.
  *   - LEFT SEMI / LEFT ANTI with the point on the left: existence
  *     is bin-invariant (every original match survives as exactly the
  *     pair sharing the point's bin), so "events WITH a covering
  *     interval" and "events with NO covering interval" — the
  *     attribution questions — both get the scalable plan.
  *
  * Other conditions ride along in the join condition unchanged; a
  * conjunct with a cross-side EQUALITY disables the rewrite — Spark
  * already hash-partitions on that key, binning would only add
  * fan-out (this guard also makes the rule idempotent: its own
  * rewrite introduces a bin equality).
  *
  * Gated by the session conf `spark.graft.rangeJoin.binWidth`:
  *   - unset / `0` — rule off;
  *   - a positive double — explicit bin width (≈ the typical interval
  *     width keeps the per-interval explode O(1)), the same contract
  *     as the hand-written operator and the engine hints this mirrors.
  *     The explicit width is also the caller's assertion that
  *     intervals are FINITE and roughly width-sized: an open-ended
  *     sentinel bound (±Infinity) or an interval spanning more than
  *     Spark's max array length makes the bin sequence fail LOUDLY at
  *     runtime rather than silently wrong — pre-filter sentinel rows
  *     (or widen the bin) before enabling the rule;
  *   - `auto` — the width is DERIVED at plan time by sampling the
  *     interval side(s) ([[sampleWidths]], one job for both sides,
  *     memoized per session): the p95 of `hi − lo` over the first
  *     10k rows, the stats prepass engines ship so users
  *     without workload knowledge still get the rewrite. Non-finite
  *     and negative sampled widths are excluded from the statistic
  *     (so a few sentinel rows cannot poison it — but surviving
  *     sentinel rows still fail loudly at runtime, same contract as
  *     explicit); an empty or all-degenerate sample falls back to
  *     width 1 when any interval exists, and the join is left
  *     un-rewritten when the sample has no usable rows at all.
  *
  * Registered by [[graft.GraftExtensions]] next to
  * [[BandedLevenshteinRule]].
  */
object BinnedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val ConfKey = "spark.graft.rangeJoin.binWidth"
  private val SampleRows = 10000

  private sealed trait WidthSpec
  private case class Fixed(w: Double) extends WidthSpec
  private case object Auto extends WidthSpec

  private def binOf(e: Expression, w: Double): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(w)))

  /** Session-scoped memo of sampled widths. The width is a plan-time
    * STATISTICS HINT — any positive width is correct (covering is
    * width-independent; width only tunes fan-out) — so a stale entry
    * after the underlying data changes is a performance nuance, never
    * a correctness hazard, and caching for the session lifetime is
    * sound. Keyed by (sessionUUID, canonical interval plan, bound
    * shapes): the canonicalized plan normalizes exprIds, and the
    * bounds are fingerprinted by output ORDINAL, so re-running the
    * same query text (fresh exprIds each run) hits the cache.
    */
  private val WidthMemoCap = 256
  // true LRU (access-ordered, evicts ONLY the eldest entry): the memo
  // strongly retains canonicalized plan trees, so a long-lived
  // multi-session driver must age cold entries out one at a time —
  // the previous clear-all-at-cap both kept up to cap dead-session
  // plans pinned and dumped hot entries with them
  private val widthMemo = new java.util.LinkedHashMap[
      (String, LogicalPlan, Expression, Expression), Option[Double]](
      WidthMemoCap * 2, 0.75f, /* accessOrder = */ true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[(String, LogicalPlan, Expression, Expression),
                               Option[Double]]): Boolean =
      size() > WidthMemoCap
  }
  private def memoGet(k: (String, LogicalPlan, Expression, Expression))
      : Option[Option[Double]] =
    widthMemo.synchronized(Option(widthMemo.get(k)))
  private def memoPut(k: (String, LogicalPlan, Expression, Expression),
                      v: Option[Double]): Unit =
    widthMemo.synchronized(widthMemo.put(k, v))

  private[graft] def widthMemoSize: Int =
    widthMemo.synchronized(widthMemo.size)
  private[graft] def clearWidthMemoForTest(): Unit =
    widthMemo.synchronized(widthMemo.clear())

  /** Exprid-free fingerprint of a bound expression: attributes become
    * their ordinal in the interval plan's output (equality-only
    * stand-in — never evaluated).
    */
  private def boundPrint(e: Expression, plan: LogicalPlan): Expression =
    e.transform {
      case a: Attribute =>
        Literal(plan.output.indexWhere(_.exprId == a.exprId))
    }.canonicalized

  private def memoKey(spark: SparkSession, p: LogicalPlan,
                      lo: Expression, hi: Expression)
      : (String, LogicalPlan, Expression, Expression) =
    (Integer.toHexString(System.identityHashCode(spark)),
      p.canonicalized, boundPrint(lo, p), boundPrint(hi, p))

  /** Plan-time width sample: p95 of `hi − lo` over (up to) the first
    * [[SampleRows]] rows per interval side, finite non-negative widths
    * only — ALL uncached sides in ONE bounded Spark job (union + one
    * groupBy), so the two-sided overlap shape pays one driver job, not
    * two. Runs DURING optimization under a thread-local conf with the
    * bin width pinned to 0, so re-entering this rule on the sampling
    * sub-query (which may itself contain an eligible range join) is a
    * guaranteed no-op — termination is pinned, not assumed. Per side:
    * None when the sample has no usable rows (caller then skips the
    * rewrite); degenerate all-point intervals (p95 = 0) fall back to
    * the sample max, then to 1.0.
    */
  private def sampleWidths(spark: SparkSession,
      sides: Seq[(LogicalPlan, Expression, Expression)]): Seq[Option[Double]] =
    GraftSqlShim.withConfString(spark, ConfKey, "0") {
      val frames = sides.zipWithIndex.map { case ((p, lo, hi), i) =>
        val wcol = GraftSqlShim.column(
          Subtract(Cast(hi, DoubleType), Cast(lo, DoubleType)))
        GraftSqlShim.ofRows(spark, p)
          .select(wcol.as("w"))
          .limit(SampleRows)
          .filter(col("w").isNotNull && !isnan(col("w")) &&
            col("w") >= 0.0 && col("w") < Double.PositiveInfinity)
          .select(lit(i).as("side"), col("w"))
      }
      val bySide = frames.reduce(_ union _)
        .groupBy("side")
        .agg(percentile_approx(col("w"), lit(0.95), lit(1000)).as("p95"),
          max(col("w")).as("mx"))
        .collect()
        .map { r =>
          val w =
            if (r.isNullAt(1)) None
            else {
              val p95 = r.getDouble(1); val mx = r.getDouble(2)
              Some(if (p95 > 0.0) p95 else if (mx > 0.0) mx else 1.0)
            }
          r.getInt(0) -> w
        }.toMap
      // a side whose filter kept no rows yields no group at all -> None
      sides.indices.map(i => bySide.getOrElse(i, None))
    }

  private def resolveWidth(spec: WidthSpec,
                           sides: Seq[(LogicalPlan, Expression, Expression)]): Option[Double] =
    spec match {
      case Fixed(w) => Some(w)
      case Auto =>
        // two-sided overlap: the wider side's p95 keeps BOTH explodes
        // O(1) per row (a bin narrower than one side's intervals
        // multiplies that side's fan-out for no matching gain)
        SparkSession.getActiveSession.flatMap { spark =>
          val keyed = sides.map { case s @ (p, lo, hi) =>
            (memoKey(spark, p, lo, hi), s)
          }
          val misses = keyed.filter { case (k, _) => memoGet(k).isEmpty }
          if (misses.nonEmpty) {
            val sampled = sampleWidths(spark, misses.map(_._2))
            misses.map(_._1).zip(sampled).foreach { case (k, w) =>
              memoPut(k, w)
            }
          }
          val ws = keyed.flatMap { case (k, _) =>
            memoGet(k).flatten
          }
          if (ws.isEmpty) None else Some(ws.max)
        }
    }

  /** (point, bound) for a comparison, or None. */
  private def sides(l: Expression, r: Expression,
                    left: LogicalPlan, right: LogicalPlan,
                    pointOnLeft: Boolean): Option[(Expression, Expression)] = {
    val (pointPlan, boundPlan) = if (pointOnLeft) (left, right) else (right, left)
    if (l.references.nonEmpty && l.references.subsetOf(pointPlan.outputSet) &&
        r.references.nonEmpty && r.references.subsetOf(boundPlan.outputSet))
      Some((l, r))
    else None
  }

  /** Which side the POINT may be on for this join type such that the
    * rewrite never duplicates (or drops) a preserved row: the point
    * side maps to exactly one bin, so it must be the preserved side.
    */
  private def allowedPointSides(jt: JoinType): Seq[Boolean] = jt match {
    case Inner                          => Seq(true, false)
    case LeftOuter | LeftSemi | LeftAnti => Seq(true)
    case RightOuter                     => Seq(false)
    case _                              => Seq.empty
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val spec: Option[WidthSpec] = conf.getConfString(ConfKey, "0") match {
      case "auto" => Some(Auto)
      case s =>
        val w = try s.toDouble catch { case _: NumberFormatException => 0.0 }
        if (w > 0.0 && !w.isNaN && !w.isInfinite) Some(Fixed(w)) else None
    }
    spec match {
      case None => plan
      case Some(ws) =>
        plan.transform {
          case j @ Join(left, right, jt, Some(cond), _)
              if allowedPointSides(jt).nonEmpty =>
            val conjuncts = splitConjunctivePredicates(cond)
            // an equality touching BOTH sides = an existing equi key;
            // binning on top would add explode fan-out for no gain
            def crossEq(a: Expression, b: Expression): Boolean =
              (a.references ++ b.references).intersect(left.outputSet).nonEmpty &&
                (a.references ++ b.references).intersect(right.outputSet).nonEmpty
            val crossEquality = conjuncts.exists {
              case EqualTo(a, b)       => crossEq(a, b)
              case EqualNullSafe(a, b) => crossEq(a, b)
              case _ => false
            }
            if (crossEquality) j else rewriteJoin(j, conjuncts, ws)
        }
    }
  }

  private def rewriteJoin(j: Join, conjuncts: Seq[Expression],
                          spec: WidthSpec): LogicalPlan = {
    val Join(left, right, jt, Some(cond), hint) = j: @unchecked
    {
        // try each permitted point side in order
        val rewritten =
          allowedPointSides(jt).view.flatMap { pointOnLeft =>
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
          }.headOption.flatMap { case (point, lo, hi, pointOnLeft) =>
            val (pointPlan, intervalPlan) =
              if (pointOnLeft) (left, right) else (right, left)
            resolveWidth(spec, Seq((intervalPlan, lo, hi))).map { width =>
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
                if (pointOnLeft) Join(pointP, intervalG, jt, Some(newCond), hint)
                else Join(intervalG, pointP, jt, Some(newCond), hint)
              Project(j.output, newJoin)
            }
          }
        rewritten.orElse(overlapRewrite(j, conjuncts, spec))
          .getOrElse(j)
    }
  }

  /** Interval-OVERLAP rewrite — the two-sided sibling: condition shape
    * `lLo ≤/< rHi AND rLo ≤/< lHi` (any argument order), both sides
    * interval sets, INNER only (both sides explode, so no outer side
    * could be preserved without a dedup pass). Both sides explode into
    * their bins, candidates meet by bin equi-join, the original
    * predicate verifies, and the
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
                             spec: WidthSpec): Option[LogicalPlan] = {
    val Join(left, right, jt, Some(cond), hint) = j: @unchecked
    if (jt != Inner) return None
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
    } yield (lLo, lHi, rLo, rHi)).headOption.flatMap { case (lLo, lHi, rLo, rHi) =>
      resolveWidth(spec,
        Seq((left, lLo, lHi), (right, rLo, rHi))).map { width =>
        val tz = Some(conf.sessionLocalTimeZone)
        val lBin = AttributeReference("__graft_bin_l", LongType, nullable = true)()
        val rBin = AttributeReference("__graft_bin_r", LongType, nullable = true)()
        // START bins are aliased once per ROW below each explode; the
        // first-shared-bin predicate then references the attributes, so
        // the per-PAIR join condition stops re-deriving two
        // pmod+divide chains per bin-mate candidate
        val lBin0 = Alias(binOf(lLo, width), "__graft_bin0_l")()
        val rBin0 = Alias(binOf(rLo, width), "__graft_bin0_r")()
        val leftG = Generate(
          Explode(Sequence(lBin0.toAttribute, binOf(lHi, width), None, tz)),
          Nil, outer = false, None, Seq(lBin),
          Project(left.output :+ lBin0, left))
        val rightG = Generate(
          Explode(Sequence(rBin0.toAttribute, binOf(rHi, width), None, tz)),
          Nil, outer = false, None, Seq(rBin),
          Project(right.output :+ rBin0, right))
        val firstSharedBin =
          EqualTo(lBin, Greatest(Seq(lBin0.toAttribute, rBin0.toAttribute)))
        val newCond = And(And(EqualTo(lBin, rBin), firstSharedBin), cond)
        Project(j.output, Join(leftG, rightG, Inner, Some(newCond), hint))
      }
    }
  }
}
