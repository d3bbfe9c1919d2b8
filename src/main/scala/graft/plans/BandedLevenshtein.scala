package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite thresholded full-DP Levenshtein predicates
  * into the banded early-exit form.
  *
  * `levenshtein(a, b) <= k` computes the full O(|a|·|b|) dynamic
  * program and then throws away everything but one bit. The 3-arg
  * banded form (Ukkonen's band: only the ±k diagonal is filled, exit
  * the moment the band exceeds k) returns the same distance for
  * matching pairs and −1 otherwise, at O(k·n) — on a blocked
  * record-linkage join the full-DP form is the single hottest
  * expression in the plan, and the identity
  *
  *   `levenshtein(a,b) <= k  ⟺  levenshtein(a,b,k) >= 0`      (k ≥ 0)
  *   `levenshtein(a,b) <  k  ⟺  levenshtein(a,b,k−1) >= 0`    (k ≥ 1)
  *
  * holds row-for-row including NULL propagation (NULL inputs make
  * both sides NULL, so a Filter drops the row either way). Rewrites
  * apply inside Filter predicates and Join conditions — the two
  * places a threshold comparison can sit after predicate pushdown.
  * Comparisons whose literal makes the predicate constant
  * (`lev < 0`, `lev <= -1`) are left for constant folding to kill.
  *
  * Registered by [[graft.GraftExtensions]] (config path:
  * `spark.sql.extensions=graft.GraftExtensions`; live-session path:
  * `GraftExtensions.register`, via `experimental.extraOptimizations`).
  * A hand-written `levenshtein(a, b, k)` is never touched — the rule
  * only fires on the `threshold = None` form.
  */
object BandedLevenshteinRule extends Rule[LogicalPlan] {

  private def banded(l: Expression, r: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(l, r, Some(Literal(k))), Literal(0))

  private def rewrite(cond: Expression): Expression = cond.transformUp {
    case LessThanOrEqual(Levenshtein(l, r, None), Literal(k: Int, IntegerType))
      if k >= 0 => banded(l, r, k)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(l, r, None))
      if k >= 0 => banded(l, r, k)
    case LessThan(Levenshtein(l, r, None), Literal(k: Int, IntegerType))
      if k >= 1 => banded(l, r, k - 1)
    case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(l, r, None))
      if k >= 1 => banded(l, r, k - 1)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val c2 = rewrite(cond)
      if (c2.fastEquals(cond)) f else Filter(c2, child)
    case j: Join if j.condition.isDefined =>
      val c2 = rewrite(j.condition.get)
      if (c2.fastEquals(j.condition.get)) j else j.copy(condition = Some(c2))
  }
}
