package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: a `levenshtein(a, b) <= k` / `< k` comparison
  * against a non-negative Int literal is rewritten to the THRESHOLDED
  * `levenshtein(a, b, k)` form, whose banded algorithm is O(k·n)
  * instead of the O(m·n) full matrix and bails out early (returning −1)
  * once the bar is unreachable — the predicate becomes
  * `levenshtein(a, b, k) >= 0` (the 3-arg form returns the distance iff
  * it is ≤ k). Users write the natural predicate; every edit-distance
  * dedup verify gets the banded path for free.
  *
  * Only the predicate-only shape rewrites: when the query also SELECTS
  * the distance value, the full computation is what the user asked for.
  */
object ThresholdLevenshteinRule extends Rule[LogicalPlan] {

  private def thresholded(l: Levenshtein, k: Int): Expression =
    GreaterThanOrEqual(
      Levenshtein(l.left, l.right, Some(Literal(k, IntegerType))),
      Literal(0, IntegerType))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // lev(a,b) <= k  ⇔  lev(a,b,k) >= 0
      case LessThanOrEqual(l: Levenshtein, Literal(k: Int, IntegerType))
          if l.threshold.isEmpty && k >= 0 =>
        thresholded(l, k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), l: Levenshtein)
          if l.threshold.isEmpty && k >= 0 =>
        thresholded(l, k)
      // lev(a,b) < k  ⇔  lev(a,b,k−1) >= 0
      case LessThan(l: Levenshtein, Literal(k: Int, IntegerType))
          if l.threshold.isEmpty && k >= 1 =>
        thresholded(l, k - 1)
      case GreaterThan(Literal(k: Int, IntegerType), l: Levenshtein)
          if l.threshold.isEmpty && k >= 1 =>
        thresholded(l, k - 1)
    }
}
