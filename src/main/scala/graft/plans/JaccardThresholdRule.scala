package graft.plans

import org.apache.spark.sql.catalyst.expressions.{GreaterThanOrEqual, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.{JaccardSorted, JaccardSortedGE}

/** Optimizer rule: `jaccard_sorted(a, b) >= t` (either comparison
  * orientation, positive literal threshold) becomes the fused predicate
  * [[graft.functions.JaccardSortedGE]] — O(1) size-ratio reject plus
  * early-exit merge scan, decision-identical to the full computation.
  *
  * This is the engine's one custom `Rule[LogicalPlan]` (SURVEY §7
  * extension point c): the LSH dedup operators filter millions of
  * candidate pairs on a Jaccard threshold, the filter sits below the
  * projection that needs the exact value, and Catalyst has no way to know
  * the comparison admits a cheaper evaluation — exactly the situation
  * where an expression-level rewrite rule (not a wrapper-API change) is
  * the right tool, because it also fires for user-written
  * `expr("jaccard_sorted(a, b) >= 0.8")` SQL. Idempotent by construction:
  * the matched pattern no longer exists after the rewrite.
  */
object JaccardThresholdRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case GreaterThanOrEqual(j: JaccardSorted, Literal(t: Double, DoubleType)) if t > 0 =>
      JaccardSortedGE(j.left, j.right, t)
    case LessThanOrEqual(Literal(t: Double, DoubleType), j: JaccardSorted) if t > 0 =>
      JaccardSortedGE(j.left, j.right, t)
  }
}
