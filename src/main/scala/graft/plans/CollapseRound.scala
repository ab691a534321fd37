package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Literal, Round}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Custom optimizer rule (the `injectOptimizerRule` step of the
  * custom-operator ladder, SURVEY.md §2.10): collapse idempotent nested
  * rounding of doubles.
  *
  * Why it exists: every oracle-checked operator in this engine rounds
  * its float outputs for cross-engine hash stability, so COMPOSING
  * operators (quality filter → clean pipeline → mix, q83/q84/q95 style)
  * produces `round(round(x, s1), s2)` towers. For doubles with literal
  * scales and s2 >= s1 the outer round is a no-op — `round(x, s1)` is
  * already exact at s1 decimal places, and HALF_UP re-rounding at an
  * equal-or-finer scale returns the identical double — so the tower
  * collapses to the inner round. One fewer BigDecimal conversion per
  * row per tower inside whole-stage codegen; semantics unchanged.
  *
  * Registered by `GraftExtensions` (both the `spark.sql.extensions`
  * path and runtime `register`); ScaleOpsSpec asserts the plan collapse
  * and value equality.
  */
object CollapseRound extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case outer @ Round(inner @ Round(_, Literal(si: Int, IntegerType), _),
                       Literal(so: Int, IntegerType), _)
        if outer.dataType == DoubleType && inner.dataType == DoubleType && so >= si =>
      inner
  }
}
