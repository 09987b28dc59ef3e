package graft.plans

import org.apache.spark.sql.catalyst.expressions.Round
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (SURVEY §2 custom-operator ladder, rung (c), optimizer
  * side): `round(round(x, n), n)` → `round(x, n)`.
  *
  * HALF_UP rounding is idempotent at a fixed scale — the inner round's
  * result has at most n decimal digits, so the outer round is the identity
  * on it. The pattern arises naturally when library code composes
  * `Exact.roundN` helpers (a rounded metric fed into a rounded projection);
  * collapsing it removes a decimal conversion per row from codegen.
  *
  * Demonstrates `SparkSessionExtensions.injectOptimizerRule`: the rule runs
  * inside Catalyst's user-provided-optimizers batch, so it composes with
  * the built-in optimizations rather than post-processing plans.
  */
object CollapseRedundantRound extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case outer: Round =>
        outer.child match {
          case inner: Round if inner.scale.semanticEquals(outer.scale) => inner
          case _ => outer
        }
    }
}
