package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in approximate-query-processing rewrite — the session-wide knob
  * that turns EXACT `count(DISTINCT x)` aggregations into constant-memory
  * HyperLogLog++ sketches without touching a line of query code (the
  * AQP idea of BlinkDB, Agarwal et al., EuroSys 2013, specialized to the
  * one aggregate whose exact form is a scale hazard: an exact distinct
  * over a 100 TB key column shuffles the full key SET — two extra
  * aggregation levels and a corpus-sized exchange payload — while the
  * sketch ships 2⁴ KB-class buffers through the same plan shape as a
  * plain count).
  *
  * Installed by [[graft.GraftExtensions]] via `injectOptimizerRule` into
  * the operator-optimization batch (so it sees `Count(..., isDistinct =
  * true)` BEFORE `RewriteDistinctAggregates` expands multi-distinct
  * plans). Strictly opt-in: inert unless the session sets [[ApproxDistinctRewrite.Flag]]
  * — flipping results of existing queries by default would violate the
  * engine's oracle-exactness contract, so every registry query runs with
  * it off and the rewrite is proven by its own spec (plan swaps to
  * `approx_count_distinct`, estimate lands within the published HLL++
  * error envelope, exact semantics restored the moment the flag drops).
  *
  * Scope guards: only single-argument, unfiltered-or-filtered DISTINCT
  * counts of deterministic children rewrite; `count(DISTINCT a, b)`
  * (struct cardinality) and nondeterministic inputs keep their exact
  * plans.
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  /** Session flag: set to "true" to enable the rewrite. */
  val Flag = "spark.graft.approx_distinct"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(Flag, "false").equalsIgnoreCase("true") &&
        !RuleOptIn.active(Flag)) plan
    else
      // transformUpWithSubqueries: a count(DISTINCT) inside a scalar/IN
      // subquery rewrites the same as the outer one — transformUp alone
      // leaves subquery expression plans exact, an inconsistent session
      plan.transformUpWithSubqueries { case agg: Aggregate =>
        agg.transformExpressionsUp {
          case ae @ AggregateExpression(Count(Seq(child)), _, true, _, _)
              if child.deterministic =>
            ae.copy(
              aggregateFunction = HyperLogLogPlusPlus(child),
              isDistinct = false)
        }
      }
}
