package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, GetArrayItem, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DoubleType, IntegerType, LongType, ShortType}

import graft.functions.QuantileSketchLongs

/** Opt-in AQP rewrite #2 of the [[ApproxDistinctRewrite]] family: exact
  * `percentile(x, p)` over an integral column becomes the engine's own
  * mergeable KLL-family [[QuantileSketchLongs]]. The exact Catalyst
  * `Percentile` buffers EVERY distinct value with its count per
  * aggregation buffer (an OpenHashMap shipped through the shuffle) — over
  * a 100 TB high-cardinality column that is an unbounded state hazard,
  * while the sketch's buffer is O(k·log(n/k)) longs regardless of input.
  *
  * Same contract as the distinct rewrite: strictly opt-in via [[Flag]]
  * (every registry query stays oracle-exact with it off), installed by
  * [[graft.GraftExtensions]] before `RewriteDistinctAggregates`, and
  * descends into subquery expression plans (`transformUpWithSubqueries`)
  * so inner and outer percentiles see the same session semantics.
  *
  * Scope guards (anything else keeps its exact plan): single SCALAR
  * foldable percentage in (0, 1], unit frequency, non-reversed, DISTINCT
  * off, deterministic integral child. The rewritten value is the sketch's
  * percentile_disc-style rank estimate cast to the exact operator's
  * DOUBLE — a data value, not an interpolation, carrying the sketch's
  * rank-error envelope (validated by the spec against exact ranks).
  */
object ApproxPercentileRewrite extends Rule[LogicalPlan] {

  /** Session flag: set to "true" to enable the rewrite. */
  val Flag = "spark.graft.approx_percentile"

  /** Sketch accuracy knob (buffer ≤ 2k per level). */
  val SketchK = 2048

  private def scalarProb(e: Expression): Option[Double] = e match {
    case l: Literal => l.value match {
      case d: Double => Some(d)
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case d: java.math.BigDecimal => Some(d.doubleValue())
      case _ => None
    }
    case _ => None
  }

  private def integral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(Flag, "false").equalsIgnoreCase("true") &&
        !RuleOptIn.active(Flag)) plan
    else
      plan.transformUpWithSubqueries { case agg: Aggregate =>
        agg.transformExpressionsUp {
          case ae @ AggregateExpression(
                Percentile(child, pct, freq, _, _, false), _, false, _, _)
              if child.deterministic && integral(child) &&
                freq == Literal(1L) &&
                scalarProb(pct).exists(p => p > 0.0 && p <= 1.0) =>
            val sketch = ae.copy(
              aggregateFunction = QuantileSketchLongs(
                Cast(child, LongType), SketchK, Seq(scalarProb(pct).get)))
            Cast(GetArrayItem(sketch, Literal(0)), DoubleType)
        }
      }
}
