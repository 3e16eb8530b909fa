package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Descending, EqualTo, Explode, Expression, IntegerLiteral, Literal, SortOrder}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, BROADCAST, Generate, GlobalLimit, HintInfo, Join, JoinHint, LocalLimit, LogicalPlan, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType

import graft.functions.FreqSketchStrings

/** Opt-in AQP rewrite #3 of the [[ApproxDistinctRewrite]] family: the
  * exact heavy-hitters plan `ORDER BY count(*) DESC LIMIT k` over a
  * string-keyed group-by becomes Misra–Gries PROPOSE + exact VERIFY — the
  * two-pass scheme [[graft.functions.FreqSketchStrings]] documents as its
  * intended use, here applied by the optimizer so query code does not
  * change.
  *
  * Why: the exact plan's first aggregation keys the FULL key set — over a
  * 100 TB corpus the shuffle carries every distinct key once per map-side
  * partial, and the hash aggregate's state is key-cardinality-sized —
  * when only the k heaviest survive the limit. The rewrite inserts a
  * broadcast LEFT-SEMI join against the ≤ k′ sketch candidates BEFORE the
  * aggregation: pass 1 (the sketch) ships constant-size buffers, pass 2
  * aggregates only rows whose key is a candidate, so the big aggregation
  * state drops from |keys| to ≤ k′. Counts of surviving keys are EXACT
  * (verify is a plain count over the filtered rows); the only approximate
  * edge is a true top-k key whose frequency is ≤ n/(k′+1) — below the
  * Misra–Gries retention floor — going unproposed, which the spare factor
  * (k′ = max(64, 16k)) makes a heavy-tailed-distribution corner. That
  * trade (exact counts, possible misses at the candidate floor) is the
  * standard propose+verify contract.
  *
  * Both sides of the join reuse the SAME child subtree — the sketch pass
  * and the verify pass each scan the input once, exactly like the
  * hand-written two-pass query. The right side exposes only the fresh
  * exploded-candidate attribute (the aggregate output is dropped via
  * `unrequiredChildIndex`), so the join's output sets stay disjoint.
  *
  * Scope guards (anything else keeps its exact plan): GlobalLimit over
  * LocalLimit over a single-key descending Sort whose order attribute IS
  * an unfiltered, non-distinct `count(*)`/`count(lit)` alias of the
  * aggregate directly beneath; exactly one deterministic STRING grouping
  * expression; limit a positive literal. Strictly opt-in via [[Flag]];
  * descends into subquery plans like its siblings.
  */
object ApproxTopKRewrite extends Rule[LogicalPlan] {

  /** Session flag: set to "true" to enable the rewrite. */
  val Flag = "spark.graft.approx_topk"

  /** Proposal head-room: k′ = max(64, limit·SpareFactor) candidates. */
  val SpareFactor = 16

  private def isCountStar(e: Expression): Boolean = e match {
    case AggregateExpression(Count(Seq(l: Literal)), _, false, None, _) =>
      l.value != null
    case _ => false
  }

  /** Idempotence guard: the rewritten plan still matches the outer
    * pattern (Limit over Sort over Aggregate), and the optimizer batch
    * runs to a fixed point — without this check every iteration would
    * stack another propose+verify join.
    */
  private def alreadyRewritten(child: LogicalPlan): Boolean = child match {
    case Join(_, right, LeftSemi, _, _) =>
      right.exists {
        case a: Aggregate => a.aggregateExpressions.exists(
          _.exists(_.isInstanceOf[FreqSketchStrings]))
        case _ => false
      }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(Flag, "false").equalsIgnoreCase("true") &&
        !RuleOptIn.active(Flag)) plan
    else
      plan.transformUpWithSubqueries {
        case gl @ GlobalLimit(IntegerLiteral(limit),
              ll @ LocalLimit(_,
                srt @ Sort(
                  Seq(SortOrder(sattr: Attribute, Descending, _, _)), true,
                  agg @ Aggregate(Seq(gexpr), aggExprs, child, _), _)))
            if limit > 0 && gexpr.deterministic &&
              gexpr.dataType == StringType && !alreadyRewritten(child) &&
              aggExprs.exists {
                case a @ Alias(ae, _) =>
                  a.exprId == sattr.exprId && isCountStar(ae)
                case _ => false
              } =>
          val kPrime = math.max(64, limit * SpareFactor)
          val candsAlias = Alias(
            FreqSketchStrings(gexpr, kPrime).toAggregateExpression(), "cands")()
          val cand = AttributeReference("cand", StringType, nullable = false)()
          val proposals = Generate(
            Explode(candsAlias.toAttribute),
            unrequiredChildIndex = Seq(0),
            outer = false,
            qualifier = None,
            generatorOutput = Seq(cand),
            child = Aggregate(Nil, Seq(candsAlias), child))
          val semi = Join(child, proposals, LeftSemi,
            Some(EqualTo(gexpr, cand)),
            JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST)))))
          gl.copy(child = ll.copy(child =
            srt.copy(child = agg.copy(child = semi))))
      }
}
