package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Coalesce, ExprId, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Materialized-view query rewriting — the second whole-rule optimizer
  * capability after the AQP family: a query aggregating the BASE table is
  * answered from a pre-aggregated catalog table when (a) its grouping
  * columns are a subset of the view's keys and (b) every aggregate has a
  * registered re-aggregable partial in the view (counts sum, integer-cents
  * sums sum — the house exactness discipline is what makes the rewrite
  * bit-identical, not merely approximately right). The classic rollup
  * property: a view at (flag, status) granularity answers GROUP BY flag,
  * GROUP BY status, and the grand total, each with |view| input rows
  * instead of |base|.
  *
  * Matching is name+template based: grouping expressions must be plain
  * attribute references onto the view's key columns; each aggregate
  * function must satisfy a matcher registered WITH the view — count(*)
  * structurally, sums by the canonicalized SQL of their input expression
  * plus its reference set (captured from an analyzed probe at view-creation
  * time, so the matcher and the view column are derived from the same
  * expression, never hand-synced). The base-table check anchors on the
  * scan's root path, so a different corpus' lineitem never matches another
  * dir's view. Strictly opt-in via [[MvRewrite.Flag]]; anything
  * unmatched — an uncovered aggregate, a non-key grouping, a distinct —
  * keeps its base plan (spec-pinned negative guard).
  */
object MaterializedViews {

  /** One aggregate the view can answer: `matches` recognizes the base
    * plan's aggregate FUNCTION; `viewCol` holds the per-group partials
    * that re-aggregate to it by summation.
    */
  final case class AggMap(matches: AggregateFunction => Boolean, viewCol: String)

  /** A registered view: catalog table, key column names, a token of the
    * base table's scan path, the aggregate maps, and — for views built
    * over a FILTERED base (a TPC-H Q15 revenue view is one quarter of
    * lineitem) — the sorted normalized-SQL conjuncts of that filter.
    * A query matches only when its own filter conjuncts normalize to the
    * SAME set: an unfiltered view never answers a filtered query (that
    * would widen the row set) and a filtered view never answers an
    * unfiltered or differently-filtered one (that would narrow it).
    */
  final case class MvDef(
      table: String, keys: Seq[String], pathToken: String, aggs: Seq[AggMap],
      filterCanon: Seq[String] = Nil)

  /** The sorted normalized conjuncts of a plan subtree's Filter nodes —
    * the registration-side probe for [[MvDef.filterCanon]]: build
    * `base.filter(pred)`, optimize, and pass the plan here so the
    * template and the view rows derive from the same expression (the
    * sumOf discipline applied to predicates; the optimizer's constant
    * folding and IsNotNull inference hit probe and query identically).
    */
  def filterCanonOf(optimized: LogicalPlan): Seq[String] =
    optimized.collect { case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
      splitConjuncts(f.condition).map(normalizedSql)
    }.flatten.sorted

  private[plans] def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private val defs = new ConcurrentHashMap[String, MvDef]()
  def register(d: MvDef): Unit = { defs.put(d.table, d); () }
  def registered: Seq[MvDef] = {
    import scala.jdk.CollectionConverters._
    defs.values.asScala.toSeq
  }

  /** Portable normal form for an aggregate-input expression: every
    * attribute reference is pinned to exprId 0 BEFORE canonicalization —
    * Catalyst's commutative-operand reordering sorts by hashCode, which
    * includes exprIds, so the raw `canonicalized.sql` of the same
    * expression differs across plans (measured: the cents template
    * rendered with operands in two different orders in two sessions).
    * With ids pinned, the reorder is deterministic and the string is a
    * stable cross-plan fingerprint.
    */
  def normalizedSql(e: Expression): String =
    e.transform {
      case a: AttributeReference =>
        AttributeReference(a.name, a.dataType, a.nullable)(exprId = ExprId(0))
    }.canonicalized.sql

  /** count(*) / count(lit) — the shape every engine emits for COUNT(*). */
  def countStar(f: AggregateFunction): Boolean = f match {
    case Count(Seq(l: Literal)) => l.value != null
    case _ => false
  }

  /** sum(e) where e's canonicalized SQL equals the probe-captured
    * template and e references exactly `colName`.
    */
  def sumOf(canon: String, colName: String)(f: AggregateFunction): Boolean =
    sumOfExpr(canon, Set(colName))(f)

  /** sum(e) where e's canonicalized SQL equals the probe-captured
    * template and e references exactly `cols` — the multi-column variant
    * for derived measures like TPC-H revenue
    * (price·(1−discount) references two columns).
    */
  def sumOfExpr(canon: String, cols: Set[String])(f: AggregateFunction): Boolean =
    f match {
      case s: Sum =>
        s.child.references.map(_.name).toSet == cols &&
          normalizedSql(s.child) == canon
      case _ => false
    }
}

object MvRewrite extends Rule[LogicalPlan] {

  /** Session flag: set to "true" to enable the rewrite. */
  val Flag = "spark.graft.mv_rewrite"

  /** Walks the aggregate's child accepting only pruning Projects and
    * Filters over ONE base-table scan; returns the filter conjuncts.
    * Anything else (a join, a computed Project, a union, a different
    * relation) aborts the match. This shape check is load-bearing for
    * correctness, not a convenience: a mere "subtree contains the base
    * scan" test would rewrite Aggregate(Filter(base)) to the unfiltered
    * view and silently DROP the filter.
    */
  private def shapeOf(
      child: LogicalPlan,
      d: MaterializedViews.MvDef): Option[Seq[Expression]] = child match {
    case p: org.apache.spark.sql.catalyst.plans.logical.Project
        if p.projectList.forall(_.isInstanceOf[AttributeReference]) =>
      shapeOf(p.child, d)
    case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
      shapeOf(f.child, d)
        .map(MaterializedViews.splitConjuncts(f.condition) ++ _)
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation
          if fs.location.rootPaths.exists(_.toString.contains(d.pathToken)) =>
        Some(Nil)
      case _ => None
    }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(Flag, "false").equalsIgnoreCase("true") &&
        !RuleOptIn.active(Flag)) plan
    else
      plan.transformUpWithSubqueries {
        case agg @ Aggregate(groupings, aggExprs, child, _) =>
          MaterializedViews.registered.iterator
            .flatMap { d =>
              try rewrite(groupings, aggExprs, child, d)
              catch { case MvNoColumn => None }
            }
            .nextOption()
            .getOrElse(agg)
      }

  private def rewrite(
      groupings: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      aggExprs: Seq[NamedExpression],
      child: LogicalPlan,
      d: MaterializedViews.MvDef): Option[LogicalPlan] = {
    val conjuncts = shapeOf(child, d) match {
      case Some(cs) => cs
      case None => return None
    }
    // the query's filter must BE the view's filter (normalized conjunct
    // sets equal) — subset/superset would change the row population
    if (conjuncts.map(MaterializedViews.normalizedSql).sorted
        != d.filterCanon) return None
    val gAttrs = groupings.map {
      case a: AttributeReference if d.keys.contains(a.name) => a
      case _ => return None
    }
    // the OPTIMIZED subtree: post-optimizer plans may not contain
    // analysis-only nodes (SubqueryAlias has no planner strategy). The
    // defs registry is JVM-global but catalogs are per-session: a session
    // where the view table was never materialized must keep its base
    // plan, not crash the optimizer batch
    val view =
      try SparkSession.active.table(d.table).queryExecution.optimizedPlan
      catch { case _: org.apache.spark.sql.AnalysisException => return None }
    def vcol(n: String): org.apache.spark.sql.catalyst.expressions.Attribute =
      view.output.find(_.name == n)
        .getOrElse(throw MvNoColumn)
    // Rewrites an output expression's tree top-down: embedded aggregate
    // calls swap to view-partial re-aggregations, key references swap to
    // view columns, and any OTHER attribute or unmatched aggregate aborts
    // the match. Top-down recursion (not transformUp) is load-bearing:
    // the scalar wrapper around an aggregate — CollapseProject folds a
    // post-aggregation `(sum/10⁴)::double` Project INTO the Aggregate's
    // output list — must be preserved while the aggregate inside it is
    // replaced, and the non-key columns INSIDE a matched aggregate
    // (sum(price·(1−disc)) references two non-key columns) must never be
    // visited.
    def rw(e: Expression): Expression = e match {
      case ae: AggregateExpression if !ae.isDistinct =>
        d.aggs.find(_.matches(ae.aggregateFunction)) match {
          case Some(m) =>
            val summed = AggregateExpression(Sum(vcol(m.viewCol)), Complete,
              isDistinct = false)
            // empty-input semantics (round-8 advisor): a GLOBAL aggregate
            // (no grouping) emits one row even over an empty base, where
            // count(*) is 0 but sum over the (also empty) view is NULL —
            // coalesce the count rewrite to 0. Grouped aggregates emit no
            // row in both plans, and sum-rewrites are NULL in both.
            if (groupings.isEmpty &&
                ae.aggregateFunction.isInstanceOf[Count])
              Coalesce(Seq(summed, Literal(0L)))
            else summed
          case None => throw MvNoColumn
        }
      case _: AggregateExpression => throw MvNoColumn
      case a: AttributeReference =>
        if (d.keys.contains(a.name)) vcol(a.name) else throw MvNoColumn
      case other => other.mapChildren(rw)
    }
    val newAggExprs: Seq[NamedExpression] = aggExprs.map {
      case a: AttributeReference if d.keys.contains(a.name) =>
        Alias(vcol(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(body, name) =>
        Alias(rw(body), name)(exprId = al.exprId)
      case _ => return None
    }
    Some(Aggregate(gAttrs.map(a => vcol(a.name)), newAggExprs, view))
  }

  /** Control-flow sentinel aborting a candidate match (the base plan is
    * kept): a registered view missing a declared column, an aggregate no
    * AggMap recognizes, or a non-key column referenced outside an
    * aggregate.
    */
  private object MvNoColumn extends RuntimeException
}
