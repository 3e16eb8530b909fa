package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualTo}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Declared integrity constraints — the metadata a PK–FK join-elimination
  * optimizer needs and Spark's catalog cannot hold: `dimKey` is UNIQUE in
  * the dimension table identified by `dimPathToken`, and every fact-side
  * join key referencing it is NON-NULL and PRESENT in the dimension
  * (referential integrity). This is the RELY-constraint contract of
  * commercial optimizers (Oracle / DB2 / Snowflake): the system does not
  * verify the declaration — the data owner asserts it, and the optimizer
  * is licensed to drop semantically-redundant joins against it. Under
  * those two facts an INNER equi-join on the key is row-preserving (each
  * fact row matches exactly one dim row), so a join from which nothing
  * but the key survives is a no-op.
  */
object DeclaredConstraints {

  /** A declared PK–FK edge: the dimension scan's path token (the
    * [[MaterializedViews]] anchoring discipline — one corpus' orders
    * table never licenses eliminating a join against another's) and its
    * declared-unique key column.
    */
  final case class FkDef(dimPathToken: String, dimKey: String)

  private val defs = new ConcurrentHashMap[String, FkDef]()
  def register(d: FkDef): Unit = { defs.put(d.dimPathToken + "#" + d.dimKey, d); () }
  def registered: Seq[FkDef] = {
    import scala.jdk.CollectionConverters._
    defs.values.asScala.toSeq
  }
}

/** PK–FK join elimination — the classic semantic optimization Spark
  * lacks: an inner equi-join against a declared-unique, declared-referenced
  * dimension key from which the query keeps NO dimension column (after
  * Catalyst's own column pruning the dim leg is a bare key projection) is
  * removed outright, with downstream references to the dim key rebound to
  * the fact key (same exprId, so no re-analysis is needed). Runs inside
  * the operator-optimization fixpoint (injected via
  * `injectOptimizerRule`), so pruning has already exposed the key-only
  * shape by the time the rule matches. Guards, in order: opt-in flag;
  * INNER join with a single equi-predicate; the dim side prunes to
  * exactly its join key; the dim side is PURE (projections over the
  * registered scan only — a Filter on the dimension would make the join
  * selective and elimination wrong); the scan path and key name match a
  * [[DeclaredConstraints]] registration. Anything else keeps its plan
  * (spec-pinned negative guards). At 100 TB this deletes an entire
  * fact-sized shuffle or broadcast probe — the reason every warehouse
  * optimizer ships it.
  */
object JoinEliminationRule extends Rule[LogicalPlan] {

  /** Session flag: set to "true" to enable the elimination. */
  val Flag = "spark.graft.join_elimination"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(Flag, "false").equalsIgnoreCase("true") &&
        !RuleOptIn.active(Flag)) plan
    else
      plan.transformUpWithSubqueries {
        case j @ Join(_, _, Inner, Some(_), _) => eliminate(j).getOrElse(j)
      }

  /** The dim side must be projections over a single registered scan —
    * no Filter, no Aggregate, no generator: anything that could drop or
    * multiply rows voids the row-preservation argument.
    */
  private def pureScanOf(p: LogicalPlan): Option[HadoopFsRelation] = p match {
    case Project(_, child) => pureScanOf(child)
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => Some(fs)
      case _ => None
    }
    case _ => None
  }

  private def eliminate(j: Join): Option[LogicalPlan] = j match {
    case Join(left, right, Inner, Some(EqualTo(x: AttributeReference, y: AttributeReference)), _) =>
      val (lk, rk) =
        if (left.outputSet.contains(x) && right.outputSet.contains(y)) (x, y)
        else if (left.outputSet.contains(y) && right.outputSet.contains(x)) (y, x)
        else return None
      // the dim leg must have pruned to exactly its key
      if (right.output != Seq(rk)) return None
      val fs = pureScanOf(right).getOrElse(return None)
      val declared = DeclaredConstraints.registered.exists(d =>
        d.dimKey == rk.name &&
          fs.location.rootPaths.exists(_.toString.contains(d.dimPathToken)))
      if (!declared) return None
      // output shape of the join was left.output :+ rk; rebind rk to the
      // fact key under rk's exprId so parents resolve unchanged
      Some(Project(
        left.output :+ Alias(lk, rk.name)(exprId = rk.exprId), left))
    case _ => None
  }
}
