package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, GenericInternalRow, IntegerLiteral, JoinedRow, LessThan, LessThanOrEqual, RowNumber, RowOrdering, SortOrder, SpecifiedWindowFrame, UnsafeProjection, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Whole-operator Catalyst extension — the one extension point the
  * expression/aggregate/optimizer-rule surface cannot reach: a custom
  * LOGICAL node ([[TopKPerKey]]), an opt-in optimizer [[Rule]] that
  * recognizes the grouped-top-k idiom ([[TopKExecRewrite]]), a planner
  * [[SparkStrategy]] ([[TopKStrategy]]), and two physical [[SparkPlan]]s
  * ([[TopKPerKeyPartialExec]], [[TopKPerKeyFinalExec]]), all registered
  * through `SparkSessionExtensions` (graft.GraftExtensions).
  *
  * The idiom: `row_number() OVER (PARTITION BY key ORDER BY o)` filtered
  * to `rk <= k` — grouped top-k. Spark's physical plan for it is
  * Exchange(ALL rows) → full per-partition SORT → Window → Filter: every
  * row of every group crosses the wire and is sorted, then all but k per
  * group are discarded. The dedicated operator keeps a bounded k-heap
  * per key on BOTH sides of the exchange: the partial node prunes each
  * map partition to ≤ k rows per key before the shuffle (the map-side
  * combine for top-k that Spark lacks natively), the final node merges heaps and emits
  * ranks — no sort of anything beyond k rows per (key, partition), state
  * bounded by keys·k, shuffle volume bounded by partitions·keys·k rows
  * instead of n. At 100 TB with hot keys this is the difference between
  * a skew-prone global sort and a flat two-pass aggregation.
  *
  * Exactness: the heap ordering IS the window's `orderSpec`; ties beyond
  * it would make row_number nondeterministic in the original plan too, so the
  * rewrite preserves any run's legal output and agrees bit-for-bit
  * whenever the ordering is total (the registered query tiebreaks on a
  * key column, as every deterministic top-k query must). Strictly opt-in
  * via [[TopKExecRewrite.Flag]]; everything else plans unchanged.
  */
case class TopKPerKey(
    grouping: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

/** Opt-in rewrite: Filter(rk <= k, Window([rk := row_number()], key, o))
  * → [[TopKPerKey]]. Matches `<=` and `<` against an integer literal on
  * the window's OWN row_number alias, with the default
  * unbounded-preceding→current-row row frame; any other shape (further
  * window expressions in the same node, rank/dense_rank, expressions on
  * rk, non-literal bounds) keeps the exact Window plan.
  */
object TopKExecRewrite extends Rule[LogicalPlan] {

  /** Session flag: set to "true" to enable the rewrite. */
  val Flag = "spark.graft.topk_exec"

  private def rowNumberAlias(e: Expression): Boolean = e match {
    case Alias(WindowExpression(RowNumber(),
        WindowSpecDefinition(_, _, _: SpecifiedWindowFrame)), _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(Flag, "false").equalsIgnoreCase("true") &&
        !RuleOptIn.active(Flag)) plan
    else
      plan.transformUpWithSubqueries {
        case f @ Filter(cond,
              w @ Window(Seq(al @ Alias(_, _)), partSpec, orderSpec, child, _))
            if rowNumberAlias(al) && orderSpec.nonEmpty =>
          val kOpt = cond match {
            case LessThanOrEqual(a: Attribute, IntegerLiteral(k))
                if a.exprId == al.exprId => Some(k)
            case LessThan(a: Attribute, IntegerLiteral(k))
                if a.exprId == al.exprId => Some(k - 1)
            case _ => None
          }
          kOpt match {
            case Some(k) if k > 0 =>
              TopKPerKey(partSpec, orderSpec, k, al.toAttribute, child)
            case _ => f
          }
      }
}

/** Plans [[TopKPerKey]] as final-over-partial; the exchange between them
  * is inserted by EnsureRequirements from the final node's required
  * distribution, so the partial pruning runs map-side, before the wire.
  */
class TopKStrategy(session: SparkSession) extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case t: TopKPerKey =>
      TopKPerKeyFinalExec(t.grouping, t.order, t.k, t.rankAttr,
        TopKPerKeyPartialExec(t.grouping, t.order, t.k,
          planLater(t.child))) :: Nil
    case _ => Nil
  }
}

/** Shared per-partition bounded-heap pass: one k-heap per key (worst kept
  * row on top via the REVERSED sort order), rows copied on retention
  * (UnsafeRow buffers are reused by the scan), emitted ascending with a
  * 1-based rank appended when `withRank`.
  */
private[plans] object TopKHeaps {
  def prune(
      it: Iterator[InternalRow],
      grouping: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      input: Seq[Attribute],
      withRank: Boolean,
      numInput: SQLMetric,
      numOutput: SQLMetric): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(grouping, input)
    val ord = RowOrdering.create(order, input)
    val heaps = new java.util.LinkedHashMap[
      InternalRow, java.util.PriorityQueue[InternalRow]]()
    it.foreach { row =>
      numInput += 1
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        heap = new java.util.PriorityQueue[InternalRow](k + 1, ord.reverse)
        heaps.put(key.copy(), heap)
      }
      if (heap.size < k) heap.add(row.copy())
      else if (ord.compare(row, heap.peek()) < 0) {
        heap.poll(); heap.add(row.copy()); ()
      }
    }
    import scala.jdk.CollectionConverters._
    heaps.values().iterator().asScala.flatMap { heap =>
      val rows = new Array[InternalRow](heap.size)
      var i = rows.length - 1
      // poll order is WORST-first (reversed ordering), so fill backwards
      while (i >= 0) { rows(i) = heap.poll(); i -= 1 }
      numOutput += rows.length
      if (!withRank) rows.iterator
      else rows.iterator.zipWithIndex.map { case (r, idx) =>
        new JoinedRow(r, new GenericInternalRow(Array[Any](idx + 1)))
      }
    }
  }
}

/** Map-side pruning: ≤ k rows per key per input partition, no rank, no
  * required distribution — runs before the exchange.
  */
case class TopKPerKeyPartialExec(
    grouping: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: Nil
  // the operator's ledger in the UI: how many rows the map-side heaps
  // KEPT vs saw is exactly the shuffle volume the rewrite saves
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numInputRows" -> SQLMetrics.createMetric(sparkContext, "input rows"),
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "output rows"))
  override protected def doExecute(): RDD[InternalRow] = {
    val (in, out) = (longMetric("numInputRows"), longMetric("numOutputRows"))
    child.execute().mapPartitions(
      TopKHeaps.prune(_, grouping, order, k, child.output,
        withRank = false, in, out),
      preservesPartitioning = true)
  }
  override protected def withNewChildInternal(c: SparkPlan) = copy(child = c)
}

/** Reduce side: clustered on the keys (EnsureRequirements inserts the
  * hash exchange), merges the pruned candidates and emits the 1-based
  * rank the replaced row_number alias carried.
  */
case class TopKPerKeyFinalExec(
    grouping: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def requiredChildDistribution: Seq[Distribution] =
    if (grouping.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(grouping) :: Nil
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numInputRows" -> SQLMetrics.createMetric(sparkContext, "input rows"),
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "output rows"))
  override protected def doExecute(): RDD[InternalRow] = {
    val (in, out) = (longMetric("numInputRows"), longMetric("numOutputRows"))
    child.execute().mapPartitions(
      TopKHeaps.prune(_, grouping, order, k, child.output,
        withRank = true, in, out),
      preservesPartitioning = true)
  }
  override protected def withNewChildInternal(c: SparkPlan) = copy(child = c)
}
