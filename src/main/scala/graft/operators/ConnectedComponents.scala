package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the transitive-
  * closure step every dedup pipeline needs between "pair evidence" and
  * "duplicate clusters" (pair detectors emit edges; the cluster is the
  * connected component; the canonical document is the component minimum).
  *
  * Algorithm: alternating Large-Star / Small-Star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14). Each round is
  * two keyed aggregations (shuffle on node id); the edge set converges to a
  * star per component (every node pointing at the component min) in
  * O(log² n) rounds — independent of component DIAMETER, which is the
  * property that matters at scale: naive min-label propagation needs
  * diameter rounds, and a 10⁶-node path (what linear adjacent-pair edge
  * emission produces for a 10⁶-member duplicate group) would never finish.
  *
  * Scale design (100 TB):
  *   - each round shuffles only the CURRENT edge set, keyed by node —
  *     no vertex-state table, no broadcast;
  *   - `localCheckpoint` after every round truncates lineage (an iterative
  *     plan otherwise re-executes all prior rounds on every action);
  *   - convergence is an exact set-equality check (count + anti-join),
  *     two cheap jobs against checkpointed inputs;
  *   - per-node neighbor lists are bounded by the star-contraction itself:
  *     large-star attaches big neighbors to the local min, so no node
  *     accumulates an unbounded adjacency (the paper's Thm 2).
  */
object ConnectedComponents {

  /** Large-Star: for each node u (over symmetrized edges), connect every
    * strictly-larger neighbor to m = min(Γ(u) ∪ {u}).
    */
  private[operators] def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
    sym.groupBy(col("src"))
      .agg(collect_set(col("dst")).as("nbrs"))
      .select(
        least(array_min(col("nbrs")), col("src")).as("m"),
        explode(filter(col("nbrs"), v => v > col("src"))).as("v"))
      .where(col("v") =!= col("m"))
      .select(col("v").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** Small-Star: direct each edge large→small, then for each node u connect
    * every small neighbor (and u itself) to m = min(N(u) ∪ {u}).
    */
  private[operators] def smallStar(edges: DataFrame): DataFrame = {
    val directed = edges.select(
      greatest(col("src"), col("dst")).as("src"),
      least(col("src"), col("dst")).as("dst"))
    directed.groupBy(col("src"))
      .agg(collect_set(col("dst")).as("nbrs"))
      .select(
        least(array_min(col("nbrs")), col("src")).as("m"),
        explode(array_union(col("nbrs"), array(col("src")))).as("v"))
      .where(col("v") =!= col("m"))
      .select(col("v").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** (components, rounds): component mapping plus how many large+small
    * rounds convergence took (exposed so specs can assert the O(log² n)
    * bound — a 512-node path must converge in ~log rounds, not 512).
    */
  def componentsWithStats(edges: DataFrame, maxIter: Int = 50): (DataFrame, Int) = {
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
      .distinct()
    var e = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      // both sides are distinct sets: equal iff same count and no row of
      // `next` is missing from `e`
      converged = next.count() == e.count() && next.except(e).isEmpty
      e = next
      rounds += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")
    // e is now a star forest: (member, component-min) for every non-root
    val mapping = nodes
      .join(e.withColumnRenamed("src", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("dst"), col("id")).as("component"))
    (mapping, rounds)
  }

  /** (id, component) for every node appearing in `edges`, where `component`
    * is the minimum node id of the node's connected component.
    */
  def components(edges: DataFrame, maxIter: Int = 50): DataFrame =
    componentsWithStats(edges, maxIter)._1
}
