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
  *   - convergence = the edge set is a STAR FOREST (no node is both a
  *     child and a center: src ∩ dst = ∅, one semi-join per round). This
  *     is sound because every round preserves connected components
  *     (Kiveris Lemma 1+2): a star forest that split a component would
  *     disconnect it, and a star whose center is not the component min
  *     would leave the min reachable only through its center — making the
  *     center a child too. Detecting the fixpoint STRUCTURALLY also saves
  *     the extra confirming round an edges-unchanged check needs;
  *   - per-node neighbor lists are bounded by the star-contraction itself:
  *     large-star attaches big neighbors to the local min, so no node
  *     accumulates an unbounded adjacency (the paper's Thm 2).
  */
object ConnectedComponents {

  /** Large-Star: for each node u (over symmetrized edges), connect every
    * strictly-larger neighbor to m = min(Γ(u) ∪ {u}). Output is NOT
    * deduplicated — the only consumer is [[smallStar]], whose
    * `collect_set` dedups on arrival, so a distinct here would buy one
    * extra full shuffle per round for nothing.
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
    var e = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    var rounds = 0
    var converged = isStarForest(e)
    while (!converged && rounds < maxIter) {
      e = smallStar(largeStar(e)).localCheckpoint()
      rounds += 1
      converged = isStarForest(e)
    }
    require(converged, s"connected components did not converge in $maxIter rounds")
    // e is now a star forest whose edges cover every input node (each
    // round preserves components, and every component has ≥2 nodes by
    // construction — self-loops were dropped): children map to their
    // center, centers to themselves. No join against a node table needed.
    val mapping = e.select(col("src").as("id"), col("dst").as("component"))
      .union(e.select(col("dst").as("id"), col("dst").as("component")).distinct())
    (mapping, rounds)
  }

  /** Structural fixpoint signature, one aggregation job: every edge points
    * child → smaller center, each child has exactly ONE center, and no
    * node is both child and center. Such a star forest is verifiably a
    * fixpoint of large∘small star, and each center is its star's minimum =
    * its component's minimum (centers are smaller than all their children
    * and components equal stars). Any weaker check admits non-fixpoints:
    * e.g. {(5,1),(5,2)} has disjoint src/dst sets but small-star still
    * rewires it (the spec's center-as-src star caught exactly this class).
    */
  private def isStarForest(e: DataFrame): Boolean =
    e.select(col("src").as("n"), lit(1L).as("child"), lit(0L).as("center"),
        when(col("dst") >= col("src"), 1L).otherwise(0L).as("bad"))
      .union(e.select(col("dst").as("n"), lit(0L).as("child"),
        lit(1L).as("center"), lit(0L).as("bad")))
      .groupBy(col("n"))
      .agg(sum(col("child")).as("c"), sum(col("center")).as("r"),
        sum(col("bad")).as("b"))
      .where(col("c") > 1 || col("b") > 0 || (col("c") > 0 && col("r") > 0))
      .limit(1)
      .isEmpty

  /** (id, component) for every node appearing in `edges`, where `component`
    * is the minimum node id of the node's connected component.
    */
  def components(edges: DataFrame, maxIter: Int = 50): DataFrame =
    componentsWithStats(edges, maxIter)._1
}
