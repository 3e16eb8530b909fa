package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Results must not depend on the physical plan: a registry query has to
  * produce IDENTICAL rows when AQE is disabled and the shuffle partition
  * count changes (2 vs the shared session's 4) — the property that makes
  * the DuckDB hash gate meaningful on a 1000-executor cluster, where the
  * optimizer is free to re-plan per run. Exercises the conventions the
  * registry claims (decimal/cents-routed exact sums, total ORDER BY,
  * order-independent aggregates) against actual re-planning.
  *
  * A representative query per convention class keeps the suite fast; the
  * oracle gate covers the full registry per SF.
  */
class DeterminismSpec extends AnyFunSuite with Matchers {

  private val names = Seq(
    "q1_agg", // cents-routed exact money aggregation
    "q_join_shuffle", // fact-fact join + agg
    "q_window_rank", // window over explicit total order
    "q_dedup_minhash", // sketch pipeline with persisted intermediate
    "q_kmv", // bounded custom aggregate (merge-order free by proof)
    "q_pack", // stream window + reused partitioning
    "q_tfidf", // rounded-double scoring path
    "q_sample_stratified", // hash-bucket membership
    "q_pagerank", // iterative integer fixed point across checkpoints
    "q_sample_pps", // two-pass prefix-sum multiplicities
    "q_curriculum", // driver-derived histogram boundary literals
    "q_triangles", // multi-self-join census counts
    "q_range_search", // replicated-probe grid self-join, exact predicate
    "q_ab_lift", // hash-arm assignment + shared-verbatim IEEE statistic
    "q_dbscan_cluster", // grid edges + alternating-star CC + min-label
    "q_er_linkage", // blocked bipartite join + integer-weight scoring
    "q_lsh_bands", // multi-scheme banding over one signature table
    "q_topk_exec", // custom partial/final heap exec (Window plan here —
    // no extensions on these sessions; the exec path's replan-invariance
    // is pinned by GraftExtensionsSpec's bit-equality against this plan
    "q_pq_search", // ADC lookup-table join + exact integer ppm ranking
    "q_stream_wc", // drained file-source stream, update-mode collapse
    "q_bootstrap", // per-(row, replicate) hash weights + rank-pair CI
    "q_dpp", // runtime partition pruning must be a plan-only change
    "q_stream_stream_join", // drained watermarked stream-stream interval join
    "q_coreset", // memoized greedy k-center selection + literal-array census
    "q_auc", // per-distinct-value cumulative window + two-step integer div
    "q_bootstrap_median", // replicate-partitioned histogram walk, integer CI
    "q_mrr") // argmax struct tie-break + count-ordering-before rank

  test("representative queries are bit-identical with AQE off and a " +
    "different shuffle partitioning") {
    // baseline rows from the shared session (AQE on, 4 shuffle partitions)
    val want = names.map { n =>
      n -> SparkEntry.queries(n)(SparkSpec.session, "/root/testdata/sf0.001")
        .collect().toSeq.map(_.toString)
    }.toMap

    // a second session in the same JVM with a different physical regime
    // (create(), not getOrCreate(), so the configs actually apply)
    val alt = SparkSession.builder()
      .master("local[4]")
      .appName("graft-determinism")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .create()
    alt.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val got = SparkEntry.queries(n)(alt, "/root/testdata/sf0.001")
        .collect().toSeq.map(_.toString)
      withClue(s"$n under AQE=off, shuffle.partitions=2: ") {
        got shouldBe want(n)
      }
    }
  }
}
