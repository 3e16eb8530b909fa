package graft.operators

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** TPC-H remainder suite: smoke at sf0.001 (value parity runs through the
  * DuckDB gate — tools/check_oracle.py, 12/12 at sf0.001 + sf0.01) plus the
  * plan shapes each query must keep at scale. At sf0.001 AQE broadcasts the
  * fact-fact joins too, so the pins assert what must ALWAYS hold (dimension
  * legs broadcast, pushdown reaches the scan, top-k is a bounded heap, the
  * semi/anti chain stays hash-joined) rather than exchange counts that are
  * legitimately SF-dependent.
  */
class TpcHSpec extends SparkSpec with Matchers {

  private def df(name: String) = TpcH.queries(name)(spark, sf())
  private def plan(name: String): String =
    df(name).queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("all TPC-H remainder queries return rows at sf0.001") {
    for ((name, fn) <- TpcH.queries) {
      withClue(s"query $name: ") {
        fn(spark, sf()).count() should be > 0L
      }
    }
  }

  test("q_tpch_q6: all four predicates reach the parquet scan; no join") {
    val p = plan("q_tpch_q6")
    p should include regex "PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(l_shipdate"
    p should include regex "PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(l_discount,0.05\\)"
    p should include regex "PushedFilters: \\[[^\\]]*LessThan\\(l_quantity,24.0\\)"
    p should not include "Join"
  }

  test("q_tpch_q7/q8: dimension legs broadcast; never a cartesian/NL join") {
    for (q <- Seq("q_tpch_q7", "q_tpch_q8")) {
      val p = plan(q)
      withClue(s"$q: ") {
        p should include("BroadcastHashJoin")
        p should not include "CartesianProduct"
        p should not include "BroadcastNestedLoopJoin"
      }
    }
    // q8's part leg is pruned to the promo type BEFORE broadcasting
    plan("q_tpch_q8") should include regex
      "PushedFilters: \\[[^\\]]*EqualTo\\(p_type,PROMO\\)"
  }

  test("q_tpch_q13: zero-order customers ride the LeftOuter join (no second pass)") {
    plan("q_tpch_q13") should include("LeftOuter")
  }

  test("q_tpch_q15: scalar max joins back as an equi hash join, not a NL filter") {
    val p = plan("q_tpch_q15")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("q_tpch_q18: top-100 is a bounded-heap TakeOrderedAndProject; threshold holds") {
    plan("q_tpch_q18") should include("TakeOrderedAndProject")
    import org.apache.spark.sql.functions.col
    df("q_tpch_q18").filter(col("sum_qty") <= 150.0).count() shouldBe 0L
  }

  test("q_tpch_q19: the OR-of-ANDs stays a post-join filter over the equi join") {
    val p = plan("q_tpch_q19")
    p should include("BroadcastHashJoin")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("q_tpch_q21: the EXISTS/NOT-EXISTS chain plans as LeftSemi + LeftAnti " +
    "hash joins with the suppkey inequality as a residual condition") {
    val p = plan("q_tpch_q21")
    p should include("LeftSemi")
    p should include("LeftAnti")
    p should include("TakeOrderedAndProject")
    p should not include "CartesianProduct"
    // the inequality must ride the hash join, not force a nested loop
    p should include regex "Join condition: NOT \\(l_suppkey.* = l2_suppkey"
  }

  test("q_tpch_q2: decorrelated min-cost join, no cartesian, top-100 heap") {
    val p = plan("q_tpch_q2")
    p should include("TakeOrderedAndProject")
    p should include("BroadcastHashJoin")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("q_tpch_q9: the two-key partsupp join stays an equi hash join; " +
    "part's name filter reaches its scan") {
    val p = plan("q_tpch_q9")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    p should include regex "PushedFilters: \\[[^\\]]*StringContains\\(p_name,bolt\\)"
  }

  test("q_tpch_q11: the nation total is a 1-row broadcast; threshold filter " +
    "is exact decimal") {
    val p = plan("q_tpch_q11")
    // the only nested loop is the 1-row total broadcast (scalar shape)
    p.linesIterator.count(_.contains("BroadcastNestedLoopJoin Inner")) shouldBe 1
    p should not include "CartesianProduct"
  }

  test("q_tpch_q16: complaint suppliers exclude via LeftAnti; census is a " +
    "distinct-count aggregation") {
    val p = plan("q_tpch_q16")
    p should include("LeftAnti")
    p should not include "CartesianProduct"
  }

  test("q_tpch_q20: the nested IN chain plans as semi/outer/semi joins") {
    val p = plan("q_tpch_q20")
    p should include("LeftSemi")
    p should include regex "Join type: LeftOuter|BroadcastHashJoin LeftOuter|SortMergeJoin LeftOuter"
    p should not include "CartesianProduct"
  }

  test("q_tpch_q22: no-urgent-orders is a LeftAnti; the 1-row threshold is " +
    "the only nested-loop (scalar broadcast) in the plan") {
    val p = plan("q_tpch_q22")
    p should include("LeftAnti")
    // exactly one BNLJ: the broadcast 1-row threshold with the > condition
    p.linesIterator.count(_.contains("BroadcastNestedLoopJoin Inner")) shouldBe 1
  }

  test("derived partsupp is a BUCKETED TABLE (bucketBy ps_partkey): every " +
    "consumer reads a bucketed scan and no shuffle exchange ever lands on " +
    "the partsupp side of its joins or aggregations — including the " +
    "two-key (partkey, suppkey) joins, where bucketing on a key SUBSET " +
    "still satisfies the clustered distribution") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    // broadcast OFF (except explicit hints, which survive the threshold):
    // at 100 TB partsupp never broadcasts, so the elision must be proven
    // under shuffle-join planning — the r11 in-memory cache could NOT
    // elide here (Spark 4's canChangeCachedPlanOutputPartitioning hides a
    // cached plan's partitioning); the bucketed scan's HashPartitioning
    // is structural and needs no flag
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevReq = spark.conf.get("spark.sql.requireAllClusterKeysForCoPartition")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // the Bench/Verify sessions run with subset-key co-partitioning on
    // (see Bench.scala) — mirror it here so the pin tests the shipped plan
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try {
      def initial(name: String): SparkPlan =
        TpcH.queries(name)(spark, sf()).queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.initialPlan
          case p => p
        }
      // scans feeding a subtree's STREAMED lanes (broadcast legs don't
      // constrain the streamed side's partitioning, so they're skipped)
      def streamedScans(p: SparkPlan): Seq[String] = p match {
        case _: BroadcastExchangeExec => Nil
        case f: FileSourceScanExec =>
          Seq(f.tableIdentifier.map(_.table).getOrElse("path:" +
            f.relation.location.rootPaths.headOption.fold("?")(_.getName)))
        case other => other.children.flatMap(streamedScans)
      }
      for (q <- Seq("q_tpch_q2", "q_tpch_q9", "q_tpch_q11", "q_tpch_q16",
        "q_tpch_q20")) {
        val plan = initial(q)
        val scans = plan.collect {
          case f: FileSourceScanExec if f.tableIdentifier
            .exists(_.table.startsWith("graft_partsupp")) => f
        }
        withClue(s"$q reads the partsupp table: ")(scans should not be empty)
        withClue(s"$q partsupp scans engage bucketing: ")(
          scans.forall(_.bucketedScan) shouldBe true)
        // a hash shuffle over partsupp-only streamed input whose keys
        // INCLUDE ps_partkey re-clusters what the bucketing already
        // provides (HashPartitioning(ps_partkey) satisfies any clustering
        // whose key set contains it under subset co-partitioning) — the
        // defect this pin exists to catch. Shuffles on OTHER keys
        // (Q16's brand/type/size census, a presentation rangepartition)
        // are the queries' own semantics; post-fact-join shuffles stream
        // other tables too and are the documented fact exchanges.
        val offenders = plan.collect {
          case e: ShuffleExchangeExec
              if (e.outputPartitioning match {
                case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
                  h.expressions.exists(_.references.exists(_.name == "ps_partkey"))
                case _ => false
              }) && streamedScans(e.child).nonEmpty && streamedScans(e.child)
                .forall(_.startsWith("graft_partsupp")) => e
        }
        withClue(s"$q must not re-shuffle the bucketed partsupp side: ")(
          offenders shouldBe empty)
      }
      // Q2 is the showcase: dims broadcast by hint, the per-part MIN rides
      // the bucketing, the min-cost join is co-partitioned (BOTH sides
      // derive from the same bucketed scan), top-100 is a heap — ZERO
      // shuffle exchanges in the whole plan
      initial("q_tpch_q2")
        .collect { case e: ShuffleExchangeExec => e } shouldBe empty
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", prevReq)
    }
  }
}
