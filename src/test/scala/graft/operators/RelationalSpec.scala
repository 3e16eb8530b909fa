package graft.operators

import org.apache.spark.sql.functions.{col, count, lit, sum, when}
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Relational surface: smoke at sf0.001 (full value parity runs through the
  * DuckDB gate — tools/check_oracle.py) plus physical-plan shape assertions:
  * the plan each query *should* produce at scale, not just any plan that
  * returns the right rows.
  */
class RelationalSpec extends SparkSpec with Matchers {

  private def plan(name: String): String =
    Relational.queries(name)(spark, sf()).queryExecution.executedPlan.toString

  test("all relational queries return rows at sf0.001") {
    for ((name, fn) <- Relational.queries) {
      withClue(s"query $name: ") {
        fn(spark, sf()).count() should be > 0L
      }
    }
  }

  test("filter+projection are pushed to the parquet scan") {
    val p = plan("q_filter_project")
    p should include("PushedFilters")
    p should include("IsNotNull(l_returnflag)")
    // pruned read schema: only the needed columns reach the scan
    p.toLowerCase should not include "l_comment"
    withClue("projection pruning - scan must not read l_tax: ") {
      p should include("ReadSchema")
      p.split("ReadSchema").last should not include "l_tax"
    }
  }

  test("dimension joins broadcast; fact-fact join does not collect") {
    plan("q_join_broadcast") should include("BroadcastHashJoin")
    val shuffle = plan("q_join_shuffle")
    // AQE may turn this into broadcast at tiny SF; accept either hash join,
    // but never a nested loop.
    shuffle should not include "BroadcastNestedLoopJoin"
  }

  test("semi/anti joins plan as join types, not subquery re-scans") {
    plan("q_join_semi") should include("LeftSemi")
    plan("q_join_anti") should include("LeftAnti")
  }

  test("global sort+limit plans as top-k (TakeOrderedAndProject)") {
    plan("q_sort_limit") should include("TakeOrderedAndProject")
  }

  test("q1 aggregates with partial aggregation (map-side combine)") {
    val p = plan("q1_agg")
    p should include("HashAggregate")
    p.linesIterator.count(_.contains("HashAggregate")) should be >= 2
  }

  test("cents-based money sums are bit-equal to the DECIMAL(18,2) cast path") {
    import org.apache.spark.sql.functions._
    // the dsum rewrite (integer cents per row, DECIMAL(38,0) at the sum)
    // must produce the same double as summing DECIMAL(18,2) casts — on
    // every 2-decimal money column of the corpus, per group
    val checks = Seq(
      (graft.tables.Tables.lineitem(spark, sf()), "l_extendedprice", "l_returnflag"),
      (graft.tables.Tables.lineitem(spark, sf()), "l_quantity", "l_linestatus"),
      (graft.tables.Tables.orders(spark, sf()), "o_totalprice", "o_orderpriority"),
      (graft.tables.Tables.part(spark, sf()), "p_retailprice", "p_brand"))
    checks.foreach { case (df, money, grp) =>
      val diff = df.groupBy(col(grp))
        .agg(
          sum(col(money).cast("decimal(18,2)")).cast("double").as("dec"),
          (sum(floor(col(money) * 100 + lit(0.5)).cast("long")
            .cast("decimal(38,0)")) / 100).cast("double").as("cents"))
        .filter(col("dec") =!= col("cents"))
        .count()
      withClue(s"$money by $grp: ") { diff shouldBe 0L }
    }
  }

  test("approx_count_distinct is within 5% of exact (scale path for distinct)") {
    import org.apache.spark.sql.functions._
    val l = graft.tables.Tables.lineitem(spark, sf())
    val row = l
      .agg(
        countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx"))
      .head()
    val exact = row.getLong(0).toDouble
    math.abs(row.getLong(1) - exact) / exact should be < 0.05
  }

  test("percentile_approx brackets the exact median (scale path for q_median)") {
    import org.apache.spark.sql.functions._
    val o = graft.tables.Tables.orders(spark, sf())
    val row = o
      .agg(
        median(col("o_totalprice")).as("exact"),
        percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("approx"))
      .head()
    val exact = row.getDouble(0)
    // single-pass mergeable sketch (the 100 TB path: exact medians need a
    // full sort; KLL-style summaries shuffle O(sketch) per partition)
    math.abs(row.getDouble(1) - exact) / exact should be < 0.02
  }

  test("q_expectations: the curated corpus passes its whole constraint " +
    "suite, and the ledger actually counts violations when present") {
    val rows = Relational.qExpectations(spark, sf()).collect()
    rows should have length 7
    rows.foreach { r =>
      withClue(r.getAs[String]("check")) {
        r.getAs[Long]("pass") shouldBe 1L
        r.getAs[Long]("n_violations") shouldBe 0L
        r.getAs[Long]("n_rows") should be > 0L
      }
    }
    // violation path: corrupt one constraint's input and watch the count
    // move — the ledger is a measurement, not a constant
    val corrupted = graft.tables.Tables.documents(spark, sf())
      .withColumn("n_chars",
        when(col("doc_id") % 100 === 0, col("n_chars") + 1)
          .otherwise(col("n_chars")))
    val bad = corrupted
      .agg(org.apache.spark.sql.functions.sum(
        when(col("n_chars") =!=
          org.apache.spark.sql.functions.length(col("text")), 1L)
          .otherwise(0L)))
      .head().getLong(0)
    bad shouldBe corrupted.filter(col("doc_id") % 100 === 0).count()
    // the FK check is an anti-join on the key, never a cartesian
    val plan = Relational.qExpectations(spark, sf())
      .queryExecution.executedPlan.toString
    plan should include("LeftAnti")
    plan should not include "CartesianProduct"
  }
  test("q_denormalize: every lineitem row resolves all six dimensions " +
    "exactly once, fixed dims broadcast, and no cartesian appears") {
    val rows = Relational.qDenormalize(spark, sf()).collect()
    // conservation — FK integrity means the join tree neither drops nor
    // duplicates fact rows
    rows.map(_.getAs[Long]("n")).sum shouldBe
      graft.tables.Tables.lineitem(spark, sf()).count()
    // cells are the dimension cross product, bounded regardless of SF
    val nNation = graft.tables.Tables.nation(spark, sf()).count()
    rows.length.toLong should be <= nNation * nNation
    val plan = Relational.qDenormalize(spark, sf())
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should not include "CartesianProduct"
  }

  test("q_skyline equals the brute-force all-pairs skyline, and the curve " +
    "join-back broadcasts") {
    val frontier = Relational.qSkyline(spark, sf()).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Double]("total_value"))).toSet
    // independent in-JVM derivation: quadratic dominance over the
    // collected per-user aggregates (test scale only)
    val users = graft.tables.Tables.events(spark, sf())
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("tv"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n"),
        r.getAs[java.math.BigDecimal]("tv")))
    val brute = users.filter { case (_, n, tv) =>
      !users.exists { case (_, n2, tv2) =>
        n2 >= n && tv2.compareTo(tv) >= 0 &&
          (n2 > n || tv2.compareTo(tv) > 0)
      }
    }.map { case (u, n, tv) => (u, n, tv.doubleValue) }.toSet
    frontier shouldBe brute
    frontier.size should be > 0
    val plan = Relational.qSkyline(spark, sf())
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  test("q_copurchase: top pair count re-derives independently, lift is " +
    "positive, and the plan has no cartesian") {
    val rows = Relational.qCopurchase(spark, sf()).collect()
    rows.length should be <= Relational.CopurchaseTopK
    rows.length should be > 0
    rows.foreach(r => r.getAs[Double]("lift") should be > 0.0)
    // counts are non-increasing in output order (top-k really sorted)
    val ns = rows.map(_.getAs[Long]("n"))
    ns.zip(ns.tail).foreach { case (a, b) => a should be >= b }
    // independent recount of the first pair via a direct filter
    val (p1, p2) = (rows.head.getAs[Long]("p1"), rows.head.getAs[Long]("p2"))
    val items = graft.tables.Tables.lineitem(spark, sf())
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val recount = items.filter(col("l_partkey") === p1)
      .select(col("l_orderkey"))
      .join(items.filter(col("l_partkey") === p2).select(col("l_orderkey")),
        "l_orderkey")
      .count()
    recount shouldBe ns.head
    val plan = Relational.qCopurchase(spark, sf())
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should include("TakeOrderedAndProject")
  }

  test("q_fuzzy_match: deletion-index blocking equals the quadratic " +
    "levenshtein census, with no cartesian in the plan") {
    val hist = Relational.qFuzzyMatch(spark, sf()).collect()
      .map(r => r.getAs[Long]("n_neighbors") -> r.getAs[Long]("n_customers"))
      .toMap
    // independent in-JVM quadratic derivation (test scale only)
    def lev1(a: String, b: String): Boolean =
      a.length == b.length && a.zip(b).count { case (x, y) => x != y } == 1
    val names = graft.tables.Tables.customer(spark, sf())
      .filter(col("c_custkey") < Relational.FuzzyCap)
      .select(col("c_custkey"), col("c_name")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val deg = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for { (ca, na) <- names; (cb, nb) <- names if ca < cb && lev1(na, nb) } {
      deg(ca) += 1; deg(cb) += 1
    }
    val brute = deg.values.groupBy(identity)
      .map { case (k, vs) => k -> vs.size.toLong }
    hist shouldBe brute
    val plan = Relational.qFuzzyMatch(spark, sf())
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
  }

  test("q_er_linkage: blocking finds every planted twin, matches are " +
    "pure, and scores follow the millibit weight table") {
    val rows = Relational.qErLinkage(spark, sf()).collect()
    val nCust = graft.tables.Tables.customer(spark, sf()).count()
    // recall 1.0: blocking keys survive every corruption by construction
    rows.map(_.getAs[Long]("n_true")).sum shouldBe nCust
    val (wN, dN) = Relational.ErWeights("name")
    val (wB, dB) = Relational.ErWeights("bal")
    val (wS, dS) = Relational.ErWeights("seg")
    rows.foreach { r =>
      // every planted pair agrees on name (single char drop, lev = 1)
      if (r.getAs[Long]("n_true") > 0) r.getAs[Long]("agree_name") shouldBe 1L
      // the score is exactly the pattern's weight sum
      r.getAs[Long]("score_mb") shouldBe
        (if (r.getAs[Long]("agree_name") == 1L) wN else dN) +
          (if (r.getAs[Long]("agree_bal") == 1L) wB else dB) +
          (if (r.getAs[Long]("agree_seg") == 1L) wS else dS)
      // 'match' decisions contain planted pairs only on this corpus
      if (r.getAs[String]("decision") == "match")
        r.getAs[Long]("n_pairs") shouldBe r.getAs[Long]("n_true")
      // non-matches contain none
      if (r.getAs[String]("decision") == "non_match")
        r.getAs[Long]("n_true") shouldBe 0L
    }
    val plan = Relational.qErLinkage(spark, sf())
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("q_id_gaps matches a brute-force scan of the key sequence") {
    val keys = graft.tables.Tables.orders(spark, sf())
      .select(col("o_orderkey")).distinct().collect()
      .map(_.getLong(0)).sorted
    val runs = keys.init.zip(keys.tail).count { case (a, b) => b > a + 1 }
    val r = Relational.qIdGaps(spark, sf()).head()
    r.getAs[Long]("n_keys") shouldBe keys.length.toLong
    r.getAs[Long]("kmin") shouldBe keys.head
    r.getAs[Long]("kmax") shouldBe keys.last
    r.getAs[Long]("n_missing") shouldBe
      (keys.last - keys.head + 1 - keys.length)
    r.getAs[Long]("n_gap_runs") shouldBe runs.toLong
  }

  test("q_ivm_retract: subtractive merge equals a from-scratch recompute " +
    "and fully-retracted keys LEAVE the view") {
    import org.apache.spark.sql.functions._
    val orders = graft.tables.Tables.orders(spark, sf())
    val got = Relational.qIvmRetract(spark, sf()).collect()
    // group death actually fires: every custkey ≡ 3 mod 10 with orders is
    // absent from the merged view (all its rows retracted)
    val dead = orders.filter(col("o_custkey") % 10 === 3)
      .select(col("o_custkey")).distinct().collect().map(_.getLong(0)).toSet
    dead.nonEmpty shouldBe true
    got.map(_.getAs[Long]("c_custkey")).toSet.intersect(dead) shouldBe empty
    // no negative counts survived the subtraction
    got.count(_.getAs[Long]("n_orders") <= 0L) shouldBe 0
    // touched flag: survivors that lost every-7th orders are marked
    val touched = got.filter(_.getAs[Long]("is_touched") == 1L)
    touched.nonEmpty shouldBe true
    // independent recompute over kept rows matches row-for-row
    val want = orders
      .filter(!(col("o_orderkey") % 7 === 2 || col("o_custkey") % 10 === 3))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.map(r => r.getAs[Long]("c_custkey") -> r.getAs[Long]("n_orders"))
      .toMap shouldBe want
  }

  test("q_ivm_join: incremental merge equals a from-scratch recompute " +
    "over base union delta") {
    import org.apache.spark.sql.functions._
    val cust = graft.tables.Tables.customer(spark, sf())
      .select(col("c_custkey"), col("c_mktsegment"))
    val base = graft.tables.Tables.orders(spark, sf()).select(col("o_orderkey"),
      col("o_custkey"), col("o_orderpriority"), col("o_totalprice"))
    val delta = base.filter(
      col("o_orderkey") % Relational.IvmJoinMod === Relational.IvmJoinResidue)
    val want = base.union(delta)
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = Relational.qIvmJoin(spark, sf()).collect()
    got.map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_orders"))
      .toMap shouldBe want
    // the delta dirties a strict, non-empty subset or all of the keys;
    // every touched key's count grew vs the base-only view
    val baseView = base.join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val touched = got.filter(_.getAs[Long]("is_touched") == 1L)
    touched.length should be > 0
    touched.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      r.getAs[Long]("n_orders") should be > baseView(k)
    }
  }

  test("q_schema_merge: vintage census — full null back-fill on v=1, " +
    "none on v=2, rows partitioned by parity") {
    import org.apache.spark.sql.functions._
    val rows = graft.sources.Ingest.qSchemaMerge(spark, sf()).collect()
    rows.map(_.getLong(0)).toSeq shouldBe Seq(1L, 2L)
    val docs = graft.tables.Tables.documents(spark, sf())
    val even = docs.filter(col("doc_id") % 2 === 0).count()
    rows(0).getAs[Long]("n_rows") shouldBe even
    rows(1).getAs[Long]("n_rows") shouldBe (docs.count() - even)
    rows(0).getAs[Long]("n_lang_null") shouldBe even
    rows(0).getAs[Long]("n_langs") shouldBe 0L
    rows(1).getAs[Long]("n_lang_null") shouldBe 0L
    rows(1).getAs[Long]("n_langs") should be > 0L
  }
}
