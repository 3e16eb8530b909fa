package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Relational operator surface over the TPC-H-ish corpus — the SURVEY §2.2
  * capability checklist expressed DataFrame-native so Catalyst owns pushdown,
  * pruning, join strategy and partial aggregation.
  *
  * Conventions (see [[graft.SparkEntry]] scaladoc):
  *   - exact DECIMAL(…,2) routing for money sums (corpus doubles are
  *     2-decimal) so aggregation is order-independent → identical bits on any
  *     engine / partitioning;
  *   - integer outputs are BIGINT, float outputs DOUBLE, on both sides;
  *   - total ORDER BY on a tie-free key set in plan and oracle.
  *
  * Scale notes (100 TB): every query here shuffles only on its aggregation /
  * join keys; dimension joins (region/nation/supplier/band tables) broadcast;
  * the fact-fact join (lineitem⋈orders) is a shuffled hash join on the join
  * key with AQE free to pick sort-merge — no driver-side collection anywhere.
  */
object Relational {

  /** Integer cents of a 2-decimal double: round-half-AWAY-from-zero
    * (sign·floor(|x|·100+0.5)), the same mode as a DECIMAL HALF_UP cast,
    * so the fast path is value-identical to the decimal path for negative
    * off-grid values too — not just the corpus' non-negative money
    * columns. Exact for on-grid values, where |x|·100 sits within ~1e-10
    * of an integer; still branch-free codegen (one abs + multiply +
    * floor + sign-multiply per row).
    */
  private[graft] def cents(c: Column): Column =
    (signum(c) * floor(abs(c) * 100 + lit(0.5))).cast("long")

  /** Exact, order-independent sum of a 2-decimal double column: convert to
    * integer cents row-locally, sum as DECIMAL(38,0) (unbounded-scale
    * safe — a LONG sum would silently wrap around 10¹⁰ rows of large
    * values), divide back exactly (result scale 6 ≥ 2). Value-identical
    * to summing DECIMAL(18,2) casts — the oracle gate pins the bits — but
    * the per-row work is one double multiply + floor instead of a decimal
    * cast, which profiled 2.3× faster on the q1 shape
    * (`graft.tools.Profile`, "q1 arithmetic variants"). ONLY for the
    * corpus' 2-decimal money columns: on arbitrary doubles the rounding
    * mode of floor(+0.5) and a decimal HALF_UP cast can diverge
    * ([[Events]] keeps the decimal-cast path for its off-grid `value`).
    */
  private[graft] def dsum(c: Column): Column =
    (sum(cents(c).cast("decimal(38,0)")) / 100).cast("double")

  // -------------------------------------------------------------------
  // q1_agg — TPC-H Q1-shaped pricing summary: scan → pushed filter →
  // partial+final hash agg → sort. Replaces the reference's combinerless
  // full-shuffle aggregation (mapreduce.go:156-164 vs OSDI'04 §4.3).
  // -------------------------------------------------------------------
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    // all integer arithmetic per row: price·(1−disc) = epC·d100 / 10⁴,
    // price·(1−disc)·(1+tax) = epC·d100·t100 / 10⁶ — per-row products are
    // bounded (< 10¹¹), the DECIMAL(38,0) happens only at the sum
    val epC = cents(col("l_extendedprice"))
    val d100 = lit(100L) - cents(col("l_discount"))
    val t100 = lit(100L) + cents(col("l_tax"))
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1999-12-31").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        (sum((epC * d100).cast("decimal(38,0)")) / 10000)
          .cast("double").as("sum_disc_price"),
        (sum((epC * d100 * t100).cast("decimal(38,0)")) / 1000000)
          .cast("double").as("sum_charge"),
        ((sum(cents(col("l_quantity")).cast("decimal(38,0)")) / 100).cast("double") /
          count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Projection + filter — both must reach the parquet scan
    * (PushedFilters / 3-column ReadSchema in the formatted plan).
    */
  def qFilterProject(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(
        col("l_returnflag") === "R" &&
          col("l_shipdate") >= lit("2000-01-01").cast("timestamp") &&
          col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Star-schema rollup: orders → customer → nation → region, all three
    * dimension joins broadcast (explicit hint documents intent; sizes are
    * broadcastable at any SF since dims scale sub-linearly).
    */
  def qJoinBroadcast(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        dsum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("r_name"))

  /** TPC-H Q5-shaped COMPOSED star query — the multi-table pattern real
    * users run (the per-operator join queries above exercise each join
    * kind pairwise; this composes them): fact (lineitem, shipdate-range
    * filtered) ⋈ two dimensions (supplier, then nation restricted to one
    * region) → group by (nation, ship year) → revenue top-10.
    *
    * 100 TB plan shape (pinned in PlanRegressionSpec): BOTH dimension
    * joins broadcast — the fact table never shuffles for a join — so the
    * single Exchange in the plan is the final ~25-group aggregation, and
    * the top-k is a TakeOrderedAndProject (per-partition heap + driver
    * merge of k rows), never a global sort. Revenue uses the exact
    * integer-cents arithmetic of [[q1Agg]].
    */
  def qStarTopk(s: SparkSession, dir: String): DataFrame = {
    val epC = cents(col("l_extendedprice"))
    val d100 = lit(100L) - cents(col("l_discount"))
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("2000-01-01").cast("timestamp"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir).filter(col("n_regionkey") === 2)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("l_shipdate")).cast("long").as("ship_year"))
      .agg(
        (sum((epC * d100).cast("decimal(38,0)")) / 10000)
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"), col("ship_year"))
      .limit(10)
  }

  /** TPC-H Q5 shape (local-supplier volume): customer ⋈ orders ⋈
    * lineitem ⋈ supplier ⋈ nation ⋈ region with the year filter on
    * orders and the SAME-NATION correlation between customer and
    * supplier — the canonical join-ORDERING workload (two fact-fact
    * joins whose best order depends on selectivities, three dimension
    * legs that must all end up broadcast). Declared in selectivity
    * order — filtered region→nation pruned against customer first, the
    * date-filtered orders next, lineitem last, supplier's equality on
    * BOTH l_suppkey and the customer's nation at the end — and Catalyst
    * keeps every dimension leg a BroadcastHashJoin while the two
    * fact-fact joins shuffle on their natural keys; at 100 TB those two
    * are the only exchanges. Revenue follows the house cents discipline
    * (exact integer cents·bp sums, one final division).
    */
  /** UNPIVOT (melt) — the inverse surface of [[qPivot]]: the three
    * lineitem measures turned into (measure, value) long form via the
    * native `Dataset.unpivot` (planned as a single Expand — row×3
    * locally, no shuffle), then profiled per measure with the
    * decimal-routed exact sum. The long form is the shape feature stores
    * and metric pipelines standardize on; the oracle derives it as the
    * dialect-neutral UNION ALL.
    */
  def qUnpivot(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"))
      .unpivot(Array(col("l_orderkey")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "measure", "val")
      .groupBy(col("measure"))
      .agg(count(lit(1)).as("n"), dsum(col("val")).as("sum_val"),
        min(col("val")).as("min_val"), max(col("val")).as("max_val"))
      .orderBy(col("measure"))

  /** TPC-H Q3 (shipping-priority) shape on this corpus' columns: orders
    * of BUILDING-segment customers placed before the cutoff whose items
    * shipped after it, ranked by discounted revenue, top 10. Plan: the
    * customer leg broadcasts into the orders scan, the single fact-fact
    * join shuffles on orderkey, revenue is the house exact-integer
    * cents·bp route, and the top-10 runs as TakeOrderedAndProject (only
    * 10 rows leave the aggregation) — at 100 TB the orderkey shuffle is
    * the only full Exchange.
    */
  def qTpchQ3(s: SparkSession, dir: String): DataFrame = {
    val epC = cents(col("l_extendedprice"))
    val d100 = lit(100L) - cents(col("l_discount"))
    val cut = lit("1998-06-01").cast("timestamp")
    Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, dir).filter(col("o_orderdate") < cut),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(s, dir).filter(col("l_shipdate") > cut),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg((sum((epC * d100).cast("decimal(38,0)")) / 10000)
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
  }

  /** TPC-H Q10 shape (returned-item revenue by customer, top 20) on the
    * fixture's customer columns: the classic fact-heavy 3-way join with a
    * quarter date window and a selective fact predicate, grouped at
    * customer grain with dimension ride-alongs, global top-k on an exact
    * integer-cents revenue. Broadcast nation; revenue ties broken by
    * c_custkey so the LIMIT is total. Scale: the only shuffle wider than
    * the quarter's orders is the customer-grain aggregation.
    */
  def qTpchQ10(s: SparkSession, dir: String): DataFrame = {
    val epC = cents(col("l_extendedprice"))
    val d100 = lit(100L) - cents(col("l_discount"))
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp")),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(s, dir).filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name"))
      .agg((sum((epC * d100).cast("decimal(38,0)")) / 10000)
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        col("c_acctbal"), col("n_name"))
  }

  def qTpchQ5(s: SparkSession, dir: String): DataFrame = {
    val epC = cents(col("l_extendedprice"))
    val d100 = lit(100L) - cents(col("l_discount"))
    val nat = broadcast(Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir)
        .filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey")))
    Tables.customer(s, dir)
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        (sum((epC * d100).cast("decimal(38,0)")) / 10000)
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q17 shape (small-quantity-order revenue), generalized to a
    * per-brand census: the correlated scalar AVG subquery runs over the
    * FACT table itself — the case where naive per-row execution is
    * quadratic in the fact. Catalyst decorrelates it to ONE per-partkey
    * aggregate of lineitem joined back to the outer scan, so the plan is
    * two fact passes + one key join no matter the scale — the complement
    * of [[qScalarSubquery]] (dim-table correlation) and [[qLateral]]
    * (correlated top-k). Exactness: the threshold is the decimal-routed
    * avg (exact DECIMAL sum, cast double, ONE division, ONE division by
    * 5.0) — bit-identical cross-engine; revenue collapses exact cents by
    * a single division by 700.0.
    */
  def qTpchQ17(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
    Tables.part(s, dir).createOrReplaceTempView("part")
    s.sql(
      """SELECT p_brand,
        |  CAST(count(*) AS BIGINT) AS n_small,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
        |    AS BIGINT) AS DOUBLE) / 700.0 AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE l_quantity <
        |  (SELECT CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |     / count(*)
        |   FROM lineitem l2 WHERE l2.l_partkey = p_partkey) / 5.0
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin)
  }

  /** Fact-fact shuffle join (lineitem ⋈ orders on the natural key), then
    * aggregate — the repartition-join the MR model expresses via tagged
    * KeyValues (SURVEY §2.2 "Joins"), done natively. AQE may convert to
    * broadcast at small SF; at 100 TB it is a co-partitioned SMJ.
    */
  def qJoinShuffle(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        dsum(col("l_extendedprice")).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderpriority"))

  /** Late-batch plant for [[qIvmJoin]]: orders with key ≡ 3 (mod 17)
    * re-arrive as a delta (the backfill shape [[Events.qIvmRefresh]]
    * uses for the cube view, here for a JOIN view).
    */
  val IvmJoinMod = 17L
  val IvmJoinResidue = 3L

  /** Incremental maintenance of a JOIN view — the second IVM law after
    * [[Events.qIvmRefresh]]'s additive cube: for V = γ(A ⋈ C) under an
    * insert batch ΔA, the refresh is V ⊎ γ(ΔA ⋈ C) — the delta joins
    * against the (unchanged) dimension and the results MERGE by view key
    * (counts add; money adds exactly through the integer-cents DECIMAL
    * route). Refresh cost is |ΔA| join work plus a |V|-sized full-outer
    * merge — never a re-join of the full fact table, which is the entire
    * point at 100 TB (the base view is re-evaluated in-plan only because
    * the harness stores no state between queries; deployed, it is a
    * stored-table scan). The oracle recomputes γ((A ∪ ΔA) ⋈ C) from
    * scratch — agreement proves merged ≡ recomputed. `is_touched` marks
    * the view keys the delta dirtied (the downstream cache invalidation
    * set).
    */
  def qIvmJoin(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    def viewOf(orders: DataFrame): DataFrame = orders
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(cents(col("o_totalprice")).cast("decimal(38,0)")).as("cts"))
    val base = Tables.orders(s, dir).select(col("o_orderkey"),
      col("o_custkey"), col("o_orderpriority"), col("o_totalprice"))
    val v0 = viewOf(base)
    val dv = viewOf(
      base.filter(col("o_orderkey") % IvmJoinMod === IvmJoinResidue))
      .select(col("c_mktsegment").as("d_seg"),
        col("o_orderpriority").as("d_pri"),
        col("n").as("dn"), col("cts").as("dcts"))
    v0.join(dv,
        col("c_mktsegment") === col("d_seg") &&
          col("o_orderpriority") === col("d_pri"),
        "full_outer")
      .select(
        coalesce(col("c_mktsegment"), col("d_seg")).as("c_mktsegment"),
        coalesce(col("o_orderpriority"), col("d_pri"))
          .as("o_orderpriority"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n_orders"),
        ((coalesce(col("cts"), lit(0).cast("decimal(38,0)")) +
          coalesce(col("dcts"), lit(0).cast("decimal(38,0)"))) / 100)
          .cast("double").as("revenue"),
        col("dn").isNotNull.cast("long").as("is_touched"))
      .orderBy(col("c_mktsegment"), col("o_orderpriority"))
  }

  /** One-pass Pearson correlation MATRIX over the fact's numeric columns —
    * the profiling capability (feature screening, drift watch) at scale:
    * a SINGLE aggregation computes every Σa, Σa², Σab as exact
    * DECIMAL(38,0) sums of integer cents products (a LONG sum of e²
    * terms wraps at ~10⁵ rows — 10¹⁴ per row — so the decimal route is
    * load-bearing, not style), then each pairwise r derives from the
    * shared sufficient statistics with the IDENTICAL double expression
    * the oracle uses (cast-then-multiply order mirrored term by term).
    * Scale: one map-side-partial pass over the fact, 15 numbers per
    * partition to the driver-side single row; the 6-pair fan-out is a
    * `stack()` over that one row — STRUCTURALLY one scan + one
    * aggregation (plan-pinned in PlanRegressionSpec), not six union
    * branches hoping ReuseExchange fires.
    */
  def qCorrMatrix(s: SparkSession, dir: String): DataFrame = {
    val (q, e) = (cents(col("l_quantity")), cents(col("l_extendedprice")))
    val (d, t) = (cents(col("l_discount")), cents(col("l_tax")))
    def ds(c: Column) = sum(c.cast("decimal(38,0)"))
    val agg = Tables.lineitem(s, dir).agg(
      count(lit(1)).as("n"),
      ds(q).as("sq"), ds(e).as("se"), ds(d).as("sd"), ds(t).as("st"),
      ds(q * q).as("sqq"), ds(e * e).as("see"), ds(d * d).as("sdd"),
      ds(t * t).as("stt"),
      ds(q * e).as("sqe"), ds(q * d).as("sqd"), ds(q * t).as("sqt"),
      ds(e * d).as("sed"), ds(e * t).as("set_"), ds(d * t).as("sdt"))
    def corr(ab: String, sa: String, sb: String, saa: String,
        sbb: String): Column = {
      val n = col("n").cast("double")
      def dbl(c: String) = col(c).cast("double")
      round((n * dbl(ab) - dbl(sa) * dbl(sb)) /
        sqrt((n * dbl(saa) - dbl(sa) * dbl(sa)) *
          (n * dbl(sbb) - dbl(sb) * dbl(sb))), 6)
    }
    val pairs = Seq(
      ("discount", "extendedprice", "sed", "sd", "se", "sdd", "see"),
      ("discount", "quantity", "sqd", "sd", "sq", "sdd", "sqq"),
      ("discount", "tax", "sdt", "sd", "st", "sdd", "stt"),
      ("extendedprice", "quantity", "sqe", "se", "sq", "see", "sqq"),
      ("extendedprice", "tax", "set_", "se", "st", "see", "stt"),
      ("quantity", "tax", "sqt", "sq", "st", "sqq", "stt"))
    // One select computes all six r values off the single aggregate row;
    // stack() unpivots them. One scan, one aggregation — by construction.
    val wide = agg.select(pairs.map { case (a, b, ab, sa, sb, saa, sbb) =>
      corr(ab, sa, sb, saa, sbb).as(s"r_${a}_$b")
    }: _*)
    val stackArgs = pairs.map { case (a, b, _, _, _, _, _) =>
      s"'$a', '$b', r_${a}_$b"
    }.mkString(", ")
    wide
      .selectExpr(
        s"stack(${pairs.size}, $stackArgs) AS (col_a, col_b, corr)")
      .orderBy(col("col_a"), col("col_b"))
  }

  /** Delete-delta predicate for [[qIvmRetract]]: a mix of partial
    * retractions (every 7th order) and FULL-group retractions (every
    * order of customers with custkey ≡ 3 mod 10) so the group-death path
    * is exercised at every SF.
    */
  private def retractPred: Column =
    col("o_orderkey") % 7 === 2 || col("o_custkey") % 10 === 3

  /** Incremental view maintenance under a DELETE delta — the harder IVM
    * direction [[qIvmJoin]]'s insert-only merge never exercises: COUNT and
    * SUM retract by SUBTRACTING the delta's per-key aggregates, and a key
    * whose count reaches zero must LEAVE the view (an insert-only merge
    * can never delete a row). View grain is per-customer so the delta
    * genuinely kills groups (customers ≡ 3 mod 10 lose every order).
    * `is_touched` marks surviving keys the delta dirtied. The oracle is an
    * independent from-scratch recompute over the kept rows — agreement
    * proves retracted-merge ≡ recompute including the vanished keys.
    * Scale: both branches aggregate to |customers| rows before the merge
    * join; the merge is a key-co-partitioned left join; nothing touches
    * the fact twice at full width.
    */
  def qIvmRetract(s: SparkSession, dir: String): DataFrame = {
    def viewOf(orders: DataFrame): DataFrame = orders
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"),
        sum(cents(col("o_totalprice")).cast("decimal(38,0)")).as("cts"))
    val base = Tables.orders(s, dir).select(col("o_orderkey"),
      col("o_custkey"), col("o_totalprice"))
    val v0 = viewOf(base)
    val dv = viewOf(base.filter(retractPred))
      .select(col("o_custkey").as("d_custkey"),
        col("n").as("dn"), col("cts").as("dcts"))
    v0.join(dv, col("o_custkey") === col("d_custkey"), "left_outer")
      .select(
        col("o_custkey").as("c_custkey"),
        (col("n") - coalesce(col("dn"), lit(0L))).as("n_orders"),
        ((col("cts") - coalesce(col("dcts"), lit(0).cast("decimal(38,0)")))
          / 100).cast("double").as("revenue"),
        col("dn").isNotNull.cast("long").as("is_touched"))
      .filter(col("n_orders") > 0) // retraction-specific: dead keys leave
      .orderBy(col("c_custkey"))
  }

  /** Left-semi join = EXISTS: customers having at least one open order. */
  def qJoinSemi(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(
        Tables.orders(s, dir).filter(col("o_orderstatus") === "O"),
        col("c_custkey") === col("o_custkey"),
        "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Left-anti join = NOT EXISTS: customers with no high-value order. */
  def qJoinAnti(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(
        Tables.orders(s, dir).filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"),
        "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Left-outer join preserving customers with zero orders (count(o) = 0). */
  def qJoinOuter(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spent"))
      .orderBy(col("c_custkey"))

  /** Non-equi (range/theta) join: orders banded by price via BETWEEN against
    * a tiny inline band table — broadcast nested-loop by construction; the
    * band side is O(1) rows so BNLJ is the *right* plan even at 100 TB.
    */
  def qJoinRange(s: SparkSession, dir: String): DataFrame = {
    val bands = s
      .createDataFrame(Seq(
        ("small", 0.0, 100000.0),
        ("medium", 100000.0, 250000.0),
        ("large", 250000.0, 1e9)))
      .toDF("band", "lo", "hi")
    Tables.orders(s, dir)
      .join(broadcast(bands), col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("band"))
  }

  /** Global sort + limit (top-k): highest-value orders, tie-free. At scale
    * this is a TakeOrderedAndProject — no full sort materializes.
    */
  def qSortLimit(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)

  /** Distinct (dedup on a projection). */
  def qDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_mktsegment"), col("c_nationkey").cast("long").as("c_nationkey"))
      .distinct()
      .orderBy(col("c_mktsegment"), col("c_nationkey"))

  /** Set operations: nation keys with customers vs with suppliers —
    * INTERSECT / EXCEPT / UNION surfaced as one tagged result.
    */
  def qSetOps(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).select(col("c_nationkey").cast("long").as("nk"))
    val supp = Tables.supplier(s, dir).select(col("s_nationkey").cast("long").as("nk"))
    val both = cust.intersect(supp).withColumn("tag", lit("both"))
    val custOnly = cust.distinct().except(supp).withColumn("tag", lit("cust_only"))
    val suppOnly = supp.distinct().except(cust).withColumn("tag", lit("supp_only"))
    both.union(custOnly).union(suppOnly).orderBy(col("tag"), col("nk"))
  }

  /** Window ranking: top-3 orders per customer by price (row_number over a
    * tie-free order). Shuffles once on the partition key.
    */
  def qWindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("rk").cast("long").as("rk"),
        col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rk"))
  }

  /** Running (cumulative) window aggregate + lag, per supplier over time.
    * The running sum is decimal-routed: window accumulation order differs
    * between engines (DuckDB segment trees vs Spark running buffer), decimal
    * makes the result association-independent.
    */
  def qWindowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(s, dir)
      .filter(col("l_suppkey") <= 5)
      .withColumn("running_qty",
        sum(col("l_quantity").cast("decimal(18,2)"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .withColumn("prev_ship", lag(col("l_shipdate"), 1).over(w))
      .select(col("l_suppkey"), col("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_shipdate"), col("running_qty"), col("prev_ship"))
      .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
  }

  /** Hierarchical aggregation (ROLLUP) over returnflag → linestatus; the
    * rolled-up level is tagged 'ALL' (corpus columns are non-null so the
    * coalesce is unambiguous and keeps the sort tie-free).
    */
  def qRollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** Distribution window functions — ntile / percent_rank / cume_dist per
    * priority over a deterministic (price, key) order: one sort per
    * partition serves all three functions in a single Window exec.
    */
  def qWindowDist(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderpriority"), col("o_orderkey"),
        col("o_totalprice"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cum_dist"))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  /** Full CUBE over two order dimensions — all four grouping sets (pair,
    * each single, grand total) in ONE pass: Catalyst's Expand feeds a
    * single partial+final aggregate, not four scans.
    */
  def qCube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("sum_price"))
      .orderBy(col("status"), col("priority"))

  /** GROUP BY + HAVING: part brands stocking enough distinct types. */
  def qHaving(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_parts"),
        countDistinct(col("p_type")).as("n_types"),
        dsum(col("p_retailprice")).as("total_price"))
      .filter(col("n_parts") > 5)
      .orderBy(col("p_brand"))

  /** Conditional aggregation (CASE-pivot): order status mix per priority. */
  def qCaseAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
        sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_p"),
        dsum(when(col("o_orderstatus") === "F", col("o_totalprice"))
          .otherwise(lit(0.0))).as("f_value"))
      .orderBy(col("o_orderpriority"))

  /** Scalar-function battery (string/date/math/conditional) — one row per
    * order in a pushed-down keyrange, every expression mirrored in DuckDB.
    */
  def qScalarFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderkey") <= 500)
      .select(
        col("o_orderkey"),
        upper(col("o_orderstatus")).as("status_u"),
        lower(col("o_orderpriority")).as("prio_l"),
        substring(col("o_orderpriority"), 1, 1).as("prio_1"),
        length(col("o_orderpriority")).cast("long").as("prio_len"),
        concat_ws("#", col("o_orderstatus"), col("o_orderpriority")).as("tagged"),
        regexp_replace(col("o_orderpriority"), "[aeiou]", "_").as("devoweled"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        // trunc (not date_trunc): DATE out, matching DuckDB's date_trunc('month')
        trunc(col("o_orderdate"), "month").as("month_start"),
        (col("o_orderkey") % 7).cast("long").as("key_mod"),
        floor(col("o_totalprice") / 1000).cast("long").as("price_k"),
        abs(col("o_totalprice") - 150000.0).as("dist_150k"),
        when(col("o_totalprice") > 200000, "high")
          .when(col("o_totalprice") > 80000, "mid")
          .otherwise("low").as("bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("pending")).as("status_nn"))
      .orderBy(col("o_orderkey"))

  /** Ordered string aggregation (LISTAGG-shape): deterministic via
    * array_sort(collect_list(…)) — exactly list_sort(list(…)) in DuckDB.
    */
  def qStringAgg(s: SparkSession, dir: String): DataFrame =
    Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
        count(lit(1)).as("n_nations"))
      .orderBy(col("r_name"))

  /** Exact + approximate distinct cardinalities. The HLL column has no
    * cross-engine oracle (sketch implementations differ) so this query's
    * oracle covers the exact column only — the approx column is asserted
    * in ScalaTest to be within 5% of exact.
    */
  def qDistinctCount(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_suppkey")).as("exact_supps"))
      .orderBy(col("l_returnflag"))

  /** Statistical aggregates via exact decimal moment sums (Σx, Σx², Σxy …)
    * finished with IEEE double formulas — deterministic under any
    * partitioning, unlike builtin stddev/corr whose double accumulation is
    * order-dependent. The oracle mirrors the same explicit formulas.
    */
  def qStats(s: SparkSession, dir: String): DataFrame = {
    // cents-scaled exact moments in one custom TypedImperativeAggregate
    // (primitive 128-bit sums; the equivalent sum(decimal×decimal)
    // formulation costs 3.5s at sf0.1 on the BigDecimal path). The round()
    // makes the double→cents conversion exact: v*100 is within an ulp of
    // the true integer for 2-decimal money values.
    val xCents = round(col("o_totalprice") * 100).cast("long")
    val yKey = col("o_orderkey")
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(graft.functions.ExactMomentsAggregate
        .exactMoments(xCents, yKey, xScale = 2).as("m"))
      .select(
        col("o_orderpriority"),
        element_at(col("m"), 1).cast("long").as("n"),
        element_at(col("m"), 2).as("sum_x"),
        element_at(col("m"), 3).as("sum_y"),
        element_at(col("m"), 4).as("sum_x2"),
        element_at(col("m"), 5).as("sum_y2"),
        element_at(col("m"), 6).as("sum_xy"))
      .select(
        col("o_orderpriority"),
        col("n"),
        (col("sum_x") / col("n")).as("mean_price"),
        // the Σx² − (Σx)²/n cancellation amplifies last-ulp differences
        // (DuckDB may fuse multiply-add); results are rounded far above the
        // noise floor (≤1e-5 absolute observed) but far below data scale
        round((col("sum_x2") - col("sum_x") * col("sum_x") / col("n")) / col("n"), 2)
          .as("var_pop_price"),
        round(sqrt((col("sum_x2") - col("sum_x") * col("sum_x") / col("n")) / col("n")), 4)
          .as("stddev_pop_price"),
        round((col("sum_xy") - col("sum_x") * col("sum_y") / col("n")) /
          (sqrt(col("sum_x2") - col("sum_x") * col("sum_x") / col("n")) *
            sqrt(col("sum_y2") - col("sum_y") * col("sum_y") / col("n"))), 9)
          .as("corr_price_key"))
      .orderBy(col("o_orderpriority"))
  }

  /** Exact percentiles (sort-based interpolation), per group. */
  def qMedian(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"),
        min(col("o_totalprice")).as("p_min"),
        max(col("o_totalprice")).as("p_max"))
      .orderBy(col("o_orderpriority"))

  /** Complex-type battery: per-order quantity arrays (sorted for
    * determinism) with slice / contains / position / element access, and a
    * struct column flattened back to scalars. Array outputs are stringified
    * (engine-independent compare).
    */
  def qComplexTypes(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") <= 200)
      .groupBy(col("l_orderkey"))
      .agg(
        array_sort(collect_list(col("l_quantity"))).as("qtys"),
        max(struct(col("l_quantity").as("q"), col("l_partkey").as("pk"))).as("top"))
      .select(
        col("l_orderkey"),
        size(col("qtys")).cast("long").as("n_lines"),
        array_join(transform(col("qtys"), q => q.cast("string")), ",").as("qtys_str"),
        array_join(transform(slice(col("qtys"), 1, 3), q => q.cast("string")), ",")
          .as("first3_str"),
        array_contains(col("qtys"), 40.0).as("has_40"),
        element_at(col("qtys"), -1).as("max_qty"),
        col("top.q").as("top_q"),
        col("top.pk").as("top_pk"))
      .orderBy(col("l_orderkey"))

  /** Native pivot with an explicit value list (deterministic columns):
    * order-status counts per priority, wide. Explicit values keep the plan
    * a single pass (no extra distinct-collection job) — the form that
    * scales.
    */
  def qPivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("o_orderpriority"), col("F").as("n_f"),
        col("O").as("n_o"), col("P").as("n_p"))
      .orderBy(col("o_orderpriority"))

  /** Explicit GROUPING SETS (beyond rollup's prefix hierarchy): totals by
    * (flag, status), by flag alone, and by status alone — one shuffle,
    * tagged via coalesced keys like qRollup.
    */
  def qGroupingSets(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupingSets(
        Seq(
          Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")),
          Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** Correlated + scalar subqueries through the SQL surface: customers
    * whose spend exceeds their nation's average (correlated agg subquery
    * in DuckDB terms; here expressed as window-free SQL both engines plan
    * their own way).
    */
  /** Correlated EXISTS / NOT EXISTS surface (TPC-H Q21/Q22 shape):
    * customers holding a finished order but NO urgent one, per nation.
    * The interesting part is what Catalyst does with it — both correlated
    * predicates DECORRELATE into joins (left-semi for EXISTS, left-anti
    * for NOT EXISTS) on o_custkey, so the plan is two key joins plus an
    * aggregation, never a per-customer subquery execution
    * (PlanRegressionSpec pins both join types and the absence of any
    * residual subquery in the physical plan). Balance stays on the
    * decimal route.
    */
  def qExists(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    s.sql(
      """SELECT c_nationkey, count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin)
      .select(col("c_nationkey").cast("long").as("c_nationkey"),
        col("n_cust"), col("total_bal"))
  }

  /** Correlated LATERAL subquery (SQL:1999 / TPC-DS idiom): each
    * customer's top-2 orders by price, written as the per-row dependent
    * subquery a SQL user writes — `FROM customer, LATERAL (... WHERE
    * o_custkey = c_custkey ORDER BY ... LIMIT 2)` — and DECORRELATED by
    * Catalyst into a joined per-key window/limit instead of a
    * per-customer execution (the same class as [[qExists]]; the plan
    * must contain a join, not a subquery loop — PlanRegressionSpec).
    * The DuckDB oracle runs the IDENTICAL lateral SQL, so both engines'
    * decorrelation must agree on the tie-broken row set.
    */
  def qLateral(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    s.sql(
      """SELECT c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin)
  }

  def qScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    // only the view this query reads — a full GraftSession.init here would
    // re-register 10 views (and touch session conf) on every invocation
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    // decimal-routed avg (exact sum / count) so the threshold double is
    // bit-identical on both engines; same expression in the oracle
    s.sql(
      """SELECT c_custkey, c_nationkey, c_acctbal
        |FROM customer
        |WHERE c_acctbal >
        |  (SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |   FROM customer c2
        |   WHERE c2.c_nationkey = customer.c_nationkey) * 1.5
        |ORDER BY c_custkey""".stripMargin)
      .select(col("c_custkey"), col("c_nationkey").cast("long").as("c_nationkey"),
        col("c_acctbal"))
  }

  /** ANALYZE-style column profile — the statistics collection a
    * cost-based optimizer (and every data-quality monitor) runs before
    * anything else: per column, null count, exact distinct cardinality,
    * and the min/max envelope. ONE COLUMN-PRUNED PASS PER COLUMN, not
    * one multi-distinct aggregate: Spark plans n-column distinct
    * aggregates via Expand (row × n before the shuffle — measured 7.6 s
    * at sf0.1, the suite's worst line), while a per-column
    * groupBy(value) partial-aggregates map-side to the column's distinct
    * cardinality and reads ONLY that column from parquet (measured
    * 0.35 s for all five). Per-column passes are how production ANALYZE
    * runs; the union of 1-row results is free. min/max surface as
    * strings so one schema covers heterogeneous column types.
    */
  def qTableProfile(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_returnflag")
    val li = Tables.lineitem(s, dir)
    cols.map { c =>
      li.select(col(c))
        .groupBy(col(c)) // map-side combine to distinct values first
        .agg(count(lit(1)).as("cnt"))
        .agg(
          sum(when(col(c).isNull, col("cnt")).otherwise(0L)).as("n_nulls"),
          count(when(col(c).isNotNull, lit(1))).as("n_distinct"),
          min(col(c)).cast("string").as("min_s"),
          max(col(c)).cast("string").as("max_s"))
        .select(lit(c).as("col_name"), coalesce(col("n_nulls"), lit(0L))
          .as("n_nulls"), col("n_distinct"), col("min_s"), col("max_s"))
    }
      .reduce(_ unionByName _)
      .orderBy(col("col_name"))
  }

  // -------------------------------------------------------------------

  /** Data-quality EXPECTATIONS suite (the Deequ/Great-Expectations
    * component): declarative constraints evaluated as one scan per table
    * plus one anti-join for the referential check, emitted as a
    * (check, n_rows, n_violations, pass) ledger — the artifact a nightly
    * pipeline gates promotion on. Row-level checks aggregate violation
    * counts map-side (no row ever leaves its partition un-aggregated);
    * uniqueness is a count-vs-distinct comparison (two aggregates, no
    * self-join); the FK check is a left-anti join on the key. Every
    * check is corpus-linear and shuffle-bounded by its aggregate.
    */
  def qExpectations(s: SparkSession, dir: String): DataFrame = {
    def check(name: String, df: DataFrame, nRows: Column, nViol: Column) =
      df.agg(nRows.as("n_rows"), nViol.as("n_violations"))
        .select(lit(name).as("check"), col("n_rows"), col("n_violations"),
          when(col("n_violations") === 0L, 1L).otherwise(0L).as("pass"))
    val docs = Tables.documents(s, dir)
    val docIdUnique = check("documents_doc_id_unique",
      docs.select(col("doc_id")),
      count(lit(1)), count(lit(1)) - countDistinct(col("doc_id")))
    val docChars = check("documents_n_chars_consistent", docs,
      count(lit(1)),
      sum(when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L)))
    val docLang = check("documents_lang_known", docs,
      count(lit(1)),
      sum(when(!col("lang").isInCollection(
        Seq("en", "de", "fr", "es", "zh")), 1L).otherwise(0L)))
    val ordersPos = check("orders_totalprice_positive",
      Tables.orders(s, dir), count(lit(1)),
      sum(when(col("o_totalprice") <= 0.0 || col("o_totalprice").isNull,
        1L).otherwise(0L)))
    val lineQty = check("lineitem_quantity_in_range",
      Tables.lineitem(s, dir), count(lit(1)),
      sum(when(col("l_quantity") < 1.0 || col("l_quantity") > 50.0,
        1L).otherwise(0L)))
    val embDim = check("embeddings_dim_64",
      Tables.embeddings(s, dir), count(lit(1)),
      sum(when(size(col("embedding")) =!= 64, 1L).otherwise(0L)))
    val fk = {
      val orphans = Tables.lineitem(s, dir).select(col("l_orderkey"))
        .join(Tables.orders(s, dir).select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
      Tables.lineitem(s, dir).agg(count(lit(1)).as("n_rows"))
        .crossJoin(orphans)
        .select(lit("lineitem_orderkey_fk").as("check"), col("n_rows"),
          col("n_violations"),
          when(col("n_violations") === 0L, 1L).otherwise(0L).as("pass"))
    }
    Seq(docIdUnique, docChars, docLang, ordersPos, lineQty, embDim, fk)
      .reduce(_ unionByName _)
      .orderBy(col("check"))
  }

  /** Key-sequence completeness census — the data-quality primitive behind
    * "did the extract drop a range?": gap RUNS in the orders key sequence,
    * found WITHOUT a global sort (the corpus-sized-window temptation this
    * repo bans): key k+1 starts a gap iff k is present and k+1 absent —
    * one shifted left-anti self-join on the key, corpus-linear and
    * co-partitioned (both sides shuffle on the same 8-byte key). The
    * sequence tail (kmax+1) is excluded by the bounds broadcast; total
    * missing mass is pure arithmetic over (min, max, distinct-count).
    * Output: one summary row — at 100 TB the gap-start LIST is still
    * bounded by the run count, but the census is what a monitor alerts
    * on.
    */
  def qIdGaps(s: SparkSession, dir: String): DataFrame = {
    val keys = Tables.orders(s, dir).select(col("o_orderkey").as("k"))
      .distinct()
    val bounds = keys.agg(min(col("k")).as("kmin"), max(col("k")).as("kmax"),
      count(lit(1)).as("n_keys"))
    val gapStarts = keys.select((col("k") + 1).as("g"))
      .join(keys, col("g") === col("k"), "left_anti")
    val nRuns = gapStarts.crossJoin(broadcast(bounds))
      .filter(col("g") <= col("kmax"))
      .agg(count(lit(1)).as("n_gap_runs"))
    bounds.crossJoin(broadcast(nRuns))
      .select(col("n_keys"), col("kmin"), col("kmax"),
        (col("kmax") - col("kmin") + 1 - col("n_keys")).as("n_missing"),
        col("n_gap_runs"))
  }

  /** Star-schema DENORMALIZATION — the wide-table build every
    * feature-engineering pipeline runs before training: lineitem resolved
    * against all six dimensions (orders→customer→nation→region on the
    * customer axis, part and supplier→nation on the supply axis) in one
    * join tree. Output is a census over the denormalized rows — count,
    * exact money sum, and an order-independent bit_xor fingerprint of the
    * resolved key tuple per (cust_region, cust_nation, supp_nation) cell —
    * so the oracle check covers EVERY wide row (a dropped/duplicated/
    * mis-joined row flips the xor) while the result stays bounded by the
    * dimension cross product, not the fact table.
    *
    * 100 TB shape: lineitem⋈orders and the part/supplier lookups are key
    * shuffles between sf-proportional tables (AQE is free to broadcast at
    * small SF; at scale they become shuffled hash / sort-merge on the
    * key). nation and region are fixed-cardinality and explicitly
    * broadcast, so the customer-axis resolution adds no Exchange. Nothing
    * here collects, and the final aggregation is map-side combinable.
    */
  def qDenormalize(s: SparkSession, dir: String): DataFrame = {
    val nc = Tables.nation(s, dir).select(
      col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"),
      col("n_regionkey").as("cn_rkey"))
    val rc = Tables.region(s, dir).select(
      col("r_regionkey").as("cr_key"), col("r_name").as("cust_region"))
    val ns = Tables.nation(s, dir).select(
      col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_extendedprice"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nc), col("c_nationkey") === col("cn_key"))
      .join(broadcast(rc), col("cn_rkey") === col("cr_key"))
      .join(Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(ns), col("s_nationkey") === col("sn_key"))
      .join(Tables.part(s, dir).select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .withColumn("fp",
        graft.functions.SketchExpressions.md5Prefix60Long(concat_ws("|",
          col("l_orderkey"), col("l_linenumber"), col("c_custkey"),
          col("s_suppkey"), col("p_partkey"))))
      .groupBy(col("cust_region"), col("cust_nation"), col("supp_nation"))
      .agg(count(lit(1)).as("n"),
        dsum(col("l_extendedprice")).as("sum_price"),
        expr("bit_xor(fp)").as("fp_xor"))
      .orderBy(col("cust_region"), col("cust_nation"), col("supp_nation"))
  }

  /** Pareto-frontier (skyline) of per-user activity: the users no other
    * user dominates on (n_events, total_value) — the multi-objective
    * "best corpus members" primitive (quality × length doc selection is
    * the same shape). The naive skyline is an all-pairs dominance test;
    * this plan is EXACT with no pairwise work: dominance against the
    * whole set only ever needs the per-n max curve — u is dominated iff
    * some point has strictly more tv at n' ≥ n, or equal-max tv at
    * n' > n — so one groupBy(n).max(tv) (bounded by the distinct
    * per-user event counts, a property of user behavior, not corpus
    * size), one descending running max over that bounded curve
    * (threshold = best tv among strictly larger n), and one broadcast
    * join back decide every user: keep iff tv = max_tv(n) ∧ tv >
    * threshold(n). The oracle is the INDEPENDENT all-pairs derivation
    * (NOT EXISTS dominator), so agreement proves the curve reduction,
    * not just re-runs it. Money stays DECIMAL end-to-end; the compare is
    * exact on both engines.
    */
  def qSkyline(s: SparkSession, dir: String): DataFrame = {
    val u = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("tv"))
    val curve = u.groupBy(col("n_events")).agg(max(col("tv")).as("max_tv"))
      .withColumn("thr", max(col("max_tv")).over(
        Window.orderBy(col("n_events").desc)
          .rowsBetween(Window.unboundedPreceding, -1)))
    u.join(broadcast(curve), "n_events")
      .filter(col("tv") === col("max_tv") &&
        (col("thr").isNull || col("tv") > col("thr")))
      .select(col("user_id"), col("n_events"),
        col("tv").cast("double").as("total_value"))
      .orderBy(col("n_events").desc, col("user_id"))
  }

  /** Top co-purchased part pairs. */
  val CopurchaseTopK = 20

  /** Market-basket mining: the most frequent part PAIRS across orders,
    * with their lift — the single-level frequent-itemset primitive
    * (Agrawal & Srikant, VLDB'94) behind co-occurrence features and
    * recommendation candidates. Pair generation is basket-local: one
    * shuffle groups each order's distinct parts into a set (bounded by
    * order size, ≤~13 here, single-digit in TPC-H generally), and the
    * in-row nested-lambda expansion emits each unordered pair once —
    * cost Σ |basket|² with a BOUNDED basket, i.e. linear in orders, never
    * the |parts|² cross space. Lift denominators are resolved in a second
    * phase against ONLY the ≤2k parts the top-k names (broadcast
    * semi-join, the q_heavy_hitters propose-then-confirm shape), so no
    * corpus-wide per-part census rides the hot path. Top-k is
    * TakeOrdered with full tie-breaks.
    */
  def qCopurchase(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_partkey"))
    val pairs = li
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, x -> transform(filter(ps, y -> y > x)," +
          " y -> named_struct('p1', x, 'p2', y))))")).as("pr"))
      .select(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
      .groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("n"))
    val top = pairs.orderBy(col("n").desc, col("p1"), col("p2"))
      .limit(CopurchaseTopK)
    // per-part order counts for ONLY the named parts (bounded two-phase),
    // with the mining subtree evaluated ONCE: the r13-code phrasing
    // (topParts = union of two selects, np broadcast twice) referenced
    // `top` five ways, and Spark shares no uncached subtrees, so the
    // whole basket-pairs aggregation + TakeOrdered ran 5× per pass (r14
    // plan audit: 5 TakeOrderedAndProject / 16 Exchange nodes). Here each
    // top pair fans out to its two member parts, the denominators ride
    // one broadcast join against lineitem, and the pair row re-assembles
    // by conditional aggregation — `top` appears exactly once.
    val sides = top.select(col("p1"), col("p2"), col("n"),
      explode(array(
        struct(lit(1).as("side"), col("p1").as("pk")),
        struct(lit(2).as("side"), col("p2").as("pk")))).as("e"))
      .select(col("p1"), col("p2"), col("n"),
        col("e.side").as("side"), col("e.pk").as("pk"))
    val np = li.join(broadcast(sides), col("l_partkey") === col("pk"))
      .groupBy(col("p1"), col("p2"), col("n"), col("side"))
      .agg(countDistinct(col("l_orderkey")).as("cnt"))
      .groupBy(col("p1"), col("p2"), col("n"))
      .agg(max(when(col("side") === 1, col("cnt"))).as("np1"),
        max(when(col("side") === 2, col("cnt"))).as("np2"))
    val nOrders = li.agg(countDistinct(col("l_orderkey")).as("n_orders"))
    np.crossJoin(broadcast(nOrders))
      .select(col("p1"), col("p2"), col("n"),
        round(col("n").cast("double") * col("n_orders") /
          (col("np1") * col("np2")), 6).as("lift"))
      .orderBy(col("n").desc, col("p1"), col("p2"))
  }

  /** Fuzzy-match blocking cap: the census is restricted to this id range
    * so the oracle's quadratic verification stays bounded at every SF;
    * the blocked plan itself is linear and needs no cap at scale.
    */
  val FuzzyCap = 5000L

  /** Record linkage by EDIT DISTANCE — the entity-resolution primitive
    * (names, titles, near-identical short strings) the hash/shingle dedup
    * stack cannot express: find all customer-name pairs at Levenshtein
    * distance exactly 1 and report the neighbor-degree histogram. The
    * plan never compares all pairs: a deletion/substitution index (FastSS
    * family — Bocek et al. 2007) explodes each fixed-width name into 9
    * position-masked block keys, so two names share a block iff they
    * agree everywhere outside the masked position — every distance-1 pair
    * lands in EXACTLY one block (the differing position's), no dedup
    * needed — and the per-block self-join is bounded by the alphabet
    * (≤10 digits per block). The levenshtein(na, nb) = 1 filter is the
    * exact verification of the block proposal (two-phase discipline); the
    * oracle is the INDEPENDENT quadratic derivation over the capped id
    * range, so agreement proves the index construction.
    */
  /** Clean-side id offset of the planted linkage twin, and the integer
    * MILLIBIT agreement/disagreement weights of the Fellegi–Sunter score
    * (log2(m/u)·1000 for stylized m/u priors — the exact priors are
    * documentation; what the gate checks is the scoring/classification
    * MACHINERY, so the weights are shared verbatim constants in both
    * engines and the score stays exact integer arithmetic).
    */
  val ErOffset = 1000000L
  val ErWeights: Map[String, (Long, Long)] = Map(
    "name" -> (6570L, -4248L), // m=.95 u=.01
    "bal" -> (9966L, -967L), // m=.999 u=.001
    "seg" -> (2247L, -1538L)) // m=.95 u=.20
  val ErUpper = 10000L
  val ErLower = 0L

  /** Probabilistic record linkage (Fellegi & Sunter, JASA 1969) between
    * customer and a deterministically corrupted twin — the entity-
    * resolution operator a curation pipeline runs to reconcile two
    * overlapping sources. The twin drops the name's 3rd character, flips
    * every 3rd key's market segment, and shifts every 5th key's balance
    * by one cent, so each comparison field has a KNOWN corruption rate.
    * Blocking on (nationkey, last-2 name digits) — both survive every
    * corruption — bounds candidates to ~n/2500 per block with zero
    * planted misses; per pair, the agreement vector (name within
    * levenshtein 2, exact balance, exact segment) maps to the integer
    * millibit log-odds score, classified match / possible / non_match by
    * the [[ErUpper]]/[[ErLower]] thresholds. Output is the
    * agreement-PATTERN census with planted-truth counts per pattern —
    * the tuning artifact linkage reviews are built on. Scale shape: one
    * bounded block join (no cartesian), row-local scoring, one
    * aggregation to ≤ 8 pattern rows.
    */
  def qErLinkage(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val dirty = c.select(
      (col("c_custkey") + ErOffset).as("d_custkey"),
      concat(substring(col("c_name"), 1, 2), substring(col("c_name"), 4, 30))
        .as("d_name"),
      col("c_nationkey").as("d_nationkey"),
      when(col("c_custkey") % 3 === 0, lit("CORRUPTED"))
        .otherwise(col("c_mktsegment")).as("d_mktsegment"),
      when(col("c_custkey") % 5 === 0,
        ((cents(col("c_acctbal")) + 1L).cast("double") / 100.0))
        .otherwise(col("c_acctbal")).as("d_acctbal"))
    val (wN, dN) = ErWeights("name")
    val (wB, dB) = ErWeights("bal")
    val (wS, dS) = ErWeights("seg")
    val pairs = c
      .join(dirty,
        col("c_nationkey") === col("d_nationkey") &&
          expr("right(c_name, 2)") === expr("right(d_name, 2)"))
      .select(col("c_custkey"), col("d_custkey"),
        when(levenshtein(col("c_name"), col("d_name")) <= 2, 1L)
          .otherwise(0L).as("agree_name"),
        when(cents(col("c_acctbal")) === cents(col("d_acctbal")), 1L)
          .otherwise(0L).as("agree_bal"),
        when(col("c_mktsegment") === col("d_mktsegment"), 1L)
          .otherwise(0L).as("agree_seg"))
      .withColumn("score_mb",
        when(col("agree_name") === 1L, wN).otherwise(dN) +
          when(col("agree_bal") === 1L, wB).otherwise(dB) +
          when(col("agree_seg") === 1L, wS).otherwise(dS))
    pairs
      .groupBy(col("agree_name"), col("agree_bal"), col("agree_seg"),
        col("score_mb"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("d_custkey") === col("c_custkey") + ErOffset, 1L)
          .otherwise(0L)).as("n_true"))
      .select(col("agree_name"), col("agree_bal"), col("agree_seg"),
        col("score_mb"),
        when(col("score_mb") >= ErUpper, "match")
          .when(col("score_mb") >= ErLower, "possible")
          .otherwise("non_match").as("decision"),
        col("n_pairs"), col("n_true"))
      .orderBy(col("score_mb").desc)
  }

  def qFuzzyMatch(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
      .filter(col("c_custkey") < FuzzyCap)
      .select(col("c_custkey"), col("c_name"))
    // c_name = "Customer#" + 9 digits; mask digit position i (0-based)
    val keyed = c.select(col("c_custkey"), col("c_name"),
      explode(expr("transform(sequence(0, 8), i -> concat(" +
        "substring(c_name, 1, 9 + i), '*', substring(c_name, 11 + i, 18)))"))
        .as("blk"))
    val pairs = keyed.select(col("blk"), col("c_custkey").as("ca"), col("c_name").as("na"))
      .join(keyed.select(col("blk"), col("c_custkey").as("cb"), col("c_name").as("nb")),
        Seq("blk"))
      .filter(col("ca") < col("cb") &&
        levenshtein(col("na"), col("nb")) === 1)
    pairs.select(col("ca").as("cust")).union(pairs.select(col("cb")))
      .groupBy(col("cust"))
      .agg(count(lit(1)).as("n_neighbors"))
      .groupBy(col("n_neighbors"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_neighbors"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_copurchase" -> qCopurchase,
    "q_fuzzy_match" -> qFuzzyMatch,
    "q_er_linkage" -> qErLinkage,
    "q_denormalize" -> qDenormalize,
    "q_skyline" -> qSkyline,
    "q_expectations" -> qExpectations,
    "q_id_gaps" -> qIdGaps,
    "q_table_profile" -> qTableProfile,
    "q_pivot" -> qPivot,
    "q_grouping_sets" -> qGroupingSets,
    "q_scalar_subquery" -> qScalarSubquery,
    "q_exists" -> qExists,
    "q_lateral" -> qLateral,
    "q_stats" -> qStats,
    "q_median" -> qMedian,
    "q_complex_types" -> qComplexTypes,
    "q1_agg" -> q1Agg,
    "q_filter_project" -> qFilterProject,
    "q_join_broadcast" -> qJoinBroadcast,
    "q_star_topk" -> qStarTopk,
    "q_tpch_q3" -> qTpchQ3,
    "q_tpch_q17" -> qTpchQ17,
    "q_unpivot" -> qUnpivot,
    "q_tpch_q5" -> qTpchQ5,
    "q_tpch_q10" -> qTpchQ10,
    "q_join_shuffle" -> qJoinShuffle,
    "q_ivm_join" -> qIvmJoin,
    "q_ivm_retract" -> qIvmRetract,
    "q_corr_matrix" -> qCorrMatrix,
    "q_join_semi" -> qJoinSemi,
    "q_join_anti" -> qJoinAnti,
    "q_join_outer" -> qJoinOuter,
    "q_join_range" -> qJoinRange,
    "q_sort_limit" -> qSortLimit,
    "q_distinct" -> qDistinct,
    "q_setops" -> qSetOps,
    "q_window_rank" -> qWindowRank,
    "q_window_running" -> qWindowRunning,
    "q_window_dist" -> qWindowDist,
    "q_rollup" -> qRollup,
    "q_cube" -> qCube,
    "q_having" -> qHaving,
    "q_case_agg" -> qCaseAgg,
    "q_scalar_funcs" -> qScalarFuncs,
    "q_string_agg" -> qStringAgg,
    "q_distinct_count" -> qDistinctCount
  )

  private def profileColSql(c: String): String =
    s"""SELECT '$c' AS col_name,
       |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_nulls,
       |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
       |  CAST(min($c) AS VARCHAR) AS min_s,
       |  CAST(max($c) AS VARCHAR) AS max_s
       |FROM lineitem""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_copurchase" ->
      s"""WITH items AS (
         |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |pairs AS (
         |  SELECT a.l_partkey AS p1, b.l_partkey AS p2
         |  FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
         |    AND a.l_partkey < b.l_partkey),
         |pc AS (SELECT p1, p2, count(*) AS n FROM pairs GROUP BY 1, 2),
         |top AS (SELECT * FROM pc
         |  ORDER BY n DESC, p1, p2 LIMIT $CopurchaseTopK),
         |np AS (SELECT l_partkey, count(*) AS np FROM items GROUP BY 1),
         |t AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM lineitem)
         |SELECT top.p1 AS p1, top.p2 AS p2, top.n AS n,
         |  round(CAST(top.n AS DOUBLE) * t.n_orders / (a.np * b.np), 6)
         |    AS lift
         |FROM top
         |JOIN np a ON top.p1 = a.l_partkey
         |JOIN np b ON top.p2 = b.l_partkey
         |CROSS JOIN t
         |ORDER BY n DESC, p1, p2""".stripMargin,
    // independent quadratic derivation over the capped range — NOT the
    // deletion-index blocking the plan uses
    "q_fuzzy_match" ->
      s"""WITH p AS (
         |  SELECT a.c_custkey AS ca, b.c_custkey AS cb
         |  FROM customer a JOIN customer b
         |    ON a.c_custkey < b.c_custkey
         |    AND levenshtein(a.c_name, b.c_name) = 1
         |  WHERE a.c_custkey < $FuzzyCap AND b.c_custkey < $FuzzyCap),
         |n AS (
         |  SELECT cust, count(*) AS n_neighbors FROM (
         |    SELECT ca AS cust FROM p UNION ALL SELECT cb AS cust FROM p)
         |  GROUP BY cust)
         |SELECT n_neighbors, count(*) AS n_customers
         |FROM n GROUP BY n_neighbors ORDER BY n_neighbors""".stripMargin,
    "q_er_linkage" -> {
      val (wN, dN) = ErWeights("name")
      val (wB, dB) = ErWeights("bal")
      val (wS, dS) = ErWeights("seg")
      s"""WITH dirty AS (
         |  SELECT c_custkey + $ErOffset AS d_custkey,
         |    substr(c_name, 1, 2) || substr(c_name, 4) AS d_name,
         |    c_nationkey AS d_nationkey,
         |    CASE WHEN c_custkey % 3 = 0 THEN 'CORRUPTED'
         |         ELSE c_mktsegment END AS d_mktsegment,
         |    CASE WHEN c_custkey % 5 = 0 THEN
         |      CAST(CAST(floor(CAST(c_acctbal AS DOUBLE) * 100 + 0.5) AS BIGINT)
         |        + 1 AS DOUBLE) / 100.0
         |    ELSE c_acctbal END AS d_acctbal
         |  FROM customer),
         |pairs AS (
         |  SELECT c.c_custkey, d.d_custkey,
         |    CASE WHEN levenshtein(c.c_name, d.d_name) <= 2
         |         THEN 1 ELSE 0 END AS agree_name,
         |    CASE WHEN CAST(floor(CAST(c.c_acctbal AS DOUBLE) * 100 + 0.5) AS BIGINT)
         |           = CAST(floor(CAST(d.d_acctbal AS DOUBLE) * 100 + 0.5) AS BIGINT)
         |         THEN 1 ELSE 0 END AS agree_bal,
         |    CASE WHEN c.c_mktsegment = d.d_mktsegment
         |         THEN 1 ELSE 0 END AS agree_seg
         |  FROM customer c JOIN dirty d
         |    ON c.c_nationkey = d.d_nationkey
         |   AND right(c.c_name, 2) = right(d.d_name, 2)),
         |scored AS (
         |  SELECT *,
         |    (CASE WHEN agree_name = 1 THEN $wN ELSE $dN END
         |     + CASE WHEN agree_bal = 1 THEN $wB ELSE $dB END
         |     + CASE WHEN agree_seg = 1 THEN $wS ELSE $dS END) AS score_mb
         |  FROM pairs)
         |SELECT CAST(agree_name AS BIGINT) AS agree_name,
         |  CAST(agree_bal AS BIGINT) AS agree_bal,
         |  CAST(agree_seg AS BIGINT) AS agree_seg,
         |  CAST(score_mb AS BIGINT) AS score_mb,
         |  CASE WHEN score_mb >= $ErUpper THEN 'match'
         |       WHEN score_mb >= $ErLower THEN 'possible'
         |       ELSE 'non_match' END AS decision,
         |  count(*) AS n_pairs,
         |  CAST(sum(CASE WHEN d_custkey = c_custkey + $ErOffset
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_true
         |FROM scored
         |GROUP BY agree_name, agree_bal, agree_seg, score_mb
         |ORDER BY score_mb DESC""".stripMargin
    },
    "q_denormalize" ->
      """SELECT r.r_name AS cust_region, cn.n_name AS cust_nation,
        |  sn.n_name AS supp_nation,
        |  count(*) AS n,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price,
        |  bit_xor(('0x' || substr(md5(
        |      l.l_orderkey || '|' || l.l_linenumber || '|' || c.c_custkey
        |        || '|' || s.s_suppkey || '|' || p.p_partkey),
        |    1, 15))::BIGINT) AS fp_xor
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |JOIN region r ON cn.n_regionkey = r.r_regionkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY 1, 2, 3 ORDER BY cust_region, cust_nation, supp_nation""".stripMargin,
    // independent all-pairs dominance derivation — NOT the curve
    // reduction the plan uses
    "q_skyline" ->
      """WITH u AS (
        |  SELECT user_id, count(*) AS n_events,
        |    sum(CAST(value AS DECIMAL(18,2))) AS tv
        |  FROM events GROUP BY user_id)
        |SELECT a.user_id AS user_id, a.n_events AS n_events,
        |  CAST(a.tv AS DOUBLE) AS total_value
        |FROM u a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM u b
        |  WHERE b.n_events >= a.n_events AND b.tv >= a.tv
        |    AND (b.n_events > a.n_events OR b.tv > a.tv))
        |ORDER BY n_events DESC, user_id""".stripMargin,
    // "check" is reserved in DuckDB — the alias is double-quoted; the
    // parquet column name is plain `check` either way.
    // identical shifted-membership formulation (NOT a window/sort)
    "q_id_gaps" ->
      """WITH keys AS (SELECT DISTINCT o_orderkey AS k FROM orders),
        |b AS (SELECT CAST(min(k) AS BIGINT) AS kmin,
        |    CAST(max(k) AS BIGINT) AS kmax,
        |    CAST(count(*) AS BIGINT) AS n_keys
        |  FROM keys),
        |gs AS (SELECT k + 1 AS g FROM keys
        |  WHERE k + 1 NOT IN (SELECT k FROM keys)),
        |r AS (SELECT CAST(count(*) AS BIGINT) AS n_gap_runs
        |  FROM gs, b WHERE g <= kmax)
        |SELECT n_keys, kmin, kmax,
        |  kmax - kmin + 1 - n_keys AS n_missing, n_gap_runs
        |FROM b, r""".stripMargin,
    "q_expectations" ->
      """SELECT "check", n_rows, n_violations,
        |  CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS pass
        |FROM (
        |  SELECT 'documents_doc_id_unique' AS "check",
        |    CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) AS n_violations
        |  FROM documents
        |  UNION ALL
        |  SELECT 'documents_n_chars_consistent',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)
        |      AS BIGINT)
        |  FROM documents
        |  UNION ALL
        |  SELECT 'documents_lang_known',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN lang NOT IN ('en','de','fr','es','zh')
        |      THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM documents
        |  UNION ALL
        |  SELECT 'orders_totalprice_positive',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN o_totalprice <= 0 OR o_totalprice IS NULL
        |      THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'lineitem_quantity_in_range',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
        |      THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'embeddings_dim_64',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN len(embedding) <> 64 THEN 1 ELSE 0 END)
        |      AS BIGINT)
        |  FROM embeddings
        |  UNION ALL
        |  SELECT 'lineitem_orderkey_fk',
        |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem
        |     WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)))
        |ORDER BY "check"""".stripMargin,
    "q_table_profile" ->
      (Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_returnflag")
        .map(profileColSql)
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY col_name")),
    "q_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
        |ORDER BY returnflag, linestatus""".stripMargin,
    // the IDENTICAL lateral SQL — both decorrelations must agree on the
    // tie-broken row set
    "q_lateral" ->
      """SELECT c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin,
    "q_exists" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
        |  count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey, c_acctbal
        |FROM customer
        |WHERE c_acctbal >
        |  (SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |   FROM customer c2
        |   WHERE c2.c_nationkey = customer.c_nationkey) * 1.5
        |ORDER BY c_custkey""".stripMargin,
    "q_stats" ->
      """WITH sums AS (
        |  SELECT o_orderpriority, count(*) AS n,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_x,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_x2,
        |    CAST(sum(CAST(o_orderkey AS DECIMAL(18,0))) AS DOUBLE) AS sum_y,
        |    CAST(sum(CAST(o_orderkey AS DECIMAL(18,0)) * CAST(o_orderkey AS DECIMAL(18,0))) AS DOUBLE) AS sum_y2,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(o_orderkey AS DECIMAL(18,0))) AS DOUBLE) AS sum_xy
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, n,
        |  sum_x / n AS mean_price,
        |  round((sum_x2 - sum_x * sum_x / n) / n, 2) AS var_pop_price,
        |  round(sqrt((sum_x2 - sum_x * sum_x / n) / n), 4) AS stddev_pop_price,
        |  round((sum_xy - sum_x * sum_y / n) /
        |    (sqrt(sum_x2 - sum_x * sum_x / n) * sqrt(sum_y2 - sum_y * sum_y / n)), 9)
        |    AS corr_price_key
        |FROM sums ORDER BY o_orderpriority""".stripMargin,
    "q_median" ->
      """SELECT o_orderpriority,
        |  quantile_cont(o_totalprice, 0.5) AS p50,
        |  quantile_cont(o_totalprice, 0.9) AS p90,
        |  min(o_totalprice) AS p_min,
        |  max(o_totalprice) AS p_max
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_complex_types" ->
      """WITH agg AS (
        |  SELECT l_orderkey,
        |    list_sort(list(l_quantity)) AS qtys,
        |    max(struct_pack(q := l_quantity, pk := l_partkey)) AS top
        |  FROM lineitem WHERE l_orderkey <= 200 GROUP BY l_orderkey)
        |SELECT l_orderkey,
        |  CAST(len(qtys) AS BIGINT) AS n_lines,
        |  array_to_string(list_transform(qtys, q -> CAST(q AS VARCHAR)), ',') AS qtys_str,
        |  array_to_string(list_transform(qtys[1:3], q -> CAST(q AS VARCHAR)), ',') AS first3_str,
        |  list_contains(qtys, 40.0) AS has_40,
        |  qtys[-1] AS max_qty,
        |  top.q AS top_q,
        |  top.pk AS top_pk
        |FROM agg ORDER BY l_orderkey""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_star_topk" ->
      """SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS ship_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '2000-01-01 00:00:00'
        |  AND n_regionkey = 2
        |GROUP BY n_name, year(l_shipdate)
        |ORDER BY revenue DESC, n_name, ship_year
        |LIMIT 10""".stripMargin,
    "q_unpivot" ->
      """WITH u AS (
        |  SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem)
        |SELECT measure, count(*) AS n,
        |  CAST(sum(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS sum_val,
        |  min(val) AS min_val, max(val) AS max_val
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_tpch_q3" ->
      """SELECT l_orderkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
        |    AS DOUBLE) AS revenue,
        |  o_orderdate
        |FROM customer
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q_tpch_q17" ->
      """SELECT p_brand,
        |  CAST(count(*) AS BIGINT) AS n_small,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
        |    AS BIGINT) AS DOUBLE) / 700.0 AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE l_quantity <
        |  (SELECT CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |     / count(*)
        |   FROM lineitem l2 WHERE l2.l_partkey = p_partkey) / 5.0
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    "q_tpch_q10" ->
      """SELECT c_custkey, c_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
        |    AS DOUBLE) AS revenue,
        |  c_acctbal, n_name
        |FROM customer
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q_tpch_q5" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q_filter_project" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_extendedprice
        |FROM lineitem
        |WHERE l_returnflag = 'R' AND l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
        |  AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_join_broadcast" ->
      """SELECT r_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q_join_shuffle" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // same sufficient statistics, cast-then-multiply order mirrored
    // term by term so both engines produce identical doubles
    "q_corr_matrix" ->
      """WITH c AS (
        |  SELECT CAST(floor(CAST(l_quantity AS DOUBLE)*100+0.5) AS BIGINT) AS q,
        |    CAST(floor(CAST(l_extendedprice AS DOUBLE)*100+0.5) AS BIGINT) AS e,
        |    CAST(floor(CAST(l_discount AS DOUBLE)*100+0.5) AS BIGINT) AS d,
        |    CAST(floor(CAST(l_tax AS DOUBLE)*100+0.5) AS BIGINT) AS t
        |  FROM lineitem),
        |s AS (
        |  SELECT count(*) AS n,
        |    sum(q) AS sq, sum(e) AS se, sum(d) AS sd, sum(t) AS st,
        |    sum(q*q) AS sqq, sum(e*e) AS see, sum(d*d) AS sdd,
        |    sum(t*t) AS stt,
        |    sum(q*e) AS sqe, sum(q*d) AS sqd, sum(q*t) AS sqt,
        |    sum(e*d) AS sed, sum(e*t) AS set_, sum(d*t) AS sdt
        |  FROM c)
        |SELECT col_a, col_b,
        |  round((CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
        |      - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)) /
        |    sqrt((CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
        |        - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) *
        |      (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
        |        - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))), 6) AS corr
        |FROM (
        |  SELECT 'discount' AS col_a, 'extendedprice' AS col_b,
        |    n, sed AS sab, sd AS sa, se AS sb, sdd AS saa, see AS sbb FROM s
        |  UNION ALL SELECT 'discount', 'quantity', n, sqd, sd, sq, sdd, sqq FROM s
        |  UNION ALL SELECT 'discount', 'tax', n, sdt, sd, st, sdd, stt FROM s
        |  UNION ALL SELECT 'extendedprice', 'quantity', n, sqe, se, sq, see, sqq FROM s
        |  UNION ALL SELECT 'extendedprice', 'tax', n, set_, se, st, see, stt FROM s
        |  UNION ALL SELECT 'quantity', 'tax', n, sqt, sq, st, sqq, stt FROM s)
        |ORDER BY col_a, col_b""".stripMargin,
    // INDEPENDENT derivation: from-scratch recompute over the KEPT rows —
    // agreement proves subtractive merge ≡ recompute, including the keys
    // whose count hit zero and left the view
    "q_ivm_retract" ->
      """WITH kept AS (
        |  SELECT o_custkey, o_totalprice FROM orders
        |  WHERE NOT (o_orderkey % 7 = 2 OR o_custkey % 10 = 3)),
        |tch AS (
        |  SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderkey % 7 = 2 OR o_custkey % 10 = 3)
        |SELECT k.o_custkey AS c_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS revenue,
        |  CAST(max(CASE WHEN t.o_custkey IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS is_touched
        |FROM kept k LEFT JOIN tch t ON k.o_custkey = t.o_custkey
        |GROUP BY k.o_custkey ORDER BY c_custkey""".stripMargin,
    // INDEPENDENT derivation: from-scratch recompute over base ∪ delta —
    // agreement proves the Spark side's merged refresh ≡ recomputed view
    "q_ivm_join" ->
      s"""WITH delta AS (
         |  SELECT o_custkey, o_orderpriority, o_totalprice FROM orders
         |  WHERE o_orderkey % $IvmJoinMod = $IvmJoinResidue),
         |allo AS (
         |  SELECT o_custkey, o_orderpriority, o_totalprice FROM orders
         |  UNION ALL SELECT * FROM delta),
         |touched AS (
         |  SELECT DISTINCT c_mktsegment, o_orderpriority
         |  FROM delta JOIN customer ON o_custkey = c_custkey)
         |SELECT a.c_mktsegment, a.o_orderpriority,
         |  count(*) AS n_orders,
         |  CAST(sum(CAST(a.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |    AS revenue,
         |  CAST(CASE WHEN t.c_mktsegment IS NOT NULL THEN 1 ELSE 0 END
         |    AS BIGINT) AS is_touched
         |FROM (SELECT c_mktsegment, o_orderpriority, o_totalprice
         |      FROM allo JOIN customer ON o_custkey = c_custkey) a
         |LEFT JOIN touched t
         |  ON a.c_mktsegment = t.c_mktsegment
         |  AND a.o_orderpriority = t.o_orderpriority
         |GROUP BY a.c_mktsegment, a.o_orderpriority, t.c_mktsegment
         |ORDER BY a.c_mktsegment, a.o_orderpriority""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_outer" ->
      """SELECT c_custkey,
        |  count(o_orderkey) AS n_orders,
        |  coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_join_range" ->
      """SELECT band, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |JOIN (VALUES ('small', 0.0, 100000.0),
        |             ('medium', 100000.0, 250000.0),
        |             ('large', 250000.0, 1e9)) AS bands(band, lo, hi)
        |  ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band ORDER BY band""".stripMargin,
    "q_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT c_mktsegment, CAST(c_nationkey AS BIGINT) AS c_nationkey
        |FROM customer ORDER BY c_mktsegment, c_nationkey""".stripMargin,
    "q_setops" ->
      """WITH cust AS (SELECT CAST(c_nationkey AS BIGINT) AS nk FROM customer),
        |     supp AS (SELECT CAST(s_nationkey AS BIGINT) AS nk FROM supplier)
        |SELECT nk, 'both' AS tag FROM (SELECT nk FROM cust INTERSECT SELECT nk FROM supp)
        |UNION ALL
        |SELECT nk, 'cust_only' AS tag FROM (SELECT DISTINCT nk FROM cust EXCEPT SELECT nk FROM supp)
        |UNION ALL
        |SELECT nk, 'supp_only' AS tag FROM (SELECT DISTINCT nk FROM supp EXCEPT SELECT nk FROM cust)
        |ORDER BY tag, nk""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, CAST(rk AS BIGINT) AS rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) t
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "q_window_running" ->
      """SELECT l_suppkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  l_shipdate,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
        |    OVER (PARTITION BY l_suppkey
        |          ORDER BY l_shipdate, l_orderkey, l_linenumber
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty,
        |  lag(l_shipdate, 1) OVER (PARTITION BY l_suppkey
        |          ORDER BY l_shipdate, l_orderkey, l_linenumber) AS prev_ship
        |FROM lineitem WHERE l_suppkey <= 5
        |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin,
    "q_window_dist" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cum_dist
        |FROM orders WHERE o_orderstatus = 'F'
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q_having" ->
      """SELECT p_brand, count(*) AS n_parts,
        |  count(DISTINCT p_type) AS n_types,
        |  CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM part GROUP BY p_brand HAVING count(*) > 5
        |ORDER BY p_brand""".stripMargin,
    "q_case_agg" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F'
        |           THEN CAST(o_totalprice AS DECIMAL(18,2))
        |           ELSE CAST(0.0 AS DECIMAL(18,2)) END) AS DOUBLE) AS f_value
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_scalar_funcs" ->
      """SELECT o_orderkey,
        |  upper(o_orderstatus) AS status_u,
        |  lower(o_orderpriority) AS prio_l,
        |  substr(o_orderpriority, 1, 1) AS prio_1,
        |  CAST(length(o_orderpriority) AS BIGINT) AS prio_len,
        |  concat_ws('#', o_orderstatus, o_orderpriority) AS tagged,
        |  regexp_replace(o_orderpriority, '[aeiou]', '_', 'g') AS devoweled,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(day(o_orderdate) AS BIGINT) AS d,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  CAST(o_orderkey % 7 AS BIGINT) AS key_mod,
        |  CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_k,
        |  abs(o_totalprice - 150000.0) AS dist_150k,
        |  CASE WHEN o_totalprice > 200000 THEN 'high'
        |       WHEN o_totalprice > 80000 THEN 'mid'
        |       ELSE 'low' END AS bucket,
        |  coalesce(nullif(o_orderstatus, 'P'), 'pending') AS status_nn
        |FROM orders WHERE o_orderkey <= 500
        |ORDER BY o_orderkey""".stripMargin,
    "q_string_agg" ->
      """SELECT r_name,
        |  array_to_string(list_sort(list(n_name)), ',') AS nations,
        |  count(*) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q_distinct_count" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  count(DISTINCT l_suppkey) AS exact_supps
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
