package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables
import graft.operators.Relational.{cents, dsum}

/** The remainder of the TPC-H suite — every query shape the slimmed corpus
  * can express. Q1/Q3/Q5/Q10/Q17 live in [[Relational]]; this module adds
  * Q4, Q6, Q7, Q8, Q12, Q13, Q14, Q15, Q18, Q19, Q21 and Q22, so a user of
  * the reference engine gets the full canonical relational workload, not a
  * sampler. Queries whose original predicates need columns the fixture
  * lacks (`l_commitdate`/`l_receiptdate`, `l_shipmode`, `c_phone`,
  * `p_container`, the whole `partsupp` table — so Q2/Q9/Q11/Q16/Q20 have no
  * honest stand-in) keep the ORIGINAL plan shape with a fixture-expressible
  * predicate substituted; each substitution is noted per query.
  *
  * House conventions ([[Relational]] scaladoc): exact integer-cents money
  * arithmetic (`cents`/`dsum`), aliased output columns mirrored in the
  * oracle, total ORDER BY on a tie-free key set.
  *
  * 100 TB plan discipline, uniform across the module: `nation`, `region`,
  * `supplier` and `part` legs broadcast (they scale sublinearly in TPC-H
  * and their filters prune before the broadcast); `customer`, `orders` and
  * `lineitem` are fact-scale and only ever join via hash shuffles on their
  * natural keys; every top-k is a TakeOrderedAndProject, never a global
  * sort. Plan pins live in TpcHSpec.
  */
object TpcH {

  /** Per-row discounted revenue in exact integer cents·basis-points:
    * price·(1−disc)·10⁴ — the [[Relational.q1Agg]] arithmetic. Summed as
    * DECIMAL(38,0) (never LONG: 10¹⁰ rows of ≤10⁹ terms would wrap).
    */
  private def volCbp = cents(col("l_extendedprice")) *
    (lit(100L) - cents(col("l_discount")))

  private def revenue(alias: String) =
    (sum(volCbp.cast("decimal(38,0)")) / 10000).cast("double").as(alias)

  private def ts(d: String) = lit(d).cast("timestamp")

  // -------------------------------------------------------------------
  // Q4 — order-priority checking. Original EXISTS predicate
  // (l_commitdate < l_receiptdate) is not expressible on this fixture;
  // the stand-in keeps the exact shape — a date-windowed orders scan
  // SEMI-joined to a selectively-filtered lineitem — with quantity ≥ 45
  // as the selective line predicate.
  // Scale: the semi join shuffles both sides on orderkey once; the
  // 5-group aggregation is map-side partial.
  // -------------------------------------------------------------------
  def qTpchQ4(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderdate") >= ts("1997-01-01") &&
        col("o_orderdate") < ts("1997-04-01"))
      .join(Tables.lineitem(s, dir).filter(col("l_quantity") >= 45)
        .select(col("l_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))

  // -------------------------------------------------------------------
  // Q6 — forecasting revenue change: the pure scan-side query. Verbatim
  // shape (all predicate columns exist); revenue = Σ price·discount.
  // Scale: zero joins, zero wide shuffles — date/quantity filters reach
  // the parquet scan (pinned), one single-row final aggregate.
  // -------------------------------------------------------------------
  def qTpchQ6(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= ts("1997-01-01") &&
        col("l_shipdate") < ts("1998-01-01") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(
        (sum((cents(col("l_extendedprice")) * cents(col("l_discount")))
          .cast("decimal(38,0)")) / 10000).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))

  // -------------------------------------------------------------------
  // Q7 — volume shipping between two nations. Verbatim shape. The nation
  // legs are pre-filtered to the two nations of interest BEFORE
  // broadcasting, so the supplier-side broadcast prunes lineitem to the
  // two nations' suppliers immediately; the pair disjunction then only
  // has to kill same-nation pairs.
  // Scale: supplier⋈nation broadcasts into the fact scan; the only wide
  // shuffles are lineitem⋈orders (orderkey) and orders⋈customer
  // (custkey); the final group is 2 pairs × years.
  // -------------------------------------------------------------------
  def qTpchQ7(s: SparkSession, dir: String): DataFrame = {
    // the pair must have traffic both ways at every SF — NATION_1/2 are
    // not supplier nations at sf0.001 (only 10 suppliers there)
    val (na, nb) = ("NATION_12", "NATION_13")
    val n1 = Tables.nation(s, dir).filter(col("n_name").isin(na, nb))
      .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, dir).filter(col("n_name").isin(na, nb))
      .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1998-01-01"))
      .join(broadcast(Tables.supplier(s, dir).join(broadcast(n1),
        col("s_nationkey") === col("s_nkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, dir), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, dir), col("c_custkey") === col("o_custkey"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
      .filter((col("supp_nation") === na && col("cust_nation") === nb) ||
        (col("supp_nation") === nb && col("cust_nation") === na))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(revenue("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  // -------------------------------------------------------------------
  // Q8 — national market share. Original filters p_type = one type and
  // customer-region; both exist here (p_type='PROMO', r_name='EUROPE',
  // share of supplier nation NATION_3). The part leg broadcasts WITH its
  // type filter applied, so the fact scan is pruned to promo parts
  // before any wide shuffle.
  // Scale: three broadcast legs (part, supplier⋈nation, customer-nation
  // region probe); wide shuffles only lineitem⋈orders and
  // orders⋈customer; the share division happens on two exact
  // DECIMAL(38,0) sums per year-group.
  // -------------------------------------------------------------------
  def qTpchQ8(s: SparkSession, dir: String): DataFrame = {
    val bpart = broadcast(Tables.part(s, dir)
      .filter(col("p_type") === "PROMO").select(col("p_partkey")))
    val bsupp = broadcast(Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey").as("s_nkey"),
          col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("s_nkey"))
      .select(col("s_suppkey"), col("supp_nation")))
    val cnat = broadcast(Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir)
        .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nkey")))
    val volC = volCbp.cast("decimal(38,0)")
    val natSum = sum(when(col("supp_nation") === "NATION_3", volCbp)
      .otherwise(0L).cast("decimal(38,0)"))
    val totSum = sum(volC)
    Tables.lineitem(s, dir)
      .join(bpart, col("l_partkey") === col("p_partkey"))
      .join(bsupp, col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, dir)
        .filter(col("o_orderdate") >= ts("1996-01-01") &&
          col("o_orderdate") < ts("1998-01-01")),
        col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, dir), col("c_custkey") === col("o_custkey"))
      .join(cnat, col("c_nationkey") === col("c_nkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        round(natSum.cast("double") / totSum.cast("double"), 6)
          .as("mkt_share"),
        (totSum / 10000).cast("double").as("total_vol"))
      .orderBy(col("o_year"))
  }

  // -------------------------------------------------------------------
  // Q12 — shipping-mode priority census. l_shipmode and the
  // receipt/commit window don't exist; the stand-in classifies by
  // l_linestatus with an l_returnflag + ship-year window, keeping the
  // exact shape: fact-fact join + two conditional counts per class.
  // Scale: one orderkey shuffle; the conditional sums are map-side
  // partial longs.
  // -------------------------------------------------------------------
  def qTpchQ12(s: SparkSession, dir: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R" &&
          col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1998-01-01")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_linestatus").as("ship_class"))
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("ship_class"))
  }

  // -------------------------------------------------------------------
  // Q13 — customer order-count distribution. The o_comment NOT LIKE
  // filter becomes an o_orderpriority exclusion (same role: thin the
  // right side of the OUTER join so zero-order customers appear).
  // Scale: custkey shuffle for the outer join, then a tiny distribution
  // aggregate; customers with no qualifying orders ride the outer join's
  // null rows — no anti-join second pass.
  // -------------------------------------------------------------------
  def qTpchQ13(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir)
        .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  // -------------------------------------------------------------------
  // Q14 — promotion revenue share for one ship-month. Verbatim shape
  // (p_type='PROMO' is a real type here). The share is a ratio of two
  // exact DECIMAL(38,0) cents·bp sums — order-independent, so the
  // division is bit-stable on any partitioning.
  // Scale: part broadcasts; the month filter reaches the lineitem scan;
  // one single-row aggregate, no wide shuffle at all.
  // -------------------------------------------------------------------
  def qTpchQ14(s: SparkSession, dir: String): DataFrame = {
    val promoSum = sum(when(col("p_type") === "PROMO", volCbp)
      .otherwise(0L).cast("decimal(38,0)"))
    val totSum = sum(volCbp.cast("decimal(38,0)"))
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= ts("1997-09-01") &&
        col("l_shipdate") < ts("1997-10-01"))
      .join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg(
        round(lit(100.0) * promoSum.cast("double") / totSum.cast("double"), 6)
          .as("promo_share"),
        count(lit(1)).as("n_lines"))
  }

  // -------------------------------------------------------------------
  // Q15 — top supplier. The revenue view is one quarter's per-supplier
  // exact cents·bp sum; the scalar MAX subquery becomes a broadcast of
  // the 1-row max joined back on exact-integer equality (ties would all
  // surface, as in the spec query; ORDER BY s_suppkey keeps the output
  // total).
  // Scale: one suppkey shuffle builds the view branch; the max side is a
  // broadcast of one row. NOTE: a DataFrame self-join against its own
  // max() plans the quarter aggregation independently in BOTH branches
  // unless ReuseExchange happens to fire — both branches are cheap
  // (pruned quarter scan + partial agg), so we do not rely on reuse
  // here; callers who need single-computation should persist `rev` or
  // register it as an MV (see qMvRollup / plans/MvRewrite.scala).
  // -------------------------------------------------------------------
  def qTpchQ15(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= ts("1997-01-01") &&
        col("l_shipdate") < ts("1997-04-01"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum(volCbp.cast("decimal(38,0)")).as("rev_cbp"))
    rev
      .join(broadcast(rev.agg(max(col("rev_cbp")).as("mx"))),
        col("rev_cbp") === col("mx"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("s_suppkey") === col("supplier_no"))
      .select(col("s_suppkey"), col("s_name"),
        (col("rev_cbp") / 10000).cast("double").as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  // -------------------------------------------------------------------
  // Q18 — large-volume customers. Verbatim shape: the per-order quantity
  // sum is grouped in exact integer cents (LONG is safe here — the sum
  // is per ORDER, bounded by lines-per-order, not by table size), the
  // HAVING threshold keeps heavy orders, and the top-100 is a
  // TakeOrderedAndProject on (o_totalprice DESC, o_orderkey).
  // Scale: orderkey shuffle for the quantity rollup + the orders join,
  // custkey shuffle for the customer join; only ~top orders reach the
  // driver.
  // -------------------------------------------------------------------
  def qTpchQ18(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("o_custkey") === col("c_custkey"))
      .join(
        Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey"))
          .agg(sum(cents(col("l_quantity"))).as("sum_qty_c"))
          .filter(col("sum_qty_c") > 15000L),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"),
        (col("sum_qty_c").cast("decimal(38,0)") / 100).cast("double")
          .as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  // -------------------------------------------------------------------
  // Q19 — disjunctive-predicate revenue. p_container becomes p_size
  // bands (the fixture's only part attribute with range semantics);
  // the three (brand × size-band × quantity-band) disjuncts keep the
  // OR-of-ANDs shape that exercises predicate normalization: the
  // common l_partkey=p_partkey conjunct must stay a hash-join key, the
  // disjunction a post-join filter — never a nested-loop join.
  // Scale: part broadcasts; no wide shuffle (single-row aggregate).
  // -------------------------------------------------------------------
  def qTpchQ19(s: SparkSession, dir: String): DataFrame = {
    def band(brand: String, szLo: Int, szHi: Int, qLo: Int, qHi: Int) =
      col("p_brand") === brand &&
        col("p_size").between(szLo, szHi) &&
        col("l_quantity") >= qLo && col("l_quantity") <= qHi
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)),
        col("p_partkey") === col("l_partkey"))
      .filter(band("Brand#1", 1, 10, 1, 20) ||
        band("Brand#2", 11, 30, 10, 30) ||
        band("Brand#3", 20, 50, 20, 40))
      .agg(revenue("revenue"), count(lit(1)).as("n_lines"))
  }

  // -------------------------------------------------------------------
  // Q21 — suppliers who kept orders waiting. The original "late"
  // predicate (l_receiptdate > l_commitdate) is not expressible; the
  // stand-in keeps the famous EXISTS/NOT-EXISTS chain verbatim with
  // l_returnflag='R' as the fault marker: count, per supplier, the
  // 'F'-status orders where that supplier has a faulted line, ANOTHER
  // supplier is on the order (EXISTS → LEFT SEMI), and NO other
  // supplier faulted (NOT EXISTS → LEFT ANTI).
  // Scale: all three lineitem legs hash-shuffle on l_orderkey (the
  // residual suppkey≠ predicates ride the join), orders shuffles on
  // orderkey once, supplier broadcasts for the name; the top-10 is a
  // TakeOrderedAndProject.
  // -------------------------------------------------------------------
  def qTpchQ21(s: SparkSession, dir: String): DataFrame = {
    val l1 = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_suppkey"))
    val l2 = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("l2_orderkey"),
        col("l_suppkey").as("l2_suppkey"))
    val l3 = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("l3_orderkey"),
        col("l_suppkey").as("l3_suppkey"))
    l1
      .join(l2, col("l_orderkey") === col("l2_orderkey") &&
        col("l_suppkey") =!= col("l2_suppkey"), "left_semi")
      .join(l3, col("l_orderkey") === col("l3_orderkey") &&
        col("l_suppkey") =!= col("l3_suppkey"), "left_anti")
      .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey")),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("s_suppkey") === col("l_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(10)
  }

  // -------------------------------------------------------------------
  // Q22 — global sales opportunity. c_phone country codes don't exist;
  // the code becomes c_custkey % 5 with the same IN-list shape. The
  // scalar AVG subquery is computed exactly (integer-cents sum over a
  // double count — ONE double division, mirrored verbatim in the
  // oracle), and "has no orders" — every fixture customer has orders —
  // becomes "has no URGENT order", keeping the NOT EXISTS → LEFT ANTI
  // leg selective.
  // Scale: the 1-row threshold broadcasts; the anti join shuffles on
  // custkey; the final census is 3 groups.
  // -------------------------------------------------------------------
  def qTpchQ22(s: SparkSession, dir: String): DataFrame = {
    val pool = Tables.customer(s, dir)
      .filter((col("c_custkey") % 5).isin(1L, 2L, 3L))
      .select(col("c_custkey"), col("c_acctbal"),
        (col("c_custkey") % 5).as("cntrycode"))
    val thr = pool.filter(col("c_acctbal") > 0)
      .agg((sum(cents(col("c_acctbal"))).cast("double") /
        (count(lit(1)) * 100).cast("double")).as("avg_bal"))
    pool
      .join(broadcast(thr))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .groupBy(col("cntrycode"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("cntrycode"))
  }

  // -------------------------------------------------------------------
  // Derived partsupp — the fixture has no partsupp table, so Q2/Q9/Q11/
  // Q16/Q20 derive one by the same discipline operators/Hosts.scala uses
  // for hosts: a convention computable identically by both engines.
  // The relation is lineitem's DISTINCT (partkey, suppkey) pairs — the
  // pairs that demonstrably supply — with supplycost/availqty as pure
  // integer functions of the key pair (exact on both engines, no floats).
  // The queries join it as a REAL table (the functional shortcut — these
  // columns are computable row-local on lineitem, eliminating the join —
  // is deliberately NOT taken: the point of these five queries is the
  // partsupp join shape). The derivation — one distinct-shuffle over the
  // fact — is written ONCE per (session, corpus) as a BUCKETED TABLE in
  // the session warehouse (bucketBy ps_partkey, the production path the
  // r11 memoized-cache note called for: Spark 4's
  // canChangeCachedPlanOutputPartitioning default hides a cached plan's
  // partitioning from EnsureRequirements, but a bucketed SCAN's
  // HashPartitioning is structural — no flag, no cache manager), so
  // Q2/Q9/Q11/Q16/Q20 — and Q2's TWO branches — read the same on-disk,
  // already-bucketed relation instead of re-deriving a full-fact
  // distinct shuffle each (six per suite before the r11 memo). Every
  // join/groupBy keyed on ps_partkey — including the TWO-key (partkey,
  // suppkey) joins, bucketing on a SUBSET of the join keys satisfies
  // ClusteredDistribution — rides the bucketing with NO exchange on the
  // partsupp side; plan-pinned in TpcHSpec.
  // -------------------------------------------------------------------
  private val partsuppTableMemo: SessionMemo[String] = new SessionMemo[String]()

  private[operators] def partsupp(s: SparkSession, dir: String): DataFrame =
    s.table(partsuppTableMemo.getOrElseUpdate(s, dir) {
      val t = "graft_partsupp" + dir.replaceAll("[^A-Za-z0-9]", "_")
      graft.scale.Scale.dropWithLocation(s, t)
      graft.scale.Scale.writeBucketed(
        Tables.lineitem(s, dir)
          .select(col("l_partkey").as("ps_partkey"),
            col("l_suppkey").as("ps_suppkey"))
          .distinct()
          .withColumn("ps_supplycost_c",
            (col("ps_partkey") * 31 + col("ps_suppkey") * 17) % 90000 + 10000)
          .withColumn("ps_availqty",
            (col("ps_partkey") * 7 + col("ps_suppkey") * 3) % 9999 + 1),
        t, "ps_partkey", graft.scale.Scale.JoinBuckets)
      t
    })

  /** The same derivation as DuckDB SQL, prefixed to each oracle. */
  private val PartsuppCte =
    """WITH partsupp AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |    (l_partkey*31 + l_suppkey*17) % 90000 + 10000 AS ps_supplycost_c,
      |    (l_partkey*7 + l_suppkey*3) % 9999 + 1 AS ps_availqty
      |  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem))
      |""".stripMargin

  // -------------------------------------------------------------------
  // Q2 — minimum-cost supplier. The correlated MIN subquery is written
  // in its decorrelated form directly (the shape Catalyst produces for
  // Q17): one per-part MIN over the region-restricted partsupp, joined
  // back on (partkey, cost = min). p_mfgr doesn't exist; p_brand rides
  // along instead.
  // Scale: supplier/nation/region broadcast; the partsupp↔min-join
  // shuffles on ps_partkey (both sides, co-partitioned); top-100 is a
  // TakeOrderedAndProject.
  // -------------------------------------------------------------------
  def qTpchQ2(s: SparkSession, dir: String): DataFrame = {
    val eups = partsupp(s, dir)
      .join(broadcast(Tables.supplier(s, dir)),
        col("s_suppkey") === col("ps_suppkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)
        .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
    val minc = eups.groupBy(col("ps_partkey").as("m_partkey"))
      .agg(min(col("ps_supplycost_c")).as("min_c"))
    eups
      .join(broadcast(Tables.part(s, dir)
        .filter(col("p_size") === 15 && col("p_type") === "STANDARD")),
        col("p_partkey") === col("ps_partkey"))
      .join(minc, col("ps_partkey") === col("m_partkey") &&
        col("ps_supplycost_c") === col("min_c"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_brand"),
        (col("ps_supplycost_c").cast("decimal(38,0)") / 100).cast("double")
          .as("ps_supplycost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  // -------------------------------------------------------------------
  // Q9 — product-type profit. Verbatim shape: the six-way join with the
  // two-key partsupp join, profit = Σ (price·(1−disc) − supplycost·qty),
  // all in exact integer cents·bp (both terms are value×10⁴; one final
  // division).
  // Scale: part (name-filtered) / supplier / nation broadcast; the
  // partsupp join shuffles on the (partkey,suppkey) pair, orders on
  // orderkey — the two unavoidable fact exchanges.
  // -------------------------------------------------------------------
  def qTpchQ9(s: SparkSession, dir: String): DataFrame = {
    val profitC = volCbp -
      col("ps_supplycost_c") * cents(col("l_quantity"))
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
        .filter(col("p_name").like("%bolt%")).select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(partsupp(s, dir),
        col("ps_partkey") === col("l_partkey") &&
          col("ps_suppkey") === col("l_suppkey"))
      .join(Tables.orders(s, dir), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg((sum(profitC.cast("decimal(38,0)")) / 10000).cast("double")
        .as("sum_profit"))
      .orderBy(col("n_name"), col("o_year").desc)
  }

  // -------------------------------------------------------------------
  // Q11 — important stock. Verbatim shape: one nation's per-part stock
  // value vs a scalar fraction (1/10000) of the nation total. Both sums
  // are exact DECIMAL(38,0) over integer cost·qty products, so the
  // threshold comparison is exact on both engines.
  // Scale: the supplier probe broadcasts; one ps_partkey aggregation
  // shuffle; the 1-row total broadcasts back.
  // -------------------------------------------------------------------
  def qTpchQ11(s: SparkSession, dir: String): DataFrame = {
    val natps = partsupp(s, dir)
      .join(broadcast(Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)
          .filter(col("n_name") === "NATION_12")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))),
        col("ps_suppkey") === col("s_suppkey"))
    val valpp = natps.groupBy(col("ps_partkey"))
      .agg(sum((col("ps_supplycost_c") * col("ps_availqty"))
        .cast("decimal(38,0)")).as("v_c"))
    valpp
      .join(broadcast(valpp.agg(sum(col("v_c")).as("t_c"))))
      .filter(col("v_c") * 10000 > col("t_c"))
      .select(col("ps_partkey"),
        (col("v_c") / 100).cast("double").as("part_value"))
      .orderBy(col("part_value").desc, col("ps_partkey"))
  }

  // -------------------------------------------------------------------
  // Q16 — supplier-part census. The complaint-supplier NOT IN becomes a
  // LEFT ANTI against a deterministic predicate (s_suppkey % 13 = 0 —
  // s_comment doesn't exist); brand/type exclusions and the size
  // IN-list keep the original shape, including the COUNT(DISTINCT)
  // across the join.
  // Scale: both dimension legs broadcast (the anti side is a key list);
  // the only wide shuffle is the distinct-count aggregation.
  // -------------------------------------------------------------------
  def qTpchQ16(s: SparkSession, dir: String): DataFrame =
    partsupp(s, dir)
      .join(broadcast(Tables.supplier(s, dir)
        .filter(col("s_suppkey") % 13 === 0).select(col("s_suppkey"))),
        col("ps_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(Tables.part(s, dir)
        .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))),
        col("p_partkey") === col("ps_partkey"))
      .groupBy(col("p_brand"), col("p_type"),
        col("p_size").cast("long").as("p_size"))
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))

  // -------------------------------------------------------------------
  // Q20 — excess-stock suppliers. Verbatim shape: the nested
  // IN-subquery chain becomes part-probe LEFT SEMI → shipped-quantity
  // LEFT OUTER (+ coalesce 0 for never-shipped pairs, matching the
  // correlated scalar sum's empty case) → threshold filter → supplier
  // LEFT SEMI.
  // Scale: the year's shipped quantities aggregate on the same
  // (partkey,suppkey) pair the join uses — co-partitioned; part and
  // nation probes broadcast.
  // -------------------------------------------------------------------
  def qTpchQ20(s: SparkSession, dir: String): DataFrame = {
    val shipped = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= ts("1997-01-01") &&
        col("l_shipdate") < ts("1998-01-01"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(cents(col("l_quantity"))).as("qty_c"))
    val excess = partsupp(s, dir)
      .join(broadcast(Tables.part(s, dir)
        .filter(col("p_name").like("blue%")).select(col("p_partkey"))),
        col("ps_partkey") === col("p_partkey"), "left_semi")
      .join(shipped,
        col("ps_partkey") === col("l_partkey") &&
          col("ps_suppkey") === col("l_suppkey"), "left_outer")
      .filter(col("ps_availqty") * 100 >
        lit(50L) * coalesce(col("qty_c"), lit(0L)))
    Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
        .filter(col("n_name") === "NATION_12")),
        col("s_nationkey") === col("n_nationkey"))
      .join(excess.select(col("ps_suppkey")),
        col("s_suppkey") === col("ps_suppkey"), "left_semi")
      .select(col("s_name"), col("s_suppkey"))
      .orderBy(col("s_suppkey"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tpch_q2" -> qTpchQ2,
    "q_tpch_q9" -> qTpchQ9,
    "q_tpch_q11" -> qTpchQ11,
    "q_tpch_q16" -> qTpchQ16,
    "q_tpch_q20" -> qTpchQ20,
    "q_tpch_q4" -> qTpchQ4,
    "q_tpch_q6" -> qTpchQ6,
    "q_tpch_q7" -> qTpchQ7,
    "q_tpch_q8" -> qTpchQ8,
    "q_tpch_q12" -> qTpchQ12,
    "q_tpch_q13" -> qTpchQ13,
    "q_tpch_q14" -> qTpchQ14,
    "q_tpch_q15" -> qTpchQ15,
    "q_tpch_q18" -> qTpchQ18,
    "q_tpch_q19" -> qTpchQ19,
    "q_tpch_q21" -> qTpchQ21,
    "q_tpch_q22" -> qTpchQ22
  )

  // The oracles mirror the Spark arithmetic exactly: money sums either as
  // DECIMAL(12,2)·(1−DECIMAL(4,2)) products (equal to the cents·bp route —
  // RelationalSpec pins the bit-equality) or, where a RATIO or an exact
  // integer COMPARISON is taken, as the same floor(x·100+0.5) integer
  // cents·bp sums the Spark side uses, so both engines divide/compare
  // identical exact values.
  def oracleSql: Map[String, String] = Map(
    "q_tpch_q2" -> (PartsuppCte +
      """SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
        |  CAST(CAST(ps_supplycost_c AS DECIMAL(38,0)) / 100 AS DOUBLE)
        |    AS ps_supplycost
        |FROM part, partsupp, supplier, nation, region
        |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
        |  AND p_size = 15 AND p_type = 'STANDARD'
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'EUROPE'
        |  AND ps_supplycost_c = (
        |    SELECT min(ps_supplycost_c)
        |    FROM partsupp, supplier, nation, region
        |    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
        |      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |      AND r_name = 'EUROPE')
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin),
    "q_tpch_q9" -> (PartsuppCte +
      """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(CAST(sum(
        |    CAST(floor(CAST(l_extendedprice AS DOUBLE)*100+0.5) AS BIGINT) *
        |      (100 - CAST(floor(CAST(l_discount AS DOUBLE)*100+0.5) AS BIGINT))
        |    - ps_supplycost_c *
        |      CAST(floor(CAST(l_quantity AS DOUBLE)*100+0.5) AS BIGINT)
        |  ) AS DECIMAL(38,0)) / 10000 AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%bolt%'
        |GROUP BY n_name, o_year ORDER BY n_name, o_year DESC""".stripMargin),
    "q_tpch_q11" -> (PartsuppCte.stripSuffix("\n") +
      """,
        |val AS (
        |  SELECT ps_partkey, sum(ps_supplycost_c * ps_availqty) AS v_c
        |  FROM partsupp JOIN supplier ON s_suppkey = ps_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_12'
        |  GROUP BY ps_partkey),
        |tot AS (SELECT sum(v_c) AS t_c FROM val)
        |SELECT ps_partkey,
        |  CAST(CAST(v_c AS DECIMAL(38,0)) / 100 AS DOUBLE) AS part_value
        |FROM val, tot WHERE v_c * 10000 > t_c
        |ORDER BY part_value DESC, ps_partkey""".stripMargin),
    "q_tpch_q16" -> (PartsuppCte +
      """SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
        |  count(DISTINCT ps_suppkey) AS supplier_cnt
        |FROM partsupp JOIN part ON p_partkey = ps_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
        |  AND ps_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_suppkey % 13 = 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin),
    "q_tpch_q20" -> (PartsuppCte +
      """SELECT s_name, s_suppkey
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_12'
        |  AND s_suppkey IN (
        |    SELECT ps_suppkey FROM partsupp
        |    WHERE ps_partkey IN
        |        (SELECT p_partkey FROM part WHERE p_name LIKE 'blue%')
        |      AND ps_availqty * 100 > 50 * (
        |        SELECT CAST(coalesce(sum(CAST(floor(
        |            CAST(l_quantity AS DOUBLE)*100+0.5) AS BIGINT)), 0)
        |          AS BIGINT)
        |        FROM lineitem
        |        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'))
        |ORDER BY s_suppkey""".stripMargin),
    "q_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_tpch_q6" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_13')
        |    OR (n1.n_name = 'NATION_13' AND n2.n_name = 'NATION_12'))
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q_tpch_q8" ->
      """WITH vols AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100 + 0.5) AS BIGINT) *
        |      (100 - CAST(floor(CAST(l_discount AS DOUBLE) * 100 + 0.5) AS BIGINT))
        |      AS vol_cbp,
        |    n1.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  JOIN region ON n2.n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
        |SELECT o_year,
        |  round(CAST(sum(CASE WHEN supp_nation = 'NATION_3'
        |      THEN vol_cbp ELSE 0 END) AS DOUBLE) /
        |    CAST(sum(vol_cbp) AS DOUBLE), 6) AS mkt_share,
        |  CAST(CAST(sum(vol_cbp) AS DECIMAL(38,0)) / 10000 AS DOUBLE)
        |    AS total_vol
        |FROM vols GROUP BY o_year ORDER BY o_year""".stripMargin,
    "q_tpch_q12" ->
      """SELECT l_linestatus AS ship_class,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_returnflag = 'R'
        |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY ship_class ORDER BY ship_class""".stripMargin,
    "q_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |        AND o_orderpriority <> '4-NOT SPECIFIED'
        |      GROUP BY c_custkey) c_orders
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q_tpch_q14" ->
      """SELECT
        |  round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100 + 0.5) AS BIGINT) *
        |        (100 - CAST(floor(CAST(l_discount AS DOUBLE) * 100 + 0.5) AS BIGINT))
        |      ELSE 0 END) AS DOUBLE) /
        |    CAST(sum(CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100 + 0.5) AS BIGINT) *
        |      (100 - CAST(floor(CAST(l_discount AS DOUBLE) * 100 + 0.5) AS BIGINT)))
        |      AS DOUBLE), 6) AS promo_share,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin,
    "q_tpch_q15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    sum(CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100 + 0.5) AS BIGINT) *
        |      (100 - CAST(floor(CAST(l_discount AS DOUBLE) * 100 + 0.5) AS BIGINT)))
        |      AS rev_cbp
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name,
        |  CAST(CAST(rev_cbp AS DECIMAL(38,0)) / 10000 AS DOUBLE)
        |    AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE rev_cbp = (SELECT max(rev_cbp) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    "q_tpch_q18" ->
      """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(CAST(sum_qty_c AS DECIMAL(38,0)) / 100 AS DOUBLE) AS sum_qty
        |FROM customer
        |JOIN orders ON o_custkey = c_custkey
        |JOIN (SELECT l_orderkey,
        |        sum(CAST(floor(CAST(l_quantity AS DOUBLE) * 100 + 0.5) AS BIGINT))
        |          AS sum_qty_c
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING sum_qty_c > 15000) big ON big.l_orderkey = o_orderkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q_tpch_q19" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
        |    AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity >= 1 AND l_quantity <= 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 30
        |       AND l_quantity >= 10 AND l_quantity <= 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
        |       AND l_quantity >= 20 AND l_quantity <= 40)""".stripMargin,
    "q_tpch_q21" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin,
    "q_tpch_q22" ->
      """WITH pool AS (
        |  SELECT c_custkey, c_acctbal, c_custkey % 5 AS cntrycode
        |  FROM customer WHERE c_custkey % 5 IN (1, 2, 3)),
        |thr AS (
        |  SELECT CAST(sum(CAST(floor(CAST(c_acctbal AS DOUBLE) * 100 + 0.5)
        |      AS BIGINT)) AS DOUBLE) / CAST(count(*) * 100 AS DOUBLE) AS avg_bal
        |  FROM pool WHERE c_acctbal > 0)
        |SELECT cntrycode, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM pool, thr
        |WHERE c_acctbal > avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin
  )
}
