package graft.scale

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.tables.Tables

class ScaleSpec extends SparkSpec with Matchers {

  test("bucketed join on the bucket key plans with zero shuffle") {
    val li = Tables.lineitem(spark, sf()).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf()).select("o_orderkey", "o_totalprice")
    // clear any stale catalog entry AND its on-disk location (a previous
    // JVM's managed-table dir survives the in-memory catalog)
    for (t <- Seq("li_bucketed", "o_bucketed")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      if (loc.exists()) rm(loc)
    }
    Scale.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    Scale.writeBucketed(o, "o_bucketed", "o_orderkey", 8)

    // at test scale the planner prefers broadcast; disable it to expose the
    // bucketed plan shape that matters at 100 TB (where broadcast is moot)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Scale.bucketedJoin(spark, "li_bucketed", "o_bucketed",
        "l_orderkey", "o_orderkey")
      // correct result…
      joined.count() shouldBe li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      // …and the co-located plan: no Exchange anywhere
      val plan = joined.queryExecution.executedPlan.toString
      plan should not include "Exchange"
      plan should include("SortMergeJoin")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
    ()
  }

  test("salted aggregation equals direct aggregation") {
    val li = Tables.lineitem(spark, sf())
    val direct = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("s"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet

    val salted = Scale.saltedAgg(li, Seq(col("l_returnflag")), salts = 7)(
      partials = Seq(
        sum(col("l_quantity").cast("decimal(18,2)")).as("ps"),
        count(lit(1)).as("pn")),
      finals = Seq(
        sum(col("ps")).cast("double").as("s"),
        sum(col("pn")).as("n")))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet

    salted shouldBe direct
  }

  test("date-partitioned writes enable partition pruning at the scan") {
    import java.nio.file.Files
    val out = Files.createTempDirectory("part").resolve("events_by_day").toString
    val ev = Tables.events(spark, sf())
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    ev.write.partitionBy("day").parquet(out)

    val pruned = spark.read.parquet(out).filter(col("day") === "2024-01-05")
    // correctness: matches the unpartitioned filter…
    pruned.count() shouldBe ev.filter(col("day") === "2024-01-05").count()
    // …and the scan proves pruning: the day predicate is a PartitionFilter,
    // so only one directory is read (at 100 TB this is the difference
    // between scanning a day and scanning a history)
    val scan = pruned.queryExecution.executedPlan.toString
    scan should include("PartitionFilters: [isnotnull(day#")
    scan should include("(day#")
    ()
  }

  test("AQE skew-join handling is on in the bench/verify sessions") {
    // AQE splits oversized shuffle partitions at runtime; assert the knobs
    // these sessions rely on are available and enabled by default
    spark.conf.get("spark.sql.adaptive.skewJoin.enabled") shouldBe "true"
  }

  test("hot-key census finds exactly the planted key") {
    Scale.hotKeys(Scale.skewedLineitem(spark, sf()), "l_orderkey",
      Scale.SkewThreshold) shouldBe Seq(0L)
  }

  test("skewJoin is row-identical to the plain join (plan-only change)") {
    val li = Scale.skewedLineitem(spark, sf())
    val ord = Tables.orders(spark, sf())
      .select(col("o_orderkey"), col("o_orderpriority"))
    val skew = Scale.skewJoin(li, ord, "l_orderkey", "o_orderkey",
      Scale.SkewThreshold, Scale.SkewSalts)
      .select(col("l_orderkey"), col("l_extendedprice"),
        col("o_orderpriority"))
    val plain = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select(col("l_orderkey"), col("l_extendedprice"),
        col("o_orderpriority"))
    // exceptAll both ways: multiset equality (duplicate rows matter)
    skew.exceptAll(plain).count() shouldBe 0L
    plain.exceptAll(skew).count() shouldBe 0L
    // the hot path actually carried rows: key 0 survives into the output
    skew.filter(col("l_orderkey") === 0L).count() should be > Scale.SkewThreshold
  }

  test("qJoinSkewAqe: AQE's runtime skew split fires on the planted hot " +
    "key and the rollup is bit-identical to the plain join") {
    // the constructor asserts skew=true on the final adaptive plan and
    // restores every scoped conf — a clean return IS the plan pin
    val got = Scale.qJoinSkewAqe(spark, sf()).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    val want = Scale.aqeSkewedLineitem(spark, sf())
      .join(Tables.orders(spark, sf())
          .select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(graft.operators.Relational.dsum(col("l_extendedprice"))
          .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderpriority"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    got shouldBe want
    // scoped confs restored: the session's execution posture is untouched
    spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "5.0") should not be "2.0"
  }

  test("bloomJoin equals the plain join and its prefilter is selective") {
    val li = Tables.lineitem(spark, sf())
      .select(col("l_orderkey"), col("l_extendedprice"))
    val dim = Tables.orders(spark, sf())
      .filter(col("o_totalprice") > 300000)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val bloom = Scale.bloomJoin(li, dim, "l_orderkey", "o_orderkey")
      .select(col("l_orderkey"), col("l_extendedprice"), col("o_orderpriority"))
    val plain = li.join(dim, li("l_orderkey") === dim("o_orderkey"))
      .select(col("l_orderkey"), col("l_extendedprice"), col("o_orderpriority"))
    bloom.exceptAll(plain).count() shouldBe 0L
    plain.exceptAll(bloom).count() shouldBe 0L
    // the prefilter is in the plan and actually drops fact rows before
    // the join (false positives allowed, misses never)
    val plan = bloom.queryExecution.executedPlan.toString
    plan should include("might_contain")
    val pre = Scale.bloomPrefilter(li, dim, "l_orderkey", "o_orderkey").count()
    val matched = plain.count()
    pre should be >= matched // no misses: every joining row passes
    pre should be < li.count() // the filter genuinely drops fact rows
  }

  test("skewJoin plan: two-path union, salted hot branch, replicated build side") {
    val plan = Scale.qJoinSkew(spark, sf())
      .queryExecution.executedPlan.toString
    plan should include("Union") // cold branch + hot branch
    plan should include("__salt") // hot branch joins on (key, salt)
    // right-side salt replication (sequence folds to a literal array)
    plan should include("Generate explode(")
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("z-order shards bound BOTH dimensions; a single-key sort bounds one") {
    val z = Scale.qZorder(spark, sf()).collect()
    z.length should be <= Scale.ZShards.toInt
    // every z-shard is a 16×16 square of the (pb, ob) plane: the top 8
    // interleaved bits fix the high 4 bits of EACH dimension
    z.foreach { r =>
      (r.getLong(3) - r.getLong(2)) should be <= 15L // max_pb - min_pb
      (r.getLong(5) - r.getLong(4)) should be <= 15L // max_ob - min_ob
      r.getLong(2) / 16 shouldBe r.getLong(3) / 16 // same 16-aligned cell
      r.getLong(4) / 16 shouldBe r.getLong(5) / 16
    }
    // the counterfactual single-key layout: shard by pb's high bits alone
    // (sort by partkey) — tight in pb, but ob spans ~the full axis, so an
    // orderkey predicate prunes (almost) nothing. This is the asymmetry
    // z-ordering removes.
    val linear = Tables.lineitem(spark, sf())
      .select((col("l_partkey") % Scale.ZShards).as("pb"),
        (col("l_orderkey") % Scale.ZShards).as("ob"))
      .groupBy(expr("pb div 16").as("shard"))
      .agg(min("ob").as("min_ob"), max("ob").as("max_ob"))
      .collect()
    val linearAvgObSpan = linear.map(r => r.getLong(2) - r.getLong(1)).sum /
      linear.length.max(1)
    linearAvgObSpan should be > 64L // near-full-axis spans
  }

  test("q_bloom_fpr: no false negatives ever, measured FPR within the " +
    "theoretical envelope, probe stays row-local") {
    val r = Scale.qBloomFpr(spark, sf()).head()
    val (nFact, nPass) = (r.getAs[Long]("n_fact"), r.getAs[Long]("n_pass"))
    val (nTrue, nFp) = (r.getAs[Long]("n_true"), r.getAs[Long]("n_fp"))
    // the Bloom contract: every true member passes
    nPass shouldBe nTrue + nFp
    nPass should be >= nTrue
    // measured FPR ≤ 2× the (1 − e^{−kn/m})^k prediction (and ≥ 0)
    val nKeys = Tables.orders(spark, sf())
      .filter(col("o_totalprice") > 300000)
      .select("o_orderkey").distinct().count()
    val predicted = math.pow(
      1 - math.exp(-Scale.BloomFprHashes.toDouble * nKeys / Scale.BloomFprBits),
      Scale.BloomFprHashes.toDouble)
    r.getAs[Double]("fpr") should be <= math.max(2 * predicted, 0.01)
    nFact shouldBe Tables.lineitem(spark, sf()).count()
    // the filter rides the plan as a literal; the probe is row-local —
    // no shuffle join anywhere
    val plan = Scale.qBloomFpr(spark, sf())
      .queryExecution.executedPlan.toString
    plan should not include "SortMergeJoin"
    plan should include("BroadcastHashJoin")
  }

  test("q_join_estimate: exact side matches the materialized join, " +
    "estimate lands within the universe-sampling envelope") {
    val r = Scale.qJoinEstimate(spark, sf()).head()
    val li = Tables.lineitem(spark, sf()).select("l_orderkey")
    val o = Tables.orders(spark, sf()).select("o_orderkey")
    val trueJoin = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
    r.getAs[Long]("exact") shouldBe trueJoin
    // 1/8 key sample over ~1.5k keys: well within ±50% (measured ~2-6%)
    r.getAs[Double]("rel_err") should be < 0.5
    r.getAs[Long]("n_sample_keys") should be > 0L
    // round-13 scale pin (r12 verdict item 3): sampled and exact per-key
    // counts come from ONE aggregation per side — exactly one scan of
    // lineitem and one of orders; at the 100 TB pre-flight the fact scan
    // is the whole cost of this probe, and the r12 shape paid it twice.
    // Structural node collect, not a "Scan parquet" substring count
    // (round-13 advisor low 3: the rendered string is hostage to AQE
    // re-optimization and plan-formatting changes, and an accidentally
    // cached lineitem would render as InMemoryTableScan and silently
    // satisfy any substring count) — the TpcHSpec bucketed-scan idiom
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val executed = Scale.qJoinEstimate(spark, sf())
      .queryExecution.executedPlan
    val initial: SparkPlan = executed match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    initial.collect { case f: FileSourceScanExec => f } should have size 2
  }

  test("q_skew_census: buckets partition the table, exactly one hot bucket " +
    "holding the planted key") {
    val rows = Scale.qSkewCensus(spark, sf()).collect()
    rows.map(_.getAs[Long]("n")).sum shouldBe
      Tables.lineitem(spark, sf()).count()
    val hot = rows.filter(_.getAs[Boolean]("is_hot"))
    hot.length shouldBe 1
    hot.head.getAs[Double]("ratio") should be > 4.0
    // every other bucket sits near the uniform share
    rows.filterNot(_.getAs[Boolean]("is_hot"))
      .map(_.getAs[Double]("ratio")).max should be < 2.0
  }

  test("q_zonemap: the natural layout skips nothing, the clustered layout " +
    "skips the sub-cutoff mass; both partition the table") {
    val rows = Scale.qZonemap(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_blocks"), r.getAs[Long]("n_rows"))).toMap
    val total = Tables.lineitem(spark, sf()).count()
    def layoutRows(l: String) =
      rows.collect { case ((`l`, _), (_, n)) => n }.sum
    layoutRows("natural") shouldBe total
    layoutRows("clustered") shouldBe total
    // natural: shipdate is uncorrelated with orderkey → no block skips
    rows.get(("natural", "skip")) shouldBe None
    rows.get(("natural", "full")) shouldBe None
    // clustered: everything strictly before the cutoff's block skips
    val belowCutoff = Tables.lineitem(spark, sf())
      .filter(col("l_shipdate") < lit(Scale.ZoneCutoff)).count()
    val skipped = rows.getOrElse(("clustered", "skip"), (0L, 0L))._2
    skipped should be > (belowCutoff * 8) / 10
    skipped should be <= belowCutoff
  }

  test("q_benford: digit rows partition the table, shares are exact ppm " +
    "floors, expectation literals sum to one within floor loss") {
    val rows = Scale.qBenford(spark, sf()).collect()
    rows.map(_.getAs[Long]("n_obs")).sum shouldBe
      Tables.lineitem(spark, sf()).count()
    rows.map(_.getAs[Long]("digit")).toSet.subsetOf((1L to 9L).toSet) shouldBe true
    val total = rows.map(_.getAs[Long]("n_obs")).sum
    rows.foreach { r =>
      r.getAs[Long]("obs_ppm") shouldBe
        1000000L * r.getAs[Long]("n_obs") / total
      r.getAs[Long]("dev_ppm") shouldBe
        r.getAs[Long]("obs_ppm") - r.getAs[Long]("exp_ppm")
    }
    // ⌊10⁶·log₁₀(1+1/d)⌋ loses < 1 ppm per digit
    val expSum = Scale.BenfordPpm.values.sum
    expSum should be > (1000000L - 9)
    expSum should be <= 1000000L
  }

  test("q_dpp: the fact scan carries a runtime dynamicpruning partition " +
    "filter, and pruning is semantics-free") {
    val df = Scale.qDpp(spark, sf())
    val plan = df.queryExecution.executedPlan.toString
    plan.toLowerCase should include("dynamicpruning")
    // equivalence against the direct-filter derivation on the
    // unpartitioned table
    val want = Tables.events(spark, sf())
      .filter(dayofmonth(to_date(col("ts"))) % 7 === 3)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(graft.operators.Relational.cents(col("value"))).as("vc"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2))).toMap shouldBe want
  }
}
