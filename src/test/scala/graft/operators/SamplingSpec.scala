package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class SamplingSpec extends SparkSpec with Matchers {

  test("hash sample is deterministic and content-independent") {
    val once = Sampling.qSampleHash(spark, sf()).collect().toSeq
    val again = Sampling.qSampleHash(spark, sf()).collect().toSeq
    again shouldBe once
    // ~1/20 of the corpus, not a degenerate all-or-nothing filter
    val total = graft.tables.Tables.documents(spark, sf()).count()
    once.size.toLong should be > 0L
    once.size.toLong should be < total / 5
  }

  test("sample filter never reads the text column") {
    val scan = Sampling.qSampleHash(spark, sf())
      .queryExecution.executedPlan.toString
    scan should include("ReadSchema")
    scan should not include "text"
  }

  test("sequence packing agrees with a per-stream driver-side simulation") {
    val width = Sampling.PackCtxLen
    // same stream definition as qPack: (source, md5-shard), doc_id order
    val rows = graft.tables.Tables.documents(spark, sf())
      .select(
        col("source"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long") % Sampling.PackShards).as("shard"),
        col("doc_id"),
        graft.functions.TextFunctions.bpeTokenCount(col("text"))
          .cast("long").as("tk"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    case class Agg(docs: Long = 0, tokens: Long = 0, packs: Long = 0, spanning: Long = 0)
    val expected = rows.groupBy(t => (t._1, t._2)).toSeq
      .map { case ((src, _), stream) =>
        var off = 0L
        var spanning = 0L
        stream.sortBy(_._3).foreach { case (_, _, _, tk) =>
          if (tk > 0 && off / width != (off + tk - 1) / width) spanning += 1
          off += tk
        }
        src -> Agg(stream.size.toLong, off, (off + width - 1) / width, spanning)
      }
      .groupBy(_._1)
      .map { case (src, streams) =>
        src -> streams.map(_._2).foldLeft(Agg()) { (a, b) =>
          Agg(a.docs + b.docs, a.tokens + b.tokens,
            a.packs + b.packs, a.spanning + b.spanning)
        }
      }

    val got = Sampling.qPack(spark, sf()).collect()
      .map(r => r.getString(0) ->
        Agg(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    got shouldBe expected
  }

  test("pack assignment: offsets are stream-cumulative and pack ids are " +
    "offset-consistent") {
    val ctx = Sampling.PackCtxLen
    val rows = Sampling.qPackIds(spark, sf()).collect()
    rows should not be empty
    rows.foreach { r =>
      val (tk, start, pack) = (r.getLong(3), r.getLong(4), r.getLong(5))
      tk should be >= 0L
      start should be >= 0L
      pack shouldBe start / ctx
    }
    // within a stream, offsets advance by exactly the token counts
    rows.groupBy(r => (r.getString(1), r.getLong(2))).values.foreach { stream =>
      val byDoc = stream.sortBy(_.getLong(0))
      byDoc.sliding(2).foreach {
        case Array(a, b) =>
          // contiguous only when no unsampled doc sits between; offsets
          // still must be non-decreasing by a's token count
          b.getLong(4) should be >= a.getLong(4) + a.getLong(3)
        case _ => ()
      }
    }
  }

  test("shard count scales with corpus size and per-stream packing is " +
    "shard-stable") {
    // autoShards: oracle default until streams would exceed the target,
    // then grows linearly — per-stream length stays bounded at any corpus
    Sampling.autoShards(1000L) shouldBe Sampling.PackShards
    Sampling.autoShards(10L * (1L << 20)) shouldBe 10
    Sampling.autoShards(1L << 34, targetPerStream = 1L << 20) shouldBe (1 << 14)

    // invariants across shard counts: sharding re-routes documents between
    // streams but never changes WHAT is packed — per-source doc/token
    // totals are identical, and the pack count stays within the per-stream
    // ceil slack (each stream wastes < 1 pack vs the token lower bound)
    val at8 = Sampling.packInventory(spark, sf(), 8).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val at32 = Sampling.packInventory(spark, sf(), 32).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    at32.keySet shouldBe at8.keySet
    at8.foreach { case (srcKey, (docs8, tokens8, packs8)) =>
      val (docs32, tokens32, packs32) = at32(srcKey)
      docs32 shouldBe docs8
      tokens32 shouldBe tokens8
      val floor = (tokens8 + Sampling.PackCtxLen - 1) / Sampling.PackCtxLen
      packs8 should be >= floor
      packs32 should be >= floor
      packs8 should be <= floor + 8
      packs32 should be <= floor + 32
    }

    // and with more shards, the longest stream SHRINKS (the parallelism
    // the parameter exists to buy: window-task length is per-stream)
    def maxStream(shards: Int): Long =
      Sampling.packAssignment(spark, sf(), shards)
        .groupBy(col("source"), col("shard")).count()
        .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    maxStream(32) should be < maxStream(1)
  }

  test("no-split packing agrees with a next-fit simulation and the padding " +
    "identity holds") {
    val ctx = Sampling.PackCtxLen
    val rows = graft.tables.Tables.documents(spark, sf())
      .select(
        col("source"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long") % Sampling.PackShards).as("shard"),
        col("doc_id"),
        graft.functions.TextFunctions.bpeTokenCount(col("text"))
          .cast("long").as("tk"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // (docs, packs, total, kept, dropped, padding) per stream, summed per source
    val expected = rows.groupBy(t => (t._1, t._2)).toSeq
      .map { case ((src, _), stream) =>
        var fill, packs, padding, dropped, kept, total = 0L
        stream.sortBy(_._3).foreach { case (_, _, _, tk) =>
          val eff = math.min(tk, ctx)
          if (packs == 0L) { packs = 1L; fill = eff }
          else if (fill + eff > ctx) { packs += 1; padding += ctx - fill; fill = eff }
          else fill += eff
          total += tk; kept += eff; dropped += tk - eff
        }
        src -> Seq(stream.size.toLong, packs, total, kept, dropped,
          padding + (ctx - fill))
      }
      .groupBy(_._1)
      .map { case (src, streams) =>
        src -> streams.map(_._2).transpose.map(_.sum)
      }

    val got = Sampling.qPackFit(spark, sf()).collect()
      .map(r => r.getString(0) -> (1 to 6).map(r.getLong).toSeq).toMap
    got shouldBe expected
    // padding is exactly the unfilled remainder of every pack
    got.values.foreach { case Seq(_, packs, _, kept, _, padding) =>
      padding shouldBe packs * ctx - kept
    }
  }

  test("packing window shuffles once: a single Exchange below the aggregate") {
    val plan = Sampling.qPack(spark, sf()).queryExecution.executedPlan.toString
    // the stream window and the (source, shard) aggregate share the
    // hashpartitioning; only the #sources-sized final agg re-shuffles
    plan should include("Window")
    plan should not include "CartesianProduct"
  }

  test("split assignment is exhaustive and 80/10/10-shaped") {
    val rows = Sampling.qSplitAssign(spark, sf()).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.keySet shouldBe Set("train", "val", "test")
    val total = rows.values.sum
    total shouldBe graft.tables.Tables.documents(spark, sf()).count()
    // hash ranges approximate the 80/10/10 design on any real corpus
    rows("train").toDouble / total should be > 0.7
    rows("val").toDouble / total should be < 0.2
    rows("test").toDouble / total should be < 0.2
  }

  test("source-mix budgets: every source covered, exact integer arithmetic") {
    val rows = Sampling.qSourceMix(spark, sf()).collect()
    val total = graft.tables.Tables.documents(spark, sf()).count()
    rows.map(_.getLong(1)).sum shouldBe total // partition of the corpus
    val pcts = Sampling.MixPctBySource.toMap
    rows.foreach { r =>
      val (src, tokens, pct, kept) =
        (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4))
      pct shouldBe pcts.getOrElse(src, Sampling.MixDefaultPct).toLong
      kept shouldBe tokens * pct / 100 // JVM long division == SQL div
    }
  }

  test("quality-weighted sample: bands partition the corpus, keep rates " +
    "track the per-band mods") {
    val rows = Sampling.qQualitySample(spark, sf()).collect()
    val total = graft.tables.Tables.documents(spark, sf()).count()
    rows.map(_.getLong(1)).sum shouldBe total
    val (hi, mid, lo) = Sampling.QualityMods
    val modByBand = Map("high" -> hi, "mid" -> mid, "low" -> lo)
    rows.foreach { r =>
      val (band, nDocs, nKept) = (r.getString(0), r.getLong(1), r.getLong(2))
      nKept should be <= nDocs
      if (modByBand(band) == 1) nKept shouldBe nDocs // keep-all band
    }
  }

  test("DSIR weights separate the target language from the rest") {
    // English is the target distribution: mean importance weight of en
    // docs must exceed that of every other language (the whole point of
    // the LLR — features common in the target and rare in the raw corpus
    // score positive). Also: weights are exact ppb-integer sums, so two
    // evaluations are bit-identical.
    val docs = graft.tables.Tables.documents(spark, sf())
      .select(col("doc_id"), col("lang"))
    val w = Sampling.qDsir(spark, sf()).join(docs, "doc_id")
    val byLang = w.groupBy(col("lang"))
      .agg(avg(col("weight")).as("mean_w"))
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val en = byLang(Sampling.DsirTargetLang)
    byLang.foreach { case (lang, m) =>
      if (lang != Sampling.DsirTargetLang)
        withClue(s"lang=$lang mean=$m en=$en") { en should be > m }
    }
    Sampling.qDsir(spark, sf()).collect().toSeq shouldBe
      Sampling.qDsir(spark, sf()).collect().toSeq
  }

  test("DSIR bucket table joins as a broadcast") {
    // the LLR table is DsirBuckets rows — if it ever shuffles the corpus
    // side on bucket instead of broadcasting, the plan regressed
    val plan = Sampling.qDsir(spark, sf())
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  test("every document lands in exactly one split under re-evaluation") {
    // the split is a pure function of doc_id: recomputing the bucket in a
    // separate plan yields identical membership (no rand(), no
    // partitioning dependence)
    val docs = graft.tables.Tables.documents(spark, sf())
    val b = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
      .cast("long") % 100
    val a = docs.select(col("doc_id"), b.as("b1"))
    val c = docs.repartition(7).select(col("doc_id"), b.as("b2"))
    val diff = a.join(c, "doc_id").filter(col("b1") =!= col("b2")).count()
    diff shouldBe 0L
  }

  test("curriculum deciles: exact histogram boundaries, no global window") {
    val docs = graft.tables.Tables.documents(spark, sf())
    val n = docs.count()
    val rows = Sampling.qCurriculum(spark, sf()).collect()
    // a partition of the corpus into value-contiguous, ordered bands
    rows.map(_.getLong(1)).sum shouldBe n
    rows.sliding(2).foreach {
      case Array(a, b) =>
        a.getLong(0) should be < b.getLong(0) // decile ascending
        a.getLong(3) should be < b.getLong(2) // max_chars < next min_chars
      case _ => ()
    }
    // decile k's cumulative count reaches ceil((k+1)·N/10) — the exact
    // boundary rule, off only by value ties (which stay in one band)
    var cum = 0L
    rows.init.foreach { r =>
      cum += r.getLong(1)
      cum should be >= ((r.getLong(0) + 1) * n + 9) / 10
    }
    // the scalable plan: no Window anywhere (ntile's shape is the point
    // of comparison)
    val plan = Sampling.qCurriculum(spark, sf())
      .queryExecution.executedPlan.toString
    plan should not include "Window"
  }
  test("q_budget_alloc: exact waterfill — allocation conserves the " +
    "budget, saturation is allocated==available, and unsaturated shares " +
    "differ by at most one char") {
    val rows = Sampling.qBudgetAlloc(spark, sf()).collect()
    val total = rows.map(_.getAs[Long]("available")).sum
    val budget = total * Sampling.AllocPct / 100
    rows.map(_.getAs[Long]("allocated")).sum shouldBe math.min(budget, total)
    rows.foreach { r =>
      r.getAs[Long]("allocated") should be <= r.getAs[Long]("available")
      (r.getAs[Long]("saturated") == 1L) shouldBe
        (r.getAs[Long]("allocated") == r.getAs[Long]("available"))
    }
    val unsat = rows.filter(_.getAs[Long]("saturated") == 0L)
      .map(_.getAs[Long]("allocated"))
    if (unsat.length > 1) (unsat.max - unsat.min) should be <= 1L
    // no unsaturated language may end below a saturated one's take
    // (waterfill level property)
    val sat = rows.filter(_.getAs[Long]("saturated") == 1L)
      .map(_.getAs[Long]("allocated"))
    if (unsat.nonEmpty && sat.nonEmpty) unsat.min should be >= sat.max
  }
  test("q_budget_alloc_w: weighted waterfill conserves the budget, " +
    "unsaturated shares are weight-proportional within one char, and " +
    "the water level separates saturated from unsaturated languages") {
    val rows = Sampling.qBudgetAllocW(spark, sf()).collect()
    val total = rows.map(_.getAs[Long]("available")).sum
    val budget = total * Sampling.AllocPct / 100
    rows.map(_.getAs[Long]("allocated")).sum shouldBe math.min(budget, total)
    rows.foreach { r =>
      r.getAs[Long]("allocated") should be <= r.getAs[Long]("available")
      (r.getAs[Long]("saturated") == 1L) shouldBe
        (r.getAs[Long]("allocated") == r.getAs[Long]("available"))
    }
    val unsat = rows.filter(_.getAs[Long]("saturated") == 0L)
      .map(r => (r.getAs[Long]("allocated"), r.getAs[Long]("weight")))
    for ((ai, wi) <- unsat; (aj, wj) <- unsat) {
      // per-weight shares equal within the one-char remainder spread
      (ai * wj - aj * wi).abs should be <= wi * wj
    }
    val sat = rows.filter(_.getAs[Long]("saturated") == 1L)
      .map(r => (r.getAs[Long]("available"), r.getAs[Long]("weight")))
    for ((av, wi) <- sat; (aj, wj) <- unsat) {
      // a saturated language sits at or below the water level
      av * wj should be <= (aj + 1L) * wi
    }
  }

  test("q_mixture_alloc: exact isqrt weights, budget conserved to the " +
    "unit, and temperature flattening boosts small sources") {
    val rows = Sampling.qMixtureAlloc(spark, sf()).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_chars"),
        r.getAs[Long]("w"), r.getAs[Long]("alloc")))
    rows.map(_._4).sum shouldBe Sampling.MixBudget
    rows.foreach { case (_, nc, w, _) =>
      w * w should be <= nc
      (w + 1) * (w + 1) should be > nc
    }
    // flattening: the smallest source's allocation share strictly exceeds
    // its mass share; the largest source's share shrinks
    val totChars = rows.map(_._2).sum
    val smallest = rows.minBy(_._2)
    val largest = rows.maxBy(_._2)
    smallest._4 * totChars should be > smallest._2 * Sampling.MixBudget
    largest._4 * totChars should be < largest._2 * Sampling.MixBudget
  }

  test("q_bootstrap: thresholds are a proper inverse CDF, the interval " +
    "brackets the point estimate, and the draw is deterministic") {
    // cumulative Poisson(1) ppm thresholds: strictly increasing, ending
    // just under 10⁶ (P(w≤7) ≈ 0.999990)
    Sampling.BootCumPpm.sliding(2).foreach { case Seq(a, b) =>
      a should be < b
    }
    Sampling.BootCumPpm.head shouldBe 367879L
    Sampling.BootCumPpm.last should be > 999980L
    Sampling.BootCumPpm.last should be < 1000000L
    val r = Sampling.qBootstrap(spark, sf()).head()
    r.getAs[Long]("n_docs") shouldBe
      graft.tables.Tables.documents(spark, sf()).count()
    r.getAs[Long]("n_boot") shouldBe Sampling.BootB.toLong
    val (lo, m, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("mean"),
      r.getAs[Double]("ci_hi"))
    lo should be < hi
    m should (be >= lo and be <= hi)
    // resampling noise is real but small: the interval is within ±20% of
    // the mean yet not collapsed onto it
    (hi - lo) should be < 0.4 * m
    (hi - lo) should be > 0.0
    // deterministic weight draw: bit-identical on re-evaluation
    Sampling.qBootstrap(spark, sf()).head() shouldBe r
  }

  test("q_bootstrap_ratio: the ratio CI brackets the point estimate, no " +
    "replicate is dropped on this corpus, and the draw is deterministic") {
    val r = Sampling.qBootstrapRatio(spark, sf()).head()
    val docs = graft.tables.Tables.documents(spark, sf())
    r.getAs[Long]("n_docs") shouldBe docs.count()
    r.getAs[Long]("n_en") shouldBe
      docs.filter(org.apache.spark.sql.functions.col("lang") === "en").count()
    r.getAs[Long]("n_en") should be > 0L
    r.getAs[Long]("n_boot") shouldBe Sampling.BootB.toLong
    val (lo, m, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ratio"),
      r.getAs[Double]("ci_hi"))
    lo should be < hi
    m should (be >= lo and be <= hi)
    // ratio of means is near 1 (one shared length distribution across
    // langs) but the interval is not collapsed
    m should (be > 0.5 and be < 2.0)
    (hi - lo) should be > 0.0
    (hi - lo) should be < 0.6 * m
    Sampling.qBootstrapRatio(spark, sf()).head() shouldBe r
  }

  test("q_group_kfold: folds partition the source set — no group " +
    "straddles a fold, and every fold is populated") {
    val rows = Sampling.qGroupKfold(spark, sf()).collect()
    rows.length shouldBe Sampling.KFolds
    val docs = graft.tables.Tables.documents(spark, sf())
    // group integrity: per-fold distinct-source counts sum to the corpus
    // total — a source in two folds would double-count here
    rows.map(_.getAs[Long]("n_sources")).sum shouldBe
      docs.select("source").distinct().count()
    rows.map(_.getAs[Long]("n_docs")).sum shouldBe docs.count()
    rows.foreach { r =>
      r.getAs[Long]("n_sources") should be >= 1L
      r.getAs[Long]("n_docs") should be >= 1L
    }
    // assignment is a pure function of the source name
    Sampling.qGroupKfold(spark, sf()).collect() shouldBe rows
  }

  test("q_bootstrap_median: all-integer outputs, CI brackets the exact " +
    "lower median, and the draw is deterministic") {
    val r = Sampling.qBootstrapMedian(spark, sf()).head()
    val docs = graft.tables.Tables.documents(spark, sf())
    r.getAs[Long]("n_docs") shouldBe docs.count()
    r.getAs[Long]("n_boot") shouldBe Sampling.BootB.toLong
    // the population lower median matches a driver-side recompute
    val vals = docs.select(org.apache.spark.sql.functions.col("n_chars"))
      .collect().map(_.getLong(0)).sorted
    r.getAs[Long]("median") shouldBe vals(((vals.length + 1) / 2) - 1)
    val (lo, m, hi) = (r.getAs[Long]("ci_lo"), r.getAs[Long]("median"),
      r.getAs[Long]("ci_hi"))
    lo should be <= hi
    m should (be >= lo and be <= hi)
    // resampling spread is real but bounded on this corpus
    (hi - lo) should be < m
    Sampling.qBootstrapMedian(spark, sf()).head() shouldBe r
  }
}
