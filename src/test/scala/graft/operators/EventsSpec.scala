package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class EventsSpec extends SparkSpec with Matchers {

  test("q_events_decay: weights bounded by (0, 1], exact-sum plan is a " +
    "pure aggregation (no join, no window)") {
    val rows = Events.qEventsDecay(spark, sf()).collect()
    rows.nonEmpty shouldBe true
    rows.foreach { r =>
      val n = r.getAs[Long]("n_events").toDouble
      val d = r.getAs[Double]("decayed")
      // each event's weight is in (0, 1], so 0 < decayed <= n_events
      assert(d > 0.0 && d <= n, s"decayed $d outside (0, $n]")
      val f = r.getAs[Double]("freshness")
      assert(f > 0.0 && f <= 1.0, s"freshness $f outside (0, 1]")
    }
    val plan = Events.qEventsDecay(spark, sf())
      .queryExecution.executedPlan.toString
    plan should not include "Join"
    plan should not include "Window"
    plan should include("HashAggregate")
  }

  test("sessionize: every event lands in exactly one session; gaps split") {
    val events = graft.tables.Tables.events(spark, sf())
    val sessions = Events.qEventsSessionize(spark, sf()).cache()
    // conservation: session event counts sum to the event count
    sessions.agg(sum("n_events")).head().getLong(0) shouldBe events.count()
    // sessions never exceed-gap internally: consecutive sessions of a user
    // must be separated by more than the gap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("session_idx")
    val overlapping = sessions
      .withColumn("prev_end", lag(col("session_end"), 1).over(w))
      .filter(col("prev_end").isNotNull &&
        unix_micros(col("session_start")) - unix_micros(col("prev_end")) <=
          Events.SessionGapMinutes * 60L * 1000000L)
      .count()
    overlapping shouldBe 0L
    // durations are non-negative
    sessions.filter(col("duration_us") < 0).count() shouldBe 0L
    sessions.unpersist()
    ()
  }

  test("q_session_window: the native session aggregation reproduces the " +
    "window-function sessionizer exactly, with no Window operator in plan") {
    val df = Events.qSessionWindow(spark, sf())
    val got = df.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet
    val want = Events.qEventsSessionize(spark, sf())
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("session_value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet
    want should not be empty
    got shouldBe want
    // the operator's value: a session AGGREGATION, not a per-user sort
    // window — Catalyst plans it without any Window node
    val plan = df.queryExecution.executedPlan.toString
    plan should not include "Window ["
    plan should include("MergingSessions")
  }

  test("q_retention_cohort: age-0 retention is 1.0, cells never exceed " +
    "their cohort, and active mass equals the (user, week) distinct count") {
    val rows = Events.qRetentionCohort(spark, sf()).collect()
    rows should not be empty
    rows.foreach { r =>
      r.getAs[Long]("n_active") should be <= r.getAs[Long]("cohort_n")
      r.getAs[Long]("age_weeks") should be >= 0L
      if (r.getAs[Long]("age_weeks") == 0L)
        r.getAs[Double]("retention") shouldBe 1.0
    }
    val weekUs = 604800000000L
    val distinctUw = graft.tables.Tables.events(spark, sf())
      .select(col("user_id"), expr(s"unix_micros(ts) div $weekUs"))
      .distinct().count()
    rows.map(_.getAs[Long]("n_active")).sum shouldBe distinctUw
  }

  test("q_lateness: buckets conserve the corpus; only planted-delay " +
    "events can be late, and some genuinely are") {
    val rows = Events.qLateness(spark, sf()).collect()
    val total = graft.tables.Tables.events(spark, sf()).count()
    rows.map(_.getAs[Long]("n_events")).sum shouldBe total
    rows.foreach(_.getAs[Long]("n_total") shouldBe total)
    val late = rows.filter(_.getAs[String]("bucket") != "0_ontime")
      .map(_.getAs[Long]("n_events")).sum
    // the delay plant touches exactly the event_id % 17 == 0 rows
    val planted = graft.tables.Tables.events(spark, sf())
      .filter(col("event_id") % 17 === 0).count()
    late should be > 0L
    late should be <= planted
  }

  test("funnel counts are consistent") {
    val r = Events.qEventsFunnel(spark, sf()).head()
    val (users, signed, purchased, converted) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    signed should be <= users
    purchased should be <= users
    converted should be <= signed
    converted should be <= purchased
    converted should be > 0L
  }

  test("hourly windows partition time: counts sum to total") {
    val total = graft.tables.Tables.events(spark, sf()).count()
    Events.qEventsHourly(spark, sf()).agg(sum("n")).head().getLong(0) shouldBe total
  }

  test("KMV sketch: exact under k, within theory error when saturated") {
    val rows = Events.qKmv(spark, sf()).collect()
    rows should not be empty
    rows.foreach { r =>
      val (exact, size, est) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      size should be <= Events.KmvK.toLong
      if (size < Events.KmvK) {
        // under-full sketch holds every distinct hash: the estimate IS exact
        est shouldBe exact.toDouble
      } else {
        // KMV standard error is ~1/sqrt(k-2) ≈ 12.7% at k=64; allow 4 sigma
        math.abs(est - exact) / exact should be < 0.51
      }
    }
  }

  test("sliding windows double-cover time: counts sum to 2x total") {
    // 2-hour windows hopping hourly → every event in exactly size/slide = 2
    val total = graft.tables.Tables.events(spark, sf()).count()
    Events.qEventsSliding(spark, sf())
      .agg(sum("n")).head().getLong(0) shouldBe 2 * total
  }

  test("KMV set ops: exact below saturation, planted overlap recovered, " +
    "estimates bounded sanely") {
    val r = Events.qKmvSet(spark, sf()).head()
    val (na, nb, ni) = (r.getLong(0), r.getLong(1), r.getLong(2))
    // residue-class plant: |A| = |B| = 2N/3ish, |A∩B| = class {1}
    ni should be > 0L
    ni should be < na.min(nb)
    // spec scale sits below sketch saturation: the sketch path IS exact
    r.getLong(3) should be <= Events.KmvK.toLong
    if (na + nb - ni <= Events.KmvK) {
      r.getDouble(5) shouldBe (na + nb - ni).toDouble // est_union exact
      r.getDouble(7) shouldBe ni.toDouble // est_inter exact
    }
    val j = r.getDouble(6)
    j should (be >= 0.0 and be <= 1.0)
  }

  test("densified series: full dense grid, gaps fill with exact zeros, " +
    "event mass conserved") {
    val dense = Events.qEventsDensify(spark, sf()).collect()
    val hours = dense.map(_.getTimestamp(0)).distinct.length
    val types = dense.map(_.getString(1)).distinct.length
    dense.length shouldBe hours * types // a complete grid
    // the raw rollup is sparse here (~25% hour coverage): most cells are
    // filled gaps — the condition the densify exists for
    val zeros = dense.count(_.getLong(2) == 0L)
    zeros should be > dense.length / 2
    dense.filter(_.getLong(2) == 0L)
      .foreach(_.getDouble(3) shouldBe 0.0)
    // conservation: dense totals equal the sparse rollup's
    dense.map(_.getLong(2)).sum shouldBe
      graft.tables.Tables.events(spark, sf()).count()
  }

  test("q_ivm_refresh: the incremental merge equals a from-scratch " +
    "recompute, and only delta-touched cells change") {
    val refreshed = Events.qIvmRefresh(spark, sf()).collect()
    val base = Events.qEventsHourly(spark, sf()).collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val nEvents = graft.tables.Tables.events(spark, sf()).count()
    val nDelta = graft.tables.Tables.events(spark, sf())
      .filter(col("event_id") % Events.IvmDeltaMod === Events.IvmDeltaResidue)
      .count()
    // conservation: total event mass = base + delta
    refreshed.map(_.getAs[Long]("n")).sum shouldBe nEvents + nDelta
    refreshed.foreach { r =>
      val key = (r.getTimestamp(0), r.getString(1))
      val touched = r.getAs[Long]("is_touched") == 1L
      base.get(key) match {
        case Some((n0, tv0)) if !touched =>
          // untouched cells pass through the merge bit-identical
          r.getAs[Long]("n") shouldBe n0
          r.getAs[Double]("total_value") shouldBe tv0
        case Some((n0, _)) if touched =>
          r.getAs[Long]("n") should be > n0
        case None =>
          // a cube cell with no base row can only come from the delta
          touched shouldBe true
      }
    }
    // refresh shape: a full-outer merge of two aggregated (cube-sized)
    // sides — never one re-aggregation over base ∪ delta
    val plan = Events.qIvmRefresh(spark, sf())
      .queryExecution.executedPlan.toString
    plan should include("FullOuter")
    plan should not include "Union"
  }
  test("q_event_transitions: transition mass conserves (events - first " +
    "events), rows bounded by |types|^2, p normalizes per from_type, and " +
    "the lag subtree is evaluated once") {
    val rows = Events.qEventTransitions(spark, sf()).collect()
    val ev = graft.tables.Tables.events(spark, sf())
    val nEvents = ev.count()
    val nUsers = ev.select(col("user_id")).distinct().count()
    // each user's first event has no predecessor; everything else is a
    // transition exactly once
    rows.map(_.getAs[Long]("n")).sum shouldBe nEvents - nUsers
    val nTypes = ev.select(col("event_type")).distinct().count()
    rows.length.toLong should be <= nTypes * nTypes
    rows.groupBy(_.getString(0)).values.foreach { g =>
      g.map(_.getAs[Double]("p")).sum shouldBe 1.0 +- 1e-4
    }
    // one events scan: the lag frame feeds the aggregation directly —
    // no shared uncached subtree evaluating the scan twice
    val plan = Events.qEventTransitions(spark, sf())
      .queryExecution.executedPlan.toString
    plan.sliding("Scan parquet".length).count(_ == "Scan parquet") shouldBe 1
  }

  test("q_concurrency: hourly census is bounded by the time range, peak " +
    "flags exactly the max, users never exceed sessions, and session mass " +
    "conserves") {
    val rows = Events.qConcurrency(spark, sf()).collect()
    rows.length should be > 0
    val maxN = rows.map(_.getAs[Long]("n_sessions")).max
    rows.foreach { r =>
      r.getAs[Long]("n_users") should be <= r.getAs[Long]("n_sessions")
      r.getAs[Boolean]("is_peak") shouldBe
        (r.getAs[Long]("n_sessions") == maxN)
    }
    // every session overlaps at least its own start hour, so the hourly
    // session mass is at least the session count
    val nSessions = Events.qEventsSessionize(spark, sf()).count()
    rows.map(_.getAs[Long]("n_sessions")).sum should be >= nSessions
    // the hour axis is bounded by the corpus time RANGE, not its size
    val b = graft.tables.Tables.events(spark, sf())
      .agg(min(col("ts")).as("mn"), max(col("ts")).as("mx")).head()
    val rangeHours =
      (b.getTimestamp(1).getTime - b.getTimestamp(0).getTime) / 3600000L + 2
    rows.length.toLong should be <= rangeHours
  }

  test("q_psi_drift: fixed-grid bins conserve event mass, every PSI term " +
    "is non-negative, and the total is the exact decimal sum of the " +
    "rounded terms") {
    val rows = Events.qPsiDrift(spark, sf()).collect()
    rows.length should be <= Events.PsiBins
    rows.map(r => r.getAs[Long]("n_early") + r.getAs[Long]("n_late")).sum shouldBe
      graft.tables.Tables.events(spark, sf()).count()
    val terms = rows.flatMap(r => Option(r.getAs[Any]("psi_term"))
      .map(_.asInstanceOf[Double]))
    terms.foreach(_ should be >= 0.0)
    val expectedTotal = terms.map(t => BigDecimal(t).setScale(6)).sum.toDouble
    rows.foreach(_.getAs[Double]("psi_total") shouldBe expectedTotal)
  }
  test("q_conversion_lag histogram mass equals the funnel's converted " +
    "count, lags are non-negative and bounded by the time range") {
    val rows = Events.qConversionLag(spark, sf()).collect()
    val converted = Events.qEventsFunnel(spark, sf())
      .head().getAs[Long]("n_converted")
    rows.map(_.getAs[Long]("n_users")).sum shouldBe converted
    val b = graft.tables.Tables.events(spark, sf())
      .agg(min(col("ts")).as("mn"), max(col("ts")).as("mx")).head()
    val rangeDays =
      (b.getTimestamp(1).getTime - b.getTimestamp(0).getTime) / 86400000L + 1
    rows.foreach { r =>
      r.getAs[Long]("lag_days") should be >= 0L
      r.getAs[Long]("lag_days") should be <= rangeDays
    }
  }

  test("q_user_growth: new-user mass conserves to the distinct user " +
    "count and the running total is monotone, ending at that count") {
    val rows = Events.qUserGrowth(spark, sf()).collect()
    val nUsers = graft.tables.Tables.events(spark, sf())
      .select(col("user_id")).distinct().count()
    rows.map(_.getAs[Long]("n_new")).sum shouldBe nUsers
    rows.last.getAs[Long]("n_total") shouldBe nUsers
    val totals = rows.map(_.getAs[Long]("n_total"))
    totals.zip(totals.tail).foreach { case (a, c) => a should be < c }
  }
  test("q_seasonality: per-type mass conserves, ratios average to 1 over " +
    "a full 24-hour axis, and peak flags mark exactly the max") {
    val rows = Events.qSeasonality(spark, sf()).collect()
    val byType = rows.groupBy(_.getString(0))
    val totals = graft.tables.Tables.events(spark, sf())
      .groupBy(col("event_type")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byType.foreach { case (t, g) =>
      g.map(_.getAs[Long]("n")).sum shouldBe totals(t)
      val mx = g.map(_.getAs[Long]("n")).max
      g.foreach(r =>
        r.getAs[Boolean]("is_peak") shouldBe (r.getAs[Long]("n") == mx))
      if (g.length == 24)
        g.map(_.getAs[Double]("ratio")).sum shouldBe 24.0 +- 1e-3
    }
  }
  test("q_time_join: bucketed proximity join equals the brute-force " +
    "inequality join, and the plan is an equi-join (no nested loop)") {
    val rows = Events.qTimeJoin(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("min_lag_us"))).toSet
    // independent in-JVM derivation over collected events (test scale)
    val ev = graft.tables.Tables.events(spark, sf())
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val brute = ev.filter(_._2 == "purchase")
      .flatMap { case (u, _, tp) =>
        ev.filter { case (u2, ty, te) =>
          u2 == u && ty == "error" && te > tp &&
            te - tp <= Events.TimeJoinWindowUs
        }.map { case (_, _, te) => (u, te - tp) }
      }
      .groupBy(_._1)
      .map { case (u, ls) => (u, ls.size.toLong, ls.map(_._2).min) }
      .toSet
    rows shouldBe brute
    val plan = Events.qTimeJoin(spark, sf())
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }
  test("q_interpolate: present hours pass through, imputed interior " +
    "values sit between their neighbors, and edges extrapolate nearest") {
    val rows = Events.qInterpolate(spark, sf()).collect()
    val dense = Events.qEventsDensify(spark, sf()).collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Double]("total_value"))).toMap
    rows.foreach { r =>
      val key = (r.getTimestamp(0), r.getString(1))
      val (n, tv) = dense(key)
      if (r.getAs[Long]("is_imputed") == 0L) {
        n should be > 0L
        r.getAs[Double]("tv_filled") shouldBe (math.rint(tv * 1e6) / 1e6)
      } else n shouldBe 0L
    }
    // interior imputed values are bounded by the neighbor envelope:
    // check per type that every imputed value lies within [min, max] of
    // the present values (linear interpolation cannot overshoot)
    rows.groupBy(_.getString(1)).foreach { case (_, g) =>
      val present = g.filter(_.getAs[Long]("is_imputed") == 0L)
        .map(_.getAs[Double]("tv_filled"))
      val lo = present.min
      val hi = present.max
      g.filter(_.getAs[Long]("is_imputed") == 1L).foreach { r =>
        r.getAs[Double]("tv_filled") should (be >= lo and be <= hi)
      }
    }
  }
  test("q_ewma replays the recurrence: seeds at the first observation, " +
    "matches an in-JVM fold, and stays inside the running envelope") {
    val rows = Events.qEwma(spark, sf()).collect()
    rows.length.toLong shouldBe
      Events.qEventsHourly(spark, sf()).count()
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      val sorted = g.sortBy(_.getTimestamp(1).getTime)
      var sOpt = Option.empty[Double]
      var lo = Double.MaxValue
      var hi = Double.MinValue
      sorted.foreach { r =>
        val x = r.getAs[Long]("n").toDouble
        val s = sOpt match {
          case None => x
          case Some(prev) => 0.3 * x + 0.7 * prev
        }
        sOpt = Some(s)
        lo = math.min(lo, x); hi = math.max(hi, x)
        r.getAs[Double]("ewma") shouldBe (math.rint(s * 1e6) / 1e6)
        r.getAs[Double]("ewma") should (be >= lo - 1e-6 and be <= hi + 1e-6)
      }
    }
  }

  test("q_ks_drift matches a brute-force quantized KS over collected values") {
    val rows = graft.tables.Tables.events(spark, sf())
      .select(col("value"), col("ts")).collect()
    val split = java.sql.Timestamp.valueOf(Events.PsiSplitTs)
    val binned = rows.map { r =>
      val b = math.min(Events.KsBins - 1,
        math.max(0, math.floor(r.getDouble(0) / Events.KsBinWidth).toInt))
      (b, r.getTimestamp(1).before(split))
    }
    val ne = binned.count(_._2).toLong
    val nl = binned.size - ne
    var ce = 0L; var cl = 0L; var best = -1L; var bestBin = -1
    (0 until Events.KsBins).foreach { b =>
      ce += binned.count(x => x._1 == b && x._2)
      cl += binned.count(x => x._1 == b && !x._2)
      val d = math.abs(cl * ne - ce * nl)
      if (d > best) { best = d; bestBin = b }
    }
    val r = Events.qKsDrift(spark, sf()).head()
    r.getAs[Long]("n_early") shouldBe ne
    r.getAs[Long]("n_late") shouldBe nl
    r.getAs[Long]("d_scaled") shouldBe best
    r.getAs[Long]("ks_bin") shouldBe bestBin.toLong
    r.getAs[Double]("d") shouldBe
      (math.rint(best.toDouble / (ne * nl) * 1e6) / 1e6)
  }

  test("q_changepoint matches a brute-force CUSUM over the dense hour axis") {
    val hours = graft.tables.Tables.events(spark, sf())
      .select(date_trunc("hour", col("ts")).as("h")).collect()
      .map(_.getTimestamp(0).getTime)
    val mn = hours.min; val mx = hours.max
    val hourMs = 3600L * 1000L
    val axis = (mn to mx by hourMs).toArray
    val counts = hours.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nh = axis.length.toLong
    val nt = hours.length.toLong
    var s = 0L; var best = -1L; var bestHour = 0L
    axis.zipWithIndex.foreach { case (h, i) =>
      s += counts.getOrElse(h, 0L)
      val t = math.abs(nh * s - (i + 1L) * nt)
      if (t > best) { best = t; bestHour = h }
    }
    val r = Events.qChangepoint(spark, sf()).head()
    r.getAs[Long]("n_hours") shouldBe nh
    r.getAs[Long]("n_events") shouldBe nt
    r.getAs[Long]("t_scaled") shouldBe best
    r.getAs[java.sql.Timestamp]("cp_hour").getTime shouldBe bestHour
  }

  test("q_hll_rolling: one anchor per day, first anchor sees only day one, " +
    "estimates track the exact rolling distinct") {
    val rows = Events.qHllRolling(spark, sf()).collect()
    val ev = graft.tables.Tables.events(spark, sf())
    val days = ev.select(to_date(col("ts")).as("d")).distinct().count()
    rows.length.toLong shouldBe days
    val firstDay = rows.head.getAs[java.sql.Date]("day")
    val day1Users = ev.filter(to_date(col("ts")) === lit(firstDay))
      .select("user_id").distinct().count()
    rows.head.getAs[Long]("n_exact") shouldBe day1Users
    // sketch accuracy: 4096 registers vs <=hundreds of users -> tight
    rows.foreach { r =>
      val ex = r.getAs[Long]("n_exact").toDouble
      math.abs(r.getAs[Double]("est") - ex) / ex should be < 0.1
    }
    // window is a superset of any single covered day -> monotone vs day 1
    rows.head.getAs[Long]("n_exact") should be <= rows(
      math.min(rows.length - 1, Events.HllRollDays - 1)).getAs[Long]("n_exact")
  }

  test("q_funnel_paths: path census partitions the users, shares sum to 1, " +
    "top path matches a brute-force replay") {
    val rows = Events.qFunnelPaths(spark, sf()).collect()
    val ev = graft.tables.Tables.events(spark, sf())
    rows.map(_.getAs[Long]("n_users")).sum shouldBe
      ev.select("user_id").distinct().count()
    rows.map(_.getAs[Double]("share")).sum shouldBe 1.0 +- 1e-4
    // brute-force: first PathLen event types per user from collected rows
    val paths = ev.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type")).collect()
      .groupBy(_.getLong(0))
      .map { case (_, g) =>
        g.sortBy(r => (r.getTimestamp(1).getTime, r.getLong(2)))
          .take(Events.PathLen).map(_.getString(3)).mkString(">")
      }
    val wantTop = paths.groupBy(identity).view.mapValues(_.size).toMap
    val gotTop = rows.head
    wantTop(gotTop.getString(0)).toLong shouldBe gotTop.getAs[Long]("n_users")
    wantTop.values.max.toLong shouldBe gotTop.getAs[Long]("n_users")
  }

  test("q_ab_lift matches a driver-side recomputation of the pooled t") {
    val ev = graft.tables.Tables.events(spark, sf())
      .select(col("user_id"), col("event_type"), col("value")).collect()
    def cents(v: Double): Long =
      (math.signum(v) * math.floor(math.abs(v) * 100 + 0.5)).toLong
    val perUser = ev.groupBy(_.getLong(0)).map { case (uid, g) =>
      uid -> g.filter(_.getString(1) == "purchase").map(r => cents(r.getDouble(2))).sum
    }
    def arm(uid: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(uid.toString.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 2
    }
    val byArm = perUser.groupBy { case (uid, _) => arm(uid) }
      .map { case (a, g) => a -> g.values.toSeq }
    val (c, t) = (byArm(0L), byArm(1L))
    val r = Events.qAbLift(spark, sf()).head()
    r.getAs[Long]("n_c") shouldBe c.size.toLong
    r.getAs[Long]("n_t") shouldBe t.size.toLong
    def mean(xs: Seq[Long]) = xs.sum.toDouble / xs.size
    r.getAs[Double]("mean_c") shouldBe
      (math.rint(mean(c) / 100 * 1e6) / 1e6) +- 1e-9
    val sp2 = (c.map(x => x.toDouble * x).sum - c.sum.toDouble * c.sum / c.size +
      t.map(x => x.toDouble * x).sum - t.sum.toDouble * t.sum / t.size) /
      (c.size + t.size - 2)
    val tStat = (mean(t) - mean(c)) /
      math.sqrt(sp2 * (1.0 / c.size + 1.0 / t.size))
    r.getAs[Double]("t_stat") shouldBe tStat +- 1e-5
  }

  test("q_holt matches a driver-side replay of the level+trend recurrence") {
    val hourly = graft.tables.Tables.events(spark, sf())
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val rows = Events.qHolt(spark, sf()).collect()
    rows.foreach { r =>
      val ys = hourly.filter(_._1 == r.getString(0)).sortBy(_._2).map(_._3)
      var l = ys(1).toDouble
      var b = (ys(1) - ys(0)).toDouble
      ys.drop(2).foreach { y =>
        val ln = 0.3 * y + 0.7 * (l + b)
        b = 0.1 * (ln - l) + 0.9 * b
        l = ln
      }
      r.getAs[Long]("n_hours") shouldBe ys.length.toLong
      r.getAs[Double]("level") shouldBe (math.rint(l * 1e6) / 1e6) +- 1e-9
      r.getAs[Double]("trend") shouldBe (math.rint(b * 1e6) / 1e6) +- 1e-9
      r.getAs[Double]("f3") shouldBe
        (math.rint((l + 3 * b) * 1e6) / 1e6) +- 1e-9
    }
  }

  test("q_theilsen matches a driver-side median-of-slopes replay") {
    val hours = graft.tables.Tables.events(spark, sf())
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1))).sortBy(_._1)
    def medianOf(xs: Array[Double]): Double = {
      val s = xs.sorted
      val pos = 0.5 * (s.length - 1)
      val lo = s(pos.toInt)
      val hi = s(math.ceil(pos).toInt)
      lo + (hi - lo) * (pos - math.floor(pos))
    }
    val slopes = for {
      i <- hours.indices.toArray; j <- (i + 1) until hours.length
    } yield (hours(j)._2 - hours(i)._2).toDouble /
      ((hours(j)._1 - hours(i)._1) / 3600000L)
    val slope = medianOf(slopes)
    val h0 = hours.head._1
    val intercept = medianOf(hours.map { case (h, n) =>
      n.toDouble - slope * ((h - h0) / 3600000L) })
    val r = Events.qTheilsen(spark, sf()).head()
    r.getAs[Long]("n_hours") shouldBe hours.length.toLong
    r.getAs[Long]("n_pairs") shouldBe slopes.length.toLong
    r.getAs[Double]("slope") shouldBe
      (math.rint(slope * 1e6) / 1e6) +- 1e-9
    r.getAs[Double]("intercept") shouldBe
      (math.rint(intercept * 1e6) / 1e6) +- 1e-9
  }

  test("q_attribution: credit conservation is an integer identity — " +
    "credited cents across channels equal total purchase cents") {
    val rows = Events.qAttribution(spark, sf()).collect()
    val channels = rows.map(_.getString(0)).toSet
    channels.subsetOf((Events.AttrTouchTypes :+ "direct").toSet) shouldBe true
    Events.AttrTouchTypes.toSet.subsetOf(channels) shouldBe true
    val totalCredited = rows.map(_.getAs[Long]("credited_cents")).sum
    val totalPurchase = graft.tables.Tables.events(spark, sf())
      .filter(col("event_type") === "purchase")
      .agg(sum(graft.operators.Relational.cents(col("value"))))
      .head().getLong(0)
    totalCredited shouldBe totalPurchase
    // attribution genuinely splits: touch channels carry nonzero credit
    rows.filter(r => Events.AttrTouchTypes.contains(r.getString(0)))
      .foreach(_.getAs[Long]("credited_cents") should be > 0L)
  }

  test("q_variant: the VARIANT decode path is bit-identical to the " +
    "string-path JSON derivation, and the plan actually uses it") {
    val v = Events.qVariant(spark, sf())
    v.collect().toSeq shouldBe Events.qEventsJson(spark, sf()).collect().toSeq
    val plan = v.queryExecution.executedPlan.toString.toLowerCase
    plan should include("variant")
    plan should not include "get_json_object"
  }

  test("q_cuped: adjusted means and variance ratio recompute exactly from " +
    "an in-JVM per-user replay, and the covariate genuinely reduces " +
    "variance on this corpus") {
    import org.apache.spark.sql.functions._
    val rows = Events.qCuped(spark, sf()).collect()
    rows.length shouldBe 2
    val cut = java.sql.Timestamp.valueOf(Events.CupedCut + " 00:00:00")
    val perUser = graft.tables.Tables.events(spark, sf())
      .groupBy(col("user_id"))
      .agg(
        coalesce(sum(when(col("event_type") === "purchase" &&
          col("ts") < lit(cut),
          graft.operators.Relational.cents(col("value")))), lit(0L)).as("x"),
        coalesce(sum(when(col("event_type") === "purchase" &&
          col("ts") >= lit(cut),
          graft.operators.Relational.cents(col("value")))), lit(0L)).as("y"))
      .select(graft.operators.Sampling.hashBucket(col("user_id"), 2)
        .as("arm"), col("x"), col("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pn = perUser.length.toLong
    val psx = perUser.map(_._2).sum; val psy = perUser.map(_._3).sum
    val psxy = perUser.map(t => t._2 * t._3).sum
    val psxx = perUser.map(t => t._2 * t._2).sum
    val theta = (psxy.toDouble - psx.toDouble * psy / pn) /
      (psxx.toDouble - psx.toDouble * psx / pn)
    rows.foreach { r =>
      val arm = r.getAs[Long]("arm")
      val g = perUser.filter(_._1 == arm)
      val n = g.length.toLong
      r.getAs[Long]("n_users") shouldBe n
      val sx = g.map(_._2).sum; val sy = g.map(_._3).sum
      val sxy = g.map(t => t._2 * t._3).sum
      val sxx = g.map(t => t._2 * t._2).sum
      val syy = g.map(t => t._3 * t._3).sum
      val meanY = math.round(sy.toDouble / 100.0 / n * 1e6) / 1e6
      r.getAs[Double]("mean_y") shouldBe meanY +- 1e-9
      val adj = sy.toDouble / 100.0 / n -
        theta * (sx.toDouble / 100.0 / n - psx.toDouble / 100.0 / pn)
      r.getAs[Double]("mean_y_adj") shouldBe adj +- 1e-6
      val varY = (syy.toDouble - sy.toDouble * sy / n) / (n - 1)
      val covXY = (sxy.toDouble - sx.toDouble * sy / n) / (n - 1)
      val varX = (sxx.toDouble - sx.toDouble * sx / n) / (n - 1)
      val ratio = (varY - 2 * theta * covXY + theta * theta * varX) / varY
      r.getAs[Double]("var_ratio") shouldBe ratio +- 1e-6
      // pre-randomization covariate: the adjustment cannot inflate the
      // variance materially, and on this corpus it measurably reduces it
      r.getAs[Double]("var_ratio") should be < 1.0
      r.getAs[Double]("var_ratio") should be > 0.5
    }
  }
}
