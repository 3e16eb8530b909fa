package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pure contract-line machinery — no SparkSession. */
class BenchSpec extends AnyFunSuite with Matchers {

  test("stage-10 family-key squeeze terminates and stays injective on " +
    "vowel-squeeze twins (cbo/cube, kanon/knn spun the first build forever)") {
    val fams =
      Seq("cbo", "cube", "kanon", "knn", "dedup", "ann", "join", "stream")
    val out = Bench.familyShortKeys(fams)
    out.values.toSeq.distinct.size shouldBe fams.size
    // squeeze-twins keep their raw (distinct) names
    out("cbo") shouldBe "cbo"
    out("cube") shouldBe "cube"
    out("kanon") shouldBe "kanon"
    out("knn") shouldBe "knn"
    // non-twins actually shrink
    out("dedup").length should be <= 3
  }

  test("canary basket: five distinct registered steady queries with " +
    "injective 2-char keys (the normalization divisor must never read a " +
    "missing or self-caching query)") {
    val b = Bench.CanaryBasket
    b.size shouldBe 5
    b.map(_._1).distinct.size shouldBe 5
    b.map(_._2).distinct.size shouldBe 5
    all(b.map(_._1).map(_.length)) shouldBe 2
    for ((_, q) <- b) {
      withClue(s"$q must be registered: ")(
        SparkEntry.queries.contains(q) shouldBe true)
      // a self-caching member would be re-measured with cleared caches,
      // making the divisor track build cost instead of the host — checked
      // against the REAL set, not a copy that can go stale
      withClue(s"$q must not be self-caching: ")(
        Bench.selfCaching.contains(q) shouldBe false)
    }
  }

  test("post-suite probes: registered, non-self-caching, distinct (a " +
    "self-caching probe would read a cache-cleared rebuild, not the " +
    "in-suite anomaly it exists to re-test after the suite)") {
    val p = Bench.PostProbes
    p.distinct.size shouldBe p.size
    for (q <- p) {
      withClue(s"$q must be registered: ")(
        SparkEntry.queries.contains(q) shouldBe true)
      withClue(s"$q must not be self-caching: ")(
        Bench.selfCaching.contains(q) shouldBe false)
    }
  }

  test("clearsCache: a subset of selfCaching containing exactly the " +
    "persisted-lineage members (r14 scoped-clear fix — a clearsCache " +
    "entry outside selfCaching would clear caches for a memoized query " +
    "whose pass-2 timing then silently includes rebuild cost)") {
    Bench.clearsCache.subsetOf(Bench.selfCaching) shouldBe true
    Bench.clearsCache shouldBe Set("q_dedup_minhash", "q_dedup_pipeline")
  }

  test("in-suite strip: the strip query is a registered, non-self-caching " +
    "basket member (a self-caching strip would pay a cache-cleared rebuild " +
    "~23 times per run; an unregistered one would silently disable the " +
    "v3 segment rule)") {
    SparkEntry.queries.contains(Bench.StripQuery) shouldBe true
    Bench.selfCaching.contains(Bench.StripQuery) shouldBe false
    Bench.CanaryBasket.map(_._2) should contain(Bench.StripQuery)
    Bench.StripEvery should be > 0
  }

  test("host gauge: emits exactly the five documented fields, and the " +
    "cumulative PSI totals never run backwards between samples (the " +
    "per-segment delta arithmetic in tools/adjudicate.py relies on it)") {
    val g1 = Bench.hostGauge()
    val g2 = Bench.hostGauge()
    g1.map(_._1) shouldBe Seq("mem_mb", "load1m", "cpu_stall_us",
      "mem_stall_us", "io_stall_us")
    val (m1, m2) = (g1.toMap, g2.toMap)
    for (k <- Seq("cpu_stall_us", "mem_stall_us", "io_stall_us"))
      if (m1(k) >= 0 && m2(k) >= 0) m2(k) should be >= m1(k)
    // every field is -1 (file absent) or a plausible reading — a parse
    // slip would surface as a garbage magnitude here
    m1("mem_mb") should be >= -1L
    m1("load1m") should be >= -1L
  }

  test("stage-10 squeeze holds over the live registry's family set") {
    def fam(k: String) = {
      val b = if (k.startsWith("q_")) k.substring(2) else k
      b.takeWhile(_ != '_')
    }
    val real = SparkEntry.queries.keys.toSeq.map(fam).distinct.sorted
    real.size should be > 100
    val out = Bench.familyShortKeys(real)
    out.values.toSeq.distinct.size shouldBe real.size
  }
}
