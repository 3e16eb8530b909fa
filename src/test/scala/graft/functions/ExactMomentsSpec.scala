package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.ExactMomentsAggregate.exactMoments

class ExactMomentsSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("moments match brute force incl. partial/merge across partitions") {
    val xs = (1L to 4000L).map(i => (i % 7, i * 31 % 1000, i % 89))
    val df = spark.createDataset(xs).toDF("g", "x", "y").repartition(8)
    val got = df
      .groupBy("g")
      .agg(exactMoments(col("x"), col("y")).as("m"))
      .orderBy("g")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
    for ((g, m) <- got) {
      val rows = xs.filter(_._1 == g)
      m(0) shouldBe rows.size.toDouble
      m(1) shouldBe rows.map(_._2).sum.toDouble
      m(2) shouldBe rows.map(_._3).sum.toDouble
      m(3) shouldBe rows.map(r => r._2 * r._2).sum.toDouble
      m(4) shouldBe rows.map(r => r._3 * r._3).sum.toDouble
      m(5) shouldBe rows.map(r => r._2 * r._3).sum.toDouble
    }
  }

  test("128-bit path: sums of squares beyond Long.MaxValue stay exact") {
    // 2000 rows of x = 3e9 → Σx² = 2000 · 9e18 = 1.8e22 ≫ 2⁶³
    val big = 3000000000L
    val df = spark.createDataset((1 to 2000).map(_ => (big, 1L))).toDF("x", "y")
    val m = df.agg(exactMoments(col("x"), col("y")).as("m"))
      .head().getSeq[Double](0)
    val want = new java.math.BigDecimal(
      java.math.BigInteger.valueOf(big).pow(2)
        .multiply(java.math.BigInteger.valueOf(2000))).doubleValue()
    m(3) shouldBe want
    m(5) shouldBe (big.toDouble * 2000) // Σxy exact in long range
  }

  test("negative inputs accumulate exactly (signed 128-bit)") {
    val rows = Seq((-5L, 3L), (7L, -2L), (-11L, -13L), (0L, 9L))
    val df = spark.createDataset(rows).toDF("x", "y")
    val m = df.agg(exactMoments(col("x"), col("y")).as("m"))
      .head().getSeq[Double](0)
    m(1) shouldBe rows.map(_._1).sum.toDouble
    m(2) shouldBe rows.map(_._2).sum.toDouble
    m(3) shouldBe rows.map(r => r._1 * r._1).sum.toDouble
    m(5) shouldBe rows.map(r => r._1 * r._2).sum.toDouble // includes -15, -14, 143
  }

  test("inputs beyond 3e9: per-term products use full 128-bit multiply") {
    // x = 5e9 → x² = 2.5e19 > Long.MaxValue: a 64-bit product would wrap
    val big = 5000000000L
    val df = spark.createDataset(Seq((big, big), (big, big))).toDF("x", "y")
    val m = df.agg(exactMoments(col("x"), col("y")).as("m"))
      .head().getSeq[Double](0)
    val want = new java.math.BigDecimal(
      java.math.BigInteger.valueOf(big).pow(2)
        .multiply(java.math.BigInteger.valueOf(2))).doubleValue()
    m(3) shouldBe want
    m(5) shouldBe want
  }

  test("linear sums crossing 2^63 stay exact (128-bit linear accumulators)") {
    // 2 rows of x = 8e18: Σx = 1.6e19 > Long.MaxValue — a plain 64-bit
    // running sum wraps negative here; Σx² = 1.28e38 still < 2¹²⁷.
    // Repartitioned so the merge path exercises the 128-bit add too.
    val big = 8000000000000000000L
    val df = spark.createDataset(Seq((big, -big), (big, -big)))
      .toDF("x", "y").repartition(2)
    val m = df.agg(exactMoments(col("x"), col("y")).as("m"))
      .head().getSeq[Double](0)
    val want = new java.math.BigDecimal(
      java.math.BigInteger.valueOf(big).multiply(java.math.BigInteger.valueOf(2)))
      .doubleValue()
    m(1) shouldBe want
    m(2) shouldBe -want
    m(5) shouldBe new java.math.BigDecimal(
      java.math.BigInteger.valueOf(big).pow(2)
        .multiply(java.math.BigInteger.valueOf(-2))).doubleValue()
  }

  test("sums beyond ±2^127 stay exact (192-bit accumulators)") {
    // 4 rows of x = Long.MaxValue, y = -x: Σx² = 4·(2⁶³-1)² ≈ 3.4·10³⁸ >
    // 2¹²⁷ ≈ 1.7·10³⁸ and Σxy ≈ -3.4·10³⁸ < -2¹²⁷ — both sides of the
    // bound the round-4 128-bit accumulator wrapped at silently.
    // Repartitioned so the 192-bit merge path crosses the bound too.
    val big = Long.MaxValue
    val df = spark.createDataset((1 to 4).map(_ => (big, -big)))
      .toDF("x", "y").repartition(2)
    val m = df.agg(exactMoments(col("x"), col("y")).as("m"))
      .head().getSeq[Double](0)
    val sq4 = new java.math.BigDecimal(
      java.math.BigInteger.valueOf(big).pow(2)
        .multiply(java.math.BigInteger.valueOf(4)))
    m(3) shouldBe sq4.doubleValue()
    m(4) shouldBe sq4.doubleValue()
    m(5) shouldBe sq4.negate().doubleValue()
    m(1) shouldBe new java.math.BigDecimal(
      java.math.BigInteger.valueOf(big)
        .multiply(java.math.BigInteger.valueOf(4))).doubleValue()
  }

  test("randomized: 192-bit accumulation equals BigInteger ground truth") {
    // adversarial carry coverage: magnitudes from 1 to Long.MaxValue with
    // random signs, split across partitions so merge paths carry too
    val rnd = new scala.util.Random(421L)
    val rows = (1 to 400).map { _ =>
      def v(): Long = {
        val mag = math.pow(2, rnd.nextDouble() * 62).toLong + 1
        val s = if (rnd.nextBoolean()) 1L else -1L
        // keep Long.MinValue out: |Long.MinValue| overflows negation, and
        // the corpus contract is pre-scaled magnitudes, not bit patterns
        s * mag
      }
      (v(), v())
    }
    val m = spark.createDataset(rows).toDF("x", "y").repartition(7)
      .agg(exactMoments(col("x"), col("y")).as("m"))
      .head().getSeq[Double](0)
    import java.math.BigInteger
    def big(f: ((Long, Long)) => BigInteger): Double =
      new java.math.BigDecimal(
        rows.map(f).foldLeft(BigInteger.ZERO)(_.add(_))).doubleValue()
    m(0) shouldBe rows.size.toDouble
    m(1) shouldBe big { case (x, _) => BigInteger.valueOf(x) }
    m(2) shouldBe big { case (_, y) => BigInteger.valueOf(y) }
    m(3) shouldBe big { case (x, _) => BigInteger.valueOf(x).pow(2) }
    m(4) shouldBe big { case (_, y) => BigInteger.valueOf(y).pow(2) }
    m(5) shouldBe big { case (x, y) =>
      BigInteger.valueOf(x).multiply(BigInteger.valueOf(y)) }
  }

  test("scale de-scaling is single-rounded (matches decimal cast)") {
    // x = 123.45 stored as 12345 cents, scale 2: Σx² must equal the double
    // of the exact decimal 12345²·n/10⁴, not (double of cents²)/1e4
    val df = spark.createDataset((1 to 3).map(_ => (12345L, 0L))).toDF("x", "y")
    val m = df.agg(exactMoments(col("x"), col("y"), xScale = 2).as("m"))
      .head().getSeq[Double](0)
    m(1) shouldBe java.math.BigDecimal.valueOf(3L * 12345L, 2).doubleValue()
    m(3) shouldBe new java.math.BigDecimal(
      java.math.BigInteger.valueOf(12345L * 12345L * 3), 4).doubleValue()
  }
}
