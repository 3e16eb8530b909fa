package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.operators.TextAnalysis

/** Pins the mergeable quantile sketch: exactness below capacity, the
  * weight/size invariants, ε-rank error under forced compaction and
  * partition-style merges, and the query-level contract.
  */
class QuantileSketchSpec extends SparkSpec with Matchers {

  private val probs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

  /** values 0..n-1 in a deterministic scrambled order (odd multiplier
    * coprime to n ⇒ bijection).
    */
  private def scrambled(n: Int): Seq[Long] =
    (0 until n).map(i => ((i.toLong * 48271 + 11) % n + n) % n)

  test("below capacity the sketch is exact (= percentile_disc rank rule)") {
    val n = 100
    val s = new QuantileSketch(64) // 2k = 128 > n: never compacts
    scrambled(n).foreach(s.insert)
    val est = s.quantiles(probs)
    probs.zip(est).foreach { case (p, v) =>
      val t = math.ceil(p * n).toLong.max(1)
      v shouldBe (t - 1) // dataset is 0..n-1: value at rank t is t-1
    }
  }

  test("forced compaction + 16-way merge: weight invariant, bounded buffers, ε-rank error") {
    val n = 100000
    val k = 64
    val vals = scrambled(n)
    // 16 partial sketches (the partition shape), merged sequentially (the
    // final-aggregation shape)
    val parts = vals.grouped(n / 16).map { chunk =>
      val s = new QuantileSketch(k)
      chunk.foreach(s.insert)
      s
    }.toSeq
    val merged = parts.head
    parts.tail.foreach(merged.merge)
    merged.n shouldBe n
    // buffer bounds: every level ≤ 2k items, level count ~ log2(n/k)
    merged.levels.foreach(_.size should be <= 2 * k)
    merged.levels.size should be <= (math.log(n.toDouble / k) / math.log(2)).toInt + 3
    // compaction genuinely happened (otherwise this test pins nothing)
    merged.levels.size should be > 1
    val est = merged.quantiles(probs) // also asserts Σ size·2^level == n
    probs.zip(est).foreach { case (p, v) =>
      val t = math.ceil(p * n).toLong.max(1)
      val rankErr = math.abs((v + 1) - t) // rank of value v is v+1
      withClue(s"p=$p est=$v target=$t err=$rankErr: ") {
        rankErr.toDouble should be <= 0.02 * n
      }
    }
  }

  test("serialize/deserialize round-trips state exactly") {
    val s = new QuantileSketch(16)
    scrambled(5000).foreach(s.insert)
    val r = QuantileSketch.deserialize(s.serialized)
    r.n shouldBe s.n
    r.levels.map(_.toSeq) shouldBe s.levels.map(_.toSeq)
    r.alt.toSeq shouldBe s.alt.toSeq
    r.quantiles(probs).toSeq shouldBe s.quantiles(probs).toSeq
  }

  test("Spark aggregate: distributed partials with compaction stay within ε") {
    val n = 50000
    val df = spark.range(n)
      .select(pmod(col("id") * 48271 + 11, lit(n)).as("v"))
      .repartition(8)
    val est = df.agg(
      QuantileSketchAggregate.quantileSketch(col("v"), 64, probs).as("est"))
      .select(explode(col("est")).as("v")).collect().map(_.getLong(0))
    probs.zip(est).foreach { case (p, v) =>
      val t = math.ceil(p * n).toLong.max(1)
      math.abs((v + 1) - t).toDouble should be <= 0.02 * n
    }
  }

  test("q_len_quantiles_sketch: every estimate within ε of its exact rank") {
    val out = TextAnalysis.qLenQuantilesSketch(spark, sf()).collect()
    out.length should be > 0
    out.length % TextAnalysis.SketchProbs.size shouldBe 0
    all(out.map(_.getAs[Long]("within_bound"))) shouldBe 1L
    // n_docs agrees with the corpus per-source counts
    val bySource = out.groupBy(_.getAs[String]("source"))
      .view.mapValues(_.head.getAs[Long]("n_docs")).toMap
    val exact = graft.tables.Tables.documents(spark, sf())
      .groupBy(col("source")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n")).toMap
    bySource shouldBe exact
  }
}
