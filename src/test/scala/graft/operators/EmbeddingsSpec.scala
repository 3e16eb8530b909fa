package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.VectorExpressions

class EmbeddingsSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def stats(v: Seq[Float], levels: Int = 127): Seq[Double] =
    Seq(Tuple1(v)).toDF("e")
      .select(VectorExpressions.vecQuantStats(col("e"), levels).as("qs"))
      .head().getSeq[Double](0)

  test("quant stats match a driver-side reference incl. negatives") {
    val v = Seq(0.5f, -1.25f, 0.125f, 2.0f, -0.0078125f)
    val got = stats(v)
    val xs = v.map(_.toDouble)
    val maxAbs = xs.map(math.abs).max
    val scale = maxAbs / 127
    val errs = xs.map(x => math.abs(x - math.floor(x / scale + 0.5) * scale))
    got(0) shouldBe maxAbs
    got(1) shouldBe errs.max
    got(2) shouldBe errs.sum
    got(3) shouldBe xs.size.toDouble
  }

  test("zero vector quantizes exactly; max element itself has zero error") {
    stats(Seq(0f, 0f, 0f)) shouldBe Seq(0.0, 0.0, 0.0, 3.0)
    // the scale-setting element maps to exactly +/-levels, so its error is 0
    val got = stats(Seq(1.0f, -1.0f))
    got(0) shouldBe 1.0
    got(1) shouldBe 0.0
  }

  test("norms query: per-label partition of the table, bounded stats") {
    val rows = Embeddings.qEmbeddingNorms(spark, sf()).collect()
    val total = graft.tables.Tables.embeddings(spark, sf()).count()
    rows.map(_.getLong(1)).sum shouldBe total
    rows.foreach { r =>
      r.getDouble(2) should be <= r.getDouble(4) // min <= avg
      r.getDouble(4) should be <= r.getDouble(3) // avg <= max
    }
  }

  test("quantize query: errors bounded by half a quantization step") {
    val rows = Embeddings.qEmbeddingQuantize(spark, sf()).collect()
    rows should not be empty
    rows.foreach { r =>
      val (maxAbs, maxErr, meanErr) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      // |x - q*scale| <= scale/2 by construction of half-up rounding
      maxErr should be <= maxAbs / Embeddings.QuantLevels / 2 * 1.0000001
      meanErr should be <= maxErr
      meanErr should be >= 0.0
    }
  }

  test("q_embedding_cov: exact integer covariance matches a driver-local " +
    "recompute; diagonal numerators are nonnegative variances") {
    val rows = Embeddings.qEmbeddingCov(spark, sf()).collect()
    rows.length shouldBe Embeddings.CovDims * (Embeddings.CovDims + 1) / 2
    // brute-force recompute from the raw vectors
    val vecs = graft.tables.Tables.embeddings(spark, sf())
      .select(org.apache.spark.sql.functions.col("embedding")).collect()
      .map(_.getSeq[Float](0).take(Embeddings.CovDims)
        .map(x => math.floor(x.toDouble * Embeddings.DriftScale + 0.5).toLong)
        .toArray)
    val n = vecs.length.toLong
    rows.foreach { r =>
      val (i, j) = (r.getAs[Long]("i").toInt, r.getAs[Long]("j").toInt)
      val sxy = vecs.map(v => v(i) * v(j)).sum
      val si = vecs.map(_(i)).sum
      val sj = vecs.map(_(j)).sum
      withClue(s"cell ($i,$j)") {
        r.getAs[Long]("n_vecs") shouldBe n
        r.getAs[Long]("s_xy") shouldBe sxy
        r.getAs[Long]("cov_num") shouldBe n * sxy - si * sj
        if (i == j) r.getAs[Long]("cov_num") should be >= 0L
      }
    }
  }
  test("q_pca_project: the integer power iteration converges to a real " +
    "eigenvector of the exact covariance, and histogram mass conserves") {
    val rows = Embeddings.qPcaProject(spark, sf()).collect()
    rows.map(_.getAs[Long]("n_vecs")).sum shouldBe
      graft.tables.Tables.embeddings(spark, sf()).count()
    val v = (0 until Embeddings.CovDims)
      .map(i => rows.head.getAs[Long](s"v$i").toDouble).toArray
    // every row carries the same eigenvector literals
    rows.foreach { r =>
      (0 until Embeddings.CovDims).foreach(i =>
        r.getAs[Long](s"v$i").toDouble shouldBe v(i))
    }
    // rebuild the exact covariance numerators in-JVM and check that v is
    // (numerically) an eigenvector: cos(A·v, v) ≈ 1
    val cov = Embeddings.qEmbeddingCov(spark, sf()).collect()
      .map(r => (r.getAs[Long]("i").toInt, r.getAs[Long]("j").toInt) ->
        r.getAs[Long]("cov_num").toDouble).toMap
    val d = Embeddings.CovDims
    def a(i: Int, j: Int) = cov.getOrElse((math.min(i, j), math.max(i, j)), 0.0)
    val av = Array.tabulate(d)(i => (0 until d).map(j => a(i, j) * v(j)).sum)
    val cos = av.zip(v).map { case (x, y) => x * y }.sum /
      (math.sqrt(av.map(x => x * x).sum) * math.sqrt(v.map(x => x * x).sum))
    // 0.995: the synthetic corpus is near-isotropic (tiny eigen-gap), so
    // power iteration converges slowly BY THE DATA's nature; the oracle
    // pins the iteration result exactly, this bound sanity-checks that
    // the result is a genuine leading-direction estimate
    cos.abs should be > 0.995
  }

  test("q_embedding_fisher: every leading dim scores the isotropic null " +
    "(F near 1), sufficient statistics partition the table") {
    val rows = Embeddings.qEmbeddingFisher(spark, sf()).collect()
    rows.length shouldBe Embeddings.FisherDims
    val n = graft.tables.Tables.embeddings(spark, sf()).count()
    rows.foreach { r =>
      r.getAs[Long]("n_vecs") shouldBe n
      r.getAs[Long]("n_labels") shouldBe 10L
      r.getAs[Double]("within") should be > 0.0
      // isotropic synthetic labels: F stays in the ANOVA null band
      r.getAs[Double]("f") should (be > 0.05 and be < 3.0)
    }
  }
}
