package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Dedup operators must *find* the planted duplicate structure (recall),
  * and discriminate it from unrelated pairs — value parity with DuckDB runs
  * through the oracle gate.
  */
class DedupSpec extends SparkSpec with Matchers {

  test("exact/canonical dedup: every planted group found, with 2 exact variants") {
    val df = Dedup.qDedupExact(spark, sf()).cache()
    // identical copy collapses under md5; permuted copy joins under norm fp
    df.agg(min("n_copies")).head().getLong(0) should be >= 3L
    df.agg(max("n_exact_variants")).head().getLong(0) should be >= 2L
    df.unpersist()
    ()
  }

  test("n-gram jaccard separates near-dups from neighbors") {
    // Very short docs (1-2 tokens, 0-1 shingles) legitimately score low
    // against their tail-appended copy; assert on the distribution, which
    // is deterministic (seeded corpus, md5 hashing).
    val df = Dedup.qDedupJaccard(spark, sf()).cache()
    val row = df
      .agg(avg(col("j_dup")).as("avg_dup"), avg(col("j_next")).as("avg_next"))
      .head()
    row.getDouble(0) should be > 0.8 // near-copies stay near-identical
    row.getDouble(1) should be < 0.2 // unrelated neighbors stay dissimilar
    df.unpersist()
    ()
  }

  test("minhash-LSH recalls all high-jaccard planted pairs") {
    import spark.implicits._
    val trueJ = Dedup.qDedupJaccard(spark, sf())
      .select(col("doc_id"), col("j_dup"))
    val expected = trueJ.filter(col("j_dup") >= 0.85).count()
    expected should be > 0L
    val found = Dedup.qDedupMinhash(spark, sf())
      .filter(col("doc_b") === col("doc_a") + Dedup.PlantOffset)
      .select(col("doc_a").as("doc_id"))
      .join(trueJ.filter(col("j_dup") >= 0.85), "doc_id")
      .count()
    // r=2, b=8: P(miss) at J=0.85 is ~3e-5 — and deterministic given md5
    found shouldBe expected
  }

  test("simhash: planted near-dup hamming below unrelated-neighbor hamming") {
    val df = Dedup.qDedupSimhash(spark, sf()).cache()
    val row = df
      .agg(avg(col("ham_dup")).as("a"), avg(col("ham_next")).as("b"))
      .head()
    // near-copies flip few bits; unrelated 16-bit signatures differ by ~8
    (row.getDouble(1) - row.getDouble(0)) should be > 2.0
    df.unpersist()
    ()
  }

  test("LSH bucket-size cap drops degenerate buckets, keeps normal ones") {
    import spark.implicits._
    // a degenerate corpus: many IDENTICAL documents — every one lands in
    // the same bucket in every band, so uncapped pair generation would be
    // quadratic (n·(n-1)/2 pairs per band)
    val n = 200
    val degenerate = (0 until n)
      .map(i => (i.toLong, "the same words in the same order every time"))
      .toDF("doc_id", "text")
    val banded = Dedup.minhashBanded(
      Dedup.withHashedShingles(degenerate).select(col("doc_id"), col("hs")))

    // capped: the oversized buckets are dropped wholesale -> zero pairs
    Dedup.minhashCandidates(banded, Dedup.MaxLshBucket).count() shouldBe 0L
    // uncapped (cap >= bucket size): the quadratic blow-up this guards
    Dedup.minhashCandidates(banded, n).count() shouldBe n.toLong * (n - 1) / 2

    // and a normal-sized duplicate cluster passes through the cap intact
    val small = (0 until 3)
      .map(i => (i.toLong, "a modest duplicate cluster of three documents"))
      .toDF("doc_id", "text")
    val smallBanded = Dedup.minhashBanded(
      Dedup.withHashedShingles(small).select(col("doc_id"), col("hs")))
    Dedup.minhashCandidates(smallBanded, Dedup.MaxLshBucket)
      .count() shouldBe 3L
  }

  test("embedding LSH dedup recalls all planted identical vectors at cos=1") {
    val vecs = graft.tables.Tables.embeddings(spark, sf()).count()
    val df = Dedup.qDedupEmbedding(spark, sf()).cache()
    val planted = df.filter(col("vec_b") === col("vec_a") + Dedup.PlantOffset)
    planted.count() shouldBe vecs
    planted.agg(min("cos")).head().getDouble(0) shouldBe 1.0 +- 1e-6
    df.unpersist()
    ()
  }
}
