package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.BpeExpressions

class BpeSpec extends SparkSpec with Matchers {

  /** Reference semantics via the delimited-string replace chain — the
    * primitive the DuckDB oracle executes; the expression must agree
    * word-for-word.
    */
  private def replaceChainLen(word: String, merges: Seq[(String, String)]): Long = {
    if (word.isEmpty) return 0L
    var e = "|" + word.map(_.toString).mkString("||") + "|"
    merges.foreach { case (a, b) => e = e.replace(s"|$a||$b|", s"|$a$b|") }
    e.stripPrefix("|").stripSuffix("|").split("\\|\\|").length.toLong
  }

  private def stats(tokens: Seq[String], merges: Seq[(String, String)]): Seq[Long] = {
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(tokens)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("t",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)))))
    df.select(BpeExpressions.bpeTokenStats(col("t"), merges).as("s"))
      .head().getSeq[Long](0)
  }

  test("one exhaustive left-to-right pass per merge, merged symbol not reused as left operand") {
    // "aaa" under (a,a): |a||a||a| -> |aa||a| — 2 tokens, not 1
    stats(Seq("aaa"), Seq(("a", "a"))) shouldBe Seq(1L, 3L, 2L)
    // "aaaa" -> |aa||aa| — the pass continues AFTER the fused pair
    stats(Seq("aaaa"), Seq(("a", "a"))) shouldBe Seq(1L, 4L, 2L)
    // "abab" under (a,b): both occurrences fuse in one pass
    stats(Seq("abab"), Seq(("a", "b"))) shouldBe Seq(1L, 4L, 2L)
  }

  test("merges apply in rank order and compose into multi-level symbols") {
    // (t,h) then (th,e): "the" -> |th||e| -> |the| — 1 token
    stats(Seq("the"), Seq(("t", "h"), ("th", "e"))) shouldBe Seq(1L, 3L, 1L)
    // reversed rank order: (th,e) can never fire before th exists
    stats(Seq("the"), Seq(("th", "e"), ("t", "h"))) shouldBe Seq(1L, 3L, 2L)
  }

  test("stats accumulate across words; empty words are ignored") {
    stats(Seq("the", "cat", "", "the"), Seq(("t", "h"), ("th", "e"))) shouldBe
      Seq(3L, 9L, 5L) // the=1, cat=3, the=1
  }

  test("expression agrees with the replace-chain primitive on the trained sf0.001 vocab") {
    val merges = Bpe.trainedMerges(spark, sf())
    merges.size shouldBe Bpe.BpeNumMerges
    val words = graft.tables.Tables.documents(spark, sf())
      .select(explode(filter(split(lower(col("text")), "[^a-z]+"),
        t => org.apache.spark.sql.functions.length(t) > 0)).as("w"))
      .distinct().limit(2000).collect().map(_.getString(0))
    words should not be empty
    words.foreach { w =>
      val viaExpr = stats(Seq(w), merges)(2)
      viaExpr shouldBe replaceChainLen(w, merges)
    }
  }

  test("training is deterministic and memoized per (session, corpus)") {
    val m1 = Bpe.trainedMerges(spark, sf())
    val m2 = Bpe.trainedMerges(spark, sf())
    m2 shouldBe m1
    // rank 1 coincides with q_bpe_merges' top pair (same statistic)
    val top = TextAnalysis.qBpeMerges(spark, sf())
      .filter(col("rk") === 1).head().getString(1)
    m1.head._1 + m1.head._2 shouldBe top
  }

  test("q_bpe_apply plan: pure map + output sort — no join, no aggregation exchange") {
    val plan = Bpe.qBpeApply(spark, sf()).queryExecution.executedPlan.toString
    plan should include("bpe_token_stats")
    plan should not include "Join"
    // the ONLY exchange is the rangepartitioning of the final orderBy
    val exchanges = "Exchange".r.findAllIn(plan).size
    exchanges shouldBe 1
    plan should include("rangepartitioning")
  }

  test("q_pack_bpe plan: encode adds no exchange over q_pack's single-window shape") {
    val bpePlan = Bpe.qPackBpe(spark, sf()).queryExecution.executedPlan.toString
    val proxyPlan = Sampling.qPack(spark, sf()).queryExecution.executedPlan.toString
    bpePlan should not include "Join"
    "Exchange".r.findAllIn(bpePlan).size shouldBe
      "Exchange".r.findAllIn(proxyPlan).size
  }

  test("mergeSpec round-trips") {
    val m = Seq(("t", "h"), ("th", "e"), ("a", "n"))
    BpeExpressions.parseMergeSpec(BpeExpressions.mergeSpec(m)) shouldBe m
    BpeExpressions.parseMergeSpec("") shouldBe Seq.empty
    an[IllegalArgumentException] should be thrownBy
      BpeExpressions.parseMergeSpec("bad")
  }

  test("BpeTokenStats rejects non-string-array input") {
    val df = spark.range(1).select(array(lit(1L)).as("x"))
    an[Exception] should be thrownBy
      df.select(BpeExpressions.bpeTokenStats(col("x"), Seq(("a", "b")))).collect()
  }
}
