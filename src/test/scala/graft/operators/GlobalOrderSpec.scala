package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.tables.Tables

/** The distributed global-order primitives: rank/cumsum must equal the
  * single-task window truth at every partition count (boundaries affect
  * parallelism, never values), and the budget head must be the maximal
  * fitting prefix.
  */
class GlobalOrderSpec extends SparkSpec with Matchers {

  test("shuffle order is the md5 permutation: matches the window truth") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf())
    // single-task window truth — fine at spec scale, the shape the
    // operator exists to avoid at corpus scale
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val truth = docs
      .select(col("doc_id"),
        row_number().over(Window.orderBy(h, col("doc_id")))
          .cast("long").as("pos"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = GlobalOrder.qShuffleOrder(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe truth
    // a permutation: positions are exactly 1..n
    got.values.toSeq.sorted shouldBe (1L to truth.size.toLong)
  }

  test("token budget keeps the maximal fitting prefix of the shuffle order") {
    val out = GlobalOrder.qTokenBudget(spark, sf())
      .orderBy(col("pos")).collect()
    out.length should be > 0
    // contiguous prefix of the permutation
    out.map(_.getLong(0)).toSeq shouldBe (1L to out.length.toLong)
    // running sum is consistent and within budget…
    var c = 0L
    out.foreach { r =>
      c += r.getLong(2)
      r.getLong(3) shouldBe c
    }
    val total = Tables.documents(spark, sf())
      .select(sum(graft.functions.TextFunctions.bpeTokenCount(col("text"))
        .cast("long")))
      .collect()(0).getLong(0)
    c should be <= total / 2
    // …and maximal: the next doc in order would overflow it
    val n = Tables.documents(spark, sf()).count()
    if (out.length < n) {
      val nextTk = GlobalOrder.qShuffleOrder(spark, sf())
        .filter(col("pos") === (out.length + 1))
        .join(Tables.documents(spark, sf()), "doc_id")
        .select(graft.functions.TextFunctions.bpeTokenCount(col("text"))
          .cast("long"))
        .collect()(0).getLong(0)
      (c + nextTk) should be > total / 2
    }
  }

  test("PPS sample: multiplicities sum to exactly T, are proportional, " +
    "and the plan stays window-free") {
    val out = GlobalOrder.qSamplePps(spark, sf()).collect()
    out.length should be > 0
    // Σm = T exactly (the telescoping-floor identity)
    out.map(_.getLong(3)).sum shouldBe GlobalOrder.PpsProbes
    // every drawn doc's multiplicity is bounded by its share:
    // m ≤ ⌈tk·T/W⌉ (a doc can't catch more probes than spans it covers)
    val total = Tables.documents(spark, sf())
      .select(sum(graft.functions.TextFunctions.bpeTokenCount(col("text"))
        .cast("long")))
      .collect()(0).getLong(0)
    out.foreach { r =>
      val (tk, m) = (r.getLong(2), r.getLong(3))
      m should be <= (tk * GlobalOrder.PpsProbes + total - 1) / total + 1
    }
    val plan = GlobalOrder.qSamplePps(spark, sf())
      .queryExecution.executedPlan.toString
    plan should not include "Window"
  }

  test("rank plan has no global window: one range exchange, row-local rank") {
    val plan = GlobalOrder.qShuffleOrder(spark, sf())
      .queryExecution.executedPlan.toString
    // the shape this operator exists to avoid: an ORDER BY window over
    // the whole corpus (empty partition spec = all rows to one task)
    plan should not include "Window"
    plan should include("rangepartitioning")
  }
}
