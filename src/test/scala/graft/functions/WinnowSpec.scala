package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.SketchExpressions.winnowedPositions

class WinnowSpec extends SparkSpec with Matchers {
  import spark.implicits._

  /** Reference implementation: literal per-window rightmost-argmin. */
  private def reference(hs: Array[Long], w: Int): Seq[Int] =
    (0 to hs.length - w).map { i =>
      (i until i + w).foldLeft(-1) { (best, j) =>
        if (best < 0 || hs(j) <= hs(best)) j else best
      }
    }.distinct

  private def winnow(hs: Seq[Long], w: Int): Seq[Int] =
    Seq(Tuple1(hs)).toDF("hs")
      .select(winnowedPositions(col("hs"), w).as("s"))
      .head().getSeq[Int](0)

  test("matches the per-window rightmost-argmin reference on random arrays") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val n = 1 + rnd.nextInt(40)
      val w = 1 + rnd.nextInt(6)
      // small value range to force ties (the rightmost rule's hard case)
      val hs = Array.fill(n)(rnd.nextInt(8).toLong)
      if (n >= w) winnow(hs.toSeq, w) shouldBe reference(hs, w)
      else winnow(hs.toSeq, w) shouldBe Seq.empty
    }
  }

  test("coverage guarantee: every full window contains a selected position") {
    val rnd = new scala.util.Random(13)
    val hs = Array.fill(500)(rnd.nextLong())
    val w = 4
    val sel = winnow(hs.toSeq, w).toSet
    (0 to hs.length - w).foreach { i =>
      withClue(s"window at $i") {
        (i until i + w).exists(sel.contains) shouldBe true
      }
    }
    // density near the theoretical 2/(w+1) on tie-free random input
    val density = sel.size.toDouble / hs.length
    density shouldBe (2.0 / (w + 1)) +- 0.1
  }

  test("all-equal input selects the rightmost of each window exactly once") {
    val n = 12
    val w = 4
    // rightmost-min of window i is i+w-1: positions w-1 .. n-1
    winnow(Seq.fill(n)(42L), w) shouldBe (w - 1 until n).toSeq
  }
}
