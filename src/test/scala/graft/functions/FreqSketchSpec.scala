package graft.functions

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Misra–Gries frequent-items sketch: the n/(k+1) error bound and the
  * candidate-superset guarantee under arbitrary partitioning and merge
  * order — the properties `q_heavy_hitters`' two-pass scheme relies on.
  */
class FreqSketchSpec extends AnyFunSuite with Matchers {

  private def exactCounts(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("no eviction below capacity: counts exact, candidates = distinct items") {
    val s = new FreqSketch(16)
    val xs = Seq("a", "b", "a", "c", "a", "b")
    xs.foreach(s.insert)
    s.candidates.toSeq shouldBe Seq("a", "b", "c")
    s.lowerBound("a") shouldBe 3L
    s.lowerBound("b") shouldBe 2L
    s.lowerBound("c") shouldBe 1L
    s.lowerBound("zzz") shouldBe 0L
  }

  test("single-stream bound: true - n/(k+1) <= counter <= true") {
    val rnd = new Random(7)
    val k = 8
    // Zipf-ish: item i has weight ~ 1/(i+1)
    val xs = Seq.fill(20000) {
      val i = math.min((1.0 / (rnd.nextDouble() + 1e-9)).toInt, 200)
      s"w$i"
    }
    val s = new FreqSketch(k)
    xs.foreach(s.insert)
    val exact = exactCounts(xs)
    val slack = xs.size.toLong / (k + 1)
    for ((w, c) <- exact) {
      s.lowerBound(w) should be <= c
      s.lowerBound(w) should be >= c - slack
    }
    // every item above the guarantee threshold is tracked
    for ((w, c) <- exact if c > slack) s.candidates should contain(w)
    s.candidates.length should be <= k
  }

  test("merge bound holds under random partitioning and random merge trees") {
    val rnd = new Random(41)
    val k = 12
    val xs = Seq.fill(30000) {
      val i = math.min((1.0 / (rnd.nextDouble() + 1e-9)).toInt, 500)
      s"w$i"
    }
    val exact = exactCounts(xs)
    val slack = xs.size.toLong / (k + 1)
    for (trial <- 0 until 5) {
      val r2 = new Random(100 + trial)
      // random partition count and boundaries
      val parts = r2.shuffle(xs).grouped(1 + r2.nextInt(4000)).toSeq
      val sketches = parts.map { p =>
        val s = new FreqSketch(k)
        p.foreach(s.insert)
        s
      }
      // random merge order (sequential fold over a shuffled list is an
      // arbitrary left-deep tree; mergeability must not care)
      val merged = r2.shuffle(sketches).reduce { (a, b) => a.merge(b); a }
      merged.n shouldBe xs.size.toLong
      merged.candidates.length should be <= k
      for ((w, c) <- exact) {
        merged.lowerBound(w) should be <= c
        merged.lowerBound(w) should be >= c - slack
      }
      for ((w, c) <- exact if c > slack) merged.candidates should contain(w)
    }
  }

  test("serde round-trips state exactly") {
    val rnd = new Random(3)
    val s = new FreqSketch(6)
    Seq.fill(5000)(s"w${rnd.nextInt(40)}").foreach(s.insert)
    val back = FreqSketch.deserialize(s.serialized)
    back.n shouldBe s.n
    back.candidates.toSeq shouldBe s.candidates.toSeq
    back.candidates.foreach(w => back.lowerBound(w) shouldBe s.lowerBound(w))
    // a deserialized sketch keeps merging correctly
    val other = new FreqSketch(6)
    Seq.fill(100)("fresh").foreach(other.insert)
    back.merge(other)
    back.n shouldBe s.n + 100
    back.candidates should contain("fresh")
  }
}
