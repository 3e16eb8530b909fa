package graft.streaming

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.streaming.Streaming.SessionState

/** Pure-function property tests for the sessionizer's absorb fold: for ANY
  * event multiset and ANY arrival order, folding must produce exactly the
  * brute-force (sort, split on gap) sessionization.
  */
class AbsorbSpec extends AnyFunSuite with Matchers {

  private val gap = 100L

  /** Ground truth: sort, then split on gaps. */
  private def brute(ts: Seq[Long]): List[SessionState] = {
    if (ts.isEmpty) return Nil
    val sorted = ts.sorted
    val out = scala.collection.mutable.ListBuffer[SessionState]()
    var cur = SessionState(sorted.head, sorted.head, 1, 1.0)
    sorted.tail.foreach { t =>
      if (t - cur.endUs > gap) { out += cur; cur = SessionState(t, t, 1, 1.0) }
      else cur = SessionState(cur.startUs, t, cur.nEvents + 1, cur.totalValue + 1.0)
    }
    (out += cur).toList
  }

  private def fold(ts: Seq[Long]): List[SessionState] =
    ts.foldLeft(List.empty[SessionState])((acc, t) => Streaming.absorb(acc, t, 1.0, gap))

  test("random event sets in random order fold to the brute-force sessions") {
    val gen = for {
      n <- Gen.choose(0, 40)
      // timestamps clustered enough that gaps, merges, and bridges all occur
      ts <- Gen.listOfN(n, Gen.choose(0L, 2000L))
    } yield ts
    for (i <- 0 until 200) {
      val ts = gen(Gen.Parameters.default, Seed(7000L + i)).get
      val want = brute(ts)
      withClue(s"events=$ts: ") {
        // arbitrary arrival order (the generated order IS a random order)
        fold(ts) shouldBe want
        // and a few other orders of the same multiset
        fold(ts.sorted) shouldBe want
        fold(ts.sorted.reverse) shouldBe want
      }
    }
  }

  test("invariant: consecutive open sessions separated by more than the gap") {
    val gen = Gen.listOfN(30, Gen.choose(0L, 1500L))
    for (i <- 0 until 100) {
      val ts = gen(Gen.Parameters.default, Seed(9000L + i)).get
      val sessions = fold(ts)
      sessions.sliding(2).foreach {
        case List(a, b) => (b.startUs - a.endUs) should be > gap
        case _ => ()
      }
      // conservation: every event lands in exactly one session
      sessions.map(_.nEvents).sum shouldBe ts.size.toLong
    }
  }

  test("exact bridge boundaries merge; one-past-gap does not") {
    // two sessions exactly gap+1 apart stay separate
    fold(Seq(0L, gap + 1)).size shouldBe 2
    // exactly gap apart merge
    fold(Seq(0L, gap)).size shouldBe 1
    // an event exactly `gap` from both neighbors bridges them into one
    fold(Seq(0L, 2 * gap, gap)).size shouldBe 1
    fold(Seq(0L, 2 * gap)).size shouldBe 2
  }
}
