package graft.operators

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The bench build-attribution contract: SessionMemo.buildNanos advances
  * by (outermost) thunk evaluation time, once per materialization, and
  * never on a memo hit — graft.Bench derives the "build" column from
  * deltas of this counter around query construction.
  */
class SessionMemoSpec extends SparkSpec with Matchers {

  test("thunk time is counted once (nested builds inside the outer), never on hits") {
    val outer = new SessionMemo[Int]()
    val inner = new SessionMemo[Int]()
    val b0 = SessionMemo.buildNanos
    val v = outer.getOrElseUpdate(spark, "memo-spec-key") {
      // a nested memo materialization inside the outer thunk: its time
      // must be included in the OUTER measurement, not double-counted
      inner.getOrElseUpdate(spark, "memo-spec-key") {
        Thread.sleep(100); 1
      } + 1
    }
    v shouldBe 2
    val d = SessionMemo.buildNanos - b0
    d should be >= 90L * 1000000L // the sleep is counted…
    d should be < 190L * 1000000L // …once, not once per nesting level
    // memo hits add zero build time
    val b1 = SessionMemo.buildNanos
    outer.getOrElseUpdate(spark, "memo-spec-key")(fail("thunk re-ran"))
    inner.getOrElseUpdate(spark, "memo-spec-key")(fail("thunk re-ran"))
    SessionMemo.buildNanos shouldBe b1
  }

  test("a transiently-failing thunk is not cached: the holder retries it") {
    val m = new SessionMemo[Int]()
    var calls = 0
    def flaky(): Int = m.getOrElseUpdate(spark, "memo-spec-throw") {
      calls += 1
      if (calls == 1) throw new IllegalStateException("transient")
      7
    }
    an[IllegalStateException] should be thrownBy flaky()
    flaky() shouldBe 7 // lazy-val semantics: the failure did not poison
    flaky() shouldBe 7 // …and the success IS cached
    calls shouldBe 2
  }
}
