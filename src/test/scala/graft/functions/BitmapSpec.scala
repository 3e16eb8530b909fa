package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Exact bitmap distinct ([[BitmapAgg]]) + set algebra ([[BitmapCard]],
  * [[BitmapAndCard]]): semantics against countDistinct ground truth, the
  * trimmed-serialization invariant, and the loud out-of-domain failure.
  */
class BitmapSpec extends SparkSpec with Matchers {
  import Bitmaps._

  private lazy val events = graft.tables.Tables.events(spark, sf())

  test("bitmap_card equals countDistinct per group (map-side mergeable)") {
    val got = events.groupBy(col("event_type"))
      .agg(bitmapCard(bitmapAgg(col("user_id"))).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe want
  }

  test("bitmap_and_card equals the exact pairwise intersection") {
    val pairs = events.select(col("event_type"), col("user_id")).distinct()
    val want = pairs.as("a")
      .join(pairs.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("sa"), col("b.event_type").as("sb"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val segs = events.groupBy(col("event_type"))
      .agg(bitmapAgg(col("user_id")).as("bm"))
    val a = segs.select(col("event_type").as("sa"), col("bm").as("ba"))
    val b = segs.select(col("event_type").as("sb"), col("bm").as("bb"))
    val got = a.join(b, col("sa") < col("sb"))
      .select(col("sa"), col("sb"),
        bitmapAndCard(col("ba"), col("bb")).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // every pair the exact join found must match; pairs with empty
    // intersection may be absent from `want` but must then be 0 in `got`
    got.foreach { case (k, n) => n shouldBe want.getOrElse(k, 0L) }
    want.keySet.subsetOf(got.keySet) shouldBe true
  }

  test("equal sets serialize identically regardless of partitioning " +
    "(trimmed words), so bitmap equality is byte equality") {
    val one = events.coalesce(1).groupBy(col("event_type"))
      .agg(bitmapAgg(col("user_id")).as("bm"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("bm").toSeq)
      .toMap
    val many = events.repartition(7, col("user_id"))
      .groupBy(col("event_type"))
      .agg(bitmapAgg(col("user_id")).as("bm"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("bm").toSeq)
      .toMap
    many shouldBe one
  }

  test("out-of-domain ids fail loudly instead of silently truncating") {
    import spark.implicits._
    val bad = Seq(0L, 1L << Bitmaps.UserDomainBits).toDF("id")
    val ex = intercept[Exception] {
      bad.agg(bitmapAgg(col("id"))).collect()
    }
    ex.getMessage should include("outside declared domain")
  }
}
