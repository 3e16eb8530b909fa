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

  test("property: buffer algebra matches Set semantics under random ids, " +
    "random partitioning, and serialize/deserialize round-trips") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.LongType
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed

    val bits = 12 // 4096-id domain keeps the property fast
    val agg = BitmapAgg(BoundReference(0, LongType, nullable = false), bits)
    def bitmapOf(ids: Seq[Long], splits: Int): Array[Byte] = {
      // partition the stream, build partial buffers, merge — the
      // distributed shape in miniature
      val parts = ids.grouped(math.max(1, ids.size / math.max(splits, 1)))
        .map { chunk =>
          val b = agg.createAggregationBuffer()
          chunk.foreach(id => agg.update(b, InternalRow(id)))
          // each partial crosses a (de)serialization boundary like a
          // shuffle would
          agg.deserialize(agg.serialize(b))
        }.toSeq
      val merged = parts.foldLeft(agg.createAggregationBuffer())(agg.merge)
      agg.eval(merged).asInstanceOf[Array[Byte]]
    }
    def card(bm: Array[Byte]): Long =
      BitmapCard(BoundReference(0, org.apache.spark.sql.types.BinaryType,
        nullable = false)).nullSafeEval(bm).asInstanceOf[Long]

    val idsGen = for {
      n <- Gen.choose(0, 300)
      ids <- Gen.listOfN(n, Gen.choose(0L, (1L << bits) - 1))
    } yield ids
    for (i <- 0 until 25) {
      val ids = idsGen(Gen.Parameters.default, Seed(7L + i)).get
      val other = idsGen(Gen.Parameters.default, Seed(1007L + i)).get
      val splits = 1 + i % 5
      val (bmA, bmB) = (bitmapOf(ids, splits), bitmapOf(other, 6 - splits))
      val (sa, sb) = (ids.toSet, other.toSet)
      withClue(s"case $i: ") {
        card(bmA) shouldBe sa.size.toLong
        // partitioning must not change the emitted bytes (trim invariant)
        bmA.toSeq shouldBe bitmapOf(scala.util.Random.javaRandomToRandom(
          new java.util.Random(i)).shuffle(ids), splits % 3 + 1).toSeq
        BitmapAndCard(
          BoundReference(0, org.apache.spark.sql.types.BinaryType, false),
          BoundReference(1, org.apache.spark.sql.types.BinaryType, false))
          .nullSafeEval(bmA, bmB) shouldBe sa.intersect(sb).size.toLong
        BitmapOrCard(
          BoundReference(0, org.apache.spark.sql.types.BinaryType, false),
          BoundReference(1, org.apache.spark.sql.types.BinaryType, false))
          .nullSafeEval(bmA, bmB) shouldBe sa.union(sb).size.toLong
      }
    }
  }

  test("out-of-domain ids fail loudly instead of silently truncating") {
    import spark.implicits._
    val bad = Seq(0L, 1L << Bitmaps.UserDomainBits).toDF("id")
    val ex = intercept[Exception] {
      bad.agg(bitmapAgg(col("id"))).collect()
    }
    ex.getMessage should include("outside declared domain")
  }

  test("non-bitmap BINARY fails loudly in the cardinality expressions — " +
    "an HLL/KMV sketch's bytes must not popcount to a meaningless number") {
    import spark.implicits._
    // 16 bytes that are word-aligned but lack the BM header (a sketch
    // payload shape)
    val fake = Seq(Array.fill[Byte](16)(0x5A)).toDF("b")
    val exCard = intercept[Exception] {
      fake.select(bitmapCard(col("b"))).collect()
    }
    exCard.getMessage should include("BM header")
    val exAnd = intercept[Exception] {
      fake.select(bitmapAndCard(col("b"), col("b"))).collect()
    }
    exAnd.getMessage should include("BM header")
    val exOr = intercept[Exception] {
      fake.select(bitmapOrCard(col("b"), col("b"))).collect()
    }
    exOr.getMessage should include("BM header")
    // a real bitmap still passes end-to-end through all three
    val ok = Seq(1L, 5L, 5L, 99L).toDF("id")
      .agg(bitmapAgg(col("id")).as("bm"))
      .select(bitmapCard(col("bm")).as("c"),
        bitmapAndCard(col("bm"), col("bm")).as("a"),
        bitmapOrCard(col("bm"), col("bm")).as("o"))
      .collect()(0)
    (ok.getLong(0), ok.getLong(1), ok.getLong(2)) shouldBe ((3L, 3L, 3L))
  }
}
