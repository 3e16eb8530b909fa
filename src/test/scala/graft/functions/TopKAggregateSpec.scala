package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKAggregateSpec extends SparkSpec {

  test("min_k equals slice(sort_array(collect_list)) across partitions") {
    import spark.implicits._
    // many groups, shuffled insertion order, forced multi-partition input so
    // partial-buffer merge paths run
    val rows = (0 until 5000).map { i =>
      (s"g${i % 7}", ((i * 2654435761L) % 100000L))
    }
    val df = rows.toDF("g", "v").repartition(8)
    val got = df.groupBy("g")
      .agg(TopKAggregate.minK(col("v"), 10).as("topk"))
    val want = df.groupBy("g")
      .agg(slice(sort_array(collect_list(col("v"))), 1, 10).as("topk"))
    assert(got.orderBy("g").collect().toSeq === want.orderBy("g").collect().toSeq)
  }

  test("min_k_distinct equals slice(array_sort(array_distinct)) and is " +
    "partitioning-invariant") {
    import spark.implicits._
    // heavy duplication so dedup actually matters: 5000 rows over ~40
    // distinct values per group
    val rows = (0 until 5000).map { i =>
      (s"g${i % 5}", ((i * 2654435761L) % 40L))
    }
    val want = rows.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.sorted.take(8)).toMap
    for (parts <- Seq(1, 3, 16)) {
      val got = rows.toDF("g", "v").repartition(parts).groupBy("g")
        .agg(TopKAggregate.minKDistinct(col("v"), 8).as("k"))
        .collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
      assert(got === want, s"at $parts partitions")
    }
  }

  test("min_k_distinct: duplicates never occupy sketch slots") {
    import spark.implicits._
    // 3 distinct values, each repeated 100x, k=4: result must be all 3
    // values, not 4 copies from the duplicate stream
    val df = (0 until 300).map(i => ("g", (i % 3).toLong)).toDF("g", "v")
      .repartition(5)
    val got = df.groupBy("g")
      .agg(TopKAggregate.minKDistinct(col("v"), 4).as("k"))
      .head().getSeq[Long](1)
    assert(got.toSeq === Seq(0L, 1L, 2L))
  }

  test("min_k_distinct: random streams, random buffer splits, and serde " +
    "round-trips all agree with distinct.sorted.take(k)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.LongType
    for (seed <- 0 until 20) {
      val rnd = new scala.util.Random(100 + seed)
      val k = 1 + rnd.nextInt(16)
      val n = rnd.nextInt(400)
      // small value domain forces heavy duplication
      val values = Seq.fill(n)(rnd.nextInt(60).toLong)
      val agg = MinKDistinctLongs(BoundReference(0, LongType, nullable = true), k)
      // random partial-buffer split (the shuffle's map-side shape), each
      // buffer serde-round-tripped before merging (the wire shape)
      val chunks = if (values.isEmpty) Seq(Seq.empty[Long])
        else values.grouped(1 + rnd.nextInt(values.size)).toSeq
      val buffers = chunks.map { chunk =>
        val b = chunk.foldLeft(agg.createAggregationBuffer()) { (b, v) =>
          agg.update(b, InternalRow(v))
        }
        agg.deserialize(agg.serialize(b))
      }
      val merged = buffers.reduceLeft(agg.merge)
      val got = agg.eval(merged).asInstanceOf[ArrayData].toLongArray.toSeq
      assert(got === values.distinct.sorted.take(k), s"seed=$seed k=$k n=$n")
    }
  }

  test("groups smaller than k return all values sorted; nulls are skipped") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(5L)), ("a", Some(1L)), ("a", None),
      ("b", Some(9L))).toDF("g", "v")
    val got = df.groupBy("g")
      .agg(TopKAggregate.minK(col("v"), 4).as("topk"))
      .orderBy("g")
      .collect()
      .map(r => (r.getString(0), r.getSeq[Long](1)))
    assert(got.toSeq === Seq(("a", Seq(1L, 5L)), ("b", Seq(9L))))
  }
}
