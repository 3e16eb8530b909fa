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
