package graft.scale

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.tables.Tables

class StatsInjectionSpec extends SparkSpec with Matchers {

  test("injected catalog stats flip a filtered-dim join from sort-merge " +
    "to broadcast under CBO; size-only estimation keeps the shuffle") {
    StatsInjection.registerWithStats(spark, sf())
    // size-only estimation sees the 6.9 KB file scaled by the pruned
    // column-width ratio (~1.4 KB); CBO + stats sees ~10 rows (~200 B).
    // 512 sits between the two regimes.
    val threshold = 512
    def plan(): String = {
      val dim = spark.table(StatsInjection.TableName)
        .filter(col("c_custkey") <= 10)
        .select(col("c_custkey"), col("c_nationkey"))
      val fact = Tables.orders(spark, sf())
        .select(col("o_custkey"), col("o_totalprice"))
      fact.join(dim, col("o_custkey") === col("c_custkey"))
        .queryExecution.executedPlan.toString
    }
    val old = (spark.conf.get("spark.sql.cbo.enabled", "false"),
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      // size-only estimation: the filter cannot shrink the estimate, the
      // 6.9 KB file exceeds the threshold, the join keeps its shuffle
      spark.conf.set("spark.sql.cbo.enabled", "false")
      plan() should include("SortMergeJoin")
      // CBO + injected rowCount/min/max: filter selectivity proves the
      // dim side is ~10 rows -> below threshold -> broadcast
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val withStats = plan()
      withStats should include("BroadcastHashJoin")
      withStats should not include "SortMergeJoin"
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", old._1)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old._2)
    }
  }

  test("q_cbo_stats round-trips the computed profile through the catalog") {
    val rows = StatsInjection.qCboStats(spark, sf()).collect()
    rows.map(_.getString(0)).toSeq shouldBe Seq("c_custkey", "c_nationkey")
    val cust = Tables.customer(spark, sf())
    val n = cust.count()
    val custkey = rows(0)
    custkey.getLong(1) shouldBe n
    custkey.getLong(2) shouldBe
      cust.select(countDistinct(col("c_custkey"))).head().getLong(0)
    custkey.getLong(3) shouldBe 0L
    custkey.getLong(4) shouldBe
      cust.agg(min(col("c_custkey"))).head().getLong(0)
    custkey.getLong(5) shouldBe
      cust.agg(max(col("c_custkey"))).head().getLong(0)
  }
  test("fileFootprint sums a directory-style parquet recursively; a " +
    "single file is its length") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_footprint")
    val f1 = tmp.resolve("part-0.parquet")
    val f2 = tmp.resolve("sub")
    java.nio.file.Files.createDirectory(f2)
    java.nio.file.Files.write(f1, Array.fill[Byte](100)(1))
    java.nio.file.Files.write(f2.resolve("part-1.parquet"),
      Array.fill[Byte](50)(2))
    StatsInjection.fileFootprint(f1.toFile) shouldBe 100L
    // a directory is the recursive sum of its files, never the ~4096-byte
    // directory entry File.length() reports (round-8 advisor)
    StatsInjection.fileFootprint(tmp.toFile) shouldBe 150L
  }
}
