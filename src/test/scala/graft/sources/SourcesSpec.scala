package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.mr.{JobSpec, MRJob, WordCount}
import graft.tables.Tables

/** Source/sink surface: the reference supports exactly text-in/TSV-out
  * (SURVEY §2.2 "Scans"); our engine adds the DataFrameReader/Writer
  * formats. Roundtrips must preserve schema + values exactly.
  */
class SourcesSpec extends SparkSpec with Matchers {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("data").toString

  test("parquet roundtrip preserves schema and values") {
    val orig = Tables.orders(spark, sf())
    val path = tmp("pq")
    orig.write.parquet(path)
    val back = spark.read.parquet(path)
    back.schema shouldBe orig.schema
    back.count() shouldBe orig.count()
    back.except(orig).count() shouldBe 0L
  }

  test("orc roundtrip preserves schema and values") {
    val orig = Tables.orders(spark, sf())
    val path = tmp("orc")
    orig.write.orc(path)
    val back = spark.read.orc(path)
    back.schema shouldBe orig.schema
    back.count() shouldBe orig.count()
    back.except(orig).count() shouldBe 0L
  }

  test("orc scan pushes filters like parquet") {
    val orig = Tables.orders(spark, sf())
    val path = tmp("orcpush")
    orig.write.orc(path)
    val plan = spark.read.orc(path)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"))
      .queryExecution.executedPlan.toString
    plan should include("PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)]")
  }

  test("csv roundtrip with header + explicit schema preserves values") {
    val orig = Tables.customer(spark, sf())
    val path = tmp("csv")
    orig.write.option("header", "true").csv(path)
    val back = spark.read
      .option("header", "true")
      .schema(orig.schema)
      .csv(path)
    back.count() shouldBe orig.count()
    back.except(orig).count() shouldBe 0L
  }

  test("json roundtrip preserves values (schema pinned — json widens ints)") {
    val orig = Tables.nation(spark, sf())
    val path = tmp("json")
    orig.write.json(path)
    val back = spark.read.schema(orig.schema).json(path)
    back.except(orig).count() shouldBe 0L
  }

  test("q_orc_roundtrip: the ORC scan gets predicate pushdown and column " +
    "pruning, and the aggregation matches the parquet-side derivation") {
    val df = graft.sources.Ingest.qOrcRoundtrip(spark, sf())
    val plan = df.queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    plan should include("orc")
    plan should include regex "PushedFilters: \\[[^\\]]*GreaterThan\\(l_quantity"
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    readSchema should not include "l_orderkey" // pruned: unused column
    // value parity with the same aggregation over the parquet table
    val want = Tables.lineitem(spark, sf())
      .filter(col("l_quantity") > 25)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    df.collect().map(r => r.getAs[String]("l_returnflag") ->
      r.getAs[Long]("n_rows")).toMap shouldBe want
  }

  test("text source: line semantics match the reference's Split contract") {
    val path = Files.createTempFile("txt", ".txt")
    Files.writeString(path, "line one\nline two\n\nlast without newline")
    val lines = MRJob.readLines(spark, JobSpec(path.toString, "", nMap = 3))
    lines.count() shouldBe 4 // empty line preserved, trailing no-newline kept
    lines.rdd.getNumPartitions shouldBe 3 // nMap pins split count
  }

  test("multi-file sorted TSV sink: part files concatenate to global order") {
    import spark.implicits._
    val kv = Seq("b" -> "2", "d" -> "4", "a" -> "1", "c" -> "3", "e" -> "5")
      .map { case (k, v) => graft.mr.KeyValue(k, v) }
    val out = Files.createTempDirectory("tsv").resolve("res")
    MRJob.writeSortedTsv(spark.createDataset(kv), out.toString, singleFile = false)
    // range-partitioned sort: reading part files in name order = total order
    val files = out.toFile.listFiles
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val lines = files.flatMap(f =>
      scala.jdk.CollectionConverters.ListHasAsScala(
        Files.readAllLines(f.toPath)).asScala)
    lines.toSeq shouldBe Seq("a\t1", "b\t2", "c\t3", "d\t4", "e\t5")
  }

  test("csv source handles quoting/escaping of separators in values") {
    import spark.implicits._
    val df = Seq((1L, "with,comma", "with\"quote"), (2L, "plain", "x"))
      .toDF("id", "a", "b")
    val path = tmp("csvq")
    df.write.option("header", "true").csv(path)
    val back = spark.read.option("header", "true").schema(df.schema).csv(path)
    back.orderBy("id").collect().map(_.toSeq).toSeq shouldBe
      df.orderBy("id").collect().map(_.toSeq).toSeq
  }
}
