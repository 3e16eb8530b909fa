package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Ad-hoc sub-plan profiler: times the building blocks of the heavy dedup
  * queries so optimization targets facts, not guesses.
  * `sbt "runMain graft.tools.Profile [sfDir]"`.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(df: DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"## $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .union(Tables.documents(spark, dir).select(
        (col("doc_id") + 10000000L).as("doc_id"),
        concat(col("text"), lit(" zz yy xx ww vv")).as("text")))
    val tk = docs.withColumn("tk",
      filter(split(lower(col("text")), "[^a-z]+"), t => length(t) > 0))
    val sh = tk.withColumn("sh",
      array_distinct(when(size(col("tk")) >= 3,
        transform(sequence(lit(0), size(col("tk")) - 3),
          i => concat_ws(" ", element_at(col("tk"), i + 1),
            element_at(col("tk"), i + 2), element_at(col("tk"), i + 3))))
        .otherwise(array().cast("array<string>"))))
      .select(col("doc_id"), col("sh"))

    time("shingles only")(sh)
    val exploded = sh.select(col("doc_id"), explode(col("sh")).as("t"))
    time("shingles+explode")(exploded)
    println(exploded.queryExecution.executedPlan.treeString.take(3000))
    val barrier = sh.repartition(64).select(col("doc_id"), explode(col("sh")).as("t"))
    time("shingles+barrier+explode")(barrier)
    val hashed = exploded.withColumn("h",
      conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long"))
    time("explode+md5+conv")(hashed)
    val hashedNoConv = exploded.withColumn("h", md5(col("t")))
    time("explode+md5 (no conv)")(hashedNoConv)
    val votes = (0 until 16).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$j"))
    time("simhash sig agg")(hashed.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*))

    val sig16 = (0 until 16).map(k =>
      array_min(transform(col("sh"), x => md5(concat(lit(s"$k|"), x)))).as(s"m$k"))
    time("minhash 16xtransform(md5)")(
      sh.filter(size(col("sh")) > 0).select(col("doc_id") +: sig16: _*))

    val hs = sh.filter(size(col("sh")) > 0)
      .withColumn("hs", transform(col("sh"),
        x => conv(substring(md5(x), 1, 15), 16, 10).cast("long")))
    val affine = (0 until 16).map { k =>
      val a = 2 * k + 1
      val b = 104729 * (k + 1)
      array_min(transform(col("hs"),
        h => (lit(a) * (h % 2147483647L) + b) % 2147483647L)).as(s"m$k")
    }
    time("minhash md5-once + affine")(
      hs.select(col("doc_id") +: affine: _*))

    spark.stop()
  }
}
