package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway optimization probe (r14) — NOT part of the registry. */
object Scratch {
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
    import graft.scale.Scale
    import graft.tables.Tables

    def time(label: String)(df: DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"## $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }

    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"))
    time("scan only")(li)
    // 4 md5 probe positions, no bloom array, no join
    def pos(key: String, j: Int): String =
      s"CAST(conv(substring(md5(concat(CAST($key AS STRING), '#$j')), 1, 15), 16, 10) AS BIGINT) % ${Scale.BloomFprBits}"
    val posSum = (0 until Scale.BloomFprHashes)
      .map(j => s"(${pos("l_orderkey", j)})").mkString(" + ")
    time("4x md5 positions, agg")(li.selectExpr(s"$posSum AS p").agg(sum(col("p"))))
    // 8x (duplicate-eval shape)
    val posSum8 = ((0 until Scale.BloomFprHashes) ++ (0 until Scale.BloomFprHashes))
      .map(j => s"(${pos("l_orderkey", j)})").mkString(" + ")
    time("8x md5 positions, agg")(li.selectExpr(s"$posSum8 AS p").agg(sum(col("p"))))
    // full pass expr with bloom literal, no join
    val keys = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 300000)
      .select(col("o_orderkey").as("k")).distinct()
    val wordRows = keys
      .select(explode(array((0 until Scale.BloomFprHashes)
        .map(j => expr(pos("k", j))): _*)).as("p"))
      .select(expr("p div 32").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))").as("b"))
      .groupBy(col("w")).agg(expr("bit_or(b)").as("bits"))
      .collect()
    val words = new Array[Long]((Scale.BloomFprBits / 32).toInt)
    wordRows.foreach(r => words(r.getAs[Long]("w").toInt) = r.getAs[Long]("bits"))
    val passSql = (0 until Scale.BloomFprHashes).map { j =>
      val p = pos("l_orderkey", j)
      s"(element_at(bf, CAST(($p) div 32 AS INT) + 1) & " +
        s"shiftleft(CAST(1 AS BIGINT), CAST(($p) % 32 AS INT))) != 0"
    }.mkString(" AND ")
    val withPass = li.withColumn("bf", typedLit(words.toSeq))
      .withColumn("pass", expr(passSql))
    time("pass expr, agg")(withPass.agg(sum(when(col("pass"), 1L).otherwise(0L))))
    time("join only")(li.join(broadcast(keys), col("l_orderkey") === col("k"), "left_outer")
      .agg(sum(when(col("k").isNotNull, 1L).otherwise(0L))))
    val md5Only = (0 until 4)
      .map(j => s"length(md5(concat(CAST(l_orderkey AS STRING), '#$j')))")
      .mkString(" + ")
    time("4x md5 only, agg")(li.selectExpr(s"$md5Only AS p").agg(sum(col("p"))))
    val convOnly = (0 until 4)
      .map(j => s"CAST(conv(substring(concat(CAST(l_orderkey AS STRING), '$j'), 1, 6), 16, 10) AS BIGINT)")
      .mkString(" + ")
    time("4x conv only, agg")(li.selectExpr(s"$convOnly AS p").agg(sum(col("p"))))
    val sub = (0 until 4)
      .map(j => s"length(substring(md5(concat(CAST(l_orderkey AS STRING), '#$j')), 1, 15))")
      .mkString(" + ")
    time("4x md5+substr, agg")(li.selectExpr(s"$sub AS p").agg(sum(col("p"))))
    val mp60 = graft.functions.SketchExpressions.md5Prefix60(
      array((0 until 4).map(j =>
        concat(col("l_orderkey").cast("string"), lit(s"#$j"))): _*))
    time("md5Prefix60 x4, agg")(
      li.select(mp60.as("hs")).select(explode(col("hs")).as("h")).agg(sum(col("h"))))
    time("full qBloomFpr")(Scale.qBloomFpr(spark, dir))
    spark.stop()
  }
}
