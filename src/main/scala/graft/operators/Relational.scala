package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Relational operator surface over the TPC-H-ish corpus — the SURVEY §2.2
  * capability checklist expressed DataFrame-native so Catalyst owns pushdown,
  * pruning, join strategy and partial aggregation.
  *
  * Determinism conventions (see [[graft.SparkEntry]] scaladoc): exact
  * DECIMAL(…,2) arithmetic for money sums (the corpus' doubles are 2-decimal),
  * cast back to double at the end; total ORDER BY on tie-free keys.
  */
object Relational {

  /** Exact, order-independent sum of a 2-decimal double column: route the
    * addition through decimal, return double (identical bits on any engine,
    * any partitioning — the property the oracle hash compare needs).
    */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** TPC-H Q1-shaped pricing summary. Scan → filter (pushed to parquet) →
    * hash agg (partial+final) → sort. The whole plan is one
    * WholeStageCodegen span per stage at sf0.1.
    */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val disc1 = lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")
    val tax1 = lit(1).cast("decimal(4,2)") + col("l_tax").cast("decimal(4,2)")
    val ep = col("l_extendedprice").cast("decimal(12,2)")
    l.filter(col("l_shipdate") <= lit("1999-12-31").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(ep * disc1).cast("double").as("sum_disc_price"),
        sum(ep * disc1 * tax1).cast("double").as("sum_charge"),
        (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> q1Agg
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
