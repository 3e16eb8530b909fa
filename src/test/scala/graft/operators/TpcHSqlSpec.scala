package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.tables.Tables

/** Cross-dialect proof for the TPC-H suite: every oracle SQL string is
  * written in the ANSI subset BOTH engines parse, so the exact text the
  * DuckDB gate runs must also run VERBATIM through `spark.sql` and
  * reproduce the DataFrame plan's result bit-for-bit. This buys two
  * guarantees the DataFrame-vs-DuckDB gate alone doesn't:
  *   - the oracle text is a faithful specification of the query (not a
  *     coincidentally-agreeing reformulation), and
  *   - Catalyst's own subquery machinery (correlated scalar MIN in Q2,
  *     correlated SUM in Q20, EXISTS/NOT-EXISTS in Q4/Q21/Q22, NOT IN in
  *     Q16, scalar MAX in Q15/Q17) decorrelates the canonical workload —
  *     the SQL-only user path handles all of TPC-H, not just the
  *     generator rows q_sql_* pinned.
  */
class TpcHSqlSpec extends SparkSpec with Matchers {

  /** TPC-H queries across both modules (TpcH + the five in Relational). */
  private val names: Seq[String] =
    (TpcH.queries.keys ++ Relational.queries.keys.filter(_.startsWith("q_tpch_")))
      .toSeq.sorted

  private def registerViews(): Unit =
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem"))
      Tables.load(spark, sf(), t).createOrReplaceTempView(t)

  /** Rows as a canonical sorted multiset over name-sorted columns. */
  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(_.toString).sorted.toSeq
  }

  test("every TPC-H oracle SQL runs verbatim on Spark SQL and matches the " +
    "DataFrame plan bit-for-bit") {
    registerViews()
    val all = TpcH.queries ++ Relational.queries
    val sqls = TpcH.oracleSql ++ Relational.oracleSql
    for (name <- names) {
      withClue(s"$name: ") {
        val viaSql = canon(spark.sql(sqls(name)))
        val viaDf = canon(all(name)(spark, sf()))
        viaSql should have size viaDf.size.toLong
        viaSql shouldBe viaDf
      }
    }
  }

  test("Catalyst decorrelates the subquery-bearing TPC-H SQL — no " +
    "cartesian product survives planning") {
    registerViews()
    val sqls = TpcH.oracleSql ++ Relational.oracleSql
    for (name <- Seq("q_tpch_q2", "q_tpch_q4", "q_tpch_q16", "q_tpch_q17",
      "q_tpch_q20", "q_tpch_q21")) {
      withClue(s"$name: ") {
        val plan = spark.sql(sqls(name)).queryExecution.executedPlan.toString
        plan should not include "CartesianProduct"
      }
    }
  }
}
