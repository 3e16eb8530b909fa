package graft.scale

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out utilities: bucketed co-located joins and skew-resistant
  * aggregation. These are the knobs a 100 TB deployment turns when the
  * defaults (shuffle joins + AQE) aren't enough:
  *
  *   - **Bucketing** pre-shuffles a table ONCE at write time; every later
  *     equi-join or aggregation on the bucket key runs with no Exchange at
  *     all. For fact tables joined repeatedly on the same key (lineitem ⋈
  *     orders on orderkey), this converts the dominant per-query shuffle
  *     into a one-time write cost.
  *   - **Salting** splits a hot key across `salts` sub-keys for the partial
  *     aggregate, then combines — bounding any single task's input to
  *     1/salts of the hot key. (For skewed *joins*, prefer AQE's
  *     `spark.sql.adaptive.skewJoin.enabled=true`, on by default, which
  *     splits oversized partitions at runtime without changing the query.)
  */
object Scale {

  /** Write `df` bucketed by `key` into `table` (session catalog). The
    * bucket count is the write-once knob: pick ≈ shuffle partitions of the
    * consuming queries so scans align 1:1 with reducers.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — plans as a
    * sort-merge join with ZERO Exchange when bucket counts match.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    // side-qualified keys: bare col(...) === col(...) is ambiguous when both
    // tables bucket on the same column name — the common case
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, l(leftKey) === r(rightKey))
  }

  /** Two-phase salted aggregation: partial aggregate on (keys, salt), final
    * on keys. `partials` expresses the per-salt partial aggregate; `finals`
    * must re-aggregate the partial columns (sum of sums, sum of counts…).
    * Equivalent to the direct groupBy for any algebraic aggregate, but no
    * single task ever sees more than ~1/salts of a hot key's rows.
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[Column],
      salts: Int)(
      partials: Seq[Column],
      finals: Seq[Column]): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(keys :+ col("__salt"): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys: _*)
      .agg(finals.head, finals.tail: _*)
}
