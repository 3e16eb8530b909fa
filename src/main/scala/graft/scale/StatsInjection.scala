package graft.scale

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Feeds engine-computed ANALYZE-class statistics to Catalyst's cost-based
  * optimizer — the loop-closer between [[graft.operators.Relational.qTableProfile]]
  * (stats COMPUTED as a query result) / [[Scale.qJoinEstimate]] (join
  * cardinalities ESTIMATED as a query result) and the planner actually
  * USING them. The reference has no optimizer at all (SURVEY §4.1); on
  * Spark the stats surface is the session catalog: a table registered over
  * the same parquet files plus [[CatalogStatistics]] injected through
  * `alterTableStats` gives `spark.sql.cbo.enabled` sessions real
  * row counts, null counts, distinct counts, and min/max envelopes to plan
  * with — most visibly flipping a sort-merge join to broadcast when column
  * stats prove a filtered dimension side is small (spec-pinned in
  * `StatsInjectionSpec`; file-size-only estimation cannot see filter
  * selectivity, so without stats the same plan keeps the shuffle).
  *
  * Scale shape: the profile is one column-pruned pass per profiled column
  * with map-side partial aggregation (the [[graft.operators.Relational.qTableProfile]]
  * rationale), collected as ONE ROW per column — driver traffic is
  * O(#columns), never data-sized. At 100 TB this is the nightly ANALYZE
  * job; the catalog write is metadata-only.
  */
object StatsInjection {

  /** Recursive on-disk footprint: a single-file parquet is its length; a
    * directory-style parquet (what Spark itself writes) is the sum of its
    * data files' lengths.
    */
  private[graft] def fileFootprint(f: java.io.File): Long =
    if (f.isDirectory)
      Option(f.listFiles()).map(_.map(fileFootprint).sum).getOrElse(0L)
    else f.length()

  /** Catalog table name the customer profile is injected under. */
  val TableName = "graft_customer_cbo"

  /** Columns profiled and injected (integral key columns — the ones join
    * and filter estimation read).
    */
  val ProfiledCols: Seq[String] = Seq("c_custkey", "c_nationkey")

  /** (Re-)register the catalog table over `dir`'s customer parquet,
    * profile it, and inject the stats. Idempotent per (session, dir);
    * re-registration keeps Bench's warm-at-sf0.001-measure-at-sf0.1
    * session honest.
    */
  def registerWithStats(s: SparkSession, dir: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $TableName")
    s.sql(
      s"CREATE TABLE $TableName USING parquet LOCATION '$dir/customer.parquet'")
    val cust = Tables.customer(s, dir)
    // one column-pruned pass per column: groupBy(value) partial-aggregates
    // map-side to the distinct cardinality before the null/min/max fold
    val perCol = ProfiledCols.map { c =>
      val r = cust.select(col(c))
        .groupBy(col(c))
        .agg(count(lit(1)).as("cnt"))
        .agg(
          sum(when(col(c).isNull, col("cnt")).otherwise(0L)).as("n_nulls"),
          count(when(col(c).isNotNull, lit(1))).as("n_distinct"),
          sum(col("cnt")).as("row_count"),
          min(col(c)).cast("long").as("min_v"),
          max(col(c)).cast("long").as("max_v"))
        .head()
      c -> ((Option(r.getAs[Long]("n_nulls")).getOrElse(0L),
        r.getAs[Long]("n_distinct"), r.getAs[Long]("row_count"),
        r.getAs[Long]("min_v"), r.getAs[Long]("max_v")))
    }
    val rowCount = perCol.head._2._3
    val colStats = perCol.map { case (c, (nulls, distinct, _, mn, mx)) =>
      c -> CatalogColumnStat(
        distinctCount = Some(BigInt(distinct)),
        min = Some(mn.toString),
        max = Some(mx.toString),
        nullCount = Some(BigInt(nulls)),
        avgLen = Some(8L),
        maxLen = Some(8L))
    }.toMap
    // sizeInBytes: the actual file footprint (what size-only estimation
    // would also see); rowCount + colStats are what CBO adds on top.
    // Summed recursively (round-8 advisor): File.length() on a
    // DIRECTORY-style parquet returns the directory-entry size (~4096),
    // not the data footprint, which would skew the injected statistic.
    val sizeInBytes = fileFootprint(new java.io.File(s"$dir/customer.parquet"))
    s.sessionState.catalog.alterTableStats(
      TableIdentifier(TableName),
      Some(CatalogStatistics(
        BigInt(sizeInBytes), Some(BigInt(rowCount)), colStats)))
  }

  /** Registry query: run the inject path end-to-end, then read the stats
    * BACK FROM THE CATALOG — the oracle recomputes the same profile
    * directly, so a pass proves compute → inject → catalog round-trip,
    * not just compute.
    */
  def qCboStats(s: SparkSession, dir: String): DataFrame = {
    registerWithStats(s, dir)
    val st = s.sessionState.catalog
      .getTableMetadata(TableIdentifier(TableName)).stats.get
    val rows = ProfiledCols.map { c =>
      val cs = st.colStats(c)
      (c, st.rowCount.get.toLong, cs.distinctCount.get.toLong,
        cs.nullCount.get.toLong, cs.min.get.toLong, cs.max.get.toLong)
    }
    import s.implicits._
    rows.toDF("col_name", "row_count", "n_distinct", "n_nulls",
      "min_v", "max_v").orderBy("col_name")
  }
}
