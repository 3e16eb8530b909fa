package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Host/domain-level curation — the stage a real crawl pipeline runs
  * BEFORE content dedup: per-domain document budgets (no single host may
  * dominate the corpus) and domain blocklists, with a per-host ledger
  * recording what was kept, capped, and blocked (the takedown-auditable
  * artifact, same governance posture as `q_delete_cascade`).
  *
  * The fixture schema has no URL column (FIXTURES.md), so the host is a
  * DERIVED convention — the same move as [[Dedup.qDedupLines]]'s derived
  * lines: `host_id = floor(sqrt(md5₆₀(doc_id ∥ "#host") mod 1024))`, a
  * deterministic map onto [[HostCount]] hosts whose mass is intentionally
  * SKEWED (P(host k) ∝ 2k+1 — heavy hosts exist, as in any real crawl),
  * reproduced verbatim by the DuckDB oracle. The operator logic is the
  * point, not the fixture.
  *
  * Scale shape: the ledger is ONE map-side-combined aggregation to a
  * |hosts|-sized frame. Cap enforcement NEVER sorts per host through a
  * window (`row_number() OVER (PARTITION BY host)` funnels each host's
  * rows through one task — the round-5 weak class the oracle is allowed
  * to use precisely because it is the shape being avoided): the kept set
  * is `min_k(doc_id, cap)` — a bounded-buffer [[graft.functions.TopKAggregate]]
  * aggregate that partial-aggregates map-side, ≤ cap longs of state per
  * host — exploded and semi-joined back. Crawl order = doc_id order, the
  * keep-first deterministic tie-break.
  */
object Hosts {

  /** Hash modulus for the derived host id (√1024 = 32 hosts). */
  val HostBuckets = 1024

  /** Number of derived hosts. */
  val HostCount = 32

  /** Per-host document budget. */
  val HostCap = 100

  /** Blocked host ids (the curation blocklist). */
  val Blocklist: Seq[Int] = Seq(7, 13, 29)

  /** (doc_id, n_chars, host_id, host) — the derived-host frame. */
  private[graft] def hosted(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars"),
        floor(sqrt(
          graft.functions.SketchExpressions.md5Prefix60Long(concat(
            col("doc_id").cast("string"),
            lit("#host"))) % HostBuckets))
          .cast("long").as("host_id"))
      .withColumn("host",
        concat(lit("h"), lpad(col("host_id").cast("string"), 2, "0")))

  /** Per-host curation ledger: doc count, char mass, blocked flag, and
    * the post-cap kept count — the audit row a curation run publishes per
    * domain.
    */
  def qHostLedger(s: SparkSession, dir: String): DataFrame =
    hosted(s, dir)
      .groupBy(col("host_id"), col("host"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .select(col("host"), col("n_docs"), col("n_chars"),
        when(col("host_id").isInCollection(Blocklist), 1L).otherwise(0L)
          .as("blocked"),
        when(col("host_id").isInCollection(Blocklist), 0L)
          .otherwise(least(col("n_docs"), lit(HostCap.toLong))).as("n_kept"))
      .orderBy(col("host"))

  /** Cap enforcement: the surviving (doc_id, host) rows — first
    * [[HostCap]] docs per unblocked host in crawl (doc_id) order, via the
    * bounded min_k aggregate + explode instead of a per-host window sort.
    */
  def qHostCap(s: SparkSession, dir: String): DataFrame =
    hosted(s, dir)
      .filter(!col("host_id").isInCollection(Blocklist))
      .groupBy(col("host"))
      .agg(graft.functions.TopKAggregate.minK(col("doc_id"), HostCap)
        .as("kept"))
      .select(col("host"), explode(col("kept")).as("doc_id"))
      .select(col("doc_id"), col("host"))
      .orderBy(col("doc_id"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_host_ledger" -> qHostLedger,
    "q_host_cap" -> qHostCap
  )

  /** DuckDB fragment: the derived-host frame (verbatim hash arithmetic). */
  private val hostedSql: String =
    s"""SELECT doc_id, n_chars,
       |  CAST(floor(sqrt((('0x' || substr(md5(CAST(doc_id AS VARCHAR) ||
       |    '#host'), 1, 15))::BIGINT % $HostBuckets))) AS BIGINT)
       |    AS host_id
       |FROM documents""".stripMargin

  private val blockSql = Blocklist.mkString("(", ", ", ")")

  def oracleSql: Map[String, String] = Map(
    "q_host_ledger" ->
      s"""WITH d AS ($hostedSql)
         |SELECT 'h' || lpad(CAST(host_id AS VARCHAR), 2, '0') AS host,
         |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars,
         |  CAST(CASE WHEN host_id IN $blockSql THEN 1 ELSE 0 END
         |    AS BIGINT) AS blocked,
         |  CAST(CASE WHEN host_id IN $blockSql THEN 0
         |       ELSE least(count(*), $HostCap) END AS BIGINT) AS n_kept
         |FROM d GROUP BY host_id ORDER BY host""".stripMargin,
    // INDEPENDENT derivation: the oracle uses the per-host window sort
    // the Spark side exists to avoid
    "q_host_cap" ->
      s"""WITH d AS ($hostedSql),
         |r AS (SELECT doc_id, host_id,
         |    row_number() OVER (PARTITION BY host_id ORDER BY doc_id) AS rk
         |  FROM d WHERE host_id NOT IN $blockSql)
         |SELECT doc_id,
         |  'h' || lpad(CAST(host_id AS VARCHAR), 2, '0') AS host
         |FROM r WHERE rk <= $HostCap ORDER BY doc_id""".stripMargin
  )
}
