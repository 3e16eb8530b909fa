package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SQL-only user path, under the driver's hard gate: these queries are
  * written ENTIRELY in `spark.sql` text — no DataFrame DSL — driving the
  * engine's curation stages through the [[graft.GraftExtensions]]-registered
  * generators ([[graft.functions.Generators]]). A BI tool or SQL notebook
  * pointed at a session built with the extensions can run the same
  * tokenize/shingle pipeline the Scala operators use, and the DuckDB oracle
  * hash-checks that the SQL surface computes the SAME bits (including the
  * engine-portable 60-bit md5 shingle hashes).
  */
object SqlSurface {

  /** Positional token census through the `tokens` generator — the
    * reference's wc Map contract (`wc.go:14-38`: split on non-letters, no
    * case folding) with 0-based positions, SQL end to end. first_pos makes
    * the output POSITION-sensitive, so a tokenizer that filtered empties
    * after numbering (or numbered bytes, not tokens) would hash-mismatch.
    */
  def qSqlTokens(s: SparkSession, dir: String): DataFrame = {
    graft.functions.Generators.register(s)
    s.sql(
      s"""SELECT token, count(*) AS n, CAST(min(pos) AS BIGINT) AS first_pos
         |FROM parquet.`$dir/documents.parquet`
         |LATERAL VIEW tokens(text) g AS pos, token
         |GROUP BY token
         |ORDER BY token""".stripMargin)
  }

  /** Whole-corpus census of the span detectors' positional shingle-hash
    * stream through the `shingle_hashes` generator — n_distinct/min/max and
    * a modular checksum over the EXACT 60-bit hash values plus the position
    * sum, so any divergence in tokenizer, n-gram windowing, or hash
    * arithmetic between the SQL surface and the house rule
    * ([[graft.functions.SketchExpressions]] `Md5Prefix60Array`) flips the
    * oracle hash. Scale shape: the generator streams (pos, h) per row into
    * a map-side-combined aggregation — no per-document array ever crosses
    * the exchange.
    */
  def qSqlShingles(s: SparkSession, dir: String): DataFrame = {
    graft.functions.Generators.register(s)
    s.sql(
      s"""SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(DISTINCT h) AS BIGINT) AS n_distinct,
         |  CAST(min(h) AS BIGINT) AS min_h,
         |  CAST(max(h) AS BIGINT) AS max_h,
         |  CAST(sum(h % 9973) AS BIGINT) AS chk,
         |  CAST(sum(pos) AS BIGINT) AS pos_sum
         |FROM parquet.`$dir/documents.parquet`
         |LATERAL VIEW shingle_hashes(text, 3) s AS pos, h""".stripMargin)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_tokens" -> qSqlTokens,
    "q_sql_shingles" -> qSqlShingles
  )

  private val hsql = (g: String) => s"('0x' || substr(md5($g), 1, 15))::BIGINT"

  def oracleSql: Map[String, String] = Map(
    // same tokenizer (\p{L} runs, empties dropped BEFORE numbering),
    // positions re-derived via generate_subscripts
    "q_sql_tokens" ->
      """SELECT token, count(*) AS n, CAST(min(pos) AS BIGINT) AS first_pos
        |FROM (
        |  SELECT unnest(ts) AS token, generate_subscripts(ts, 1) - 1 AS pos
        |  FROM (SELECT list_filter(string_split_regex(text, '[^\p{L}]+'),
        |                 x -> length(x) > 0) AS ts
        |        FROM documents))
        |GROUP BY token ORDER BY token""".stripMargin,
    // same lowercase letter tokens, same in-order trigram windows, same
    // 60-bit md5 prefix arithmetic
    "q_sql_shingles" -> {
      s"""WITH tk AS (
         |  SELECT list_filter(string_split_regex(lower(text), '[^a-z]+'),
         |           x -> length(x) > 0) AS ts
         |  FROM documents),
         |g AS (
         |  SELECT unnest(CASE WHEN len(ts) >= 3
         |    THEN list_transform(range(0, len(ts) - 2),
         |      i -> struct_pack(pos := i,
         |             gram := ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3]))
         |    ELSE [] END) AS s
         |  FROM tk),
         |h AS (SELECT s.pos AS pos, ${hsql("s.gram")} AS h FROM g)
         |SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(DISTINCT h) AS BIGINT) AS n_distinct,
         |  CAST(min(h) AS BIGINT) AS min_h,
         |  CAST(max(h) AS BIGINT) AS max_h,
         |  CAST(sum(h % 9973) AS BIGINT) AS chk,
         |  CAST(sum(pos) AS BIGINT) AS pos_sum
         |FROM h""".stripMargin
    }
  )
}
