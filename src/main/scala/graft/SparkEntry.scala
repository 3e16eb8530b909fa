package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry conventions (every query must satisfy all of these so the
  * DuckDB-oracle hash compare is deterministic):
  *   - every output column is explicitly aliased, with the SAME name in the
  *     Spark plan and the oracle SQL;
  *   - results are totally ordered: an ORDER BY over a tie-free key set in
  *     BOTH the Spark plan and the SQL;
  *   - double aggregations go through DECIMAL(18,2) (the corpus' money
  *     columns are 2-decimal) so sums are exact and order-independent, then
  *     cast back to double — identical bits on both engines;
  *   - session timezone is UTC on both sides;
  *   - every output column is SCALAR — no array/struct/map. The driver's
  *     harness sorts rows by all columns in pandas before hashing, and
  *     ndarray cells are unhashable (the round-2 q_dedup_clusters /
  *     q_inverted_index failure class). Stringify collections via
  *     array_join, as q_complex_types does; `tools/check_oracle.py` and
  *     SparkEntrySpec both reject nested output types.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0.
    * TPC-H Q1-shaped pricing summary — exercises scan, pushdown, partial
    * aggregation, and sort in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ M3 extensions).
    * Merged from per-module registries.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    mrQueries ++
      operators.Relational.queries ++
      operators.TpcH.queries ++
      operators.TextAnalysis.queries ++
      operators.Dedup.queries ++
      operators.Similarity.queries ++
      operators.Events.queries ++
      operators.Multimodal.queries ++
      operators.Sampling.queries ++
      operators.Embeddings.queries ++
      operators.Bpe.queries ++
      operators.Graph.queries ++
      operators.GlobalOrder.queries ++
      scale.Scale.queries ++
      sources.Export.queries ++
      sources.Ingest.queries ++
      streaming.Streaming.queries ++
      operators.Hosts.queries ++
      operators.SqlSurface.queries

  /** DuckDB-equivalent SQL per query key (same column names, same order). */
  def oracleSql: Map[String, String] =
    mrOracle ++
      operators.Relational.oracleSql ++
      operators.TpcH.oracleSql ++
      operators.TextAnalysis.oracleSql ++
      operators.Dedup.oracleSql ++
      operators.Similarity.oracleSql ++
      operators.Events.oracleSql ++
      operators.Multimodal.oracleSql ++
      operators.Sampling.oracleSql ++
      operators.Embeddings.oracleSql ++
      operators.Bpe.oracleSql ++
      operators.Graph.oracleSql ++
      operators.GlobalOrder.oracleSql ++
      scale.Scale.oracleSql ++
      sources.Export.oracleSql ++
      sources.Ingest.oracleSql ++
      streaming.Streaming.oracleSql ++
      operators.Hosts.oracleSql ++
      operators.SqlSurface.oracleSql

  // -------------------------------------------------------------------
  // Reference-parity query: word count (wc.go:14-38) over documents.text.
  // Declarative form — codegen'd explode/split + partial aggregation (the
  // combiner the reference lacks; its shuffle carries one record per word
  // occurrence, mapreduce.go:156-164).
  // -------------------------------------------------------------------
  private def mrQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "wc_wordcount" -> ((s, dir) =>
      graft.mr.WordCount
        .viaSql(Tables.documents(s, dir), "text")
        .orderBy(col("word")))
  )

  private def mrOracle: Map[String, String] = Map(
    "wc_wordcount" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split_regex(text, '[^\p{L}]+')) AS word
        |      FROM documents) t
        |WHERE word <> ''
        |GROUP BY word ORDER BY word""".stripMargin
  )
}
