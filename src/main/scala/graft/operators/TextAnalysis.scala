package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.tables.Tables

/** Text-analysis surface over `documents` — the training-data-pipeline
  * operators (token counting, language ID, quality scoring, fingerprinting).
  * Everything is a narrow per-row projection: no shuffle except the final
  * presentation sort (and aggregations where stated), so these scale as pure
  * map stages over 100 TB of documents.
  */
object TextAnalysis {

  /** Per-document token statistics: whitespace tokens, BPE-ish pre-tokenizer
    * tokens, letters, punctuation — the budgeting numbers an LLM-data
    * pipeline computes for every document.
    */
  def qTextTokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        wsTokenCount(col("text")).as("n_ws_tokens"),
        bpeTokenCount(col("text")).as("n_bpe_tokens"),
        letterCount(col("text")).as("n_letters"),
        punctCount(col("text")).as("n_punct"),
        length(col("text")).cast("long").as("n_chars"))
      .orderBy(col("doc_id"))

  /** Quality scoring + its component ratios, with a corpus-level verdict. */
  def qTextQuality(s: SparkSession, dir: String): DataFrame = {
    val nw = wsTokenCount(col("text"))
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        nw.as("n_words"),
        (wordSetCount(col("text"), Stopwords).cast("double") / nw).as("stop_ratio"),
        (punctCount(col("text")).cast("double") / length(col("text"))).as("punct_ratio"),
        qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))
  }

  /** Language ID heuristic vs the labeled `lang` column: per (label,
    * prediction) cell counts — a confusion matrix as a query. (The corpus
    * text is synthetic English-ish vocabulary, so the interesting output is
    * the deterministic machinery, not linguistic accuracy.)
    */
  def qLangId(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"), langId(col("text")).as("pred"))
      .groupBy(col("lang"), col("pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("pred"))

  /** Content fingerprints: exact (md5), normalized (sorted distinct token
    * set), and sha256 — the keys exact/canonical dedup joins on.
    */
  def qTextFingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        fingerprint(col("text")).as("fp_md5"),
        normFingerprint(col("text")).as("fp_norm"),
        sha2(col("text"), 256).as("fp_sha256"))
      .orderBy(col("doc_id"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_tokens" -> qTextTokens,
    "q_text_quality" -> qTextQuality,
    "q_lang_id" -> qLangId,
    "q_text_fingerprint" -> qTextFingerprint
  )

  private val stopList = Stopwords.map(w => s"'$w'").mkString(", ")
  private def markerList(lang: String): String =
    LangMarkers.toMap.apply(lang).map(w => s"'$w'").mkString(", ")
  private def score(lang: String): String =
    s"len(list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x IN (${markerList(lang)})))"

  def oracleSql: Map[String, String] = Map(
    "q_text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '\p{L}+|\p{N}+|[^\s\p{L}\p{N}]+')) AS BIGINT) AS n_bpe_tokens,
        |  CAST(length(regexp_replace(text, '[^\p{L}]', '', 'g')) AS BIGINT) AS n_letters,
        |  CAST(length(regexp_replace(text, '[\p{L}\p{N}\s]', '', 'g')) AS BIGINT) AS n_punct,
        |  CAST(length(text) AS BIGINT) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_quality" ->
      s"""SELECT doc_id,
         |  CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_words,
         |  CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x IN ($stopList))) AS DOUBLE)
         |    / len(string_split_regex(trim(text), '\\s+')) AS stop_ratio,
         |  CAST(length(regexp_replace(text, '[\\p{L}\\p{N}\\s]', '', 'g')) AS DOUBLE)
         |    / length(text) AS punct_ratio,
         |  0.4 * (CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x IN ($stopList))) AS DOUBLE)
         |         / len(string_split_regex(trim(text), '\\s+')))
         |  + 0.3 * (1.0 - CAST(length(regexp_replace(text, '[\\p{L}\\p{N}\\s]', '', 'g')) AS DOUBLE) / length(text))
         |  + 0.3 * least(CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) / 100.0, 1.0) AS quality
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_lang_id" ->
      s"""WITH scored AS (
         |  SELECT lang,
         |    ${score("en")} AS s_en, ${score("de")} AS s_de,
         |    ${score("fr")} AS s_fr, ${score("es")} AS s_es,
         |    length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS n_cjk
         |  FROM documents)
         |SELECT lang,
         |  CASE WHEN n_cjk > 0 THEN 'zh'
         |       WHEN s_en + s_de + s_fr + s_es = 0 THEN 'und'
         |       WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
         |       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
         |       WHEN s_fr >= s_es THEN 'fr'
         |       ELSE 'es' END AS pred,
         |  count(*) AS n
         |FROM scored GROUP BY lang, pred ORDER BY lang, pred""".stripMargin,
    "q_text_fingerprint" ->
      """SELECT doc_id,
        |  md5(text) AS fp_md5,
        |  md5(array_to_string(list_sort(list_distinct(
        |    list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> length(x) > 0))), ' ')) AS fp_norm,
        |  sha256(text) AS fp_sha256
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
