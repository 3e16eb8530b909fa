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

  /** Corpus-wide top-20 bigrams: one-pass n-gram expression, explode,
    * count, top-k (TakeOrderedAndProject — only 20 rows leave the agg).
    */
  def qBigrams(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(
        graft.functions.SketchExpressions.wordNGrams(
          filter(split(lower(col("text")), "[^a-z]+"), t => length(t) > 0),
          2, distinct = false))
        .as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(20)

  /** TF-IDF: term frequency per (doc, term) from exploded tokens, document
    * frequency per term, idf = ln(N/df). Two aggregations + one broadcast-
    * able join on term — the classic shape that scales (no per-doc loops).
    * Output: top-3 scored terms for the first 20 docs, tf/df kept as exact
    * integers alongside the double score.
    */
  def qTfidf(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val nDocs = docs.select(countDistinct(col("doc_id")).as("nd"))
    val tokens = docs
      .select(col("doc_id"), explode(
        filter(split(lower(col("text")), "[^a-z]+"), t => length(t) > 0))
        .as("term"))
    val tf = tokens.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tokens.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(nDocs))
      // JVM Math.log and libm ln differ in the last ulp for some inputs;
      // round far above that noise, far below score granularity
      .withColumn("tfidf",
        round(col("tf") * log(col("nd").cast("double") / col("df")), 9))
      .filter(col("doc_id") < 20)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk").cast("long").as("rk"), col("term"),
        col("tf"), col("df"), col("tfidf"))
      .orderBy(col("doc_id"), col("rk"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_tokens" -> qTextTokens,
    "q_text_quality" -> qTextQuality,
    "q_lang_id" -> qLangId,
    "q_text_fingerprint" -> qTextFingerprint,
    "q_text_bigrams" -> qBigrams,
    "q_tfidf" -> qTfidf
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
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_bigrams" ->
      """WITH toks AS (
        |  SELECT list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |                     x -> length(x) > 0) AS t
        |  FROM documents),
        |grams AS (
        |  SELECT unnest(CASE WHEN len(t) >= 2
        |    THEN list_transform(range(0, len(t) - 1), i -> t[i+1] || ' ' || t[i+2])
        |    ELSE [] END) AS bigram
        |  FROM toks)
        |SELECT bigram, count(*) AS n FROM grams
        |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin,
    "q_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |                       x -> length(x) > 0)) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
        |nd AS (SELECT count(DISTINCT doc_id) AS nd FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    round(tf.tf * ln(CAST(nd.nd AS DOUBLE) / df.df), 9) AS tfidf
        |  FROM tf JOIN df USING (term) CROSS JOIN nd
        |  WHERE tf.doc_id < 20),
        |ranked AS (
        |  SELECT doc_id, term, tf, df, tfidf,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
        |  FROM scored)
        |SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, tf, df, tfidf
        |FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin
  )
}
