package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for large-scale corpus pipelines.
  *
  * All are pure `org.apache.spark.sql.functions` compositions — codegen'd,
  * no UDFs — so they inline into whole-stage codegen and survive pushdown /
  * pruning around them. Every builder has an exact DuckDB-SQL mirror used by
  * the oracle gate (see [[graft.operators.TextAnalysis]]).
  */
object TextFunctions {

  /** Number of whitespace-delimited tokens. */
  def wsTokenCount(text: Column): Column =
    size(split(trim(text), "\\s+")).cast("long")

  /** GPT-2-style pre-tokenizer count (letters runs | digit runs | other
    * runs) — the "BPE-ish regex" token estimate for LLM data budgeting.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\p{L}+|\\p{N}+|[^\\s\\p{L}\\p{N}]+"), lit(0)))
      .cast("long")

  /** Count of tokens (lowercased, letter-split) equal to any of `words`. */
  def wordSetCount(text: Column, words: Seq[String]): Column =
    size(filter(
      split(lower(text), "[^a-z]+"),
      t => t.isInCollection(words))).cast("long")

  /** Total letter characters. */
  def letterCount(text: Column): Column =
    length(regexp_replace(text, "[^\\p{L}]", "")).cast("long")

  /** Characters that are neither letter, digit, nor whitespace. */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[\\p{L}\\p{N}\\s]", "")).cast("long")

  /** ASCII uppercase characters. */
  def upperCount(text: Column): Column =
    length(regexp_replace(text, "[^A-Z]", "")).cast("long")

  /** Default English stopword set for quality scoring. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "for")

  /** Heuristic document-quality score in [0,1]: stopword density says
    * "natural language", low punctuation says "not markup/code", length
    * saturating at 100 words says "substantial". Linear combination of
    * IEEE-exact ratios — bit-identical on any engine.
    */
  def qualityScore(text: Column): Column = {
    val nw = wsTokenCount(text)
    val stopRatio = wordSetCount(text, Stopwords).cast("double") / nw
    val punctRatio = punctCount(text).cast("double") / length(text)
    val lenScore = least(nw.cast("double") / lit(100.0), lit(1.0))
    lit(0.4) * stopRatio + lit(0.3) * (lit(1.0) - punctRatio) + lit(0.3) * lenScore
  }

  /** Language marker words per language (fixed preference order for the
    * argmax tie-break: en, de, fr, es).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "und", "die", "das"),
    "fr" -> Seq("le", "et", "les", "des"),
    "es" -> Seq("el", "y", "los", "las"))

  /** N-gram-heuristic language ID: marker-word hit counts per language,
    * argmax with fixed tie order, 'und' (undetermined) when no marker hits.
    * CJK presence short-circuits to 'zh' (marker words don't apply).
    */
  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (lang, ws) => lang -> wordSetCount(text, ws) }
    // fixed-precedence argmax: first language whose score is >= all others
    def ge(a: Column, rest: Seq[Column]): Column =
      rest.foldLeft(lit(true))((c, o) => c && a >= o)
    val Seq(en, de, fr, es) = scores.map(_._2)
    when(length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", "")) > 0, "zh")
      .when(en + de + fr + es === 0, "und")
      .when(ge(en, Seq(de, fr, es)), "en")
      .when(ge(de, Seq(fr, es)), "de")
      .when(ge(fr, Seq(es)), "fr")
      .otherwise("es")
  }

  /** Exact content fingerprint (md5 hex) — the exact-dedup key. */
  def fingerprint(text: Column): Column = md5(text)

  /** Normalization-invariant fingerprint: md5 over the sorted distinct
    * lowercase token set — equal for documents that are permutations /
    * duplications of the same vocabulary (shingle-free canonical form).
    */
  def normFingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(
      filter(split(lower(text), "[^a-z]+"), t => length(t) > 0))), " "))
}
