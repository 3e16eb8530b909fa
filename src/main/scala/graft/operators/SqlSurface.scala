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

  /** MinHash SIGNATURES from pure SQL text — the first stage of the
    * dedup pipeline as a SQL-only entry point: shingle-hash stream via
    * the `shingle_hashes` generator, per-document hash sets, all
    * [[Dedup.NumHashes]] universal-hash minima via the registered
    * `affine_minhashes` codegen expression. Output is the signature
    * table itself (doc_id + m0..m15), so a SQL user can band/bucket it
    * with plain GROUP BYs downstream; the oracle replicates the affine
    * arithmetic from the same [[graft.functions.Sketches]] constants the
    * DataFrame path uses. Documents with zero shingles are excluded on
    * both engines (the generator emits nothing; the oracle filters),
    * mirroring [[Dedup.minhashBanded]].
    */
  /** Shared Spark-SQL CTE text ending in `sig(doc_id, mh)` — the
    * shingle-hash collection + MinHash signature stages over `fromSql`
    * (any relation/subquery producing (doc_id, text)); used verbatim by
    * [[qSqlMinhash]] and [[qSqlLshPairs]] so the two entry points cannot
    * drift in shingle width, hash rule, or signature count.
    */
  private def sigCtesSql(fromSql: String): String =
    s"""hs AS (
       |  SELECT doc_id, collect_list(h) AS hs
       |  FROM $fromSql
       |  LATERAL VIEW shingle_hashes(text, 3) s AS pos, h
       |  GROUP BY doc_id),
       |sig AS (SELECT doc_id, affine_minhashes(hs, ${Dedup.NumHashes}) AS mh
       |        FROM hs)""".stripMargin

  def qSqlMinhash(s: SparkSession, dir: String): DataFrame = {
    graft.functions.Generators.register(s)
    val ms = (0 until Dedup.NumHashes)
      .map(k => s"CAST(element_at(mh, ${k + 1}) AS BIGINT) AS m$k")
      .mkString(",\n  ")
    s.sql(
      s"""WITH ${sigCtesSql(s"parquet.`$dir/documents.parquet`")}
         |SELECT doc_id, $ms
         |FROM sig
         |ORDER BY doc_id""".stripMargin)
  }

  /** Keep-first line-level dedup from pure SQL text — the CCNet-style
    * line filter as a SQL-only entry point: fixed-[[Dedup.LineTokens]]
    * token lines via the registered `token_chunks` + `md5_prefix60`
    * expressions, global first instance per line hash as one exact
    * BIGINT min (doc_id·2³² + line_no — the [[Dedup.linesKeepCorpus]]
    * packing), per-document kept/duplicate accounting plus a positional
    * checksum of the kept line numbers so a wrong keep-set can't hide
    * behind a right count.
    */
  def qSqlLinesKeep(s: SparkSession, dir: String): DataFrame = {
    graft.functions.Generators.register(s)
    s.sql(
      s"""WITH ln AS (
         |  SELECT doc_id, line_no, h, doc_id * ${1L << 32} + line_no AS inst
         |  FROM parquet.`$dir/documents.parquet`
         |  LATERAL VIEW posexplode(md5_prefix60(token_chunks(
         |    filter(split(lower(text), '[^a-z]+'), t -> t != ''),
         |    ${Dedup.LineTokens}))) t AS line_no, h),
         |fi AS (SELECT h, min(inst) AS first_inst FROM ln GROUP BY h)
         |SELECT doc_id,
         |  count(*) AS n_lines,
         |  CAST(sum(CASE WHEN inst = first_inst THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept,
         |  CAST(sum(CASE WHEN inst = first_inst THEN line_no ELSE -1 END)
         |    AS BIGINT) AS kept_pos_chk
         |FROM ln JOIN fi USING (h)
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin)
  }

  /** The Gopher rule battery from pure SQL text — identical thresholds,
    * flags and output shape to [[TextAnalysis.qGopher]] (bit-equality of
    * the two paths is spec-pinned), written with Spark SQL builtins only:
    * the quality-gate stage of the curation pipeline needs no extension
    * functions at all, just the SQL dialect.
    */
  def qSqlGopher(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{TextAnalysis => TA}
    val stops = graft.functions.TextFunctions.Stopwords
      .map(w => s"'$w'").mkString(", ")
    s.sql(
      s"""WITH t AS (
         |  SELECT doc_id,
         |    filter(split(lower(text), '[^a-z]+'), x -> x != '') AS tk
         |  FROM parquet.`$dir/documents.parquet`),
         |m AS (
         |  SELECT doc_id,
         |    CAST(size(tk) AS BIGINT) AS n_words,
         |    CAST(aggregate(tk, 0L, (a, w) -> a + length(w)) AS DOUBLE)
         |      / size(tk) AS mean_word_len,
         |    CAST(size(array_intersect(array_distinct(tk), array($stops)))
         |      AS BIGINT) AS n_stop_distinct,
         |    1.0D - CAST(size(array_distinct(tk)) AS DOUBLE) / size(tk)
         |      AS dup_word_frac
         |  FROM t)
         |SELECT doc_id, n_words, mean_word_len, n_stop_distinct, dup_word_frac,
         |  CASE WHEN n_words >= ${TA.GopherMinWords}
         |        AND n_words <= ${TA.GopherMaxWords}
         |    THEN 1L ELSE 0L END AS r_words,
         |  CASE WHEN mean_word_len >= ${TA.GopherMinMeanWordLen}D
         |        AND mean_word_len <= ${TA.GopherMaxMeanWordLen}D
         |    THEN 1L ELSE 0L END AS r_word_len,
         |  CASE WHEN n_stop_distinct >= ${TA.GopherMinDistinctStop}
         |    THEN 1L ELSE 0L END AS r_stop,
         |  CASE WHEN dup_word_frac <= ${TA.GopherMaxDupFrac}D
         |    THEN 1L ELSE 0L END AS r_dup,
         |  CASE WHEN n_words >= ${TA.GopherMinWords}
         |        AND n_words <= ${TA.GopherMaxWords}
         |        AND mean_word_len >= ${TA.GopherMinMeanWordLen}D
         |        AND mean_word_len <= ${TA.GopherMaxMeanWordLen}D
         |        AND n_stop_distinct >= ${TA.GopherMinDistinctStop}
         |        AND dup_word_frac <= ${TA.GopherMaxDupFrac}D
         |    THEN 1L ELSE 0L END AS keep
         |FROM m
         |ORDER BY doc_id""".stripMargin)
  }

  /** The rest of the MinHash-LSH pipeline from pure SQL text —
    * [[qSqlMinhash]]'s signatures banded ([[Dedup.NumBands]] bands ×
    * [[Dedup.RowsPerBand]] rows, md5 band keys), bucket-capped at
    * [[Dedup.MaxLshBucket]], expanded to candidate pairs with their
    * shared-band counts: the [[Dedup.minhashBanded]] →
    * [[Dedup.minhashCandidates]] stages as GROUP BYs a SQL user can
    * write, constants pinned to the Scala path's. With q_sql_minhash /
    * q_sql_lines_keep / q_sql_gopher, the dedup surface is now drivable
    * end to end from a SQL notebook: quality-gate → line-clean →
    * signature → candidate pairs.
    *
    * Plan discipline (pinned in PlanRegressionSpec): the pair expansion
    * is a bucket-collect + in-bucket explode, NOT a banded-table
    * self-join — Spark shares no uncached subtrees, so a self-join here
    * re-evaluates the whole tokenize→shingle→signature pipeline per
    * reference (the round-1 sharedSignatures lesson, SQL edition; the
    * self-join draft measured 2.62 s vs this shape's one evaluation).
    */
  def qSqlLshPairs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.Generators.register(s)
    // ONE array-of-structs explode over the single sig frame — a UNION
    // ALL of per-band SELECTs would re-evaluate the signature pipeline
    // once per band (8×), the same unshared-subtree trap as a self-join
    val bandStructs = (0 until Dedup.NumBands).map { b =>
      val ms = (0 until Dedup.RowsPerBand)
        .map(r => s"element_at(mh, ${b * Dedup.RowsPerBand + r + 1})")
        .mkString(", ")
      s"struct($b AS band_idx, md5(concat_ws(',', $ms)) AS band_key)"
    }.mkString(",\n    ")
    s.sql(
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM parquet.`$dir/documents.parquet`
         |  UNION ALL
         |  SELECT doc_id + ${Dedup.PlantOffset}, text || '${Dedup.Tail}'
         |  FROM parquet.`$dir/documents.parquet`),
         |${sigCtesSql("corpus")},
         |banded AS (
         |  SELECT doc_id, bk.band_idx AS band_idx, bk.band_key AS band_key
         |  FROM sig
         |  LATERAL VIEW explode(array(
         |    $bandStructs)) t AS bk),
         |buckets AS (
         |  SELECT sort_array(collect_list(doc_id)) AS ids
         |  FROM banded GROUP BY band_idx, band_key),
         |pairs AS (
         |  SELECT explode(flatten(transform(ids, (a, i) ->
         |    transform(slice(ids, i + 2, size(ids)),
         |      b -> struct(a AS doc_a, b AS doc_b))))) AS p
         |  FROM buckets
         |  WHERE size(ids) > 1 AND size(ids) <= ${Dedup.MaxLshBucket})
         |SELECT p.doc_a AS doc_a, p.doc_b AS doc_b,
         |  count(*) AS n_shared_bands
         |FROM pairs
         |GROUP BY p.doc_a, p.doc_b
         |ORDER BY doc_a, doc_b""".stripMargin)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_tokens" -> qSqlTokens,
    "q_sql_shingles" -> qSqlShingles,
    "q_sql_minhash" -> qSqlMinhash,
    "q_sql_lines_keep" -> qSqlLinesKeep,
    "q_sql_gopher" -> qSqlGopher,
    "q_sql_lsh_pairs" -> qSqlLshPairs
  )

  private val hsql = (g: String) => s"('0x' || substr(md5($g), 1, 15))::BIGINT"

  /** DuckDB twin of [[sigCtesSql]]'s inputs: the tokenize → trigram →
    * 60-bit-hash chain ending in `hsd(doc_id, hs)` over `from`, shared
    * by the q_sql_minhash and q_sql_lsh_pairs oracles.
    */
  private def duckHsCtes(from: String): String =
    s"""tk AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '[^a-z]+'),
       |                x -> length(x) > 0) AS ts
       |  FROM $from),
       |sh AS (
       |  SELECT doc_id, CASE WHEN len(ts) >= 3
       |    THEN list_transform(range(0, len(ts) - 2),
       |           i -> ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3])
       |    ELSE [] END AS sh
       |  FROM tk),
       |hsd AS (
       |  SELECT doc_id,
       |    list_transform(sh, x -> ${hsql("x")}) AS hs
       |  FROM sh WHERE len(sh) > 0)""".stripMargin

  /** DuckDB twin of the `affine_minhashes` expression: the m0..m15
    * signature columns from `hsd.hs`, same [[graft.functions.Sketches]]
    * constants — shared by both MinHash-family oracles.
    */
  private def duckSigCols: String = {
    import graft.functions.Sketches
    (0 until Dedup.NumHashes)
      .map(k => s"CAST(list_min(list_transform(hs, h -> " +
        s"((${Sketches.a(k)} * (h % ${Sketches.Prime}) + ${Sketches.b(k)})" +
        s" % ${Sketches.Prime}))) AS BIGINT) AS m$k")
      .mkString(",\n  ")
  }

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
    },
    // same lowercase trigram shingles + 60-bit hashes, same affine
    // constants (graft.functions.Sketches a/b/Prime), same
    // empty-signature exclusion
    "q_sql_minhash" ->
      s"""WITH ${duckHsCtes("documents")}
         |SELECT doc_id, $duckSigCols
         |FROM hsd
         |ORDER BY doc_id""".stripMargin,
    // same 10-token line chunks (partial tail chunk included), same
    // 60-bit line hashes, same packed-BIGINT first-instance rule
    "q_sql_lines_keep" -> {
      val L = Dedup.LineTokens
      s"""WITH tkt AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(text), '[^a-z]+'),
         |                x -> length(x) > 0) AS tk
         |  FROM documents),
         |ln0 AS (
         |  SELECT doc_id,
         |    list_transform(range(0, (len(tk) + ${L - 1}) // $L),
         |      i -> ('0x' || substr(md5(
         |        array_to_string(tk[i*$L+1 : i*$L+$L], ' ')), 1, 15))::BIGINT)
         |      AS hs
         |  FROM tkt),
         |ph0 AS (SELECT doc_id, unnest(range(0, len(hs))) AS pos, hs FROM ln0),
         |ph AS (SELECT doc_id, CAST(pos AS BIGINT) AS line_no, hs[pos+1] AS h,
         |       doc_id * ${1L << 32} + pos AS inst FROM ph0),
         |fi AS (SELECT h, min(inst) AS first_inst FROM ph GROUP BY h)
         |SELECT doc_id, count(*) AS n_lines,
         |  CAST(sum(CASE WHEN inst = first_inst THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept,
         |  CAST(sum(CASE WHEN inst = first_inst THEN line_no ELSE -1 END)
         |    AS BIGINT) AS kept_pos_chk
         |FROM ph JOIN fi USING (h)
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin
    },
    // same signatures as the q_sql_minhash oracle, same banding and
    // bucket-cap arithmetic as the Dedup oracle chain
    "q_sql_lsh_pairs" -> {
      val bandRows = (0 until Dedup.NumBands).map { b =>
        val ms = (0 until Dedup.RowsPerBand)
          .map(r => s"m${b * Dedup.RowsPerBand + r}").mkString(", ")
        s"SELECT doc_id, $b AS band_idx, md5(concat_ws(',', $ms)) AS band_key FROM sig"
      }.mkString("\nUNION ALL\n")
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + ${Dedup.PlantOffset}, text || '${Dedup.Tail}'
         |  FROM documents),
         |${duckHsCtes("corpus")},
         |sig AS (SELECT doc_id, $duckSigCols FROM hsd),
         |banded AS ($bandRows),
         |ok AS (
         |  SELECT band_idx, band_key FROM banded
         |  GROUP BY band_idx, band_key
         |  HAVING count(*) > 1 AND count(*) <= ${Dedup.MaxLshBucket})
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  count(*) AS n_shared_bands
         |FROM banded a
         |JOIN banded b ON a.band_idx = b.band_idx
         |  AND a.band_key = b.band_key AND a.doc_id < b.doc_id
         |JOIN ok ON ok.band_idx = a.band_idx AND ok.band_key = a.band_key
         |GROUP BY a.doc_id, b.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin
    },
    // the q_gopher oracle verbatim (shared CTE builder) — the SQL entry
    // point and the DataFrame path answer to the same ground truth
    "q_sql_gopher" ->
      s"""WITH ${TextAnalysis.gopherSqlCtes("doc_id")}
         |SELECT doc_id, n_words, mean_word_len, n_stop_distinct, dup_word_frac,
         |  CAST(r_words AS BIGINT) AS r_words,
         |  CAST(r_word_len AS BIGINT) AS r_word_len,
         |  CAST(r_stop AS BIGINT) AS r_stop,
         |  CAST(r_dup AS BIGINT) AS r_dup,
         |  CAST(CASE WHEN r_words + r_word_len + r_stop + r_dup = 4
         |    THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM f ORDER BY doc_id""".stripMargin
  )
}
