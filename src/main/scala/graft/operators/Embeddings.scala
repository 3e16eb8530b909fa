package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions
import graft.tables.Tables

/** Embedding PREPROCESSING over `embeddings` — the hygiene/report stage an
  * index-build pipeline runs before any ANN structure is trained: norm
  * distribution per label (catches unnormalized or degenerate vectors) and
  * int8 scalar-quantization error (what 4× storage compression costs in
  * precision). Both are pure map stages plus a label-sized (or per-vector)
  * aggregate — nothing shuffles the vectors themselves at any corpus size,
  * and the per-row math runs in the codegen'd vector expressions
  * ([[graft.functions.FloatVecDotProduct]] /
  * [[graft.functions.FloatVecQuantStats]]), not interpreted lambdas.
  */
object Embeddings {

  /** Quantization levels: symmetric int8 (−127..127). */
  val QuantLevels = 127

  /** Per-label L2-norm distribution: count, min/max/mean norm. Norms are
    * rounded to 6 decimals BEFORE aggregating (sqrt-of-sequential-sum is
    * deterministic per row, but rounding pins the cross-engine contract at
    * the same grain the cosine queries use); the mean is rounded to 9 —
    * partition summation order differs between engines.
    */
  def qEmbeddingNorms(s: SparkSession, dir: String): DataFrame = {
    val nrm = round(
      sqrt(VectorExpressions.vecDot(col("embedding"), col("embedding"))), 6)
    Tables.embeddings(s, dir)
      // label is INT32 in parquet; the oracle contract is BIGINT/DOUBLE only
      .select(col("label").cast("long").as("label"), nrm.as("nrm"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        min(col("nrm")).as("min_norm"),
        max(col("nrm")).as("max_norm"),
        round(avg(col("nrm")), 9).as("avg_norm"))
      .orderBy(col("label"))
  }

  /** Int8 symmetric-quantization error report per vector: the max input
    * magnitude (sets the scale), the worst and mean absolute reconstruction
    * error. One codegen'd pass per row; quantization uses
    * floor(x/scale + 0.5) — half-up via floor, which Java and SQL agree on
    * (engine round() differs on .5 ties).
    */
  def qEmbeddingQuantize(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"),
        VectorExpressions.vecQuantStats(col("embedding"), QuantLevels).as("qs"))
      .select(
        col("vec_id"),
        element_at(col("qs"), 1).as("max_abs"),
        element_at(col("qs"), 2).as("max_abs_err"),
        round(element_at(col("qs"), 3) / element_at(col("qs"), 4), 9)
          .as("mean_abs_err"))
      .orderBy(col("vec_id"))

  /** Fixed quantization grid for the drift fingerprint: 10⁻³ steps. */
  val DriftScale = 1000

  /** Per-label embedding DRIFT fingerprint — what an embedding-space
    * monitor compares across corpus snapshots or encoder versions (a
    * retrained encoder that shifts one label's distribution moves these
    * integers immediately): every dimension quantized to the fixed
    * [[DriftScale]] grid (half-up via `floor(x·s + 0.5)`, the tie rule
    * both engines agree on), then exact integer mass/L1/L2 sums per
    * label. Quantizing BEFORE summing is what makes a cross-row float
    * aggregation engine-portable at all — IEEE addition is
    * order-sensitive, integer addition is not. Row-local fold + one
    * |labels|-group aggregation; vectors never shuffle.
    */
  def qEmbeddingDrift(s: SparkSession, dir: String): DataFrame = {
    val q = transform(col("embedding"),
      v => floor(v.cast("double") * DriftScale + 0.5).cast("long"))
    Tables.embeddings(s, dir)
      .select(col("label").cast("long").as("label"),
        aggregate(q, lit(0L), (a, x) => a + x).as("m"),
        aggregate(q, lit(0L), (a, x) => a + abs(x)).as("l1"),
        aggregate(q, lit(0L), (a, x) => a + x * x).as("l2"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        sum(col("m")).as("sum_q"),
        sum(col("l1")).as("sum_q_abs"),
        sum(col("l2")).as("sum_q_sq"))
      .orderBy(col("label"))
  }

  /** Leading dimensions covered by the covariance census. */
  val CovDims = 8

  /** EXACT covariance sufficient statistics over the leading [[CovDims]]
    * embedding dimensions — the input a PCA/whitening/decorrelation stage
    * consumes, made engine-portable by the [[DriftScale]] quantize-first
    * rule (integer Σxᵢxⱼ sums are order-independent; IEEE float sums are
    * not). One corpus scan computes all 36 pair sums + 8 marginals as a
    * single 1-row aggregation (the quantized array is projected ONCE —
    * CollapseProject declines to inline a non-cheap lambda referenced 44
    * times, so the transform runs once per row); the 36-cell reshape is
    * a bounded driver roundtrip (the k-means/BPE class). cov_num =
    * n·Σxᵢxⱼ − Σxᵢ·Σxⱼ is the exact integer covariance numerator on the
    * 10⁻³ grid: divide by n² (and the grid²) off-engine for the float
    * matrix; eigen-decomposition of an 8×8 (or 64×64) matrix is
    * driver-side by construction at any corpus size.
    */
  def qEmbeddingCov(s: SparkSession, dir: String): DataFrame = {
    val q = transform(col("embedding"),
      v => floor(v.cast("double") * DriftScale + 0.5).cast("long"))
    val pairs = for { i <- 0 until CovDims; j <- i until CovDims } yield (i, j)
    val aggs =
      pairs.map { case (i, j) =>
        sum(element_at(col("q"), i + 1) * element_at(col("q"), j + 1))
          .as(s"sxy_${i}_$j")
      } ++
        (0 until CovDims).map(i =>
          sum(element_at(col("q"), i + 1)).as(s"s_$i"))
    val row = Tables.embeddings(s, dir)
      .select(q.as("q"))
      .agg(count(lit(1)).as("n_vecs"), aggs: _*)
      .head()
    val n = row.getAs[Long]("n_vecs")
    val out = pairs.map { case (i, j) =>
      val sxy = row.getAs[Long](s"sxy_${i}_$j")
      val si = row.getAs[Long](s"s_$i")
      val sj = row.getAs[Long](s"s_$j")
      (i.toLong, j.toLong, n, sxy, si, sj, n * sxy - si * sj)
    }
    s.createDataFrame(out)
      .toDF("i", "j", "n_vecs", "s_xy", "s_i", "s_j", "cov_num")
      .orderBy(col("i"), col("j"))
  }

  /** Power-iteration rounds, quantized-eigenvector scale, and projection
    * histogram bin width for [[qPcaProject]].
    */
  val PcaIters = 12
  val PcaVScale = 1000000L
  val PcaBinW = 100000000L

  /** The full symmetric integer covariance-numerator matrix (the
    * [[qEmbeddingCov]] census reshaped driver-side — bounded
    * CovDims²-cell roundtrip, the k-means/BPE class).
    */
  private def covMatrix(s: SparkSession, dir: String): Array[Array[Long]] = {
    val q = transform(col("embedding"),
      v => floor(v.cast("double") * DriftScale + 0.5).cast("long"))
    val pairs = for { i <- 0 until CovDims; j <- i until CovDims } yield (i, j)
    val aggs =
      pairs.map { case (i, j) =>
        sum(element_at(col("q"), i + 1) * element_at(col("q"), j + 1))
          .as(s"sxy_${i}_$j")
      } ++
        (0 until CovDims).map(i =>
          sum(element_at(col("q"), i + 1)).as(s"s_$i"))
    val row = Tables.embeddings(s, dir)
      .select(q.as("q"))
      .agg(count(lit(1)).as("n_vecs"), aggs: _*)
      .head()
    val n = row.getAs[Long]("n_vecs")
    val a = Array.ofDim[Long](CovDims, CovDims)
    pairs.foreach { case (i, j) =>
      val c = n * row.getAs[Long](s"sxy_${i}_$j") -
        row.getAs[Long](s"s_$i") * row.getAs[Long](s"s_$j")
      a(i)(j) = c
      a(j)(i) = c
    }
    a
  }

  /** PCA top-component PROJECTION — the decorrelation/compression stage
    * [[qEmbeddingCov]]'s census exists to feed, end to end: power
    * iteration extracts the leading eigenvector of the covariance
    * matrix, and every embedding projects onto it (the 1-D feature a
    * curriculum or a whitening stage keys on). The iteration runs
    * ENTIRELY IN INTEGERS — matrix rescaled once to a ~10⁹ grid, the
    * eigenvector re-quantized to the [[PcaVScale]] grid after each
    * round (divisors via truncating division, which Scala, Spark `div`
    * and DuckDB `//` agree on) — so every matvec sum is an exact BIGINT
    * and ORDER-INDEPENDENT: no IEEE summation-order hazard anywhere,
    * the property float power iteration cannot give across engines.
    * Shape: one corpus scan (the census), a CovDims²-bounded driver
    * iteration (the k-means/BPE hybrid-loop class), then a pure
    * row-local projection with the eigenvector as plan literals and a
    * sparse histogram aggregation. The oracle replays the census AND
    * all [[PcaIters]] iterations as unrolled CTEs (the BPE discipline)
    * and must land on the identical eigenvector — pinned by the v0..v7
    * columns riding every output row.
    */
  def qPcaProject(s: SparkSession, dir: String): DataFrame = {
    val a0 = covMatrix(s, dir)
    val d0 = a0.flatten.map(math.abs).max / 1000000000L + 1L
    val a = a0.map(_.map(_ / d0))
    var v = Array.fill(CovDims)(PcaVScale)
    for (_ <- 1 to PcaIters) {
      val w = Array.tabulate(CovDims)(i =>
        (0 until CovDims).map(j => a(i)(j) * v(j)).sum)
      val m = w.map(math.abs).max
      val d = math.max(m / PcaVScale, 1L)
      v = w.map(_ / d)
    }
    val q = transform(col("embedding"),
      x => floor(x.cast("double") * DriftScale + 0.5).cast("long"))
    val score = (0 until CovDims)
      .map(i => element_at(col("q"), i + 1) * lit(v(i)))
      .reduce(_ + _)
    val vCols = (0 until CovDims).map(i => lit(v(i)).as(s"v$i"))
    Tables.embeddings(s, dir)
      .select(q.as("q"))
      .select(score.as("score"))
      .select(expr(s"score div $PcaBinW").as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_vecs"))
      .select(col("bin") +: col("n_vecs") +: vCols: _*)
      .orderBy(col("bin"))
  }

  /** Leading dimensions audited by [[qEmbeddingFisher]]. */
  val FisherDims = 8

  /** Shared-verbatim IEEE within-class scatter term over exact integer
    * per-(dim, label) stats: SS − S²/n, rounded to 6.
    */
  private def fisherWSql(ssg: String, sg: String, ng: String): String =
    s"round(CAST($ssg AS DOUBLE) - CAST($sg AS DOUBLE) * $sg / $ng, 6)"

  /** Shared-verbatim IEEE between-class scatter term: n_g·(m_g − m)²
    * with the mean difference spelled out twice (no pow — one fewer
    * engine-intrinsic to trust).
    */
  private def fisherBSql(ng: String, sg: String, nt: String, st: String): String = {
    val diff = s"(CAST($sg AS DOUBLE) / $ng - CAST($st AS DOUBLE) / $nt)"
    s"round($ng * $diff * $diff, 6)"
  }

  /** Per-dimension Fisher separability of the labeled embedding space —
    * the feature-quality score behind "which dimensions carry the label
    * signal?" (Fisher 1936's discriminant ratio, one-way-ANOVA F form):
    * F_d = [between-class scatter / (G−1)] / [within-class scatter /
    * (N−G)] over the [[FisherDims]] leading coordinates. Scale shape:
    * coordinates quantize to exact integers row-locally (the
    * [[qEmbeddingCov]] [[DriftScale]] grid), ONE map-side-combined
    * aggregation produces the (dim × label) integer sufficient
    * statistics (≤ FisherDims·|labels| rows — corpus-size independent),
    * and the scatter terms are shared-verbatim IEEE expressions over
    * that bounded frame, summed as DECIMAL(18,6) for order independence
    * (the PSI-total discipline). An isotropic synthetic space scores
    * F ≈ 1 on every dimension — the null the census correctly reports.
    */
  def qEmbeddingFisher(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = transform(col("embedding"),
      v => floor(v.cast("double") * DriftScale + 0.5).cast("long"))
    val wD = Window.partitionBy(col("d"))
    Tables.embeddings(s, dir)
      .select(col("label"),
        posexplode(slice(q, lit(1), lit(FisherDims))).as(Seq("d", "x")))
      .groupBy(col("d"), col("label"))
      .agg(count(lit(1)).as("ng"), sum(col("x")).as("sg"),
        sum(col("x") * col("x")).as("ssg"))
      .withColumn("nt", sum(col("ng")).over(wD))
      .withColumn("st", sum(col("sg")).over(wD))
      .withColumn("wterm", expr(fisherWSql("ssg", "sg", "ng")))
      .withColumn("bterm", expr(fisherBSql("ng", "sg", "nt", "st")))
      .groupBy(col("d"))
      .agg(max(col("nt")).as("n_vecs"),
        count(lit(1)).as("n_labels"),
        sum(col("wterm").cast("decimal(18,6)")).cast("double").as("within"),
        sum(col("bterm").cast("decimal(18,6)")).cast("double").as("between"))
      .select(col("d").cast("long").as("dim"), col("n_vecs"),
        col("n_labels"), col("within"), col("between"),
        when(col("within") > 0d, expr(
          "round(between * (n_vecs - n_labels)" +
            " / (within * (n_labels - 1)), 6)")).as("f"))
      .orderBy(col("dim"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embedding_fisher" -> qEmbeddingFisher,
    "q_embedding_norms" -> qEmbeddingNorms,
    "q_embedding_quantize" -> qEmbeddingQuantize,
    "q_embedding_drift" -> qEmbeddingDrift,
    "q_embedding_cov" -> qEmbeddingCov,
    "q_pca_project" -> qPcaProject
  )

  /** The PCA oracle's iteration CTE chain — [[PcaIters]] matvec /
    * rescale rounds unrolled (the BPE merge-CTE discipline). All
    * arithmetic BIGINT; `//` and Scala `/` both truncate toward zero,
    * so the chain lands on the driver loop's exact eigenvector.
    */
  private def pcaIterCtes: String = (1 to PcaIters).map { t =>
    val pv = s"vec${t - 1}"
    // single reference per CTE: the rescale divisor comes from a window
    // max INSIDE vec$t, not a separate CTE — DuckDB inlines CTEs, and a
    // divisor CTE referencing w$t twice makes the chain re-evaluate
    // exponentially across the $PcaIters levels
    s"""w$t AS (
       |  SELECT am.i AS i, CAST(sum(am.av * $pv.val) AS BIGINT) AS w
       |  FROM am JOIN $pv ON am.j = $pv.i GROUP BY am.i),
       |vec$t AS (SELECT i,
       |  w // greatest(max(abs(w)) OVER () // $PcaVScale, 1) AS val
       |  FROM w$t)""".stripMargin
  }.mkString(",\n")

  def oracleSql: Map[String, String] = Map(
    // identical integer grid, identical shared-verbatim scatter terms,
    // identical decimal-summed totals
    "q_embedding_fisher" ->
      s"""WITH ex AS (
         |  SELECT label, CAST(i - 1 AS BIGINT) AS d,
         |    CAST(floor(CAST(embedding[i] AS DOUBLE) * $DriftScale + 0.5)
         |      AS BIGINT) AS x
         |  FROM embeddings, (SELECT unnest(generate_series(1, $FisherDims))
         |    AS i) g),
         |st AS (
         |  SELECT d, label, CAST(count(*) AS BIGINT) AS ng,
         |    CAST(sum(x) AS BIGINT) AS sg,
         |    CAST(sum(x * x) AS BIGINT) AS ssg
         |  FROM ex GROUP BY d, label),
         |tw AS (
         |  SELECT d, label, ng, sg, ssg,
         |    CAST(sum(ng) OVER (PARTITION BY d) AS BIGINT) AS nt,
         |    CAST(sum(sg) OVER (PARTITION BY d) AS BIGINT) AS st
         |  FROM st),
         |tm AS (
         |  SELECT d, label, ng, nt,
         |    ${fisherWSql("ssg", "sg", "ng")} AS wterm,
         |    ${fisherBSql("ng", "sg", "nt", "st")} AS bterm
         |  FROM tw),
         |agg AS (
         |  SELECT d AS dim, CAST(max(nt) AS BIGINT) AS n_vecs,
         |    CAST(count(*) AS BIGINT) AS n_labels,
         |    CAST(sum(CAST(wterm AS DECIMAL(18,6))) AS DOUBLE) AS within,
         |    CAST(sum(CAST(bterm AS DECIMAL(18,6))) AS DOUBLE) AS between
         |  FROM tm GROUP BY d)
         |SELECT dim, n_vecs, n_labels, within, between,
         |  CASE WHEN within > 0 THEN
         |    round(between * (n_vecs - n_labels)
         |      / (within * (n_labels - 1)), 6) END AS f
         |FROM agg ORDER BY dim""".stripMargin,
    "q_pca_project" ->
      s"""WITH v AS (
         |  SELECT list_transform(embedding[1:$CovDims],
         |    x -> CAST(floor(CAST(x AS DOUBLE) * $DriftScale + 0.5) AS BIGINT)) AS q
         |  FROM embeddings),
         |ci AS (SELECT q, unnest(range(0, $CovDims)) AS i FROM v),
         |cij AS (SELECT q, i, unnest(range(0, $CovDims)) AS j FROM ci),
         |p AS (SELECT i, j, q[i + 1] AS xi, q[j + 1] AS xj FROM cij),
         |g AS (SELECT i, j, CAST(count(*) AS BIGINT) AS n_vecs,
         |    CAST(sum(xi * xj) AS BIGINT) AS s_xy,
         |    CAST(sum(xi) AS BIGINT) AS s_i,
         |    CAST(sum(xj) AS BIGINT) AS s_j
         |  FROM p GROUP BY i, j),
         |cn AS (SELECT i, j, n_vecs * s_xy - s_i * s_j AS c FROM g),
         |d0 AS (SELECT (max(abs(c)) // 1000000000) + 1 AS d FROM cn),
         |am AS (SELECT i, j, c // (SELECT d FROM d0) AS av FROM cn),
         |vec0 AS (SELECT unnest(range(0, $CovDims)) AS i,
         |  CAST($PcaVScale AS BIGINT) AS val),
         |$pcaIterCtes,
         |vv AS (SELECT list(val ORDER BY i) AS arr FROM vec$PcaIters),
         |sc AS (SELECT CAST(list_sum(list_transform(range(0, $CovDims),
         |    k -> q[k + 1] * arr[k + 1])) AS BIGINT) AS score
         |  FROM v CROSS JOIN vv),
         |h AS (SELECT score // $PcaBinW AS bin, count(*) AS n_vecs
         |  FROM sc GROUP BY 1)
         |SELECT h.bin, h.n_vecs,
         |  ${(0 until CovDims).map(i => s"arr[${i + 1}] AS v$i").mkString(", ")}
         |FROM h CROSS JOIN vv ORDER BY bin""".stripMargin,
    "q_embedding_norms" ->
      """WITH n AS (
        |  SELECT CAST(label AS BIGINT) AS label,
        |    round(sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS nrm
        |  FROM embeddings)
        |SELECT label, count(*) AS n_vecs,
        |  min(nrm) AS min_norm, max(nrm) AS max_norm,
        |  round(avg(nrm), 9) AS avg_norm
        |FROM n GROUP BY label ORDER BY label""".stripMargin,
    "q_embedding_quantize" ->
      s"""WITH v AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |  FROM embeddings),
         |m AS (
         |  SELECT vec_id, e,
         |    list_max(list_transform(e, x -> abs(x))) AS max_abs,
         |    len(e) AS n
         |  FROM v),
         |err AS (
         |  SELECT vec_id, max_abs, n,
         |    CASE WHEN max_abs = 0 THEN list_transform(e, x -> 0.0)
         |         ELSE list_transform(e, x ->
         |           abs(x - floor(x / (max_abs / $QuantLevels) + 0.5)
         |                 * (max_abs / $QuantLevels)))
         |    END AS errs
         |  FROM m)
         |SELECT vec_id, max_abs,
         |  list_max(errs) AS max_abs_err,
         |  round(list_sum(errs) / n, 9) AS mean_abs_err
         |FROM err ORDER BY vec_id""".stripMargin,
    "q_embedding_cov" ->
      s"""WITH v AS (
         |  SELECT list_transform(embedding[1:$CovDims],
         |    x -> CAST(floor(CAST(x AS DOUBLE) * $DriftScale + 0.5) AS BIGINT)) AS q
         |  FROM embeddings),
         |ci AS (SELECT q, unnest(range(0, $CovDims)) AS i FROM v),
         |cij AS (SELECT q, i, unnest(range(0, $CovDims)) AS j FROM ci),
         |p AS (SELECT i, j, q[i + 1] AS xi, q[j + 1] AS xj
         |  FROM cij WHERE i <= j),
         |g AS (SELECT i, j, CAST(count(*) AS BIGINT) AS n_vecs,
         |    CAST(sum(xi * xj) AS BIGINT) AS s_xy,
         |    CAST(sum(xi) AS BIGINT) AS s_i,
         |    CAST(sum(xj) AS BIGINT) AS s_j
         |  FROM p GROUP BY i, j)
         |SELECT i, j, n_vecs, s_xy, s_i, s_j,
         |  n_vecs * s_xy - s_i * s_j AS cov_num
         |FROM g ORDER BY i, j""".stripMargin,
    "q_embedding_drift" ->
      s"""WITH v AS (
         |  SELECT CAST(label AS BIGINT) AS label,
         |    list_transform(embedding,
         |      x -> CAST(floor(CAST(x AS DOUBLE) * $DriftScale + 0.5)
         |        AS BIGINT)) AS q
         |  FROM embeddings),
         |p AS (
         |  SELECT label,
         |    CAST(list_sum(q) AS BIGINT) AS m,
         |    CAST(list_sum(list_transform(q, x -> abs(x))) AS BIGINT) AS l1,
         |    CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS l2
         |  FROM v)
         |SELECT label, count(*) AS n_vecs,
         |  CAST(sum(m) AS BIGINT) AS sum_q,
         |  CAST(sum(l1) AS BIGINT) AS sum_q_abs,
         |  CAST(sum(l2) AS BIGINT) AS sum_q_sq
         |FROM p GROUP BY label ORDER BY label""".stripMargin
  )
}
