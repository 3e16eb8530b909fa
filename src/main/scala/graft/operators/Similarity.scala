package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions
import graft.tables.Tables

/** Similarity search over the `embeddings` table (`ARRAY<FLOAT>` × 64).
  *
  * Two paths, as a production ANN stack has:
  *   - [[qAnnBrute]] — exact brute-force top-k: broadcast the (small) query
  *     set against the corpus, one codegen'd cosine per (query, candidate),
  *     per-query top-k via window. This is the ground truth and the right
  *     plan whenever |queries| is small: cost |Q|·|N|, embarrassingly
  *     parallel over corpus partitions, no shuffle until the final top-k
  *     (which moves only |Q|·k rows).
  *   - [[qAnnLsh]] — LSH-bucketed: L hash tables of k sign-bits each;
  *     candidates are bucket collisions (equi-join, shuffle on bucket key),
  *     cosine computed only on candidates. At 100 TB this is the only
  *     viable shape: cost scales with collision count, not |N|².
  *   - [[qAnnRecall]] — the measurement that justifies the trade: per-query
  *     recall@k of LSH vs brute, as a query.
  *
  * Cosines go through [[VectorExpressions.vecCosine]] (native codegen
  * expression, bit-equal to the portable HOF path and the DuckDB oracle).
  */
object Similarity {

  /** Queries = vec_id < QueryCount; corpus = everything (self excluded). */
  val QueryCount = 10
  val TopK = 5
  /** L tables × k dims: table t uses coordinates {t + 4·i} — fixed stride
    * so the oracle SQL stays small; see Dedup for seeded random planes.
    * 4×6 bits probes ~6% of the corpus per table: on THIS corpus (isotropic
    * random vectors — LSH's worst case, no cluster structure) that buys
    * ~4-5× better-than-chance recall; on clustered real embeddings the same
    * structure concentrates sharply. [[qAnnRecall]] measures it either way.
    */
  val NumTables = 4
  val BitsPerTable = 6

  private def cosRounded(a: Column, b: Column): Column =
    round(VectorExpressions.vecCosine(a, b), 6)

  /** Shared verify tail for the candidate-generation paths: re-join
    * vectors onto a (query_id, vec_id) candidate set (broadcast for
    * queries, vec_id equi-join for the corpus), score, per-query top-k.
    */
  private def rankTopK(
      cand: DataFrame, queries: DataFrame, corpus: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    cand
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))), "query_id")
      .join(corpus, "vec_id")
      .select(col("query_id"), col("vec_id"),
        cosRounded(col("qv"), col("embedding")).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      .select(col("query_id"), col("rk").cast("long").as("rk"),
        col("vec_id"), col("cos"))
      .orderBy(col("query_id"), col("rk"))
  }

  private def table(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    (emb.filter(col("vec_id") < QueryCount), emb)
  }

  /** Exact top-k: broadcast queries × corpus, rank by (cos desc, vec_id). */
  def qAnnBrute(s: SparkSession, dir: String): DataFrame = {
    val (queries, corpus) = table(s, dir)
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("qv")))
      .join(corpus, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosRounded(col("qv"), col("embedding")).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      .select(col("query_id"), col("rk").cast("long").as("rk"),
        col("vec_id"), col("cos"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** Label allow-list for [[qAnnFiltered]]. */
  val FilterLabels: Seq[Int] = Seq(1, 2)

  /** METADATA-FILTERED vector search — the constrained-retrieval form
    * every production vector store needs (RAG over one tenant/language,
    * eval over one label). Strategy is PRE-filtering: the label predicate
    * is applied to the corpus scan BEFORE the |Q|·N scoring, so the exact
    * top-k is computed over exactly the admissible set and k always
    * fills. The alternative — POST-filtering an unfiltered ANN result —
    * under-fills k whenever fewer than k of the unfiltered neighbors pass
    * (with this corpus' 4 labels, an unfiltered top-5 keeps ~5/2 = 2.5
    * admissible rows on average), and over-fetch factors are a heuristic
    * patch; with a selective predicate the pre-filter is strictly better
    * and pushes to the parquet scan (plan-pinned). At index scale the
    * same split survives: IVF partition pruning composes with a pushed
    * metadata predicate (the persisted index of [[qAnnIvfIndex]] is
    * partitioned by cluster; a label subdirectory or row-group filter
    * plays the same role here).
    */
  def qAnnFiltered(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"),
        col("label").cast("long").as("label"))
    val queries = emb.filter(col("vec_id") < QueryCount)
    val corpus = emb.filter(col("label").isin(FilterLabels.map(_.toLong): _*))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qv")))
      .join(corpus, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        cosRounded(col("qv"), col("embedding")).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      .select(col("query_id"), col("rk").cast("long").as("rk"),
        col("vec_id"), col("label"), col("cos"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** Per-kind depth of the triplet-mining query. */
  val HardK = 3

  /** Hard-example mining for contrastive/triplet training (the
    * batch-mining strategy of FaceNet, Schroff et al. CVPR 2015, run
    * corpus-wide): per anchor (the [[QueryCount]] query vectors), the
    * [[HardK]] HARD NEGATIVES — most-similar vectors with a DIFFERENT
    * label — and the [[HardK]] HARD POSITIVES — least-similar vectors
    * with the SAME label. One scoring pass serves both sides: kind is
    * decided row-locally from the label pair, and a single window over
    * (anchor, kind) ranks by `when(neg, −cos).otherwise(cos)` ascending,
    * which is cos-descending for negatives and cos-ascending for
    * positives — no second window, no second scan. Scale: |Q|·N brute
    * scoring (the honest baseline, same as [[qAnnBrute]]); production
    * mining at corpus scale swaps the scorer for the ANN index
    * ([[qAnnIvfKmeans]]) and keeps the identical rank tail.
    */
  def qHardNegatives(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"),
        col("label").cast("long").as("label"))
    val anchors = emb.filter(col("vec_id") < QueryCount)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("label").as("qlabel"))
    val w = Window.partitionBy(col("query_id"), col("kind"))
      .orderBy(col("score").asc, col("vec_id").asc)
    broadcast(anchors)
      .join(emb, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        when(col("label") =!= col("qlabel"), "neg").otherwise("pos")
          .as("kind"),
        cosRounded(col("qv"), col("embedding")).as("cos"))
      .withColumn("score",
        when(col("kind") === "neg", -col("cos")).otherwise(col("cos")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= HardK)
      .select(col("query_id"), col("kind"), col("rk").cast("long").as("rk"),
        col("vec_id"), col("label"), col("cos"))
      .orderBy(col("query_id"), col("kind"), col("rk"))
  }

  /** Sign-bit bucket for hash table `t` (as a Column, so query-side probe
    * construction can parameterize over an exploded table id): bit i =
    * sign of coordinate t+4i. The hyperplane layout lives ONLY here —
    * corpus-side banding and query-side probing must always agree on it.
    */
  private def bucketColAt(v: Column, t: Column): Column =
    (0 until BitsPerTable)
      .map(i => when(element_at(v, t + lit(4 * i + 1)) >= 0f, lit(1L << i)).otherwise(0L))
      .reduce(_ + _)

  private def bucketCol(v: Column, t: Int): Column = bucketColAt(v, lit(t))

  /** Margin of bit i in table `t`: |coordinate| behind that sign bit —
    * same layout source as [[bucketColAt]].
    */
  private def marginStructs(v: Column, t: Column): Column =
    array_sort(array((0 until BitsPerTable).map(i =>
      struct(abs(element_at(v, t + lit(4 * i + 1))).as("m"),
        lit(i).as("i"))): _*))

  /** Candidate generation for all L tables: (table_id, bucket) keys. */
  private def bucketed(emb: DataFrame, idCol: String): DataFrame =
    emb.select(
      col(idCol),
      col("embedding"),
      explode(array((0 until NumTables).map(t =>
        struct(lit(t).as("t"), bucketCol(col("embedding"), t).as("bkt"))): _*)).as("tb"))
      .select(col(idCol), col("embedding"), col("tb.t"), col("tb.bkt"))

  /** LSH ANN: bucket-collision candidates (any of L tables), then exact
    * cosine + top-k on candidates only.
    */
  def qAnnLsh(s: SparkSession, dir: String): DataFrame = {
    val (queries, corpus) = table(s, dir)
    val qb = bucketed(
      queries.select(col("vec_id").as("query_id"), col("embedding")), "query_id")
      .select(col("query_id"), col("t"), col("bkt"))
    val cb = bucketed(corpus, "vec_id").select(col("vec_id"), col("t"), col("bkt"))
    // dedup multi-table collisions on the (query, candidate) KEYS only —
    // a distinct over rows still carrying both embedding arrays would
    // shuffle ~30× the bytes; vectors re-join after the candidate set is
    // small (broadcast for queries, vec_id equi-join against the corpus)
    val cand = broadcast(qb)
      .join(cb, qb("t") === cb("t") && qb("bkt") === cb("bkt") &&
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct()
    rankTopK(cand, queries, corpus)
  }

  /** Multi-probe LSH: each query additionally probes every Hamming-1
    * neighbor of its bucket in every table — (k+1)·L probes instead of L,
    * recovering candidates that differ by one unlucky sign bit. The probe
    * fan-out multiplies only the (tiny, broadcast) query side; the corpus
    * side is untouched, so the scale shape is identical to [[qAnnLsh]].
    */
  def qAnnMultiprobe(s: SparkSession, dir: String): DataFrame = {
    val (queries, corpus) = table(s, dir)
    val probes = bucketed(
      queries.select(col("vec_id").as("query_id"), col("embedding")), "query_id")
      .select(col("query_id"), col("t"),
        explode(array(
          col("bkt") +: (0 until BitsPerTable).map(i =>
            col("bkt").bitwiseXOR(lit(1L << i))): _*)).as("bkt"))
    val cb = bucketed(corpus, "vec_id").select(col("vec_id"), col("t"), col("bkt"))
    val cand = broadcast(probes)
      .join(cb, Seq("t", "bkt"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct()
    rankTopK(cand, queries, corpus)
  }

  /** Directed probes per table: the base bucket plus flips of the
    * [[ProbesDirected]] sign bits with the smallest |coordinate| margin.
    */
  val ProbesDirected = 3

  /** Query-directed multi-probe LSH: instead of probing ALL Hamming-1
    * neighbors (multi-probe's (k+1)·L fan-out), each query probes only the
    * [[ProbesDirected]] flips whose hyperplane margin |v[coord]| is
    * smallest — the bits most likely to disagree with a true neighbor
    * (Lv et al., *Multi-Probe LSH*, VLDB 2007). Probe cost drops from
    * (k+1)·L = 28 to (1+P)·L = 16 keys per query while keeping most of the
    * recall; like [[qAnnMultiprobe]], the fan-out touches only the tiny
    * broadcast query side, so corpus-side cost is unchanged.
    */
  def qAnnLshDirected(s: SparkSession, dir: String): DataFrame = {
    val (queries, corpus) = table(s, dir)
    // explode the table id FIRST, then build one t-parameterized probe
    // tree — 4× smaller than inlining every table's expressions (which
    // cost ~1s of analysis + janino per pass on the composed form).
    // (margin, bit) structs sort ascending with field-order compare, so
    // margin ties break toward the lower bit index, mirroring the
    // oracle's list_sort over the same structs.
    val t = col("t")
    val bkt = bucketColAt(col("embedding"), t)
    val byMargin = marginStructs(col("embedding"), t)
    // 1L << bit as a when-chain (the DSL's shiftleft only takes a
    // literal shift); 6 branches, codegen'd to a switch
    def pow2(bit: Column): Column =
      (0 until BitsPerTable).foldLeft(lit(0L))((acc, i) =>
        when(bit === i, lit(1L << i)).otherwise(acc))
    val probeArr = array(
      bkt +: (1 to ProbesDirected).map(j =>
        bkt.bitwiseXOR(pow2(element_at(byMargin, j).getField("i")))): _*)
    val probes = queries
      .select(col("vec_id").as("query_id"), col("embedding"),
        explode(array((0 until NumTables).map(lit): _*)).as("t"))
      .select(col("query_id"), t, explode(probeArr).as("bkt"))
    val cb = bucketed(corpus, "vec_id").select(col("vec_id"), col("t"), col("bkt"))
    val cand = broadcast(probes)
      .join(cb, Seq("t", "bkt"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct()
    rankTopK(cand, queries, corpus)
  }

  /** Recall@k of the LSH paths (single-probe and multi-probe) against
    * brute-force ground truth, per query — the measurement that justifies
    * the probe fan-out.
    */
  def qAnnRecall(s: SparkSession, dir: String): DataFrame = {
    val brute = qAnnBrute(s, dir).select(col("query_id"), col("vec_id"))
    val lsh = qAnnLsh(s, dir).select(
      col("query_id").as("l_query_id"), col("vec_id").as("l_vec_id"))
    val multi = qAnnMultiprobe(s, dir).select(
      col("query_id").as("m_query_id"), col("vec_id").as("m_vec_id"))
    val directed = qAnnLshDirected(s, dir).select(
      col("query_id").as("d_query_id"), col("vec_id").as("d_vec_id"))
    brute
      .join(lsh,
        col("query_id") === col("l_query_id") && col("vec_id") === col("l_vec_id"),
        "left_outer")
      .join(multi,
        col("query_id") === col("m_query_id") && col("vec_id") === col("m_vec_id"),
        "left_outer")
      .join(directed,
        col("query_id") === col("d_query_id") && col("vec_id") === col("d_vec_id"),
        "left_outer")
      .groupBy(col("query_id"))
      .agg(
        (sum(when(col("l_vec_id").isNotNull, 1).otherwise(0)).cast("double") /
          count(lit(1))).as("recall_at_k"),
        (sum(when(col("m_vec_id").isNotNull, 1).otherwise(0)).cast("double") /
          count(lit(1))).as("recall_multiprobe"),
        (sum(when(col("d_vec_id").isNotNull, 1).otherwise(0)).cast("double") /
          count(lit(1))).as("recall_directed"))
      .orderBy(col("query_id"))
  }

  /** Integer ppb discounts 1/log2(i+1), i = 1..[[TopK]], precomputed
    * driver-side and inlined as the SAME literals into the plan and the
    * oracle — the shared-verbatim-constant discipline, here because the
    * two engines' log2 may differ in the last ulp.
    */
  private[operators] val NdcgDiscPpb: Seq[Long] =
    (1 to TopK).map(i =>
      math.round(1e9 / (math.log(i + 1.0) / math.log(2.0))))

  /** Ideal DCG mass: the true top-k in perfect order. */
  private[operators] val NdcgIdealPpb: Long =
    (1 to TopK).map(i => (TopK + 1 - i).toLong * NdcgDiscPpb(i - 1)).sum

  /** NDCG@k of the k-means IVF ranking against brute-force ground truth
    * — the ORDER-sensitive retrieval metric recall@k cannot see (an index
    * returning the right set in the wrong order scores 1.0 on recall,
    * < 1.0 here). Graded relevance of candidate v = k+1 − its true rank
    * (0 if outside the true top-k); DCG accumulates rel·disc(position)
    * in EXACT ppb integers (relevances are small ints, discounts are the
    * shared integer literals above), so the only float in the query is
    * the final division by the ideal mass — bit-stable cross-engine with
    * no summation-order hazard. One broadcast-sized join between two
    * |Q|·k rankings.
    */
  def qAnnNdcg(s: SparkSession, dir: String): DataFrame = {
    val truth = qAnnBrute(s, dir).select(col("query_id"), col("vec_id"),
      (lit(TopK + 1L) - col("rk")).as("rel"))
    val cand = qAnnIvfKmeans(s, dir)
      .select(col("query_id").as("c_query_id"), col("rk"), col("vec_id")
        .as("c_vec_id"))
    cand
      .join(truth,
        col("c_query_id") === col("query_id") &&
          col("c_vec_id") === col("vec_id"), "left_outer")
      .select(col("c_query_id").as("query_id"),
        (coalesce(col("rel"), lit(0L)) *
          element_at(typedLit(NdcgDiscPpb), col("rk").cast("int")))
          .as("g"))
      .groupBy(col("query_id"))
      .agg(sum(col("g")).as("dcg_ppb"))
      .select(col("query_id"), col("dcg_ppb"),
        (col("dcg_ppb").cast("double") / lit(NdcgIdealPpb.toDouble))
          .as("ndcg"))
      .orderBy(col("query_id"))
  }

  /** Recall@k of the two IVF paths (stand-in centroids and k-means-trained)
    * against brute-force ground truth — quantifies the probe-one-cluster
    * tradeoff: scanning |N|/k of the corpus bounds recall by how often a
    * true neighbor shares the query's cluster.
    *
    * Measured at sf0.01: stand-in 0.90, k-means 0.28. The stand-in's high
    * number is an artifact, not index quality — its "centroids" are the
    * first k vectors, which CONTAIN the query set, so every query probes
    * the cluster centered on itself and its neighbors follow it there.
    * The trained index moves centroids to data means and reports the
    * honest rate for probing 1/16 of an isotropic corpus (~4× the 1/16
    * chance rate; real clustered embeddings would score far higher).
    */
  def qAnnRecallIvf(s: SparkSession, dir: String): DataFrame = {
    val brute = qAnnBrute(s, dir).select(col("query_id"), col("vec_id"))
    val ivf = qAnnIvf(s, dir).select(
      col("query_id").as("i_query_id"), col("vec_id").as("i_vec_id"))
    val km = qAnnIvfKmeans(s, dir).select(
      col("query_id").as("k_query_id"), col("vec_id").as("k_vec_id"))
    brute
      .join(ivf,
        col("query_id") === col("i_query_id") && col("vec_id") === col("i_vec_id"),
        "left_outer")
      .join(km,
        col("query_id") === col("k_query_id") && col("vec_id") === col("k_vec_id"),
        "left_outer")
      .groupBy(col("query_id"))
      .agg(
        (sum(when(col("i_vec_id").isNotNull, 1).otherwise(0)).cast("double") /
          count(lit(1))).as("recall_ivf"),
        (sum(when(col("k_vec_id").isNotNull, 1).otherwise(0)).cast("double") /
          count(lit(1))).as("recall_ivf_kmeans"))
      .orderBy(col("query_id"))
  }

  /** IVF centroid count (deterministic "training": the first k vectors act
    * as centroids — a seeded k-means would drop in here; the partition/
    * probe machinery is identical and that is what this query exercises).
    */
  val IvfCentroids = 16

  /** IVF-style ANN: corpus vectors are assigned to their nearest centroid
    * (inverted lists); a query probes only its own nearest centroid's list.
    * Cost per query falls from |N| to |N|/k on balanced lists — the
    * centroid assignment is the one-time "index build" (at 100 TB: a write
    * partitioned by cluster_id, so probes are partition-pruned scans).
    */
  /** Stand-in centroids (the first k vectors) collected to the driver —
    * the same bounded k·Dim roundtrip the k-means init performs.
    */
  private def standInCentroids(emb: DataFrame): Seq[(Long, Array[Double])] =
    emb.filter(col("vec_id") < IvfCentroids)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1).toSeq

  /** The IVF index-build stage: every corpus vector assigned to its nearest
    * stand-in centroid ROW-LOCALLY via the codegen'd [[assignExpr]] loop.
    * The round-1 formulation cross-joined the corpus against broadcast
    * centroids and ranked with row_number() over a Window partitioned by
    * vec_id: that window shuffles N·k rows through an Exchange purely to
    * compute a row-local argmax — 16× the corpus, a scale-killer at
    * 100 TB. This plan has NO Exchange and no Window (asserted by
    * PlanRegressionSpec).
    */
  private[graft] def ivfAssigned(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    emb.select(col("vec_id"), col("embedding"),
      assignExpr(standInCentroids(emb)).as("c_id"))
  }

  def qAnnIvf(s: SparkSession, dir: String): DataFrame = {
    val assigned = ivfAssigned(s, dir)
    val probes = assigned.filter(col("vec_id") < QueryCount)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("c_id"))

    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    broadcast(probes)
      .join(assigned, Seq("c_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosRounded(col("qv"), col("embedding")).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      .select(col("query_id"), col("rk").cast("long").as("rk"),
        col("vec_id"), col("cos"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** Root for the persisted IVF index (under java.io.tmpdir; one directory
    * per source dataset, rebuilt idempotently with mode=overwrite).
    */
  private def ivfIndexPath(dir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_ivf_index/" +
      new java.io.File(dir).getName

  /** IVF with a PERSISTED index — the design the inline [[qAnnIvf]] only
    * promises: the one-time index build writes the assignment partitioned
    * by `c_id` to parquet; a query then (a) assigns its probe vector
    * row-locally, (b) reads back ONLY the probed clusters' partitions —
    * the `c_id IN (…)` filter is a PartitionFilter, so the scan touches
    * 1..|probes| of [[IvfCentroids]] directories and never the rest of the
    * corpus (asserted by PlanRegressionSpec). At 100 TB this is the shape
    * that makes IVF pay: index build is one scan + one partitioned write,
    * and each query reads |N|/k, not |N|. Results are identical to
    * [[qAnnIvf]] (same centroids, assignment, scoring), so it shares the
    * oracle.
    */
  def qAnnIvfIndex(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val cent = standInCentroids(emb)
    val path = ivfIndexPath(dir)

    // index build (idempotent overwrite): row-local assignment, written
    // clustered by c_id — the partition layout IS the inverted list
    emb.select(col("vec_id"), col("embedding"), assignExpr(cent).as("c_id"))
      .write.mode("overwrite").partitionBy("c_id").parquet(path)

    // probes assign row-locally from the base table (no index scan needed);
    // their cluster ids are a bounded |Q|-row collect
    val probes = emb.filter(col("vec_id") < QueryCount)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        assignExpr(cent).as("c_id"))
    val probedClusters = probes.select(col("c_id")).distinct()
      .collect().map(_.getLong(0)).sorted

    // partition-pruned probe: only the probed clusters' directories are read
    val lists = s.read.parquet(path)
      .filter(col("c_id").isin(probedClusters.map(Long.box): _*))

    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    broadcast(probes)
      .join(lists, Seq("c_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosRounded(col("qv"), col("embedding")).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      .select(col("query_id"), col("rk").cast("long").as("rk"),
        col("vec_id"), col("cos"))
      .orderBy(col("query_id"), col("rk"))
  }

  // ------------------------------------------------------- trained IVF

  /** Embedding dimensionality of the corpus (TESTDATA.md). */
  val Dim = 64

  /** Lloyd iterations for the trained-centroid IVF variant. */
  val KmeansIters = 2

  /** Coordinate quantizer: floor(x·10⁷ + 0.5) as a long. Pure IEEE double
    * ops + floor, so Spark and DuckDB produce identical integers — which
    * makes the whole k-means training EXACT (order-independent bigint sums,
    * no float-accumulation drift between engines).
    */
  private def quantLong(c: Column): Column =
    floor(c.cast("double") * lit(1e7) + lit(0.5)).cast("long")

  /** Row-local nearest-centroid id against driver-collected centroids
    * (exact integer sums carried as doubles) — no shuffle, no window.
    * One custom codegen'd loop ([[VectorExpressions.nearestCentroid]]);
    * ties on the rounded cosine break toward the smaller c_id, matching
    * the oracle's `ORDER BY cos DESC, c_id`. [[assignExprPortable]] is the
    * built-in-only formulation it is proven equal to (SimilaritySpec);
    * the composed form re-analyzed and re-compiled 16 literal-array
    * cosine subtrees per Lloyd iteration — 2.5s of the query's 4s.
    */
  private[operators] def assignExpr(cent: Seq[(Long, Array[Double])]): Column =
    VectorExpressions.nearestCentroid(col("embedding"), cent)

  /** Built-ins-only assignment (argmax via array_min over (−cos, c_id)
    * structs) — the reference semantics for [[assignExpr]].
    */
  private[operators] def assignExprPortable(cent: Seq[(Long, Array[Double])]): Column =
    array_min(array(cent.map { case (id, cv) =>
      struct((-cosRounded(col("embedding"), typedLit(cv))).as("neg"),
        lit(id).as("c_id"))
    }: _*)).getField("c_id")

  /** One Lloyd step: assign each vector row-locally, then per-centroid
    * element-wise SUM of quantized coordinates (cosine is scale-invariant,
    * so the sum direction ≡ the mean direction — skipping the division
    * keeps everything in exact integer arithmetic). The shuffle moves only
    * k·Dim = 1024 partial sums; the 1024-row collect per iteration is the
    * same driver-roundtrip shape Spark MLlib's KMeans uses.
    */
  private def lloydStep(
      emb: DataFrame, cent: Seq[(Long, Array[Double])],
      dim: Int = Dim): Seq[(Long, Array[Double])] = {
    val sums = emb
      .select(assignExpr(cent).as("c_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("c_id"), col("pos"))
      .agg(sum(quantLong(col("v"))).as("s"))
      .collect()
    sums.groupBy(_.getLong(0)).toSeq.map { case (id, rows) =>
      val arr = new Array[Double](dim)
      rows.foreach(r => arr(r.getInt(1)) = r.getLong(2).toDouble)
      (id, arr)
    }.sortBy(_._1)
  }

  /** Trained centroids memoized per (session, corpus dir): the seeded
    * k-means training (init scan + [[KmeansIters]] Lloyd scans) is a
    * one-time index-build cost that [[qAnnIvfKmeans]], [[qAnnRecallIvf]]
    * and [[qDedupSemantic]] all need for the SAME corpus — a production
    * pipeline trains once and reuses the centroid table. The values are
    * k·Dim doubles (bounded, driver-side); entries are evicted when their
    * session's SparkContext ends so a long-lived multi-session process
    * does not retain stopped sessions (same lifecycle pattern as
    * Dedup.componentCache). Training is deterministic in the corpus, so
    * memoization is invisible to results (SimilaritySpec pins run-to-run
    * equality). Assumes the dir's parquet is immutable in-session.
    * Concurrency: [[SessionMemo]] — training runs outside the map lock,
    * so it no longer blocks unrelated sessions/dirs.
    */
  private val centroidCache = new SessionMemo[Seq[(Long, Array[Double])]]()
  private[operators] def trainedCentroids(
      s: SparkSession, dir: String): Seq[(Long, Array[Double])] =
    centroidCache.getOrElseUpdate(s, dir) {
        val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
        (1 to KmeansIters).foldLeft(seedRows(s, dir))((c, _) => lloydStep(emb, c))
    }

  /** The shared k-means seed: the [[IvfCentroids]] md5-ordered vectors,
    * quantized — the SAME rows seed the full-dim IVF training and every
    * PQ subspace (the subspace seed is a slice, and slice∘quantize ≡
    * quantize∘slice elementwise), so the collect runs once per
    * (session, corpus) instead of once per training (r15). Consumers
    * never mutate the arrays (Lloyd steps build fresh ones; assignment
    * reads them as literals).
    */
  private val seedCache = new SessionMemo[Seq[(Long, Array[Double])]]()
  private def seedRows(
      s: SparkSession, dir: String): Seq[(Long, Array[Double])] =
    seedCache.getOrElseUpdate(s, dir) {
      Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
        .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
        .limit(IvfCentroids)
        .collect()
        .map { r =>
          val v = r.getSeq[Float](1)
          (r.getLong(0),
            v.map(x => math.floor(x.toDouble * 1e7 + 0.5)).toArray)
        }.sortBy(_._1).toSeq
    }

  /** IVF with TRAINED centroids: seeded k-means (init = a deterministic
    * pseudo-random sample — the k vectors smallest in md5(vec_id) order,
    * so seeding is independent of ingestion order, unlike first-k; then
    * [[KmeansIters]] exact Lloyd steps as above), then the same
    * inverted-list probe as [[qAnnIvf]]. At 100 TB the training cost is
    * k·Dim longs over the wire per iteration — negligible — and the final
    * assignment is a row-local expression, so the index build is one scan
    * per iteration plus one for the partitioned write.
    */
  def qAnnIvfKmeans(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val cent = trainedCentroids(s, dir)

    val assigned = emb.select(col("vec_id"), col("embedding"), assignExpr(cent).as("c_id"))
    val probes = assigned.filter(col("vec_id") < QueryCount)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("c_id"))

    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    broadcast(probes)
      .join(assigned, Seq("c_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosRounded(col("qv"), col("embedding")).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      .select(col("query_id"), col("rk").cast("long").as("rk"),
        col("vec_id"), col("cos"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** SemDeDup cosine threshold: only near-identical vectors count as
    * semantic duplicates (the planted exact copies score 1.0; random
    * isotropic pairs at Dim=64 concentrate near 0, so organic
    * false-positive pairs are ~impossible at 0.95).
    */
  val SemDedupCos = 0.95

  /** Semantic dedup (SemDeDup, Abbas et al. 2023, arXiv:2303.09540):
    * cluster the corpus with the k-means index, then find near-duplicate
    * pairs ONLY within a cluster — the cluster assignment bounds the
    * pairwise cost to Σ|cluster|² instead of |N|², which is the entire
    * trick that makes embedding dedup feasible at 100 TB (k grows with N
    * to hold |cluster| ≈ N/k constant; the join shuffles on c_id so each
    * cluster's pairs are generated partition-locally). Corpus = base ∪
    * planted identical copies (the [[Dedup]] convention); training uses
    * the base table via [[trainedCentroids]] — shared with the ANN
    * queries, as a production pipeline shares its index. Output: one row
    * per cluster — size, duplicate-pair count, and how many vectors a
    * keep-smallest-id policy drops.
    */
  def qDedupSemantic(s: SparkSession, dir: String): DataFrame = {
    val cent = trainedCentroids(s, dir)
    val base = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val corpus = base.union(base.select(
      (col("vec_id") + Dedup.PlantOffset).as("vec_id"), col("embedding")))
    val assigned = corpus
      .select(col("vec_id"), col("embedding"), assignExpr(cent).as("c_id"))
    val pairs = assigned.as("a")
      .join(assigned.as("b"),
        col("a.c_id") === col("b.c_id") && col("a.vec_id") < col("b.vec_id"))
      .filter(cosRounded(col("a.embedding"), col("b.embedding")) >= SemDedupCos)
      .select(col("a.c_id").as("c_id"), col("b.vec_id").as("b_id"))
    val perCluster = pairs.groupBy(col("c_id")).agg(
      count(lit(1)).as("n_dup_pairs"),
      countDistinct(col("b_id")).as("n_dropped"))
    assigned.groupBy(col("c_id")).agg(count(lit(1)).as("n_vectors"))
      .join(perCluster, Seq("c_id"), "left_outer")
      .select(col("c_id"), col("n_vectors"),
        coalesce(col("n_dup_pairs"), lit(0L)).as("n_dup_pairs"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"))
      .orderBy(col("c_id"))
  }

  /** Product-quantization geometry: [[PqM]] subspaces of [[PqSubDim]]
    * coordinates each, [[IvfCentroids]] codewords per subspace — the
    * 64-dim vector compresses to 4 bytes of codes.
    */
  val PqM = 4
  val PqSubDim: Int = Dim / PqM

  /** Per-subspace codebooks (spherical PQ: the same seeded cosine
    * k-means as [[trainedCentroids]], run independently on each
    * coordinate slice). Memoized like the IVF centroids — a production
    * pipeline trains the codebook once per corpus.
    */
  private val pqCache = new SessionMemo[Seq[Seq[(Long, Array[Double])]]]()
  private[operators] def pqCodebooks(
      s: SparkSession, dir: String): Seq[Seq[(Long, Array[Double])]] =
    pqCache.getOrElseUpdate(s, dir) {
      // One job per training step for ALL [[PqM]] subspaces (r15): the
      // per-subspace loops ran 4 × (1 init collect + KmeansIters Lloyd
      // collects) = 12 jobs over the same embeddings scan; the subspaces
      // train independently but their scans/shuffles are fused — the
      // seed rows are the SAME md5-ordered vectors for every subspace
      // (one collect, sliced driver-side; slice∘quantize ≡ quantize∘
      // slice elementwise), and each Lloyd step assigns all 4 slices in
      // one pass, aggregating partial sums keyed by (m, c_id, pos).
      // Bit-identical to the per-subspace loop: assignment and the
      // exact-integer sum per (centroid, coordinate) are unchanged, the
      // keys just carry m (SimilaritySpec pins run-to-run equality; the
      // oracle re-derives the codebooks from scratch).
      val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val initRows: Seq[(Long, Array[Double])] = seedRows(s, dir)
      val init: Seq[Seq[(Long, Array[Double])]] = (0 until PqM).map(m =>
        initRows.map { case (id, v) =>
          (id, java.util.Arrays.copyOfRange(v, m * PqSubDim, (m + 1) * PqSubDim))
        })
      (1 to KmeansIters).foldLeft(init)((books, _) => lloydStepAll(emb, books))
    }

  /** One Lloyd step over ALL [[PqM]] subspace codebooks in a single
    * scan + shuffle + collect — [[lloydStep]] with the subspace index
    * carried through the aggregation key.
    */
  private def lloydStepAll(
      emb: DataFrame,
      books: Seq[Seq[(Long, Array[Double])]]): Seq[Seq[(Long, Array[Double])]] = {
    val subs = books.indices.map { m =>
      val sub = slice(col("embedding"), m * PqSubDim + 1, PqSubDim)
      struct(lit(m).as("m"),
        VectorExpressions.nearestCentroid(sub, books(m)).as("c_id"),
        sub.as("v"))
    }
    val sums = emb
      .select(explode(array(subs: _*)).as("sc"))
      .select(col("sc.m").as("m"), col("sc.c_id").as("c_id"),
        posexplode(col("sc.v")).as(Seq("pos", "v")))
      .groupBy(col("m"), col("c_id"), col("pos"))
      .agg(sum(quantLong(col("v"))).as("s"))
      .collect()
    books.indices.map { m =>
      sums.filter(_.getInt(0) == m).groupBy(_.getLong(1)).toSeq.map {
        case (id, rows) =>
          val arr = new Array[Double](PqSubDim)
          rows.foreach(r => arr(r.getInt(2)) = r.getLong(3).toDouble)
          (id, arr)
      }.sortBy(_._1)
    }
  }

  /** Product-quantization codebook train + encode census (Jégou et al.,
    * TPAMI 2011, spherical variant) — the vector-compression stage of a
    * production ANN index (IVF-PQ): each [[PqSubDim]]-coordinate slice
    * quantizes independently against its own [[IvfCentroids]]-codeword
    * codebook, so the 64-float vector stores as [[PqM]] single-byte
    * codes. Training is the same exact-integer seeded Lloyd machinery as
    * the IVF index, per subspace; encoding is a row-local
    * nearest-centroid expression per slice (one corpus scan, no
    * shuffle); the census aggregates to the m×codeword grid — codeword
    * usage plus an exact-integer fit mass (Σ ppm-quantized cosine of
    * each slice to its codeword), the quantization-quality surface an
    * index operator monitors. Scale shape: training ships k·d longs per
    * iteration; encode is embarrassingly parallel; the output frame is
    * 64 cells regardless of corpus size.
    */
  def qPqCodebook(s: SparkSession, dir: String): DataFrame = {
    val books = pqCodebooks(s, dir)
    val subStructs = (0 until PqM).map { m =>
      val sub = slice(col("embedding"), m * PqSubDim + 1, PqSubDim)
      val fit = array_max(array(books(m).map { case (_, cv) =>
        cosRounded(sub, typedLit(cv.toSeq)) }: _*))
      struct(lit(m.toLong).as("m"),
        VectorExpressions.nearestCentroid(sub, books(m)).as("code"),
        floor(fit * 1e6 + lit(0.5)).cast("long").as("fit_ppm"))
    }
    Tables.embeddings(s, dir)
      .select(col("vec_id"), explode(array(subStructs: _*)).as("sc"))
      .select(col("vec_id"), col("sc.m").as("m"), col("sc.code").as("code"),
        col("sc.fit_ppm").as("fit_ppm"))
      .groupBy(col("m"), col("code"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(col("fit_ppm")).as("fit_ppm_sum"),
        min(col("vec_id")).as("min_vec"))
      .orderBy(col("m"), col("code"))
  }

  /** ADC top-k search over the PQ codes (Jégou et al., TPAMI 2011 —
    * asymmetric distance computation, spherical variant): the query stays
    * FULL-PRECISION while every corpus vector is represented only by its
    * [[PqM]] codes, and the score is Σ_m cos(query-slice_m,
    * codeword(code_m)) — per-subspace rounded-6 cosines against the
    * BROADCAST codebook literals, so scoring a vector is [[PqM]] table
    * lookups instead of a [[Dim]]-float dot: the memory/bandwidth shape
    * that lets a 100 TB index hold codes in RAM and stream nothing else.
    * Ranking mirrors [[qAnnBrute]] (score desc, vec_id tiebreak, self
    * excluded); the quality loss vs the exact ranking is measured by the
    * gate-checked rows themselves (compare to q_ann_brute per query).
    * Scale shape: encode is row-local, the query side is
    * [[QueryCount]]-row broadcast, no shuffle beyond the per-query
    * window over candidate rows.
    */
  /** (query_id, m, code, sterm): the per-query ADC lookup table — every
    * (subspace, codeword) cosine against each query, ppm-quantized. 64
    * Spark-side cosines over [[QueryCount]] rows (the SAME arithmetic the
    * oracle replays), exploded to [[QueryCount]]·[[PqM]]·16 rows and
    * broadcast — the table ADC actually indexes into.
    */
  private def pqAdcLut(
      queries: DataFrame, books: Seq[Seq[(Long, Array[Double])]]): DataFrame =
    queries.select(col("query_id"), explode(array(
      (for {
        m <- 0 until PqM
        (id, cw) <- books(m)
      } yield struct(lit(m.toLong).as("m"), lit(id).as("code"),
        floor(cosRounded(
          slice(col("qv"), m * PqSubDim + 1, PqSubDim),
          typedLit(cw.toSeq)) * 1e6 + lit(0.5)).cast("long").as("sterm"))
      ): _*)).as("e"))
      .select(col("query_id"), col("e.m").as("m"), col("e.code").as("code"),
        col("e.sterm").as("sterm"))

  def qPqSearch(s: SparkSession, dir: String): DataFrame = {
    val books = pqCodebooks(s, dir)
    // per-subspace terms quantized to exact ppm integers BEFORE the sum:
    // a double Σ of four rounded cosines is summation-order-sensitive in
    // the last ulp across engines; the integer sum is not. Scoring is
    // the literal ADC formulation: the corpus carries CODES only,
    // exploded to (vec, m, code) rows and joined against the broadcast
    // per-query lookup table — one broadcast hash join + one exact
    // integer aggregation, no per-row branch ladder (the 64-branch
    // CaseWhen formulation measured 3.2 s at sf0.1; this shape is the
    // join Catalyst codegens flat).
    val encE = Tables.embeddings(s, dir)
      .select(col("vec_id"), explode(array((0 until PqM).map { m =>
        struct(lit(m.toLong).as("m"),
          VectorExpressions.nearestCentroid(
            slice(col("embedding"), m * PqSubDim + 1, PqSubDim), books(m))
            .as("code"))
      }: _*)).as("e"))
      .select(col("vec_id"), col("e.m").as("m"), col("e.code").as("code"))
    val queries = Tables.embeddings(s, dir)
      .filter(col("vec_id") < QueryCount)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_ppm").desc, col("vec_id"))
    encE
      .join(broadcast(pqAdcLut(queries, books)), Seq("m", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("sterm")).as("score_ppm"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      .select(col("query_id"), col("rk").cast("long").as("rk"),
        col("vec_id"), col("score_ppm"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** IVF-PQ — the production ANN index composition (Jégou et al., TPAMI
    * 2011; the Faiss default architecture): the COARSE quantizer (the
    * shared [[trainedCentroids]] k-means) prunes the corpus to the
    * query's own cluster, and the FINE quantizer (the shared
    * [[pqCodebooks]]) scores the survivors by ADC lookups instead of
    * full-precision dots. Both stages are row-local expressions against
    * broadcast literals; the candidate set is cluster-bounded (|N|/k
    * expected), so per query the work is |cluster| · [[PqM]] lookups —
    * the shape that serves billion-vector indexes from RAM. Ranking and
    * exact-ppm scoring as in [[qPqSearch]]; recall differences vs
    * q_pq_search (full-corpus ADC) and q_ann_ivf_kmeans (cluster +
    * exact) quantify what each stage costs, all three gate-checked.
    */
  def qAnnIvfPq(s: SparkSession, dir: String): DataFrame = {
    val cent = trainedCentroids(s, dir)
    val books = pqCodebooks(s, dir)
    val codeCols = (0 until PqM).map { m =>
      VectorExpressions.nearestCentroid(
        slice(col("embedding"), m * PqSubDim + 1, PqSubDim), books(m))
        .as(s"code$m")
    }
    val enc = Tables.embeddings(s, dir)
      .select(col("vec_id") +: assignExpr(cent).as("c_id") +: codeCols: _*)
    val queries = Tables.embeddings(s, dir)
      .filter(col("vec_id") < QueryCount)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        assignExpr(cent).as("c_id"))
    val adc = (0 until PqM).map { m =>
      val qSub = slice(col("qv"), m * PqSubDim + 1, PqSubDim)
      val cosm = books(m).foldLeft(lit(0.0)) { case (acc, (id, cw)) =>
        when(col(s"code$m") === id, cosRounded(qSub, typedLit(cw.toSeq)))
          .otherwise(acc)
      }
      floor(cosm * 1e6 + lit(0.5)).cast("long")
    }.reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_ppm").desc, col("vec_id"))
    broadcast(queries)
      .join(enc, Seq("c_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score_ppm", adc)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      .select(col("query_id"), col("rk").cast("long").as("rk"),
        col("vec_id"), col("score_ppm"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** Neighbors per vector in [[qKnnGraph]]. */
  val KnnGraphK = 3

  /** Mutual-kNN graph construction — the k-NN-graph stage every
    * embedding-space pipeline builds before graph clustering,
    * de-outliering, or diffusion (mutual edges are the standard noise
    * filter: an edge survives only if BOTH endpoints rank each other in
    * their top-k, which kills hub-induced asymmetric links). Same
    * Σ|cluster|² feasibility trick as [[qDedupSemantic]]: candidate
    * neighbors come only from the vector's own k-means cluster (the
    * shared [[trainedCentroids]] index), so the pairwise cost is bounded
    * by the cluster profile, never |N|². Per-vector top-k is a window
    * over the candidate list — partition key is the VECTOR id
    * (high-cardinality, ≤ |cluster| rows per partition), not a funnel.
    * Mutuality needs no self-join: directed edges collapse onto the
    * unordered pair (cosine is symmetric), and mutual ⟺ both directions
    * present ⟺ pair count = 2 — one aggregation on the pair key.
    */
  def qKnnGraph(s: SparkSession, dir: String): DataFrame = {
    val cent = trainedCentroids(s, dir)
    val assigned = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), assignExpr(cent).as("c_id"))
    val w = Window.partitionBy(col("a_id"))
      .orderBy(col("cos").desc, col("b_id"))
    val knn = assigned.as("a")
      .join(assigned.as("b"),
        col("a.c_id") === col("b.c_id") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        cosRounded(col("a.embedding"), col("b.embedding")).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= KnnGraphK)
    knn
      .select(least(col("a_id"), col("b_id")).as("vec_a"),
        greatest(col("a_id"), col("b_id")).as("vec_b"), col("cos"))
      .groupBy(col("vec_a"), col("vec_b"))
      .agg(count(lit(1)).as("nd"), max(col("cos")).as("cos"))
      .filter(col("nd") === 2L)
      .select(col("vec_a"), col("vec_b"), col("cos"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  // -------------------------------------------------------------------
  // Exact ε-range search via spatial grid bucketing
  // -------------------------------------------------------------------

  /** L∞ radius for [[qRangeSearch]] (per-dimension window on the first
    * two embedding coordinates).
    */
  val RangeEps = 0.01

  /** EXACT ε-range search — all pairs within L∞ distance [[RangeEps]] on
    * the leading two embedding dimensions — via the classic fixed-grid
    * spatial join (Bentley's cell method): each point homes to cell
    * (⌊x/ε⌋, ⌊y/ε⌋), probes its 3×3 neighborhood, and the exact predicate
    * decides. Completeness is geometric: |Δx| ≤ ε forces |Δcell_x| ≤ 1,
    * so every qualifying pair co-locates in the probe join; uniqueness is
    * structural: of a pair's two orderings, only the smaller-id point's
    * single replica in the larger-id point's home cell survives the
    * `pid < vec_id` guard — no post-hoc distinct. Scale shape: a bounded
    * 9× replication of the POINT set, one equi-join on cell id (shuffle
    * co-partitioned, AQE-splittable if a cell runs hot), output
    * proportional to the true pair count — versus the O(n²) all-pairs
    * the small-SF DuckDB oracle runs as the independent derivation.
    * PlanRegressionSpec pins the no-cartesian shape. Distances are exact
    * IEEE doubles of float32 inputs on both engines.
    */
  def qRangeSearch(s: SparkSession, dir: String): DataFrame = {
    val eps = lit(RangeEps)
    val pts = Tables.embeddings(s, dir).select(
      col("vec_id"),
      element_at(col("embedding"), 1).cast("double").as("x"),
      element_at(col("embedding"), 2).cast("double").as("y"))
      .withColumn("cx", floor(col("x") / eps).cast("long"))
      .withColumn("cy", floor(col("y") / eps).cast("long"))
    val probes = pts.select(
      col("vec_id").as("pid"), col("x").as("px"), col("y").as("py"),
      explode(array((for (dx <- -1 to 1; dy <- -1 to 1) yield
        struct((col("cx") + dx).as("cx"), (col("cy") + dy).as("cy"))): _*))
        .as("c"))
      .select(col("pid"), col("px"), col("py"),
        col("c.cx").as("cx"), col("c.cy").as("cy"))
    probes.join(pts,
      probes("cx") === pts("cx") && probes("cy") === pts("cy") &&
        probes("pid") < pts("vec_id"))
      .filter(abs(col("px") - col("x")) <= eps &&
        abs(col("py") - col("y")) <= eps)
      .select(col("pid").as("vid_a"), col("vec_id").as("vid_b"),
        round(abs(col("px") - col("x")), 6).as("dx"),
        round(abs(col("py") - col("y")), 6).as("dy"))
      .orderBy(col("vid_a"), col("vid_b"))
  }

  /** Core threshold for [[qDbscanCore]]: ≥ this many OTHER points within
    * the L∞ [[RangeEps]] window.
    */
  val DbscanMinPts = 3

  /** DBSCAN point classification (Ester et al., KDD 1996) on the leading
    * two embedding dimensions — the density-based de-outliering census a
    * curation pipeline runs before clustering: CORE points have ≥
    * [[DbscanMinPts]] ε-neighbors, BORDER points are non-core with a
    * core neighbor, the rest is NOISE (the drop set). Built entirely on
    * [[qRangeSearch]]'s fixed-grid machinery: neighbor edges come from
    * the 9-cell probe join (bounded replication, no cartesian — the
    * completeness argument is qRangeSearch's), degrees from one
    * aggregation, border status from one semi-join of edges against the
    * core set. The oracle is the quadratic all-pairs derivation,
    * affordable at gate SF only — which is the grid method's value
    * proposition restated.
    */
  /** (vec_id, x, y, cx, cy): leading two embedding dims with their fixed
    * [[RangeEps]]-grid cell — shared by the DBSCAN family.
    */
  private def dbscanPts(s: SparkSession, dir: String): DataFrame = {
    val eps = lit(RangeEps)
    Tables.embeddings(s, dir).select(
      col("vec_id"),
      element_at(col("embedding"), 1).cast("double").as("x"),
      element_at(col("embedding"), 2).cast("double").as("y"))
      .withColumn("cx", floor(col("x") / eps).cast("long"))
      .withColumn("cy", floor(col("y") / eps).cast("long"))
  }

  /** Directed ε-neighbor edges (pid, nid) over [[dbscanPts]] via the
    * 9-cell probe join — [[qRangeSearch]]'s completeness argument, reused
    * by [[qDbscanCore]] and [[qDbscanCluster]].
    */
  private def dbscanNbr(pts: DataFrame): DataFrame = {
    val eps = lit(RangeEps)
    val probes = pts.select(
      col("vec_id").as("pid"), col("x").as("px"), col("y").as("py"),
      explode(array((for (dx <- -1 to 1; dy <- -1 to 1) yield
        struct((col("cx") + dx).as("cx"), (col("cy") + dy).as("cy"))): _*))
        .as("c"))
      .select(col("pid"), col("px"), col("py"),
        col("c.cx").as("cx"), col("c.cy").as("cy"))
    probes.join(pts,
      probes("cx") === pts("cx") && probes("cy") === pts("cy") &&
        probes("pid") =!= pts("vec_id"))
      .filter(abs(col("px") - col("x")) <= eps &&
        abs(col("py") - col("y")) <= eps)
      .select(col("pid"), col("vec_id").as("nid"))
  }

  def qDbscanCore(s: SparkSession, dir: String): DataFrame = {
    val pts = dbscanPts(s, dir)
    val nbr = dbscanNbr(pts)
    val deg = nbr.groupBy(col("pid")).agg(count(lit(1)).as("deg"))
    val core = deg.filter(col("deg") >= DbscanMinPts)
      .select(col("pid").as("core_id"))
    val borderIds = nbr
      .join(core, nbr("nid") === core("core_id"), "left_semi")
      .select(col("pid")).distinct()
      .join(core.select(col("core_id").as("pid")), Seq("pid"), "left_anti")
    pts.select(col("vec_id"))
      .join(core.select(col("core_id").as("vec_id"), lit(1L).as("isc")),
        Seq("vec_id"), "left")
      .join(borderIds.select(col("pid").as("vec_id"), lit(1L).as("isb")),
        Seq("vec_id"), "left")
      .join(deg.select(col("pid").as("vec_id"), col("deg")),
        Seq("vec_id"), "left")
      .select(
        when(col("isc") === 1L, "core")
          .when(col("isb") === 1L, "border")
          .otherwise("noise").as("cls"),
        coalesce(col("deg"), lit(0L)).as("deg"))
      .groupBy(col("cls"))
      .agg(count(lit(1)).as("n_points"), sum(col("deg")).as("n_edges"))
      .orderBy(col("cls"))
  }

  /** Full DBSCAN clustering (Ester et al., KDD 1996) completing
    * [[qDbscanCore]]'s point typing: clusters are connected components of
    * the core-core ε-neighbor graph (density-reachability restricted to
    * cores — exactly DBSCAN's cluster relation), computed by the shared
    * alternating-star [[ConnectedComponents]]; border points attach to
    * the MINIMUM cluster id among their core neighbors (DBSCAN leaves
    * the tie arbitrary; min makes it deterministic). Cluster id = the
    * minimum core vec_id of the component. Output is the per-cluster
    * census. Scale shape: the grid probe join for edges, two shuffles
    * per CC round (diameter-independent via star contraction), one
    * aggregation each for border assignment and the census — no
    * quadratic work outside the small-SF oracle's brute-force twin.
    */
  def qDbscanCluster(s: SparkSession, dir: String): DataFrame = {
    val pts = dbscanPts(s, dir)
    val nbr = dbscanNbr(pts)
    val deg = nbr.groupBy(col("pid")).agg(count(lit(1)).as("deg"))
    val core = deg.filter(col("deg") >= DbscanMinPts)
      .select(col("pid").as("core_id"))
    val coreEdges = nbr
      .join(core.select(col("core_id").as("pid")), Seq("pid"), "left_semi")
      .join(core.select(col("core_id").as("nid")), Seq("nid"), "left_semi")
      .select(col("pid").as("src"), col("nid").as("dst"))
    // cores with no core neighbor are singleton clusters of their own id
    val coreComp = core
      .join(ConnectedComponents.components(coreEdges)
        .select(col("id").as("core_id"), col("component")),
        Seq("core_id"), "left")
      .select(col("core_id"),
        coalesce(col("component"), col("core_id")).as("cluster_id"))
    val borderAssign = nbr
      .join(core.select(col("core_id").as("pid")), Seq("pid"), "left_anti")
      .join(coreComp.select(col("core_id").as("nid"), col("cluster_id")),
        Seq("nid"))
      .groupBy(col("pid"))
      .agg(min(col("cluster_id")).as("cluster_id"))
    coreComp
      .select(col("cluster_id"), lit(1L).as("c"), lit(0L).as("b"))
      .unionByName(borderAssign
        .select(col("cluster_id"), lit(0L).as("c"), lit(1L).as("b")))
      .groupBy(col("cluster_id"))
      .agg(sum(col("c")).as("n_core"), sum(col("b")).as("n_border"))
      .orderBy(col("cluster_id"))
  }

  /** Per-cluster assignment-margin census over the shared k-means index
    * — the clustering-QA readout (a cosine analog of the simplified
    * silhouette of Hruschka et al.): for every vector, margin = cos to
    * its OWN centroid minus cos to the best OTHER centroid (both
    * rounded-6, ties toward the smaller c_id exactly like the
    * assignment), so margin ≥ 0 by construction and small margins mark
    * boundary-hugging points a curation pipeline would re-examine.
    * Per-cluster: size, worst (min) margin, and the mean margin with the
    * sum routed through DECIMAL(18,6) — margins are differences of
    * rounded-6 values, so the decimal sum is exact and
    * order-independent, the one float being the final division. Scale
    * shape: row-local 16-centroid scoring against broadcast literals
    * (zero joins, zero windows), one map-side-combined aggregation to k
    * rows.
    */
  def qSilhouette(s: SparkSession, dir: String): DataFrame = {
    val cent = trainedCentroids(s, dir)
    val sorted = sort_array(array(cent.map { case (id, cv) =>
      struct((-cosRounded(col("embedding"), typedLit(cv))).as("neg"),
        lit(id).as("c_id"))
    }: _*))
    Tables.embeddings(s, dir)
      .select(
        element_at(sorted, 1).getField("c_id").as("c_id"),
        (element_at(sorted, 2).getField("neg") -
          element_at(sorted, 1).getField("neg"))
          .cast("decimal(18,6)").as("margin"))
      .groupBy(col("c_id"))
      .agg(count(lit(1)).as("n_vectors"),
        min(col("margin").cast("double")).as("min_margin"),
        (sum(col("margin")).cast("double") / count(lit(1)))
          .as("mean_margin"))
      .orderBy(col("c_id"))
  }

  /** Adjusted Rand Index (Hubert & Arabie 1985) between the trained
    * k-means clustering and the corpus' ground-truth labels — the
    * external clustering-evaluation ledger (chance-corrected pair
    * agreement). All pair counting is EXACT integer arithmetic: with
    * S = Σ_ij C(n_ij,2) over contingency cells, A = Σ_i C(a_i,2) over
    * cluster sizes, B = Σ_j C(b_j,2) over label sizes, N = C(n,2),
    *   ARI = 2·(S·N − A·B) / (N·(A+B) − 2·A·B)
    * — the ×2 clears the half-sum so numerator and denominator are
    * BIGINTs, collapsed by ONE division (the q_kappa discipline; the
    * long→double casts round identically under IEEE on both engines).
    * Scale: ONE corpus pass — cube(c_id, label) computes the cells, the
    * cluster margins, the label margins and the grand total in a single
    * aggregation (Expand ×4 map-side, combined to ≤ k·L + k + L + 1
    * groups); everything downstream is arithmetic over that bounded
    * frame. Products are bounded by pairs² — inside BIGINT up to ~10⁹
    * rows; beyond that route the products through DECIMAL(38,0).
    */
  def qAri(s: SparkSession, dir: String): DataFrame = {
    val cent = trainedCentroids(s, dir)
    // n·(n−1) is always even, so the shift is the exact integer C(n,2)
    // (a Divide would go through DOUBLE)
    def comb(c: Column): Column = shiftright(c * (c - 1), 1)
    val cells = Tables.embeddings(s, dir)
      .select(assignExpr(cent).as("c_id"),
        col("label").cast("long").as("label"))
      .cube(col("c_id"), col("label"))
      .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
      .select(col("gid"), col("n"))
    val parts = cells.agg(
      sum(when(col("gid") === 0, comb(col("n"))).otherwise(0L)).as("s_pairs"),
      sum(when(col("gid") === 1, comb(col("n"))).otherwise(0L)).as("a_pairs"),
      sum(when(col("gid") === 2, comb(col("n"))).otherwise(0L)).as("b_pairs"),
      sum(when(col("gid") === 3, col("n")).otherwise(0L)).as("n"))
    parts.select(col("n"), col("s_pairs"), col("a_pairs"), col("b_pairs"),
      ((lit(2L) * (col("s_pairs") * comb(col("n")) -
        col("a_pairs") * col("b_pairs"))).cast("double") /
        (comb(col("n")) * (col("a_pairs") + col("b_pairs")) -
          lit(2L) * col("a_pairs") * col("b_pairs")).cast("double"))
        .as("ari"))
  }

  /** Reciprocal-rank-fusion constant (Cormack, Clarke & Büttcher,
    * SIGIR 2009 — k=60 is the paper's recommendation).
    */
  val RrfK = 60

  /** Reciprocal rank fusion of two retrieval backends — the standard way
    * a serving stack merges an exact shard with an ANN shard (or dense
    * with sparse retrieval) WITHOUT comparing their incomparable scores:
    * each backend contributes 1/(k+rank) for the items it returned, ranks
    * only. Here the fused lists are the exact [[qAnnBrute]] top-k and the
    * LSH [[qAnnLsh]] top-k; items on one list only enter at reduced mass
    * through the coalesce-to-zero. Everything downstream of the two
    * rankings is a |Q|·2k-row frame: a full-outer key join, one IEEE
    * division per side (bit-identical cross-engine — no float sums beyond
    * a fixed two-term add), and a per-query re-rank. At 100 TB the two
    * input rankings are the expensive distributed parts and are already
    * candidate-bounded; fusion itself never touches the corpus.
    */
  def qRankFusion(s: SparkSession, dir: String): DataFrame = {
    val a = qAnnBrute(s, dir)
      .select(col("query_id"), col("vec_id"), col("rk").as("rk_a"))
    val b = qAnnLsh(s, dir)
      .select(col("query_id"), col("vec_id"), col("rk").as("rk_b"))
    val fused = a.join(b, Seq("query_id", "vec_id"), "full_outer")
      .select(col("query_id"), col("vec_id"), col("rk_a"), col("rk_b"),
        (coalesce(lit(1.0) / (lit(RrfK.toLong) + col("rk_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK.toLong) + col("rk_b")), lit(0.0)))
          .as("rrf"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("vec_id"))
    fused.withColumn("frk", row_number().over(w))
      .filter(col("frk") <= TopK)
      .select(col("query_id"), col("frk").cast("long").as("frk"),
        col("vec_id"), col("rk_a"), col("rk_b"), col("rrf"))
      .orderBy(col("query_id"), col("frk"))
  }

  /** Coreset size for [[qCoreset]] — small enough that the unrolled
    * oracle stays readable, large enough that every selection round has
    * real candidates to separate.
    */
  val CoresetK = 8

  /** k-center greedy selection (farthest-first traversal, Gonzalez 1985;
    * the coreset-selection strategy of Sener & Savarese, ICLR 2018):
    * seed with vec_id 0, then [[CoresetK]]−1 rounds of "pick the point
    * LEAST similar to everything selected so far" — each round is ONE
    * corpus pass computing max-cosine-to-selected row-locally against the
    * ≤[[CoresetK]] broadcast-literal centers, then a TakeOrdered of a
    * single row (min max-sim, vec_id tiebreak). Memoized per (session,
    * corpus) like [[trainedCentroids]]: selection is a one-time
    * index-build; determinism pinned in DeterminismSpec. Centers are
    * stored quantized (×1e7 floor-rounded integers carried as doubles,
    * the [[quantLong]] convention) so the literal-vs-raw cosine matches
    * the oracle's quantized CTE bit-for-bit.
    */
  private val coresetCache = new SessionMemo[Seq[(Long, Int, Array[Double])]]()
  private[operators] def coresetCenters(
      s: SparkSession, dir: String): Seq[(Long, Int, Array[Double])] =
    coresetCache.getOrElseUpdate(s, dir) {
      val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      def quantize(v: Seq[Float]): Array[Double] =
        v.map(x => math.floor(x.toDouble * 1e7 + 0.5)).toArray
      val seed = emb.filter(col("vec_id") === 0L).collect()(0)
      var sel = Vector((0L, 0, quantize(seed.getSeq[Float](1))))
      (1 until CoresetK).foreach { r =>
        val maxSim = array_max(array(sel.map { case (_, _, cv) =>
          cosRounded(col("embedding"), typedLit(cv))
        }: _*))
        val next = emb
          .filter(!col("vec_id").isin(sel.map(_._1): _*))
          .select(col("vec_id"), col("embedding"), maxSim.as("ms"))
          .orderBy(col("ms").asc, col("vec_id").asc)
          .limit(1).collect()(0)
        sel = sel :+ ((next.getLong(0), r, quantize(next.getSeq[Float](1))))
      }
      sel
    }

  /** Coverage census of the greedy k-center coreset: assign every corpus
    * vector to its most-similar selected center (ties toward the smaller
    * center id, the [[assignExprPortable]] order) and report, per center,
    * its selection round, cluster size, and the WORST covered similarity
    * — whose minimum over centers is the measured k-center radius, the
    * quantity the greedy algorithm 2-approximates. The census is the
    * steady per-corpus pass (row-local argmax against 8 literal centers,
    * one ≤k-group aggregation); the selection itself is the memoized
    * build. At 100 TB: selection is k−1 corpus scans each shuffling ONE
    * row, the census shape is identical to [[qAnnIvfKmeans]]'s row-local
    * assignment — both survive arbitrary scale-up.
    */
  def qCoreset(s: SparkSession, dir: String): DataFrame = {
    val cent = coresetCenters(s, dir)
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val best = array_min(array(cent.map { case (id, _, cv) =>
      struct((-cosRounded(col("embedding"), typedLit(cv))).as("neg"),
        lit(id).as("c_id"))
    }: _*))
    val roundOf = cent.foldLeft(lit(-1L)) { case (acc, (id, r, _)) =>
      when(col("center_id") === id, lit(r.toLong)).otherwise(acc)
    }
    emb
      .select(best.getField("c_id").as("center_id"),
        (-best.getField("neg")).as("cos"))
      .groupBy(col("center_id"))
      .agg(count(lit(1)).as("n_assigned"), min(col("cos")).as("worst_cos"))
      .select(roundOf.as("sel_round"), col("center_id"),
        col("n_assigned"), col("worst_cos"))
      .orderBy(col("sel_round"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_coreset" -> qCoreset,
    "q_ari" -> qAri,
    "q_hard_negatives" -> qHardNegatives,
    "q_rank_fusion" -> qRankFusion,
    "q_range_search" -> qRangeSearch,
    "q_dbscan_core" -> qDbscanCore,
    "q_dbscan_cluster" -> qDbscanCluster,
    "q_silhouette" -> qSilhouette,
    "q_ann_brute" -> qAnnBrute,
    "q_ann_filtered" -> qAnnFiltered,
    "q_ann_lsh" -> qAnnLsh,
    "q_ann_multiprobe" -> qAnnMultiprobe,
    "q_ann_directed" -> qAnnLshDirected,
    "q_ann_recall" -> qAnnRecall,
    "q_ann_ivf" -> qAnnIvf,
    "q_ann_ivf_index" -> qAnnIvfIndex,
    "q_ann_ivf_kmeans" -> qAnnIvfKmeans,
    "q_ann_recall_ivf" -> qAnnRecallIvf,
    "q_dedup_semantic" -> qDedupSemantic,
    "q_knn_graph" -> qKnnGraph,
    "q_pq_codebook" -> qPqCodebook,
    "q_pq_search" -> qPqSearch,
    "q_ann_ivfpq" -> qAnnIvfPq,
    "q_ann_ndcg" -> qAnnNdcg
  )

  // ---------------------------------------------------------- oracle SQL

  private val cosSql =
    """round(
      |  list_sum(list_transform(list_zip(qv, embedding),
      |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
      |  / (sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
      |  6)""".stripMargin

  private def bucketSql(t: Int): String =
    (0 until BitsPerTable)
      .map(i => s"CASE WHEN embedding[${t + 4 * i + 1}] >= 0 THEN ${1L << i} ELSE 0 END")
      .mkString(" + ")

  private val bucketedSql: String =
    (0 until NumTables)
      .map(t => s"SELECT vec_id, embedding, $t AS t, CAST(${bucketSql(t)} AS BIGINT) AS bkt FROM embeddings")
      .mkString("\nUNION ALL\n")

  private val bruteSql =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
       |           WHERE vec_id < $QueryCount),
       |scored AS (
       |  SELECT query_id, vec_id, $cosSql AS cos
       |  FROM q JOIN embeddings ON vec_id <> query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk
       |  FROM scored)
       |SELECT query_id, CAST(rk AS BIGINT) AS rk, vec_id, cos
       |FROM ranked WHERE rk <= $TopK""".stripMargin

  private val lshSql =
    s"""WITH buckets AS ($bucketedSql),
       |qb AS (SELECT vec_id AS query_id, embedding AS qv, t, bkt FROM buckets
       |       WHERE vec_id < $QueryCount),
       |cand AS (
       |  SELECT DISTINCT query_id, qv, b.vec_id, b.embedding
       |  FROM qb JOIN buckets b ON qb.t = b.t AND qb.bkt = b.bkt
       |   AND b.vec_id <> qb.query_id),
       |scored AS (SELECT query_id, vec_id, $cosSql AS cos FROM cand),
       |ranked AS (
       |  SELECT query_id, vec_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk
       |  FROM scored)
       |SELECT query_id, CAST(rk AS BIGINT) AS rk, vec_id, cos
       |FROM ranked WHERE rk <= $TopK""".stripMargin

  private val probeMasks: String =
    (0L +: (0 until BitsPerTable).map(i => 1L << i))
      .map(m => s"($m)").mkString(", ")

  private val multiprobeSql =
    s"""WITH buckets AS ($bucketedSql),
       |qb AS (SELECT vec_id AS query_id, embedding AS qv, t, bkt FROM buckets
       |       WHERE vec_id < $QueryCount),
       |probes AS (
       |  SELECT query_id, qv, t, xor(bkt, m.mask) AS bkt
       |  FROM qb CROSS JOIN (VALUES $probeMasks) m(mask)),
       |cand AS (
       |  SELECT DISTINCT query_id, qv, b.vec_id, b.embedding
       |  FROM probes JOIN buckets b ON probes.t = b.t AND probes.bkt = b.bkt
       |   AND b.vec_id <> probes.query_id),
       |scored AS (SELECT query_id, vec_id, $cosSql AS cos FROM cand),
       |ranked AS (
       |  SELECT query_id, vec_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk
       |  FROM scored)
       |SELECT query_id, CAST(rk AS BIGINT) AS rk, vec_id, cos
       |FROM ranked WHERE rk <= $TopK""".stripMargin

  /** Margin structs for the directed probe: (|qv[coord]|, bit) per sign
    * bit of table `t` — the SQL twin of the array_sort in
    * [[qAnnLshDirected]] (struct field-order compare breaks ties the same
    * way in both engines).
    */
  private val marginsSql: String =
    "[" + (0 until BitsPerTable)
      .map(i => s"{'m': abs(qv[t + ${4 * i} + 1]), 'i': $i}")
      .mkString(", ") + "]"

  private val directedProbeJs: String =
    (1 to ProbesDirected).map(j => s"($j)").mkString(", ")

  private val directedSql =
    s"""WITH buckets AS ($bucketedSql),
       |qb AS (SELECT vec_id AS query_id, embedding AS qv, t, bkt FROM buckets
       |       WHERE vec_id < $QueryCount),
       |probes AS (
       |  SELECT query_id, qv, t, bkt FROM qb
       |  UNION ALL
       |  SELECT query_id, qv, t,
       |    xor(bkt, CAST((1 << list_sort($marginsSql)[j.j].i) AS BIGINT)) AS bkt
       |  FROM qb CROSS JOIN (VALUES $directedProbeJs) j(j)),
       |cand AS (
       |  SELECT DISTINCT query_id, qv, b.vec_id, b.embedding
       |  FROM probes JOIN buckets b ON probes.t = b.t AND probes.bkt = b.bkt
       |   AND b.vec_id <> probes.query_id),
       |scored AS (SELECT query_id, vec_id, $cosSql AS cos FROM cand),
       |ranked AS (
       |  SELECT query_id, vec_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk
       |  FROM scored)
       |SELECT query_id, CAST(rk AS BIGINT) AS rk, vec_id, cos
       |FROM ranked WHERE rk <= $TopK""".stripMargin

  /** Cosine between two named list columns (mirror of cosSql for arbitrary
    * column names).
    */
  private def cosSqlCols(a: String, b: String): String =
    s"""round(
       |  list_sum(list_transform(list_zip($a, $b),
       |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
       |  / (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |     * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
       |  6)""".stripMargin

  private val ivfSql =
    s"""WITH centroids AS (
       |  SELECT vec_id AS c_id, embedding AS cv FROM embeddings
       |  WHERE vec_id < $IvfCentroids),
       |assigned AS (
       |  SELECT vec_id, embedding, c_id FROM (
       |    SELECT e.vec_id, e.embedding, c.c_id,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosSqlCols("e.embedding", "c.cv")} DESC, c.c_id) AS c_rk
       |    FROM embeddings e CROSS JOIN centroids c) t
       |  WHERE c_rk = 1),
       |probes AS (
       |  SELECT vec_id AS query_id, embedding AS qv, c_id FROM assigned
       |  WHERE vec_id < $QueryCount),
       |scored AS (
       |  SELECT p.query_id, l.vec_id, ${cosSqlCols("p.qv", "l.embedding")} AS cos
       |  FROM probes p JOIN assigned l ON p.c_id = l.c_id
       |  WHERE l.vec_id <> p.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk
       |  FROM scored)
       |SELECT query_id, CAST(rk AS BIGINT) AS rk, vec_id, cos
       |FROM ranked WHERE rk <= $TopK""".stripMargin

  /** Assignment CTE body: nearest centroid (rounded cos DESC, c_id ASC)
    * from centroid CTE `cte` over relation `src` — the SQL twin of
    * [[assignExpr]].
    */
  private def assignSql(cte: String, src: String = "embeddings"): String =
    s"""SELECT vec_id, embedding, c_id FROM (
       |  SELECT e.vec_id, e.embedding, c.c_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${cosSqlCols("e.embedding", "c.cv")} DESC, c.c_id) AS c_rk
       |  FROM $src e CROSS JOIN $cte c) t
       |WHERE c_rk = 1""".stripMargin

  /** Recompute CTE body: exact element-wise bigint sums of quantized
    * coordinates per centroid — the SQL twin of [[lloydStep]] (1-based
    * `embedding[pos]` ↔ Spark's 0-based posexplode index).
    */
  private def recomputeSql(assigned: String): String =
    s"""SELECT c_id, list(s ORDER BY pos) AS cv FROM (
       |  SELECT c_id, pos,
       |    sum(CAST(floor(CAST(embedding[pos] AS DOUBLE) * 1e7 + 0.5) AS BIGINT)) AS s
       |  FROM $assigned CROSS JOIN range(1, ${Dim + 1}) t(pos)
       |  GROUP BY c_id, pos) u
       |GROUP BY c_id""".stripMargin

  /** Lloyd-iteration CTE chain derived from [[KmeansIters]] so the oracle
    * can never drift from the Spark foldLeft when the constant is tuned.
    */
  private val lloydCtes: String =
    (1 to KmeansIters).map(i =>
      s"""a$i AS (${assignSql(s"c${i - 1}")}),
         |c$i AS (${recomputeSql(s"a$i")}),""".stripMargin).mkString("\n")

  private val ivfKmeansSql =
    s"""WITH c0 AS (
       |  SELECT vec_id AS c_id,
       |    list_transform(embedding,
       |      x -> CAST(floor(CAST(x AS DOUBLE) * 1e7 + 0.5) AS BIGINT)) AS cv
       |  FROM (SELECT * FROM embeddings
       |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
       |        LIMIT $IvfCentroids) seeds),
       |$lloydCtes
       |af AS (${assignSql(s"c$KmeansIters")}),
       |probes AS (
       |  SELECT vec_id AS query_id, embedding AS qv, c_id FROM af
       |  WHERE vec_id < $QueryCount),
       |scored AS (
       |  SELECT p.query_id, l.vec_id, ${cosSqlCols("p.qv", "l.embedding")} AS cos
       |  FROM probes p JOIN af l ON p.c_id = l.c_id
       |  WHERE l.vec_id <> p.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk
       |  FROM scored)
       |SELECT query_id, CAST(rk AS BIGINT) AS rk, vec_id, cos
       |FROM ranked WHERE rk <= $TopK""".stripMargin

  /** Per-subspace Lloyd-replay CTE chains for the PQ oracles: trains
    * each subspace codebook (pc<m>_<iters>) and assigns every vector
    * (pf<m>) — shared by q_pq_codebook and q_pq_search so both score the
    * SAME replayed codebooks.
    */
  private lazy val pqChainsSql: String = {
    def subSrc(m: Int): String = {
      val lo = m * PqSubDim + 1
      val hi = (m + 1) * PqSubDim
      s"SELECT vec_id, embedding[$lo:$hi] AS embedding FROM embeddings"
    }
    def seeds(m: Int): String = {
      val lo = m * PqSubDim + 1
      val hi = (m + 1) * PqSubDim
      s"""SELECT vec_id AS c_id,
         |    list_transform(embedding[$lo:$hi],
         |      x -> CAST(floor(CAST(x AS DOUBLE) * 1e7 + 0.5) AS BIGINT)) AS cv
         |  FROM (SELECT * FROM embeddings
         |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
         |        LIMIT $IvfCentroids) seeds""".stripMargin
    }
    def recompute(assigned: String): String =
      s"""SELECT c_id, list(s ORDER BY pos) AS cv FROM (
         |  SELECT c_id, pos,
         |    sum(CAST(floor(CAST(embedding[pos] AS DOUBLE) * 1e7 + 0.5) AS BIGINT)) AS s
         |  FROM $assigned CROSS JOIN range(1, ${PqSubDim + 1}) t(pos)
         |  GROUP BY c_id, pos) u
         |GROUP BY c_id""".stripMargin
    def assign(cte: String, src: String): String =
      s"""SELECT vec_id, embedding, c_id, cos FROM (
         |  SELECT e.vec_id, e.embedding, c.c_id,
         |    ${cosSqlCols("e.embedding", "c.cv")} AS cos,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${cosSqlCols("e.embedding", "c.cv")} DESC, c.c_id)
         |      AS c_rk
         |  FROM $src e CROSS JOIN $cte c) t
         |WHERE c_rk = 1""".stripMargin
    (0 until PqM).map { m =>
      val rounds = (1 to KmeansIters).map { i =>
        s"""pa${m}_$i AS (${assign(s"pc${m}_${i - 1}", s"ps$m")}),
           |pc${m}_$i AS (${recompute(s"pa${m}_$i")})""".stripMargin
      }.mkString(",\n")
      s"""ps$m AS (${subSrc(m)}),
         |pc${m}_0 AS (${seeds(m)}),
         |$rounds,
         |pf$m AS (${assign(s"pc${m}_$KmeansIters", s"ps$m")})""".stripMargin
    }.mkString(",\n")
  }

  /** INDEPENDENT re-derivation of the greedy k-center selection: one
    * MATERIALIZED CTE pair per round (mr = max-sim census of the
    * unselected, sr = selection so far) — the statically-unrolled
    * iterative-oracle discipline of q_sssp/q_pagerank. Centers enter the
    * cosine quantized exactly as the Spark literals are ([[quantLong]]).
    */
  private val coresetSelCtes: String = {
    val rounds = (1 until CoresetK).map { r =>
      s"""m$r AS MATERIALIZED (
         |  SELECT e.vec_id, max(${cosSqlCols("e.embedding", "sc.qv")}) AS ms
         |  FROM embeddings e
         |  CROSS JOIN (SELECT cq.qv FROM s${r - 1} sel
         |              JOIN cq ON cq.vec_id = sel.c_id) sc
         |  WHERE e.vec_id NOT IN (SELECT c_id FROM s${r - 1})
         |  GROUP BY e.vec_id),
         |s$r AS MATERIALIZED (
         |  SELECT * FROM s${r - 1}
         |  UNION ALL
         |  SELECT vec_id AS c_id, $r AS rnd FROM (
         |    SELECT vec_id, row_number() OVER (ORDER BY ms ASC, vec_id ASC) AS rk
         |    FROM m$r) t
         |  WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    s"""cq AS MATERIALIZED (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 1e7 + 0.5) AS BIGINT)) AS qv
       |  FROM embeddings),
       |s0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS c_id, 0 AS rnd),
       |$rounds""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    // INDEPENDENT derivation: full Lloyd replay -> rank-1 assignment,
    // then the four ARI ingredients from the explicit contingency table
    // (no cube) -- S/A/B/N as exact integer pair counts
    "q_ari" ->
      s"""WITH c0 AS (
         |  SELECT vec_id AS c_id,
         |    list_transform(embedding,
         |      x -> CAST(floor(CAST(x AS DOUBLE) * 1e7 + 0.5) AS BIGINT)) AS cv
         |  FROM (SELECT * FROM embeddings
         |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
         |        LIMIT $IvfCentroids) seeds),
         |$lloydCtes
         |sca AS (
         |  SELECT e.vec_id, CAST(e.label AS BIGINT) AS label, c.c_id,
         |    ${cosSqlCols("e.embedding", "c.cv")} AS cos
         |  FROM embeddings e CROSS JOIN c$KmeansIters c),
         |asg AS (
         |  SELECT vec_id, label, c_id FROM (
         |    SELECT vec_id, label, c_id, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY cos DESC, c_id) AS r
         |    FROM sca) t
         |  WHERE r = 1),
         |cells AS (SELECT c_id, label, count(*) AS n
         |  FROM asg GROUP BY c_id, label),
         |sv AS (SELECT CAST(sum((n * (n - 1)) // 2) AS BIGINT) AS s_pairs
         |  FROM cells),
         |av AS (SELECT CAST(sum((a * (a - 1)) // 2) AS BIGINT) AS a_pairs
         |  FROM (SELECT CAST(sum(n) AS BIGINT) AS a FROM cells GROUP BY c_id)),
         |bv AS (SELECT CAST(sum((b * (b - 1)) // 2) AS BIGINT) AS b_pairs
         |  FROM (SELECT CAST(sum(n) AS BIGINT) AS b FROM cells GROUP BY label)),
         |tv AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST((count(*) * (count(*) - 1)) // 2 AS BIGINT) AS np FROM asg)
         |SELECT tv.n, sv.s_pairs, av.a_pairs, bv.b_pairs,
         |  CAST(2 * (sv.s_pairs * tv.np - av.a_pairs * bv.b_pairs) AS DOUBLE)
         |    / CAST(tv.np * (av.a_pairs + bv.b_pairs)
         |           - 2 * av.a_pairs * bv.b_pairs AS DOUBLE) AS ari
         |FROM sv CROSS JOIN av CROSS JOIN bv CROSS JOIN tv""".stripMargin,
    "q_coreset" ->
      s"""WITH $coresetSelCtes,
         |sc AS (
         |  SELECT e.vec_id, sel.c_id, sel.rnd,
         |    ${cosSqlCols("e.embedding", "cc.qv")} AS cos
         |  FROM embeddings e
         |  CROSS JOIN s${CoresetK - 1} sel
         |  JOIN cq cc ON cc.vec_id = sel.c_id),
         |rkd AS (
         |  SELECT vec_id, c_id, rnd, cos, row_number() OVER (
         |    PARTITION BY vec_id ORDER BY cos DESC, c_id ASC) AS r
         |  FROM sc)
         |SELECT CAST(rnd AS BIGINT) AS sel_round, c_id AS center_id,
         |  CAST(count(*) AS BIGINT) AS n_assigned, min(cos) AS worst_cos
         |FROM rkd WHERE r = 1
         |GROUP BY rnd, c_id ORDER BY sel_round""".stripMargin,
    // INDEPENDENT derivation: the full Lloyd replay, then rank-1/rank-2
    // window over all 16 cosines per vector (vs Spark's sorted literal
    // array — same (cos DESC, c_id ASC) tie order)
    "q_silhouette" ->
      s"""WITH c0 AS (
         |  SELECT vec_id AS c_id,
         |    list_transform(embedding,
         |      x -> CAST(floor(CAST(x AS DOUBLE) * 1e7 + 0.5) AS BIGINT)) AS cv
         |  FROM (SELECT * FROM embeddings
         |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
         |        LIMIT $IvfCentroids) seeds),
         |$lloydCtes
         |sc AS (
         |  SELECT e.vec_id, c.c_id, ${cosSqlCols("e.embedding", "c.cv")} AS cos
         |  FROM embeddings e CROSS JOIN c$KmeansIters c),
         |rk AS (
         |  SELECT vec_id, c_id, cos, row_number() OVER (
         |    PARTITION BY vec_id ORDER BY cos DESC, c_id) AS r
         |  FROM sc),
         |ab AS (
         |  SELECT a.vec_id, a.c_id,
         |    CAST(a.cos - b.cos AS DECIMAL(18,6)) AS margin
         |  FROM rk a JOIN rk b ON b.vec_id = a.vec_id
         |  WHERE a.r = 1 AND b.r = 2)
         |SELECT c_id, CAST(count(*) AS BIGINT) AS n_vectors,
         |  min(CAST(margin AS DOUBLE)) AS min_margin,
         |  CAST(sum(margin) AS DOUBLE) / count(*) AS mean_margin
         |FROM ab GROUP BY c_id ORDER BY c_id""".stripMargin,
    // INDEPENDENT derivation: quadratic all-pairs edges + recursive
    // min-label reachability over core-core edges (seeded from ALL cores,
    // so singleton-core clusters fall out of the same CTE)
    "q_dbscan_cluster" ->
      s"""WITH RECURSIVE e AS (
         |  SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
         |    CAST(embedding[2] AS DOUBLE) AS y
         |  FROM embeddings),
         |nbr AS (
         |  SELECT a.vec_id AS pid, b.vec_id AS nid
         |  FROM e a JOIN e b ON a.vec_id <> b.vec_id
         |    AND abs(a.x - b.x) <= $RangeEps AND abs(a.y - b.y) <= $RangeEps),
         |deg AS (SELECT pid, count(*) AS deg FROM nbr GROUP BY pid),
         |core AS (SELECT pid FROM deg WHERE deg >= $DbscanMinPts),
         |ce AS (SELECT n.pid AS src, n.nid AS dst FROM nbr n
         |  JOIN core a ON a.pid = n.pid JOIN core b ON b.pid = n.nid),
         |reach AS (
         |  SELECT pid AS id, pid AS label FROM core
         |  UNION
         |  SELECT c.dst AS id, r.label FROM reach r JOIN ce c ON c.src = r.id),
         |comp AS (SELECT id AS core_id, min(label) AS cluster_id
         |  FROM reach GROUP BY id),
         |ba AS (SELECT n.pid, min(c.cluster_id) AS cluster_id
         |  FROM nbr n JOIN comp c ON c.core_id = n.nid
         |  WHERE n.pid NOT IN (SELECT pid FROM core)
         |  GROUP BY n.pid),
         |u AS (SELECT cluster_id, 1 AS c, 0 AS b FROM comp
         |  UNION ALL SELECT cluster_id, 0 AS c, 1 AS b FROM ba)
         |SELECT cluster_id, CAST(sum(c) AS BIGINT) AS n_core,
         |  CAST(sum(b) AS BIGINT) AS n_border
         |FROM u GROUP BY cluster_id ORDER BY cluster_id""".stripMargin,
    // INDEPENDENT derivation: quadratic all-pairs neighbor counts
    "q_dbscan_core" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
         |    CAST(embedding[2] AS DOUBLE) AS y
         |  FROM embeddings),
         |nbr AS (
         |  SELECT a.vec_id AS pid, b.vec_id AS nid
         |  FROM e a JOIN e b ON a.vec_id <> b.vec_id
         |    AND abs(a.x - b.x) <= $RangeEps AND abs(a.y - b.y) <= $RangeEps),
         |deg AS (SELECT pid, count(*) AS deg FROM nbr GROUP BY pid),
         |core AS (SELECT pid FROM deg WHERE deg >= $DbscanMinPts),
         |border AS (
         |  SELECT DISTINCT n.pid FROM nbr n JOIN core c ON n.nid = c.pid
         |  WHERE n.pid NOT IN (SELECT pid FROM core)),
         |cls AS (
         |  SELECT e.vec_id,
         |    CASE WHEN e.vec_id IN (SELECT pid FROM core) THEN 'core'
         |         WHEN e.vec_id IN (SELECT pid FROM border) THEN 'border'
         |         ELSE 'noise' END AS cls,
         |    coalesce(d.deg, 0) AS deg
         |  FROM e LEFT JOIN deg d ON e.vec_id = d.pid)
         |SELECT cls, count(*) AS n_points, CAST(sum(deg) AS BIGINT) AS n_edges
         |FROM cls GROUP BY cls ORDER BY cls""".stripMargin,
    // INDEPENDENT derivation: brute-force all-pairs — affordable at oracle
    // SF, which is exactly the grid method's value proposition at scale
    "q_range_search" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
         |    CAST(embedding[2] AS DOUBLE) AS y
         |  FROM embeddings)
         |SELECT a.vec_id AS vid_a, b.vec_id AS vid_b,
         |  round(abs(a.x - b.x), 6) AS dx,
         |  round(abs(a.y - b.y), 6) AS dy
         |FROM e a JOIN e b ON a.vec_id < b.vec_id
         |WHERE abs(a.x - b.x) <= ${RangeEps}e0
         |  AND abs(a.y - b.y) <= ${RangeEps}e0
         |ORDER BY vid_a, vid_b""".stripMargin,
    "q_ann_ivf" -> (ivfSql + "\nORDER BY query_id, rk"),
    // the persisted-index path is result-identical to the inline IVF —
    // same centroids, assignment, scoring — so it shares the oracle
    "q_ann_ivf_index" -> (ivfSql + "\nORDER BY query_id, rk"),
    "q_ann_ivf_kmeans" -> (ivfKmeansSql + "\nORDER BY query_id, rk"),
    "q_ann_recall_ivf" ->
      s"""WITH brute AS ($bruteSql),
         |ivf AS ($ivfSql),
         |km AS ($ivfKmeansSql)
         |SELECT brute.query_id AS query_id,
         |  CAST(sum(CASE WHEN ivf.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*) AS recall_ivf,
         |  CAST(sum(CASE WHEN km.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*) AS recall_ivf_kmeans
         |FROM brute
         |LEFT JOIN ivf
         |  ON brute.query_id = ivf.query_id AND brute.vec_id = ivf.vec_id
         |LEFT JOIN km
         |  ON brute.query_id = km.query_id AND brute.vec_id = km.vec_id
         |GROUP BY brute.query_id
         |ORDER BY query_id""".stripMargin,
    "q_dedup_semantic" ->
      s"""WITH c0 AS (
         |  SELECT vec_id AS c_id,
         |    list_transform(embedding,
         |      x -> CAST(floor(CAST(x AS DOUBLE) * 1e7 + 0.5) AS BIGINT)) AS cv
         |  FROM (SELECT * FROM embeddings
         |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
         |        LIMIT $IvfCentroids) seeds),
         |$lloydCtes
         |corpus AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + ${Dedup.PlantOffset}, embedding FROM embeddings),
         |af AS (${assignSql(s"c$KmeansIters", "corpus")}),
         |pairs AS (
         |  SELECT a.c_id, b.vec_id AS b_id
         |  FROM af a JOIN af b
         |    ON a.c_id = b.c_id AND a.vec_id < b.vec_id
         |  WHERE ${cosSqlCols("a.embedding", "b.embedding")} >= $SemDedupCos),
         |per_cluster AS (
         |  SELECT c_id, count(*) AS n_dup_pairs, count(DISTINCT b_id) AS n_dropped
         |  FROM pairs GROUP BY c_id),
         |sizes AS (SELECT c_id, count(*) AS n_vectors FROM af GROUP BY c_id)
         |SELECT s.c_id AS c_id, s.n_vectors,
         |  coalesce(p.n_dup_pairs, 0) AS n_dup_pairs,
         |  coalesce(p.n_dropped, 0) AS n_dropped
         |FROM sizes s LEFT JOIN per_cluster p ON s.c_id = p.c_id
         |ORDER BY c_id""".stripMargin,
    // INDEPENDENT derivation: per-subspace seed + Lloyd unroll on the
    // coordinate slices, assignment argmax via a window carrying its cos
    "q_pq_codebook" -> {
      val unions = (0 until PqM)
        .map(m => s"SELECT $m AS m, c_id AS code, vec_id, cos FROM pf$m")
        .mkString("\n  UNION ALL ")
      s"""WITH $pqChainsSql,
         |enc AS ($unions)
         |SELECT CAST(m AS BIGINT) AS m, code, count(*) AS n_vectors,
         |  CAST(sum(CAST(floor(cos * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
         |    AS fit_ppm_sum,
         |  CAST(min(vec_id) AS BIGINT) AS min_vec
         |FROM enc GROUP BY m, code ORDER BY m, code""".stripMargin
    },
    // coarse IVF assignment (full-vector Lloyd replay) + the PQ chains,
    // candidates restricted to the query's own cluster before ADC
    "q_ann_ivfpq" -> {
      val terms = (0 until PqM).map { m =>
        val lo = m * PqSubDim + 1
        val hi = (m + 1) * PqSubDim
        s"""SELECT q.query_id, f.vec_id,
           |  CAST(floor(${cosSqlCols(s"q.qv[$lo:$hi]", "c.cv")} * 1e6 + 0.5)
           |    AS BIGINT) AS sterm
           |FROM qq q
           |JOIN af l ON l.vec_id = q.query_id
           |JOIN af v ON v.c_id = l.c_id AND v.vec_id <> q.query_id
           |JOIN pf$m f ON f.vec_id = v.vec_id
           |JOIN pc${m}_$KmeansIters c ON c.c_id = f.c_id""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH c0 AS (
         |  SELECT vec_id AS c_id,
         |    list_transform(embedding,
         |      x -> CAST(floor(CAST(x AS DOUBLE) * 1e7 + 0.5) AS BIGINT)) AS cv
         |  FROM (SELECT * FROM embeddings
         |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
         |        LIMIT $IvfCentroids) seeds),
         |$lloydCtes
         |af AS (${assignSql(s"c$KmeansIters")}),
         |$pqChainsSql,
         |qq AS (SELECT vec_id AS query_id, embedding AS qv
         |  FROM embeddings WHERE vec_id < $QueryCount),
         |terms AS ($terms),
         |sc AS (SELECT query_id, vec_id,
         |  CAST(sum(sterm) AS BIGINT) AS score_ppm
         |  FROM terms GROUP BY query_id, vec_id),
         |ranked AS (
         |  SELECT query_id, vec_id, score_ppm, row_number() OVER (
         |    PARTITION BY query_id ORDER BY score_ppm DESC, vec_id) AS rk
         |  FROM sc)
         |SELECT query_id, CAST(rk AS BIGINT) AS rk, vec_id, score_ppm
         |FROM ranked WHERE rk <= $TopK
         |ORDER BY query_id, rk""".stripMargin
    },
    // ADC replay over the same chains: query slice vs each vector's
    // ASSIGNED codeword, per-subspace rounded-6 cosines summed
    "q_pq_search" -> {
      val terms = (0 until PqM).map { m =>
        val lo = m * PqSubDim + 1
        val hi = (m + 1) * PqSubDim
        s"""SELECT q.query_id, f.vec_id,
           |  CAST(floor(${cosSqlCols(s"q.qv[$lo:$hi]", "c.cv")} * 1e6 + 0.5)
           |    AS BIGINT) AS sterm
           |FROM qq q, pf$m f
           |JOIN pc${m}_$KmeansIters c ON c.c_id = f.c_id
           |WHERE f.vec_id <> q.query_id""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $pqChainsSql,
         |qq AS (SELECT vec_id AS query_id, embedding AS qv
         |  FROM embeddings WHERE vec_id < $QueryCount),
         |terms AS ($terms),
         |sc AS (SELECT query_id, vec_id,
         |  CAST(sum(sterm) AS BIGINT) AS score_ppm
         |  FROM terms GROUP BY query_id, vec_id),
         |ranked AS (
         |  SELECT query_id, vec_id, score_ppm, row_number() OVER (
         |    PARTITION BY query_id ORDER BY score_ppm DESC, vec_id) AS rk
         |  FROM sc)
         |SELECT query_id, CAST(rk AS BIGINT) AS rk, vec_id, score_ppm
         |FROM ranked WHERE rk <= $TopK
         |ORDER BY query_id, rk""".stripMargin
    },
    // INDEPENDENT derivation: same Lloyd unroll, per-vector top-k via a
    // window over the within-cluster candidates, mutuality by pair count
    "q_knn_graph" ->
      s"""WITH c0 AS (
         |  SELECT vec_id AS c_id,
         |    list_transform(embedding,
         |      x -> CAST(floor(CAST(x AS DOUBLE) * 1e7 + 0.5) AS BIGINT)) AS cv
         |  FROM (SELECT * FROM embeddings
         |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
         |        LIMIT $IvfCentroids) seeds),
         |$lloydCtes
         |af AS (${assignSql(s"c$KmeansIters")}),
         |scored AS (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |    ${cosSqlCols("a.embedding", "b.embedding")} AS cos
         |  FROM af a JOIN af b
         |    ON a.c_id = b.c_id AND a.vec_id <> b.vec_id),
         |knn AS (
         |  SELECT a_id, b_id, cos FROM (
         |    SELECT a_id, b_id, cos, row_number() OVER (
         |      PARTITION BY a_id ORDER BY cos DESC, b_id) AS rk
         |    FROM scored)
         |  WHERE rk <= $KnnGraphK),
         |und AS (
         |  SELECT least(a_id, b_id) AS vec_a, greatest(a_id, b_id) AS vec_b,
         |    count(*) AS nd, max(cos) AS cos
         |  FROM knn GROUP BY 1, 2)
         |SELECT vec_a, vec_b, cos FROM und WHERE nd = 2
         |ORDER BY vec_a, vec_b""".stripMargin,
    "q_ann_ndcg" -> {
      val discList = NdcgDiscPpb.mkString("[", ", ", "]")
      s"""WITH brute AS ($bruteSql),
         |ivf AS ($ivfKmeansSql),
         |g AS (
         |  SELECT i.query_id,
         |    coalesce(${TopK + 1} - b.rk, 0) * ($discList)[CAST(i.rk AS INT)]
         |      AS g
         |  FROM ivf i LEFT JOIN brute b
         |    ON i.query_id = b.query_id AND i.vec_id = b.vec_id)
         |SELECT query_id, CAST(sum(g) AS BIGINT) AS dcg_ppb,
         |  CAST(sum(g) AS DOUBLE) / CAST($NdcgIdealPpb AS DOUBLE) AS ndcg
         |FROM g GROUP BY query_id ORDER BY query_id""".stripMargin
    },
    "q_hard_negatives" ->
      s"""WITH e AS (SELECT vec_id, embedding, CAST(label AS BIGINT) AS label
         |  FROM embeddings),
         |a AS (SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
         |  FROM e WHERE vec_id < $QueryCount),
         |scored AS (
         |  SELECT a.query_id, e.vec_id, e.label,
         |    CASE WHEN e.label <> a.qlabel THEN 'neg' ELSE 'pos' END AS kind,
         |    ${cosSqlCols("a.qv", "e.embedding")} AS cos
         |  FROM a JOIN e ON e.vec_id <> a.query_id),
         |rkd AS (
         |  SELECT query_id, kind, vec_id, label, cos, row_number() OVER (
         |    PARTITION BY query_id, kind
         |    ORDER BY CASE WHEN kind = 'neg' THEN -cos ELSE cos END ASC,
         |      vec_id ASC) AS r
         |  FROM scored)
         |SELECT query_id, kind, CAST(r AS BIGINT) AS rk, vec_id, label, cos
         |FROM rkd WHERE r <= $HardK
         |ORDER BY query_id, kind, rk""".stripMargin,
    "q_ann_brute" -> (bruteSql + "\nORDER BY query_id, rk"),
    // the brute fragment with the label allow-list applied BEFORE scoring
    // (pre-filter semantics: exact top-k over exactly the admissible set)
    "q_ann_filtered" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
         |           FROM embeddings WHERE vec_id < $QueryCount),
         |scored AS (
         |  SELECT query_id, e.vec_id, CAST(e.label AS BIGINT) AS label,
         |    $cosSql AS cos
         |  FROM q JOIN embeddings e ON e.vec_id <> query_id
         |   AND e.label IN (${FilterLabels.mkString(", ")})),
         |ranked AS (
         |  SELECT query_id, vec_id, label, cos,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC, vec_id) AS rk
         |  FROM scored)
         |SELECT query_id, CAST(rk AS BIGINT) AS rk, vec_id, label, cos
         |FROM ranked WHERE rk <= $TopK
         |ORDER BY query_id, rk""".stripMargin,
    "q_ann_lsh" -> (lshSql + "\nORDER BY query_id, rk"),
    // fusion of the two proven ranking fragments: ranks only, one IEEE
    // division per side, vec_id tie-break — bit-identical cross-engine
    "q_rank_fusion" ->
      s"""WITH brute AS ($bruteSql),
         |lsh AS ($lshSql),
         |f AS (
         |  SELECT coalesce(brute.query_id, lsh.query_id) AS query_id,
         |    coalesce(brute.vec_id, lsh.vec_id) AS vec_id,
         |    brute.rk AS rk_a, lsh.rk AS rk_b,
         |    coalesce(1.0e0 / ($RrfK + brute.rk), 0.0e0)
         |      + coalesce(1.0e0 / ($RrfK + lsh.rk), 0.0e0) AS rrf
         |  FROM brute FULL OUTER JOIN lsh
         |    ON brute.query_id = lsh.query_id AND brute.vec_id = lsh.vec_id),
         |r AS (SELECT *, row_number() OVER (
         |    PARTITION BY query_id ORDER BY rrf DESC, vec_id) AS frk
         |  FROM f)
         |SELECT query_id, CAST(frk AS BIGINT) AS frk, vec_id, rk_a, rk_b, rrf
         |FROM r WHERE frk <= $TopK ORDER BY query_id, frk""".stripMargin,
    "q_ann_multiprobe" -> (multiprobeSql + "\nORDER BY query_id, rk"),
    "q_ann_directed" -> (directedSql + "\nORDER BY query_id, rk"),
    "q_ann_recall" ->
      s"""WITH brute AS ($bruteSql),
         |lsh AS ($lshSql),
         |multi AS ($multiprobeSql),
         |directed AS ($directedSql)
         |SELECT brute.query_id AS query_id,
         |  CAST(sum(CASE WHEN lsh.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*) AS recall_at_k,
         |  CAST(sum(CASE WHEN multi.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*) AS recall_multiprobe,
         |  CAST(sum(CASE WHEN directed.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*) AS recall_directed
         |FROM brute
         |LEFT JOIN lsh
         |  ON brute.query_id = lsh.query_id AND brute.vec_id = lsh.vec_id
         |LEFT JOIN multi
         |  ON brute.query_id = multi.query_id AND brute.vec_id = multi.vec_id
         |LEFT JOIN directed
         |  ON brute.query_id = directed.query_id AND brute.vec_id = directed.vec_id
         |GROUP BY brute.query_id
         |ORDER BY query_id""".stripMargin
  )
}
