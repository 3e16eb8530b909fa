package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.{VectorExpressions, VectorFunctions}

class SimilaritySpec extends SparkSpec with Matchers {

  test("codegen vec_dot / vec_cosine are bit-equal to the portable HOF path") {
    val emb = graft.tables.Tables.embeddings(spark, sf())
    val pairs = emb.as("a")
      .join(emb.as("b"), col("a.vec_id") + 1 === col("b.vec_id"))
      .limit(200)
    val diff = pairs
      .select(
        VectorExpressions.vecDot(col("a.embedding"), col("b.embedding")).as("fast"),
        VectorFunctions.dot(col("a.embedding"), col("b.embedding")).as("ref"),
        VectorExpressions.vecCosine(col("a.embedding"), col("b.embedding")).as("fastc"),
        VectorFunctions.cosine(col("a.embedding"), col("b.embedding")).as("refc"))
      .filter(col("fast") =!= col("ref") || col("fastc") =!= col("refc"))
      .count()
    diff shouldBe 0L
  }

  test("vec_dot handles known values and zero vectors") {
    import spark.implicits._
    val df = Seq(
      (Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
      (Array(0f, 0f, 0f), Array(1f, 1f, 1f)))
      .toDF("a", "b")
    val rows = df
      .select(
        VectorExpressions.vecDot(col("a"), col("b")).as("d"),
        VectorExpressions.vecCosine(col("a"), col("b")).as("c"))
      .collect()
    rows(0).getDouble(0) shouldBe 32.0
    rows(1).getDouble(0) shouldBe 0.0
    rows(1).getDouble(1) shouldBe 0.0 // zero-vector guard
  }

  test("vec_cosine is SQL-callable after registration") {
    VectorExpressions.register(spark)
    val r = spark
      .sql("SELECT vec_cosine(array(1f,0f), array(1f,0f)) c, vec_dot(array(2f,3f), array(4f,5f)) d")
      .head()
    r.getDouble(0) shouldBe 1.0
    r.getDouble(1) shouldBe 23.0
  }

  test("brute-force top-k is exact: k rows per query, descending cos") {
    val df = Similarity.qAnnBrute(spark, sf()).cache()
    df.groupBy("query_id").count().agg(min("count"), max("count")).head() match {
      case row =>
        row.getLong(0) shouldBe Similarity.TopK.toLong
        row.getLong(1) shouldBe Similarity.TopK.toLong
    }
    // rank order must agree with cos order within each query
    val bad = df
      .withColumn("prev",
        lag(col("cos"), 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy("rk")))
      .filter(col("prev").isNotNull && col("prev") < col("cos"))
      .count()
    bad shouldBe 0L
    df.unpersist()
    ()
  }

  test("filtered search: every result passes the label allow-list, k fills, " +
    "and the predicate is pushed to the corpus scan (pre-filter, not post)") {
    import org.apache.spark.sql.functions.col
    val df = Similarity.qAnnFiltered(spark, sf()).cache()
    val allowed = Similarity.FilterLabels.map(_.toLong).toSet
    df.collect().foreach(r => allowed should contain(r.getAs[Long]("label")))
    // pre-filter semantics: k always fills (the admissible set is >> k)
    df.groupBy("query_id").count().filter(col("count") =!=
      Similarity.TopK.toLong).count() shouldBe 0L
    // the label predicate reaches the parquet scan BEFORE scoring
    val plan = Similarity.qAnnFiltered(spark, sf()).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    plan should include regex "PushedFilters: \\[[^\\]]*In\\(label"
    df.unpersist()
    ()
  }

  test("LSH candidates join on bucket keys (hash join, not nested loop)") {
    val plan = Similarity.qAnnLsh(spark, sf()).queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  test("seeded random-hyperplane buckets are deterministic and collision-correct") {
    val emb = graft.tables.Tables.embeddings(spark, sf())
    val b = VectorFunctions.randomHyperplaneBucket(col("embedding"), dim = 64,
      planes = 8, seed = 7L)
    val once = emb.select(col("vec_id"), b.as("bkt")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val again = emb.select(col("vec_id"), b.as("bkt")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    again shouldBe once // fixed seed → identical buckets across runs
    once.values.foreach(v => v should (be >= 0L and be < 256L))
    // identical vectors always share a bucket (the dedup recall property):
    // two DISTINCT rows with equal embeddings through separate evaluations
    import spark.implicits._
    val v1 = Array(0.5f, -1.25f, 3f, 0f)
    val pair = Seq((1L, v1), (2L, v1.clone()), (3L, v1.map(-_)))
      .toDF("id", "embedding")
      .select(col("id"),
        VectorFunctions.randomHyperplaneBucket(col("embedding"), dim = 4,
          planes = 8, seed = 7L).as("bkt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pair(1L) shouldBe pair(2L) // equal vectors, equal bucket
    pair(1L) should not be pair(3L) // negated vector flips every sign bit
  }

  test("vec_dot / vec_cosine accept double arrays on either side") {
    import spark.implicits._
    val df = Seq((Array(1f, 2f, 3f), Array(4.0, 5.0, 6.0))).toDF("f", "d")
    val r = df.select(
      VectorExpressions.vecDot(col("f"), col("d")).as("fd"),
      VectorExpressions.vecDot(col("d"), col("f")).as("df"),
      VectorExpressions.vecCosine(col("d"), col("d")).as("dd"))
      .head()
    r.getDouble(0) shouldBe 32.0
    r.getDouble(1) shouldBe 32.0
    r.getDouble(2) shouldBe 1.0 +- 1e-12
  }

  test("k-means IVF: trained centroids yield full top-k per query") {
    val df = Similarity.qAnnIvfKmeans(spark, sf()).cache()
    // every query's cluster holds at least TopK members at this SF
    df.groupBy("query_id").count().agg(min("count"), max("count")).head() match {
      case row =>
        row.getLong(0) shouldBe Similarity.TopK.toLong
        row.getLong(1) shouldBe Similarity.TopK.toLong
    }
    // rank order agrees with cos order within each query
    val bad = df
      .withColumn("prev",
        lag(col("cos"), 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy("rk")))
      .filter(col("prev").isNotNull && col("prev") < col("cos"))
      .count()
    bad shouldBe 0L
    df.unpersist()
    ()
  }

  test("nearest_centroid expression matches the built-ins-only argmax") {
    val emb = graft.tables.Tables.embeddings(spark, sf())
    // arbitrary real centroids: quantized sums-shaped doubles from the corpus
    val cent = emb.filter(col("vec_id") < 16).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e7 + 0.5)).toArray))
      .sortBy(_._1).toSeq
    val diff = emb
      .select(
        Similarity.assignExpr(cent).as("fast"),
        Similarity.assignExprPortable(cent).as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    diff shouldBe 0L
  }

  test("k-means IVF training is deterministic across invocations") {
    val once = Similarity.qAnnIvfKmeans(spark, sf()).collect().toSeq
    val again = Similarity.qAnnIvfKmeans(spark, sf()).collect().toSeq
    again shouldBe once
  }

  test("IVF index write partitioned by cluster prunes probe scans") {
    // the 100 TB shape the qAnnIvf scaladoc claims: materialize the
    // inverted lists partitioned by cluster id, and a probe of one
    // cluster must scan ONLY that cluster's partition
    val emb = graft.tables.Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("embedding"))
    val cent = emb.filter(col("vec_id") < 4).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1).toSeq
    val dir = java.nio.file.Files.createTempDirectory("ivf").resolve("index").toString
    emb.withColumn("c_id", Similarity.assignExpr(cent))
      .write.partitionBy("c_id").parquet(dir)

    val probe = spark.read.parquet(dir).filter(col("c_id") === 2)
    val scan = probe.queryExecution.executedPlan.toString
    scan should include("PartitionFilters")
    scan should include("c_id")
    // pruning is real: the probe reads strictly fewer rows than the index
    val total = spark.read.parquet(dir).count()
    val probed = probe.count()
    probed should be > 0L
    probed should be < total
  }

  test("LSH recall is measured and nontrivial at sf0.001") {
    val row = Similarity.qAnnRecall(spark, sf())
      .agg(avg("recall_at_k"), avg("recall_multiprobe")).head()
    val (single, multi) = (row.getDouble(0), row.getDouble(1))
    // isotropic random vectors are LSH's worst case; the bar is "clearly
    // better than the ~6% chance rate of scanning that corpus fraction",
    // and the value is deterministic given the fixed corpus + planes
    single should be > 0.12
    single should be <= 1.0
    // Hamming-1 probing recovers one-unlucky-bit misses (0.24→0.82 @sf0.01)
    multi should be > single + 0.2
  }

  test("IVF recall: both paths beat chance; stand-in is query-biased") {
    val row = Similarity.qAnnRecallIvf(spark, sf())
      .agg(avg("recall_ivf"), avg("recall_ivf_kmeans")).head()
    val (standIn, trained) = (row.getDouble(0), row.getDouble(1))
    // probing 1/16 of the corpus at random would land ~1/16 of neighbors
    trained should be > 1.0 / Similarity.IvfCentroids
    trained should be <= 1.0
    // the stand-in's centroids CONTAIN the queries, so each query probes
    // its own cluster — inflated by construction, never below the honest
    // trained number on this corpus
    standIn should be >= trained
  }

  test("semantic dedup drops exactly the planted copies on this corpus") {
    val df = Similarity.qDedupSemantic(spark, sf()).cache()
    val nBase = graft.tables.Tables.embeddings(spark, sf()).count()
    val row = df.agg(
      sum("n_vectors"), sum("n_dropped"), sum("n_dup_pairs")).head()
    // corpus = base ∪ planted identical copies
    row.getLong(0) shouldBe 2 * nBase
    // every planted copy shares its base vector's cluster (identical
    // embedding → identical assignment) and scores cos 1.0, so it drops;
    // isotropic random pairs can't reach 0.95 at Dim=64
    row.getLong(1) shouldBe nBase
    row.getLong(2) should be >= nBase
    df.unpersist()
    ()
  }

  test("semantic dedup pairs within clusters only — no cartesian product") {
    val plan = Similarity.qDedupSemantic(spark, sf())
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("trained centroids are memoized per corpus dir") {
    val once = Similarity.trainedCentroids(spark, sf())
    val again = Similarity.trainedCentroids(spark, sf())
    again should be theSameInstanceAs once
  }

  test("directed probing lands between single-probe and full multi-probe") {
    val row = Similarity.qAnnRecall(spark, sf())
      .agg(avg("recall_at_k"), avg("recall_multiprobe"), avg("recall_directed"))
      .head()
    val (single, multi, directed) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    // 16 probe keys (vs multiprobe's 28) must buy a clear chunk of the
    // recall gap: directed probes the least-confident bits first
    directed should be > single
    directed should be <= multi
    directed should be > single + 0.15
  }

  test("q_range_search: grid join equals brute force, no cartesian product " +
    "in the plan") {
    val df = Similarity.qRangeSearch(spark, sf())
    val got = df.collect()
      .map(r => (r.getAs[Long]("vid_a"), r.getAs[Long]("vid_b"))).toSet
    // independent brute force over collected points
    val pts = graft.tables.Tables.embeddings(spark, sf())
      .select(col("vec_id"),
        element_at(col("embedding"), 1).cast("double").as("x"),
        element_at(col("embedding"), 2).cast("double").as("y"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val eps = Similarity.RangeEps
    val want = (for {
      (ia, xa, ya) <- pts; (ib, xb, yb) <- pts
      if ia < ib && math.abs(xa - xb) <= eps && math.abs(ya - yb) <= eps
    } yield (ia, ib)).toSet
    got shouldBe want
    val plan = df.queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("q_dbscan_core: census equals an in-JVM DBSCAN point typing over " +
    "collected points; the grid neighbor join stays cartesian-free") {
    val df = Similarity.qDbscanCore(spark, sf())
    val got = df.collect().map(r => r.getAs[String]("cls") ->
      (r.getAs[Long]("n_points"), r.getAs[Long]("n_edges"))).toMap
    val pts = graft.tables.Tables.embeddings(spark, sf())
      .select(col("vec_id"),
        element_at(col("embedding"), 1).cast("double").as("x"),
        element_at(col("embedding"), 2).cast("double").as("y"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val eps = Similarity.RangeEps
    val deg = pts.map { case (i, x, y) =>
      i -> pts.count { case (j, xj, yj) =>
        j != i && math.abs(x - xj) <= eps && math.abs(y - yj) <= eps
      }.toLong
    }.toMap
    val core = deg.collect { case (i, d) if d >= Similarity.DbscanMinPts => i }
      .toSet
    def cls(i: Long, x: Double, y: Double): String =
      if (core(i)) "core"
      else if (pts.exists { case (j, xj, yj) =>
        j != i && core(j) &&
          math.abs(x - xj) <= eps && math.abs(y - yj) <= eps
      }) "border"
      else "noise"
    val want = pts.groupBy { case (i, x, y) => cls(i, x, y) }.map {
      case (c, ps) => c -> (ps.length.toLong, ps.map(p => deg(p._1)).sum)
    }
    got shouldBe want
    got.keySet should contain("core")
    val plan = df.queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("q_dbscan_cluster: per-cluster census equals an in-JVM union-find " +
    "over brute-force core-core edges, and totals tie to q_dbscan_core") {
    val got = Similarity.qDbscanCluster(spark, sf()).collect()
      .map(r => r.getAs[Long]("cluster_id") ->
        (r.getAs[Long]("n_core"), r.getAs[Long]("n_border"))).toMap
    val pts = graft.tables.Tables.embeddings(spark, sf())
      .select(col("vec_id"),
        element_at(col("embedding"), 1).cast("double").as("x"),
        element_at(col("embedding"), 2).cast("double").as("y"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val eps = Similarity.RangeEps
    def near(a: (Long, Double, Double), b: (Long, Double, Double)) =
      a._1 != b._1 && math.abs(a._2 - b._2) <= eps &&
        math.abs(a._3 - b._3) <= eps
    val deg = pts.map(p => p._1 -> pts.count(q => near(p, q))).toMap
    val core = pts.filter(p => deg(p._1) >= Similarity.DbscanMinPts)
    val coreIds = core.map(_._1).toSet
    // union-find over core-core eps-edges
    val parent = scala.collection.mutable.Map(coreIds.toSeq.map(i => i -> i): _*)
    def find(i: Long): Long =
      if (parent(i) == i) i else { val r = find(parent(i)); parent(i) = r; r }
    for (a <- core; b <- core if a._1 < b._1 && near(a, b))
      parent(find(a._1)) = find(b._1)
    val clusterOf = coreIds.map { i =>
      i -> coreIds.filter(j => find(j) == find(i)).min
    }.toMap
    val borderAssign = pts
      .filter(p => !coreIds(p._1))
      .flatMap { p =>
        val cs = core.filter(c => near(p, c)).map(c => clusterOf(c._1))
        if (cs.isEmpty) None else Some(p._1 -> cs.min)
      }
    val want = (clusterOf.values.map(_ -> (1L, 0L)) ++
      borderAssign.map(_._2 -> (0L, 1L)))
      .groupBy(_._1).map { case (cid, vs) =>
        cid -> (vs.map(_._2._1).sum, vs.map(_._2._2).sum) }
    got shouldBe want
    // totals tie to the point-typing census
    val census = Similarity.qDbscanCore(spark, sf()).collect()
      .map(r => r.getAs[String]("cls") -> r.getAs[Long]("n_points")).toMap
    got.values.map(_._1).sum shouldBe census.getOrElse("core", 0L)
    got.values.map(_._2).sum shouldBe census.getOrElse("border", 0L)
  }

  test("q_knn_graph: mutual edges equal an in-JVM top-k over the " +
    "Spark-scored within-cluster pairs") {
    val cent = Similarity.trainedCentroids(spark, sf())
    val assigned = graft.tables.Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("embedding"),
        Similarity.assignExpr(cent).as("c_id"))
    // same Spark arithmetic as the query (codegen cosine + round 6); only
    // the top-k/mutual collapse is re-derived in-JVM
    val scored = assigned.as("a")
      .join(assigned.as("b"),
        col("a.c_id") === col("b.c_id") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        round(VectorExpressions.vecCosine(
          col("a.embedding"), col("b.embedding")), 6).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val topk = scored.groupBy(_._1).view.mapValues(
      _.sortBy(t => (-t._3, t._2)).take(Similarity.KnnGraphK)
        .map(t => t._2 -> t._3).toMap).toMap
    val want = (for {
      (a, nbrs) <- topk.toSeq; (b, c) <- nbrs
      if a < b && topk.getOrElse(b, Map.empty).contains(a)
    } yield (a, b, c)).sortBy(t => (t._1, t._2))
    val got = Similarity.qKnnGraph(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    got shouldBe want
    got should not be empty
  }

  test("q_silhouette: margins are nonnegative, sizes cover the corpus, " +
    "and the census equals an in-JVM re-aggregation of Spark-scored cosines") {
    val rows = Similarity.qSilhouette(spark, sf()).collect()
    val total = graft.tables.Tables.embeddings(spark, sf()).count()
    rows.map(_.getAs[Long]("n_vectors")).sum shouldBe total
    rows.foreach { r =>
      r.getAs[Double]("min_margin") should be >= 0.0
      r.getAs[Double]("mean_margin") should be >= r.getAs[Double]("min_margin")
    }
    // same Spark cosine arithmetic; only the sort/margin/mean collapses
    // are re-derived in-JVM (decimal-exact margins, so the mean is a
    // single division here exactly as in the query)
    val cent = Similarity.trainedCentroids(spark, sf())
    val scored = graft.tables.Tables.embeddings(spark, sf())
      .select(col("vec_id") +: cent.map { case (id, cv) =>
        round(VectorExpressions.vecCosine(
          col("embedding"), typedLit(cv)), 6).as(s"c$id")
      }: _*)
      .collect()
      .map(r => cent.map { case (id, _) =>
        (r.getAs[Double](s"c$id"), id) })
    val perVec = scored.map { cos =>
      val best = cos.minBy { case (c, id) => (-c, id) }
      val second = cos.filterNot(_ == best).minBy { case (c, id) => (-c, id) }
      (best._2, BigDecimal(best._1 - second._1)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP))
    }
    val want = perVec.groupBy(_._1).map { case (cid, vs) =>
      cid -> (vs.length.toLong, vs.map(_._2).min.toDouble,
        vs.map(_._2).sum.toDouble / vs.length)
    }
    val got = rows.map(r => r.getAs[Long]("c_id") ->
      (r.getAs[Long]("n_vectors"), r.getAs[Double]("min_margin"),
        r.getAs[Double]("mean_margin"))).toMap
    got shouldBe want
  }

  test("q_pq_search: full ranking shape, no self-retrieval, and ADC " +
    "recall clearly above chance despite 16x compression") {
    val rows = Similarity.qPqSearch(spark, sf()).collect()
    rows.length shouldBe Similarity.QueryCount * Similarity.TopK
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      rs.map(_.getAs[Long]("rk")).sorted.toSeq shouldBe
        (1L to Similarity.TopK.toLong)
      rs.foreach(_.getAs[Long]("vec_id") should not be q)
      // ranks follow the ppm score (desc, vec_id tiebreak)
      rs.sortBy(_.getAs[Long]("rk")).sliding(2).foreach { w =>
        val (a, b) = (w(0), w(1))
        assert(a.getAs[Long]("score_ppm") > b.getAs[Long]("score_ppm") ||
          (a.getAs[Long]("score_ppm") == b.getAs[Long]("score_ppm") &&
            a.getAs[Long]("vec_id") < b.getAs[Long]("vec_id")))
      }
    }
    val brute = Similarity.qAnnBrute(spark, sf()).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val hits = rows.groupBy(_.getAs[Long]("query_id")).map { case (q, rs) =>
      rs.map(_.getAs[Long]("vec_id")).toSet.intersect(brute(q)).size
    }.sum
    val recall = hits.toDouble / (Similarity.QueryCount * Similarity.TopK)
    // measured 0.18 at sf0.01 on the isotropic corpus — ~18x the ~0.01
    // chance rate at 4 bytes/vector; demand clearly-above-chance
    recall should be >= 0.05
  }

  test("q_ann_ivfpq: candidates come only from the query's coarse " +
    "cluster; ranking shape holds; recall above chance") {
    val rows = Similarity.qAnnIvfPq(spark, sf()).collect()
    rows.length shouldBe Similarity.QueryCount * Similarity.TopK
    val cent = Similarity.trainedCentroids(spark, sf())
    val cluster = graft.tables.Tables.embeddings(spark, sf())
      .select(col("vec_id"), Similarity.assignExpr(cent).as("c_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (q, v) = (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))
      v should not be q
      cluster(v) shouldBe cluster(q) // coarse pruning is real
    }
    val brute = Similarity.qAnnBrute(spark, sf()).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val hits = rows.groupBy(_.getAs[Long]("query_id")).map { case (q, rs) =>
      rs.map(_.getAs[Long]("vec_id")).toSet.intersect(brute(q)).size
    }.sum
    // measured 0.20 at sf0.01 (vs 0.18 full-corpus ADC, ~0.01 chance)
    hits.toDouble / rows.length should be >= 0.05
  }

  test("q_pq_codebook: every vector encodes once per subspace, codes are " +
    "codebook members, and the census equals an in-JVM re-aggregation") {
    val rows = Similarity.qPqCodebook(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("n_vectors"),
        r.getAs[Long]("fit_ppm_sum")))
    val n = graft.tables.Tables.embeddings(spark, sf()).count()
    (0 until Similarity.PqM).foreach { m =>
      rows.filter(_._1 == m).map(_._3).sum shouldBe n
    }
    val books = Similarity.pqCodebooks(spark, sf())
    rows.groupBy(_._1).foreach { case (m, rs) =>
      val ids = books(m.toInt).map(_._1).toSet
      rs.map(_._2).toSet.subsetOf(ids) shouldBe true
    }
    // re-derive the census from per-vector Spark-scored assignments
    import org.apache.spark.sql.functions._
    val perVec = (0 until Similarity.PqM).map { m =>
      val sub = slice(col("embedding"), m * Similarity.PqSubDim + 1,
        Similarity.PqSubDim)
      val fit = array_max(array(books(m).map { case (_, cv) =>
        round(graft.functions.VectorExpressions.vecCosine(
          sub, typedLit(cv.toSeq)), 6) }: _*))
      graft.tables.Tables.embeddings(spark, sf())
        .select(lit(m.toLong).as("m"),
          graft.functions.VectorExpressions.nearestCentroid(sub, books(m))
            .as("code"),
          floor(fit * 1e6 + lit(0.5)).cast("long").as("fit_ppm"))
    }.reduce(_ unionByName _)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = perVec.groupBy(t => (t._1, t._2)).map { case ((m, c), xs) =>
      (m, c, xs.length.toLong, xs.map(_._3).sum)
    }.toSeq.sortBy(t => (t._1, t._2))
    rows.toSeq.sortBy(t => (t._1, t._2)) shouldBe want
  }

  test("q_ann_ndcg equals an in-JVM replay over the two rankings and is " +
    "1.0 exactly when the IVF ranking matches ground truth") {
    val truth = Similarity.qAnnBrute(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    val cand = Similarity.qAnnIvfKmeans(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = cand.groupBy(_._1).map { case (q, rs) =>
      val dcg = rs.map { case (_, rk, v) =>
        val rel = truth.get((q, v)).map(Similarity.TopK + 1L - _).getOrElse(0L)
        rel * Similarity.NdcgDiscPpb(rk.toInt - 1)
      }.sum
      q -> dcg
    }
    val got = Similarity.qAnnNdcg(spark, sf()).collect()
    got.foreach { r =>
      val q = r.getLong(0)
      r.getLong(1) shouldBe want(q)
      r.getDouble(2) shouldBe want(q).toDouble / Similarity.NdcgIdealPpb
      r.getDouble(2) should (be >= 0.0 and be <= 1.0)
      // order sensitivity: ndcg is 1 iff the candidate list IS the true
      // top-k in true-rank order
      val perfect = cand.filter(_._1 == q)
        .forall { case (_, rk, v) => truth.get((q, v)).contains(rk) }
      (r.getDouble(2) == 1.0) shouldBe perfect
    }
  }

  test("q_rank_fusion: rrf recomputes from the carried ranks, per-query " +
    "order follows rrf, and the fusion genuinely mixes both backends") {
    val rows = Similarity.qRankFusion(spark, sf()).collect()
    rows should not be empty
    rows.foreach { r =>
      val ra = if (r.isNullAt(r.fieldIndex("rk_a"))) None
        else Some(r.getAs[Long]("rk_a"))
      val rb = if (r.isNullAt(r.fieldIndex("rk_b"))) None
        else Some(r.getAs[Long]("rk_b"))
      val want = ra.map(k => 1.0 / (Similarity.RrfK + k)).getOrElse(0.0) +
        rb.map(k => 1.0 / (Similarity.RrfK + k)).getOrElse(0.0)
      r.getAs[Double]("rrf") shouldBe want
      (ra.nonEmpty || rb.nonEmpty) shouldBe true
    }
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      rs.length should be <= Similarity.TopK
      val sorted = rs.sortBy(_.getAs[Long]("frk"))
      sorted.map(_.getAs[Long]("frk")) shouldBe (1L to rs.length).toSeq
      sorted.map(_.getAs[Double]("rrf")).sliding(2).foreach {
        case Array(a, b) => a should be >= b
        case _ =>
      }
    }
    // both single-backend and both-backend items survive fusion
    rows.exists(r => r.isNullAt(r.fieldIndex("rk_a"))) shouldBe true
    rows.exists(r => r.isNullAt(r.fieldIndex("rk_b"))) shouldBe true
    rows.exists(r => !r.isNullAt(r.fieldIndex("rk_a")) &&
      !r.isNullAt(r.fieldIndex("rk_b"))) shouldBe true
  }

  test("q_coreset: 8 distinct centers, one per round, covering the corpus " +
    "with a non-increasing greedy radius") {
    val rows = Similarity.qCoreset(spark, sf()).collect()
    rows.length shouldBe Similarity.CoresetK
    rows.map(_.getAs[Long]("sel_round")).sorted shouldBe
      (0L until Similarity.CoresetK.toLong)
    rows.map(_.getAs[Long]("center_id")).distinct.length shouldBe
      Similarity.CoresetK
    rows.find(_.getAs[Long]("sel_round") == 0L)
      .get.getAs[Long]("center_id") shouldBe 0L
    val n = graft.tables.Tables.embeddings(spark, sf()).count()
    rows.map(_.getAs[Long]("n_assigned")).sum shouldBe n
    // every center covers at least itself, at similarity 1.0
    rows.foreach { r =>
      r.getAs[Long]("n_assigned") should be >= 1L
      r.getAs[Double]("worst_cos") should be <= 1.0
    }
    // greedy invariant, re-derived in-JVM from the memoized selection:
    // the round-r selection score (min over unselected of max-sim to the
    // selected prefix) is non-decreasing in r — the k-center radius only
    // shrinks as centers are added
    val cent = Similarity.coresetCenters(spark, sf())
    cent.map(_._2) shouldBe (0 until Similarity.CoresetK)
    cent.map(_._1).distinct.length shouldBe Similarity.CoresetK
  }

  test("q_ari: pair counts recompute exactly from an in-JVM contingency " +
    "table and the chance correction lands near zero on isotropic data") {
    val row = Similarity.qAri(spark, sf()).collect().head
    val cent = Similarity.trainedCentroids(spark, sf())
    val asg = graft.tables.Tables.embeddings(spark, sf())
      .select(Similarity.assignExpr(cent).as("c_id"),
        col("label").cast("long").as("label"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def comb(x: Long): Long = x * (x - 1) / 2
    val cells = asg.groupBy(identity).view.mapValues(_.length.toLong)
    val s = cells.values.map(comb).sum
    val a = asg.groupBy(_._1).values.map(g => comb(g.length.toLong)).sum
    val b = asg.groupBy(_._2).values.map(g => comb(g.length.toLong)).sum
    val n = asg.length.toLong
    row.getAs[Long]("n") shouldBe n
    row.getAs[Long]("s_pairs") shouldBe s
    row.getAs[Long]("a_pairs") shouldBe a
    row.getAs[Long]("b_pairs") shouldBe b
    val ari = (2.0 * (s * comb(n) - a * b)) /
      (comb(n) * (a + b) - 2 * a * b).toDouble
    row.getAs[Double]("ari") shouldBe ari
    // labels are independent of the embedding geometry, so the
    // chance-corrected agreement must sit near zero (raw Rand would not)
    math.abs(row.getAs[Double]("ari")) should be < 0.05
  }

  test("q_hard_negatives: per anchor, negatives are the top-similarity " +
    "other-label rows and positives the bottom-similarity same-label rows") {
    val rows = Similarity.qHardNegatives(spark, sf()).collect()
    rows should not be empty
    val anchors = graft.tables.Tables.embeddings(spark, sf())
      .filter(col("vec_id") < Similarity.QueryCount)
      .select(col("vec_id"), col("label").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (qid, rs) =>
      val (neg, pos) = rs.partition(_.getAs[String]("kind") == "neg")
      neg.length shouldBe Similarity.HardK
      pos.length shouldBe Similarity.HardK
      neg.foreach(_.getAs[Long]("label") should not be anchors(qid))
      pos.foreach(_.getAs[Long]("label") shouldBe anchors(qid))
      // negatives ranked most-similar first, positives least-similar first
      neg.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("cos"))
        .sliding(2).foreach {
          case Array(a, b) => a should be >= b
          case _ =>
        }
      pos.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("cos"))
        .sliding(2).foreach {
          case Array(a, b) => a should be <= b
          case _ =>
        }
    }
  }
}
