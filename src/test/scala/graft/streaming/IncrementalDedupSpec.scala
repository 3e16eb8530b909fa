package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.operators.{ConnectedComponents, Dedup}

/** Batch ≡ stream proof for [[IncrementalDedup]]: the incrementally
  * maintained clusters must equal the batch pipeline's transitive closure
  * for ANY arrival order and micro-batch split (the property that makes the
  * operator usable — a backfill replaying history and a live stream must
  * agree).
  */
class IncrementalDedupSpec extends SparkSpec with Matchers {

  /** Batch truth: the verified-edge closure exactly as
    * [[Dedup.qDedupPipeline]] builds it (bands → capped candidates →
    * Jaccard ≥ threshold → connected components).
    */
  private val fns = org.apache.spark.sql.functions

  private lazy val batchComponents: Map[Long, Long] = {
    val withHs = Dedup.withHashedShingles(Dedup.nearDupDocs(spark, sf()))
      .select(col("doc_id"), col("hs"))
      .persist()
    val verified = Dedup
      .minhashCandidates(Dedup.minhashBanded(withHs), Dedup.MaxLshBucket)
      .join(withHs.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), "doc_a")
      .join(withHs.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), "doc_b")
      .select(col("doc_a").as("src"), col("doc_b").as("dst"),
        (fns.size(array_intersect(col("hs_a"), col("hs_b"))).cast("double") /
          fns.size(array_distinct(fns.concat(col("hs_a"), col("hs_b"))))).as("j"))
      .filter(col("j") >= Dedup.JaccardThreshold)
      .select(col("src"), col("dst"))
    val comp = ConnectedComponents.components(verified).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    withHs.unpersist()
    comp
  }

  test("incremental clusters equal the batch closure for shuffled arrivals " +
    "across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Dedup.nearDupDocs(spark, sf())
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    batchComponents should not be empty // the planted corpus has duplicates

    for (seed <- Seq(1, 42, 2026)) {
      val order = new scala.util.Random(seed).shuffle(docs)
      val input = MemoryStream[(Long, String)]
      val store = new IncrementalDedup.ClusterStore
      val q = IncrementalDedup.run(
        input.toDF().toDF("doc_id", "text"), store)
      try {
        order.grouped(math.max(1, order.size / 4 + 1)).foreach { chunk =>
          input.addData(chunk)
          q.processAllAvailable()
        }
        withClue(s"arrival order seed=$seed: ") {
          store.snapshot shouldBe batchComponents
        }
      } finally q.stop()
    }
  }

  test("distributed closure equals the batch closure and the union-find " +
    "after every micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Dedup.nearDupDocs(spark, sf())
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val order = new scala.util.Random(7).shuffle(docs)

    val input = MemoryStream[(Long, String)]
    val dist = new IncrementalDedup.DistributedClusterStore(spark)
    val uf = new IncrementalDedup.ClusterStore
    val qd = IncrementalDedup.runDistributed(
      input.toDF().toDF("doc_id", "text"), dist)
    val qu = IncrementalDedup.run(
      input.toDF().toDF("doc_id", "text"), uf)
    try {
      order.grouped(math.max(1, order.size / 3 + 1)).foreach { chunk =>
        input.addData(chunk)
        qd.processAllAvailable()
        qu.processAllAvailable()
        // mid-stream: the distributed mapping equals the union-find over
        // the same prefix — snapshot ≡ closure(edges so far)
        dist.snapshot shouldBe uf.snapshot
      }
      dist.snapshot shouldBe batchComponents
      // the mapping is consumable as a DataFrame without driver collection
      dist.mapping.groupBy("component").count()
        .agg(fns.max("count")).head().getLong(0) should be >= 2L
    } finally { qd.stop(); qu.stop() }
  }

  test("compacted distributed closure (closeEvery=3) equals the eager one " +
    "for any merge split") {
    import spark.implicits._
    // drive the store directly with random splits of a known edge set —
    // compaction must be invisible to reads (mapping flushes pending)
    val edges = batchComponents.toSeq
      .filter { case (id, comp) => id != comp }
      .map { case (id, comp) => (comp, id) }
    val want = batchComponents
    for (seed <- Seq(5, 17)) {
      val rnd = new scala.util.Random(seed)
      val store = new IncrementalDedup.DistributedClusterStore(spark, closeEvery = 3)
      var rest = rnd.shuffle(edges)
      while (rest.nonEmpty) {
        val take = 1 + rnd.nextInt(math.max(1, rest.size / 2))
        store.merge(rest.take(take).toDF("src", "dst"))
        rest = rest.drop(take)
      }
      withClue(s"seed=$seed: ") { store.snapshot shouldBe want }
    }
  }

  test("retention-bounded variant: in-window duplicates found, buckets " +
    "expire after the watermark passes retention, and re-open cleanly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)

    val textA = "alpha beta gamma delta epsilon"
    val textB = "omega sigma tau upsilon phi"
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val store = new IncrementalDedup.ClusterStore
    val q = IncrementalDedup.runWithRetention(
      input.toDF().toDF("doc_id", "text", "ts"), store,
      retention = java.time.Duration.ofHours(1))
    try {
      // batch 1: A and B open buckets at 10:00; A's duplicate lands at
      // 10:30, inside retention → edge (1,2)
      input.addData((1L, textA, t("2024-01-01 10:00:00")),
        (3L, textB, t("2024-01-01 10:00:00")),
        (2L, textA, t("2024-01-01 10:30:00")))
      q.processAllAvailable()
      store.snapshot shouldBe Map(1L -> 1L, 2L -> 1L)

      // batch 2: unrelated filler pushes the watermark to 13:00 — both
      // buckets' last activity + 1h is long past, so they expire
      input.addData((100L, "one two three four five", t("2024-01-01 13:00:00")))
      q.processAllAvailable()

      // batch 3: B's duplicate arrives at 14:00 — 4h after B, bucket gone,
      // pair (3,4) is MISSED by construction
      input.addData((4L, textB, t("2024-01-01 14:00:00")))
      q.processAllAvailable()
      store.snapshot shouldBe Map(1L -> 1L, 2L -> 1L)

      // batch 4: another copy at 14:20 — within retention of the RE-OPENED
      // bucket → edge (4,5); the old member 3 stays absent
      input.addData((5L, textB, t("2024-01-01 14:20:00")))
      q.processAllAvailable()
      store.snapshot shouldBe Map(1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L)
    } finally q.stop()
  }

  test("per-bucket admission cap bounds state and pair work on a " +
    "degenerate all-identical stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // 100 identical docs — every band bucket would go quadratic uncapped
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val input = MemoryStream[(Long, String)]
    val cap = 8
    val edges = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = IncrementalDedup
      .incrementalEdges(IncrementalDedup.bandedSignatures(
        input.toDF().toDF("doc_id", "text")), maxBucket = cap)
      .toDF()
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        edges.synchronized {
          edges ++= b.collect().map(r => (r.getLong(0), r.getLong(1)))
        }
        ()
      }
      .start()
    try {
      input.addData((0L until 100L).map(i => (i, text)))
      q.processAllAvailable()
      // only the first `cap` arrivals per bucket participate: every emitted
      // pair is within the admitted prefix, never the 100²/2 uncapped set
      val pairs = edges.synchronized(edges.distinct)
      pairs.size shouldBe cap * (cap - 1) / 2
      pairs.foreach { case (a, b) =>
        a should be < cap.toLong
        b should be < cap.toLong
      }
    } finally q.stop()
  }

  test("retention-bounded line claims: in-window duplicates dropped, " +
    "lapsed claims re-admit the line") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)

    val line = "alpha beta gamma delta"
    val other = "omega sigma tau upsilon"
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = IncrementalDedup.incrementalLineClaimsWithRetention(
      IncrementalDedup.lineRowsWithTs(
        input.toDF().toDF("doc_id", "text", "ts")
          .withWatermark("ts", "0 seconds")),
      java.time.Duration.ofHours(1))
      .toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("line_claims_ret").start()
    try {
      // 10:00 claims the line; the 10:30 copy is inside retention → dropped
      input.addData((1L, line, t("2024-01-01 10:00:00")),
        (2L, line, t("2024-01-01 10:30:00")))
      q.processAllAvailable()
      // filler pushes the watermark to 13:00: last activity 10:30 + 1h is
      // long past, the claim lapses
      input.addData((100L, other, t("2024-01-01 13:00:00")))
      q.processAllAvailable()
      // 14:00: claim gone → the line is RE-ADMITTED (kept again)
      input.addData((3L, line, t("2024-01-01 14:00:00")))
      q.processAllAvailable()
      // 14:20: within retention of the refreshed claim → dropped
      input.addData((4L, line, t("2024-01-01 14:20:00")))
      q.processAllAvailable()

      val kept = spark.table("line_claims_ret").collect()
        .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
      kept(1L) shouldBe true
      kept(2L) shouldBe false
      kept(3L) shouldBe true
      kept(4L) shouldBe false
    } finally q.stop()
  }

  test("line claims: ordered arrival equals the batch keep set; any order " +
    "keeps exactly one instance per distinct line") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val corpus = Dedup.nearDupDocs(spark, sf())
    // batch truth: the q_dedup_lines_keep first-occurrence resolution
    val batchKept = Dedup.lineRows(corpus)
      .withColumn("inst", col("doc_id") * fns.lit(1L << 32) + col("line_no"))
      .groupBy(col("h")).agg(fns.min("inst").as("m"))
      .collect().map(_.getLong(1)).toSet
    batchKept should not be empty
    val docs = corpus.collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    // doc-ordered micro-batches: the kept set is bit-identical to batch
    {
      val input = MemoryStream[(Long, String)]
      val q = IncrementalDedup.incrementalLineClaims(
        Dedup.lineRows(input.toDF().toDF("doc_id", "text")))
        .toDF()
        .writeStream.outputMode("append").format("memory")
        .queryName("line_claims_ordered").start()
      try {
        docs.sortBy(_._1).grouped(docs.size / 5 + 1).foreach { c =>
          input.addData(c); q.processAllAvailable()
        }
        val got = spark.table("line_claims_ordered")
          .filter(col("kept"))
          .select(col("doc_id") * fns.lit(1L << 32) + col("line_no"))
          .collect().map(_.getLong(0)).toSet
        got shouldBe batchKept
      } finally q.stop()
    }

    // shuffled arrival: the keeper may differ, but every distinct line has
    // EXACTLY one — the partition property dedup correctness rests on
    {
      val input = MemoryStream[(Long, String)]
      val q = IncrementalDedup.incrementalLineClaims(
        Dedup.lineRows(input.toDF().toDF("doc_id", "text")))
        .toDF()
        .writeStream.outputMode("append").format("memory")
        .queryName("line_claims_shuffled").start()
      try {
        new scala.util.Random(99).shuffle(docs)
          .grouped(docs.size / 5 + 1).foreach { c =>
            input.addData(c); q.processAllAvailable()
          }
        val perLine = spark.table("line_claims_shuffled")
          .groupBy(col("h"))
          .agg(fns.sum(fns.when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
        perLine.filter(col("n_kept") =!= 1L).count() shouldBe 0L
        perLine.count() shouldBe batchKept.size.toLong
      } finally q.stop()
    }
  }
}
