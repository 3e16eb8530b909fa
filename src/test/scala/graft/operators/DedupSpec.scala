package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Dedup operators must *find* the planted duplicate structure (recall),
  * and discriminate it from unrelated pairs — value parity with DuckDB runs
  * through the oracle gate.
  */
class DedupSpec extends SparkSpec with Matchers {

  test("exact/canonical dedup: every planted group found, with 2 exact variants") {
    val df = Dedup.qDedupExact(spark, sf()).cache()
    // identical copy collapses under md5; permuted copy joins under norm fp
    df.agg(min("n_copies")).head().getLong(0) should be >= 3L
    df.agg(max("n_exact_variants")).head().getLong(0) should be >= 2L
    df.unpersist()
    ()
  }

  test("n-gram jaccard separates near-dups from neighbors") {
    // Very short docs (1-2 tokens, 0-1 shingles) legitimately score low
    // against their tail-appended copy; assert on the distribution, which
    // is deterministic (seeded corpus, md5 hashing).
    val df = Dedup.qDedupJaccard(spark, sf()).cache()
    val row = df
      .agg(avg(col("j_dup")).as("avg_dup"), avg(col("j_next")).as("avg_next"))
      .head()
    row.getDouble(0) should be > 0.8 // near-copies stay near-identical
    row.getDouble(1) should be < 0.2 // unrelated neighbors stay dissimilar
    df.unpersist()
    ()
  }

  test("minhash-LSH recalls all high-jaccard planted pairs") {
    import spark.implicits._
    val trueJ = Dedup.qDedupJaccard(spark, sf())
      .select(col("doc_id"), col("j_dup"))
    val expected = trueJ.filter(col("j_dup") >= 0.85).count()
    expected should be > 0L
    val found = Dedup.qDedupMinhash(spark, sf())
      .filter(col("doc_b") === col("doc_a") + Dedup.PlantOffset)
      .select(col("doc_a").as("doc_id"))
      .join(trueJ.filter(col("j_dup") >= 0.85), "doc_id")
      .count()
    // r=2, b=8: P(miss) at J=0.85 is ~3e-5 — and deterministic given md5
    found shouldBe expected
  }

  test("split leakage: buckets partition the verified pair set; " +
      "straddling pairs are flagged and present") {
    val rows = Dedup.qSplitLeakage(spark, sf()).collect()
    rows.foreach { r =>
      val (lo, hi) = (r.getString(0), r.getString(1))
      Seq("train", "val", "test") should contain(lo)
      Seq("train", "val", "test") should contain(hi)
      lo should be <= hi
      r.getLong(r.fieldIndex("is_leak")) shouldBe (if (lo != hi) 1L else 0L)
    }
    // the report partitions exactly the pipeline's verified pair set
    val totalPairs = rows.map(_.getLong(rows.head.fieldIndex("n_pairs"))).sum
    val expected = Dedup.qDedupMinhash(spark, sf())
      .filter(col("jaccard") >= Dedup.JaccardThreshold)
      .count()
    totalPairs shouldBe expected
    // planted near-copies get independent split hashes → leaks exist
    rows.filter(r => r.getString(0) != r.getString(1))
      .map(_.getLong(rows.head.fieldIndex("n_pairs"))).sum should be > 0L
  }

  test("simhash: planted near-dup hamming below unrelated-neighbor hamming") {
    val df = Dedup.qDedupSimhash(spark, sf()).cache()
    val row = df
      .agg(avg(col("ham_dup")).as("a"), avg(col("ham_next")).as("b"))
      .head()
    // near-copies flip few bits; unrelated 16-bit signatures differ by ~8
    (row.getDouble(1) - row.getDouble(0)) should be > 2.0
    df.unpersist()
    ()
  }

  test("LSH bucket-size cap drops degenerate buckets, keeps normal ones") {
    import spark.implicits._
    // a degenerate corpus: many IDENTICAL documents — every one lands in
    // the same bucket in every band, so uncapped pair generation would be
    // quadratic (n·(n-1)/2 pairs per band)
    val n = 200
    val degenerate = (0 until n)
      .map(i => (i.toLong, "the same words in the same order every time"))
      .toDF("doc_id", "text")
    val banded = Dedup.minhashBanded(
      Dedup.withHashedShingles(degenerate).select(col("doc_id"), col("hs")))

    // capped: the oversized buckets are dropped wholesale -> zero pairs
    Dedup.minhashCandidates(banded, Dedup.MaxLshBucket).count() shouldBe 0L
    // uncapped (cap >= bucket size): the quadratic blow-up this guards
    Dedup.minhashCandidates(banded, n).count() shouldBe n.toLong * (n - 1) / 2

    // and a normal-sized duplicate cluster passes through the cap intact
    val small = (0 until 3)
      .map(i => (i.toLong, "a modest duplicate cluster of three documents"))
      .toDF("doc_id", "text")
    val smallBanded = Dedup.minhashBanded(
      Dedup.withHashedShingles(small).select(col("doc_id"), col("hs")))
    Dedup.minhashCandidates(smallBanded, Dedup.MaxLshBucket)
      .count() shouldBe 3L
  }

  test("line dedup: every full line of a tail-copy is foreign to it") {
    // A planted tail-copy shares chunks 0..floor(n/K)-1 with its original
    // (the tail only perturbs the final partial chunk and appends at most
    // one more), so per copy: n_foreign >= n_lines - 2. Originals can have
    // foreign lines too (generator boilerplate), so no upper bound there.
    val df = Dedup.qDedupLines(spark, sf()).cache()
    val copies = df.filter(col("doc_id") >= Dedup.PlantOffset)
    copies.count() should be > 0L
    copies
      .filter(col("n_foreign_lines") < col("n_lines") - 2)
      .count() shouldBe 0L
    // line counts are chunked token counts, never zero for non-empty docs
    df.agg(min("n_lines")).head().getLong(0) should be >= 1L
    df.unpersist()
    ()
  }

  test("line-dedup transform: kept instances partition the distinct line set") {
    val df = Dedup.qDedupLinesKeep(spark, sf()).cache()
    val fns = org.apache.spark.sql.functions
    // keep-first keeps EXACTLY one instance per distinct line: Σ n_kept
    // equals the corpus' distinct chunk-string count (recomputed here
    // from the same construction, hash-free)
    val totalKept = df.agg(sum("n_kept")).head().getLong(0)
    val tk = fns.filter(fns.split(fns.lower(col("text")), "[^a-z]+"),
      t => fns.length(t) > 0)
    val k = Dedup.LineTokens
    val distinctLines = Dedup.nearDupDocs(spark, sf())
      .withColumn("tk", tk)
      .filter(fns.size(col("tk")) > 0)
      .select(explode(transform(
        sequence(lit(0), fns.ceil(fns.size(col("tk")) / lit(k.toDouble))
          .cast("int") - 1),
        i => array_join(slice(col("tk"), i * k + 1, lit(k)), " "))).as("line"))
      .distinct().count()
    assert(totalKept == distinctLines)
    // a tail-copy's full chunks are all first-claimed by its original:
    // at most the <=2 tail-touching chunks survive
    df.filter(col("doc_id") >= Dedup.PlantOffset)
      .filter(col("n_kept") > 2).count() shouldBe 0L
    // md5("") marks fully-deduped docs; they must report n_kept = 0
    df.filter(col("clean_md5") === fns.md5(fns.lit("")).cast("string"))
      .filter(col("n_kept") =!= 0).count() shouldBe 0L
    df.unpersist()
    ()
  }

  test("substring dedup: a mid-document copied span is found with exact extent") {
    import spark.implicits._
    // letter-only tokens (the tokenizer splits on [^a-z]+): qa qb qc ...
    def tok(i: Int): String = s"q${('a' + i / 26).toChar}${('a' + i % 26).toChar}"
    def uniq(prefix: Char, n: Int): Seq[String] =
      (0 until n).map(i => s"$prefix${tok(i)}")
    val a = uniq('a', 60)
    // doc 2 copies a[20..39] (20 tokens) into the MIDDLE of otherwise-novel
    // text — invisible to doc-level exact dedup, below MinHash's threshold
    val b = uniq('b', 15) ++ a.slice(20, 40) ++ uniq('c', 15)
    // doc 3 copies only 14 tokens — one below MinRunTokens
    val d = uniq('d', 15) ++ a.slice(20, 34) ++ uniq('e', 15)
    val corpus = Seq(
      (1L, a.mkString(" ")), (2L, b.mkString(" ")), (3L, d.mkString(" ")))
      .toDF("doc_id", "text")
    val spans = Dedup.substringSpans(corpus).collect()

    // exactly the (1,2) pair: one run of exactly 20 tokens
    val p12 = spans.filter(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    p12.length shouldBe 1
    p12.head.getLong(2) shouldBe 1L  // n_runs
    p12.head.getLong(3) shouldBe 20L // max_run_tokens
    // the 14-token copy in doc 3 is below threshold — no (1,3) pair; but
    // docs 2 and 3 share a[20..33] (14 tokens) — also below threshold
    spans.map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe Set((1L, 2L))
  }

  test("substring dedup: planted splices pair with both source docs") {
    val spans = Dedup.qDedupSubstring(spark, sf()).cache()
    // every base doc with >= MinRunTokens tokens must pair with the splice
    // that copied its prefix (doc_id + SpliceOffset)
    val docs = graft.tables.Tables.documents(spark, sf())
    val longEnough = docs
      .filter(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.filter(
          split(lower(col("text")), "[^a-z]+"),
          t => org.apache.spark.sql.functions.length(t) > 0)) >=
          Dedup.MinRunTokens)
      .count()
    longEnough should be > 0L
    val firstSource = spans
      .filter(col("doc_b") === col("doc_a") + Dedup.SpliceOffset).count()
    // first-source recall: the splice's leading tokens ARE doc_a's prefix
    firstSource should be >= (longEnough * 9) / 10
    // runs never exceed the splice construction except via genuine base-
    // corpus template overlap, which the detector must also report
    spans.agg(max("max_run_tokens")).head().getLong(0) should be >=
      Dedup.SpliceLen.toLong
    spans.unpersist()
    ()
  }

  test("substring dedup: degenerate boilerplate shingles are capped out") {
    import spark.implicits._
    // 40 docs of one identical 30-token text: every shingle occurs 40 times
    // corpus-wide > MaxSpanOcc — uncapped, bucket pair-gen would be
    // quadratic; capped, the stage emits nothing (doc-level dedup is the
    // right operator for full copies, cf. MaxLshBucket's rationale)
    val boiler = (0 until 30).map(i => s"w${('a' + i % 26).toChar}$i")
      .map(_.replaceAll("[0-9]", "x")).mkString(" ")
    val corpus = (0 until 40).map(i => (i.toLong, boiler)).toDF("doc_id", "text")
    Dedup.substringSpans(corpus).count() shouldBe 0L
  }

  test("decontamination flags every planted eval leak, and flags cleanly") {
    val flagged = Dedup.qDecontaminate(spark, sf()).cache()

    // every eval doc with >= threshold shingles re-entered the training
    // side tail-appended; appending preserves all original 3-grams, so each
    // such plant MUST be flagged (recall = 1 on plants)
    val docs = graft.tables.Tables.documents(spark, sf())
    val evalWithEnough = Dedup.withShingles(
      docs.filter(col("doc_id") % Dedup.EvalMod === 0)
        .select(col("doc_id"), col("text")), Dedup.ContamNgram)
      // qualified: scalatest Matchers shadows `size` with its SizeWord
      .filter(org.apache.spark.sql.functions.size(col("sh")) >=
        lit(Dedup.ContamMinShared))
      .count()
    evalWithEnough should be > 0L
    val plantsFlagged = flagged
      .filter(col("doc_id") >= Dedup.PlantOffset)
    plantsFlagged.count() shouldBe evalWithEnough
    // a full-document leak shares ALL k original shingles; the appended
    // tail adds at most 7 unshared ones, so overlap >= k/(k+7) > 0.4 at
    // the k >= 5 flagging threshold — well above a borderline hit
    plantsFlagged.agg(min("overlap")).head().getDouble(0) should be > 0.4

    // the corpus has ~zero natural cross-document shingle overlap, so
    // un-planted training docs stay (almost) all unflagged
    val trainTotal = docs.filter(col("doc_id") % Dedup.EvalMod =!= 0).count()
    val naturalFlagged = flagged.filter(col("doc_id") < Dedup.PlantOffset).count()
    naturalFlagged.toDouble / trainTotal should be < 0.02
    flagged.unpersist()
    ()
  }

  test("winnowed probe covers every pair the full span detector finds " +
    "at a fraction of the fingerprint volume") {
    // guarantee precondition: every reported run has >= MinRunTokens
    // tokens >= WinnowWindow + SpanNgram - 1, so the SIGMOD'03 coverage
    // property promises a shared selected fingerprint for each such pair
    Dedup.MinRunTokens should be >= (Dedup.WinnowWindow + Dedup.SpanNgram - 1)
    val full = Dedup.qDedupSubstring(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val win = Dedup.qDedupSubstringWin(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    full should not be empty
    withClue("full-detector pairs missing from the winnowed candidates:") {
      (full -- win) shouldBe empty
    }
    // the probe ships a fraction of the positional instances
    val corpus = Dedup.splicedDocs(spark, sf())
    val F = org.apache.spark.sql.functions
    val grams = corpus
      .select(explode(graft.functions.SketchExpressions.wordNGrams(
        F.filter(split(lower(col("text")), "[^a-z]+"), t => F.length(t) > 0),
        Dedup.SpanNgram, distinct = false)).as("g"))
      .count()
    val fps = Dedup.winnowedFingerprints(corpus).count()
    fps.toDouble / grams should be < 0.55 // ~2/(w+1)=0.4 + distinct slack
  }

  test("two-phase probe-then-verify equals the full span detector exactly") {
    val full = Dedup.qDedupSubstring(spark, sf()).collect().toSeq
    val twoPhase = Dedup.qDedupSubstring2P(spark, sf()).collect().toSeq
    full should not be empty
    twoPhase shouldBe full
  }

  test("two-phase detector caps boilerplate by FULL-corpus occurrence, " +
      "not candidate-subset occurrence") {
    import spark.implicits._
    // the sf0.1 regression shape: a boilerplate run present in MANY docs
    // (> MaxSpanOcc corpus-wide) but in few CANDIDATE docs. Docs 0 and 1
    // share a long unique span (the only winnowed candidate pair); the
    // boilerplate tail is shared by those two AND by many non-candidate
    // docs. A subset-measured cap would admit the boilerplate shingles in
    // phase 2 and report extra matched tokens for (0, 1).
    // tokens must be pure letters — the tokenizer splits on [^a-z]+
    def alpha(i: Int): String = "" + ('a' + i / 26).toChar + ('a' + i % 26).toChar
    val span = (0 until 30).map(i => s"u${alpha(i)}").mkString(" ")
    val boiler = (0 until Dedup.SpanNgram + Dedup.MinRunTokens)
      .map(i => s"b${alpha(i)}").mkString(" ")
    val docs =
      Seq((0L, s"$span $boiler"), (1L, s"$span $boiler")) ++
        // each filler doc is otherwise unique → never a candidate
        (2L until 2L + Dedup.MaxSpanOcc + 3L).map(i =>
          (i, (0 until 25).map(j => s"f${alpha(i.toInt)}${alpha(j)}").mkString(" ")
            + " " + boiler))
    val corpus = docs.toDF("doc_id", "text")
    val full = Dedup.substringSpans(corpus).collect().toSeq
    val twoPhase = Dedup.twoPhaseSpans(corpus).collect().toSeq
    // the boilerplate shingles exceed MaxSpanOcc corpus-wide, so the full
    // detector reports ONLY the (0, 1) run: the 30 unique tokens plus the
    // SpanNgram-1 boilerplate tokens reached by windows anchored on u29
    // (a subset-measured cap would instead match the whole 53-token doc)
    full.map(r => (r.getLong(0), r.getLong(1))) shouldBe Seq((0L, 1L))
    full.head.getLong(full.head.fieldIndex("matched_tokens")) shouldBe
      30L + Dedup.SpanNgram - 1
    twoPhase shouldBe full
  }

  test("source-overlap matrix: ordered pairs, bounded sharing, one shingle shuffle") {
    val rows = Dedup.qSourceOverlap(spark, sf()).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val (s1, s2) = (r.getString(0), r.getString(1))
      val (shared, n1, n2) = (r.getLong(2), r.getLong(3), r.getLong(4))
      s1 should be < s2 // canonical orientation, no double-count
      shared should be <= math.min(n1, n2) // shared ⊆ each side
      val j = r.getDouble(5)
      j should (be > 0.0 and be <= 1.0)
    }
    // the shingle table must not be self-joined: a single grouped pair-emit
    // means no SortMergeJoin/ShuffledHashJoin on h anywhere in the plan
    val plan = Dedup.qSourceOverlap(spark, sf())
      .queryExecution.executedPlan.toString
    plan should not include "SortMergeJoin"
  }

  test("cluster-size histogram partitions the in-cluster mass and ties " +
    "to the keep ledger") {
    val hist = Dedup.qDedupClusterHist(spark, sf()).collect()
    hist.foreach { r =>
      r.getLong(0) * r.getLong(1) shouldBe r.getLong(2) // size·count = docs
      r.getLong(0) should be >= 2L // singletons never enter the mapping
    }
    val ledger = Dedup.qDedupKeep(spark, sf()).head()
    hist.map(_.getLong(2)).sum shouldBe ledger.getAs[Long]("n_in_clusters")
    hist.map(_.getLong(1)).sum shouldBe ledger.getAs[Long]("n_clusters")
  }

  test("boilerplate removal drops EVERY instance of high-df lines — " +
    "including the first, unlike keep-first dedup") {
    val rows = Dedup.qBoilerplate(spark, sf()).collect()
    rows.foreach { r =>
      r.getLong(2) should be >= 0L
      r.getLong(2) should be <= r.getLong(1)
    }
    // total removed = exactly the instance mass of hashes over the df
    // threshold, recomputed independently over the shared line table
    val lines = Dedup.sharedLineRows(spark, sf())
    val bpInstances = lines
      .groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("inst"))
      .filter(col("df") > Dedup.BoilerplateDf)
      .agg(sum(col("inst"))).head().getLong(0)
    bpInstances should be > 0L // the planted template lines exist
    rows.map(_.getLong(2)).sum shouldBe bpInstances
  }

  test("delete cascade: every derived artifact sheds the erased ids, " +
    "ledger ties to the real anti-join") {
    val rows = Dedup.qDeleteCascade(spark, sf()).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    rows.keySet shouldBe
      Set("documents", "line_index", "chunk_index", "embedding_index")
    rows.values.foreach { case (before, deleted, after) =>
      deleted should be > 0L // the cascade reached this artifact
      after shouldBe before - deleted
    }
    // the line-index ledger equals the REAL anti-join over the shared
    // line table — the ledger reports what an executed erasure retains
    val retained = Dedup.sharedLineRows(spark, sf())
      .filter(!(col("doc_id") % Dedup.DeleteMod === Dedup.DeleteResidue))
      .count()
    rows("line_index")._3 shouldBe retained
  }

  test("q_dedup_recall: LSH finds every planted candidate; the exact-" +
    "Jaccard threshold, not the banding, bounds end-to-end recall") {
    val r = Dedup.qDedupRecall(spark, sf()).head()
    val (nTrue, nCand, nCandHit) = (r.getAs[Long]("n_true"),
      r.getAs[Long]("n_cand"), r.getAs[Long]("n_cand_hit"))
    val (nVer, nVerHit) = (r.getAs[Long]("n_verified"), r.getAs[Long]("n_ver_hit"))
    nTrue should be > 0L
    // count lattice
    nCandHit should be <= nTrue
    nVerHit should be <= nCandHit
    nVer should be <= nCand
    // the 8×2 banding's S-curve: every planted tail-copy pair (J near 1
    // for all but the shortest docs) surfaces as a candidate
    r.getAs[Double]("lsh_recall") shouldBe 1.0
    // verification then drops only the short docs whose 5-token tail
    // shifts J below the 0.8 threshold — a threshold property, not a
    // recall failure of the sketch
    r.getAs[Double]("e2e_recall") should be >= 0.8
    r.getAs[Double]("truth_precision") should be > 0.5
  }

  test("q_dedup_minhash_dfkill: the >2%-df template kill actually fires, " +
    "never inflates the candidate set, and RAISES end-to-end recall (the " +
    "killed mass includes the planted tail, so true pairs re-converge " +
    "to J = 1 — the boilerplate-removal recall effect)") {
    val k = Dedup.qDedupMinhashDfkill(spark, sf()).head()
    val base = Dedup.qDedupRecall(spark, sf()).head()
    k.getAs[Long]("n_hot") should be > 0L
    // same eligibility (the 2% rule kills no document on this corpus)
    k.getAs[Long]("n_true") shouldBe base.getAs[Long]("n_true")
    // fewer (or equal) candidates — the FP mass shrinks, never grows
    k.getAs[Long]("n_cand") should be <= base.getAs[Long]("n_cand")
    // banding recall stays perfect AND verify recall strictly improves:
    // the tail shingles that pushed short docs' J below 0.8 are template
    // mass by the df rule, so base and copy sign identical filtered sets
    k.getAs[Double]("lsh_recall") shouldBe 1.0
    k.getAs[Double]("e2e_recall") should be >= base.getAs[Double]("e2e_recall")
    k.getAs[Double]("e2e_recall") should be >= 0.99
  }

  test("q_dedup_pr_curve: counts are monotone in the threshold and the " +
    "t=0.8 row reproduces q_dedup_recall's single point exactly") {
    val rows = Dedup.qDedupPrCurve(spark, sf()).collect()
    rows.map(_.getAs[Double]("t")).toSeq shouldBe Dedup.PrThresholds
    // tightening the verification threshold can only shrink both counts
    rows.sliding(2).foreach { w =>
      w(1).getAs[Long]("n_verified") should be <= w(0).getAs[Long]("n_verified")
      w(1).getAs[Long]("n_hit") should be <= w(0).getAs[Long]("n_hit")
    }
    // per-row lattice + one shared truth denominator across the sweep
    val nTrue = rows.head.getAs[Long]("n_true")
    nTrue should be > 0L
    rows.foreach { r =>
      r.getAs[Long]("n_true") shouldBe nTrue
      r.getAs[Long]("n_hit") should be <= r.getAs[Long]("n_verified")
      r.getAs[Double]("recall") shouldBe
        r.getAs[Long]("n_hit").toDouble / nTrue
    }
    // the curve at t = JaccardThreshold IS the single-point query: same
    // candidate frame, same Jaccard arithmetic, same truth census
    val p = Dedup.qDedupRecall(spark, sf()).head()
    val at = rows.find(_.getAs[Double]("t") == Dedup.JaccardThreshold).get
    at.getAs[Long]("n_verified") shouldBe p.getAs[Long]("n_verified")
    at.getAs[Long]("n_hit") shouldBe p.getAs[Long]("n_ver_hit")
    at.getAs[Long]("n_true") shouldBe p.getAs[Long]("n_true")
  }

  test("q_lsh_bands: candidate volume falls and recall degrades as rows " +
    "per band grow; the shipped 8x2 row equals q_dedup_recall's counts") {
    val rows = Dedup.qLshBands(spark, sf()).collect()
    rows.map(_.getAs[Long]("rows_per_band")).toSeq shouldBe
      Dedup.BandSchemes.map(_._1.toLong)
    // every scheme regroups the same 16 minhashes
    rows.foreach { r =>
      r.getAs[Long]("rows_per_band") * r.getAs[Long]("n_bands") shouldBe
        Dedup.NumHashes.toLong
    }
    // the S-curve trade: sharper bands => fewer candidates, lower recall
    rows.sliding(2).foreach { w =>
      w(1).getAs[Long]("n_cand") should be < w(0).getAs[Long]("n_cand")
      w(1).getAs[Double]("lsh_recall") should be <=
        w(0).getAs[Double]("lsh_recall")
    }
    // the shipped (RowsPerBand, NumBands) scheme IS q_dedup_recall's
    // candidate stage: same banding, same cap, same truth census
    val p = Dedup.qDedupRecall(spark, sf()).head()
    val shipped = rows
      .find(_.getAs[Long]("rows_per_band") == Dedup.RowsPerBand.toLong).get
    shipped.getAs[Long]("n_cand") shouldBe p.getAs[Long]("n_cand")
    shipped.getAs[Long]("n_hit") shouldBe p.getAs[Long]("n_cand_hit")
    shipped.getAs[Long]("n_true") shouldBe p.getAs[Long]("n_true")
  }

  test("q_dedup_minhash_wide: the 4x4 production entry point's pair set " +
    "IS q_lsh_bands' 4-row scheme (same banding, same cap), strictly " +
    "fewer candidates than the 8x2 default") {
    val wide = Dedup.qDedupMinhashWide(spark, sf())
    val wideCand = wide.count()
    val scheme4 = Dedup.qLshBands(spark, sf()).collect()
      .find(_.getAs[Long]("rows_per_band") == Dedup.WideRowsPerBand.toLong)
      .get
    wideCand shouldBe scheme4.getAs[Long]("n_cand")
    wideCand should be < Dedup.qDedupMinhash(spark, sf()).count()
    // same output contract as the default entry point
    wide.schema.fieldNames.toSeq shouldBe
      Seq("doc_a", "doc_b", "n_shared_bands", "jaccard")
    // n_shared_bands is bounded by the wide geometry's band count
    wide.agg(max(col("n_shared_bands"))).head().getLong(0) should be <=
      (Dedup.NumHashes / Dedup.WideRowsPerBand).toLong
  }

  test("q_dedup_dfkill_wide: the composed fleet recipe keeps the df-kill's " +
    "end-to-end recall at (or under) the wide geometry's candidate mass — " +
    "the two knobs do not fight") {
    val c = Dedup.qDedupDfkillWide(spark, sf()).head()
    val dk = Dedup.qDedupMinhashDfkill(spark, sf()).head()
    // df-kill re-converges planted pairs to J = 1, so even 4-row bands
    // collide on them: composing must not lose the df-kill's recall
    c.getAs[Double]("e2e_recall") shouldBe
      dk.getAs[Double]("e2e_recall") +- 0.005
    // …while the wide banding can only shrink the candidate set
    c.getAs[Long]("n_cand") should be <= dk.getAs[Long]("n_cand")
    c.getAs[Long]("n_true") shouldBe dk.getAs[Long]("n_true")
    // geometry-coupling pin (round-13 verdict item 7): BOTH wide rows —
    // q_dedup_minhash_wide and this composed recipe — band at the SAME
    // constant, and that constant is the 4-row q_lsh_bands scheme the
    // committed rehearsal curves (docs/REHEARSAL_r13.json) were measured
    // at; an edit that moves either off that operating point must fail
    // here, not silently decouple the two measured curves. The composed
    // recipe's candidate count at WideRowsPerBand is asserted against a
    // direct census at the SAME literal geometry, so a call-site drift
    // (not just a constant edit) is also caught.
    Dedup.WideRowsPerBand shouldBe 4
    val direct = Dedup.recallCensus(
      Dedup.dfkillFiltered(spark, sf()), 4).head()
    c.getAs[Long]("n_cand") shouldBe direct.getAs[Long]("n_cand")
  }

  test("list-shaped erasure: the content manifest catches the identical " +
    "copies the id rule misses, and the residual audit flags permuted kin") {
    val rows = Dedup.qDeleteList(spark, sf()).collect()
      .map(r => r.getAs[String]("artifact") ->
        (r.getAs[Long]("n_before"), r.getAs[Long]("n_deleted"),
          r.getAs[Long]("n_after"))).toMap
    val m = graft.tables.Tables.documents(spark, sf())
      .filter(col("doc_id") % Dedup.DeleteListMod === Dedup.DeleteListResidue)
      .count()
    m should be > 0L
    // content join erases the base doc AND its byte-identical planted
    // copy — strictly more than the manifest's own id count
    rows("documents")._2 shouldBe 2 * m
    // resolved-id cascade reaches the embedding index (base ids only)
    rows("embedding_index")._2 shouldBe m
    // every manifest doc's token-permuted copy survives exact-content
    // erasure but is flagged by the normalization-invariant residual
    rows("norm_residual")._2 should be >= m
    rows.values.foreach { case (b, x, a) => a shouldBe b - x }
    // request-scale sides broadcast; the corpus is never sort-merge-joined
    val plan = Dedup.qDeleteList(spark, sf())
      .queryExecution.executedPlan.toString
    plan should not include "SortMergeJoin"
    plan should not include "CartesianProduct"
  }

  test("embedding LSH dedup recalls all planted identical vectors at cos=1") {
    val vecs = graft.tables.Tables.embeddings(spark, sf()).count()
    val df = Dedup.qDedupEmbedding(spark, sf()).cache()
    val planted = df.filter(col("vec_b") === col("vec_a") + Dedup.PlantOffset)
    planted.count() shouldBe vecs
    planted.agg(min("cos")).head().getDouble(0) shouldBe 1.0 +- 1e-6
    df.unpersist()
    ()
  }

  test("q_containment: full containment of the embedded doc while jaccard " +
    "is diluted toward |A|/|A u B|") {
    val rows = Dedup.qContainment(spark, sf()).collect()
    rows should not be empty
    rows.foreach { r =>
      r.getAs[Double]("containment") shouldBe 1.0
      val j = r.getAs[Double]("jaccard")
      val nA = r.getAs[Long]("n_a").toDouble
      val nCat = r.getAs[Long]("n_cat").toDouble
      // with containment = 1, union = cat's set, so jaccard = |A|/|cat|
      j shouldBe (nA / nCat)
      j should be < 1.0
    }
  }

  test("q_simjoin: prefix-filtered exact join equals an in-JVM brute force " +
    "and recovers the planted duplicates") {
    val got = Dedup.qSimjoin(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over the same hashed shingle sets
    val sets = Dedup.withHashedShingles(Dedup.nearDupDocs(spark, sf()))
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("hs"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
      .filter(_._2.nonEmpty)
    val want = (for {
      (ia, sa) <- sets; (ib, sb) <- sets
      if ia < ib
      ni = (sa intersect sb).size; nu = (sa union sb).size
      if ni * 10 >= nu * Dedup.SimjoinT
    } yield (ia, ib)).toSet
    got shouldBe want
    // most planted (doc, doc+PlantOffset) pairs qualify at t=0.7
    val planted = got.count { case (a, b) => b == a + Dedup.PlantOffset }
    planted should be > (sets.length / 2 * 6) / 10
  }

  test("q_containment_e2e: scores exactly the probe's candidate pairs, " +
    "ratios recompute from the counts, planted splices are discovered " +
    "with asymmetric containment") {
    val rows = Dedup.qContainmentE2e(spark, sf()).collect()
    val probe = Dedup.qDedupSubstringWin(spark, sf()).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .toSet shouldBe probe
    rows.foreach { r =>
      val (na, nb, nc) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("n_common"))
      r.getAs[Double]("cont_ab") shouldBe nc.toDouble / na
      r.getAs[Double]("cont_ba") shouldBe nc.toDouble / nb
      r.getAs[Double]("jaccard") shouldBe nc.toDouble / (na + nb - nc)
    }
    // most (orig, splice-of-orig) pairs are found by the probe, and the
    // directional score sees the quote Jaccard dilutes
    val planted = rows.filter(r => r.getAs[Long]("doc_b") ==
      r.getAs[Long]("doc_a") + Dedup.SpliceOffset)
    val nOrigs = graft.tables.Tables.documents(spark, sf()).count() - 1
    planted.length.toLong should be > (nOrigs * 8) / 10
    planted.foreach { r =>
      math.max(r.getAs[Double]("cont_ab"), r.getAs[Double]("cont_ba"))
        .should(be > 0.2)
      r.getAs[Double]("jaccard") should be <
        math.max(r.getAs[Double]("cont_ab"), r.getAs[Double]("cont_ba"))
    }
  }

  test("q_hamming_search: MIH results equal an in-JVM brute-force Hamming " +
    "scan — the pigeonhole probe set misses no in-radius match") {
    import org.apache.spark.sql.functions._
    val sig = Dedup.withHashedShingles(Dedup.nearDupDocs(spark, sf()))
      .filter(org.apache.spark.sql.functions.size(col("sh")) > 0)
      .select(col("doc_id"),
        graft.functions.SketchExpressions.simhash(col("hs"), Dedup.SimhashBits)
          .as("simhash"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash"))
    val queries = sig.filter(_._1 < Dedup.HammingQ)
    val want = queries.flatMap { case (qid, qh) =>
      sig.filter(_._1 != qid)
        .map { case (id, h) => (id, java.lang.Long.bitCount(qh ^ h).toLong) }
        .filter(_._2 <= Dedup.HammingR)
        .sortBy { case (id, ham) => (ham, id) }
        .take(Dedup.HammingTopK)
        .zipWithIndex
        .map { case ((id, ham), i) => (qid, (i + 1).toLong, id, ham) }
    }.sortBy(t => (t._1, t._2)).toSeq
    val got = Dedup.qHammingSearch(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe want
    // the planted near-dup copy of each query lands in radius (the
    // appended tail flips few shingles), so every query has hits
    got.map(_._1).distinct.length shouldBe Dedup.HammingQ
  }
}
