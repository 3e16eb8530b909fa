package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.TextFunctions

/** Unit semantics for the text-analysis builders (value parity with DuckDB
  * runs through the oracle gate; these pin the intended meanings).
  */
class TextAnalysisSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("text").select(c).head().get(0)

  test("token counters") {
    one("The quick, brown fox 42 jumps.", TextFunctions.wsTokenCount(col("text"))) shouldBe 6L
    // letters runs: The quick brown fox jumps ; digits: 42 ; punct runs: , .
    one("The quick, brown fox 42 jumps.", TextFunctions.bpeTokenCount(col("text"))) shouldBe 8L
    one("ab!cd", TextFunctions.letterCount(col("text"))) shouldBe 4L
    one("ab!cd.", TextFunctions.punctCount(col("text"))) shouldBe 2L
    one("aXbY", TextFunctions.upperCount(col("text"))) shouldBe 2L
  }

  test("word-set count is token-exact, not substring-based") {
    // "theory" must not count as "the"
    one("theory of the theocracy", TextFunctions.wordSetCount(col("text"), Seq("the"))) shouldBe 1L
  }

  test("quality score is in [0,1] and increases with stopword density") {
    val junk = one("@@@ ### $$$ %%%", TextFunctions.qualityScore(col("text")))
      .asInstanceOf[Double]
    val prose = one(
      "the cat sat on the mat and it is a good day for everyone involved",
      TextFunctions.qualityScore(col("text"))).asInstanceOf[Double]
    junk should be >= 0.0
    prose should be <= 1.0
    prose should be > junk
  }

  test("langId picks marker-dominant language with fixed tie precedence") {
    one("the cat and the dog is here", TextFunctions.langId(col("text"))) shouldBe "en"
    one("der hund und die katze und das haus", TextFunctions.langId(col("text"))) shouldBe "de"
    one("le chat et les chiens des villes", TextFunctions.langId(col("text"))) shouldBe "fr"
    one("el perro y los gatos y las casas", TextFunctions.langId(col("text"))) shouldBe "es"
    one("xyz qrs", TextFunctions.langId(col("text"))) shouldBe "und"
    one("中文文本", TextFunctions.langId(col("text"))) shouldBe "zh"
  }

  test("normalized fingerprint is permutation- and duplication-invariant") {
    val a = one("alpha beta gamma", TextFunctions.normFingerprint(col("text")))
    val b = one("gamma alpha beta beta ALPHA", TextFunctions.normFingerprint(col("text")))
    val c = one("gamma alpha delta", TextFunctions.normFingerprint(col("text")))
    a shouldBe b
    a should not be c
  }

  test("length histogram partitions the corpus into width-aligned buckets") {
    val width = TextAnalysis.LenHistWidth
    val rows = TextAnalysis.qLenHist(spark, sf()).collect()
    val total = graft.tables.Tables.documents(spark, sf()).count()
    rows.map(_.getLong(1)).sum shouldBe total
    rows.foreach { r =>
      val (lo, minTk, maxTk) = (r.getLong(0), r.getLong(3), r.getLong(4))
      lo % width shouldBe 0
      minTk should be >= lo
      maxTk should be < lo + width
    }
  }

  test("PMI collocations: exact counts, finite scores, threshold respected") {
    val rows = TextAnalysis.qTextPmi(spark, sf()).collect()
    rows should have size TextAnalysis.PmiTopK.toLong.toInt
    rows.foreach { r =>
      r.getLong(1) should be >= TextAnalysis.PmiMinCount // n_ab
      r.getLong(2) should be >= r.getLong(1) // a unigram occurs >= its pairs
      r.getLong(3) should be >= r.getLong(1)
      assert(!r.getDouble(4).isNaN && !r.getDouble(4).isInfinite)
    }
    // descending by pmi (ties broken by bigram — total order)
    val pmis = rows.map(_.getDouble(4)).toSeq
    pmis shouldBe pmis.sorted.reverse
  }

  test("vocab coverage: counts are consistent and the head covers most mass") {
    val rows = TextAnalysis.qVocabCoverage(spark, sf()).collect()
    rows should not be empty
    rows.foreach { r =>
      val (n, cov, frac) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      cov should be <= n
      frac shouldBe (cov.toDouble / n) +- 1e-6
      // ~30-word synthetic vocabulary: the top-10 head must carry real mass
      frac should be > 0.1
      frac should be <= 1.0
    }
  }

  test("selfrepeat flags exactly the planted doubled documents") {
    val rows = TextAnalysis.qTextSelfrepeat(spark, sf()).collect()
    rows.foreach { r =>
      val (id, nGrams, flagged) = (r.getLong(0), r.getLong(1), r.getBoolean(4))
      if (id % TextAnalysis.SelfrepeatPlantMod == 0 && nGrams > 0) {
        // doubling a doc of k 5-grams yields ~2k+4 grams with ~k+4 distinct
        assert(flagged, s"planted doubled doc $id not flagged")
        r.getDouble(3) should be > 0.35 // (k-4)/(2k-4) >= 0.375 at k >= 10 tokens
      } else if (nGrams > 0) {
        // the corpus has no natural self-repetition (Dedup scaladoc)
        assert(!flagged, s"unplanted doc $id flagged as self-repeating")
      }
    }
  }

  test("LM score: smoothed bigram log-probs are strictly negative; " +
    "coverage = docs with >= 2 letter tokens; ppl inverts avg_logp") {
    val rows = TextAnalysis.qLmScore(spark, sf()).collect()
    val fns = org.apache.spark.sql.functions
    val tk = fns.filter(split(lower(col("text")), "[^a-z]+"),
      t => fns.length(t) > 0)
    val expected = graft.tables.Tables.documents(spark, sf())
      .select(col("doc_id"), (fns.size(tk) - 1).cast("long").as("nb"))
      .filter(col("nb") >= 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.map(_.getLong(0)).toSet shouldBe expected.keySet
    rows.foreach { r =>
      assert(r.getLong(1) == expected(r.getLong(0))) // n_bigrams = n_tokens - 1
      r.getDouble(2) should be < 0.0 // add-one smoothing: P < 1 always
      r.getDouble(3) shouldBe math.rint(math.exp(-r.getDouble(2)) * 1e6) / 1e6
    }
  }

  test("ngram novelty: first doc is fully novel; novel counts partition " +
    "the corpus' distinct shingle set") {
    val rows = TextAnalysis.qNgramNovelty(spark, sf()).collect()
    rows.head.getLong(0) shouldBe rows.map(_.getLong(0)).min
    rows.head.getDouble(3) shouldBe 1.0 // nothing precedes the first doc
    rows.foreach { r =>
      r.getDouble(3) should (be >= 0.0 and be <= 1.0)
      r.getLong(2) should be <= r.getLong(1)
    }
    // every distinct corpus shingle is novel in exactly one document
    val fns = org.apache.spark.sql.functions
    val tk = fns.filter(split(lower(col("text")), "[^a-z]+"),
      t => fns.length(t) > 0)
    val distinctShingles = graft.tables.Tables.documents(spark, sf())
      .select(explode(graft.functions.SketchExpressions.wordNGrams(tk, 3)).as("sh"))
      .distinct().count()
    rows.map(_.getLong(2)).sum shouldBe distinctShingles
  }

  test("gopher rules: keep is the conjunction, flags are 0/1, split is non-trivial") {
    val rows = TextAnalysis.qGopher(spark, sf()).collect()
    rows.foreach { r =>
      val flags = Seq("r_words", "r_word_len", "r_stop", "r_dup")
        .map(c => r.getLong(r.fieldIndex(c)))
      flags.foreach(f => f should (be(0L) or be(1L)))
      r.getLong(r.fieldIndex("keep")) shouldBe flags.product
      r.getLong(r.fieldIndex("n_words")) should be > 0L
    }
    val kept = rows.count(_.getLong(rows.head.fieldIndex("keep")) == 1L)
    kept should be > 0
    kept should be < rows.length // at least one doc fails a gate
  }

  test("selfspan: every planted doubled doc of >= MinRunTokens tokens is " +
      "found with a span at least the original length") {
    import spark.implicits._
    val rows = TextAnalysis.qTextSelfspan(spark, sf()).collect()
    rows.length should be > 0
    rows.foreach { r =>
      r.getLong(r.fieldIndex("n_runs")) should be >= 1L
      r.getLong(r.fieldIndex("max_run_tokens")) should be >= Dedup.MinRunTokens.toLong
      r.getLong(r.fieldIndex("matched_tokens")) should be >=
        r.getLong(r.fieldIndex("max_run_tokens"))
    }
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    val lens = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(org.apache.spark.sql.functions.filter(
          split(lower(col("text")), "[^a-z]+"),
          (t: org.apache.spark.sql.Column) =>
            org.apache.spark.sql.functions.length(t) > 0))
          .cast("long").as("l"))
      .as[(Long, Long)].collect()
    lens.foreach { case (id, l) =>
      if (id % TextAnalysis.SelfrepeatPlantMod == 0 && l >= Dedup.MinRunTokens) {
        withClue(s"planted doc $id (len $l): ") {
          byId.contains(id) shouldBe true
          byId(id).getLong(byId(id).fieldIndex("max_run_tokens")) should be >= l
        }
      }
    }
  }

  test("gopher ngram: planted doubled docs are fully dup5-covered, " +
      "fractions bounded, keep conjoins") {
    val rows = TextAnalysis.qGopherNgram(spark, sf()).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val id = r.getLong(r.fieldIndex("doc_id"))
      val top2 = r.getDouble(r.fieldIndex("top2_frac"))
      val dup5 = r.getDouble(r.fieldIndex("dup5_frac"))
      top2 should be >= 0.0
      dup5 should (be >= 0.0 and be <= 1.0)
      val rTop2 = r.getLong(r.fieldIndex("r_top2"))
      val rDup5 = r.getLong(r.fieldIndex("r_dup5"))
      rTop2 shouldBe (if (top2 <= TextAnalysis.GopherMaxTop2Frac) 1L else 0L)
      rDup5 shouldBe (if (dup5 <= TextAnalysis.GopherMaxDup5Frac) 1L else 0L)
      r.getLong(r.fieldIndex("keep")) shouldBe rTop2 * rDup5
      // a doubled document repeats every 5-gram → the position-set union
      // covers everything: dup5_frac is exactly 1.0
      if (id % TextAnalysis.SelfrepeatPlantMod == 0) dup5 shouldBe 1.0
    }
    // the planted docs must be the ones failing the dup5 gate
    val failed = rows.filter(_.getLong(rows.head.fieldIndex("r_dup5")) == 0L)
    failed.length should be > 0
    failed.foreach(r =>
      r.getLong(r.fieldIndex("doc_id")) % TextAnalysis.SelfrepeatPlantMod shouldBe 0L)
  }

  test("quality classifier: score is the exact mean slot weight; " +
      "keep splits the corpus non-trivially") {
    val rows = TextAnalysis.qQualityClassifier(spark, sf()).collect()
    rows.length should be > 0
    // driver-side recompute of the full hash→slot→weight chain for a
    // sample of documents read straight from parquet
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text").limit(20).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h60(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(15), 16)
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    docs.foreach { case (id, text) =>
      val tk = text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq
      val feats = tk ++ tk.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      val wSum = feats.map { f =>
        val slot = h60(f) % TextAnalysis.QcBuckets
        h60("w" + slot) % TextAnalysis.QcWeightMod - 1000000000L
      }.sum
      val r = byId(id)
      r.getLong(r.fieldIndex("n_feats")) shouldBe feats.size.toLong
      r.getLong(r.fieldIndex("w_ppb")) shouldBe wSum
      r.getDouble(r.fieldIndex("score")) shouldBe
        wSum.toDouble / (feats.size * 1000000000L)
    }
    // slot weights are shared corpus-wide (tiny vocabulary), so the keep
    // rate is NOT ~50% — the common words' net weight dominates every
    // score; assert only that the boundary is non-trivial (both classes)
    val kept = rows.count(r => r.getLong(r.fieldIndex("keep")) == 1L)
    kept should be > 0
    kept should be < rows.length
  }

  test("entropy: bounded by ln(n_distinct), zero iff one distinct word; ttr exact") {
    val rows = TextAnalysis.qTextEntropy(spark, sf()).collect()
    rows.foreach { r =>
      val (n, d) = (r.getLong(1), r.getLong(2))
      val (ttr, h) = (r.getDouble(3), r.getDouble(4))
      h should be >= -1e-9
      h should be <= math.log(d.toDouble) + 1e-9 // max entropy = uniform
      ttr shouldBe BigDecimal(d.toDouble / n)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-12
      if (d == 1) h shouldBe 0.0
    }
  }

  test("bm25: ranks descend within doc; rarer term out-idfs a common one at equal tf") {
    val rows = TextAnalysis.qBm25(spark, sf()).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRk = rs.sortBy(_.getLong(1))
      byRk.map(_.getLong(1)) shouldBe (1L to byRk.length).toArray
      // scores non-increasing in rank
      byRk.map(_.getDouble(6)).sliding(2).foreach {
        case Array(a, b) => a should be >= b
        case _ => ()
      }
    }
    // idf monotonicity: among rows with identical (tf, dl), smaller df
    // must never score lower
    rows.groupBy(r => (r.getLong(0), r.getLong(3), r.getLong(5)))
      .values.filter(_.length > 1).foreach { g =>
        g.sortBy(_.getLong(4)).map(_.getDouble(6)).sliding(2).foreach {
          case Array(hi, lo) => hi should be >= lo
          case _ => ()
        }
      }
  }

  test("length quantiles match a driver-side percentile_disc and prune text") {
    val bylen = graft.tables.Tables.documents(spark, sf())
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def disc(v: Array[Long], p: Double): Long = v(math.ceil(p * v.length).toInt - 1)
    val got = TextAnalysis.qLenQuantiles(spark, sf()).collect()
    got.length shouldBe bylen.size
    got.foreach { r =>
      val v = bylen(r.getString(0))
      r.getLong(1) shouldBe v.length.toLong
      r.getLong(2) shouldBe v.min
      r.getLong(3) shouldBe disc(v, 0.5)
      r.getLong(4) shouldBe disc(v, 0.9)
      r.getLong(5) shouldBe disc(v, 0.99)
      r.getLong(6) shouldBe v.max
    }
    // metadata-only: the scan must not read the text column
    val plan = TextAnalysis.qLenQuantiles(spark, sf())
      .queryExecution.executedPlan.toString
    plan should include("ReadSchema")
    plan should not include "text"
  }

  test("BPE pair counts agree with a driver-side recount") {
    val texts = graft.tables.Tables.documents(spark, sf())
      .select(col("text")).collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach { t =>
      t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).foreach { w =>
        var i = 0
        while (i < w.length - 1) {
          val p = w.substring(i, i + 2)
          counts(p) = counts.getOrElse(p, 0L) + 1L
          i += 1
        }
      }
    }
    val expected = counts.toSeq
      .sortBy { case (p, n) => (-n, p) }
      .take(TextAnalysis.BpeTopPairs)
    val got = TextAnalysis.qBpeMerges(spark, sf()).collect()
      .map(r => (r.getString(1), r.getLong(2))).toSeq
    got shouldBe expected
  }

  test("pocket perceptron: bounded driver state, learns past the majority floor") {
    // the model artifact is one weight vector — corpus-independent size
    val w = TextAnalysis.qtWeights(spark, sf())
    w should have size (TextAnalysis.QtBuckets + 1).toLong
    w.exists(_ != 0L) shouldBe true // training moved off w_0
    val rows = TextAnalysis.qQualityTrain(spark, sf()).collect()
    val (tp, fp, fn, tn) = rows.foldLeft((0L, 0L, 0L, 0L)) { (a, r) =>
      (a._1 + r.getAs[Long]("tp"), a._2 + r.getAs[Long]("fp"),
        a._3 + r.getAs[Long]("fn"), a._4 + r.getAs[Long]("tn"))
    }
    val n = (tp + fp + fn + tn).toDouble
    val majority = math.max(tp + fn, fp + tn) / n
    val accuracy = (tp + tn) / n
    // pocketing w_0 guarantees the floor; the keyword-rule task is
    // genuinely learnable, so demand real headroom over it (measured
    // 0.90/0.90/0.97 at sf0.001/0.01/0.1)
    accuracy should be >= majority
    accuracy should be >= 0.85
  }

  test("q_quality_calib: buckets partition the corpus and the score is " +
    "calibrated at the ends — strong negatives ~0, strong positives ~1") {
    val rows = TextAnalysis.qQualityCalib(spark, sf()).collect()
    rows.map(_.getAs[Long]("n_docs")).sum shouldBe
      graft.tables.Tables.documents(spark, sf()).count()
    rows.foreach { r =>
      r.getAs[Long]("n_pos") should be <= r.getAs[Long]("n_docs")
      r.getAs[Double]("frac_pos") shouldBe
        r.getAs[Long]("n_pos").toDouble / r.getAs[Long]("n_docs")
    }
    // mass-weighted positive rate over the extreme thirds of the bucket
    // range: the margin separates (measured: 0.0x vs 0.9x at every SF)
    val buckets = rows.map(r => (r.getAs[Long]("bucket"),
      r.getAs[Long]("n_docs"), r.getAs[Long]("n_pos")))
    val lo = buckets.filter(_._1 <= -8)
    val hi = buckets.filter(_._1 >= 8)
    lo.map(_._2).sum should be > 0L
    hi.map(_._2).sum should be > 0L
    (lo.map(_._3).sum.toDouble / lo.map(_._2).sum) should be < 0.2
    (hi.map(_._3).sum.toDouble / hi.map(_._2).sum) should be > 0.8
  }

  test("q_auc: matches a brute-force pairwise AUC, the integer-division " +
    "exactness bound holds, and the trained ranking beats chance") {
    val rows = TextAnalysis.qAuc(spark, sf()).collect()
    rows should not be empty
    // brute-force pairwise U from the raw (source, y, margin) rows —
    // fine driver-side at sf0.001
    import org.apache.spark.sql.functions.{col, typedLit}
    val wlit = typedLit(TextAnalysis.qtWeights(spark, sf()))
    val scored = TextAnalysis.qAucScored(spark, sf(), wlit)
      .select(col("source"), col("y"), col("m")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val (np, nn, u2) = (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
        r.getAs[Long]("u2"))
      val pos = scored(src).filter(_._2 == 1L).map(_._3)
      val neg = scored(src).filter(_._2 == -1L).map(_._3)
      np shouldBe pos.length.toLong
      nn shouldBe neg.length.toLong
      val bruteU2 = (for (p <- pos; n <- neg) yield {
        if (p > n) 2L else if (p == n) 1L else 0L
      }).sum
      u2 shouldBe bruteU2
      // the two-step ppb division is exact while (u2 % den)·10⁹ fits
      val den = 2L * np * nn
      den should be < (Long.MaxValue / 1000000000L)
      r.getAs[Long]("auc_ppb") shouldBe
        (u2 / den) * 1000000000L + (u2 % den) * 1000000000L / den
      r.getAs[Double]("auc") shouldBe u2.toDouble / den.toDouble
    }
    // threshold-free ranking quality: corpus-mass-weighted AUC well
    // above chance (the trained pocket classifies 90%+ correctly)
    val mass = rows.map(r => r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg"))
    val wAuc = rows.zip(mass)
      .map { case (r, m) => r.getAs[Double]("auc") * m }.sum / mass.sum
    wAuc should be > 0.8
  }

  test("q_roc_curve: cumulative counts are monotone from the top, end at " +
    "the class totals, and the curve dominates the diagonal") {
    val rows = TextAnalysis.qRocCurve(spark, sf()).collect()
    rows.length should be > 3
    // buckets descend; tp/fp cumulate monotonically
    rows.map(_.getAs[Long]("bucket")).sliding(2).foreach {
      case Array(a, b) => a should be > b
      case _ =>
    }
    Seq("tp", "fp").foreach { c =>
      rows.map(_.getAs[Long](c)).sliding(2).foreach {
        case Array(a, b) => a should be <= b
        case _ =>
      }
    }
    // the last row predicts everything positive: tpr = fpr = 1
    rows.last.getAs[Long]("tpr_ppb") shouldBe 1000000000L
    rows.last.getAs[Long]("fpr_ppb") shouldBe 1000000000L
    val (pos, neg) = (rows.last.getAs[Long]("tp"), rows.last.getAs[Long]("fp"))
    (pos + neg) shouldBe graft.tables.Tables.documents(spark, sf()).count()
    // a trained ranker's ROC sits above the diagonal on the curve's mass
    val above = rows.count(r =>
      r.getAs[Long]("tpr_ppb") >= r.getAs[Long]("fpr_ppb"))
    above.toDouble / rows.length should be > 0.8
  }

  test("bigram pocket perceptron: learns an adjacency rule outside the " +
    "unigram hypothesis class") {
    val w = TextAnalysis.qtBiWeights(spark, sf())
    w should have size (TextAnalysis.QtBiBuckets + 1).toLong
    w.exists(_ != 0L) shouldBe true
    val rows = TextAnalysis.qQualityTrainBi(spark, sf()).collect()
    val (tp, fp, fn, tn) = rows.foldLeft((0L, 0L, 0L, 0L)) { (a, r) =>
      (a._1 + r.getAs[Long]("tp"), a._2 + r.getAs[Long]("fp"),
        a._3 + r.getAs[Long]("fn"), a._4 + r.getAs[Long]("tn"))
    }
    val n = (tp + fp + fn + tn).toDouble
    val majority = math.max(tp + fn, fp + tn) / n
    val accuracy = (tp + tn) / n
    // the self-repeat label is invariant to nothing a unigram bag sees:
    // permuting tokens flips labels but not unigram counts, so beating
    // the floor at all REQUIRES the bigram features (measured 0.99 at
    // sf0.001 vs floor 0.786)
    accuracy should be > majority
    accuracy should be >= 0.9
  }

  test("held-out eval: the split-trained model generalizes past the majority floor") {
    val rows = TextAnalysis.qQualityTrainEval(spark, sf()).collect()
      .map(r => r.getAs[String]("split") -> r).toMap
    rows.keySet shouldBe Set("train", "test")
    def acc(r: org.apache.spark.sql.Row): Double =
      (r.getAs[Long]("tp") + r.getAs[Long]("tn")).toDouble /
        r.getAs[Long]("n_docs")
    def majority(r: org.apache.spark.sql.Row): Double = {
      val pos = r.getAs[Long]("tp") + r.getAs[Long]("fn")
      val neg = r.getAs[Long]("fp") + r.getAs[Long]("tn")
      math.max(pos, neg).toDouble / r.getAs[Long]("n_docs")
    }
    // the TEST split never influenced training: beating its majority
    // floor is generalization, not memorization (measured 0.92/0.90 at
    // sf0.001/0.01 vs floors ~0.69/0.62)
    acc(rows("test")) should be > majority(rows("test"))
    acc(rows("test")) should be >= 0.8
  }

  test("lang-mix audit: chunk inventory ties to q_chunk_overlap, flag is " +
    "consistent, both branches live") {
    val mix = TextAnalysis.qLangMix(spark, sf()).collect()
    val chunkInv = TextAnalysis.qChunkOverlap(spark, sf()).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    mix.foreach { r =>
      r.getLong(2) shouldBe chunkInv(r.getLong(0)) // same chunker
      (r.getLong(4) == 1L) shouldBe (r.getLong(3) > 1L)
      r.getLong(3) should be <= r.getLong(2).max(1L)
    }
    mix.count(_.getLong(4) == 1L) should be > 0
    mix.count(_.getLong(4) == 0L) should be > 0
  }

  test("vocab growth: deciles partition the corpus, new-word mass sums " +
    "to the distinct vocabulary") {
    val rows = TextAnalysis.qVocabGrowth(spark, sf()).collect()
    rows.map(_.getLong(0)).toSeq shouldBe (0L to 9L)
    val docs = graft.tables.Tables.documents(spark, sf())
    rows.map(_.getLong(1)).sum shouldBe docs.count()
    val vocab = docs
      .select(explode(filter(split(lower(col("text")), "[^a-z]+"),
        t => org.apache.spark.sql.functions.length(t) > 0)).as("w"))
      .distinct().count()
    rows.map(_.getLong(3)).sum shouldBe vocab
    // first decile must introduce vocabulary (any corpus does)
    rows.head.getLong(3) should be > 0L
  }

  test("k-anonymized release: no published stratum below k, totals auditable") {
    val rows = TextAnalysis.qKanonRelease(spark, sf()).collect()
    val (residual, published) = rows.partition(_.getString(0) == "*")
    // every published group satisfies the k floor
    published.foreach(_.getLong(2) should be >= TextAnalysis.KAnonK)
    // spec scale has 1..16-doc strata: both branches must be live
    published should not be empty
    residual should have length 1
    residual.head.getLong(2) should be < // rare strata stay rare in sum?
      rows.map(_.getLong(2)).sum // (sanity: residual is a proper subset)
    // the suppression hides strata, never mass: totals reconcile exactly
    val docs = graft.tables.Tables.documents(spark, sf())
    rows.map(_.getLong(2)).sum shouldBe docs.count()
    rows.map(_.getLong(3)).sum shouldBe
      docs.agg(sum(col("n_chars"))).head().getLong(0)
  }

  test("curation funnel: monotone stages, dedup removes the planted re-crawls") {
    val rows = TextAnalysis.qCurationFunnel(spark, sf()).collect()
    rows.foreach { r =>
      val (d, g, u) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_gopher"),
        r.getAs[Long]("n_unique"))
      withClue(r.getAs[String]("source")) {
        g should be <= d
        u should be <= g
        r.getAs[Long]("n_tokens_final") should be <= r.getAs[Long]("n_tokens")
      }
    }
    // the planted duplicates inflate n_docs beyond the base corpus…
    val base = graft.tables.Tables.documents(spark, sf()).count()
    rows.map(_.getAs[Long]("n_docs")).sum should be > base
    // …and the dedup stage demonstrably removes mass
    rows.map(_.getAs[Long]("n_unique")).sum should be <
      rows.map(_.getAs[Long]("n_gopher")).sum
  }

  test("deployed trained classifier scores row-locally: no join, no window") {
    val plan = TextAnalysis.qQualityTrain(spark, sf())
      .queryExecution.executedPlan.toString
    plan should not include "Join"
    plan should not include "Window"
  }

  test("q_robust_stats: histogram-walk median/MAD/IQR equal the " +
    "brute-force sorted definition, deployed without a Window") {
    val rows = TextAnalysis.qRobustStats(spark, sf()).collect()
    val bySrc = graft.tables.Tables.documents(spark, sf())
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector).toMap
    def lower(v: Vector[Long], pos: Long): Long = v((pos - 1).toInt)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val xs = bySrc(src)
      val n = xs.length.toLong
      val med = lower(xs, (n + 1) / 2)
      val mad = lower(xs.map(x => math.abs(x - med)).sorted, (n + 1) / 2)
      withClue(src) {
        r.getAs[Long]("n_docs") shouldBe n
        r.getAs[Long]("median") shouldBe med
        r.getAs[Long]("mad") shouldBe mad
        r.getAs[Long]("q1") shouldBe lower(xs, (n + 3) / 4)
        r.getAs[Long]("q3") shouldBe lower(xs, (3 * n + 3) / 4)
        r.getAs[Long]("n_outliers") shouldBe
          xs.count(x => math.abs(x - med) > 3 * mad).toLong
      }
    }
    // scalable shape: stats ride a broadcast join back; no per-source
    // sort/window anywhere in the deployed plan
    val plan = TextAnalysis.qRobustStats(spark, sf())
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should not include "Window"
    plan should not include "CartesianProduct"
  }

  test("q_feature_chi2: recovers the label-defining tokens as the top " +
    "features, margins all positive, vocabulary-sized broadcast shape") {
    val rows = TextAnalysis.qFeatureChi2(spark, sf()).collect()
    rows.length shouldBe 31 // tokens clearing the df floor at sf0.001
    // the label rule IS join-vs-scan counts: χ² must rank exactly those
    // two tokens first, with a clear gap to the best ordinary token
    rows(0).getAs[String]("token") shouldBe "join"
    rows(1).getAs[String]("token") shouldBe "scan"
    rows(1).getAs[Double]("chi2") should be > 3 * rows(2).getAs[Double]("chi2")
    // margin filters kept every χ² finite
    rows.foreach { r =>
      val v = r.getAs[Double]("chi2")
      v.isNaN shouldBe false
      v.isInfinite shouldBe false
    }
    // totals ride a 1-row broadcast, the top-50 is a TakeOrdered — no
    // corpus sort, no cartesian corpus×corpus product
    val plan = TextAnalysis.qFeatureChi2(spark, sf())
      .queryExecution.executedPlan.toString
    plan should include("BroadcastNestedLoopJoin")
    plan should include("TakeOrderedAndProject")
    plan should not include "CartesianProduct"
    plan should not include "Window"
  }

  test("q_len_fit: closed-form OLS matches a driver-local exact fit and " +
    "stays one partial-aggregating pass") {
    val fit = TextAnalysis.qLenFit(spark, sf())
    val rows = fit.collect().map(r => r.getAs[String]("lang") -> r).toMap
    // recompute the sufficient statistics locally from the raw docs
    val docs = graft.tables.Tables.documents(spark, sf())
      .select(col("lang"), col("n_chars"),
        graft.functions.TextFunctions.bpeTokenCount(col("text")).as("y"))
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_chars"), r.getAs[Long]("y")))
    docs.groupBy(_._1).foreach { case (lang, ds) =>
      val n = ds.length.toLong
      val sx = ds.map(_._2).sum
      val sy = ds.map(_._3).sum
      val sxy = ds.map(d => d._2 * d._3).sum
      val sxx = ds.map(d => d._2 * d._2).sum
      val num = (n * sxy - sx * sy).toDouble
      val d1 = (n * sxx - sx * sx).toDouble
      val r = rows(lang)
      withClue(lang) {
        r.getAs[Long]("n_docs") shouldBe n
        r.getAs[Double]("slope") shouldBe (num / d1)
        // a char-count calibration must actually predict token counts
        r.getAs[Double]("r2") should be > 0.9
        r.getAs[Double]("r2") should be <= 1.0
      }
    }
    // scalable shape: map-side partial aggregation, no window, no join
    val plan = fit.queryExecution.executedPlan.toString
    plan should not include "Window"
    plan should not include "Join"
    plan should include("partial_count")
  }
  test("q_ldiversity: doc mass conserves, distinct-source counts are " +
    "honest, and the pass flag matches the floor") {
    val rows = TextAnalysis.qLDiversity(spark, sf()).collect()
    rows.map(_.getAs[Long]("n_docs")).sum shouldBe
      graft.tables.Tables.documents(spark, sf()).count()
    val nSources = graft.tables.Tables.documents(spark, sf())
      .select(org.apache.spark.sql.functions.col("source"))
      .distinct().count()
    rows.foreach { r =>
      r.getAs[Long]("n_sources") should be <= math.min(
        r.getAs[Long]("n_docs"), nSources)
      (r.getAs[Long]("pass") == 1L) shouldBe
        (r.getAs[Long]("n_sources") >= TextAnalysis.LDivL)
    }
  }

  test("q_dp_counts: noise bounded by the truncation, zero-clamped, " +
    "deterministic, scale constant is the weight total") {
    TextAnalysis.DpScale shouldBe (0 to 8).map(k => 1L << (8 - k)).sum * 2 - 256
    val noisy = TextAnalysis.qDpCounts(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_noisy"))
      .toMap
    val truth = graft.tables.Tables.documents(spark, sf())
      .groupBy(col("lang"), col("source")).count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("count"))
      .toMap
    noisy.keySet shouldBe truth.keySet
    noisy.foreach { case (k, v) =>
      v should be >= math.max(0L, truth(k) - TextAnalysis.DpB)
      v should be <= truth(k) + TextAnalysis.DpB
    }
    // seeded mechanism: bit-identical across evaluations
    TextAnalysis.qDpCounts(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_noisy"))
      .toMap shouldBe noisy
    // the noise is not vacuous: some group actually moved
    noisy.count { case (k, v) => v != truth(k) } should be > 0
  }

  test("q_token_fertility: per-lang sums partition the corpus; ratios sit " +
    "in their structural bounds (tokens ≤ chars, ≥ 1 per ws word)") {
    val rows = TextAnalysis.qTokenFertility(spark, sf()).collect()
    val docs = graft.tables.Tables.documents(spark, sf())
    rows.map(_.getAs[Long]("n_docs")).sum shouldBe docs.count()
    rows.map(_.getAs[Long]("n_chars")).sum shouldBe
      docs.agg(sum(org.apache.spark.sql.functions.length(col("text"))))
        .head().getLong(0)
    rows.foreach { r =>
      // a BPE-ish token is ≥1 non-space char and spans are disjoint
      r.getAs[Long]("fertility_ppm") should be > 0L
      r.getAs[Long]("fertility_ppm") should be <= 1000000L
      // every whitespace word contains at least one BPE-ish token
      r.getAs[Long]("tpw_ppm") should be >= 1000000L
    }
  }

  test("q_kappa: counts partition the corpus, κ = (po−pe)/(1−pe) exactly, " +
    "agreement bounds hold") {
    val rows = TextAnalysis.qKappa(spark, sf()).collect()
    rows.map(_.getAs[Long]("n")).sum shouldBe
      graft.tables.Tables.documents(spark, sf()).count()
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      r.getAs[Long]("n_agree") should be <= n
      val po = r.getAs[Double]("po")
      val pe = r.getAs[Double]("pe")
      po should (be >= 0.0 and be <= 1.0)
      pe should (be >= 0.0 and be <= 1.0)
      if (!r.isNullAt(r.fieldIndex("kappa"))) {
        val k = r.getAs[Double]("kappa")
        k should (be >= -1.0 and be <= 1.0)
        k shouldBe ((po - pe) / (1.0 - pe)) +- 1e-9
      }
    }
  }

  test("q_ldp_freq: reports and truths both partition the corpus, the " +
    "estimator is conservation-exact and tracks the dominant class") {
    val rows = TextAnalysis.qLdpFreq(spark, sf()).collect()
    rows.map(_.getString(0)).sorted.toSeq shouldBe TextAnalysis.LdpLangs
    val n = graft.tables.Tables.documents(spark, sf()).count()
    rows.map(_.getAs[Long]("n_true")).sum shouldBe n
    rows.map(_.getAs[Long]("n_obs")).sum shouldBe n
    // Σ est = n exactly: the inversion is affine in obs and Σ obs = n
    rows.map(_.getAs[Double]("est")).sum shouldBe n.toDouble +- 1e-6
    // randomization genuinely perturbed the counts…
    rows.exists(r => r.getAs[Long]("n_obs") != r.getAs[Long]("n_true")) shouldBe true
    // …but the unbiased inversion still finds the dominant class
    rows.maxBy(_.getAs[Double]("est")).getString(0) shouldBe
      rows.maxBy(_.getAs[Long]("n_true")).getString(0)
  }

  test("q_label_noise: confident-learning off-diagonal recovers the " +
    "planted label flips with majority precision") {
    val rows = TextAnalysis.qLabelNoise(spark, sf()).collect()
    rows should not be empty
    // cells partition into diagonal (label confirmed) and off-diagonal
    // (confident label error); both regimes must be present
    val offDiag = rows.filter(r => r.getAs[Long]("y") != r.getAs[Long]("conf"))
    val diag = rows.filter(r => r.getAs[Long]("y") == r.getAs[Long]("conf"))
    offDiag should not be empty
    diag should not be empty
    // the audit's point: flagged label errors are overwhelmingly the
    // genuinely-flipped documents, confirmed labels overwhelmingly not
    val offN = offDiag.map(_.getAs[Long]("n_docs")).sum
    val offFlipped = offDiag.map(_.getAs[Long]("n_flipped")).sum
    offFlipped.toDouble / offN should be > 0.5
    val diagN = diag.map(_.getAs[Long]("n_docs")).sum
    val diagFlipped = diag.map(_.getAs[Long]("n_flipped")).sum
    diagFlipped.toDouble / diagN should be < 0.5
    // confident-positive cells carry positive margin mass and vice versa
    rows.foreach { r =>
      if (r.getAs[Long]("conf") == 1L)
        r.getAs[Long]("margin_sum") should be > 0L
      else r.getAs[Long]("margin_sum") should be < 0L
    }
  }

  test("q_bm25_search: every query retrieves a full top-k, scores are " +
    "the exact ppb sums of per-term BM25 weights, descending per query") {
    val rows = TextAnalysis.qBm25Search(spark, sf()).collect()
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      rs.length shouldBe TextAnalysis.SearchTopK
      val sorted = rs.sortBy(_.getAs[Long]("rk"))
      sorted.map(_.getAs[Long]("rk")) shouldBe
        (1L to rs.length).toSeq
      sorted.map(_.getAs[Double]("score")).sliding(2).foreach {
        case Array(a, b) => a should be >= b
        case _ =>
      }
      // disjunctive retrieval: hit count never exceeds the query length
      rs.foreach { r =>
        r.getAs[Long]("n_terms") should be >= 1L
        r.getAs[Long]("n_terms") should be <= 3L
        r.getAs[Double]("score") should be > 0.0
      }
    }
    rows.map(_.getAs[Long]("query_id")).distinct.length shouldBe
      TextAnalysis.SearchQueries.length
  }

  test("q_mrr: the counted first-relevant rank matches the ranked " +
    "q_bm25_search order, and relevance is genuinely conjunctive") {
    val rows = TextAnalysis.qMrr(spark, sf()).collect()
    rows should not be empty
    val top = TextAnalysis.qBm25Search(spark, sf()).collect()
      .groupBy(_.getAs[Long]("query_id"))
    rows.foreach { r =>
      val (qid, rank) =
        (r.getAs[Long]("query_id"), r.getAs[Long]("first_rank"))
      rank should be >= 1L
      r.getAs[Long]("n_relevant") should be >= 1L
      r.getAs[Long]("n_relevant") should be <= r.getAs[Long]("n_scored")
      r.getAs[Long]("rr_ppb") shouldBe 1000000000L / rank
      // if the first relevant doc lands inside the reported top-k, the
      // counted rank must agree with the ranked list's row_number
      if (rank <= TextAnalysis.SearchTopK.toLong)
        top(qid).find(_.getAs[Long]("rk") == rank).get
          .getAs[Long]("doc_id") shouldBe r.getAs[Long]("best_doc_id")
      // conjunctive ground truth: the best doc really contains all terms
      val terms = TextAnalysis.SearchQueries.find(_._1 == qid).get._2
      val text = graft.tables.Tables.documents(spark, sf())
        .filter(org.apache.spark.sql.functions.col("doc_id") ===
          r.getAs[Long]("best_doc_id"))
        .head().getAs[String]("text").toLowerCase
      val toks = text.split("[^a-z]+").filter(_.nonEmpty).toSet
      terms.foreach(t => toks should contain(t))
    }
  }
}
