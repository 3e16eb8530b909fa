package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.functions.VectorFunctions
import graft.tables.Tables

/** Deduplication suite over `documents` (and `embeddings` for vector
  * near-dup): exact, canonical (normalized), n-gram Jaccard, MinHash+LSH,
  * SimHash, and embedding-cosine.
  *
  * The corpus has no natural duplicates (verified: 0 repeated texts,
  * inter-document 3-gram Jaccard ≈ 0), so each query PLANTS deterministic
  * duplicates from the base table — identical copies (+[[PlantOffset]]),
  * token-permuted copies (+[[PermuteOffset]]), tail-appended near-copies —
  * with the identical construction in the oracle SQL. The operators
  * themselves never special-case the planted IDs: they find whatever
  * duplicate structure exists.
  *
  * Scale design (100 TB): every dedup here is shuffle-on-key —
  *   exact/canonical: groupBy(fingerprint) — one shuffle of (hash, id);
  *   MinHash-LSH: explode shingles → per-doc signature agg → band-key
  *     equi-join (candidates only) → verify Jaccard on candidates;
  *   SimHash: per-doc signature agg, then band/bucket join on prefix;
  *   embedding: sign-bucket LSH equi-join, cosine only on bucket collisions.
  * No O(n²) cross-join appears anywhere; candidate verification cost is
  * proportional to true-duplicate density, which is the property that
  * survives a 1000-executor 100 TB run.
  */
object Dedup {

  val PlantOffset = 10000000L
  val PermuteOffset = 20000000L
  /** Tail appended to make near- (not exact-) duplicates. Interpolated into
    * oracle SQL string literals ([[nearDupSql]], the decontamination oracle),
    * so it must stay quote-free — the require fails fast at class load if a
    * future edit breaks that.
    */
  val Tail = " zz yy xx ww vv"
  require(!Tail.contains("'"),
    "Dedup.Tail is interpolated into oracle SQL literals and must not contain single quotes")
  /** MinHash: 16 permutations → 8 bands × 2 rows. r=2 tunes the S-curve for
    * a ~0.8 Jaccard dedup threshold: P(candidate) = 1-(1-J²)⁸ ≈ 1 at J≥0.8,
    * ≈ 0 at J≤0.2 — misses at J=0.8 are 3·10⁻⁴, false candidates are
    * verified away by the exact-Jaccard stage.
    */
  val NumHashes = 16
  val RowsPerBand = 2
  val NumBands: Int = NumHashes / RowsPerBand
  /** LSH bucket-size cap: buckets with more members are dropped before pair
    * generation. Banding keeps buckets at true-duplicate-cluster size by
    * construction, so on a normal corpus this guard never fires (the oracle
    * mirrors it exactly either way) — but a degenerate corpus with
    * thousands of identical documents would otherwise make ONE bucket's
    * pair list quadratic and sink the stage at 100 TB. A production caller
    * still gets those documents deduped: exact-hash groupBy ([[qDedupExact]])
    * collapses identical texts without pair enumeration; near-dup pair
    * listing inside a >cap cluster is the only thing declined.
    */
  val MaxLshBucket = 64
  /** SimHash width for the oracle query (the Scala library also provides
    * 64-bit; 16 bits keeps the generated oracle SQL tractable).
    */
  val SimhashBits = 16
  /** Embedding LSH: 16 coordinate hyperplanes (every 4th dim). */
  val BucketDims: Seq[Int] = (0 until 16).map(_ * 4)

  // ---------------------------------------------------------------- helpers

  /** Lowercase letter tokens, empties dropped. */
  private def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z]+"), t => length(t) > 0)

  /** (doc_id, sh): distinct 3-gram shingles via the one-pass
    * [[graft.functions.WordNGrams]] expression. The earlier
    * `transform(sequence(...), i -> concat_ws(element_at(tk,...)))`
    * formulation evaluated an interpreted lambda per shingle — and when the
    * optimizer inlined the tokenizer into the lambda (CollapseProject /
    * InferFiltersFromGenerate pushdown), re-split the document once per
    * element: O(n²) regex work, a 25× slowdown at sf0.1.
    */
  private[graft] def withShingles(docs: DataFrame, n: Int = 3): DataFrame =
    docs
      .withColumn("sh",
        graft.functions.SketchExpressions.wordNGrams(tokens(col("text")), n))
      .select(col("doc_id"), col("sh"))

  private def plantedDocs(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val exact = base.select(
      (col("doc_id") + PlantOffset).as("doc_id"), col("text"))
    val permuted = base.select(
      (col("doc_id") + PermuteOffset).as("doc_id"),
      array_join(reverse(split(col("text"), "\\s+")), " ").as("text"))
    base.union(exact).union(permuted)
  }

  private[graft] def nearDupDocs(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    base.union(base.select(
      (col("doc_id") + PlantOffset).as("doc_id"),
      concat(col("text"), lit(Tail)).as("text")))
  }

  // ---------------------------------------------------------------- queries

  /** Exact + canonical dedup via fingerprint groupBy: one shuffle of
    * (fingerprint, id, md5). Identical copies collapse under fp_md5;
    * token-permuted copies additionally collapse under fp_norm.
    */
  def qDedupExact(s: SparkSession, dir: String): DataFrame =
    plantedDocs(s, dir)
      .select(
        col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("fp_md5"),
        TextFunctions.normFingerprint(col("text")).as("fp_norm"))
      .groupBy(col("fp_norm"))
      .agg(
        min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("n_copies"),
        countDistinct(col("fp_md5")).as("n_exact_variants"))
      .filter(col("n_copies") > 1)
      .orderBy(col("canonical_id"))

  /** Pairwise n-gram Jaccard, demonstrated on (doc, next-doc) — expected ≈ 0
    * — and (doc, tail-appended near-copy) — expected ≈ 1. Linear join on a
    * derived key, not a cross join.
    */
  def qDedupJaccard(s: SparkSession, dir: String): DataFrame = {
    val sh = withShingles(nearDupDocs(s, dir))
    def jac(a: Column, b: Column): Column =
      size(array_intersect(a, b)).cast("double") /
        size(array_distinct(concat(a, b)))
    // SINGLE evaluation of the shingle pipeline: each doc explodes into
    // the comparison rows it participates in (itself; the planted dup of
    // doc_id−PlantOffset; the successor of doc_id−1) and ONE groupBy
    // reassembles (self, next, dup) per base doc. The former three-way
    // self-join re-derived the tokenizer+shingler per branch — Spark
    // shares no uncached subtrees, so that was 3× the corpus scan. The
    // not-null filter reproduces the inner-join semantics exactly.
    val contrib = sh.select(explode(
      when(col("doc_id") < PlantOffset, array(
        struct(col("doc_id").as("key"), lit("self").as("role"), col("sh")),
        struct((col("doc_id") - 1).as("key"), lit("next").as("role"), col("sh"))))
        .otherwise(array(
          struct((col("doc_id") - PlantOffset).as("key"), lit("dup").as("role"), col("sh"))))
    ).as("c")).select(col("c.*"))
    contrib
      .groupBy(col("key"))
      .agg(
        first(when(col("role") === "self", col("sh")), ignoreNulls = true).as("sh_self"),
        first(when(col("role") === "next", col("sh")), ignoreNulls = true).as("sh_next"),
        first(when(col("role") === "dup", col("sh")), ignoreNulls = true).as("sh_dup"))
      .filter(col("sh_self").isNotNull && col("sh_next").isNotNull &&
        col("sh_dup").isNotNull)
      .select(
        col("key").as("doc_id"),
        jac(col("sh_self"), col("sh_next")).as("j_next"),
        jac(col("sh_self"), col("sh_dup")).as("j_dup"))
      .orderBy(col("doc_id"))
  }

  /** Asymmetric shingle CONTAINMENT census — the quote/subset detector
    * Jaccard structurally misses: when a short document is wholly
    * embedded in a much larger composite, |A∩B|/|A∪B| is diluted toward
    * |A|/|B| while containment |A∩B|/|A| stays ≈ 1 (Broder 1997
    * distinguishes exactly these two resemblance measures). The demo
    * pair frame is doc d inside the composite d ⧺ d+1 (one
    * successor-equi-join — at production scale candidates arrive from
    * the LSH/winnowing probes, [[qDedupSubstring2P]], and this census
    * is the verify stage's scoring rule); shingling and set ops are
    * row-local over the pair frame. The census prints both measures so
    * the divergence IS the result: containment ≈ 1 with jaccard ≈
    * |A|/(|A|+|B|).
    */
  def qContainment(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val nxt = base.select((col("doc_id") - 1).as("k"),
      col("text").as("text_b"))
    val pairs = base.join(nxt, col("doc_id") === col("k"))
      .select(col("doc_id"), col("text"),
        concat_ws(" ", col("text"), col("text_b")).as("cat"))
    pairs
      .select(col("doc_id"),
        graft.functions.SketchExpressions
          .wordNGrams(tokens(col("text")), 3).as("sa"),
        graft.functions.SketchExpressions
          .wordNGrams(tokens(col("cat")), 3).as("sc"))
      .filter(size(col("sa")) > 0 && size(col("sc")) > 0)
      .select(col("doc_id"),
        size(col("sa")).cast("long").as("n_a"),
        size(col("sc")).cast("long").as("n_cat"),
        (size(array_intersect(col("sa"), col("sc"))).cast("double") /
          size(col("sa"))).as("containment"),
        (size(array_intersect(col("sa"), col("sc"))).cast("double") /
          size(array_distinct(concat(col("sa"), col("sc")))))
          .as("jaccard"))
      .orderBy(col("doc_id"))
  }

  /** END-TO-END quote detection — the composition [[qContainment]]'s
    * scaladoc promises: candidate pairs DISCOVERED by the winnowed
    * fingerprint probe ([[winnowedCandidates]] over the spliced corpus —
    * the same probe stage as [[qDedupSubstring2P]]), then scored with the
    * asymmetric Broder containment measure in BOTH directions plus
    * Jaccard, so a short document quoted inside a composite shows
    * cont_ab ≈ 1 (or cont_ba from the other side) while Jaccard stays
    * diluted. No planted pair frame: every scored pair was found by the
    * probe. Scale shape: the probe ships ~2/(w+1) of the shingle
    * instances and is bucket-capped ([[MaxSpanOcc]]); scoring joins the
    * (small) candidate set onto the per-doc shingle-set table twice by
    * doc key and intersects row-locally — candidate-proportional, never
    * corpus².
    */
  def qContainmentE2e(s: SparkSession, dir: String): DataFrame = {
    val corpus = splicedDocs(s, dir)
    val cands = sharedWinnowCandidates(s, dir)
    val sh = corpus.select(col("doc_id"),
      graft.functions.SketchExpressions.wordNGrams(tokens(col("text")), 3)
        .as("sh"))
    // melt-join: each candidate pair fans out to its two member docs and
    // the shingle-set table is joined ONCE — the previous two-sided join
    // (sa by doc_a, sb by doc_b) referenced `sh` twice, and Spark shares
    // no uncached subtrees, so the whole corpus was tokenized + shingled
    // twice per evaluation (r14 plan audit). One corpus pass + one
    // doc-key shuffle of the candidate docs' arrays replaces the second
    // pass; the pair row re-assembles by side-tagged aggregation.
    // INVARIANT (r15 advisor note): `sh` has exactly one row per doc_id
    // (it is a projection of the corpus table, whose doc_id is the
    // primary key) — first(when(side…)) picks an arbitrary array if that
    // ever breaks, where the old two-sided join would emit one row per
    // combination; a corpus source with duplicate doc_ids must dedup
    // upstream before this operator.
    val sides = cands.select(col("doc_a"), col("doc_b"), col("n_shared_fp"),
      explode(array(
        struct(lit(1).as("side"), col("doc_a").as("doc_id")),
        struct(lit(2).as("side"), col("doc_b").as("doc_id")))).as("e"))
      .select(col("doc_a"), col("doc_b"), col("n_shared_fp"),
        col("e.side").as("side"), col("e.doc_id").as("doc_id"))
    sides.join(sh, "doc_id")
      .groupBy(col("doc_a"), col("doc_b"), col("n_shared_fp"))
      .agg(
        first(when(col("side") === 1, col("sh")), ignoreNulls = true).as("sa"),
        first(when(col("side") === 2, col("sh")), ignoreNulls = true).as("sb"))
      .select(col("doc_a"), col("doc_b"), col("n_shared_fp"),
        size(col("sa")).cast("long").as("n_a"),
        size(col("sb")).cast("long").as("n_b"),
        size(array_intersect(col("sa"), col("sb"))).cast("long")
          .as("n_common"))
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .select(col("doc_a"), col("doc_b"), col("n_shared_fp"),
        col("n_a"), col("n_b"), col("n_common"),
        (col("n_common").cast("double") / col("n_a")).as("cont_ab"),
        (col("n_common").cast("double") / col("n_b")).as("cont_ba"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common"))).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** (doc_id, sh, hs): shingles + their 60-bit md5 hashes, one flat pass
    * each; signatures then run through the codegen'd sketch expressions.
    */
  private[graft] def withHashedShingles(docs: DataFrame, n: Int = 3): DataFrame =
    withShingles(docs, n).withColumn("hs",
      graft.functions.SketchExpressions.md5Prefix60(col("sh")))

  /** Candidate pairs from a banded (doc_id, band_idx, band_key) DF WITHOUT
    * a self-join: group per bucket, emit sorted in-bucket combinations. A
    * self-join evaluates the whole `banded` subtree twice (once per side)
    * and shuffles it twice; this shuffles it once and walks each bucket's
    * membership list. Local bench is a wash (verify tail dominates at this
    * SF) — the shape is chosen for 100 TB, where halving the signature
    * computation and shuffle volume is the bill. Pair semantics: a < b,
    * counted once per shared band. Buckets larger than `maxBucket` are
    * dropped entirely before pair generation (see [[MaxLshBucket]]) —
    * the guard that keeps a degenerate all-identical corpus from going
    * quadratic inside one bucket.
    */
  private[graft] def minhashCandidates(
      banded: DataFrame, maxBucket: Int): DataFrame =
    banded
      .groupBy(col("band_idx"), col("band_key"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxBucket)
      .select(explode(flatten(transform(col("ids"), (a, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))), b =>
          struct(a.as("doc_a"), b.as("doc_b")))))).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))

  /** Band keys (doc_id, band_idx, band_key) for a (doc_id, hs) DF — the
    * signature + banding stage of MinHash-LSH, shared by the query and the
    * degenerate-corpus spec. `rowsPerBand` is the production operating
    * knob (round-12 100× metrology: the default 2-row banding's candidate
    * mass grows ~n^1.45 because its per-band FP rate is J_background², so
    * a fleet-scale run wants WIDER bands — 4 rows drops the per-band FP
    * rate to J⁴ at the cost of per-band recall, measured in-registry by
    * [[qLshBands]] and end-to-end by q_dedup_minhash_wide); the same 16
    * minhashes regroup under any divisor geometry, so changing the knob
    * costs no extra signature passes.
    */
  private[graft] def minhashBanded(
      withHs: DataFrame, rowsPerBand: Int = RowsPerBand): DataFrame = {
    require(NumHashes % rowsPerBand == 0,
      s"rowsPerBand=$rowsPerBand must divide NumHashes=$NumHashes")
    val nBands = NumHashes / rowsPerBand
    val sig = withHs
      .filter(size(col("hs")) > 0)
      .withColumn("mh",
        graft.functions.SketchExpressions.affineMinhashes(col("hs"), NumHashes))
      .select(col("doc_id") +: (0 until NumHashes).map(k =>
        element_at(col("mh"), k + 1).as(s"m$k")): _*)
    val bandCols = (0 until nBands).map { b =>
      val ms = (0 until rowsPerBand).map(r => col(s"m${b * rowsPerBand + r}"))
      struct(lit(b).as("band_idx"), md5(concat_ws(",", ms: _*)).as("band_key"))
    }
    sig
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band_idx"), col("bk.band_key"))
  }

  /** Shared persisted (doc_id, hs) signature table for the MinHash family
    * ([[qDedupMinhash]], [[qDedupPipeline]], [[qSplitLeakage]]): the
    * signature/banding stage and BOTH sides of each candidate-verify join
    * read the same materialization. Spark shares no uncached subtrees, so
    * without the persist the tokenize→shingle→md5 pipeline was evaluated
    * 3× per query (round-1 bench: 3.8 s, the suite's second-worst line).
    * At 100 TB the same shape is a signature table materialized to parquet
    * once and joined from.
    *
    * Memoized per (session, dir) like [[canonicalComponents]] — previously
    * each of the three queries persisted its OWN corpus-sized copy for the
    * session's lifetime (round-5 advisor note). Re-persist guard: Bench
    * clears the cache between self-caching passes, which unpersists the
    * memoized frame without evicting the memo entry; marking it again
    * keeps each measured pass computing signatures exactly once, same as
    * the pre-memo semantics.
    */
  private val signatureCache = new SessionMemo.PersistedDF
  private def sharedSignatures(s: SparkSession, dir: String): DataFrame =
    signatureCache.getOrElseUpdate(s, dir)(
      withHashedShingles(nearDupDocs(s, dir))
        .select(col("doc_id"), col("hs")))

  /** Eligible planted-pair count over [[sharedSignatures]] — the n_true
    * denominator of [[recallCensus]], exposed for the rehearsal
    * harness's pair-table census (round-13 advisor low 4: pair tables
    * emitted n_cand_hit/n_ver_hit without n_true, so recall at scale
    * required a hand-join against a census query's line from the same
    * sweep). Same eligibility rule as the census: a planted (base,
    * base + [[PlantOffset]]) pair counts iff BOTH sides carry ≥ 1
    * shingle.
    */
  private[graft] def nTrueEligible(s: SparkSession, dir: String): Long = {
    val elig = sharedSignatures(s, dir)
      .filter(size(col("hs")) > 0).select(col("doc_id"))
    elig.filter(col("doc_id") < PlantOffset)
      .join(elig.select((col("doc_id") - PlantOffset).as("doc_id")),
        Seq("doc_id"), "left_semi")
      .count()
  }

  /** Jaccard threshold for [[qSimjoin]], in tenths (7 → J ≥ 0.7). */
  val SimjoinT = 7

  /** EXACT all-pairs set-similarity join by prefix filtering — the
    * AllPairs/PPJoin family (Bayardo et al., WWW 2007; Xiao et al., WWW
    * 2008): the DETERMINISTIC companion to [[qDedupMinhash]]'s
    * probabilistic LSH. Every document's hashed shingle set is ordered by
    * the GLOBAL rare-first key (ascending document frequency, then hash
    * — one vocabulary census, one join); if J(x, y) ≥ t, the first
    * |x| − ⌈t·|x|⌉ + 1 elements of x and of y must share a member under
    * any common total order, so candidates are generated by bucketing on
    * prefix tokens only — rare tokens by construction, which is what
    * keeps buckets small WITHOUT the LSH path's bucket cap (a cap here
    * would break the exactness guarantee).
    *
    * Three further exactness-preserving kills run BEFORE the expensive
    * verify, all integer comparisons:
    *   - LENGTH filter (Bayardo §3.1), per occurrence row: J ≥ t ⟹
    *     t·|x| ≤ |y| ≤ |x|/t, as t₁₀·sz_a ≤ 10·sz_b ∧ t₁₀·sz_b ≤ 10·sz_a.
    *   - FIRST-MATCH positional bound (PPJoin, Xiao §3), per pair: prefix
    *     tokens carry their 1-based position in the rare-first ordering.
    *     Common tokens of x and y appear in the SAME relative order in
    *     both arrays, so at the first common prefix token (i₀, j₀) =
    *     (min pos_a, min pos_b) no common token precedes it in either
    *     array and |x∩y| ≤ 1 + min(sz_a−i₀, sz_b−j₀).
    *   - LAST-MATCH accumulation bound, per pair: within the prefix
    *     window every common token IS a match (a common non-match between
    *     two matches, or before the first, would sit inside both prefixes
    *     — contradiction), so every non-matched common token is globally
    *     GREATER than the last matched token and sits strictly after its
    *     positions (I, J) = (max pos_a, max pos_b) in both arrays:
    *     |x∩y| ≤ n_match + min(sz_a−I, sz_b−J).
    * J ≥ t needs |x∩y| ≥ ⌈t/(1+t)·(sz_a+sz_b)⌉ (integer form: bound ×
    * (10+t₁₀) ≥ t₁₀·(sz_a+sz_b)), so a pair failing either bound is dead.
    * Verification computes ni = |x∩y| once per survivor and tests the
    * algebraically identical 10·ni ≥ t₁₀·(sz_a+sz_b−ni) — hashed shingle
    * arrays are duplicate-free by construction (distinct shingles,
    * injective 60-bit hashing on this corpus, identical in both engines),
    * so |x∪y| = sz_a+sz_b−ni and the O(|x|+|y|) distinct-union pass runs
    * only for the reported jaccard of TRUE pairs, not per candidate.
    * Scale shape: census + join + bounded prefix explode ((1−t)·|x|+1 per
    * doc) + in-bucket pairs (one shuffle, no self-join) + pair-level
    * bounds + candidate-proportional verify; the O(n²) work exists only
    * in the small-SF oracle's brute force. The bounds cut the verify
    * join's shipped volume — both full `hs` arrays per candidate — which
    * is the bill at 100×.
    */
  def qSimjoin(s: SparkSession, dir: String): DataFrame = {
    val withHs = sharedSignatures(s, dir)
    val flat = withHs.select(col("doc_id"), explode(col("hs")).as("h"))
    val dfreq = flat.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val ordered = flat.join(dfreq, "h")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("sz"))
    // p = sz − ⌈t·sz⌉ + 1, exact integer ceil
    val p = (col("sz") - expr(s"($SimjoinT * sz + 9) div 10") + 1).cast("int")
    val pre = ordered
      .select(col("doc_id"), col("sz"),
        posexplode(slice(col("toks"), lit(1), p)).as(Seq("pos0", "t")))
      .select(col("doc_id"), col("sz"), (col("pos0") + 1).as("pos"),
        col("t.h").as("h"))
    // one shuffle: bucket per prefix token, walk sorted in-bucket pairs
    // (a < b by doc_id — doc_id leads the sort struct); no self-join, so
    // the census→order→prefix subtree is evaluated once
    val occ = pre
      .groupBy(col("h"))
      .agg(sort_array(
        collect_list(struct(col("doc_id"), col("sz"), col("pos")))).as("xs"))
      .filter(size(col("xs")) > 1)
      .select(explode(flatten(transform(col("xs"), (a, i) =>
        transform(slice(col("xs"), i + 2, size(col("xs"))), b =>
          struct(a.getField("doc_id").as("doc_a"),
            b.getField("doc_id").as("doc_b"),
            a.getField("sz").as("sz_a"), b.getField("sz").as("sz_b"),
            a.getField("pos").as("pos_a"),
            b.getField("pos").as("pos_b")))))).as("m"))
      .select(col("m.*"))
    val req = (col("sz_a") + col("sz_b")) * SimjoinT // bound·(10+t₁₀) ≥ req
    val cand = occ
      .filter(col("sz_b") * 10 >= col("sz_a") * SimjoinT &&
        col("sz_a") * 10 >= col("sz_b") * SimjoinT)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("nm"),
        min(col("pos_a")).as("i0"), min(col("pos_b")).as("j0"),
        max(col("pos_a")).as("ia"), max(col("pos_b")).as("ja"),
        first(col("sz_a")).as("sz_a"), first(col("sz_b")).as("sz_b"))
      .filter(
        (lit(1) + least(col("sz_a") - col("i0"),
          col("sz_b") - col("j0"))) * (10 + SimjoinT) >= req &&
        (col("nm") + least(col("sz_a") - col("ia"),
          col("sz_b") - col("ja"))) * (10 + SimjoinT) >= req)
      .select(col("doc_a"), col("doc_b"), col("sz_a"), col("sz_b"))
    cand
      .join(withHs.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")),
        "doc_a")
      .join(withHs.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")),
        "doc_b")
      .withColumn("ni", size(array_intersect(col("hs_a"), col("hs_b"))))
      .filter(col("ni") * 10 >= (col("sz_a") + col("sz_b") - col("ni")) *
        SimjoinT)
      .select(col("doc_a"), col("doc_b"),
        (col("ni").cast("double") /
          size(array_distinct(concat(col("hs_a"), col("hs_b")))))
          .as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** MinHash + LSH banding: one-pass codegen'd affine signatures over the
    * hashed shingle array, band keys, candidate pairs via band equi-join,
    * Jaccard verification on candidates only. `rowsPerBand` is the band
    * geometry knob ([[minhashBanded]]'s scaladoc for the scale story);
    * the 8×2 default matches the reference pipeline's historical shape.
    */
  def qDedupMinhash(s: SparkSession, dir: String,
      rowsPerBand: Int = RowsPerBand): DataFrame = {
    val withHs = sharedSignatures(s, dir)

    // docs with no shingles can't be minhashed (and a null signature would
    // make every such doc collide on every band) — minhashBanded excludes
    // them before banding
    val cand =
      minhashCandidates(minhashBanded(withHs, rowsPerBand), MaxLshBucket)

    // verify on the 60-bit hashed shingles, not the strings: same jaccard
    // modulo md5 collisions (identical in both engines, so still
    // oracle-exact), 8-byte elements instead of ~20-byte strings through
    // the two joins, and integer set-intersection in the hot loop
    cand
      .join(withHs.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), "doc_a")
      .join(withHs.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), "doc_b")
      .select(
        col("doc_a"), col("doc_b"), col("n_shared_bands"),
        (size(array_intersect(col("hs_a"), col("hs_b"))).cast("double") /
          size(array_distinct(concat(col("hs_a"), col("hs_b"))))).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Rows-per-band of the WIDE-band registry row `q_dedup_minhash_wide`:
    * 4×4 over the same 16 minhashes — the fleet-scale operating point the
    * round-12 100× metrology argues for (per-band FP rate J⁴ instead of
    * J², cutting the candidate-mass growth exponent; the recall trade is
    * measured by [[qLshBands]] on the same signatures).
    */
  val WideRowsPerBand = 4

  /** [[qDedupMinhash]] at the wide-band operating point — same output
    * contract (verified candidate pairs + n_shared_bands + exact
    * Jaccard), band geometry [[WideRowsPerBand]].
    */
  def qDedupMinhashWide(s: SparkSession, dir: String): DataFrame =
    qDedupMinhash(s, dir, rowsPerBand = WideRowsPerBand)

  /** SimHash near-dup signatures: 16-bit bitwise-majority over shingle
    * hashes (one-pass codegen expression — the earlier explode+groupBy
    * formulation triggered InferFiltersFromGenerate, which pushed the whole
    * shingle pipeline into the scan filter), compared via Hamming distance
    * for the planted near-copy (small) vs the next document (≈ random ≈ 8).
    * Features are 3-gram shingles, not tokens: this corpus draws every
    * document from one small vocabulary, so token-set signatures are
    * near-identical corpus-wide — shingle sets are what discriminate.
    */
  def qDedupSimhash(s: SparkSession, dir: String): DataFrame = {
    val docs = nearDupDocs(s, dir)
    val sig = withHashedShingles(docs)
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"),
        graft.functions.SketchExpressions.simhash(col("hs"), SimhashBits)
          .as("simhash"))

    // SINGLE-PASS pairing (same shape as [[qDedupJaccard]]): the signature
    // pipeline is evaluated once — each signed doc explodes into the
    // comparison rows it participates in, one groupBy reassembles
    // (self, dup, next) per base doc, and the not-null filter reproduces
    // the inner-join semantics. The round-1 three-way self-join re-ran
    // tokenize→shingle→md5→simhash once per branch — 3× the corpus scan
    // and the bench's worst line at 8.3 s. Shuffle payload here is
    // (key, role, 16-bit signature) — tiny at any scale.
    val contrib = sig.select(explode(
      when(col("doc_id") < PlantOffset, array(
        struct(col("doc_id").as("key"), lit("self").as("role"), col("simhash")),
        struct((col("doc_id") - 1).as("key"), lit("next").as("role"), col("simhash"))))
        .otherwise(array(
          struct((col("doc_id") - PlantOffset).as("key"), lit("dup").as("role"), col("simhash"))))
    ).as("c")).select(col("c.*"))
    contrib
      .groupBy(col("key"))
      .agg(
        max(when(col("role") === "self", col("simhash"))).as("simhash"),
        max(when(col("role") === "dup", col("simhash"))).as("sh_dup"),
        max(when(col("role") === "next", col("simhash"))).as("sh_next"))
      .filter(col("simhash").isNotNull && col("sh_dup").isNotNull &&
        col("sh_next").isNotNull)
      .select(
        col("key").as("doc_id"),
        col("simhash"),
        bit_count(col("simhash").bitwiseXOR(col("sh_dup"))).cast("long").as("ham_dup"),
        bit_count(col("simhash").bitwiseXOR(col("sh_next"))).cast("long").as("ham_next"))
      .orderBy(col("doc_id"))
  }

  /** Multi-index Hamming search geometry: [[HammingM]] substrings of
    * [[SimhashBits]]/[[HammingM]] bits each, full-code radius [[HammingR]].
    * Pigeonhole (Norouzi, Punjani & Fleet, CVPR 2012 "Fast Search in
    * Hamming Space with Multi-Index Hashing"): ham ≤ R over the full code
    * implies some substring is within ⌊R/m⌋ = 1, so probing each query
    * substring's exact bucket plus its 8 one-bit flips finds every true
    * match — candidates are bucket collisions, never all pairs.
    */
  val HammingM = 2
  val HammingR = 3
  val HammingQ = 10
  val HammingTopK = 5

  /** Hamming-radius retrieval over the corpus' SimHash codes via
    * multi-index hashing: index = one row per (substring idx, substring
    * value) — m rows per document; queries enumerate the 1 + 8 probe
    * masks per substring (18 probe rows per query total), equi-join the
    * index on (idx, value), then verify the FULL 16-bit distance and rank
    * (ham asc, doc_id) to top-[[HammingTopK]]. The planted near-dup
    * copies ([[nearDupDocs]]) are the guaranteed in-radius matches; the
    * self code at distance 0 is excluded by id. Signatures read the
    * SHARED persisted (doc_id, hs) table, so the shingle pipeline is not
    * re-evaluated per branch. At 100 TB: the index is m·N small rows
    * partitioned by (idx, value), probe volume is |Q|·m·(1+b) rows, and
    * verify cost is candidate-proportional — the published MIH trade; with
    * production-width codes (64/128 bits) substring buckets stay small,
    * the 8-bit buckets here are fixture-width, not the scale shape.
    */
  def qHammingSearch(s: SparkSession, dir: String): DataFrame = {
    val half = SimhashBits / HammingM
    val subMask = (1L << half) - 1
    val sig = sharedSignatures(s, dir)
      .filter(size(col("hs")) > 0)
      .select(col("doc_id"),
        graft.functions.SketchExpressions.simhash(col("hs"), SimhashBits)
          .as("simhash"))
    def sub(i: Int): Column =
      shiftright(col("simhash"), i * half).bitwiseAND(lit(subMask))
    val index = sig
      .select(col("doc_id"), col("simhash"), explode(array((0 until HammingM).map(i =>
        struct(lit(i).as("s"), sub(i).as("k"))): _*)).as("e"))
      .select(col("doc_id"), col("simhash"), col("e.s"), col("e.k"))
    val masks = 0L +: (0 until half).map(b => 1L << b)
    val probes = sig
      .filter(col("doc_id") < HammingQ)
      .select(col("doc_id").as("query_id"), col("simhash").as("qh"),
        explode(array((for { i <- 0 until HammingM; mk <- masks } yield
          struct(lit(i).as("s"), sub(i).bitwiseXOR(lit(mk)).as("k"))): _*)).as("p"))
      .select(col("query_id"), col("qh"), col("p.s"), col("p.k"))
    val cand = broadcast(probes)
      .join(index, Seq("s", "k"))
      .filter(col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("qh"), col("doc_id"), col("simhash"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("ham").asc, col("doc_id").asc)
    cand
      .select(col("query_id"), col("doc_id"),
        bit_count(col("qh").bitwiseXOR(col("simhash"))).cast("long").as("ham"))
      .filter(col("ham") <= HammingR)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= HammingTopK)
      .select(col("query_id"), col("rk").cast("long").as("rk"),
        col("doc_id"), col("ham"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** Embedding-cosine near-dup: plant identical-vector copies, bucket by
    * 16 coordinate-sign bits, equi-join within buckets, verify cosine on
    * candidates. Identical vectors share every sign bit so recall of exact
    * vector dups is 1; random pairs collide with P ≈ 2⁻¹⁶.
    */
  def qDedupEmbedding(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val corpus = base.union(base.select(
      (col("vec_id") + PlantOffset).as("vec_id"), col("embedding")))
    val bucketed = corpus.withColumn("bucket",
      VectorFunctions.signBucket(col("embedding"), BucketDims))
    val pairs = bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_a"),
        col("b.vec_id").as("vec_b"),
        round(VectorFunctions.cosine(col("a.embedding"), col("b.embedding")), 6)
          .as("cos"))
    pairs.filter(col("cos") >= 0.99).orderBy(col("vec_a"), col("vec_b"))
  }

  /** Duplicate CLUSTERS from pair evidence — the step between "detector
    * found pairs" and "keep one canonical doc per cluster". The canonical
    * detector emits ADJACENT pairs per fingerprint group (|g|−1 edges —
    * linear in group size; a million-member duplicate group must emit a
    * path, not |g|²/2 pairs), so the full cluster only exists as the
    * TRANSITIVE CLOSURE of the edges. [[ConnectedComponents]] (alternating
    * large-star/small-star, diameter-independent round count) recovers it.
    * Output: one row per cluster — canonical id (component min), member
    * count, member list.
    */
  /** Adjacent-pair edges per canonical-fingerprint group over the planted
    * corpus — |g|−1 edges per group (linear), closure left to
    * [[ConnectedComponents]]. Shared by [[qDedupClusters]] / [[qDedupKeep]].
    */
  private def canonicalEdges(s: SparkSession, dir: String): DataFrame =
    plantedDocs(s, dir)
      .select(col("doc_id"), TextFunctions.normFingerprint(col("text")).as("fp_norm"))
      .groupBy(col("fp_norm"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(zip_with(
        slice(col("ids"), lit(1), size(col("ids")) - 1),
        slice(col("ids"), lit(2), size(col("ids")) - 1),
        (a, b) => struct(a.as("src"), b.as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))

  /** Component mapping memoized per (session, corpus dir) and persisted:
    * [[qDedupClusters]] and [[qDedupKeep]] both need the identical
    * canonicalEdges → closure construction (~4.6 s of CC scheduling rounds
    * each, constant in data size), and a production pipeline materializes
    * the mapping once per corpus anyway — this is that shape in-session.
    *
    * Assumes the corpus dir is immutable within a session (true for every
    * caller here; a dir whose parquet changes mid-session would serve stale
    * components). Lifecycle: entries for a session are unpersisted and
    * evicted when that session's SparkContext ends, so a long-lived process
    * hosting many sessions neither leaks executor storage nor retains
    * stopped sessions. Concurrency: [[SessionMemo]] — the multi-second
    * closure runs OUTSIDE the map lock (a first materialization for one
    * (session, dir) does not block unrelated keys), while concurrent
    * first calls for the same key still persist exactly once.
    */
  private val componentCache =
    new SessionMemo[DataFrame](_.unpersist(blocking = false))
  private def canonicalComponents(s: SparkSession, dir: String): DataFrame =
    componentCache.getOrElseUpdate(s, dir)(
      ConnectedComponents.components(canonicalEdges(s, dir)).persist())

  def qDedupClusters(s: SparkSession, dir: String): DataFrame = {
    canonicalComponents(s, dir)
      .groupBy(col("component"))
      .agg(
        count(lit(1)).as("n_members"),
        // stringified: the driver's row-sort hash gate needs scalar cells
        // (the q_complex_types convention)
        array_join(transform(sort_array(collect_list(col("id"))),
          m => m.cast("string")), ",").as("members"))
      .select(col("component").as("canonical_id"), col("n_members"), col("members"))
      .orderBy(col("canonical_id"))
  }

  /** Cluster-SIZE histogram — the duplication forensics a curation report
    * leads with (how much of the duplicate mass sits in pairs vs deep
    * re-crawl chains decides whether exact dedup suffices or a
    * boilerplate/template hunt is warranted). Two bounded aggregations
    * over the memoized component mapping: sizes, then the size
    * histogram — output is |distinct sizes| rows, corpus-independent.
    */
  def qDedupClusterHist(s: SparkSession, dir: String): DataFrame =
    canonicalComponents(s, dir)
      .groupBy(col("component"))
      .agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size"))
      .agg(
        count(lit(1)).as("n_clusters"),
        sum(col("sz")).as("n_docs"))
      .orderBy(col("cluster_size"))

  /** The keep/drop ledger — what the dedup stage actually DELIVERS to the
    * next pipeline stage: corpus size, documents inside duplicate clusters,
    * cluster count, and the resulting kept/dropped totals (keep = one
    * canonical per cluster + every singleton). Two bounded aggregates over
    * the component mapping crossed with the corpus count — no join of the
    * corpus against the mapping is needed for the ledger.
    */
  def qDedupKeep(s: SparkSession, dir: String): DataFrame = {
    val comp = canonicalComponents(s, dir)
      .agg(
        count(lit(1)).as("n_in_clusters"),
        countDistinct(col("component")).as("n_clusters"))
    val total = plantedDocs(s, dir).agg(count(lit(1)).as("n_total"))
    total.crossJoin(comp)
      .select(
        col("n_total"), col("n_in_clusters"), col("n_clusters"),
        (col("n_total") - col("n_in_clusters") + col("n_clusters")).as("n_kept"),
        (col("n_in_clusters") - col("n_clusters")).as("n_dropped"))
  }

  /** Representative selection per duplicate cluster — the policy real
    * curation pipelines use instead of [[qDedupKeep]]'s keep-lowest-id:
    * keep the HIGHEST-QUALITY member (deterministic tie-break: lowest
    * doc_id), because near-dup clusters routinely mix a clean original
    * with truncated/boilerplated copies and "first by id" keeps whichever
    * crawled first. Reuses the memoized component mapping and the shared
    * quality formula ([[TextAnalysis.qualitySqlExpr]] is the SQL twin of
    * the row-local score, so the formula lives in one place per engine).
    *
    * Scale shape: the component mapping is bounded by duplicate density
    * (never corpus-sized in healthy corpora); scoring is a pure map over
    * the corpus; the argmax is one struct-max aggregation — max(quality,
    * −doc_id) — so the per-cluster reduction is a single comparator, no
    * window, no per-cluster sort. Everything shuffles on id/component.
    */
  def qDedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    val scored = plantedDocs(s, dir).select(
      col("doc_id"),
      graft.functions.TextFunctions.qualityScore(col("text")).as("quality"))
    canonicalComponents(s, dir)
      .join(scored, col("id") === col("doc_id"))
      .groupBy(col("component"))
      .agg(
        count(lit(1)).as("n_members"),
        max(struct(col("quality").as("q"), (-col("doc_id")).as("nid"))).as("b"))
      .select(
        col("component").as("canonical_id"),
        (-col("b.nid")).cast("long").as("best_id"),
        col("b.q").as("best_quality"),
        col("n_members"))
      .orderBy(col("canonical_id"))
  }

  /** Jaccard acceptance threshold for [[qDedupPipeline]]'s verify stage. */
  val JaccardThreshold = 0.8

  /** The END-TO-END near-dup pipeline, composed from the pieces the other
    * queries verify in isolation: MinHash signatures → LSH banding →
    * candidate pairs → exact-Jaccard verify (≥ [[JaccardThreshold]]) →
    * connected components over the surviving pairs → cluster-size
    * histogram. This is the production shape: every stage is
    * shuffle-on-key, candidates scale with duplicate density, and the
    * closure is diameter-independent — so the composition inherits every
    * per-stage 100 TB property.
    */
  /** MinHash-verified near-dup pair set (src < dst, exact Jaccard ≥
    * [[JaccardThreshold]] on the hashed shingles) over a persisted
    * (doc_id, hs) signature table — the shared front half of
    * [[qDedupPipeline]] and [[qSplitLeakage]].
    */
  private[operators] def verifiedPairs(
      withHs: DataFrame, rowsPerBand: Int = RowsPerBand): DataFrame =
    minhashCandidates(minhashBanded(withHs, rowsPerBand), MaxLshBucket)
      .join(withHs.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), "doc_a")
      .join(withHs.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), "doc_b")
      .select(col("doc_a").as("src"), col("doc_b").as("dst"),
        (size(array_intersect(col("hs_a"), col("hs_b"))).cast("double") /
          size(array_distinct(concat(col("hs_a"), col("hs_b"))))).as("j"))
      .filter(col("j") >= JaccardThreshold)
      .select(col("src"), col("dst"))

  /** Dedup-method evaluation against the PLANTED ground truth — the
    * measure-don't-guess receipt for the 8×2 MinHash banding: the truth
    * set is the planted (base, base + [[PlantOffset]]) tail-copy pairs
    * restricted to minhash-eligible docs (≥ 1 shingle on BOTH sides);
    * one pass over the candidate+Jaccard frame the pipeline already
    * builds counts candidates, truth hits among them (LSH recall),
    * verified pairs, and verified truth hits — so the banding's S-curve
    * promise (miss ≈ 3·10⁻⁴ at J ≥ 0.8) is measured per corpus, not
    * cited. truth_precision is a LOWER bound on real precision: verified
    * non-planted pairs are organic near-duplicates, not false positives.
    * Ratios are IEEE divisions of the exact counts; the truth census is
    * one co-partitioned id semi-join; everything else is two 1-row
    * frames.
    */
  def qDedupRecall(s: SparkSession, dir: String): DataFrame =
    recallCensus(sharedSignatures(s, dir))

  /** The candidate/truth/verify census readout shared by [[qDedupRecall]],
    * [[qDedupMinhashDfkill]] and [[qDedupDfkillWide]] over any (doc_id,
    * hs) signature frame and band geometry: banding → bucket-capped
    * candidates → exact Jaccard → counts against the planted truth. One
    * arithmetic, three inputs — the censuses DedupSpec A/B-compares can
    * never desynchronize on a threshold or a ratio.
    */
  private[operators] def recallCensus(
      withHs: DataFrame, rowsPerBand: Int = RowsPerBand): DataFrame = {
    val isTruth = col("doc_b") === col("doc_a") + PlantOffset &&
      col("doc_a") < PlantOffset
    val verified = col("j") >= JaccardThreshold
    val stats =
      minhashCandidates(minhashBanded(withHs, rowsPerBand), MaxLshBucket)
      .join(withHs.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), "doc_a")
      .join(withHs.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("hs_a"), col("hs_b"))).cast("double") /
          size(array_distinct(concat(col("hs_a"), col("hs_b"))))).as("j"))
      .agg(
        count(lit(1)).as("n_cand"),
        sum(when(isTruth, 1L).otherwise(0L)).as("n_cand_hit"),
        sum(when(verified, 1L).otherwise(0L)).as("n_verified"),
        sum(when(isTruth && verified, 1L).otherwise(0L)).as("n_ver_hit"))
    val elig = withHs.filter(size(col("hs")) > 0).select(col("doc_id"))
    val nTrue = elig.filter(col("doc_id") < PlantOffset)
      .join(elig.select((col("doc_id") - PlantOffset).as("doc_id")),
        Seq("doc_id"), "left_semi")
      .agg(count(lit(1)).as("n_true"))
    stats.crossJoin(nTrue)
      .select(col("n_true"), col("n_cand"), col("n_cand_hit"),
        col("n_verified"), col("n_ver_hit"),
        (col("n_cand_hit").cast("double") / col("n_true").cast("double"))
          .as("lsh_recall"),
        (col("n_ver_hit").cast("double") / col("n_true").cast("double"))
          .as("e2e_recall"),
        (col("n_ver_hit").cast("double") / col("n_verified").cast("double"))
          .as("truth_precision"))
  }

  /** Relative shingle-df kill rule for [[qDedupMinhashDfkill]]: a shingle
    * hash present in MORE than corpus/[[ShingleDfKillDenom]] distinct
    * documents (2% document frequency — the classic boilerplate cut) is
    * template mass and is dropped from every signature. Expressed as
    * `df · denom > n_corpus` so both engines compare exact integers.
    */
  val ShingleDfKillDenom = 50L

  /** [[qDedupRecall]]'s census with TEMPLATE SHINGLES KILLED before
    * signing — the measured fix for the round-12 100× finding: LSH
    * candidate mass grows ~n^1.45 because the 2-row banding's
    * false-positive rate is driven by the BACKGROUND Jaccard between
    * unrelated documents, and that background is carried almost entirely
    * by shared template/boilerplate shingles (df > 2% of the corpus).
    * Killing them before `affine_minhashes` lowers J_background — and FP
    * candidates fall ∝ J² per band — while planted-duplicate pairs,
    * whose similarity lives in their full shingle sets, keep their
    * recall (asserted against the same planted truth as q_dedup_recall).
    * Scale shape: ONE extra df aggregation over the exploded shingle
    * stream + a broadcast anti-join. The hot set is bounded by
    * ≤ |stream|·denom/n_corpus distinct shingles (each needs > n/denom
    * occurrences — the bound scales with the MEAN PER-DOC shingle count,
    * not the corpus); measured 120 killed at the 100× rehearsal
    * (BASELINE.md round-12) — broadcast-trivial. Everything downstream
    * is the
    * unchanged banding/verify pipeline. The n_hot receipt column
    * re-evaluates the df aggregation once (Spark shares no uncached
    * subtrees); a production run omits the receipt.
    */
  private val dfkillFilteredCache = new SessionMemo.PersistedDF

  /** Memoized+persisted df-killed (doc_id, hs) signature frame — the
    * census fans out over it five ways (banding + both Jaccard sides +
    * both truth-eligibility legs), and Spark shares no uncached subtrees,
    * so without the persist the explode→anti-join→regroup pipeline (and
    * the hot-set df aggregation feeding it) would re-run per reference —
    * the sharedSignatures double-evaluation class this round's
    * SessionMemo.PersistedDF exists to kill.
    */
  private[operators] def dfkillFiltered(s: SparkSession, dir: String): DataFrame =
    dfkillFilteredCache.getOrElseUpdate(s, dir) {
      dfkillApply(sharedSignatures(s, dir))
    }

  /** The df-kill applied to an ARBITRARY (doc_id, hs) frame: drop every
    * >1/[[ShingleDfKillDenom]]-df shingle (df census over the frame's
    * own docs) and regroup. Shared by the memoized census path above and
    * [[SqlSurface.pipelineTwin]]'s kill stage, so the twin pin and the
    * production kill rule cannot drift apart through a second copy.
    */
  private[operators] def dfkillApply(withHs: DataFrame): DataFrame =
    withHs
      .select(col("doc_id"), explode(col("hs")).as("h"))
      .join(broadcast(dfkillHotSet(withHs)), Seq("h"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(collect_list(col("h")).as("hs"))

  /** The >2%-df hot-shingle set over a (doc_id, hs) frame. */
  private def dfkillHotSet(withHs: DataFrame): DataFrame =
    withHs
      .select(explode(array_distinct(col("hs"))).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(withHs.agg(count(lit(1)).as("n_corpus"))))
      .filter(col("df") * ShingleDfKillDenom > col("n_corpus"))
      .select(col("h"))

  def qDedupMinhashDfkill(s: SparkSession, dir: String): DataFrame = {
    // the n_hot receipt re-evaluates the df aggregation once per pass
    // (it reads the persisted sharedSignatures, one map-side-combined
    // aggregation); a production run omits the receipt
    val nHot = dfkillHotSet(sharedSignatures(s, dir))
      .agg(count(lit(1)).as("n_hot"))
    recallCensus(dfkillFiltered(s, dir))
      .crossJoin(broadcast(nHot))
      .select(col("n_hot"), col("n_true"), col("n_cand"), col("n_cand_hit"),
        col("n_verified"), col("n_ver_hit"), col("lsh_recall"),
        col("e2e_recall"), col("truth_precision"))
  }

  /** The COMPOSED fleet recipe: template-shingle df-kill BEFORE signing
    * ([[qDedupMinhashDfkill]]) + the wide 4×4 band geometry
    * ([[WideRowsPerBand]]) — the two measured knobs the round-12 100×
    * metrology recommends, applied together. The df-kill restores the
    * recall the banding's width costs (killed template mass re-converges
    * planted pairs to J = 1, so even 4-row bands collide on them), while
    * the wide geometry holds candidate mass LINEAR in the corpus
    * (round-13 rehearsal, docs/REHEARSAL_r13.json: default 2-row
    * candidates ~n^1.46 vs 4-row ~n^0.99) — together: linear candidates
    * AND ≈1.0 e2e recall. Same census contract as q_dedup_recall.
    */
  def qDedupDfkillWide(s: SparkSession, dir: String): DataFrame =
    recallCensus(dfkillFiltered(s, dir), WideRowsPerBand)

  /** Verification thresholds swept by [[qDedupPrCurve]]. */
  val PrThresholds: Seq[Double] = Seq(0.5, 0.6, 0.7, 0.8, 0.9)

  /** Precision/recall CURVE over the verification threshold — the tuning
    * artifact behind [[qDedupRecall]]'s single point: one pass over the
    * candidate+Jaccard frame the pipeline already builds, fanned out to
    * the [[PrThresholds]] grid (a bounded 5× explode of candidate rows,
    * never of the corpus), so choosing the dedup operating point is a
    * measured trade instead of a cited default. Same planted ground
    * truth and precision-lower-bound caveat as the single-point query.
    */
  def qDedupPrCurve(s: SparkSession, dir: String): DataFrame = {
    val withHs = sharedSignatures(s, dir)
    val isTruth = col("doc_b") === col("doc_a") + PlantOffset &&
      col("doc_a") < PlantOffset
    val perT = minhashCandidates(minhashBanded(withHs), MaxLshBucket)
      .join(withHs.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")),
        "doc_a")
      .join(withHs.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("hs_a"), col("hs_b"))).cast("double") /
          size(array_distinct(concat(col("hs_a"), col("hs_b"))))).as("j"))
      .select(col("doc_a"), col("doc_b"), col("j"),
        explode(typedLit(PrThresholds)).as("t"))
      .groupBy(col("t"))
      .agg(
        sum(when(col("j") >= col("t"), 1L).otherwise(0L)).as("n_verified"),
        sum(when(col("j") >= col("t") && isTruth, 1L).otherwise(0L))
          .as("n_hit"))
    val elig = withHs.filter(size(col("hs")) > 0).select(col("doc_id"))
    val nTrue = elig.filter(col("doc_id") < PlantOffset)
      .join(elig.select((col("doc_id") - PlantOffset).as("doc_id")),
        Seq("doc_id"), "left_semi")
      .agg(count(lit(1)).as("n_true"))
    perT.crossJoin(broadcast(nTrue))
      .select(col("t"), col("n_verified"), col("n_hit"), col("n_true"),
        (col("n_hit").cast("double") / col("n_true").cast("double"))
          .as("recall"),
        when(col("n_verified") > 0L,
          col("n_hit").cast("double") / col("n_verified").cast("double"))
          .as("precision_lb"))
      .orderBy(col("t"))
  }

  /** Banding schemes swept by [[qLshBands]]: (rowsPerBand, nBands) with
    * rowsPerBand × nBands = [[NumHashes]] — every scheme regroups the SAME
    * 16 minhashes, so the sweep costs no extra signature passes.
    */
  val BandSchemes: Seq[(Int, Int)] =
    Seq(1 -> NumHashes, 2 -> (NumHashes / 2), 4 -> (NumHashes / 4),
      8 -> (NumHashes / 8))

  /** LSH banding-design sweep — the S-curve receipt behind the shipped
    * 8×2 choice: for each (rowsPerBand, nBands) regrouping of the shared
    * 16-minhash signature, the candidate count (the cost the verify join
    * pays downstream) and the truth recall (what the banding surfaces of
    * the planted pairs). More rows per band sharpens the S-curve —
    * P(candidate) = 1−(1−J^r)^b — trading candidates for recall; the
    * sweep measures that trade on THIS corpus so the banding is chosen,
    * not cited, completing [[qDedupPrCurve]] (threshold axis) with the
    * banding axis. Scale shape: one signature read (memoized), then per
    * scheme a band-key explode (16 rows/doc regardless of scheme) and
    * one bucket aggregation — 4 bounded shuffles, no pair work beyond
    * the capped buckets ([[MaxLshBucket]], same cap per scheme).
    */
  def qLshBands(s: SparkSession, dir: String): DataFrame = {
    val withHs = sharedSignatures(s, dir)
    val sig = withHs
      .filter(size(col("hs")) > 0)
      .withColumn("mh",
        graft.functions.SketchExpressions.affineMinhashes(col("hs"), NumHashes))
      .select(col("doc_id") +: (0 until NumHashes).map(k =>
        element_at(col("mh"), k + 1).as(s"m$k")): _*)
    val isTruth = col("doc_b") === col("doc_a") + PlantOffset &&
      col("doc_a") < PlantOffset
    // ONE pass for all four schemes: every band key of every scheme is
    // emitted from the same signature row tagged (scheme, band_idx), so
    // the whole sweep is a single 30-keys/doc explode + ONE bucket
    // aggregation + ONE in-bucket pair expansion — not 4 separate
    // shuffles (A/B'd: 2.26 s → one-shuffle shape at sf0.1)
    val allBandCols = BandSchemes.flatMap { case (r, nb) =>
      (0 until nb).map { b =>
        val ms = (0 until r).map(i => col(s"m${b * r + i}"))
        struct(lit(r.toLong).as("scheme"), lit(b).as("band_idx"),
          md5(concat_ws(",", ms: _*)).as("band_key"))
      }
    }
    val banded = sig
      .select(col("doc_id"), explode(array(allBandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.scheme"), col("bk.band_idx"),
        col("bk.band_key"))
    val cand = banded
      .groupBy(col("scheme"), col("band_idx"), col("band_key"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= MaxLshBucket)
      .select(col("scheme"), explode(flatten(transform(col("ids"), (a, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))), b =>
          struct(a.as("doc_a"), b.as("doc_b")))))).as("p"))
      .groupBy(col("scheme"), col("p.doc_a").as("doc_a"),
        col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
    // literal scheme frame on the left: a scheme with ZERO candidates
    // still reports its row (the oracle's per-scheme aggregate does)
    val schemesDf = s.createDataFrame(
      BandSchemes.map { case (r, nb) => (r.toLong, nb.toLong) })
      .toDF("scheme", "n_bands")
    val perScheme = schemesDf
      .join(cand
        .groupBy(col("scheme"))
        .agg(count(lit(1)).as("n_cand"),
          sum(when(isTruth, 1L).otherwise(0L)).as("n_hit")),
        Seq("scheme"), "left")
      .select(col("scheme").as("rows_per_band"), col("n_bands"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
    val elig = withHs.filter(size(col("hs")) > 0).select(col("doc_id"))
    val nTrue = elig.filter(col("doc_id") < PlantOffset)
      .join(elig.select((col("doc_id") - PlantOffset).as("doc_id")),
        Seq("doc_id"), "left_semi")
      .agg(count(lit(1)).as("n_true"))
    perScheme.crossJoin(broadcast(nTrue))
      .select(col("rows_per_band"), col("n_bands"), col("n_cand"),
        col("n_hit"), col("n_true"),
        (col("n_hit").cast("double") / col("n_true").cast("double"))
          .as("lsh_recall"))
      .orderBy(col("rows_per_band"))
  }

  def qDedupPipeline(s: SparkSession, dir: String): DataFrame = {
    val withHs = sharedSignatures(s, dir)
    ConnectedComponents.components(verifiedPairs(withHs))
      .groupBy(col("component"))
      .agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .orderBy(col("cluster_size"))
  }

  /** Split-leakage audit: near-duplicate pairs (the [[verifiedPairs]] set
    * of [[qDedupPipeline]]) that STRADDLE the train/val/test assignment —
    * the eval-integrity check a curation team runs before publishing a
    * split: a near-copy of a val/test document inside train is
    * contamination even when doc-level dedup would keep both (they are
    * distinct documents). Split assignment is [[Sampling.splitLabel]] —
    * the ONE hash rule shared with [[Sampling.qSplitAssign]]; planted
    * near-copies carry different doc_ids, so they land in independent
    * splits and ~2·(0.8·0.1 + 0.8·0.1 + 0.1·0.1)+… of them straddle.
    * Scale shape: everything through the verified pair set is the
    * pipeline's (candidate cost ∝ duplicate density, capped buckets); the
    * audit itself adds two row-local labels and a ≤6-key aggregation.
    * Same-split pairs are reported too (is_leak = 0): they are the benign
    * within-split duplication the dedup pass handles.
    */
  def qSplitLeakage(s: SparkSession, dir: String): DataFrame = {
    val withHs = sharedSignatures(s, dir)
    verifiedPairs(withHs)
      .select(
        Sampling.splitLabel(col("src")).as("sa"),
        Sampling.splitLabel(col("dst")).as("sb"))
      .select(
        least(col("sa"), col("sb")).as("split_lo"),
        greatest(col("sa"), col("sb")).as("split_hi"))
      .groupBy(col("split_lo"), col("split_hi"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("is_leak",
        when(col("split_lo") =!= col("split_hi"), 1L).otherwise(0L))
      .orderBy(col("split_lo"), col("split_hi"))
  }

  /** Decontamination: eval-set membership modulus (docs with
    * doc_id % [[EvalMod]] == 0 form the held-out benchmark), the n-gram
    * width, and the flagging threshold in distinct shared shingles.
    * Width 5 on 10-99-token docs plays the role 13-grams play on web pages
    * (GPT-3 appendix C): wide enough that the small synthetic vocabulary
    * produces almost no incidental collisions (3-grams flag half the
    * corpus; 5-grams flag ~1.5%, and those few share genuinely duplicated
    * template spans), narrow enough that every doc has >= 6 shingles.
    */
  val EvalMod = 10L
  val ContamNgram = 5
  val ContamMinShared = 5L

  /** Span-level (exact substring) dedup parameters. [[SpliceOffset]] ids the
    * planted splice documents; [[SpanNgram]]-token shingles are the match
    * unit; a maximal shared run must cover ≥ [[MinRunTokens]] tokens to be
    * reported; [[SpliceLen]] tokens are copied from each neighbor into a
    * planted splice; shingles occurring more than [[MaxSpanOcc]] times
    * corpus-wide are dropped before pair generation (the [[MaxLshBucket]]
    * analogue — boilerplate shingles would otherwise generate quadratic
    * match pairs inside one bucket).
    */
  val SpliceOffset = 30000000L
  val SpanNgram = 8
  val MinRunTokens = 15
  val SpliceLen = 25
  val MaxSpanOcc = 8

  /** Benchmark DECONTAMINATION — flag training documents that share n-gram
    * content with a held-out eval set, the standard pre-training hygiene
    * pass (the GPT-3/PaLM 13-gram-collision method, [[ContamNgram]]-gram
    * here — see width rationale above). The bulk of the flagged set is
    * PLANTED: eval docs re-enter the training side tail-appended under
    * +[[PlantOffset]], the same construction as the near-dup queries.
    *
    * Scale design (100 TB corpus vs a bounded eval set): the eval side
    * reduces to a DISTINCT hashed-shingle set — a few million 8-byte keys
    * for any real benchmark suite — explicitly broadcast; the training side
    * is one map stage (shingle → explode) followed by a broadcast-hash
    * semi-join-shaped probe and a groupBy(doc_id) count. The corpus text is
    * never shuffled, and nothing is quadratic: cost is corpus-linear +
    * overlap-proportional.
    */
  def qDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val evalDocs = docs.filter(col("doc_id") % EvalMod === 0)
    val train = docs.filter(col("doc_id") % EvalMod =!= 0)
      .union(evalDocs.select(
        (col("doc_id") + PlantOffset).as("doc_id"),
        concat(col("text"), lit(Tail)).as("text")))
    val evalShingles = withHashedShingles(evalDocs, ContamNgram)
      .select(explode(col("hs")).as("h"))
      .distinct()
    withHashedShingles(train, ContamNgram)
      .select(col("doc_id"), size(col("hs")).cast("long").as("n_shingles"),
        explode(col("hs")).as("h"))
      .join(broadcast(evalShingles), "h")
      .groupBy(col("doc_id"), col("n_shingles"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= ContamMinShared)
      .select(col("doc_id"), col("n_shingles"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_shingles")).as("overlap"))
      .orderBy(col("doc_id"))
  }

  /** Corpus with planted cross-document verbatim spans: for each adjacent
    * doc pair (d, d+1), a splice document (+[[SpliceOffset]]) whose text is
    * the first [[SpliceLen]] tokens of d followed by the first [[SpliceLen]]
    * tokens of d+1 — a mid-document copied span, the partial-overlap case
    * doc-level MinHash structurally misses.
    */
  private[graft] def splicedDocs(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val tkt = base.select(col("doc_id"), tokens(col("text")).as("tk"))
    val spliced = tkt.as("a")
      .join(tkt.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
      .select(
        (col("a.doc_id") + SpliceOffset).as("doc_id"),
        array_join(concat(
          slice(col("a.tk"), 1, SpliceLen),
          slice(col("b.tk"), 1, SpliceLen)), " ").as("text"))
    base.union(spliced)
  }

  /** Exact SUBSTRING (span-level) dedup — cross-document verbatim token
    * runs ≥ [[MinRunTokens]] tokens, the Lee et al. 2022 ("Deduplicating
    * Training Data Makes Language Models Better", arXiv:2107.06499)
    * operator class that doc-granularity dedup misses: a document that
    * copies a paragraph into otherwise-novel text is invisible to
    * exact-hash and usually below MinHash's Jaccard threshold.
    *
    * Distributed shape (the suffix-array substitute that scales on Spark):
    *   1. positional [[SpanNgram]]-token shingles, 60-bit-hashed — one
    *      narrow map stage; the ONLY corpus-sized shuffle ships
    *      (h: 8 bytes, doc_id, pos);
    *   2. group by shingle hash; buckets of size 1 (unique — the vast
    *      majority) or > [[MaxSpanOcc]] (degenerate boilerplate) are
    *      dropped, surviving buckets emit cross-doc (doc_a, pos_a, doc_b,
    *      pos_b) matches in-bucket (no self-join: the grouped subtree is
    *      evaluated and shuffled once, cf. [[minhashCandidates]]);
    *   3. matches at (pos_a+1, pos_b+1) extend the same span, so runs are
    *      gaps-and-islands on the match DIAGONAL (pos_a − pos_b): island
    *      id = pos_a − row_number within (doc_a, doc_b, diag), one window
    *      shuffle keyed by doc pair — cost ∝ true match density, never
    *      corpus².
    * Output: per overlapping pair, the run count, longest run, and total
    * matched tokens (runs on distinct diagonals are counted as laid out —
    * a token shared by two diagonals contributes to both, identically in
    * both engines).
    */
  def qDedupSubstring(s: SparkSession, dir: String): DataFrame =
    substringSpansHs(sharedSpanHashes(s, dir))

  /** (doc_id, hs): the positional [[SpanNgram]]-gram hash ARRAYS of a
    * corpus — the row-local derivation every span-family stage starts
    * from (the match unit of the span detectors is one posexplode away).
    */
  private[graft] def spanHashArrays(corpus: DataFrame): DataFrame =
    corpus
      .withColumn("hs", graft.functions.SketchExpressions.md5Prefix60(
        graft.functions.SketchExpressions.wordNGrams(
          tokens(col("text")), SpanNgram, distinct = false)))
      .select(col("doc_id"), col("hs"))

  /** Shared persisted (doc_id, hs) positional-hash table of the SPLICED
    * span corpus — the [[sharedSignatures]] idiom applied to the span
    * family (round-14 plan audit): [[qDedupSubstring]], BOTH phases of
    * [[qDedupSubstring2P]] (the reduced-corpus detector and the
    * full-corpus occurrence cap), and the winnowed probe each re-ran the
    * tokenize→8-gram→md5 map over the whole spliced corpus — five
    * corpus-sized expression passes per bench round for one identical
    * array column. At 100 TB this is the hashed-shingle table a span
    * pipeline materializes once and every stage scans (exactly the
    * [[sharedSignatures]] posture; the arrays are token-proportional,
    * the same order as the corpus itself).
    */
  private val spanHsCache = new SessionMemo.PersistedDF
  private[graft] def sharedSpanHashes(s: SparkSession, dir: String): DataFrame =
    spanHsCache.getOrElseUpdate(s, dir)(spanHashArrays(splicedDocs(s, dir)))

  /** (doc_id, pos, h): the positional hash table over precomputed hash
    * arrays — the match unit of the span detectors.
    */
  private def poshOf(hsDf: DataFrame): DataFrame =
    hsDf.select(col("doc_id"), posexplode(col("hs")).as(Seq("pos", "h")))

  /** The span detector over any (doc_id, text) corpus — see
    * [[qDedupSubstring]] for the distributed-shape rationale.
    *
    * `capFrom`: the corpus on which the [[MaxSpanOcc]] occurrence cap is
    * measured. The cap is part of the OPERATOR SEMANTICS (which shingles
    * are boilerplate), not an artifact of whatever subset is being
    * matched — so a caller matching a REDUCED corpus (the two-phase
    * detector) must still cap by full-corpus counts or it admits shingles
    * the full detector drops (caught by the sf0.1 oracle sweep: +53 pairs
    * from boilerplate shingles with > [[MaxSpanOcc]] corpus occurrences
    * but ≤ [[MaxSpanOcc]] among candidate docs). The cap pass is a
    * per-hash count with map-side partials — the shuffle carries (h,
    * partial count) rows, NOT shingle instances, so the two-phase scaling
    * argument survives intact.
    */
  private[graft] def substringSpans(
      corpus: DataFrame, capFrom: Option[DataFrame] = None): DataFrame =
    substringSpansHs(spanHashArrays(corpus), capFrom.map(spanHashArrays))

  /** [[substringSpans]] over precomputed (doc_id, hs) hash-array frames —
    * the entry point the registry queries use so the corpus-sized
    * tokenize→hash map rides the ONE persisted [[sharedSpanHashes]]
    * table instead of re-running per consumer (r14 optimization; the
    * generic corpus-input wrapper above keeps the operator reusable on
    * arbitrary corpora and is what the specs drive).
    */
  private[graft] def substringSpansHs(
      hsDf: DataFrame, capHs: Option[DataFrame] = None): DataFrame = {
    val posh0 = poshOf(hsDf)
    val posh = capHs match {
      case None => posh0
      case Some(full) =>
        val ok = full.select(explode(col("hs")).as("h"))
          .groupBy(col("h"))
          .agg(count(lit(1)).as("c"))
          .filter(col("c") > 1 && col("c") <= MaxSpanOcc)
          .select(col("h"))
        posh0.join(ok, Seq("h"), "left_semi")
    }
    val matches = posh
      .groupBy(col("h"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("pos")))).as("occ"))
      .filter(size(col("occ")) > 1 && size(col("occ")) <= MaxSpanOcc)
      .select(explode(flatten(transform(col("occ"), (a, i) =>
        filter(
          transform(slice(col("occ"), i + 2, size(col("occ"))), b =>
            struct(
              a.getField("doc_id").as("doc_a"), a.getField("pos").as("pos_a"),
              b.getField("doc_id").as("doc_b"), b.getField("pos").as("pos_b"))),
          p => p.getField("doc_a") < p.getField("doc_b"))))).as("m"))
      .select(col("m.*"))
    val w = Window
      .partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("pos_a"))
    matches
      .withColumn("diag", col("pos_a") - col("pos_b"))
      .withColumn("island", col("pos_a") - row_number().over(w))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("island"))
      .agg((count(lit(1)) + lit(SpanNgram - 1)).as("run_tokens"))
      .filter(col("run_tokens") >= MinRunTokens)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(
        count(lit(1)).as("n_runs"),
        max(col("run_tokens")).as("max_run_tokens"),
        sum(col("run_tokens")).as("matched_tokens"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Distinct winnow-selected (doc_id, h) fingerprints of a corpus — the
    * sub-linear probe set: ~2/([[WinnowWindow]]+1) of the positional
    * shingle instances, with the SIGMOD'03 guarantee that any cross-doc
    * verbatim span of ≥ [[WinnowWindow]] + [[SpanNgram]] − 1 tokens still
    * shares at least one selected fingerprint. Row-local (hash + select +
    * gather in one narrow stage); only the distinct on (doc_id, 8-byte h)
    * shuffles.
    */
  private[graft] def winnowedFingerprints(corpus: DataFrame): DataFrame =
    winnowedFingerprintsHs(spanHashArrays(corpus))

  private[graft] def winnowedFingerprintsHs(hsDf: DataFrame): DataFrame =
    hsDf
      .withColumn("sel", graft.functions.SketchExpressions.winnowedPositions(
        col("hs"), WinnowWindow))
      .select(col("doc_id"), col("hs"), explode(col("sel")).as("p"))
      .select(col("doc_id"), element_at(col("hs"), col("p") + 1).as("h"))
      .distinct()

  /** Winnowed substring-dedup PROBE — [[qDedupSubstring]]'s scale path:
    * instead of shuffling every positional shingle, ship only the
    * winnow-selected fingerprints and count, per cross-document pair, the
    * distinct shared selections. Pairs sharing a span ≥ w + k − 1 tokens
    * are guaranteed present (coverage property, spec-pinned against the
    * planted splices); the full detector then runs on the candidate pairs
    * only. Same bucket shape as the full detector (groupBy(h), in-bucket
    * combinations, [[MaxSpanOcc]] boilerplate cap) at ~2/(w+1) of the
    * shuffle volume.
    */
  def qDedupSubstringWin(s: SparkSession, dir: String): DataFrame =
    sharedWinnowCandidates(s, dir).orderBy(col("doc_a"), col("doc_b"))

  /** Shared persisted winnowed-candidate pairs over the spliced corpus —
    * three registry queries consume the SAME probe ([[qDedupSubstringWin]],
    * [[qDedupSubstring2P]]'s phase 1, [[qContainmentE2e]]'s discovery
    * stage), and without the persist each of them re-tokenizes, re-hashes,
    * and re-winnows the corpus (the [[sharedSignatures]] /
    * [[sharedLineRows]] double-evaluation class). Memoized per
    * (session, dir) with the same re-persist guard.
    */
  private val winnowCandCache = new SessionMemo.PersistedDF
  private[graft] def sharedWinnowCandidates(
      s: SparkSession, dir: String): DataFrame =
    winnowCandCache.getOrElseUpdate(s, dir)(
      winnowedCandidatesHs(sharedSpanHashes(s, dir)))

  /** (doc_a, doc_b, n_shared_fp) candidate pairs from the winnowed
    * fingerprints — see [[qDedupSubstringWin]].
    */
  private[graft] def winnowedCandidates(corpus: DataFrame): DataFrame =
    winnowedCandidatesHs(spanHashArrays(corpus))

  private[graft] def winnowedCandidatesHs(hsDf: DataFrame): DataFrame =
    winnowedFingerprintsHs(hsDf)
      .groupBy(col("h"))
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= MaxSpanOcc)
      .select(explode(flatten(transform(col("ids"), (a, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))), b =>
          struct(a.as("doc_a"), b.as("doc_b")))))).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_fp"))

  /** PROBE-THEN-VERIFY substring dedup — the two-phase composition the
    * winnowed probe exists for: phase 1 reduces the corpus to documents
    * that appear in at least one winnowed candidate pair; phase 2 runs the
    * FULL span detector ([[substringSpans]]) on that reduced corpus.
    * Any shared span of ≥ [[WinnowWindow]] + [[SpanNgram]] − 1 tokens
    * shares a selected fingerprint (coverage property), and every
    * reported run has ≥ [[MinRunTokens]] ≥ that many tokens — so every
    * reported pair is a candidate and the output is IDENTICAL to
    * [[qDedupSubstring]] — same
    * rows, same run statistics (spec-pinned, and the oracle IS the full
    * detector's SQL) — while phase 2's positional-shingle shuffle carries
    * only the candidate documents. On a lightly-duplicated 100 TB corpus
    * that is the difference between shuffling every document's shingles
    * and shuffling the duplicate population's; the probe itself ships
    * ~2/(w+1) of the shingle instances. The left-semi join is keyed on
    * doc_id (broadcast when the candidate set is small, AQE decides).
    *
    * The [[MaxSpanOcc]] boilerplate cap is measured on the FULL corpus
    * (`capFrom`), never the reduced one — see [[substringSpans]]; the
    * cap pass shuffles per-hash partial counts only.
    */
  private[graft] def twoPhaseSpans(
      corpus: DataFrame, candsOpt: Option[DataFrame] = None): DataFrame = {
    val cands = candsOpt.getOrElse(winnowedCandidates(corpus))
    val docs = cands.select(col("doc_a").as("doc_id"))
      .union(cands.select(col("doc_b").as("doc_id")))
      .distinct()
    substringSpans(
      corpus.join(docs, Seq("doc_id"), "left_semi"), capFrom = Some(corpus))
  }

  def qDedupSubstring2P(s: SparkSession, dir: String): DataFrame = {
    // same composition as [[twoPhaseSpans]], but both phases ride the
    // ONE persisted hash-array table ([[sharedSpanHashes]]) instead of
    // re-tokenizing the corpus once for the reduced detector and once
    // for the occurrence cap (r14 plan audit: 9 parquet scans / 5
    // generator passes per evaluation collapsed to reads of the shared
    // frame)
    val cands = sharedWinnowCandidates(s, dir)
    val docs = cands.select(col("doc_a").as("doc_id"))
      .union(cands.select(col("doc_b").as("doc_id")))
      .distinct()
    val hsAll = sharedSpanHashes(s, dir)
    substringSpansHs(
      hsAll.join(docs, Seq("doc_id"), "left_semi"), capHs = Some(hsAll))
  }

  /** Tokens per derived "line" for [[qDedupLines]]. */
  val LineTokens = 10

  /** Line-level exact dedup (the RefinedWeb / CCNet granularity between
    * document-level and span-level): count, per document, how many of its
    * lines also occur verbatim elsewhere in the corpus, and how many would
    * be REMOVED under keep-first-occurrence (their hash first appears in an
    * earlier document). The corpus text has no newlines, so "lines" are
    * derived as fixed-[[LineTokens]]-token chunks — the operator logic is
    * delimiter-agnostic (a real corpus feeds `split(text, '\n')` chunks);
    * the planted tail-copies ([[nearDupDocs]]) share every full chunk with
    * their originals, so cross-doc duplicate lines genuinely exist.
    *
    * Scale shape: chunk + hash row-locally (one pass, 60-bit line hashes),
    * ONE shuffle keyed by the 8-byte hash for the per-hash stats
    * (count-distinct docs, min doc), an equi-join back on that same key
    * (co-partitioned with the agg output — no second Exchange on the big
    * side), then a per-doc count. Line text never shuffles; nothing is
    * quadratic in duplicate count.
    */
  /** (doc_id, line_no, h): derived-line instances of a (doc_id, text)
    * corpus via the one-pass codegen chunker (TokenChunks — the
    * transform(sequence(...), slice) formulation ran an interpreted
    * lambda per chunk and let CollapseProject inline the tokenizer into
    * it, re-splitting the doc once per chunk; measured ~2x on this query
    * at sf0.1). Narrow projections only, so it plans on bounded and
    * unbounded inputs alike — shared by the batch line-dedup queries and
    * the streaming first-claim twin
    * ([[graft.streaming.IncrementalDedup.incrementalLineClaims]]), which
    * therefore hash lines bit-identically.
    */
  private[graft] def lineRows(corpus: DataFrame): DataFrame =
    corpus
      .withColumn("hs", graft.functions.SketchExpressions.md5Prefix60(
        graft.functions.SketchExpressions.tokenChunks(
          tokens(col("text")), LineTokens)))
      .select(col("doc_id"), posexplode(col("hs")).as(Seq("line_no", "h")))

  /** [[lineRows]] with an event-time column carried through, for the
    * retention-bounded streaming twin
    * ([[graft.streaming.IncrementalDedup.incrementalLineClaimsWithRetention]]) —
    * same chunker, same hashes, so stream and batch agree on line identity.
    */
  private[graft] def lineRowsTs(corpus: DataFrame): DataFrame =
    corpus
      .withColumn("hs", graft.functions.SketchExpressions.md5Prefix60(
        graft.functions.SketchExpressions.tokenChunks(
          tokens(col("text")), LineTokens)))
      .select(col("doc_id"), posexplode(col("hs")).as(Seq("line_no", "h")),
        col("ts"))
      .select(col("doc_id"), col("line_no"), col("h"), col("ts"))

  /** Shared persisted (doc_id, line_no, h) line-instance table for the
    * batch line-dedup family ([[qDedupLines]], [[linesKeepCorpus]]):
    * both queries feed the SAME [[lineRows]] frame into a per-hash
    * aggregation AND the join-back side, and Spark shares no uncached
    * subtrees — so without the persist the chunk+md5+posexplode pipeline
    * evaluated twice per pass (the round-6 bench flagged exactly this on
    * `q_dedup_lines`: 1.05 → 2.85 canary units, the same
    * double-evaluation class [[sharedSignatures]] fixed for the MinHash
    * family). At 100 TB the same shape is a line-hash table materialized
    * once and joined from. Memoized per (session, dir) with the same
    * re-persist guard as [[sharedSignatures]] (Bench's cache clears
    * unpersist the frame without evicting the memo entry).
    */
  private val lineRowsCache = new SessionMemo.PersistedDF
  private[graft] def sharedLineRows(s: SparkSession, dir: String): DataFrame =
    lineRowsCache.getOrElseUpdate(s, dir)(lineRows(nearDupDocs(s, dir)))

  def qDedupLines(s: SparkSession, dir: String): DataFrame = {
    val lines = sharedLineRows(s, dir)
    val stats = lines
      .groupBy(col("h"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("min_doc"))
    lines.join(stats, "h")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("n_docs") >= 2, 1L).otherwise(0L)).as("n_dup_lines"),
        sum(when(col("min_doc") < col("doc_id"), 1L).otherwise(0L))
          .as("n_foreign_lines"))
      .orderBy(col("doc_id"))
  }

  /** Line-level dedup as a TRANSFORM (the action [[qDedupLines]] only
    * measures): drop every duplicate line occurrence except the global
    * first (CCNet keep-first at line granularity — later docs lose lines
    * an earlier doc already contributed, and within-doc repeats keep only
    * their first instance), then rebuild each document from its surviving
    * lines. Output: per doc, line counts and the md5 of the cleaned text —
    * the rewritten corpus, verifiable cross-engine without shipping text.
    *
    * Scale shape: the global-first resolution shuffles ONLY (doc_id,
    * line_no, h) keyed by the 8-byte hash — first occurrence is
    * min(doc_id·2³² + line_no), a single exact BIGINT agg. Kept positions
    * come back as one bounded array per doc (≤ lines-per-doc), and the
    * rebuild joins that against the corpus on doc_id and re-chunks
    * ROW-LOCALLY — line text never rides a shuffle keyed by anything but
    * its own doc_id.
    */
  private[graft] def linesKeepCorpus(s: SparkSession, dir: String): DataFrame = {
    val corpus = nearDupDocs(s, dir)
    val chunks = graft.functions.SketchExpressions.tokenChunks(
      tokens(col("text")), LineTokens)
    val linesH = sharedLineRows(s, dir)
      // line_no < 2³² always (it is bounded by doc token count), so the
      // packed key is exact and min() picks (min doc, then min line)
      .withColumn("inst", col("doc_id") * lit(1L << 32) + col("line_no"))
    val first = linesH.groupBy(col("h")).agg(min(col("inst")).as("first_inst"))
    val keptPos = linesH.join(first, "h")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sort_array(collect_list(
          when(col("inst") === col("first_inst"), col("line_no"))))
          .as("kept"))
    corpus
      .join(keptPos, "doc_id")
      .select(
        col("doc_id"),
        col("n_lines"),
        size(col("kept")).cast("long").as("n_kept"),
        // lambda-free gather: chunks and kept each evaluate exactly once
        array_join(graft.functions.SketchExpressions.elementsAt(
          chunks, col("kept")), " ").as("clean_text"))
  }

  /** Boilerplate document-frequency threshold: a line in MORE than this
    * many distinct documents is template/boilerplate (the corpus'
    * organic df mass sits at 1–8; the planted template lines run 44–61).
    */
  val BoilerplateDf = 10L

  /** BOILERPLATE line removal (the CCNet/RefinedWeb line-level filter,
    * Wenzek 2020 §4.1) — distinct from [[qDedupLinesKeep]]'s keep-FIRST:
    * a line whose document frequency exceeds [[BoilerplateDf]] is
    * navigation/template mass and is dropped from EVERY document,
    * including its first occurrence. Shape: the df aggregation runs over
    * the same memoized [[sharedLineRows]] table; the boilerplate hash
    * set is bounded by |corpus lines| / df-threshold (tiny — at most
    * n_lines/10 here, in practice a few template lines), so the removal
    * is a broadcast anti-join at line level and the text rebuild is the
    * [[linesKeepCorpus]] lambda-free gather. One df shuffle over
    * already-persisted hashes; text never rides an Exchange.
    */
  def qBoilerplate(s: SparkSession, dir: String): DataFrame = {
    val corpus = nearDupDocs(s, dir)
    val chunks = graft.functions.SketchExpressions.tokenChunks(
      tokens(col("text")), LineTokens)
    val linesH = sharedLineRows(s, dir)
    val bp = linesH.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") > BoilerplateDf)
      .select(col("h"))
    // ONE aggregation over the persisted line rows (r14): the previous
    // keptPos/counts pair ran two groupBy(doc_id) passes (one over the
    // anti-joined frame, one over the raw frame) plus a second corpus
    // join; a broadcast MARKING join + null-skipping collect_list (the
    // linesKeepCorpus trick) produces both columns in one pass — a doc
    // whose every line is boilerplate gets an EMPTY kept list from the
    // all-null collect, exactly what the old left-join + coalesce
    // produced.
    val perDoc = linesH
      .join(broadcast(bp.withColumn("is_bp", lit(1))), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sort_array(collect_list(
          when(col("is_bp").isNull, col("line_no")))).as("kept"))
    corpus
      .join(perDoc, "doc_id")
      .select(
        col("doc_id"),
        col("n_lines"),
        (col("n_lines") - size(col("kept")).cast("long")).as("n_removed"),
        md5(array_join(graft.functions.SketchExpressions.elementsAt(
          chunks, col("kept")), " ")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  /** [[linesKeepCorpus]] reported as md5 — the rewritten corpus verified
    * cross-engine without shipping text; the curated-corpus export sink
    * ([[graft.sources.Export]]) writes the text itself.
    */
  def qDedupLinesKeep(s: SparkSession, dir: String): DataFrame =
    linesKeepCorpus(s, dir)
      .select(
        col("doc_id"),
        col("n_lines"),
        col("n_kept"),
        md5(col("clean_text")).as("clean_md5"))
      .orderBy(col("doc_id"))

  /** Cross-source shingle-overlap matrix — the corpus-composition mirror
    * of [[qDecontaminate]]: for every source pair, how many DISTINCT
    * 3-gram shingles they share, plus each side's distinct-shingle count
    * and the resulting Jaccard. Source pairs with high overlap are
    * mirror/syndication candidates: corpus builders use exactly this to
    * decide which source to drop wholesale before paying for pairwise
    * document dedup.
    *
    * Scale shape: one explode → one distinct on (source, 8-byte hash) —
    * corpus-linear; then a groupBy(h) whose per-group membership list is
    * bounded by |sources| (not corpus size), pair expansion via the
    * [[minhashCandidates]] in-bucket combination trick (no self-join: the
    * shingle table is computed and shuffled ONCE), and a |sources|²-sized
    * aggregate joined against the broadcast per-source totals. Zero
    * quadratic term in documents anywhere.
    */
  def qSourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(s, dir)
      .select(col("source"), explode(
        graft.functions.SketchExpressions.md5Prefix60(
          graft.functions.SketchExpressions.wordNGrams(tokens(col("text")), 3)))
        .as("h"))
      .distinct()
    val perSource = sh.groupBy(col("source")).agg(count(lit(1)).as("n"))
    sh
      .groupBy(col("h"))
      .agg(sort_array(collect_set(col("source"))).as("ss"))
      .filter(size(col("ss")) > 1)
      .select(explode(flatten(transform(col("ss"), (a, i) =>
        transform(slice(col("ss"), i + 2, size(col("ss"))), b =>
          struct(a.as("s1"), b.as("s2")))))).as("p"))
      .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
      .agg(count(lit(1)).as("n_shared"))
      // two broadcast legs, alias-only difference: their canonicalized
      // plans are equal, so ReusedExchange evaluates perSource ONCE at
      // runtime (r14 audit: an explode/re-aggregate melt was tried here
      // and measured ~20% SLOWER — the reuse was already doing the work)
      .join(broadcast(perSource.select(
        col("source").as("s1"), col("n").as("n_s1"))), "s1")
      .join(broadcast(perSource.select(
        col("source").as("s2"), col("n").as("n_s2"))), "s2")
      .select(col("s1"), col("s2"), col("n_shared"), col("n_s1"), col("n_s2"),
        round(col("n_shared").cast("double") /
          (col("n_s1") + col("n_s2") - col("n_shared")), 9).as("jaccard"))
      .orderBy(col("s1"), col("s2"))
  }

  /** Winnowing window: fingerprints per expected (w+1)/2 grams. */
  val WinnowWindow = 4

  /** Winnowing fingerprint selection stats per document
    * ([[graft.functions.WinnowedPositions]] — Schleimer et al. SIGMOD'03):
    * how many of each doc's positional [[SpanNgram]]-gram hashes the
    * rightmost-min rule selects, and the selection density (expected
    * 2/(w+1)). The selected set is the sub-linear substring-dedup index:
    * any shared span of ≥ w + k − 1 tokens shares a selected fingerprint,
    * so at 100 TB the span detector ([[qDedupSubstring]]) probes selected
    * fingerprints only — a ~2/(w+1) shuffle-volume cut with a proven
    * guarantee instead of sampling. Pure map stage: the hash array and its
    * selection are row-local; no shuffle at any corpus size.
    */
  def qWinnow(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("hs", graft.functions.SketchExpressions.md5Prefix60(
        graft.functions.SketchExpressions.wordNGrams(
          tokens(col("text")), SpanNgram, distinct = false)))
      .select(col("doc_id"), size(col("hs")).as("n_grams"),
        size(graft.functions.SketchExpressions.winnowedPositions(
          col("hs"), WinnowWindow)).as("n_selected"))
      .filter(col("n_grams") >= WinnowWindow)
      .select(col("doc_id"),
        col("n_grams").cast("long").as("n_grams"),
        col("n_selected").cast("long").as("n_selected"),
        round(col("n_selected").cast("double") / col("n_grams"), 9)
          .as("density"))
      .orderBy(col("doc_id"))

  // ------------------------------------------------------------------
  // Right-to-be-forgotten cascade audit
  // ------------------------------------------------------------------

  /** Synthetic deletion request: every doc/vec with id ≡ 7 (mod 131)
    * (~0.76% of the corpus — the per-batch scale of real takedown and
    * GDPR/CCPA erasure queues).
    */
  val DeleteMod = 131L
  val DeleteResidue = 7L

  /** Deletion-propagation ledger — the audit artifact an erasure run
    * must produce: for the base table AND every derived artifact that
    * embeds document identity (the line-hash index, the chunk inventory,
    * the embedding index), the row mass before, removed by the cascade,
    * and after. A deletion that only touches `documents` silently leaves
    * the derived indexes re-identifying the erased docs — exactly what
    * this ledger makes visible (n_deleted > 0 on every artifact).
    *
    * Scale shape: each artifact contributes ONE aggregation over a frame
    * the engine already maintains — the memoized [[sharedLineRows]]
    * table, a row-local chunk count, the embeddings scan — so the audit
    * is corpus-linear with no new joins; the erasure predicate is a
    * row-local id test on every artifact (no delete-list broadcast
    * needed for a rule-shaped request; a list-shaped request would make
    * each `pred` a broadcast semi-join, nothing else changes).
    */
  def qDeleteCascade(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Column
    def delPred(id: Column): Column = id % DeleteMod === DeleteResidue
    def ledger(name: String, df: DataFrame, pred: Column, weight: Column) =
      df.agg(
        sum(weight).as("n_before"),
        sum(when(pred, weight).otherwise(0L)).as("n_deleted"))
        .select(lit(name).as("artifact"),
          col("n_before"), col("n_deleted"),
          (col("n_before") - col("n_deleted")).as("n_after"))
    val docs = Tables.documents(s, dir)
    val tk = tokens(col("text"))
    val chunkCounts = docs.select(col("doc_id"),
      size(graft.functions.SketchExpressions.tokenChunksStrided(
        tk, TextAnalysis.ChunkWidth, TextAnalysis.ChunkStride))
        .cast("long").as("w"))
    ledger("documents", docs.select(col("doc_id")),
      delPred(col("doc_id")), lit(1L))
      .unionByName(ledger("line_index", sharedLineRows(s, dir),
        delPred(col("doc_id")), lit(1L)))
      .unionByName(ledger("chunk_index", chunkCounts,
        delPred(col("doc_id")), col("w")))
      .unionByName(ledger("embedding_index",
        Tables.embeddings(s, dir).select(col("vec_id")),
        delPred(col("vec_id")), lit(1L)))
      .orderBy(col("artifact"))
  }

  // ------------------------------------------------------------------
  // LIST-shaped erasure: content-addressed takedown manifest
  // ------------------------------------------------------------------

  /** Takedown-manifest modulus: the manifest carries the CONTENT hashes
    * (md5 of text) of base docs with id ≡ 11 (mod 173) — a list-shaped
    * request, unlike [[qDeleteCascade]]'s rule-shaped id predicate.
    */
  val DeleteListMod = 173L
  val DeleteListResidue = 11L

  /** (doc_id, fpn, del) over the planted corpus: del marks membership in
    * the content-addressed takedown manifest (broadcast hash join on
    * md5(text) — the manifest is request-scale, thousands of rows at any
    * corpus size). Memoized per (session, dir): three ledger legs below
    * consume it, and md5 + norm-fingerprint over the 3N-row planted
    * corpus must evaluate once, not three times (Spark shares no
    * uncached subtrees — the q_dedup_lines round-6 lesson).
    */
  private val markedErasureCache = new SessionMemo.PersistedDF
  private def markedErasure(s: SparkSession, dir: String): DataFrame =
    markedErasureCache.getOrElseUpdate(s, dir) {
      val manifest = Tables.documents(s, dir)
        .filter(col("doc_id") % DeleteListMod === DeleteListResidue)
        .select(md5(col("text")).as("del_md5")).distinct()
      plantedDocs(s, dir)
        .select(col("doc_id"), md5(col("text")).as("m"),
          TextFunctions.normFingerprint(col("text")).as("fpn"))
        .join(broadcast(manifest), col("m") === col("del_md5"), "left_outer")
        .select(col("doc_id"), col("fpn"),
          col("del_md5").isNotNull.as("del"))
    }

  /** Erasure by takedown LIST, content-addressed: delete every corpus doc
    * whose md5(text) appears in the manifest — which catches the
    * byte-identical planted copies the id rule misses (their ids are
    * base + [[PlantOffset]]; no arithmetic predicate finds them) — then
    * cascade the RESOLVED id set into the embedding index, and audit the
    * residual: surviving docs (the token-permuted copies) whose
    * normalization-invariant fingerprint still matches erased content.
    * Ledger rows: `documents` (content join), `embedding_index`
    * (resolved-id broadcast semi-join), `norm_residual` (n_before =
    * survivors, n_deleted = at-risk survivors, n_after = clean) — the
    * receipt that exact-content erasure is NOT closure under paraphrase,
    * quantified. Every join side that isn't the corpus is request-scale
    * and broadcast; the corpus is scanned once per leg off the memoized
    * marked frame.
    */
  def qDeleteList(s: SparkSession, dir: String): DataFrame = {
    val marked = markedErasure(s, dir)
    val docsLedger = marked.agg(
      count(lit(1)).as("n_before"),
      sum(when(col("del"), 1L).otherwise(0L)).as("n_deleted"))
      .select(lit("documents").as("artifact"), col("n_before"),
        col("n_deleted"), (col("n_before") - col("n_deleted")).as("n_after"))
    val delIds = marked.filter(col("del")).select(col("doc_id"))
    val embLedger = Tables.embeddings(s, dir).select(col("vec_id"))
      .join(broadcast(delIds), col("vec_id") === col("doc_id"), "left_outer")
      .agg(count(lit(1)).as("n_before"),
        sum(when(col("doc_id").isNotNull, 1L).otherwise(0L)).as("n_deleted"))
      .select(lit("embedding_index").as("artifact"), col("n_before"),
        col("n_deleted"), (col("n_before") - col("n_deleted")).as("n_after"))
    val delFpn = marked.filter(col("del")).select(col("fpn")).distinct()
    val resLedger = marked.filter(!col("del"))
      .join(broadcast(delFpn.withColumnRenamed("fpn", "del_fpn")),
        col("fpn") === col("del_fpn"), "left_outer")
      .agg(count(lit(1)).as("n_before"),
        sum(when(col("del_fpn").isNotNull, 1L).otherwise(0L)).as("n_deleted"))
      .select(lit("norm_residual").as("artifact"), col("n_before"),
        col("n_deleted"), (col("n_before") - col("n_deleted")).as("n_after"))
    docsLedger.unionByName(embLedger).unionByName(resLedger)
      .orderBy(col("artifact"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_recall" -> qDedupRecall,
    "q_dedup_minhash_dfkill" -> qDedupMinhashDfkill,
    "q_dedup_dfkill_wide" -> qDedupDfkillWide,
    "q_dedup_pr_curve" -> qDedupPrCurve,
    "q_lsh_bands" -> qLshBands,
    "q_delete_list" -> qDeleteList,
    "q_delete_cascade" -> qDeleteCascade,
    "q_winnow" -> qWinnow,
    "q_dedup_substring_win" -> qDedupSubstringWin,
    "q_dedup_substring_2p" -> qDedupSubstring2P,
    "q_source_overlap" -> qSourceOverlap,
    "q_decontaminate" -> qDecontaminate,
    "q_dedup_lines" -> qDedupLines,
    "q_dedup_lines_keep" -> qDedupLinesKeep,
    "q_boilerplate" -> qBoilerplate,
    "q_dedup_substring" -> qDedupSubstring,
    "q_dedup_exact" -> qDedupExact,
    "q_dedup_clusters" -> qDedupClusters,
    "q_dedup_cluster_hist" -> qDedupClusterHist,
    "q_dedup_keep" -> qDedupKeep,
    "q_dedup_keep_best" -> qDedupKeepBest,
    "q_dedup_pipeline" -> qDedupPipeline,
    "q_split_leakage" -> qSplitLeakage,
    "q_dedup_jaccard" -> qDedupJaccard,
    "q_containment" -> qContainment,
    "q_containment_e2e" -> qContainmentE2e,
    "q_dedup_minhash" -> (qDedupMinhash(_, _)),
    "q_dedup_minhash_wide" -> qDedupMinhashWide,
    "q_simjoin" -> qSimjoin,
    "q_dedup_simhash" -> qDedupSimhash,
    "q_hamming_search" -> qHammingSearch,
    "q_dedup_embedding" -> qDedupEmbedding
  )

  // ---------------------------------------------------------- oracle SQL

  private val toks =
    "list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> length(x) > 0)"

  /** DuckDB mirror of the POSITIONAL (non-distinct, in-order) n-gram list —
    * the [[qDedupSubstring]] shingle unit, where list index = token
    * position. No list_distinct: position alignment is the payload.
    */
  private def posShinglesSql(t: String, n: Int): String = {
    val gram = (1 to n).map(j => s"$t[i+$j]").mkString(" || ' ' || ")
    s"""CASE WHEN len($t) >= $n
       | THEN list_transform(range(0, len($t) - ${n - 1}),
       |        i -> $gram)
       | ELSE [] END""".stripMargin
  }

  /** The winnowed-candidate derivation over the spliced corpus as a WITH
    * chain ending in `cand(doc_a, doc_b, n_shared_fp)` — shared verbatim
    * by the probe census (`q_dedup_substring_win`) and the end-to-end
    * containment composition (`q_containment_e2e`), so the probe
    * definition lives in exactly one SQL string.
    */
  private lazy val winnowCandCte =
    s"""WITH tkt AS (SELECT doc_id, $toks AS tk FROM documents),
       |corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT a.doc_id + $SpliceOffset AS doc_id,
       |    array_to_string(list_concat(a.tk[1:$SpliceLen], b.tk[1:$SpliceLen]), ' ') AS text
       |  FROM tkt a JOIN tkt b ON b.doc_id = a.doc_id + 1),
       |hsd AS (SELECT doc_id,
       |  list_transform(${posShinglesSql(toks, SpanNgram)},
       |    x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS hs
       |  FROM corpus),
       |sel AS (
       |  SELECT doc_id, hs,
       |    list_distinct(list_transform(range(0, len(hs) - $WinnowWindow + 1),
       |      i -> i + $WinnowWindow - list_position(
       |             list_reverse(hs[i+1 : i+$WinnowWindow]),
       |             list_aggregate(hs[i+1 : i+$WinnowWindow], 'min')))) AS sp
       |  FROM hsd WHERE len(hs) >= $WinnowWindow),
       |fp AS (SELECT DISTINCT doc_id, h FROM (
       |  SELECT doc_id, unnest(list_transform(sp, p -> hs[p+1])) AS h
       |  FROM sel)),
       |ok AS (SELECT h FROM fp GROUP BY h
       |       HAVING count(*) > 1 AND count(*) <= $MaxSpanOcc),
       |cand AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_fp
       |  FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
       |  JOIN ok ON ok.h = a.h
       |  GROUP BY 1, 2)""".stripMargin

  /** DuckDB mirror of [[withShingles]] given a tokens list expression. */
  private def shinglesSql(t: String, n: Int = 3): String = {
    val gram = (1 to n).map(j => s"$t[i+$j]").mkString(" || ' ' || ")
    s"""list_distinct(CASE WHEN len($t) >= $n
       | THEN list_transform(range(0, len($t) - ${n - 1}),
       |        i -> $gram)
       | ELSE [] END)""".stripMargin
  }

  private val plantedSql =
    s"""SELECT doc_id, text FROM documents
       |UNION ALL SELECT doc_id + $PlantOffset, text FROM documents
       |UNION ALL SELECT doc_id + $PermuteOffset,
       |  array_to_string(list_reverse(string_split_regex(text, '\\s+')), ' ')
       |FROM documents""".stripMargin

  /** Shared CTE chain of the line-dedup TRANSFORM oracle, ending in
    * `doc(doc_id, n_lines, n_kept, clean_text)` — the single source of
    * truth for the [[qDedupLinesKeep]] oracle and the export-sink manifest
    * oracle ([[graft.sources.Export]]): both verify against the SAME
    * rewritten corpus definition.
    */
  private[graft] def linesKeepSqlCtes: String =
    s"""corpus AS ($nearDupSql),
       |tkt AS (SELECT doc_id, $toks AS tk FROM corpus),
       |ln AS (SELECT doc_id, tk,
       |  list_transform(range(0, (len(tk) + ${LineTokens - 1}) // $LineTokens),
       |    i -> ('0x' || substr(md5(
       |      array_to_string(tk[i*$LineTokens+1 : i*$LineTokens+$LineTokens], ' ')
       |    ), 1, 15))::BIGINT) AS hs
       |  FROM tkt),
       |ph0 AS (SELECT doc_id, unnest(range(0, len(hs))) AS pos, hs FROM ln),
       |ph AS (SELECT doc_id, CAST(pos AS BIGINT) AS line_no, hs[pos+1] AS h,
       |       doc_id * ${1L << 32} + pos AS inst FROM ph0),
       |fi AS (SELECT h, min(inst) AS first_inst FROM ph GROUP BY h),
       |kp AS (SELECT doc_id, count(*) AS n_lines,
       |  coalesce(list_sort(list(line_no) FILTER (WHERE inst = first_inst)), [])
       |    AS kept
       |  FROM ph JOIN fi USING (h) GROUP BY doc_id),
       |doc AS (SELECT k.doc_id, k.n_lines,
       |  CAST(len(k.kept) AS BIGINT) AS n_kept,
       |  coalesce(array_to_string(list_transform(k.kept,
       |    i -> array_to_string(
       |      t.tk[i*$LineTokens+1 : i*$LineTokens+$LineTokens], ' ')), ' '), '')
       |    AS clean_text
       |  FROM kp k JOIN tkt t USING (doc_id))""".stripMargin

  private val nearDupSql =
    s"""SELECT doc_id, text FROM documents
       |UNION ALL SELECT doc_id + $PlantOffset, text || '$Tail' FROM documents""".stripMargin

  private val normFpSql =
    """md5(array_to_string(list_sort(list_distinct(
      |  list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> length(x) > 0))), ' '))""".stripMargin

  /** The MinHash CTE chain (corpus → signatures → bands → capped candidate
    * pairs), shared verbatim by the q_dedup_minhash and q_dedup_pipeline
    * oracles — same construction as the Spark side's
    * [[withHashedShingles]] → [[minhashBanded]] → [[minhashCandidates]].
    */
  /** corpus→sig prefix of [[minhashCteChain]] — shared with the
    * [[qLshBands]] oracle, which regroups the same `sig` columns under
    * every banding scheme.
    */
  /** The affine m0..m15 signature columns over an `hs` hash-list column —
    * shared by [[minhashSigCtes]] and the df-kill oracle (which signs a
    * FILTERED hs).
    */
  private def sigColsSql: String = {
    import graft.functions.Sketches
    (0 until NumHashes)
      .map(k => s"list_min(list_transform(hs, h -> " +
        s"((${Sketches.a(k)} * (h % ${Sketches.Prime}) + ${Sketches.b(k)}) % ${Sketches.Prime}))) AS m$k")
      .mkString(",\n  ")
  }

  /** corpus→hsd prefix of [[minhashSigCtes]] — the tokenize/shingle/hash
    * chain without the signature, so the df-kill oracle can filter hs
    * before signing.
    */
  private def minhashHsdCtes: String =
    s"""corpus AS ($nearDupSql),
       |shd AS (SELECT doc_id, ${shinglesSql(toks)} AS sh FROM corpus),
       |hsd AS (SELECT doc_id, sh,
       |  list_transform(sh, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS hs
       |  FROM shd)""".stripMargin

  private def minhashSigCtes: String =
    s"""$minhashHsdCtes,
       |sig AS (SELECT doc_id, $sigColsSql FROM hsd WHERE len(sh) > 0)""".stripMargin

  /** banded→cand suffix of [[minhashCteChain]] for an arbitrary
    * (rowsPerBand, nBands) regrouping of `sig`; `sfx` suffixes the CTE
    * names so the [[qLshBands]] oracle can instantiate all four schemes
    * in one statement.
    */
  private def bandCandCtes(rows: Int, nBands: Int, sfx: String): String = {
    val bandRows = (0 until nBands)
      .map { b =>
        val ms = (0 until rows).map(r => s"m${b * rows + r}").mkString(", ")
        s"SELECT doc_id, $b AS band_idx, md5(concat_ws(',', $ms)) AS band_key FROM sig"
      }
      .mkString("\nUNION ALL\n")
    s"""banded$sfx AS ($bandRows),
       |ok_buckets$sfx AS (
       |  SELECT band_idx, band_key FROM banded$sfx
       |  GROUP BY band_idx, band_key
       |  HAVING count(*) > 1 AND count(*) <= $MaxLshBucket),
       |cand$sfx AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_bands
       |  FROM banded$sfx a JOIN banded$sfx b
       |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |   AND a.doc_id < b.doc_id
       |  JOIN ok_buckets$sfx ok
       |    ON ok.band_idx = a.band_idx AND ok.band_key = a.band_key
       |  GROUP BY a.doc_id, b.doc_id)""".stripMargin
  }

  private def minhashCteChain: String = minhashCteChainAt(RowsPerBand)

  /** [[minhashCteChain]] at an arbitrary band geometry — shared by the
    * default and wide-band minhash oracles.
    */
  private def minhashCteChainAt(rows: Int): String =
    s"""$minhashSigCtes,
       |${bandCandCtes(rows, NumHashes / rows, "")}""".stripMargin

  /** DuckDB twin of [[verifiedPairs]] given the [[minhashCteChain]] CTEs —
    * shared by the q_dedup_pipeline and q_split_leakage oracles.
    */
  private def verifiedCte: String =
    s"""verified AS (
       |  SELECT src, dst FROM (
       |    SELECT doc_a AS src, doc_b AS dst,
       |      CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
       |        / len(list_distinct(list_concat(sa.hs, sb.hs))) AS j
       |    FROM cand
       |    JOIN hsd sa ON sa.doc_id = doc_a
       |    JOIN hsd sb ON sb.doc_id = doc_b)
       |  WHERE j >= $JaccardThreshold)""".stripMargin

  /** Canonical-fingerprint adjacent-pair edges + min-label closure CTEs
    * (ending in `comp(id, component)`), shared by the q_dedup_clusters and
    * q_dedup_keep oracles — the SQL twin of [[canonicalEdges]] +
    * [[ConnectedComponents]].
    */
  private def closureCtes: String =
    s"""corpus AS ($plantedSql),
       |fp AS (SELECT doc_id, $normFpSql AS fp_norm FROM corpus),
       |grp AS (SELECT fp_norm, list_sort(list(doc_id)) AS ids
       |        FROM fp GROUP BY fp_norm HAVING count(*) > 1),
       |idx AS (SELECT ids, unnest(range(1, len(ids))) AS i FROM grp),
       |edges AS (SELECT ids[i] AS src, ids[i+1] AS dst FROM idx),
       |sym AS (SELECT src, dst FROM edges
       |        UNION SELECT dst AS src, src AS dst FROM edges),
       |nodes AS (SELECT DISTINCT src AS id FROM sym),
       |reach AS (
       |  SELECT id, id AS label FROM nodes
       |  UNION
       |  SELECT e.dst AS id, r.label
       |  FROM reach r JOIN sym e ON e.src = r.id),
       |comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id)""".stripMargin

  /** The span-detector oracle — shared verbatim by q_dedup_substring and
    * q_dedup_substring_2p (the two-phase contract is bit-equality).
    */
  private lazy val substringOracle: String =
    s"""WITH tkt AS (SELECT doc_id, $toks AS tk FROM documents),
       |corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT a.doc_id + $SpliceOffset AS doc_id,
       |    array_to_string(list_concat(a.tk[1:$SpliceLen], b.tk[1:$SpliceLen]), ' ') AS text
       |  FROM tkt a JOIN tkt b ON b.doc_id = a.doc_id + 1),
       |hsd AS (SELECT doc_id,
       |  list_transform(${posShinglesSql(toks, SpanNgram)},
       |    x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS hs
       |  FROM corpus),
       |ph0 AS (SELECT doc_id, unnest(range(0, len(hs))) AS pos, hs FROM hsd),
       |ph AS (SELECT doc_id, pos, hs[pos+1] AS h FROM ph0),
       |ok AS (SELECT h FROM ph GROUP BY h
       |       HAVING count(*) > 1 AND count(*) <= $MaxSpanOcc),
       |m AS (
       |  SELECT a.doc_id AS doc_a, a.pos AS pos_a,
       |         b.doc_id AS doc_b, b.pos AS pos_b
       |  FROM ph a JOIN ph b ON a.h = b.h AND a.doc_id < b.doc_id
       |  JOIN ok ON ok.h = a.h),
       |runs AS (
       |  SELECT doc_a, doc_b, pos_a - pos_b AS diag, pos_a,
       |    pos_a - row_number() OVER (
       |      PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a) AS island
       |  FROM m),
       |ragg AS (
       |  SELECT doc_a, doc_b, count(*) + ${SpanNgram - 1} AS run_tokens
       |  FROM runs GROUP BY doc_a, doc_b, diag, island
       |  HAVING count(*) + ${SpanNgram - 1} >= $MinRunTokens)
       |SELECT doc_a, doc_b, count(*) AS n_runs,
       |  CAST(max(run_tokens) AS BIGINT) AS max_run_tokens,
       |  CAST(sum(run_tokens) AS BIGINT) AS matched_tokens
       |FROM ragg GROUP BY doc_a, doc_b ORDER BY doc_a, doc_b""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_winnow" ->
      s"""WITH g AS (
         |  SELECT doc_id, list_transform(${posShinglesSql(toks, SpanNgram)},
         |    x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS hs
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, len(hs) AS n_grams,
         |    len(list_distinct(list_transform(range(0, len(hs) - $WinnowWindow + 1),
         |      i -> i + $WinnowWindow - list_position(
         |             list_reverse(hs[i+1 : i+$WinnowWindow]),
         |             list_aggregate(hs[i+1 : i+$WinnowWindow], 'min')))))
         |      AS n_selected
         |  FROM g WHERE len(hs) >= $WinnowWindow)
         |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
         |  CAST(n_selected AS BIGINT) AS n_selected,
         |  round(CAST(n_selected AS DOUBLE) / n_grams, 9) AS density
         |FROM s ORDER BY doc_id""".stripMargin,
    "q_dedup_substring_win" ->
      s"""$winnowCandCte
         |SELECT doc_a, doc_b, n_shared_fp FROM cand
         |ORDER BY doc_a, doc_b""".stripMargin,
    // the winnowed candidate chain verbatim, composed with the Broder
    // containment scorer over the same spliced corpus
    "q_containment_e2e" ->
      s"""$winnowCandCte,
         |sh AS (SELECT doc_id, ${shinglesSql(toks)} AS sh FROM corpus),
         |j AS (
         |  SELECT c.doc_a, c.doc_b, c.n_shared_fp,
         |    len(a.sh) AS n_a, len(b.sh) AS n_b,
         |    len(list_intersect(a.sh, b.sh)) AS n_common
         |  FROM cand c
         |  JOIN sh a ON a.doc_id = c.doc_a
         |  JOIN sh b ON b.doc_id = c.doc_b
         |  WHERE len(a.sh) > 0 AND len(b.sh) > 0)
         |SELECT doc_a, doc_b, n_shared_fp,
         |  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
         |  CAST(n_common AS BIGINT) AS n_common,
         |  CAST(n_common AS DOUBLE) / n_a AS cont_ab,
         |  CAST(n_common AS DOUBLE) / n_b AS cont_ba,
         |  CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) AS jaccard
         |FROM j ORDER BY doc_a, doc_b""".stripMargin,
    "q_source_overlap" ->
      s"""WITH sh AS (
         |  SELECT DISTINCT source, h FROM (
         |    SELECT source, unnest(list_transform(${shinglesSql(toks)},
         |      x -> ('0x' || substr(md5(x), 1, 15))::BIGINT)) AS h
         |    FROM documents)),
         |ps AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
         |pr AS (
         |  SELECT a.source AS s1, b.source AS s2, count(*) AS n_shared
         |  FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT s1, s2, n_shared, p1.n AS n_s1, p2.n AS n_s2,
         |  round(CAST(n_shared AS DOUBLE) / (p1.n + p2.n - n_shared), 9)
         |    AS jaccard
         |FROM pr JOIN ps p1 ON pr.s1 = p1.source
         |        JOIN ps p2 ON pr.s2 = p2.source
         |ORDER BY s1, s2""".stripMargin,
    "q_decontaminate" ->
      s"""WITH eval AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % $EvalMod = 0),
         |train AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % $EvalMod <> 0
         |  UNION ALL
         |  SELECT doc_id + $PlantOffset, text || '$Tail' FROM eval),
         |esh AS (
         |  SELECT DISTINCT unnest(list_transform(${shinglesSql(toks, ContamNgram)},
         |    x -> ('0x' || substr(md5(x), 1, 15))::BIGINT)) AS h
         |  FROM eval),
         |tsh AS (
         |  SELECT doc_id, list_transform(${shinglesSql(toks, ContamNgram)},
         |    x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS hs
         |  FROM train),
         |tr AS (SELECT doc_id, len(hs) AS n_shingles, unnest(hs) AS h FROM tsh)
         |SELECT tr.doc_id, n_shingles, count(*) AS n_shared,
         |  CAST(count(*) AS DOUBLE) / n_shingles AS overlap
         |FROM tr JOIN esh USING (h)
         |GROUP BY tr.doc_id, n_shingles
         |HAVING count(*) >= $ContamMinShared
         |ORDER BY doc_id""".stripMargin,
    "q_dedup_substring" -> substringOracle,
    // the two-phase detector's CONTRACT is bit-equality with the full
    // one (coverage guarantee; also spec-pinned) — same oracle
    "q_dedup_substring_2p" -> substringOracle,
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE $closureCtes
         |SELECT component AS canonical_id, count(*) AS n_members,
         |  array_to_string(list_sort(list(id)), ',') AS members
         |FROM comp GROUP BY component ORDER BY canonical_id""".stripMargin,
    "q_dedup_cluster_hist" ->
      s"""WITH RECURSIVE $closureCtes,
         |sz AS (SELECT component, count(*) AS sz FROM comp GROUP BY component)
         |SELECT CAST(sz AS BIGINT) AS cluster_size,
         |  count(*) AS n_clusters,
         |  CAST(sum(sz) AS BIGINT) AS n_docs
         |FROM sz GROUP BY sz ORDER BY cluster_size""".stripMargin,
    "q_dedup_keep_best" ->
      s"""WITH RECURSIVE $closureCtes,
         |qd AS (SELECT doc_id, ${TextAnalysis.qualitySqlExpr} AS q
         |       FROM corpus),
         |j AS (SELECT c.component, c.id, qd.q
         |      FROM comp c JOIN qd ON qd.doc_id = c.id),
         |r AS (SELECT component, id, q,
         |        row_number() OVER (PARTITION BY component
         |                           ORDER BY q DESC, id ASC) AS rk,
         |        count(*) OVER (PARTITION BY component) AS nm
         |      FROM j)
         |SELECT component AS canonical_id, id AS best_id, q AS best_quality,
         |  CAST(nm AS BIGINT) AS n_members
         |FROM r WHERE rk = 1 ORDER BY canonical_id""".stripMargin,
    "q_dedup_keep" ->
      s"""WITH RECURSIVE $closureCtes,
         |agg AS (SELECT count(*) AS n_in_clusters,
         |               count(DISTINCT component) AS n_clusters FROM comp),
         |tot AS (SELECT count(*) AS n_total FROM corpus)
         |SELECT n_total, n_in_clusters, n_clusters,
         |  n_total - n_in_clusters + n_clusters AS n_kept,
         |  n_in_clusters - n_clusters AS n_dropped
         |FROM tot, agg""".stripMargin,
    "q_dedup_recall" ->
      s"""WITH $minhashCteChain,
         |jc AS (SELECT doc_a, doc_b,
         |    CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
         |      / len(list_distinct(list_concat(sa.hs, sb.hs))) AS j
         |  FROM cand
         |  JOIN hsd sa ON sa.doc_id = doc_a
         |  JOIN hsd sb ON sb.doc_id = doc_b),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n_cand,
         |    CAST(sum(CASE WHEN doc_b = doc_a + $PlantOffset
         |      AND doc_a < $PlantOffset THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_cand_hit,
         |    CAST(sum(CASE WHEN j >= $JaccardThreshold THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_verified,
         |    CAST(sum(CASE WHEN j >= $JaccardThreshold
         |      AND doc_b = doc_a + $PlantOffset AND doc_a < $PlantOffset
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_ver_hit
         |  FROM jc),
         |el AS (SELECT doc_id FROM hsd WHERE len(sh) > 0),
         |tr AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM el a
         |  WHERE a.doc_id < $PlantOffset AND EXISTS
         |    (SELECT 1 FROM el b WHERE b.doc_id = a.doc_id + $PlantOffset))
         |SELECT n_true, n_cand, n_cand_hit, n_verified, n_ver_hit,
         |  CAST(n_cand_hit AS DOUBLE) / CAST(n_true AS DOUBLE) AS lsh_recall,
         |  CAST(n_ver_hit AS DOUBLE) / CAST(n_true AS DOUBLE) AS e2e_recall,
         |  CAST(n_ver_hit AS DOUBLE) / CAST(n_verified AS DOUBLE)
         |    AS truth_precision
         |FROM st CROSS JOIN tr""".stripMargin,
    // same chain as q_dedup_recall with the >2%-df template shingles
    // killed BEFORE signing (df·denom > n_corpus, exact integers); the
    // banding/verify suffix is the shared bandCandCtes builder over the
    // re-signed hs
    "q_dedup_minhash_dfkill" ->
      s"""WITH $minhashHsdCtes,
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS n FROM corpus),
         |hot AS (SELECT h FROM (
         |    SELECT h, CAST(count(*) AS BIGINT) AS df FROM (
         |      SELECT doc_id, unnest(list_distinct(hs)) AS h FROM hsd)
         |    GROUP BY h), nc
         |  WHERE df * $ShingleDfKillDenom > n),
         |fhs AS (SELECT doc_id, list(h) AS hs FROM (
         |    SELECT doc_id, unnest(hs) AS h FROM hsd) u
         |  WHERE h NOT IN (SELECT h FROM hot)
         |  GROUP BY doc_id),
         |sig AS (SELECT doc_id, $sigColsSql FROM fhs),
         |${bandCandCtes(RowsPerBand, NumBands, "")},
         |jc AS (SELECT doc_a, doc_b,
         |    CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
         |      / len(list_distinct(list_concat(sa.hs, sb.hs))) AS j
         |  FROM cand
         |  JOIN fhs sa ON sa.doc_id = doc_a
         |  JOIN fhs sb ON sb.doc_id = doc_b),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n_cand,
         |    CAST(sum(CASE WHEN doc_b = doc_a + $PlantOffset
         |      AND doc_a < $PlantOffset THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_cand_hit,
         |    CAST(sum(CASE WHEN j >= $JaccardThreshold THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_verified,
         |    CAST(sum(CASE WHEN j >= $JaccardThreshold
         |      AND doc_b = doc_a + $PlantOffset AND doc_a < $PlantOffset
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_ver_hit
         |  FROM jc),
         |el AS (SELECT doc_id FROM fhs),
         |tr AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM el a
         |  WHERE a.doc_id < $PlantOffset AND EXISTS
         |    (SELECT 1 FROM el b WHERE b.doc_id = a.doc_id + $PlantOffset)),
         |nh AS (SELECT CAST(count(*) AS BIGINT) AS n_hot FROM hot)
         |SELECT n_hot, n_true, n_cand, n_cand_hit, n_verified, n_ver_hit,
         |  CAST(n_cand_hit AS DOUBLE) / CAST(n_true AS DOUBLE) AS lsh_recall,
         |  CAST(n_ver_hit AS DOUBLE) / CAST(n_true AS DOUBLE) AS e2e_recall,
         |  CAST(n_ver_hit AS DOUBLE) / CAST(n_verified AS DOUBLE)
         |    AS truth_precision
         |FROM st CROSS JOIN tr CROSS JOIN nh""".stripMargin,
    // the dfkill chain re-banded at the wide 4×4 geometry (shared
    // bandCandCtes builder), census columns only — no n_hot receipt
    "q_dedup_dfkill_wide" ->
      s"""WITH $minhashHsdCtes,
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS n FROM corpus),
         |hot AS (SELECT h FROM (
         |    SELECT h, CAST(count(*) AS BIGINT) AS df FROM (
         |      SELECT doc_id, unnest(list_distinct(hs)) AS h FROM hsd)
         |    GROUP BY h), nc
         |  WHERE df * $ShingleDfKillDenom > n),
         |fhs AS (SELECT doc_id, list(h) AS hs FROM (
         |    SELECT doc_id, unnest(hs) AS h FROM hsd) u
         |  WHERE h NOT IN (SELECT h FROM hot)
         |  GROUP BY doc_id),
         |sig AS (SELECT doc_id, $sigColsSql FROM fhs),
         |${bandCandCtes(WideRowsPerBand, NumHashes / WideRowsPerBand, "")},
         |jc AS (SELECT doc_a, doc_b,
         |    CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
         |      / len(list_distinct(list_concat(sa.hs, sb.hs))) AS j
         |  FROM cand
         |  JOIN fhs sa ON sa.doc_id = doc_a
         |  JOIN fhs sb ON sb.doc_id = doc_b),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n_cand,
         |    CAST(sum(CASE WHEN doc_b = doc_a + $PlantOffset
         |      AND doc_a < $PlantOffset THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_cand_hit,
         |    CAST(sum(CASE WHEN j >= $JaccardThreshold THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_verified,
         |    CAST(sum(CASE WHEN j >= $JaccardThreshold
         |      AND doc_b = doc_a + $PlantOffset AND doc_a < $PlantOffset
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_ver_hit
         |  FROM jc),
         |el AS (SELECT doc_id FROM fhs),
         |tr AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM el a
         |  WHERE a.doc_id < $PlantOffset AND EXISTS
         |    (SELECT 1 FROM el b WHERE b.doc_id = a.doc_id + $PlantOffset))
         |SELECT n_true, n_cand, n_cand_hit, n_verified, n_ver_hit,
         |  CAST(n_cand_hit AS DOUBLE) / CAST(n_true AS DOUBLE) AS lsh_recall,
         |  CAST(n_ver_hit AS DOUBLE) / CAST(n_true AS DOUBLE) AS e2e_recall,
         |  CAST(n_ver_hit AS DOUBLE) / CAST(n_verified AS DOUBLE)
         |    AS truth_precision
         |FROM st CROSS JOIN tr""".stripMargin,
    "q_dedup_pr_curve" ->
      s"""WITH $minhashCteChain,
         |jc AS (SELECT doc_a, doc_b,
         |    CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
         |      / len(list_distinct(list_concat(sa.hs, sb.hs))) AS j
         |  FROM cand
         |  JOIN hsd sa ON sa.doc_id = doc_a
         |  JOIN hsd sb ON sb.doc_id = doc_b),
         |pt AS (SELECT t,
         |    CAST(sum(CASE WHEN j >= t THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_verified,
         |    CAST(sum(CASE WHEN j >= t AND doc_b = doc_a + $PlantOffset
         |      AND doc_a < $PlantOffset THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_hit
         |  FROM jc CROSS JOIN (SELECT CAST(unnest([${PrThresholds.mkString(", ")}])
         |    AS DOUBLE)
         |    AS t) th
         |  GROUP BY t),
         |el AS (SELECT doc_id FROM hsd WHERE len(sh) > 0),
         |tr AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM el a
         |  WHERE a.doc_id < $PlantOffset AND EXISTS
         |    (SELECT 1 FROM el b WHERE b.doc_id = a.doc_id + $PlantOffset))
         |SELECT t, n_verified, n_hit, n_true,
         |  CAST(n_hit AS DOUBLE) / CAST(n_true AS DOUBLE) AS recall,
         |  CASE WHEN n_verified > 0
         |       THEN CAST(n_hit AS DOUBLE) / CAST(n_verified AS DOUBLE)
         |       END AS precision_lb
         |FROM pt CROSS JOIN tr ORDER BY t""".stripMargin,
    "q_lsh_bands" -> {
      val schemeCtes = BandSchemes
        .map { case (r, nb) => bandCandCtes(r, nb, s"_$r") }
        .mkString(",\n")
      val schemeStats = BandSchemes
        .map { case (r, nb) =>
          s"""SELECT CAST($r AS BIGINT) AS rows_per_band,
             |  CAST($nb AS BIGINT) AS n_bands,
             |  CAST(count(*) AS BIGINT) AS n_cand,
             |  CAST(coalesce(sum(CASE WHEN doc_b = doc_a + $PlantOffset
             |    AND doc_a < $PlantOffset THEN 1 ELSE 0 END), 0) AS BIGINT)
             |    AS n_hit
             |FROM cand_$r""".stripMargin
        }
        .mkString("\nUNION ALL\n")
      s"""WITH $minhashSigCtes,
         |$schemeCtes,
         |st AS ($schemeStats),
         |el AS (SELECT doc_id FROM hsd WHERE len(sh) > 0),
         |tr AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM el a
         |  WHERE a.doc_id < $PlantOffset AND EXISTS
         |    (SELECT 1 FROM el b WHERE b.doc_id = a.doc_id + $PlantOffset))
         |SELECT rows_per_band, n_bands, n_cand, n_hit, n_true,
         |  CAST(n_hit AS DOUBLE) / CAST(n_true AS DOUBLE) AS lsh_recall
         |FROM st CROSS JOIN tr ORDER BY rows_per_band""".stripMargin
    },
    "q_delete_list" ->
      s"""WITH corpus AS ($plantedSql),
         |man AS (SELECT DISTINCT md5(text) AS del_md5 FROM documents
         |  WHERE doc_id % $DeleteListMod = $DeleteListResidue),
         |marked AS (SELECT c.doc_id, $normFpSql AS fpn,
         |    (m.del_md5 IS NOT NULL) AS del
         |  FROM corpus c LEFT JOIN man m ON md5(c.text) = m.del_md5),
         |doc AS (SELECT CAST(count(*) AS BIGINT) AS b,
         |    CAST(sum(CASE WHEN del THEN 1 ELSE 0 END) AS BIGINT) AS x
         |  FROM marked),
         |em AS (SELECT CAST(count(*) AS BIGINT) AS b,
         |    CAST(sum(CASE WHEN vec_id IN
         |      (SELECT doc_id FROM marked WHERE del) THEN 1 ELSE 0 END)
         |      AS BIGINT) AS x
         |  FROM embeddings),
         |sv AS (SELECT CAST(count(*) AS BIGINT) AS b,
         |    CAST(sum(CASE WHEN fpn IN
         |      (SELECT fpn FROM marked WHERE del) THEN 1 ELSE 0 END)
         |      AS BIGINT) AS x
         |  FROM marked WHERE NOT del)
         |SELECT artifact, b AS n_before, x AS n_deleted, b - x AS n_after
         |FROM (
         |  SELECT 'documents' AS artifact, b, x FROM doc
         |  UNION ALL SELECT 'embedding_index', b, x FROM em
         |  UNION ALL SELECT 'norm_residual', b, x FROM sv)
         |ORDER BY artifact""".stripMargin,
    "q_delete_cascade" ->
      s"""WITH del AS (SELECT $DeleteResidue AS r),
         |doc AS (SELECT CAST(count(*) AS BIGINT) AS b,
         |    CAST(sum(CASE WHEN doc_id % $DeleteMod = $DeleteResidue
         |      THEN 1 ELSE 0 END) AS BIGINT) AS x
         |  FROM documents),
         |lnw AS (SELECT doc_id,
         |    (len($toks) + ${LineTokens - 1}) // $LineTokens AS w
         |  FROM ($nearDupSql)),
         |ln AS (SELECT CAST(sum(w) AS BIGINT) AS b,
         |    CAST(sum(CASE WHEN doc_id % $DeleteMod = $DeleteResidue
         |      THEN w ELSE 0 END) AS BIGINT) AS x
         |  FROM lnw),
         |chw AS (SELECT doc_id,
         |    (len($toks) + ${TextAnalysis.ChunkStride - 1})
         |      // ${TextAnalysis.ChunkStride} AS w
         |  FROM documents),
         |ch AS (SELECT CAST(sum(w) AS BIGINT) AS b,
         |    CAST(sum(CASE WHEN doc_id % $DeleteMod = $DeleteResidue
         |      THEN w ELSE 0 END) AS BIGINT) AS x
         |  FROM chw),
         |em AS (SELECT CAST(count(*) AS BIGINT) AS b,
         |    CAST(sum(CASE WHEN vec_id % $DeleteMod = $DeleteResidue
         |      THEN 1 ELSE 0 END) AS BIGINT) AS x
         |  FROM embeddings)
         |SELECT artifact, b AS n_before, x AS n_deleted, b - x AS n_after
         |FROM (
         |  SELECT 'documents' AS artifact, b, x FROM doc
         |  UNION ALL SELECT 'line_index', b, x FROM ln
         |  UNION ALL SELECT 'chunk_index', b, x FROM ch
         |  UNION ALL SELECT 'embedding_index', b, x FROM em)
         |ORDER BY artifact""".stripMargin,
    "q_dedup_lines" ->
      s"""WITH corpus AS ($nearDupSql),
         |tkt AS (SELECT doc_id, $toks AS tk FROM corpus),
         |ln AS (SELECT doc_id,
         |  list_transform(range(0, (len(tk) + ${LineTokens - 1}) // $LineTokens),
         |    i -> ('0x' || substr(md5(
         |      array_to_string(tk[i*$LineTokens+1 : i*$LineTokens+$LineTokens], ' ')
         |    ), 1, 15))::BIGINT) AS hs
         |  FROM tkt),
         |ph0 AS (SELECT doc_id, unnest(range(0, len(hs))) AS pos, hs FROM ln),
         |ph AS (SELECT doc_id, hs[pos+1] AS h FROM ph0),
         |st AS (SELECT h, count(DISTINCT doc_id) AS n_docs, min(doc_id) AS min_doc
         |       FROM ph GROUP BY h)
         |SELECT doc_id, count(*) AS n_lines,
         |  CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dup_lines,
         |  CAST(sum(CASE WHEN min_doc < doc_id THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_foreign_lines
         |FROM ph JOIN st USING (h)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_dedup_lines_keep" ->
      s"""WITH $linesKeepSqlCtes
         |SELECT doc_id, n_lines, n_kept, md5(clean_text) AS clean_md5
         |FROM doc ORDER BY doc_id""".stripMargin,
    "q_boilerplate" ->
      s"""WITH corpus AS ($nearDupSql),
         |tkt AS (SELECT doc_id, $toks AS tk FROM corpus),
         |ln AS (SELECT doc_id, tk,
         |  list_transform(range(0, (len(tk) + ${LineTokens - 1}) // $LineTokens),
         |    i -> ('0x' || substr(md5(
         |      array_to_string(tk[i*$LineTokens+1 : i*$LineTokens+$LineTokens], ' ')
         |    ), 1, 15))::BIGINT) AS hs
         |  FROM tkt),
         |ph0 AS (SELECT doc_id, unnest(range(0, len(hs))) AS pos, hs FROM ln),
         |ph AS (SELECT doc_id, CAST(pos AS BIGINT) AS line_no, hs[pos+1] AS h
         |  FROM ph0),
         |bp AS (SELECT h FROM (
         |    SELECT h, count(DISTINCT doc_id) AS df FROM ph GROUP BY h)
         |  WHERE df > $BoilerplateDf),
         |kp AS (SELECT doc_id, count(*) AS n_lines,
         |  coalesce(list_sort(list(line_no)
         |    FILTER (WHERE h NOT IN (SELECT h FROM bp))), []) AS kept
         |  FROM ph GROUP BY doc_id)
         |SELECT k.doc_id, k.n_lines,
         |  CAST(k.n_lines - len(k.kept) AS BIGINT) AS n_removed,
         |  md5(coalesce(array_to_string(list_transform(k.kept,
         |    i -> array_to_string(
         |      t.tk[i*$LineTokens+1 : i*$LineTokens+$LineTokens], ' ')), ' '), ''))
         |    AS clean_md5
         |FROM kp k JOIN tkt t USING (doc_id)
         |ORDER BY k.doc_id""".stripMargin,
    "q_dedup_exact" ->
      s"""WITH corpus AS ($plantedSql),
         |fp AS (SELECT doc_id, md5(text) AS fp_md5, $normFpSql AS fp_norm FROM corpus)
         |SELECT fp_norm, min(doc_id) AS canonical_id, count(*) AS n_copies,
         |  count(DISTINCT fp_md5) AS n_exact_variants
         |FROM fp GROUP BY fp_norm HAVING count(*) > 1
         |ORDER BY canonical_id""".stripMargin,
    "q_containment" -> {
      def tokOf(c: String) =
        s"list_filter(string_split_regex(lower($c), '[^a-z]+'), " +
          "x -> length(x) > 0)"
      s"""WITH p AS (
         |  SELECT a.doc_id, a.text AS ta, a.text || ' ' || b.text AS cat
         |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1),
         |sh AS (SELECT doc_id, ${shinglesSql(tokOf("ta"))} AS sa,
         |    ${shinglesSql(tokOf("cat"))} AS sc FROM p)
         |SELECT doc_id, CAST(len(sa) AS BIGINT) AS n_a,
         |  CAST(len(sc) AS BIGINT) AS n_cat,
         |  CAST(len(list_intersect(sa, sc)) AS DOUBLE) / len(sa)
         |    AS containment,
         |  CAST(len(list_intersect(sa, sc)) AS DOUBLE)
         |    / len(list_distinct(list_concat(sa, sc))) AS jaccard
         |FROM sh WHERE len(sa) > 0 AND len(sc) > 0
         |ORDER BY doc_id""".stripMargin
    },
    "q_dedup_jaccard" ->
      s"""WITH corpus AS ($nearDupSql),
         |sh AS (SELECT doc_id, ${shinglesSql(toks)} AS sh FROM corpus)
         |SELECT a.doc_id AS doc_id,
         |  CAST(len(list_intersect(a.sh, n.sh)) AS DOUBLE)
         |    / len(list_distinct(list_concat(a.sh, n.sh))) AS j_next,
         |  CAST(len(list_intersect(a.sh, d.sh)) AS DOUBLE)
         |    / len(list_distinct(list_concat(a.sh, d.sh))) AS j_dup
         |FROM sh a
         |JOIN sh n ON n.doc_id = a.doc_id + 1 AND n.doc_id < $PlantOffset
         |JOIN sh d ON d.doc_id = a.doc_id + $PlantOffset
         |WHERE a.doc_id < $PlantOffset
         |ORDER BY doc_id""".stripMargin,
    // INDEPENDENT derivation: brute-force all pairs over the hashed
    // shingle sets (length-filter pruned — implied by J >= t), integer
    // threshold predicate — the quadratic work the prefix filter exists
    // to avoid at scale, affordable at oracle SF
    "q_simjoin" ->
      s"""WITH corpus AS ($nearDupSql),
         |shd AS (SELECT doc_id, ${shinglesSql(toks)} AS sh FROM corpus),
         |hsd AS (SELECT doc_id,
         |  list_transform(sh, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT)
         |    AS hs
         |  FROM shd WHERE len(sh) > 0),
         |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    len(list_intersect(a.hs, b.hs)) AS ni,
         |    len(list_distinct(list_concat(a.hs, b.hs))) AS nu
         |  FROM hsd a JOIN hsd b ON a.doc_id < b.doc_id
         |    AND len(b.hs) * 10 >= len(a.hs) * $SimjoinT
         |    AND len(a.hs) * 10 >= len(b.hs) * $SimjoinT)
         |SELECT doc_a, doc_b, CAST(ni AS DOUBLE) / nu AS jaccard
         |FROM pr WHERE ni * 10 >= nu * $SimjoinT
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q_dedup_minhash" ->
      s"""WITH $minhashCteChain
         |SELECT doc_a, doc_b, n_shared_bands,
         |  CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
         |    / len(list_distinct(list_concat(sa.hs, sb.hs))) AS jaccard
         |FROM cand
         |JOIN hsd sa ON sa.doc_id = doc_a
         |JOIN hsd sb ON sb.doc_id = doc_b
         |ORDER BY doc_a, doc_b""".stripMargin,
    // the SAME chain regrouped at the wide 4×4 band geometry — band math
    // from the shared bandCandCtes builder, so the two operating points
    // cannot drift in key derivation or bucket cap
    "q_dedup_minhash_wide" ->
      s"""WITH ${minhashCteChainAt(WideRowsPerBand)}
         |SELECT doc_a, doc_b, n_shared_bands,
         |  CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
         |    / len(list_distinct(list_concat(sa.hs, sb.hs))) AS jaccard
         |FROM cand
         |JOIN hsd sa ON sa.doc_id = doc_a
         |JOIN hsd sb ON sb.doc_id = doc_b
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q_dedup_pipeline" ->
      s"""WITH RECURSIVE $minhashCteChain,
         |$verifiedCte,
         |sym AS (SELECT src, dst FROM verified
         |        UNION SELECT dst AS src, src AS dst FROM verified),
         |nodes AS (SELECT DISTINCT src AS id FROM sym),
         |reach AS (
         |  SELECT id, id AS label FROM nodes
         |  UNION
         |  SELECT e.dst AS id, r.label
         |  FROM reach r JOIN sym e ON e.src = r.id),
         |comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id),
         |sizes AS (SELECT component, count(*) AS sz FROM comp GROUP BY component)
         |SELECT sz AS cluster_size, count(*) AS n_clusters
         |FROM sizes GROUP BY sz ORDER BY cluster_size""".stripMargin,
    "q_split_leakage" ->
      s"""WITH $minhashCteChain,
         |$verifiedCte,
         |lab AS (SELECT
         |  ${Sampling.splitLabelSql("src")} AS sa,
         |  ${Sampling.splitLabelSql("dst")} AS sb
         |  FROM verified),
         |pairs AS (SELECT least(sa, sb) AS split_lo, greatest(sa, sb) AS split_hi
         |          FROM lab)
         |SELECT split_lo, split_hi, count(*) AS n_pairs,
         |  CAST(CASE WHEN split_lo <> split_hi THEN 1 ELSE 0 END AS BIGINT)
         |    AS is_leak
         |FROM pairs GROUP BY split_lo, split_hi
         |ORDER BY split_lo, split_hi""".stripMargin,
    // INDEPENDENT derivation: brute-force |Q|×N Hamming scan — no
    // substring index, no pigeonhole; if the MIH probe set missed a true
    // in-radius match, this oracle exposes it
    "q_hamming_search" -> {
      val bits = (0 until SimhashBits)
        .map(j => s"CASE WHEN 2 * len(list_filter(hs, h -> ((h >> $j) & 1) = 1)) " +
          s">= len(hs) THEN ${1L << j} ELSE 0 END")
        .mkString(" + ")
      s"""WITH corpus AS ($nearDupSql),
         |shd AS (SELECT doc_id, ${shinglesSql(toks)} AS sh FROM corpus),
         |hsd AS (SELECT doc_id, sh,
         |  list_transform(sh, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS hs
         |  FROM shd),
         |sig AS (SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM hsd
         |        WHERE len(sh) > 0),
         |q AS (SELECT doc_id AS query_id, simhash AS qh FROM sig
         |      WHERE doc_id < $HammingQ),
         |pairs AS (
         |  SELECT q.query_id, s.doc_id,
         |    CAST(bit_count(xor(q.qh, s.simhash)) AS BIGINT) AS ham
         |  FROM q JOIN sig s ON s.doc_id <> q.query_id
         |  WHERE bit_count(xor(q.qh, s.simhash)) <= $HammingR),
         |rkd AS (
         |  SELECT query_id, doc_id, ham, row_number() OVER (
         |    PARTITION BY query_id ORDER BY ham ASC, doc_id ASC) AS r
         |  FROM pairs)
         |SELECT query_id, CAST(r AS BIGINT) AS rk, doc_id, ham
         |FROM rkd WHERE r <= $HammingTopK
         |ORDER BY query_id, rk""".stripMargin
    },
    "q_dedup_simhash" -> {
      val bits = (0 until SimhashBits)
        .map(j => s"CASE WHEN 2 * len(list_filter(hs, h -> ((h >> $j) & 1) = 1)) " +
          s">= len(hs) THEN ${1L << j} ELSE 0 END")
        .mkString(" + ")
      s"""WITH corpus AS ($nearDupSql),
         |shd AS (SELECT doc_id, ${shinglesSql(toks)} AS sh FROM corpus),
         |hsd AS (SELECT doc_id, sh,
         |  list_transform(sh, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS hs
         |  FROM shd),
         |sig AS (SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM hsd
         |        WHERE len(sh) > 0)
         |SELECT a.doc_id AS doc_id, a.simhash AS simhash,
         |  CAST(bit_count(xor(a.simhash, d.simhash)) AS BIGINT) AS ham_dup,
         |  CAST(bit_count(xor(a.simhash, n.simhash)) AS BIGINT) AS ham_next
         |FROM sig a
         |JOIN sig d ON d.doc_id = a.doc_id + $PlantOffset
         |JOIN sig n ON n.doc_id = a.doc_id + 1 AND n.doc_id < $PlantOffset
         |WHERE a.doc_id < $PlantOffset
         |ORDER BY doc_id""".stripMargin
    },
    "q_dedup_embedding" -> {
      val bucket = BucketDims.zipWithIndex
        .map { case (d, i) => s"CASE WHEN embedding[${d + 1}] >= 0 THEN ${1 << i} ELSE 0 END" }
        .mkString(" + ")
      s"""WITH corpus AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL SELECT vec_id + $PlantOffset, embedding FROM embeddings),
         |bucketed AS (SELECT vec_id, embedding, CAST($bucket AS BIGINT) AS bucket FROM corpus),
         |pairs AS (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    round(
         |      list_sum(list_transform(list_zip(a.embedding, b.embedding),
         |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         |      / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         |         * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
         |      6) AS cos
         |  FROM bucketed a JOIN bucketed b
         |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT vec_a, vec_b, cos FROM pairs WHERE cos >= 0.99
         |ORDER BY vec_a, vec_b""".stripMargin
    }
  )
}
