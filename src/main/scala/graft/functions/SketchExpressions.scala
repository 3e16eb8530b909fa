package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd sketch signatures over a pre-hashed feature array
  * (`ARRAY<BIGINT>` of 60-bit element hashes).
  *
  * Motivation (measured on the sf0.1 bench): computing k MinHash values as
  * k `array_min(transform(...))` higher-order calls evaluates k·|arr|
  * interpreted lambdas per row — 8M lambda invocations for 10k docs — and
  * `explode`-based signatures trigger `InferFiltersFromGenerate`, whose
  * inferred predicate gets pushed into the scan with the whole shingle
  * pipeline inlined (quadratic re-evaluation). One custom expression
  * computes the whole signature in a single primitive loop inside
  * whole-stage codegen: 25-45× faster, same values.
  *
  * The affine family is the classic universal-hash MinHash
  * (Broder 1997; Indyk–Motwani LSH): hᵢ(x) = (aᵢ·(x mod p) + bᵢ) mod p with
  * p = 2³¹−1, aᵢ = 2i+1, bᵢ = 104729·(i+1) — engine-portable exact integer
  * arithmetic (mirrored literally in the DuckDB oracle SQL).
  */
object Sketches {
  val Prime: Long = 2147483647L
  /** Large varied multipliers/offsets (LCG-expanded, fixed seed). Small
    * sequential multipliers (1,3,5,…) leave the induced permutations
    * order-correlated — shared minima across functions — which inflates
    * LSH band collisions ~4× (measured); these decorrelate them.
    * a ∈ [1, p-1] so no hash function is constant.
    */
  def a(i: Int): Long = (1103515245L * (i + 7) + 12345L) % (Prime - 1L) + 1L
  def b(i: Int): Long = (69069L * (i + 3) + 1013904223L) % Prime
}

abstract class LongArrayUnary extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${other.catalogString}")
  }
}

/** All k affine-MinHash values of a hash array in one pass → ARRAY<BIGINT>.
  * Empty input arrays yield an empty signature (callers filter them out,
  * mirroring the oracle's `WHERE len(sh) > 0`).
  */
case class AffineMinHashes(child: Expression, k: Int) extends LongArrayUnary {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "affine_minhashes"

  // affine constants hoisted out of the per-element loop (loop-invariant)
  @transient private lazy val as: Array[Long] = Array.tabulate(k)(Sketches.a)
  @transient private lazy val bs: Array[Long] = Array.tabulate(k)(Sketches.b)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val hm = arr.getLong(i) % Sketches.Prime
      var j = 0
      while (j < k) {
        val v = (as(j) * hm + bs(j)) % Sketches.Prime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val hm = ctx.freshName("hm")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      val p = Sketches.Prime
      // affine constants as literal arrays, initialized once per operator
      // instance — not recomputed per element (this expression exists for
      // hot-loop speed)
      val aInit = (0 until k).map(Sketches.a).mkString("new long[]{", "L,", "L}")
      val bInit = (0 until k).map(Sketches.b).mkString("new long[]{", "L,", "L}")
      val aArr = ctx.addMutableState("long[]", "minhashA", v => s"$v = $aInit;")
      val bArr = ctx.addMutableState("long[]", "minhashB", v => s"$v = $bInit;")
      s"""
         |int $n = $arr.numElements();
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $hm = $arr.getLong($i) % ${p}L;
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $v = ($aArr[$j] * $hm + $bArr[$j]) % ${p}L;
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |${ev.value} = ($n == 0)
         |  ? new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0])
         |  : new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bits`-wide SimHash of a hash array in one pass → BIGINT: bit j is set
  * when at least half the elements have bit j set (2·ones ≥ n), matching
  * the ±1-vote-sum ≥ 0 convention (Charikar, STOC 2002).
  *
  * Empty input yields signature 0 — NOT the all-ones value the 2·0 ≥ 0 tie
  * rule would produce, which would make every feature-less document pair
  * with every other at Hamming distance 0 and flood near-dup candidate
  * output (callers should still filter empties like the oracle's
  * `WHERE len(sh) > 0`; this guard just de-fangs the trap).
  */
case class SimHashSignature(child: Expression, bits: Int) extends LongArrayUnary {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return 0L
    val ones = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < bits) {
        if (((h >> j) & 1L) == 1L) ones(j) += 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (2 * ones(j) >= n) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val ones = ctx.freshName("ones")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $arr.numElements();
         |if ($n == 0) { ${ev.value} = 0L; } else {
         |int[] $ones = new int[$bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $arr.getLong($i);
         |  for (int $j = 0; $j < $bits; $j++) {
         |    if ((($h >> $j) & 1L) == 1L) $ones[$j]++;
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < $bits; $j++) {
         |  if (2 * $ones[$j] >= $n) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct word n-grams of a token array in one eval pass → ARRAY<STRING>.
  *
  * Replaces `array_distinct(transform(sequence(...), i -> concat_ws(...)))`:
  * higher-order functions evaluate an interpreted lambda per element (and
  * invite InferFiltersFromGenerate to inline the whole pipeline into scan
  * filters); this is a single flat loop over UTF8Strings. CodegenFallback —
  * the per-row virtual call is noise; the per-element lambda was the cost.
  * Mirrors the DuckDB oracle's list_transform/list_distinct construction.
  */
case class WordNGrams(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val out = new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String](len)
    val seen =
      if (distinct) new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
      else null
    var i = 0
    while (i <= len - n) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      val g = org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*)
      if (seen == null || seen.add(g)) out.add(g)
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fixed-k token chunks — "derived lines" [0..k), [k..2k), …, INCLUDING
  * the final partial chunk, each joined with ' ' — in one eval pass.
  * Exists for the same reason as [[WordNGrams]]: the
  * `transform(sequence(...), i -> array_join(slice(tk, ...)))`
  * formulation runs an interpreted lambda per chunk, and optimizer
  * inlining (CollapseProject) can push the tokenizer INTO the lambda —
  * re-splitting the document once per chunk. Portable as
  * `list_transform(range(0, (len(tk)+k-1)//k),
  *    i -> array_to_string(tk[i*k+1 : i*k+k], ' '))` in DuckDB.
  */
case class TokenChunks(child: Expression, k: Int, stride: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(k >= 1, s"chunk size must be >= 1, got $k")
  require(stride >= 1, s"stride must be >= 1, got $stride")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "token_chunks"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    // chunk i covers [i·stride, i·stride + k); stride == k is the
    // non-overlapping line case, stride < k the overlapping RAG/window
    // case — one start per stride while it lands inside the array
    val nOut = (len + stride - 1) / stride
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val out = new Array[Any](nOut)
    var i = 0
    while (i < nOut) {
      val from = i * stride
      val until = math.min(from + k, len)
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](until - from)
      var j = from
      while (j < until) { parts(j - from) = arr.getUTF8String(j); j += 1 }
      out(i) = org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-row unigram statistics over a token array, one eval pass →
  * ARRAY<DOUBLE>[n_tokens, n_distinct, Σ c·ln c] (c = per-distinct-token
  * count). The building blocks of word entropy (ln n − Σc·ln c / n) and
  * type-token ratio as ROW-LOCAL values: the groupBy(doc, word) →
  * groupBy(doc) formulation shuffles the corpus twice for something each
  * row can answer alone — this is a pure map stage at any corpus size.
  * Portable as the grouped SQL (see the q_text_entropy oracle); the
  * Σ c·ln c float-summation order differs between engines either way, so
  * consumers round (the established 9-decimal convention).
  */
case class UnigramStats(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = false)
  override def prettyName: String = "unigram_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val counts =
      new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Long](len * 2)
    var i = 0
    while (i < len) {
      counts.merge(arr.getUTF8String(i), 1L, (a, b) => a + b)
      i += 1
    }
    var s = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next(); s += c * math.log(c.toDouble) }
    new GenericArrayData(Array(len.toDouble, counts.size.toDouble, s))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken:
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03)
  * over a positional hash array: for every window of `w` consecutive
  * k-gram hashes, select the RIGHTMOST minimum; return the distinct
  * selected 0-based positions in ascending order. The guarantee that makes
  * it the standard fingerprint selector: any shared substring of at least
  * w + k − 1 tokens yields at least one shared selected fingerprint, at an
  * expected density of 2/(w+1) — the sub-linear index the span detector
  * ([[graft.operators.Dedup.qDedupSubstring]]) would probe at 100 TB.
  *
  * One eval pass per row, O(n·w) with w a small constant (the rightmost
  * pick makes consecutive windows' selections non-decreasing, so dedup is
  * an append guard). Arrays shorter than w have no full window → empty
  * selection (documented boundary; mirror the oracle's CASE). Portable as
  * DuckDB list lambdas — see the q_winnow oracle.
  */
case class WinnowedPositions(child: Expression, w: Int) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(w >= 1, s"winnow window must be >= 1, got $w")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "winnowed_positions"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[Any](2 * n / (w + 1) + 1)
    var last = -1
    var i = 0
    while (i <= n - w) {
      var mn = Long.MaxValue
      var j = -1
      var p = i
      while (p < i + w) {
        val v = arr.getLong(p)
        if (v <= mn) { mn = v; j = p } // <= : rightmost minimum
        p += 1
      }
      if (j > last) { out.add(j); last = j }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** arr[i] for each 0-based i in `idxs`, one eval pass → ARRAY<STRING>.
  * The lambda-free way to gather array elements at positions
  * (`transform(idxs, i -> element_at(arr, i+1))` re-evaluates `arr`'s
  * child expression per element once CollapseProject inlines it).
  * Out-of-range indexes are skipped. Portable as
  * `list_transform(idxs, i -> arr[i+1])` in DuckDB.
  */
case class ElementsAt(arr: Expression, idxs: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def left: Expression = arr
  override def right: Expression = idxs
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "elements_at"

  override def checkInputDataTypes(): TypeCheckResult = (arr.dataType, idxs.dataType) match {
    case (ArrayType(org.apache.spark.sql.types.StringType, _),
          ArrayType(org.apache.spark.sql.types.IntegerType | LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (a, b) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<STRING>, ARRAY<INT|BIGINT>), got " +
        s"${a.catalogString} and ${b.catalogString}")
  }

  override def nullSafeEval(a: Any, ix: Any): Any = {
    val src = a.asInstanceOf[ArrayData]
    val pos = ix.asInstanceOf[ArrayData]
    val longIdx = idxs.dataType.asInstanceOf[ArrayType].elementType == LongType
    val out = new java.util.ArrayList[Any](pos.numElements())
    var i = 0
    while (i < pos.numElements()) {
      val p = if (longIdx) pos.getLong(i) else pos.getInt(i).toLong
      if (p >= 0 && p < src.numElements()) out.add(src.getUTF8String(p.toInt))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(arr = newLeft, idxs = newRight)
}

/** First 60 bits (15 hex chars) of md5 per element, one eval pass →
  * ARRAY<BIGINT>. Portable as
  * `list_transform(sh, x -> ('0x'||substr(md5(x),1,15))::BIGINT)` in DuckDB.
  *
  * Compiles to a static call into whole-stage-generated code (r15: the
  * CodegenFallback form made every containing projection an interpreted
  * island — one InternalRow boxing round-trip per row at 13+ hot sites).
  * The digest→60-bit extraction is the ONE shared [[Md5Prefix60]] helper,
  * so the scalar and array forms cannot drift (they must stay
  * bit-identical — every caller and the DuckDB oracle identity depend on
  * it).
  */
case class Md5Prefix60Array(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_prefix60_array"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    Md5Prefix60.hashArray(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, arr =>
      s"graft.functions.Md5Prefix60$$.MODULE$$.hashArray($arr)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The shared 60-bit md5 prefix kernel of [[Md5Prefix60Scalar]] and
  * [[Md5Prefix60Array]]: thread-local MessageDigest (one instance per
  * executor thread, never per call) and a single digest→long extraction
  * (first 15 hex chars of md5 = first 60 digest bits, positive in a
  * long). Static entry points so generated code calls straight in.
  */
object Md5Prefix60 {
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  def hashUTF8(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = digests.get()
    md.reset()
    prefix60(md.digest(s.getBytes))
  }

  def hashArray(arr: ArrayData): ArrayData = {
    val len = arr.numElements()
    val md = digests.get()
    val out = new Array[Long](len)
    var i = 0
    while (i < len) {
      md.reset()
      out(i) = prefix60(md.digest(arr.getUTF8String(i).getBytes))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Value of the first 15 hex chars = first 60 bits of the digest. */
  private def prefix60(d: Array[Byte]): Long = {
    var v = 0L
    var j = 0
    while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
    (v << 4) | ((d(7) & 0xffL) >> 4)
  }
}

/** Occurrence count of the most frequent element of an ARRAY<STRING> (0 for
  * an empty array), one hash-map pass per row → BIGINT.
  *
  * Exists so per-document repetition signals (top-bigram share) stay a pure
  * map stage: the groupBy(doc, gram) formulation shuffles every exploded
  * gram of the corpus — ~n_tokens rows per document with string keys —
  * to compute a value that is row-local. Portable as
  * `list_max(list_transform(list_distinct(l), x -> len(list_filter(l, y -> y = x))))`
  * in DuckDB (the oracle uses the equivalent unnest+count formulation).
  */
case class MaxFreqCount(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "max_freq_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val counts =
      new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer](len * 2)
    var best = 0L
    var i = 0
    while (i < len) {
      val k = arr.getUTF8String(i)
      val cur = counts.get(k)
      val c = if (cur == null) 1 else cur.intValue() + 1
      counts.put(k, c)
      if (c > best) best = c
      i += 1
    }
    best
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The n-gram axes of the Gopher repetition battery (Rae et al. 2021,
  * "Scaling Language Models", Table A1) in ONE row-local pass over a token
  * array → ARRAY<BIGINT> of
  *
  *  [0] n_grams          in-order word n-grams (len − n + 1, min 0)
  *  [1] top_count        occurrences of the most frequent n-gram
  *                       (ties → lexicographically smallest gram)
  *  [2] top_chars        token chars of ONE instance of that gram
  *  [3] n_dup_grams      distinct grams occurring ≥ 2 times
  *  [4] covered_words    distinct token positions lying inside ANY
  *                       occurrence of a duplicated gram
  *  [5] covered_chars    chars of those tokens
  *  [6] total_chars      chars of all tokens (separators excluded
  *                       everywhere — char masses are token-content only)
  *
  * top_count·top_chars/total_chars is the paper's top-n-gram character
  * fraction; covered_chars/total_chars is the duplicate-n-gram character
  * fraction with the paper's no-double-count semantics — overlapping
  * duplicate occurrences are a POSITION-SET UNION, which is why this is an
  * expression and not algebra: the union is inherently per-document
  * sequential state. Two scans of the gram list (count, then mark), zero
  * shuffle — a pure map stage at any corpus size, vs the oracle's
  * explode + 3-aggregation formulation (see the q_gopher_ngram SQL).
  */
case class NGramCoverage(child: Expression, n: Int) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(n >= 1, s"ngram width must be >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_coverage"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.unsafe.types.UTF8String
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    var totalChars = 0L
    var i = 0
    while (i < len) { totalChars += arr.getUTF8String(i).numChars(); i += 1 }
    val nGrams = math.max(0, len - n + 1)
    if (nGrams == 0)
      return new GenericArrayData(Array(0L, 0L, 0L, 0L, 0L, 0L, totalChars))
    val sep = UTF8String.fromString(" ")
    val grams = new Array[UTF8String](nGrams)
    val counts = new java.util.HashMap[UTF8String, Integer](nGrams * 2)
    i = 0
    while (i < nGrams) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      val g = UTF8String.concatWs(sep, parts: _*)
      grams(i) = g
      counts.merge(g, 1, (a, b) => a + b)
      i += 1
    }
    var topCount = 0L
    var topGram: UTF8String = null
    var nDup = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.longValue()
      if (c >= 2) nDup += 1
      if (c > topCount || (c == topCount && e.getKey.compareTo(topGram) < 0)) {
        topCount = c
        topGram = e.getKey
      }
    }
    // top gram's token chars = chars of the joined gram minus its n-1 spaces
    val topChars = topGram.numChars().toLong - (n - 1)
    val covered = new Array[Boolean](len)
    i = 0
    while (i < nGrams) {
      if (counts.get(grams(i)) >= 2) {
        var j = i
        while (j < i + n) { covered(j) = true; j += 1 }
      }
      i += 1
    }
    var coveredWords = 0L
    var coveredChars = 0L
    i = 0
    while (i < len) {
      if (covered(i)) {
        coveredWords += 1
        coveredChars += arr.getUTF8String(i).numChars()
      }
      i += 1
    }
    new GenericArrayData(Array(
      nGrams.toLong, topCount, topChars, nDup, coveredWords, coveredChars,
      totalChars))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Within-document maximal repeated token spans — the INTRA-doc twin of the
  * cross-document span detector ([[graft.operators.Dedup.qDedupSubstring]]):
  * position pairs (i < j) of equal in-order n-grams form matches; matches
  * on one offset diagonal (j − i) with consecutive i merge into maximal
  * runs; a run of c matches is a repeated span of c + n − 1 tokens.
  * Returns [n_runs, max_run_tokens, matched_tokens] counting runs of at
  * least `minRun` tokens; grams occurring more than `maxOcc` times in the
  * document are dropped before pair generation (the
  * [[graft.operators.Dedup.MaxSpanOcc]] analogue — an all-same-token
  * document would otherwise go quadratic in one gram).
  *
  * Row-local BY CONSTRUCTION (both span endpooints live in one document),
  * which is what makes this an expression: the whole signal is a pure map
  * stage at any corpus size, where the oracle pays a positional explode,
  * a capped self-join, and two aggregations per document. Gram equality is
  * STRING equality (no hashing); pair cost is bounded by maxOcc² per
  * distinct gram.
  */
case class SelfSpans(child: Expression, n: Int, minRun: Int, maxOcc: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(n >= 1 && minRun >= n && maxOcc >= 2,
    s"need n >= 1, minRun >= n, maxOcc >= 2; got n=$n minRun=$minRun maxOcc=$maxOcc")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "self_spans"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.unsafe.types.UTF8String
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val nGrams = len - n + 1
    if (nGrams <= 0) return new GenericArrayData(Array(0L, 0L, 0L))
    val sep = UTF8String.fromString(" ")
    val positions =
      new java.util.HashMap[UTF8String, java.util.ArrayList[Integer]](nGrams * 2)
    var i = 0
    while (i < nGrams) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      positions
        .computeIfAbsent(UTF8String.concatWs(sep, parts: _*),
          _ => new java.util.ArrayList[Integer](4))
        .add(i)
      i += 1
    }
    // encode each match pair as (offset diagonal)·L + pos_a so one sort
    // groups diagonals and orders positions within them
    val pairs = new java.util.ArrayList[java.lang.Long](64)
    val it = positions.values().iterator()
    while (it.hasNext) {
      val ps = it.next()
      val c = ps.size()
      if (c >= 2 && c <= maxOcc) {
        var a = 0
        while (a < c - 1) {
          var b = a + 1
          while (b < c) {
            val pa = ps.get(a).intValue()
            val pb = ps.get(b).intValue()
            pairs.add((pb - pa).toLong * len + pa)
            b += 1
          }
          a += 1
        }
      }
    }
    if (pairs.isEmpty) return new GenericArrayData(Array(0L, 0L, 0L))
    java.util.Collections.sort(pairs)
    var nRuns = 0L
    var maxRun = 0L
    var matched = 0L
    var runLen = 0L
    var prev = Long.MinValue
    def closeRun(): Unit = if (runLen > 0) {
      val spanTokens = runLen + n - 1
      if (spanTokens >= minRun) {
        nRuns += 1
        if (spanTokens > maxRun) maxRun = spanTokens
        matched += spanTokens
      }
    }
    var k = 0
    while (k < pairs.size()) {
      val v = pairs.get(k).longValue()
      // same diagonal and consecutive pos_a ⇔ encoded value is prev + 1
      // (pos_a < L − diag gaps can't wrap into the next diagonal)
      if (v == prev + 1 && prev != Long.MinValue) runLen += 1
      else { closeRun(); runLen = 1 }
      prev = v
      k += 1
    }
    closeRun()
    new GenericArrayData(Array(nRuns, maxRun, matched))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Scalar 60-bit md5 prefix: value-identical to the SQL chain
  * `CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)` (the first 15
  * hex chars of the digest = its first 60 bits, positive in a long), which
  * a dozen operators used per row for bucketing/fingerprinting. The chain
  * is pathologically expensive at row rate: commons-codec re-instantiates
  * a MessageDigest AND renders the full 32-char hex string per call, then
  * `conv` re-parses it through NumberConverter (r14 measurement: the
  * 4-probe bloom position chain alone was 2.8 s over 600 k rows on 32
  * cores — effectively serial). This expression calls the shared
  * [[Md5Prefix60]] kernel (thread-local digest, 60 bits read straight off
  * the digest bytes — one extraction shared with [[Md5Prefix60Array]] so
  * the two forms cannot drift) and compiles to a static call inside the
  * containing whole-stage span (r15: was CodegenFallback, an interpreted
  * island in otherwise codegen'd projections). DuckDB oracles keep their
  * `('0x' || substr(md5(x), 1, 15))::BIGINT` twin — the identity the SQL
  * curation surface already relies on.
  */
case class Md5Prefix60Scalar(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix60_scalar"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    Md5Prefix60.hashUTF8(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5Prefix60$$.MODULE$$.hashUTF8($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SketchExpressions {
  /** `CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)`, fast —
    * see [[Md5Prefix60Scalar]].
    */
  def md5Prefix60Long(c: Column): Column =
    GraftColumnBridge.column(Md5Prefix60Scalar(GraftColumnBridge.expression(c)))
  def affineMinhashes(hashes: Column, k: Int): Column =
    GraftColumnBridge.column(AffineMinHashes(GraftColumnBridge.expression(hashes), k))
  def simhash(hashes: Column, bits: Int): Column =
    GraftColumnBridge.column(SimHashSignature(GraftColumnBridge.expression(hashes), bits))
  def wordNGrams(tokens: Column, n: Int, distinct: Boolean = true): Column =
    GraftColumnBridge.column(
      WordNGrams(GraftColumnBridge.expression(tokens), n, distinct))
  def md5Prefix60(arr: Column): Column =
    GraftColumnBridge.column(Md5Prefix60Array(GraftColumnBridge.expression(arr)))
  def tokenChunks(tokens: Column, k: Int): Column =
    GraftColumnBridge.column(
      TokenChunks(GraftColumnBridge.expression(tokens), k, k))

  /** Overlapping chunk windows: width `k`, one chunk per `stride`. */
  def tokenChunksStrided(tokens: Column, k: Int, stride: Int): Column =
    GraftColumnBridge.column(
      TokenChunks(GraftColumnBridge.expression(tokens), k, stride))
  def elementsAt(arr: Column, idxs: Column): Column =
    GraftColumnBridge.column(ElementsAt(
      GraftColumnBridge.expression(arr), GraftColumnBridge.expression(idxs)))
  def winnowedPositions(hashes: Column, w: Int): Column =
    GraftColumnBridge.column(WinnowedPositions(
      GraftColumnBridge.expression(hashes), w))
  def unigramStats(tokens: Column): Column =
    GraftColumnBridge.column(UnigramStats(GraftColumnBridge.expression(tokens)))
  def maxFreqCount(arr: Column): Column =
    GraftColumnBridge.column(MaxFreqCount(GraftColumnBridge.expression(arr)))
  def ngramCoverage(tokens: Column, n: Int): Column =
    GraftColumnBridge.column(NGramCoverage(GraftColumnBridge.expression(tokens), n))
  def selfSpans(tokens: Column, n: Int, minRun: Int, maxOcc: Int): Column =
    GraftColumnBridge.column(
      SelfSpans(GraftColumnBridge.expression(tokens), n, minRun, maxOcc))
}
