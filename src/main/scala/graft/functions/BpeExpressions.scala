package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Row-local BPE tokenization statistics under a TRAINED, FIXED merge list
  * (the deployment half of byte-pair encoding — Sennrich et al. 2016;
  * training lives in [[graft.operators.Bpe.trainedMerges]]).
  *
  * Application semantics (identical on both engines, chosen because it is
  * exactly what a left-to-right non-overlapping string `replace` performs,
  * so the DuckDB oracle can mirror it with a chain of `replace` calls over
  * delimited symbol strings): for each merge (a, b) IN RANK ORDER, make ONE
  * exhaustive left-to-right pass over the word's symbol sequence, fusing
  * every non-overlapping adjacent (a, b) into ab; a symbol created by a
  * fusion is not reconsidered as the LEFT operand within the same pass.
  * One pass per merge is a fixpoint: fusing (a, b) can only create the
  * strictly longer symbol ab, which can never re-form the pair (a, b).
  *
  * The merge list rides in the plan as a literal (the classifier
  * weight-vector deployment shape, `TextAnalysis.qQualityClassifier`):
  * broadcast-by-closure, one bounded array per task, zero joins — token
  * counting under a deployed vocab is a pure map stage at any corpus size.
  *
  * Reference capability class: the map-side UDF contract
  * (`mapreduce.go:117-154`) — per-record transformation with broadcast
  * read-only state.
  */
case class BpeTokenStats(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bpe_token_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.catalogString}")
  }

  /** word → post-merge symbol count. Per-task (expressions deserialize per
    * task), single-threaded within a task; bounded so an adversarial vocab
    * cannot balloon executor memory — a Zipfian corpus hits >99% of
    * occurrences inside a cache this size.
    */
  @transient private lazy val cache = new java.util.HashMap[String, Long]()
  private val MaxCache = 1 << 16

  private def encodedLen(word: String): Long = {
    var syms = new Array[String](word.length)
    var i = 0
    while (i < word.length) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
    var n = syms.length
    merges.foreach { case (a, b) =>
      // one exhaustive left-to-right non-overlapping pass
      val out = new Array[String](n)
      var w = 0
      var r = 0
      while (r < n) {
        if (r < n - 1 && syms(r) == a && syms(r + 1) == b) {
          out(w) = a + b; r += 2
        } else { out(w) = syms(r); r += 1 }
        w += 1
      }
      syms = out
      n = w
    }
    n.toLong
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    var nWords = 0L
    var nChars = 0L
    var nTokens = 0L
    var i = 0
    while (i < len) {
      val w = arr.getUTF8String(i).toString
      if (w.nonEmpty) {
        nWords += 1
        nChars += w.length.toLong
        var t = cache.get(w)
        if (t == 0L) { // 0 is never a valid count for a nonempty word
          t = encodedLen(w)
          if (cache.size < MaxCache) cache.put(w, t)
        }
        nTokens += t
      }
      i += 1
    }
    new GenericArrayData(Array(nWords, nChars, nTokens))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeExpressions {
  /** `[n_words, n_chars, n_bpe_tokens]` of a token array under `merges`. */
  def bpeTokenStats(tokens: Column, merges: Seq[(String, String)]): Column =
    GraftColumnBridge.column(
      BpeTokenStats(GraftColumnBridge.expression(tokens), merges))

  /** Serialize a merge list for the SQL-function literal form
    * (`bpe_token_stats(tokens, 'th he,he ll')` — comma-separated ranked
    * merges, space between the pair halves).
    */
  def mergeSpec(merges: Seq[(String, String)]): String =
    merges.map { case (a, b) => s"$a $b" }.mkString(",")

  def parseMergeSpec(spec: String): Seq[(String, String)] =
    if (spec.isEmpty) Seq.empty
    else spec.split(",", -1).toSeq.map { m =>
      m.split(" ") match {
        case Array(a, b) if a.nonEmpty && b.nonEmpty => (a, b)
        case _ => throw new IllegalArgumentException(
          s"bad merge '$m' in spec '$spec' (want 'left right')")
      }
    }
}
