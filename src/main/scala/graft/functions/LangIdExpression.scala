package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass language-ID over the raw text — the native twin of the
  * portable formulation in [[TextFunctions.langId]] (kept as the parity
  * reference): CJK scan, lowercase, `[^a-z]+` tokenize, marker-set score
  * per language, fixed-precedence argmax — all in a single row-local eval.
  *
  * The portable CASE chain evaluates `wordSetCount` per language and per
  * branch, re-splitting the document up to ~8× per row (measured 1.06 s of
  * the sf0.1 bench — a pure map query slower than most shuffling queries).
  * At 100 TB, language-ID runs over every document; one pass instead of
  * eight is the difference between a scan and a re-scan loop.
  *
  * Tokenization parity: runs of bytes in 'a'..'z' over
  * `UTF8String.toLowerCase` — identical to splitting the lowered string on
  * `[^a-z]+`, because every non-[a-z] character (ASCII or multi-byte — all
  * UTF-8 continuation/lead bytes are ≥ 0x80) is a separator either way.
  *
  * @param markers (language label, marker words) in precedence order; ties
  *                break toward the earlier entry, matching the reference
  *                `when` chain.
  */
case class LangIdExpr(child: Expression, markers: Seq[(String, Seq[String])])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${other.catalogString}")
  }

  @transient private lazy val labels: Array[UTF8String] =
    markers.map(m => UTF8String.fromString(m._1)).toArray
  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    markers.map { case (_, ws) =>
      val s = new java.util.HashSet[UTF8String](ws.size * 2)
      ws.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray
  @transient private lazy val zh = UTF8String.fromString("zh")
  @transient private lazy val und = UTF8String.fromString("und")

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String]
    // CJK scan on the raw string (code points U+4E00..U+9FFF)
    val s = text.toString
    var ci = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      if (cp >= 0x4e00 && cp <= 0x9fff) return zh
      ci += Character.charCount(cp)
    }
    // one byte-level pass over the lowered text: runs of [a-z] are tokens
    val lower = text.toLowerCase
    val bytes = lower.getBytes
    val scores = new Array[Long](sets.length)
    var i = 0
    var start = -1
    def close(end: Int): Unit = if (start >= 0) {
      val tok = UTF8String.fromBytes(bytes, start, end - start)
      var k = 0
      while (k < sets.length) {
        if (sets(k).contains(tok)) scores(k) += 1
        k += 1
      }
      start = -1
    }
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 'a'.toByte && b <= 'z'.toByte) { if (start < 0) start = i }
      else close(i)
      i += 1
    }
    close(bytes.length)
    // fixed-precedence argmax, matching the portable `when` chain
    var total = 0L
    var k = 0
    while (k < scores.length) { total += scores(k); k += 1 }
    if (total == 0L) return und
    var best = 0
    k = 1
    while (k < scores.length) {
      if (scores(k) > scores(best)) best = k
      k += 1
    }
    labels(best)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangIdExpression {
  def langId(text: Column, markers: Seq[(String, Seq[String])]): Column =
    GraftColumnBridge.column(
      LangIdExpr(GraftColumnBridge.expression(text), markers))
}
