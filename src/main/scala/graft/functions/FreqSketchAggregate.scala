package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable frequent-items summary (Misra–Gries 1982; merge rule from
  * Agarwal et al., "Mergeable Summaries", PODS'12) — at most `k` (item,
  * counter) pairs, any stream, any merge tree.
  *
  * Invariant: for every item x, `true_count(x) − n/(k+1) ≤ counter(x) ≤
  * true_count(x)` (counter 0 for untracked items), REGARDLESS of how the
  * stream was partitioned or in which order partials merged — each
  * decrement step (update overflow or merge trim) removes the same amount
  * from ≥ k+1 counted units, so total decrement ≤ n/(k+1). Consequence:
  * every item with true frequency > n/(k+1) is IN the summary at the end.
  * The candidate SET may vary with partitioning — which is why the query
  * using this ([[graft.operators.TextAnalysis.qHeavyHitters]]) treats it
  * as pass 1 of the classic two-pass scheme: sketch proposes ≤ k
  * candidates, an exact corpus-linear count over ONLY the candidates
  * (broadcast semi-join) decides — the final output is deterministic and
  * oracle-exact even though the intermediate sketch is not.
  *
  * State: ≤ k string keys + longs; merge is counter addition then a trim
  * by the (k+1)-largest counter. Map-side partial aggregation works, so
  * the shuffle carries ≤ k pairs per partition — the 100 TB replacement
  * for `GROUP BY word` over a trillion-token corpus when only the head of
  * the distribution is wanted.
  *
  * NOT thread-safe (Spark aggregation buffers are single-threaded).
  */
final class FreqSketch(val k: Int) {
  require(k >= 1, s"freq_sketch requires k >= 1, got $k")

  private[functions] var n: Long = 0L
  private[functions] val counts = scala.collection.mutable.HashMap.empty[String, Long]

  def insert(v: String): Unit = {
    n += 1
    counts.get(v) match {
      case Some(c) => counts.update(v, c + 1)
      case None if counts.size < k => counts.update(v, 1L)
      case None =>
        // decrement-all: pairs this arrival with one unit of each of the
        // k tracked items — k+1 stream units retired together
        val dead = scala.collection.mutable.ArrayBuffer.empty[String]
        counts.foreach { case (key, c) =>
          if (c == 1L) dead += key else counts.update(key, c - 1)
        }
        dead.foreach(counts.remove)
    }
  }

  /** Counter addition, then if over capacity subtract the (k+1)-largest
    * counter from every entry and drop the non-positive ones — the PODS'12
    * merge that preserves the n/(k+1) error bound under any merge tree.
    */
  def merge(o: FreqSketch): Unit = {
    n += o.n
    o.counts.foreach { case (key, c) =>
      counts.update(key, counts.getOrElse(key, 0L) + c)
    }
    if (counts.size > k) {
      val cs = counts.values.toArray
      java.util.Arrays.sort(cs)
      val sub = cs(cs.length - (k + 1)) // (k+1)-th largest
      val dead = scala.collection.mutable.ArrayBuffer.empty[String]
      counts.foreach { case (key, c) =>
        if (c - sub <= 0L) dead += key else counts.update(key, c - sub)
      }
      dead.foreach(counts.remove)
    }
  }

  /** Tracked items, lexicographically sorted (stable output for specs;
    * consumers treat this as a candidate SET).
    */
  def candidates: Array[String] = {
    val a = counts.keysIterator.toArray
    java.util.Arrays.sort(a, java.util.Comparator.naturalOrder[String]())
    a
  }

  def lowerBound(v: String): Long = counts.getOrElse(v, 0L)

  def serialized: Array[Byte] = {
    val keys = counts.toArray
    val bytes = keys.map { case (s, _) => s.getBytes(java.nio.charset.StandardCharsets.UTF_8) }
    val sz = 4 + 8 + 4 + bytes.map(b => 4 + b.length + 8).sum
    val bb = java.nio.ByteBuffer.allocate(sz)
    bb.putInt(k); bb.putLong(n); bb.putInt(keys.length)
    var i = 0
    while (i < keys.length) {
      bb.putInt(bytes(i).length); bb.put(bytes(i)); bb.putLong(keys(i)._2)
      i += 1
    }
    bb.array()
  }
}

object FreqSketch {
  def deserialize(b: Array[Byte]): FreqSketch = {
    val bb = java.nio.ByteBuffer.wrap(b)
    val s = new FreqSketch(bb.getInt)
    s.n = bb.getLong
    val m = bb.getInt
    var i = 0
    while (i < m) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      s.counts.update(new String(kb, java.nio.charset.StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    s
  }
}

/** Aggregate: the ≤ k Misra–Gries candidate items of a STRING column,
  * lexicographically sorted. Guaranteed to contain every item with
  * frequency > n/(k+1); intended as the proposal pass of a two-pass
  * exact heavy-hitters query.
  */
case class FreqSketchStrings(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FreqSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): FreqSketch = new FreqSketch(k)

  override def update(b: FreqSketch, input: InternalRow): FreqSketch = {
    val v = child.eval(input)
    if (v != null) b.insert(v.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: FreqSketch, o: FreqSketch): FreqSketch = {
    b.merge(o); b
  }

  override def eval(b: FreqSketch): Any =
    new GenericArrayData(b.candidates.map(UTF8String.fromString(_)))

  override def serialize(b: FreqSketch): Array[Byte] = b.serialized
  override def deserialize(bytes: Array[Byte]): FreqSketch =
    FreqSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): FreqSketchStrings =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketchStrings =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c(0))
  override def prettyName: String = "freq_sketch"
}

object FreqSketchAggregate {
  /** Aggregate column: Misra–Gries candidate heavy hitters (≤ k items). */
  def freqSketch(c: Column, k: Int): Column =
    GraftColumnBridge.column(
      FreqSketchStrings(GraftColumnBridge.expression(c), k)
        .toAggregateExpression())
}
