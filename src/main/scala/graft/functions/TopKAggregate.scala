package graft.functions

import java.lang.{Long => JLong}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded "k smallest values" aggregate over BIGINT input, as a
  * [[TypedImperativeAggregate]] whose buffer never exceeds k elements.
  *
  * Motivation: a capped posting list (`inverted index: word → first k
  * doc ids`) written as `slice(sort_array(collect_list(id)), 1, k)`
  * materializes the ENTIRE group in the aggregation buffer before slicing —
  * for a stopword over a 100 TB corpus that is billions of ids in one
  * buffer, which is an OOM, not a plan. This aggregate keeps ≤ k values per
  * partial buffer, so partial aggregation (map-side combine) bounds both
  * memory and shuffle payload at k · 8 bytes per (group × partition).
  *
  * Buffer: a max-heap of the k smallest values seen (head = largest kept,
  * evicted first). Output: the k values in ascending order.
  */
case class MinKLongs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[JLong]] {

  require(k > 0, s"min_k requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT argument, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): java.util.PriorityQueue[JLong] =
    new java.util.PriorityQueue[JLong](
      k + 1, java.util.Collections.reverseOrder[JLong]())

  private def offer(b: java.util.PriorityQueue[JLong], v: Long): Unit =
    if (b.size < k) b.add(v)
    else if (v < b.peek().longValue()) { b.poll(); b.add(v) }

  override def update(
      b: java.util.PriorityQueue[JLong],
      input: InternalRow): java.util.PriorityQueue[JLong] = {
    val v = child.eval(input)
    if (v != null) offer(b, v.asInstanceOf[Long])
    b
  }

  override def merge(
      b: java.util.PriorityQueue[JLong],
      o: java.util.PriorityQueue[JLong]): java.util.PriorityQueue[JLong] = {
    val it = o.iterator()
    while (it.hasNext) offer(b, it.next().longValue())
    b
  }

  override def eval(b: java.util.PriorityQueue[JLong]): Any = {
    val arr = new Array[Long](b.size)
    var i = 0
    val it = b.iterator()
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  override def serialize(b: java.util.PriorityQueue[JLong]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + b.size * 8)
    bb.putInt(b.size)
    val it = b.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[JLong] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = createAggregationBuffer()
    var i = 0
    while (i < n) { b.add(bb.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): MinKLongs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinKLongs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c(0))
  override def prettyName: String = "min_k"
}

/** Bounded "k smallest DISTINCT values" aggregate over BIGINT input — the
  * buffer of a KMV (k minimum values) distinct-count sketch (Bar-Yossef et
  * al. 2002, "Counting distinct elements in a data stream"). Duplicates
  * must not occupy sketch slots, so the buffer is an ordered set: ≤ k
  * entries per partial buffer, mergeable across partitions (map-side
  * combine works), shuffle payload ≤ k · 8 bytes per (group × partition).
  * Output: the ≤ k values ascending; a full sketch's last element is the
  * k-th minimum hash the estimator divides by.
  */
case class MinKDistinctLongs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[JLong]] {

  require(k > 0, s"min_k_distinct requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT argument, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): java.util.TreeSet[JLong] =
    new java.util.TreeSet[JLong]()

  private def offer(b: java.util.TreeSet[JLong], v: Long): Unit =
    if (b.size < k) { b.add(v); () }
    else if (v < b.last().longValue() && !b.contains(v)) {
      b.pollLast(); b.add(v); ()
    }

  override def update(
      b: java.util.TreeSet[JLong],
      input: InternalRow): java.util.TreeSet[JLong] = {
    val v = child.eval(input)
    if (v != null) offer(b, v.asInstanceOf[Long])
    b
  }

  override def merge(
      b: java.util.TreeSet[JLong],
      o: java.util.TreeSet[JLong]): java.util.TreeSet[JLong] = {
    val it = o.iterator()
    while (it.hasNext) offer(b, it.next().longValue())
    b
  }

  override def eval(b: java.util.TreeSet[JLong]): Any = {
    val arr = new Array[Long](b.size)
    var i = 0
    val it = b.iterator()
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr) // TreeSet iterates ascending already
  }

  override def serialize(b: java.util.TreeSet[JLong]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + b.size * 8)
    bb.putInt(b.size)
    val it = b.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[JLong] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = createAggregationBuffer()
    var i = 0
    while (i < n) { b.add(bb.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): MinKDistinctLongs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinKDistinctLongs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c(0))
  override def prettyName: String = "min_k_distinct"
}

object TopKAggregate {
  /** Aggregate column: the k smallest BIGINT values of the group, ascending. */
  def minK(c: Column, k: Int): Column =
    GraftColumnBridge.column(
      MinKLongs(GraftColumnBridge.expression(c), k).toAggregateExpression())

  /** Aggregate column: the k smallest DISTINCT BIGINT values, ascending —
    * the KMV sketch buffer.
    */
  def minKDistinct(c: Column, k: Int): Column =
    GraftColumnBridge.column(
      MinKDistinctLongs(GraftColumnBridge.expression(c), k).toAggregateExpression())
}
