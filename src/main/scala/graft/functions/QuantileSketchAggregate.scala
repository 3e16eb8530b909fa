package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Mergeable quantile summary over BIGINT values — the bounded-state buffer
  * behind [[QuantileSketchLongs]].
  *
  * Structure (Manku-Rajagopalan-Lindsay / KLL family, deterministic
  * variant): `levels(i)` holds items of weight `2^i`; an item enters at
  * level 0 with weight 1; when a level reaches `2k` items it is COMPACTED —
  * sorted, every second item kept (the kept offset alternates between
  * compactions of the same level, which is what makes the deterministic
  * variant's rank errors cancel instead of accumulate) and promoted one
  * level up with doubled weight. An odd-sized buffer leaves its sorted
  * maximum behind at the same level so total weight is conserved exactly:
  * `Σ levels(i).size · 2^i == n` always (spec-pinned).
  *
  * Why this and not Greenwald-Khanna: GK gives the tightest single-stream
  * summary but is not mergeable (merging two GK summaries adds their
  * errors, and Spark's aggregation merges one partial per partition — at
  * 1000 executors that is a 1000-way merge). The compactor hierarchy merges
  * by LEVEL-WISE CONCATENATION with the same compaction rule, so the error
  * bound depends on total input size, not on merge-tree shape — exactly the
  * property partial aggregation (map-side combine) needs. This is the same
  * per-key-holistic → mergeable-partial move the reference's per-key reduce
  * (mapreduce.go:178-219) needs at scale, applied to rank statistics.
  *
  * Bounds: every buffer ≤ 2k items, ≤ ~log2(n/k)+2 levels ever materialize,
  * so state and shuffle payload per (group × partition) are
  * O(k·log(n/k)) · 8 bytes — 4096·34·8 ≈ 1.1 MB worst case at n = 10¹²
  * with the default k, vs the single-task O(n) sort of the exact rank
  * selection it replaces. Rank error: each compaction of level i perturbs
  * any rank by at most 2^i, and alternating offsets cancel successive
  * perturbations; the deterministic worst case is O(n·log(n/k)/k) but
  * observed error on non-adversarial streams is well under n/k (the query
  * using this sketch VALIDATES the estimate in-plan against exact ranks —
  * see `TextAnalysis.qLenQuantilesSketch` — so a degradation is a loud
  * correctness failure, not a silent wrong answer).
  *
  * NOT thread-safe (Spark aggregation buffers are single-threaded).
  */
final class QuantileSketch(val k: Int) {
  require(k >= 4, s"quantile_sketch requires k >= 4, got $k")

  private[functions] var n: Long = 0L
  // levels(i): UNSORTED buffer of items with weight 2^i (sorted lazily at
  // compaction / query time); alt(i): next kept-offset for level i
  private[functions] val levels =
    scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[Long]]()
  private[functions] val alt = scala.collection.mutable.ArrayBuffer[Boolean]()

  private def ensureLevel(i: Int): Unit =
    while (levels.size <= i) {
      levels += new scala.collection.mutable.ArrayBuffer[Long](2 * k)
      alt += false
    }

  def insert(v: Long): Unit = {
    ensureLevel(0)
    levels(0) += v
    n += 1
    if (levels(0).size >= 2 * k) compact(0)
  }

  /** Sort level i, keep every second item (alternating offset), promote the
    * kept items to level i+1; an odd buffer leaves its maximum at level i.
    */
  private def compact(i: Int): Unit = {
    val buf = levels(i)
    val arr = buf.toArray
    java.util.Arrays.sort(arr)
    val even = arr.length - (arr.length & 1)
    buf.clear()
    if (even < arr.length) buf += arr(even) // odd leftover stays, weight 2^i
    ensureLevel(i + 1)
    val off = if (alt(i)) 1 else 0
    alt(i) = !alt(i)
    var j = off
    while (j < even) { levels(i + 1) += arr(j); j += 2 }
    if (levels(i + 1).size >= 2 * k) compact(i + 1)
  }

  /** Level-wise concatenation, then re-establish the capacity invariant
    * bottom-up (a compaction's promotions are handled by the ascending
    * scan; compact itself cascades if it overflows a level).
    */
  def merge(o: QuantileSketch): Unit = {
    n += o.n
    ensureLevel(math.max(o.levels.size - 1, 0))
    var i = 0
    while (i < o.levels.size) { levels(i) ++= o.levels(i); i += 1 }
    i = 0
    while (i < levels.size) {
      if (levels(i).size >= 2 * k) compact(i)
      i += 1
    }
  }

  /** Estimated value at 1-based rank ⌈p·n⌉ — the percentile_disc rank rule
    * of the exact twin: smallest summarized value whose cumulative weight
    * reaches the target.
    */
  def quantiles(probs: Seq[Double]): Array[Long] = {
    val total = levels.iterator.zipWithIndex
      .map { case (b, i) => b.length.toLong << i }.sum
    assert(total == n, s"weight invariant broken: $total != $n")
    if (n == 0L) return Array.empty[Long]
    val items = new Array[Long](levels.map(_.size).sum)
    val weights = new Array[Long](items.length)
    var idx = 0
    for (i <- levels.indices; v <- levels(i)) {
      items(idx) = v; weights(idx) = 1L << i; idx += 1
    }
    // sort (value, weight) pairs by value via index sort
    val order = Array.range(0, items.length)
      .sortBy(items(_))
    probs.iterator.map { p =>
      val target = math.ceil(p * n).toLong.max(1L)
      var cum = 0L
      var j = 0
      var out = items(order(items.length - 1))
      var found = false
      while (j < order.length && !found) {
        cum += weights(order(j))
        if (cum >= target) { out = items(order(j)); found = true }
        j += 1
      }
      out
    }.toArray
  }

  def serialized: Array[Byte] = {
    val sz = 4 + 8 + 4 + levels.iterator.map(b => 4 + 1 + 8 * b.size).sum
    val bb = java.nio.ByteBuffer.allocate(sz)
    bb.putInt(k); bb.putLong(n); bb.putInt(levels.size)
    for (i <- levels.indices) {
      bb.putInt(levels(i).size)
      bb.put(if (alt(i)) 1.toByte else 0.toByte)
      levels(i).foreach(bb.putLong)
    }
    bb.array()
  }
}

object QuantileSketch {
  def deserialize(bytes: Array[Byte]): QuantileSketch = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val s = new QuantileSketch(bb.getInt)
    s.n = bb.getLong
    val nl = bb.getInt
    for (i <- 0 until nl) {
      val sz = bb.getInt
      val a = bb.get() == 1.toByte
      val buf = new scala.collection.mutable.ArrayBuffer[Long](sz.max(1))
      var j = 0
      while (j < sz) { buf += bb.getLong; j += 1 }
      s.levels += buf
      s.alt += a
    }
    s
  }
}

/** Aggregate: quantile estimates (one per entry of `probs`, by the
  * 1-based-rank-⌈p·n⌉ rule) of a BIGINT column, via the mergeable
  * [[QuantileSketch]]. For groups with fewer than 2k values the sketch
  * never compacts and the estimates are EXACT (equal to percentile_disc);
  * beyond that they carry the sketch's rank-error bound. Partial
  * aggregation works (map-side combine), state is O(k·log(n/k)) per
  * buffer — this is the at-scale replacement for exact per-group rank
  * selection through a single-task `Window.partitionBy(group)`.
  */
case class QuantileSketchLongs(
    child: Expression,
    k: Int,
    probs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSketch] {

  require(probs.nonEmpty && probs.forall(p => p > 0.0 && p <= 1.0),
    s"quantile_sketch probs must be in (0, 1], got ${probs.mkString(",")}")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT argument, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): QuantileSketch = new QuantileSketch(k)

  override def update(b: QuantileSketch, input: InternalRow): QuantileSketch = {
    val v = child.eval(input)
    if (v != null) b.insert(v.asInstanceOf[Long])
    b
  }

  override def merge(b: QuantileSketch, o: QuantileSketch): QuantileSketch = {
    b.merge(o); b
  }

  override def eval(b: QuantileSketch): Any =
    new GenericArrayData(b.quantiles(probs))

  override def serialize(b: QuantileSketch): Array[Byte] = b.serialized
  override def deserialize(bytes: Array[Byte]): QuantileSketch =
    QuantileSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchLongs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchLongs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c(0))
  override def prettyName: String = "quantile_sketch"
}

object QuantileSketchAggregate {
  /** Aggregate column: sketch-estimated quantile values at `probs`
    * (ascending ranks of the group's BIGINT values), buffer ≤ O(k·log n).
    */
  def quantileSketch(c: Column, k: Int, probs: Seq[Double]): Column =
    GraftColumnBridge.column(
      QuantileSketchLongs(GraftColumnBridge.expression(c), k, probs)
        .toAggregateExpression())
}
