package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Exact mergeable bitmap distinct — the groupBitmap capability of the
  * ClickHouse/Druid family: a per-group bitset over a BOUNDED integer id
  * domain, with exact set algebra (intersection cardinality) as scalar
  * expressions over the materialized bitmaps.
  *
  * Why this exists next to the approximate sketches (HLL `q_hll`, KMV
  * `q_kmv`): when ids are dense machine integers (user ids, doc ids after
  * dictionary encoding), an EXACT distinct costs domain/8 bytes per group —
  * fixed by the DOMAIN, not the row count — and intersections/unions of
  * segments become word-wise AND/OR instead of a distinct-count join per
  * pair. A J-segment overlap matrix costs J bitmap aggregations + J²/2
  * word-AND scans of tiny buffers, versus J²/2 shuffled COUNT(DISTINCT)
  * self-joins of the fact. The sketches stay the right tool for OPEN
  * domains (hashes, strings); this is the exact tool for closed ones.
  *
  * Buffer: Array[Long] of domain/64 words; update sets a bit (ids outside
  * the declared domain fail loudly — silent truncation would corrupt
  * cardinalities); merge is word-wise OR; eval emits a 2-byte magic header
  * ("BM") followed by the words in big-endian-word-order with trailing zero
  * words trimmed, so equal sets serialize identically regardless of
  * partitioning. The header makes cross-type misuse fail loudly: feeding an
  * HLL/KMV sketch's bytes (or any non-bitmap BINARY) to the cardinality
  * expressions throws instead of returning a silently meaningless count —
  * the same fail-loud posture as the out-of-domain id guard.
  *
  * WIRE-FORMAT COMPATIBILITY (round-11 break, advisor-noted): the 'BM'
  * magic header changed the emitted BINARY incompatibly — bitmap bytes
  * persisted by a pre-header build (parquet, checkpoints) are REJECTED by
  * bitmap_card/bitmap_and_card/bitmap_or_card with the magic-header error
  * rather than read as a legacy payload. This is deliberate: a headerless
  * word-aligned blob is indistinguishable from any other 8-byte-aligned
  * BINARY, so a silent legacy read path would reintroduce exactly the
  * cross-type misuse the header exists to catch. Externally stored
  * bitmaps from builds before the header must be re-aggregated.
  */
case class BitmapAgg(
    child: Expression,
    domainBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(domainBits > 5 && domainBits <= 27,
    s"bitmap_agg domain must be 2^6..2^27 ids (8 B..16 MiB buffer), " +
      s"got 2^$domainBits")

  private val domain: Long = 1L << domainBits
  private val words: Int = 1 << (domainBits - 6)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT argument, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val id = v.asInstanceOf[Long]
      require(id >= 0 && id < domain,
        s"bitmap_agg id $id outside declared domain [0, $domain) — " +
          s"widen domainBits instead of silently truncating")
      b((id >> 6).toInt) |= (1L << (id & 63))
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { b(i) |= o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = {
    var last = words - 1
    while (last >= 0 && b(last) == 0L) last -= 1
    val bb = java.nio.ByteBuffer.allocate(2 + (last + 1) * 8)
    bb.put(Bitmaps.Magic0).put(Bitmaps.Magic1)
    var i = 0
    while (i <= last) { bb.putLong(b(i)); i += 1 }
    bb.array()
  }

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words * 8)
    var i = 0
    while (i < words) { bb.putLong(b(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new Array[Long](words)
    var i = 0
    while (i < words) { b(i) = bb.getLong; i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): BitmapAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c(0))
  override def prettyName: String = "bitmap_agg"
}

/** Popcount of a [[BitmapAgg]] BINARY → exact distinct cardinality. */
case class BitmapCard(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_card"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    Bitmaps.requireBitmap(b, prettyName)
    var cnt = 0L
    var i = Bitmaps.HeaderLen
    while (i < b.length) { cnt += java.lang.Integer.bitCount(b(i) & 0xFF); i += 1 }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      s"""
         |graft.functions.Bitmaps.requireBitmap($arr, "$prettyName");
         |${ev.value} = 0L;
         |for (int $i = ${Bitmaps.HeaderLen}; $i < $arr.length; $i++) {
         |  ${ev.value} += java.lang.Integer.bitCount($arr[$i] & 0xFF);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Popcount of the word-wise AND of two [[BitmapAgg]] BINARYs → exact
  * intersection cardinality. Bitmaps may differ in (trimmed) length; bits
  * beyond the shorter one are zero in that bitmap, so the AND scan stops
  * at the shorter length.
  */
case class BitmapAndCard(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_and_card"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BINARY, BINARY), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[Array[Byte]]
    val b = r.asInstanceOf[Array[Byte]]
    Bitmaps.requireBitmap(a, prettyName)
    Bitmaps.requireBitmap(b, prettyName)
    val n = math.min(a.length, b.length)
    var cnt = 0L
    var i = Bitmaps.HeaderLen
    while (i < n) { cnt += java.lang.Integer.bitCount(a(i) & b(i) & 0xFF); i += 1 }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |graft.functions.Bitmaps.requireBitmap($a, "$prettyName");
         |graft.functions.Bitmaps.requireBitmap($b, "$prettyName");
         |${ev.value} = 0L;
         |int $n = java.lang.Math.min($a.length, $b.length);
         |for (int $i = ${Bitmaps.HeaderLen}; $i < $n; $i++) {
         |  ${ev.value} += java.lang.Integer.bitCount($a[$i] & $b[$i] & 0xFF);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Popcount of the word-wise OR of two [[BitmapAgg]] BINARYs → exact
  * union cardinality. Bits beyond the shorter (trimmed) bitmap come only
  * from the longer one, so the scan runs to the longer length.
  */
case class BitmapOrCard(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_or_card"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BINARY, BINARY), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[Array[Byte]]
    val b = r.asInstanceOf[Array[Byte]]
    Bitmaps.requireBitmap(a, prettyName)
    Bitmaps.requireBitmap(b, prettyName)
    val n = math.max(a.length, b.length)
    var cnt = 0L
    var i = Bitmaps.HeaderLen
    while (i < n) {
      val av = if (i < a.length) a(i) else 0: Byte
      val bv = if (i < b.length) b(i) else 0: Byte
      cnt += java.lang.Integer.bitCount((av | bv) & 0xFF)
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val av = ctx.freshName("av")
      val bv = ctx.freshName("bv")
      s"""
         |graft.functions.Bitmaps.requireBitmap($a, "$prettyName");
         |graft.functions.Bitmaps.requireBitmap($b, "$prettyName");
         |${ev.value} = 0L;
         |int $n = java.lang.Math.max($a.length, $b.length);
         |for (int $i = ${Bitmaps.HeaderLen}; $i < $n; $i++) {
         |  byte $av = $i < $a.length ? $a[$i] : (byte) 0;
         |  byte $bv = $i < $b.length ? $b[$i] : (byte) 0;
         |  ${ev.value} += java.lang.Integer.bitCount(($av | $bv) & 0xFF);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API wrappers + the BINARY wire format shared by the expressions
  * and the codegen they emit.
  */
object Bitmaps {
  /** Domain for the corpus' user-id bitmaps: 2^17 ids (16 KiB buffers) —
    * covers sf0.1's 1,500 users and the 10× rehearsal's stride-shifted
    * ids with two orders of magnitude of headroom; out-of-domain ids fail
    * loudly in [[BitmapAgg.update]].
    */
  val UserDomainBits = 17

  /** 2-byte magic header ("BM") on every emitted bitmap BINARY, so the
    * cardinality expressions can reject non-bitmap bytes (HLL/KMV sketch
    * payloads, arbitrary BINARY columns) instead of popcounting garbage.
    */
  val Magic0: Byte = 'B'.toByte
  val Magic1: Byte = 'M'.toByte
  val HeaderLen: Int = 2
  /** Max payload: 2^27 bits (the BitmapAgg domain ceiling) = 16 MiB. */
  val MaxPayloadBytes: Int = (1 << 27) / 8

  /** Structural guard called from both interpreted eval and generated Java
    * (the object's static forwarder makes it codegen-callable). Checks the
    * magic header, word alignment, and the domain-ceiling bound.
    */
  def requireBitmap(b: Array[Byte], fn: String): Unit = {
    if (b.length < HeaderLen || b(0) != Magic0 || b(1) != Magic1)
      throw new IllegalArgumentException(
        s"$fn: input BINARY is not a bitmap_agg bitmap (missing BM " +
          "header) — was this an HLL/KMV sketch or raw bytes?")
    val payload = b.length - HeaderLen
    if (payload % 8 != 0 || payload > MaxPayloadBytes)
      throw new IllegalArgumentException(
        s"$fn: malformed bitmap payload ($payload bytes — must be " +
          s"8-byte words, <= $MaxPayloadBytes)")
  }

  def bitmapAgg(c: Column, domainBits: Int = UserDomainBits): Column =
    GraftColumnBridge.column(
      BitmapAgg(GraftColumnBridge.expression(c), domainBits)
        .toAggregateExpression())
  def bitmapCard(c: Column): Column =
    GraftColumnBridge.column(BitmapCard(GraftColumnBridge.expression(c)))
  def bitmapAndCard(a: Column, b: Column): Column =
    GraftColumnBridge.column(BitmapAndCard(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def bitmapOrCard(a: Column, b: Column): Column =
    GraftColumnBridge.column(BitmapOrCard(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
