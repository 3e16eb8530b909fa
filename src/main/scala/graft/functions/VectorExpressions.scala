package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the embedding hot path.
  *
  * [[graft.functions.VectorFunctions]] (zip_with/aggregate) is the portable
  * reference; higher-order functions evaluate their lambdas interpreted and
  * break whole-stage codegen. These expressions generate a tight primitive
  * float loop instead — the difference is large when the ANN verify stage
  * computes millions of cosines (see Bench). Semantics are identical:
  * per-element double promotion, sequential left-to-right accumulation —
  * so results are bit-equal to the HOF path and the DuckDB oracle.
  */
abstract class FloatVecBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (elemOk(left.dataType) && elemOk(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<FLOAT|DOUBLE> arguments, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  /** Whether a side already holds doubles (k-means centroids are exact
    * integer sums carried as ARRAY<DOUBLE>); floats promote per element.
    */
  protected def leftIsDouble: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == DoubleType
  protected def rightIsDouble: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  protected def get(a: ArrayData, i: Int, isDouble: Boolean): Double =
    if (isDouble) a.getDouble(i) else a.getFloat(i).toDouble

  /** Java source for the element accessor of one side. */
  protected def accessor(arr: String, i: String, isDouble: Boolean): String =
    if (isDouble) s"$arr.getDouble($i)" else s"((double) $arr.getFloat($i))"
}

/** Σ aᵢ·bᵢ in double, codegen'd. Vectors shorter than the other are
  * truncated to the common length (same as zip_with-with-null-skip would
  * not be — callers pair fixed-dimension embeddings).
  */
case class FloatVecDotProduct(left: Expression, right: Expression)
    extends FloatVecBinary {
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += get(a, i, leftIsDouble) * get(b, i, rightIsDouble)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${accessor(a, i, leftIsDouble)} * ${accessor(b, i, rightIsDouble)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cos(a,b) = dot/(‖a‖·‖b‖) in one codegen'd pass; 0.0 for zero vectors. */
case class FloatVecCosine(left: Expression, right: Expression)
    extends FloatVecBinary {
  override def prettyName: String = "vec_cosine"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = get(a, i, leftIsDouble)
      val y = get(b, i, rightIsDouble)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${accessor(a, i, leftIsDouble)};
         |  double $y = ${accessor(b, i, rightIsDouble)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Nearest-centroid id for IVF assignment: one codegen'd loop over a
  * driver-resident centroid table instead of k inlined literal-array
  * cosine subtrees (which made every k-means iteration re-analyze and
  * re-janino-compile 16 unrolled 64-element loops). Semantics are
  * bit-identical to `array_min(array(struct(-round(vec_cosine(v, cᵢ), 6),
  * idᵢ)))`: per-centroid cosine with sequential double accumulation,
  * HALF_UP rounding to 6 places (Spark `round`'s double path), ties on
  * the rounded cosine resolved toward the smaller centroid id — callers
  * pass centroids sorted by id ascending.
  */
case class NearestCentroid(
    child: Expression,
    ids: Array[Long],
    centroids: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(ids.length == centroids.length && ids.nonEmpty,
    "ids and centroids must align and be non-empty")
  require((1 until ids.length).forall(i => ids(i - 1) < ids(i)),
    "centroid ids must be strictly ascending (tie-break contract)")

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "nearest_centroid"

  private def elemIsDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires ARRAY<FLOAT|DOUBLE>, got ${t.catalogString}")
    }

  /** round(cos, 6) exactly as Spark's Round does doubles: via the
    * canonical decimal string representation, HALF_UP.
    */
  private def round6(d: Double): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val isD = elemIsDouble
    var best = 0L
    var bestNeg = Double.PositiveInfinity
    var c = 0
    while (c < centroids.length) {
      val cv = centroids(c)
      val n = math.min(a.numElements(), cv.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = if (isD) a.getDouble(i) else a.getFloat(i).toDouble
        val y = cv(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val cos =
        if (na == 0.0 || nb == 0.0) 0.0
        else dot / (math.sqrt(na) * math.sqrt(nb))
      val neg = -round6(cos)
      if (java.lang.Double.compare(neg, bestNeg) < 0) {
        bestNeg = neg
        best = ids(c)
      }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val idsRef = ctx.addReferenceObj("ids", ids, "long[]")
    val getter =
      if (elemIsDouble) (a: String, i: String) => s"$a.getDouble($i)"
      else (a: String, i: String) => s"((double) $a.getFloat($i))"
    nullSafeCodeGen(ctx, ev, a => {
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val cv = ctx.freshName("cv"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val cos = ctx.freshName("cos")
      val neg = ctx.freshName("neg"); val best = ctx.freshName("best")
      val bestNeg = ctx.freshName("bestNeg")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |long $best = 0L; double $bestNeg = Double.POSITIVE_INFINITY;
         |for (int $c = 0; $c < $centsRef.length; $c++) {
         |  double[] $cv = $centsRef[$c];
         |  int $n = java.lang.Math.min($a.numElements(), $cv.length);
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = ${getter(a, i)};
         |    double $y = $cv[$i];
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  double $cos = ($na == 0.0 || $nb == 0.0)
         |    ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  double $neg = -java.math.BigDecimal.valueOf($cos)
         |    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue();
         |  if (java.lang.Double.compare($neg, $bestNeg) < 0) {
         |    $bestNeg = $neg; $best = $idsRef[$c];
         |  }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass int8 symmetric-quantization error statistics for a vector —
  * the index-build preprocessing report (how much precision does 8-bit
  * storage cost this embedding?). Output ARRAY<DOUBLE>
  * [max_abs, max_abs_err, sum_abs_err, n]:
  * scale = max_abs/levels, qᵢ = floor(xᵢ/scale + 0.5) (HALF-UP via floor —
  * identical in Java and SQL, unlike engine round() on .5 ties),
  * errᵢ = |xᵢ − qᵢ·scale|. A zero vector quantizes exactly (all errors 0).
  * Every step is deterministic IEEE double arithmetic, so the DuckDB
  * oracle twin matches bit-for-bit (the sum is sequential left-to-right).
  */
case class FloatVecQuantStats(child: Expression, levels: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(levels > 0, "levels must be positive")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_quant_stats"

  private def elemIsDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires ARRAY<FLOAT|DOUBLE>, got ${t.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val isD = elemIsDouble
    val n = a.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val x = if (isD) a.getDouble(i) else a.getFloat(i).toDouble
      val ax = math.abs(x)
      if (ax > maxAbs) maxAbs = ax
      i += 1
    }
    var maxErr = 0.0
    var sumErr = 0.0
    if (maxAbs > 0.0) {
      val scale = maxAbs / levels
      i = 0
      while (i < n) {
        val x = if (isD) a.getDouble(i) else a.getFloat(i).toDouble
        val err = math.abs(x - math.floor(x / scale + 0.5) * scale)
        if (err > maxErr) maxErr = err
        sumErr += err
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array(maxAbs, maxErr, sumErr, n.toDouble))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter =
      if (elemIsDouble) (a: String, i: String) => s"$a.getDouble($i)"
      else (a: String, i: String) => s"((double) $a.getFloat($i))"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val maxAbs = ctx.freshName("maxAbs"); val ax = ctx.freshName("ax")
      val scale = ctx.freshName("scale"); val x = ctx.freshName("x")
      val err = ctx.freshName("err"); val maxErr = ctx.freshName("maxErr")
      val sumErr = ctx.freshName("sumErr")
      s"""
         |int $n = $a.numElements();
         |double $maxAbs = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $ax = java.lang.Math.abs(${getter(a, i)});
         |  if ($ax > $maxAbs) $maxAbs = $ax;
         |}
         |double $maxErr = 0.0; double $sumErr = 0.0;
         |if ($maxAbs > 0.0) {
         |  double $scale = $maxAbs / $levels;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = ${getter(a, i)};
         |    double $err = java.lang.Math.abs(
         |      $x - java.lang.Math.floor($x / $scale + 0.5) * $scale);
         |    if ($err > $maxErr) $maxErr = $err;
         |    $sumErr += $err;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  new double[] { $maxAbs, $maxErr, $sumErr, (double) $n });
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  def vecQuantStats(v: Column, levels: Int): Column =
    GraftColumnBridge.column(FloatVecQuantStats(
      GraftColumnBridge.expression(v), levels))

  /** Column builders wrapping the native expressions. */
  def vecDot(a: Column, b: Column): Column =
    GraftColumnBridge.column(FloatVecDotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def vecCosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(FloatVecCosine(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def nearestCentroid(v: Column, cent: Seq[(Long, Array[Double])]): Column =
    GraftColumnBridge.column(NearestCentroid(
      GraftColumnBridge.expression(v),
      cent.map(_._1).toArray, cent.map(_._2).toArray))

  private def binary(name: String)(
      mk: (org.apache.spark.sql.catalyst.expressions.Expression,
           org.apache.spark.sql.catalyst.expressions.Expression) =>
        org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression =
    args => {
      if (args.length != 2)
        throw new IllegalArgumentException(
          s"$name requires exactly 2 arguments, got ${args.length}")
      mk(args(0), args(1))
    }

  /** SQL registration: makes `vec_dot` / `vec_cosine` callable from
    * `spark.sql(...)` — idempotent per session. (The config-driven install
    * path is [[graft.GraftExtensions]].)
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", binary("vec_dot")(FloatVecDotProduct), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_cosine", binary("vec_cosine")(FloatVecCosine), "built-in")
  }
}
