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

object VectorExpressions {
  /** Column builders wrapping the native expressions. */
  def vecDot(a: Column, b: Column): Column =
    GraftColumnBridge.column(FloatVecDotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def vecCosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(FloatVecCosine(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

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
