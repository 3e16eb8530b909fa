package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{FloatVecCosine, FloatVecDotProduct}

/** Spark extensions entry point: install the engine's native functions at
  * session build time, with zero user code —
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * after which `vec_dot` / `vec_cosine` resolve in any SQL of the session.
  * (Per-session registration without the config remains available via
  * [[graft.functions.VectorExpressions.register]] / [[GraftSession.init]].)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def binary(name: String)(
      mk: (Expression, Expression) => Expression): Seq[Expression] => Expression =
    args => {
      if (args.length != 2)
        throw new IllegalArgumentException(
          s"$name requires exactly 2 arguments, got ${args.length}")
      mk(args(0), args(1))
    }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two ARRAY<FLOAT> in double"),
      binary("vec_dot")(FloatVecDotProduct)))
    e.injectFunction((
      FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "vec_cosine(a, b) - cosine similarity of two ARRAY<FLOAT>"),
      binary("vec_cosine")(FloatVecCosine)))
  }
}
