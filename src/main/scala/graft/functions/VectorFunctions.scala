package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ARRAY<FLOAT>` embedding columns.
  *
  * These are higher-order-function compositions (`zip_with`/`aggregate`) —
  * fully expressible in Catalyst, no UDF serialization. Accumulation is
  * forced to DOUBLE and is sequential left-to-right, which makes the result
  * bit-identical to DuckDB's `list_sum(list_transform(...))` on the same
  * input — the property the oracle gate needs.
  *
  * For the 100 TB hot path see [[graft.functions.DotProduct]] (native
  * codegen Expression); these remain the portable reference semantics.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ with double accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Σ aᵢ² with double accumulation. */
  def norm2(a: Column): Column =
    aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))

  /** Cosine similarity; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = sqrt(norm2(a))
    val nb = sqrt(norm2(b))
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(d / (na * nb))
  }

  /** Sign-bit LSH bucket from fixed coordinate hyperplanes: bit i is the
    * sign of the vector's `dims(i)`-th coordinate. Coordinate hyperplanes
    * (rather than random Gaussian ones) keep the oracle SQL trivial while
    * preserving the bucketing structure; swap in seeded random planes via
    * [[randomHyperplaneBucket]] for production quality.
    */
  def signBucket(v: Column, dims: Seq[Int]): Column =
    dims.zipWithIndex
      .map { case (d, i) =>
        when(element_at(v, d + 1) >= 0f, lit(1 << i)).otherwise(lit(0))
      }
      .reduce(_ + _)
      .cast("long")

  /** ±1 component of pseudo-random hyperplane `p` at coordinate `j`,
    * derived from md5 parity — deterministic, engine-independent, no RNG
    * state. Computed at plan-build time and embedded as literals.
    */
  def planeSign(seed: Long, p: Int, j: Int): Double = {
    val digest = java.security.MessageDigest
      .getInstance("MD5")
      .digest(s"$seed|$p|$j".getBytes("UTF-8"))
    if ((digest.last & 1) == 0) 1.0 else -1.0
  }

  /** Seeded deterministic random-hyperplane LSH bucket: k planes of ±1
    * components (embedded literals) → k sign bits. The signed sums are
    * sequential double accumulation, mirrored exactly in the oracle SQL.
    */
  def randomHyperplaneBucket(v: Column, dim: Int, planes: Int, seed: Long): Column =
    (0 until planes)
      .map { p =>
        val proj = (0 until dim)
          .map(j => element_at(v, j + 1).cast("double") * lit(planeSign(seed, p, j)))
          .reduce(_ + _)
        when(proj >= 0.0, lit(1L << p)).otherwise(lit(0L))
      }
      .reduce(_ + _)
}
